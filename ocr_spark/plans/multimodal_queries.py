"""Driver-contract queries for the multimodal plumbing.

The FKIM deterministic codec (operators/multimodal.py) makes the binary
round trip oracle-checkable: every decoded value is a pure function of
doc_id, so DuckDB recomputes it without ever seeing the bytes. A value
mismatch means the Spark-side binary plumbing (synthesis → Arrow binary
transfer → batch parse → typed columns) corrupted something.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_spark.operators.multimodal import (
    FRAME_BYTES, HEADER_BYTES, decode_media_meta, sample_frames,
    synthesize_media,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def mm_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(_docs(spark, sf_dir))
    meta = decode_media_meta(media)
    return meta.select("doc_id", "format", "width", "height", "n_frames",
                       "n_bytes")


_MEDIA_META_SQL = f"""
SELECT doc_id,
       'fkim' AS format,
       CAST(64 + (doc_id * 7) % 192 AS INT) AS width,
       CAST(64 + (doc_id * 13) % 192 AS INT) AS height,
       CAST(1 + doc_id % 8 AS INT) AS n_frames,
       CAST({HEADER_BYTES} + (1 + doc_id % 8) * {FRAME_BYTES} AS BIGINT)
         AS n_bytes
FROM documents
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling; frame_md5 = md5 of the frame bytes,
    which the oracle recomputes as md5(md5('<doc_id>_<f>')) since frame
    content is the ascii-hex md5 of that key."""
    media = synthesize_media(_docs(spark, sf_dir))
    return sample_frames(media, every_k=2)


_FRAME_SAMPLE_SQL = """
WITH fr AS (
  SELECT doc_id, unnest(range(0, 1 + doc_id % 8, 2)) AS f FROM documents
)
SELECT doc_id,
       CAST(f AS INT) AS frame_idx,
       md5(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(f AS VARCHAR)))
         AS frame_md5
FROM fr
"""


def mm_frame_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational layer over decoded media: frames per doc joined back to
    doc metadata — the decode feeds normal Catalyst-planned analytics."""
    media = synthesize_media(_docs(spark, sf_dir))
    frames = sample_frames(media, every_k=2)
    meta = decode_media_meta(media)
    return (frames.groupBy("doc_id")
            .agg(F.count("*").alias("n_sampled"),
                 F.max("frame_idx").alias("last_frame"))
            .join(meta.select("doc_id", "width", "height"), "doc_id"))


_FRAME_ROLLUP_SQL = """
SELECT doc_id,
       CAST((doc_id % 8) // 2 + 1 AS BIGINT) AS n_sampled,
       CAST(((doc_id % 8) // 2) * 2 AS INT) AS last_frame,
       CAST(64 + (doc_id * 7) % 192 AS INT) AS width,
       CAST(64 + (doc_id * 13) % 192 AS INT) AS height
FROM documents
"""


SPARK_QUERIES = {
    "mm_media_meta": mm_media_meta,
    "mm_frame_sample": mm_frame_sample,
    "mm_frame_rollup": mm_frame_rollup,
}

ORACLE_SQL = {
    "mm_media_meta": _MEDIA_META_SQL,
    "mm_frame_sample": _FRAME_SAMPLE_SQL,
    "mm_frame_rollup": _FRAME_ROLLUP_SQL,
}
