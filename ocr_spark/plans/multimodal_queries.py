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


EMBED_DIM = 4      # stub featurizer width; a real vision tower swaps
EMBED_ROUND = 6    # in at the mapInPandas seam with its own width


def mm_frame_embed_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame featurize-and-pool — the video-embedding plumbing between
    frame sampling and ANN/SemDeDup: every sampled frame gets an
    EMBED_DIM feature vector and frames mean-pool into one video-level
    embedding per document (emitted as per-dimension columns e0..eD-1
    for cross-engine value stability). The featurizer here is a
    deterministic hash of the frame content digest — kept as JVM
    expressions so the whole stage is codegen'd and oracle-checkable;
    a REAL vision tower replaces exactly this step with an
    Arrow-batched mapInPandas over the frame bytes
    (operators/multimodal.py documents the seam), and everything
    downstream — the pooling groupBy, the ANN tier it feeds — is
    unchanged.

    Scale shape: sampling is the existing generator (rows ~ frames/k);
    featurization is a narrow map; the ONE exchange is the
    partial-aggregated per-doc mean pool."""
    media = synthesize_media(_docs(spark, sf_dir))
    frames = sample_frames(media, every_k=2)
    feats = [
        ((F.conv(F.substring(
            F.md5(F.concat("frame_md5", F.lit(f":{j}"))), 1, 8), 16, 10)
          .cast("long") % 1000) / 1000.0).alias(f"f{j}")
        for j in range(EMBED_DIM)
    ]
    per_frame = frames.select("doc_id", *feats)
    return (per_frame.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_frames_pooled"),
                 *[F.round(F.avg(f"f{j}"), EMBED_ROUND).alias(f"e{j}")
                   for j in range(EMBED_DIM)]))


_FRAME_EMBED_SQL = f"""
WITH fr AS (
  SELECT doc_id, unnest(range(0, 1 + doc_id % 8, 2)) AS f FROM documents
), fm AS (
  SELECT doc_id,
         md5(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(f AS VARCHAR)))
           AS frame_md5
  FROM fr
), feats AS (
  SELECT doc_id,
         {", ".join(
             f"(('0x' || substring(md5(frame_md5 || ':{j}'), 1, 8))"
             f"::BIGINT % 1000) / 1000.0 AS f{j}"
             for j in range(EMBED_DIM))}
  FROM fm
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames_pooled,
       {", ".join(f"round(AVG(f{j}), {EMBED_ROUND}) AS e{j}"
                  for j in range(EMBED_DIM))}
FROM feats GROUP BY doc_id
"""


SPARK_QUERIES = {
    "mm_media_meta": mm_media_meta,
    "mm_frame_sample": mm_frame_sample,
    "mm_frame_rollup": mm_frame_rollup,
    "mm_frame_embed_pool": mm_frame_embed_pool,
}

ORACLE_SQL = {
    "mm_media_meta": _MEDIA_META_SQL,
    "mm_frame_sample": _FRAME_SAMPLE_SQL,
    "mm_frame_rollup": _FRAME_ROLLUP_SQL,
    "mm_frame_embed_pool": _FRAME_EMBED_SQL,
}
