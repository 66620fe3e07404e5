"""End-to-end extraction job: Iceberg-shim scan → salted mapInPandas
extraction → snapshot write → per-wave checkpoint/lineage/metrics commit.

Execution model (SURVEY.md §3.4): one Catalyst-planned job per commit wave —

    input snapshot scan (url, html only — column pruning)
      → [resume filter: skip checkpointed buckets — partition-level skip]
      → salted repartition                    [the ONE shuffle]
      → mapInPandas(extract)                  [Arrow boundary]
      → snapshot write partitioned by bucket  [shuffle-free]
      → bookkeeping appends                   [JVM-side aggregation]

Buckets are grouped into ``waves``; each wave commits atomically through the
shim pointer + a checkpoint append, so a killed run resumes at wave
granularity without reprocessing committed buckets — the cluster-scale
version of the reference's processed-files dedup sets
(/root/reference/service/api/main.py:21-48).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_spark.operators.bookkeeping import (
    commit_bucket_bookkeeping, completed_buckets,
)
from ocr_spark.operators.extraction import (
    DEFAULT_BIG_THRESHOLD, DEFAULT_BUCKETS, run_extraction,
)
from ocr_spark.sources import iceberg_shim as shim


def output_root(work_dir: str) -> str:
    return os.path.join(work_dir, "extracted")


def run_extraction_job(spark: SparkSession, input_table_root: str,
                       work_dir: str, partitions: int = 128,
                       big_partitions: int = 8,
                       big_threshold: int = DEFAULT_BIG_THRESHOLD,
                       n_buckets: int = DEFAULT_BUCKETS,
                       waves: int = 4,
                       fail_after_waves: int | None = None) -> dict:
    """Run (or resume) extraction of the input table's CURRENT snapshot.

    ``fail_after_waves`` is a test hook: raise after N wave commits to
    simulate a mid-job crash for the resume test (SURVEY.md §5.2.5).

    Returns a summary dict (snapshot ids, bucket/doc counts, skipped).
    """
    input_sid = shim.current_snapshot_id(input_table_root)
    if input_sid is None:
        raise FileNotFoundError(f"no input snapshot at {input_table_root}")
    manifest = shim.read_manifest(input_table_root, input_sid)
    pages = shim.read_snapshot(spark, input_table_root, input_sid)

    done = completed_buckets(spark, work_dir, input_sid)
    run_id = uuid.uuid4().hex[:12]

    all_buckets = list(range(n_buckets))
    todo = [b for b in all_buckets if b not in done]
    wave_size = max(1, (len(all_buckets) + waves - 1) // waves)
    wave_groups = [todo[i:i + wave_size] for i in range(0, len(todo), wave_size)]

    out_sids: list[str] = []
    docs_total = 0
    for w, bucket_group in enumerate(wave_groups):
        if not bucket_group:
            continue
        wave_pages = pages.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int"),
        ).filter(F.col("bucket").isin(bucket_group)).drop("bucket")

        extracted = run_extraction(
            wave_pages, partitions=partitions, big_partitions=big_partitions,
            big_threshold=big_threshold, n_buckets=n_buckets,
        )
        out_sid = shim.write_snapshot(
            extracted, output_root(work_dir), partition_by=["bucket"],
            snapshot_id=f"{input_sid[:8]}-{run_id}-w{w}",
        )
        out_sids.append(out_sid)

        from ocr_spark.operators.extraction import EXTRACT_RESULT_SCHEMA
        committed = shim.read_snapshot(spark, output_root(work_dir), out_sid,
                                       schema=EXTRACT_RESULT_SCHEMA)
        commit_bucket_bookkeeping(
            spark, committed, work_dir, snapshot_id=input_sid, run_id=run_id,
            input_files=[manifest["data_dir"]],
            big_threshold=big_threshold, skew_salt=big_partitions,
            buckets=bucket_group,
        )
        docs_total += committed.count()

        if fail_after_waves is not None and (w + 1) >= fail_after_waves:
            raise RuntimeError(f"injected failure after wave {w}")

    return {
        "run_id": run_id,
        "input_snapshot": input_sid,
        "output_snapshots": out_sids,
        "buckets_skipped": len(done),
        "buckets_processed": len(todo),
        "docs": docs_total,
    }


def read_extracted(spark: SparkSession, work_dir: str) -> DataFrame:
    """All committed extraction output across snapshots (buckets are
    disjoint across snapshots by construction — checkpointed buckets are
    never reprocessed)."""
    root = output_root(work_dir)
    dirs = [shim.read_manifest(root, sid)["data_dir"]
            for sid in shim.history(root)]
    # each snapshot dir is its own partitioned table root (bucket=N leaves);
    # snapshots hold disjoint buckets, so a union is exact
    from ocr_spark.operators.extraction import EXTRACT_RESULT_SCHEMA
    dfs = [spark.read.schema(EXTRACT_RESULT_SCHEMA)
           .option("basePath", d).parquet(d) for d in dirs]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
