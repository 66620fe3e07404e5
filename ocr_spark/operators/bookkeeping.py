"""Checkpoint / lineage / metrics bookkeeping (FIXTURES.md §4, SURVEY.md §7.6).

The reference's idempotency is two in-memory sets keyed by url-hash
(/root/reference/service/api/main.py:21-48, J5). At cluster scale that
becomes durable tables:

  * ``checkpoints`` — one row per committed url-hash bucket per input
    snapshot; resume = anti-join/filter of input buckets against this table
    (bucket-level skip → partition pruning, cheaper than per-url anti-join;
    a per-url anti-join helper is also provided for finer-grained dedup).
  * ``lineage``    — per-bucket doc counts, ok/failed counts, and a
    failure-reason histogram (MAP<STRING,BIGINT>), plus the input snapshot
    id and files.
  * ``metrics``    — per-bucket wall-time/bytes/doc counters for the bench
    harness and skew monitoring.

All three are computed with JVM-side aggregations over the extraction
output (no extra Python pass) and appended as parquet.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

CHECKPOINT_SCHEMA = ("snapshot_id string, partition_id int, "
                     "url_hash_bucket int, docs_done bigint, "
                     "committed_at timestamp, out_snapshot_id string")
LINEAGE_SCHEMA = ("snapshot_id string, partition_id int, "
                  "input_files array<string>, doc_count bigint, "
                  "ok_count bigint, failed_count bigint, "
                  "failure_reasons map<string,bigint>")
METRICS_SCHEMA = ("run_id string, stage string, partition_id int, "
                  "docs bigint, bytes_in bigint, wall_ms bigint, "
                  "skew_salt int, oversized_count bigint")


def _append(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def checkpoints_path(work_dir: str) -> str:
    return os.path.join(work_dir, "checkpoints")


def lineage_path(work_dir: str) -> str:
    return os.path.join(work_dir, "lineage")


def metrics_path(work_dir: str) -> str:
    return os.path.join(work_dir, "metrics")


def completed_buckets(spark: SparkSession, work_dir: str,
                      snapshot_id: str) -> set[int]:
    """Buckets already committed for this input snapshot (resume filter)."""
    path = checkpoints_path(work_dir)
    if not os.path.exists(path):
        return set()
    rows = (spark.read.schema(CHECKPOINT_SCHEMA).parquet(path)
            .filter(F.col("snapshot_id") == snapshot_id)
            .select("url_hash_bucket").distinct().collect())
    return {r.url_hash_bucket for r in rows}


def anti_join_processed_urls(pages: DataFrame, processed: DataFrame) -> DataFrame:
    """J5 as SQL: drop input rows whose url already appears in ``processed``.
    Catalyst broadcasts the processed side automatically when it is small;
    at scale both sides are bucketed on url so this is a co-located join."""
    return pages.join(processed.select("url"), on="url", how="left_anti")


def commit_bucket_bookkeeping(spark: SparkSession, extracted: DataFrame,
                              work_dir: str, snapshot_id: str, run_id: str,
                              input_files: list[str],
                              big_threshold: int, skew_salt: int,
                              buckets: list[int] | None = None,
                              out_snapshot_id: str | None = None) -> int:
    """Append checkpoint + lineage + metrics rows for every bucket in the
    wave. Called AFTER the wave's data is staged but BEFORE it is
    published (two-phase commit: a crash after this append is rolled
    FORWARD at the next job start by publishing ``out_snapshot_id``; a
    crash before it leaves an invisible staged snapshot that is simply
    redone). ``buckets`` is the wave's full bucket group — buckets with
    zero input rows still get a checkpoint row (docs_done=0) so a resume
    never retries them. Returns the wave's total document count."""
    per_bucket = (
        extracted.groupBy("bucket").agg(
            F.count("*").alias("doc_count"),
            F.sum(F.when(F.col("error").isNull(), 1).otherwise(0)).alias("ok_count"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("failed_count"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("extract_ms").cast("long").alias("wall_ms"),
            F.sum(F.when(F.col("bytes_in") > big_threshold, 1).otherwise(0))
             .alias("oversized_count"),
            # straggler/skew observability (SURVEY §5.2.7): per-doc
            # extract-time spread inside the bucket. percentile_approx
            # is a distributed sketch (no per-bucket collect), so this
            # survives 100 TB; an operator reading the metrics table
            # sees hot buckets (max >> median) without re-running.
            F.round(F.max("extract_ms"), 3).alias("max_doc_ms"),
            F.round(F.percentile_approx("extract_ms", 0.5), 3)
             .alias("median_doc_ms"),
            F.round(F.percentile_approx("extract_ms", 0.99), 3)
             .alias("p99_doc_ms"),
        )
    ).cache()

    now = time.time()
    ckpt_base = per_bucket.select("bucket", "ok_count")
    if buckets is not None:
        all_buckets = spark.createDataFrame(
            [(int(b),) for b in buckets], "bucket int")
        ckpt_base = (all_buckets.join(ckpt_base, on="bucket", how="left")
                     .withColumn("ok_count", F.coalesce("ok_count", F.lit(0))))
    ckpt = ckpt_base.select(
        F.lit(snapshot_id).alias("snapshot_id"),
        F.col("bucket").alias("partition_id"),
        F.col("bucket").alias("url_hash_bucket"),
        F.col("ok_count").cast("long").alias("docs_done"),
        F.lit(now).cast("timestamp").alias("committed_at"),
        F.lit(out_snapshot_id).cast("string").alias("out_snapshot_id"),
    )
    _append(ckpt, checkpoints_path(work_dir))

    # failure histogram: explode error prefixes and re-aggregate (exact)
    failures = (
        extracted.filter(F.col("error").isNotNull())
        .groupBy("bucket", F.substring_index("error", ":", 1).alias("reason"))
        .agg(F.count("*").cast("long").alias("n"))
        .groupBy("bucket")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("reason", "n"))).alias("failure_reasons"))
    )
    lineage = (
        per_bucket.join(failures, on="bucket", how="left")
        .select(
            F.lit(snapshot_id).alias("snapshot_id"),
            F.col("bucket").alias("partition_id"),
            F.array([F.lit(p) for p in input_files]).alias("input_files"),
            "doc_count", "ok_count", "failed_count",
            F.coalesce("failure_reasons",
                       F.map_from_arrays(F.array().cast("array<string>"),
                                         F.array().cast("array<bigint>")))
             .alias("failure_reasons"),
        )
    )
    _append(lineage, lineage_path(work_dir))

    metrics = per_bucket.select(
        F.lit(run_id).alias("run_id"),
        F.lit("extract").alias("stage"),
        F.col("bucket").alias("partition_id"),
        F.col("doc_count").alias("docs"),
        "bytes_in", "wall_ms",
        F.lit(skew_salt).alias("skew_salt"),
        "oversized_count",
        "max_doc_ms", "median_doc_ms", "p99_doc_ms",
    )
    _append(metrics, metrics_path(work_dir))
    docs_total = (per_bucket.agg(F.sum("doc_count")).collect()[0][0]) or 0
    per_bucket.unpersist()
    return int(docs_total)


def completed_buckets_by_snapshot(spark: SparkSession,
                                  work_dir: str) -> dict[str, set[int]]:
    """Committed buckets for EVERY input snapshot in one checkpoint-table
    scan — the chain-processing loop and the incremental base walk both
    need per-snapshot completion state, and N separate filtered reads of
    a growing parquet would pay N Spark jobs for one table's content."""
    path = checkpoints_path(work_dir)
    if not os.path.exists(path):
        return {}
    rows = (spark.read.schema(CHECKPOINT_SCHEMA).parquet(path)
            .select("snapshot_id", "url_hash_bucket").distinct().collect())
    out: dict[str, set[int]] = {}
    for r in rows:
        out.setdefault(r.snapshot_id, set()).add(r.url_hash_bucket)
    return out


def processed_input_snapshots(spark: SparkSession, work_dir: str) -> set[str]:
    """Input snapshot ids with any checkpoint rows — the incremental
    job walks the input snapshot chain back to the newest member of
    this set and processes only data added after it."""
    path = checkpoints_path(work_dir)
    if not os.path.exists(path):
        return set()
    rows = (spark.read.schema(CHECKPOINT_SCHEMA).parquet(path)
            .select("snapshot_id").distinct().collect())
    return {r.snapshot_id for r in rows}


def checkpointed_out_snapshots(spark: SparkSession, work_dir: str) -> set[str]:
    """Output snapshot ids referenced by ANY checkpoint row — the set the
    job roll-forward publishes if a crash landed between the bookkeeping
    append and the pointer swap."""
    path = checkpoints_path(work_dir)
    if not os.path.exists(path):
        return set()
    rows = (spark.read.schema(CHECKPOINT_SCHEMA).parquet(path)
            .filter(F.col("out_snapshot_id").isNotNull())
            .select("out_snapshot_id").distinct().collect())
    return {r.out_snapshot_id for r in rows}
