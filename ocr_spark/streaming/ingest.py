"""Structured Streaming ingestion for the extraction pipeline.

The reference has NO streaming surface (synchronous request/response,
SURVEY.md §2.10), and the batch job covers the north rule's resumability
via snapshot diff + checkpoint anti-join. This module adds the
Spark-native incremental path a production crawl ingest would use:

  * ``stream_extract`` — a file-source stream over the pages table
    driven with ``Trigger.AvailableNow``: each invocation processes
    exactly the files that arrived since the last run, exactly once,
    tracked by Spark's own streaming checkpoint (offsets + commits).
    The transformation is the SAME salted-partition-free mapInPandas
    extraction kernel as the batch job — streaming micro-batches are
    already bounded, so the explicit two-level salting of the batch job
    is replaced by ``maxFilesPerTrigger``-bounded batches.
  * ``stream_page_metrics`` — event-time windowed aggregation with a
    watermark: pages/minute per lang over ``warc_ts``, late rows beyond
    the watermark dropped — the standard late-data pattern.
  * ``stream_host_counters`` — ``applyInPandasWithState``: a custom
    stateful per-host running counter (docs + bytes seen so far),
    emitting one update row per host per micro-batch. This is the
    streaming-state analogue of the batch job's per-bucket checkpoint
    bookkeeping.

All sinks here are parquet/memory for testability; swapping the sink
for the Iceberg-shim writer is a one-line change at the writeStream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ocr_spark.sources import PAGES_SCHEMA

HOST_STATE_SCHEMA = StructType([
    StructField("docs", LongType()),
    StructField("bytes", LongType()),
])

HOST_OUT_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("docs_total", LongType()),
    StructField("bytes_total", LongType()),
])


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a directory of pages parquet files. New
    files are discovered per micro-batch; ``maxFilesPerTrigger`` bounds
    batch size (the streaming analogue of the batch job's salting —
    micro-batches can't grow unbounded)."""
    return (spark.readStream
            .schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(input_dir))


def stream_extract(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str) -> Any:
    """Incremental extraction: AvailableNow drains all pending files in
    bounded micro-batches, then stops — rerunning after new files land
    processes ONLY the new files (exactly-once via the streaming
    checkpoint). Returns the query handle (caller awaits termination)."""
    from ocr_spark.operators.extraction import (
        EXTRACT_RESULT_SCHEMA, _extract_batches,
    )

    pages = read_pages_stream(spark, input_dir)
    extracted = pages.select("url", "html").withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
    ).mapInPandas(_extract_batches, schema=EXTRACT_RESULT_SCHEMA)

    return (extracted.writeStream
            .format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def stream_page_metrics(spark: SparkSession, input_dir: str,
                        checkpoint_dir: str,
                        watermark: str = "10 minutes",
                        window: str = "1 minute") -> Any:
    """Event-time windowed counts per lang with a watermark: rows later
    than ``watermark`` behind the max seen ``warc_ts`` are dropped; the
    aggregation state for closed windows is evicted — bounded state at
    any input volume. Sink = in-memory table ``page_metrics``."""
    pages = read_pages_stream(spark, input_dir)
    agg = (pages
           .withWatermark("warc_ts", watermark)
           .groupBy(F.window("warc_ts", window).alias("w"), "lang")
           .agg(F.count("*").alias("n_pages"),
                F.sum(F.length("html")).alias("bytes_in"))
           .select(F.col("w.start").alias("window_start"),
                   F.col("w.end").alias("window_end"),
                   "lang", "n_pages", "bytes_in"))
    return (agg.writeStream
            .format("memory")
            .queryName("page_metrics")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def _update_host_state(key: tuple, pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    """Stateful kernel: accumulate (docs, bytes) per host across
    micro-batches; emit the running totals once per batch."""
    docs, nbytes = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        docs += len(pdf)
        nbytes += int(pdf["page_bytes"].sum())
    state.update((docs, nbytes))
    yield pd.DataFrame({"host": [key[0]], "docs_total": [docs],
                        "bytes_total": [nbytes]})


def stream_host_counters(spark: SparkSession, input_dir: str,
                         output_dir: str, checkpoint_dir: str) -> Any:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-host running (docs, bytes) counters surviving across
    micro-batches AND across restarts in the state store. Update mode:
    one row per host per batch with the new totals, appended to parquet
    via foreachBatch (the memory sink cannot recover from a checkpoint;
    foreachBatch is the production pattern for update-mode state)."""
    pages = read_pages_stream(spark, input_dir)
    hosts = pages.select(
        # no trailing slash in the pattern: a path-less url like
        # 'https://example.com' must still attribute to its host
        F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
        F.length("html").alias("page_bytes"))
    counters = hosts.groupBy("host").applyInPandasWithState(
        _update_host_state,
        outputStructType=HOST_OUT_SCHEMA,
        stateStructType=HOST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(output_dir))

    return (counters.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("update")
            .start())
