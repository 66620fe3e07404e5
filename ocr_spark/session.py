"""SparkSession factory with the engine's scale-oriented defaults.

Config rationale (SURVEY.md §4.2):
  * Arrow batches are capped LOW (128 rows) because extraction rows carry
    multi-MB ``html`` payloads — the 10k default would put ~GBs in one
    Python-worker batch and OOM it.
  * ``useLargeVarTypes`` keeps >2 GiB-safe binary/string Arrow buffers.
  * AQE on: coalescing + skew-join splitting for the analytics queries.
  * shuffle.partitions sized for local[N] testing; a real cluster run
    overrides via spark-submit --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = int(os.environ.get("OCR_SPARK_ARROW_BATCH", "128"))


def get_spark(app_name: str = "ocr_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    master = master or os.environ.get("OCR_SPARK_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master == "local[*]" and cpus:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("OCR_SPARK_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_BATCH_ROWS))
        .config("spark.sql.execution.arrow.useLargeVarTypes", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory",
                os.environ.get("OCR_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
