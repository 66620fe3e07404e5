"""Table sources. ``PAGES_SCHEMA`` is the canonical input-table shape
(BASELINE.json input_hint) — the single definition every reader/writer
imports (WARC source, streaming ingest, bench corpus)."""

from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])
