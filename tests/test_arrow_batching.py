"""Arrow batching contract (session.py): batches cut on EITHER the
rows cap (2048, amortizes per-batch Python-worker overhead on ~KB
pages) or the bytes cap (16 MB, keeps multi-MB oversized html rows
from concentrating GBs in one worker batch). Swept at local[32]
saturation in BENCH/arrow_batch.json."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ocr_spark.session import ARROW_BATCH_BYTES, ARROW_BATCH_ROWS


def _batch_stats(df):
    def sizes(it):
        for pdf in it:
            yield pd.DataFrame({
                "n": [len(pdf)],
                "b": [int(pdf["payload"].map(len).sum())]})
    return [(r.n, r.b) for r in
            df.mapInPandas(sizes, "n long, b long").collect()]


def test_small_rows_fill_the_rows_cap(spark):
    assert int(spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch")) \
        == ARROW_BATCH_ROWS
    assert int(spark.conf.get(
        "spark.sql.execution.arrow.maxBytesPerBatch")) \
        == ARROW_BATCH_BYTES
    small = (spark.range(3000)
             .select("id", F.lit("x" * 3000).alias("payload"))
             .coalesce(1))
    stats = _batch_stats(small)
    assert max(n for n, _ in stats) == ARROW_BATCH_ROWS
    assert sum(n for n, _ in stats) == 3000


def test_oversized_rows_are_bytes_capped(spark):
    """10 MB rows must land in tiny batches regardless of the 2048-row
    cap — the memory-safety half of the contract (a 2048-row batch of
    10 MB pages would be 20 GB in one Python worker)."""
    big = (spark.range(6)
           .select("id", F.lit("y" * 10_000_000).alias("payload"))
           .coalesce(1))
    stats = _batch_stats(big)
    assert sum(n for n, _ in stats) == 6
    assert max(n for n, _ in stats) <= 2
    # every batch stays within cap + one row's overshoot
    assert all(b <= ARROW_BATCH_BYTES + 10_000_001 for _, b in stats)
