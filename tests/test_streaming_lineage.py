"""Streaming lineage parity: per-micro-batch lineage rows alongside the
extraction output, exactly-once at batch_id granularity."""

import os

from ocr_spark.gen.corpus import generate_pages
from ocr_spark.streaming.ingest import stream_extract_with_lineage
from tests.test_streaming import _write_pages_batch


def test_stream_extract_with_lineage(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    lineage = str(tmp_path / "lineage")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir, exist_ok=True)
    rows = generate_pages(40, oversized_rows=0)

    _write_pages_batch(spark, rows[:25], in_dir)
    q = stream_extract_with_lineage(spark, in_dir, out, lineage, ckpt)
    q.awaitTermination()
    _write_pages_batch(spark, rows[25:], in_dir)
    q = stream_extract_with_lineage(spark, in_dir, out, lineage, ckpt)
    q.awaitTermination()

    data = spark.read.parquet(out)
    assert data.count() == 40
    assert data.select("url").distinct().count() == 40

    lin = spark.read.parquet(lineage).toPandas()
    # one lineage row per micro-batch, covering every document exactly once
    assert lin["batch_id"].is_unique
    assert int(lin["docs"].sum()) == 40
    assert int(lin["errors"].sum()) == 0
    assert (lin["bytes_in"] > 0).all()
    # data partitions align with lineage batch ids
    data_batches = {r.batch_id for r in
                    data.select("batch_id").distinct().collect()}
    assert data_batches == set(lin["batch_id"].tolist())
