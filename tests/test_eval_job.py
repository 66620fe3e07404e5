"""Extraction-quality regression stage (job.py run_eval_job): committed
extraction output scored against a gold eval set with the token-F1
kernel, per-doc + summary metrics tables appended per run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.job import eval_root, run_eval_job, run_extraction_job
from ocr_spark.sources import iceberg_shim as shim

SF_TINY = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def extracted_work(spark, tmp_path_factory):
    from ocr_spark.plans.extract_queries import pages_from_documents

    input_root = str(tmp_path_factory.mktemp("eval_in"))
    work = str(tmp_path_factory.mktemp("eval_work"))
    pages = pages_from_documents(spark, SF_TINY)
    shim.write_snapshot(pages, input_root)
    run_extraction_job(spark, input_root, work, partitions=8,
                       big_partitions=1, waves=2)
    return spark, work


def _gold(spark, ids=None):
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    if ids is not None:
        docs = docs.filter(F.col("doc_id").isin(*ids))
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
         .alias("url"), "text")


def test_eval_job_scores_gold_set_and_appends_metrics(extracted_work):
    spark, work = extracted_work
    gold = _gold(spark, ids=[1, 2, 3, 5, 8, 13, 21, 34])
    s = run_eval_job(spark, work, gold)
    assert s["n_gold"] == 8 and s["n_scored"] == 8
    assert s["n_unextracted"] == 0
    assert s["full_recall_frac"] == 1.0          # byte-identity corpus
    assert 0.0 < s["min_f1"] <= s["macro_f1"] < 1.0

    per_doc = spark.read.parquet(os.path.join(eval_root(work), "per_doc"))
    rows = {r["url"]: r for r in per_doc.collect()}
    assert len(rows) == 8
    assert all(r["run_id"] == s["run_id"] for r in rows.values())
    assert all(r["token_recall"] == 1.0 for r in rows.values())

    summary = spark.read.parquet(os.path.join(eval_root(work), "summary"))
    assert summary.count() == 1


def test_eval_job_counts_unextracted_gold_urls(extracted_work):
    spark, work = extracted_work
    gold = _gold(spark, ids=[4, 6]).unionByName(
        spark.createDataFrame(
            [("doc://999999", "never crawled gold text")],
            "url string, text string"))
    s = run_eval_job(spark, work, gold)
    assert s["n_gold"] == 3
    assert s["n_unextracted"] == 1               # the missing url
    assert s["n_scored"] == 2                    # null F1 not counted
    assert s["min_f1"] > 0.0

    # the missing url still has an audit row: n_pred=0, null F1
    per_doc = spark.read.parquet(os.path.join(eval_root(work), "per_doc"))
    miss = per_doc.filter((F.col("url") == "doc://999999")
                          & (F.col("run_id") == s["run_id"])).collect()
    assert len(miss) == 1
    assert miss[0]["n_pred"] == 0 and miss[0]["token_f1"] is None

    # appends accumulate: two runs → two summary rows
    summary = spark.read.parquet(os.path.join(eval_root(work), "summary"))
    assert summary.count() == 2
