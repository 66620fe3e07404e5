"""Active-learning annotation-batch job stage (job.py
run_labeling_job / verify_labeling): extraction output → classifier
margins → per-language batch committed with verifiable digests."""

from __future__ import annotations

import pytest

from ocr_spark.job import (
    run_extraction_job, run_labeling_job, verify_labeling,
)
from ocr_spark.sources import iceberg_shim as shim


@pytest.fixture(scope="module")
def labeled(spark, tmp_path_factory):
    from ocr_spark.plans.extract_queries import pages_from_documents

    input_root = str(tmp_path_factory.mktemp("lab_in"))
    work = str(tmp_path_factory.mktemp("lab_work"))
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    shim.write_snapshot(pages, input_root)
    run_extraction_job(spark, input_root, work, partitions=8,
                       big_partitions=1, waves=2)
    summary = run_labeling_job(spark, work)
    return spark, work, summary


def test_batch_committed_with_contiguous_ranks(labeled):
    spark, work, summary = labeled
    from ocr_spark.plans.curation import UNC_SAMPLE_K

    batch = spark.read.parquet(summary["batch_path"])
    rows = batch.collect()
    assert len(rows) == summary["n_docs"] > 0
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert len(by_lang) == summary["n_langs"]
    for lang, rs in by_lang.items():
        ranks = sorted(r.rank_in_lang for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= UNC_SAMPLE_K
        for r in rs:
            assert 0.0 <= r.margin <= 0.5
            assert r.lang_digest == summary["digests"][lang]


def test_batch_is_true_margin_topk(labeled):
    """No document outside the batch has a strictly smaller
    (margin, url) pair than a batch member of the same language —
    the selection is the real boundary neighborhood."""
    spark, work, summary = labeled
    from ocr_spark.job import _labeling_batch

    rows, digests = _labeling_batch(spark, work, 10**9)  # full ranking
    full = {}
    for r in rows:
        full.setdefault(r.lang, []).append((r.margin, r.url))
    batch = spark.read.parquet(summary["batch_path"]).collect()
    chosen = {}
    for r in batch:
        chosen.setdefault(r.lang, []).append((r.margin, r.url))
    for lang, sel in chosen.items():
        want = sorted(full[lang])[:len(sel)]
        assert sorted(sel) == want


def test_verify_catches_nothing_on_clean_store_and_reruns_stably(labeled):
    spark, work, summary = labeled
    check = verify_labeling(spark, work, summary["run_id"])
    assert check["ok"], check
    # a second committed run on the same snapshot is bit-identical
    again = run_labeling_job(spark, work)
    assert again["digests"] == summary["digests"]


def test_verify_all_covers_labeling_stage(labeled):
    """The one-call integrity check reports the labeling stage
    present and clean when batches exist, and absent (not failed)
    in a work dir where the stage never ran."""
    spark, work, summary = labeled
    from ocr_spark.job import verify_all

    check = verify_all(spark, work)
    assert check["stages"]["labeling"]["present"]
    assert not check["stages"]["labeling"]["mismatches"]
    assert check["stages"]["labeling"]["runs"] >= 1


def test_partial_run_dir_reports_mismatch_not_crash(labeled):
    """A crash mid-write must never break the integrity sweep: the
    writer stages under _tmp_run=<id> (invisible to the run=* glob)
    and renames atomically, and verify_labeling_all reports an
    unreadable/partial run dir as a mismatch instead of raising —
    verify_all's stage semantics are present/absent/failed, never
    crash."""
    import os

    from ocr_spark.job import labeling_root, verify_labeling_all

    spark, work, summary = labeled
    root = labeling_root(work)
    # simulate a crash mid-write: a partial run dir with a garbage
    # parquet part (what a torn direct write would have left behind)
    bad = os.path.join(root, "run=deadbeef0000")
    os.makedirs(bad, exist_ok=True)
    with open(os.path.join(bad, "part-00000.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    # and a staged-but-never-promoted tmp dir: must be ignored
    tmp = os.path.join(root, "_tmp_run=cafecafe0000")
    os.makedirs(tmp, exist_ok=True)
    try:
        res = verify_labeling_all(spark, work)
        assert "deadbeef0000" in res["mismatches"]
        assert "_unreadable" in res["mismatches"]["deadbeef0000"]
        # the staged tmp dir is not counted as a run at all
        assert "cafecafe0000" not in res["mismatches"]
        assert res["runs"] >= 2  # clean run(s) + the partial one
    finally:
        import shutil
        shutil.rmtree(bad, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)


def test_shared_scorer_equals_contract_classifier(spark):
    """curation.classifier_score_frame IS the docs_classifier_score
    recipe: over the same documents table the shared helper's scores
    equal the oracle-checked contract query's, doc for doc — the
    one-implementation claim the labeling job and the streaming PSI
    monitor lean on."""
    from pyspark.sql import functions as F

    from ocr_spark.plans.curation import (
        classifier_score_frame, docs_classifier_score)

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet") \
        .select(F.col("doc_id").cast("string").alias("url"), "text")
    helper = {r.url: r.score
              for r in classifier_score_frame(docs).collect()}
    contract = {str(r.doc_id): r.score
                for r in docs_classifier_score(spark, sf).collect()}
    assert helper == contract
