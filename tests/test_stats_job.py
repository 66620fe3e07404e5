"""Corpus-statistics job stage (job.py run_stats_job): per-extraction-
snapshot mergeable sketch frames committed with lineage, folded by
combined_sketches and verified against a from-scratch recompute."""

from __future__ import annotations

import pytest

from ocr_spark.job import (
    combined_sketches, run_extraction_job, run_stats_job, stats_root,
    verify_stats,
)
from ocr_spark.sources import iceberg_shim as shim


@pytest.fixture(scope="module")
def stats_work(spark, tmp_path_factory):
    from ocr_spark.plans.extract_queries import pages_from_documents

    input_root = str(tmp_path_factory.mktemp("stats_in"))
    work = str(tmp_path_factory.mktemp("stats_work"))
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    shim.write_snapshot(pages, input_root)
    run_extraction_job(spark, input_root, work, partitions=8,
                       big_partitions=1, waves=2)
    summary = run_stats_job(spark, work)
    return spark, work, summary


def test_stats_one_snapshot_per_extraction_snapshot(stats_work):
    spark, work, summary = stats_work
    from ocr_spark.job import output_root

    ext_sids = shim.history(output_root(work))
    st_sids = shim.history(stats_root(work))
    assert len(st_sids) == len(ext_sids) >= 2  # waves=2 → ≥2 snapshots
    covered = {shim.read_manifest(stats_root(work), s)["stats_for"]
               for s in st_sids}
    assert covered == set(ext_sids)
    assert summary["snapshots"] == st_sids


def test_folded_store_equals_from_scratch(stats_work):
    """The whole point of the stage: max/add/bottom-k folds over the
    per-snapshot frames reproduce the from-scratch sketches over all
    extracted text, per cell."""
    spark, work, _ = stats_work
    check = verify_stats(spark, work)
    assert check == {"hll_mismatches": 0, "cms_mismatches": 0,
                     "kmv_mismatches": 0}


def test_stats_job_is_incremental_and_idempotent(stats_work):
    """A re-run with no new extraction snapshots commits nothing; the
    store and its fold are unchanged."""
    spark, work, _ = stats_work
    before = shim.history(stats_root(work))
    again = run_stats_job(spark, work)
    assert again["snapshots"] == []
    assert shim.history(stats_root(work)) == before
    hll = {(r.reg, r.m_reg) for r in
           combined_sketches(spark, work)["hll"].collect()}
    assert hll and all(m >= 1 for _, m in hll)
