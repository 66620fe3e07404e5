"""Per-page PageRank + incremental warm-start (plans/linkrank.py).

The oracle pins VALUES (check_oracle / driver CORRECTNESS); these
tests pin the CLAIMS the oracle can't see: that warm-starting from a
prior snapshot's store genuinely buys convergence on a graph deep
enough for iteration count to matter, and that an unchanged graph's
store is (numerically) a fixed point of the short budget.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _chain_edges(spark, n: int, drop_tail: int = 0):
    """A depth-n chain u0→u1→…→u{n-1} plus a hub u0 every 10th node
    links back to (so mass recirculates and the converged vector is
    not reached in a hop or two — unlike the fixture's depth-1 page
    graph, which converges exactly by iteration 2)."""
    rows = [(f"u{i}", f"u{i + 1}") for i in range(n - 1 - drop_tail)]
    rows += [(f"u{i}", "u0") for i in range(10, n - drop_tail, 10)]
    return spark.createDataFrame(rows, "src string, dst string")


def _l1(spark_df_a, spark_df_b) -> float:
    a = {r.url: r.r for r in spark_df_a.collect()}
    b = {r.url: r.r for r in spark_df_b.collect()}
    return sum(abs(a.get(u, 0.0) - b.get(u, 0.0))
               for u in set(a) | set(b))


def test_warm_start_beats_cold_start_at_equal_budget(spark):
    """The incremental claim, on a 60-deep recirculating chain: after
    a small tail change (last 6 edges new), PAGERANK_INC_ITERS rounds
    seeded from the prior graph's converged store land much closer to
    the new graph's converged vector than the same budget from 1/n."""
    from ocr_spark.plans.linkrank import PAGERANK_INC_ITERS, _url_rank_loop

    full = _chain_edges(spark, 60)
    prior_g = _chain_edges(spark, 60, drop_tail=3)
    truth = _url_rank_loop(full, 40)
    store = _url_rank_loop(prior_g, 40).select("url", "r")
    warm = _url_rank_loop(full, PAGERANK_INC_ITERS, seed=store)
    cold = _url_rank_loop(full, PAGERANK_INC_ITERS)
    d_warm, d_cold = _l1(warm, truth), _l1(cold, truth)
    assert d_warm < d_cold / 2, (d_warm, d_cold)


def test_unchanged_graph_warm_iterations_contract(spark):
    """Seeding the SAME graph with its own store and running the short
    budget is a CONTRACTION toward the true fixed point (damping 0.85
    bounds the Jacobian): the vector moves closer to a deep-budget
    truth, never away, and the per-application movement itself decays
    geometrically — the invariant that makes repeated per-snapshot
    warm-starting sound (no drift accumulates across snapshots whose
    graphs didn't change)."""
    from ocr_spark.plans.linkrank import PAGERANK_INC_ITERS, _url_rank_loop

    g = _chain_edges(spark, 60)
    truth = _url_rank_loop(g, 80)
    store = _url_rank_loop(g, 40)
    again = _url_rank_loop(g, PAGERANK_INC_ITERS,
                           seed=store.select("url", "r"))
    once_more = _url_rank_loop(g, PAGERANK_INC_ITERS,
                               seed=again.select("url", "r"))
    assert _l1(again, truth) < _l1(store, truth)
    assert _l1(once_more, truth) < _l1(again, truth)
    # movement per application decays (no oscillation/blow-up)
    assert _l1(once_more, again) < _l1(again, store)


def test_incremental_seeded_flags_match_snapshot_split(spark):
    """On the fixture: arrivals (doc_id % 3 == 2) cold-start, carried
    pages are seeded; partner URLs (link targets) are seeded because
    prior pages already linked to them."""
    from ocr_spark.plans.linkrank import pages_pagerank_incremental

    rows = pages_pagerank_incremental(spark, SF).collect()
    assert rows
    for r in rows:
        if r.url.startswith("https://site"):
            doc_id = int(r.url.rsplit("/", 1)[1])
            assert r.seeded == (doc_id % 3 != 2), r
        else:
            assert r.url.startswith("https://partner")
            assert r.seeded, r
        assert r.pagerank > 0


def test_pagerank_store_shape(spark):
    """Cold per-page ranks: every followed page URL present, nofollow
    pages absent as sources but their canonical URL never appears at
    all (nothing links to doc pages), partners accumulate rank."""
    from ocr_spark.plans.linkrank import pages_pagerank

    rows = pages_pagerank(spark, SF).collect()
    by_url = {r.url: r.pagerank for r in rows}
    assert all(u.startswith(("https://site", "https://partner"))
               for u in by_url)
    # nofollow page 3 emits nothing and receives nothing
    assert "https://site3.example.com/doc/3" not in by_url
    site = [v for u, v in by_url.items() if u.startswith("https://site")]
    partner = [v for u, v in by_url.items()
               if u.startswith("https://partner")]
    assert max(site) < min(partner)  # sources have no inlinks


def test_pagerank_plan_gates(spark):
    """The edge list localCheckpoints before the loop, so the final
    physical plan contains NO Python boundary (the HTML-synthesis
    pandas UDF must run once while building edges, not once per
    iteration) and no non-broadcast nested-loop join (the only
    crossJoin is the 1-row n frame)."""
    from ocr_spark.plans.linkrank import pages_pagerank

    plan = pages_pagerank(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "FlatMapsInPandas" not in plan and "InPandas" not in plan
    assert "CartesianProduct" not in plan


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
