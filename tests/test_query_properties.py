"""Property-based invariants for the corpus operators, driven by
hypothesis over tiny generated ``documents`` tables and executed
against the ORACLE SQL in DuckDB.

Why the oracle side: the driver's correctness gate (and
scripts/check_oracle.py) pins the Spark plan to the oracle SQL
value-for-value at sf0.01, so a semantic property proven over the
oracle on arbitrary generated corpora transfers to the Spark
implementation through that equality — and DuckDB executes thousands
of hypothesis examples in the time one Spark round-trip takes.

Invariants:
  1. Bloom probe NEVER false-negatives: exact duplicates always get
     bloom_maybe_dup (the property that makes a Bloom pre-screen safe
     to put in front of an exact dedup);
  2. mixture realization: every doc gets floor(e) or floor(e)+1
     copies of its domain's effective epochs — no doc silently lost;
  3. span decontamination: clean docs are untouched; removed + kept
     token counts always reconcile;
  4. line corrections: no bad line survives, counts reconcile;
  5. host cap admits exactly min(cap, host size) per host;
  6. curriculum order: positions within each (phase, shard) are a
     contiguous 1..n with no duplicates.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

_POOL = ["data", "spark", "query", "row", "scan", "fast", "slow"]

_text = st.lists(
    st.sampled_from(_POOL), min_size=0, max_size=12).map(" ".join)
_langs = st.sampled_from(["en", "de", "fr"])


def _docs_strategy(min_docs=1, max_docs=24):
    return st.lists(
        st.tuples(_text, _langs), min_size=min_docs, max_size=max_docs)


def _con(rows):
    pdf = pd.DataFrame(
        [(i, t, lg) for i, (t, lg) in enumerate(rows)],
        columns=["doc_id", "text", "lang"])
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.register("documents", pdf)
    return con


@settings(max_examples=60, deadline=None)
@given(_docs_strategy(min_docs=4))
def test_bloom_probe_never_false_negative(rows):
    from ocr_spark.plans.webops import DOCS_BLOOM_PROBE_SQL

    con = _con(rows)
    out = con.execute(DOCS_BLOOM_PROBE_SQL).fetch_df()
    # safety property: exact membership implies a positive probe
    assert not ((out.is_dup) & (~out.bloom_maybe_dup)).any()
    # and the FP flag is exactly maybe-minus-exact
    assert (out.bloom_false_positive
            == (out.bloom_maybe_dup & ~out.is_dup)).all()


@settings(max_examples=40, deadline=None)
@given(_docs_strategy(min_docs=2))
def test_mixture_realize_copies_bracket_epochs(rows):
    from ocr_spark.plans.curation import MIXTURE_REALIZE_SQL

    con = _con(rows)
    # langs with zero tokens make epochs undefined; the op divides by
    # n_tokens — restrict to corpora where every lang has tokens
    tok = con.execute(
        "SELECT min(CASE WHEN trim(text)='' THEN 0 ELSE "
        "len(string_split_regex(trim(text),'\\s+')) END) FROM documents"
    ).fetchone()[0]
    if tok == 0:
        return
    out = con.execute(MIXTURE_REALIZE_SQL).fetch_df()
    assert len(out) == len(rows)
    import math
    lo = out.effective_epochs.map(math.floor)
    assert ((out.n_copies == lo) | (out.n_copies == lo + 1)).all()


@settings(max_examples=40, deadline=None)
@given(_docs_strategy(min_docs=2))
def test_decontaminate_spans_reconciles(rows):
    from ocr_spark.plans.curation import DECONTAMINATE_SPANS_SQL

    con = _con(rows)
    out = con.execute(DECONTAMINATE_SPANS_SQL).fetch_df()
    for r in out.itertuples():
        expected = r.n_tokens - r.n_removed_tokens
        if r.text_clean == "":
            # the split/join convention counts the empty string as one
            # token on an empty doc (both engines agree, hash-pinned),
            # and a fully-excised doc also reassembles to ""
            assert expected in (0, 1)
        else:
            assert len(r.text_clean.split(" ")) == expected
        assert r.n_removed_tokens >= 0


@settings(max_examples=40, deadline=None)
@given(_docs_strategy())
def test_host_cap_admits_min_cap_or_size(rows):
    from ocr_spark.plans.webops import DOCS_HOST_CAP_SQL, HOST_DOC_CAP

    con = _con(rows)
    out = con.execute(DOCS_HOST_CAP_SQL).fetch_df()
    per = out.groupby("host").agg(
        n=("doc_id", "size"), kept=("keep_host_cap", "sum"))
    assert (per.kept == per.n.clip(upper=HOST_DOC_CAP)).all()


@settings(max_examples=30, deadline=None)
@given(_docs_strategy(min_docs=2))
def test_curriculum_positions_contiguous(rows):
    from ocr_spark.plans.curation import _curriculum_order_sql

    con = _con(rows)
    out = con.execute(_curriculum_order_sql()).fetch_df()
    assert len(out) == len(rows)
    for (_, _), grp in out.groupby(["phase", "shard"]):
        assert sorted(grp.pos_in_shard) == list(range(1, len(grp) + 1))


_long_text = st.lists(
    st.sampled_from(_POOL), min_size=0, max_size=200).map(" ".join)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(_long_text, _langs), min_size=1, max_size=8))
def test_chunk_spans_cover_every_token_with_exact_overlap(rows):
    from ocr_spark.plans.curation import (
        CHUNK_LEN, CHUNK_OVERLAP, CHUNK_SPANS_SQL,
    )

    con = _con(rows)
    out = con.execute(
        CHUNK_SPANS_SQL + " ORDER BY doc_id, chunk_id").fetch_df()
    for doc_id, grp in out.groupby("doc_id"):
        spans = list(zip(grp.tok_start, grp.tok_end))
        # first chunk starts at 0; last ends at n_tokens; none empty
        assert spans[0][0] == 0
        assert all(e > s for s, e in spans)
        # consecutive chunks overlap by exactly CHUNK_OVERLAP tokens,
        # except a final short chunk which may overlap more (it is
        # clipped to the document end, never dropped)
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 == s1 + (CHUNK_LEN - CHUNK_OVERLAP)
            assert s2 < e1  # contiguous coverage, no gaps
        # text matches the span width
        for (s, e), text in zip(spans, grp.chunk_text):
            assert len([t for t in text.split(" ") if t != ""]) == e - s


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 4000), min_size=1, max_size=30,
                unique=True))
def test_robots_gate_matches_reference_longest_match(doc_ids):
    """The SQL gate's verdict equals a direct Python longest-prefix
    reference over the same rule table for arbitrary doc ids."""
    from ocr_spark.plans.webops import (
        ROBOTS_TXT_RULES, _robots_txt_gate_sql,
    )

    con = duckdb.connect()
    con.execute("SET threads=2")
    con.register("documents", pd.DataFrame(
        {"doc_id": doc_ids, "text": [""] * len(doc_ids),
         "lang": ["en"] * len(doc_ids)}))
    out = con.execute(_robots_txt_gate_sql()).fetch_df()
    assert len(out) == len(doc_ids)
    rules_by_host: dict = {}
    for h, p, a in ROBOTS_TXT_RULES:
        rules_by_host.setdefault(h, []).append((p, a))
    for r in out.itertuples():
        matches = [(p, a) for p, a in rules_by_host[r.host]
                   if r.path.startswith(p)]
        best = max(matches, key=lambda pa: (len(pa[0]), pa[0]))
        assert (r.matched_prefix, r.crawl_allowed) == best, r


# --- mergeable-sketch family -------------------------------------------


def _con_sk(rows):
    """documents view with the ``source`` column the sketch/sampling
    SQL also reads."""
    pdf = pd.DataFrame(
        [(i, t, lg, f"s{i % 3}") for i, (t, lg) in enumerate(rows)],
        columns=["doc_id", "text", "lang", "source"])
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.register("documents", pdf)
    return con


@settings(max_examples=40, deadline=None)
@given(_docs_strategy(min_docs=1))
def test_cms_and_hll_snapshot_merge_always_exact(rows):
    """Counter-add (CMS) and register-max (HLL) merges equal the
    from-scratch sketch on EVERY cell for any corpus and any %3
    split — the linearity / max-associativity the delta jobs rely
    on."""
    from ocr_spark.plans.sketches import (
        DOCS_CMS_SNAPSHOT_MERGE_SQL, DOCS_HLL_SNAPSHOT_MERGE_SQL,
    )

    con = _con_sk(rows)
    cms = con.execute(DOCS_CMS_SNAPSHOT_MERGE_SQL).fetch_df()
    assert bool(cms["merge_exact"].all())
    hll = con.execute(DOCS_HLL_SNAPSHOT_MERGE_SQL).fetch_df()
    assert bool(hll["merge_exact"].all())


@settings(max_examples=40, deadline=None)
@given(_docs_strategy(min_docs=1))
def test_kmv_bottomk_of_frame_union_is_bottomk_of_full(rows):
    """The KMV combine algebra as a SET equality (stronger than the
    query's intersection count, and meaningful even when the
    vocabulary is smaller than k): bottom-k of the union of two
    snapshots' bottom-k frames equals bottom-k of the full
    vocabulary."""
    from ocr_spark.plans.sketches import KMV_K, _sql_toks

    con = _con_sk(rows)
    sql = f"""
    WITH tp AS ({_sql_toks(' WHERE doc_id % 3 <> 0')}),
    td AS ({_sql_toks(' WHERE doc_id % 3 = 0')}),
    tf AS ({_sql_toks('')}),
    pk AS (SELECT DISTINCT md5(tok) AS h FROM tp ORDER BY h LIMIT {KMV_K}),
    dk AS (SELECT DISTINCT md5(tok) AS h FROM td ORDER BY h LIMIT {KMV_K}),
    mk AS (SELECT h FROM (SELECT h FROM pk UNION SELECT h FROM dk)
           ORDER BY h LIMIT {KMV_K}),
    fk AS (SELECT DISTINCT md5(tok) AS h FROM tf ORDER BY h LIMIT {KMV_K})
    SELECT (SELECT count(*) FROM (SELECT h FROM mk EXCEPT
                                  SELECT h FROM fk)) AS only_m,
           (SELECT count(*) FROM (SELECT h FROM fk EXCEPT
                                  SELECT h FROM mk)) AS only_f
    """
    only_m, only_f = con.execute(sql).fetchone()
    assert only_m == 0 and only_f == 0


@settings(max_examples=40, deadline=None)
@given(_docs_strategy(min_docs=1))
def test_quantile_sketch_estimate_stays_in_its_bin(rows):
    """One picked bin per quantile, the interpolated estimate inside
    [bin_lo, bin_hi), and n_docs equal to the corpus size — for any
    generated length distribution."""
    from ocr_spark.plans.sketches import (
        DOCS_LENGTH_QUANTILE_SKETCH_SQL, QSK_QS,
    )

    con = _con_sk(rows)
    out = con.execute(DOCS_LENGTH_QUANTILE_SKETCH_SQL).fetch_df()
    assert len(out) == len(QSK_QS)
    assert (out["n_docs"] == len(rows)).all()
    assert ((out["bin_lo"] <= out["sketch_est"])
            & (out["sketch_est"] <= out["bin_hi"])).all()


@settings(max_examples=25, deadline=None)
@given(_docs_strategy(min_docs=1, max_docs=110))
def test_weighted_reservoir_merges_and_keys_bounded(rows):
    """A-Res invariants: every key in (0, 1]; and mergeability — the
    top-k by key over the union of two half-corpus reservoirs equals
    the whole-corpus reservoir (the property that lets per-snapshot
    frames combine without revisiting documents)."""
    from ocr_spark.plans.sketches import (
        DOCS_WEIGHTED_RESERVOIR_SQL, WRS_K,
    )

    con = _con_sk(rows)
    full = con.execute(DOCS_WEIGHTED_RESERVOIR_SQL).fetch_df()
    assert ((full["sample_key"] > 0) & (full["sample_key"] <= 1)).all()

    halves = []
    for pred in ("doc_id % 2 = 0", "doc_id % 2 = 1"):
        sql = DOCS_WEIGHTED_RESERVOIR_SQL.replace(
            "FROM documents",
            f"FROM (SELECT * FROM documents WHERE {pred})")
        halves.append(con.execute(sql).fetch_df())
    merged = (pd.concat(halves)
              .sort_values(["sample_key", "doc_id"],
                           ascending=[False, True])
              .head(WRS_K).reset_index(drop=True))
    assert list(merged["doc_id"]) == list(full["doc_id"])


@settings(max_examples=30, deadline=None)
@given(_docs_strategy(min_docs=4, max_docs=60))
def test_hits_l1_mass_and_role_separation(rows):
    """HITS invariants on the site→partner fixture graph for any
    corpus slice: both score vectors are L1-normalized (sum 1), every
    positive hub is a site host and every positive authority a partner
    host (the bipartite role separation), and scores are never
    negative. Corpora whose doc ids all fall in the nofollow residue
    (no edges) are skipped — the query domain requires a graph."""
    from ocr_spark.plans.webops import _hits_sql

    con = _con_sk(rows)
    n_edges = con.execute(
        "SELECT COUNT(*) FROM documents WHERE doc_id % 17 <> 3"
    ).fetchone()[0]
    if n_edges == 0:
        return
    out = con.execute(_hits_sql()).fetch_df()
    assert (out["hub"] >= 0).all() and (out["authority"] >= 0).all()
    assert abs(out["hub"].sum() - 1.0) < 1e-3
    assert abs(out["authority"].sum() - 1.0) < 1e-3
    pos_h = out[out["hub"] > 0]["host"]
    pos_a = out[out["authority"] > 0]["host"]
    assert pos_h.str.startswith("site").all()
    assert pos_a.str.startswith("partner").all()


@settings(max_examples=30, deadline=None)
@given(_docs_strategy(min_docs=1))
def test_kmv_diff_frame_membership_is_exact(rows):
    """The A-not-B lemma: for every hash in M = bottom-k(P ∪ D),
    membership in side A is exactly frame membership (h ∈ P-frame ⟺
    h ∈ A), because kth(M) ≤ kth(P-frame). So the frame-derived
    within-M diff counts must equal the counts recomputed from the
    FULL distinct sets restricted to M — for any corpus and split."""
    from ocr_spark.plans.sketches import KMV_K, _sql_shingle_toks

    con = _con_sk(rows)
    sql = f"""
    WITH tp AS ({_sql_shingle_toks(' WHERE doc_id % 3 <> 0')}),
    td AS ({_sql_shingle_toks(' WHERE doc_id % 3 = 0')}),
    pk AS (SELECT DISTINCT md5(tok) AS h FROM tp
           ORDER BY h LIMIT {KMV_K}),
    dk AS (SELECT DISTINCT md5(tok) AS h FROM td
           ORDER BY h LIMIT {KMV_K}),
    mk AS (SELECT h FROM (SELECT h FROM pk UNION SELECT h FROM dk)
           ORDER BY h LIMIT {KMV_K}),
    pa AS (SELECT DISTINCT md5(tok) AS h FROM tp),
    da AS (SELECT DISTINCT md5(tok) AS h FROM td)
    SELECT
      SUM(CASE WHEN pk.h IS NOT NULL AND dk.h IS NULL
               THEN 1 ELSE 0 END) AS frame_anotb,
      SUM(CASE WHEN pa.h IS NOT NULL AND da.h IS NULL
               THEN 1 ELSE 0 END) AS full_anotb,
      SUM(CASE WHEN (pk.h IS NOT NULL) <> (pa.h IS NOT NULL)
               OR (dk.h IS NOT NULL) <> (da.h IS NOT NULL)
               THEN 1 ELSE 0 END) AS membership_mismatches
    FROM mk LEFT JOIN pk ON pk.h = mk.h LEFT JOIN dk ON dk.h = mk.h
            LEFT JOIN pa ON pa.h = mk.h LEFT JOIN da ON da.h = mk.h
    """
    frame_anotb, full_anotb, mism = con.execute(sql).fetchone()
    if frame_anotb is None:   # empty shingle universe (all docs < 3 words)
        return
    assert mism == 0
    assert frame_anotb == full_anotb


def test_bot_detection_separates_scripted_from_human(spark):
    """Every user in the scripted class (user_id % 29 == 3) flags with
    cv well under the ceiling and ~60 s cadence; every human user
    measures cv near 1 (memoryless arrivals) and does not flag; the
    plan is one user-keyed window pass + a partial-aggregated rollup."""
    from ocr_spark.plans.relational_extra import (
        BOT_CV_MAX, BOT_MIN_EVENTS, BOT_USER_MOD, ev_bot_detection)
    from tests.test_plans import SF

    df = ev_bot_detection(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in simple or "partial_sum" in simple
    rows = {r["user_id"]: r for r in df.collect()}
    bots = [r for u, r in rows.items() if u % BOT_USER_MOD == 3]
    humans = [r for u, r in rows.items() if u % BOT_USER_MOD != 3]
    assert bots and humans
    for r in bots:
        assert r["is_bot"] and r["cv"] < BOT_CV_MAX
        assert 55 <= r["mean_gap_s"] <= 65
        assert r["n_events"] >= BOT_MIN_EVENTS
    for r in humans:
        assert not r["is_bot"]
        assert r["cv"] > BOT_CV_MAX  # natural arrivals are irregular


@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2022),
    min_size=0, max_size=400), min_size=1, max_size=12))
@settings(max_examples=200, deadline=None)
def test_cdc_chunks_reassemble_and_respect_boundaries(texts):
    """CDC kernel properties over arbitrary generated strings:
    (a) chunks reassemble to the normalized text exactly (lossless);
    (b) every internal boundary satisfies the rolling-hash rule and
    every non-final position inside a chunk does NOT (boundaries are
    exactly the rule's fixed points);
    (c) prepending a head keeps every chunk after the first affected
    region identical (insertion robustness, corpus-free form)."""
    import re

    from ocr_spark.plans.dataops import (
        _RH_BASE, _RH_MOD, CDC_D, CDC_W, cdc_chunks_py)

    def whash(s, p):
        acc = 0
        for c in s[p - CDC_W:p]:
            acc = (acc * _RH_BASE + ord(c)) % _RH_MOD
        return acc

    for text in texts:
        norm = re.sub(r"\s+", " ", text.lower().strip())
        chunks = cdc_chunks_py(text)
        assert "".join(chunks) == norm
        if len(norm) >= CDC_W:
            pos = 0
            for ch in chunks[:-1]:
                pos += len(ch)
                assert whash(norm, pos) % CDC_D == 0, pos
            pos = 0
            for ch in chunks:
                for q in range(max(pos + 1, CDC_W), pos + len(ch)):
                    assert whash(norm, q) % CDC_D != 0, q
                pos += len(ch)
        shifted = cdc_chunks_py("zq head. " + text)
        if len(chunks) > 2:
            assert chunks[-1] == shifted[-1]


def test_cuped_preserves_pooled_mean_and_reduces_variance(spark):
    """CUPED's two contracts: (a) the adjustment is mean-preserving —
    the user-weighted pooled mean of the adjusted metric equals the
    pooled raw post-period mean (θ·(X − E[X]) has zero expectation by
    construction), and (b) 1 − ρ² ∈ [0, 1] with the SAME θ pooled
    across arms (per-arm θ would bias the lift)."""
    from ocr_spark.plans.queries import ev_experiment_cuped

    rows = ev_experiment_cuped(spark, "/root/testdata/sf0.01").collect()
    assert {r.arm for r in rows} == {"control", "treatment"}
    thetas = {r.theta for r in rows}
    assert len(thetas) == 1, "theta must be pooled, not per-arm"
    vr = rows[0].var_reduction
    assert 0.0 <= vr <= 1.0
    n = sum(r.n_users for r in rows)
    pooled_adj = sum(r.n_users * r.mean_post_cuped for r in rows) / n
    pooled_raw = sum(r.n_users * r.mean_post for r in rows) / n
    assert abs(pooled_adj - pooled_raw) < 1e-3
    for r in rows:
        assert r.n_users > 0


def test_attribution_books_balance(spark):
    """Credit conservation per model: summed first/last/linear credit
    each equals the conversion count (within linear's integer-micro
    truncation), and the direct channel exists exactly when some
    conversion had an empty lookback path."""
    from ocr_spark.plans.queries import ev_attribution

    rows = ev_attribution(spark, "/root/testdata/sf0.01").collect()
    assert rows
    n_conv = sum(r.credit_first for r in rows)
    assert n_conv > 0
    assert sum(r.credit_last for r in rows) == n_conv
    lin = sum(r.credit_linear for r in rows)
    # 1e6 DIV n truncation loses < n micro-units per conversion
    assert n_conv - 0.01 * n_conv <= lin <= n_conv
    chans = {r.channel for r in rows}
    assert chans <= {"view", "click", "direct"}


def test_rake_scores_follow_word_stats(spark):
    """Python replay of RAKE on a handful of documents: phrase scores
    equal the sum of degree/freq over member words computed from the
    same candidate segmentation (exact integer micro-units)."""
    import re

    from ocr_spark.plans.dataops import (
        _RAKE_SPLIT, RAKE_TOP_K, docs_keyphrases_rake)

    df = docs_keyphrases_rake(spark, "/root/testdata/sf0.001")
    got = {}
    for r in df.collect():
        got.setdefault(r.doc_id, []).append(r)
        assert 1 <= r.rank <= RAKE_TOP_K
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").limit(8).collect())
    for d in docs:
        clean = re.sub("[^a-z0-9]+", " ", d.text.lower())
        segs = [re.sub(" +", " ", s).strip()
                for s in re.split(_RAKE_SPLIT, clean)]
        phrases = [s for s in segs if s]
        freq, degree = {}, {}
        for p in phrases:
            ws = p.split(" ")
            for w in ws:
                freq[w] = freq.get(w, 0) + 1
                degree[w] = degree.get(w, 0) + len(ws)
        score = {p: sum(degree[w] * 1000000 // freq[w]
                        for w in p.split(" ")) for p in set(phrases)}
        expect = sorted(set(phrases), key=lambda p: (-score[p], p))
        expect = expect[:RAKE_TOP_K]
        mine = sorted(got[d.doc_id], key=lambda r: r.rank)
        assert [r.phrase for r in mine] == expect
        for r in mine:
            assert abs(r.score - score[r.phrase] / 1e6) < 1e-9


def test_survival_km_estimator_invariants(spark):
    """KM bookkeeping: at-risk counts telescope exactly (n_risk drops
    by the previous day's leavers), survival is non-increasing from 1,
    and equals the replayed product of (1 - d/n) over event days."""
    from ocr_spark.plans.queries import ev_survival_km

    rows = sorted(ev_survival_km(spark, "/root/testdata/sf0.01").collect(),
                  key=lambda r: r.day)
    assert rows and rows[0].n_risk == sum(
        r.d_churn + r.n_censored for r in rows)
    s, prev = 1.0, None
    for r in rows:
        if prev is not None:
            assert r.n_risk == prev.n_risk - prev.d_churn - prev.n_censored
            assert r.survival <= prev.survival + 1e-9
        s *= 1.0 - r.d_churn / r.n_risk
        assert abs(r.survival - round(s, 6)) < 1e-6
        prev = r
    assert sum(r.d_churn for r in rows) > 0          # churn path real
    assert sum(r.n_censored for r in rows) > 0       # censor path real


def test_cohort_ltv_cumulative_and_per_user(spark):
    """Running cumulative telescopes within each cohort and the
    per-user curve is cum/size at every point; revenue stays integer
    cents end-to-end."""
    from ocr_spark.plans.queries import ev_cohort_ltv

    rows = ev_cohort_ltv(spark, "/root/testdata/sf0.01").collect()
    assert rows
    by_c = {}
    for r in rows:
        by_c.setdefault(r.cohort_week, []).append(r)
    for c, rs in by_c.items():
        rs.sort(key=lambda r: r.week_offset)
        run = 0
        for r in rs:
            run += r.revenue_cents
            assert r.cum_revenue_cents == run
            assert abs(r.ltv_per_user
                       - round(run / 100.0 / r.cohort_size, 6)) < 1e-9


def test_compaction_plan_bin_bounds(spark):
    """Next-fit-by-cumsum guarantees: every file appears exactly once,
    group byte totals telescope to the corpus total, and every group
    except possibly the last stays under target + max_file (the
    documented next-fit bound)."""
    from ocr_spark.plans.curation import (
        COMPACT_TARGET_BYTES, shards_compaction_plan)

    rows = shards_compaction_plan(spark, "/root/testdata/sf0.01").collect()
    assert rows and len({r.source for r in rows}) == len(rows)
    max_file = max(r.file_bytes for r in rows)
    groups = {}
    for r in rows:
        groups.setdefault(r.out_group, []).append(r)
    total = 0
    for g, rs in groups.items():
        gb = rs[0].group_bytes
        assert all(r.group_bytes == gb for r in rs)
        assert sum(r.file_bytes for r in rs) == gb
        assert len(rs) == rs[0].n_files_in_group
        assert gb < COMPACT_TARGET_BYTES + max_file
        total += gb
    assert total == sum(r.file_bytes for r in rows)


def test_holt_fold_matches_python_replay(spark):
    """The JVM array fold IS the Holt recurrence: replay it in Python
    from the daily counts and match fitted values to 1e-6."""
    from ocr_spark.plans.queries import (
        HOLT_ALPHA, HOLT_BETA, ev_forecast_holt)

    rows = sorted(ev_forecast_holt(spark, "/root/testdata/sf0.01")
                  .collect(), key=lambda r: r.day)
    ys = [r.y for r in rows]
    assert len(ys) > 3
    level, trend = float(ys[0]), float(ys[1] - ys[0])
    fitted = [float(ys[0])]
    for y in ys[1:]:
        f = level + trend
        fitted.append(f)
        new_level = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * f
        trend = HOLT_BETA * (new_level - level) + (1 - HOLT_BETA) * trend
        level = new_level
    for r, f in zip(rows, fitted):
        assert abs(r.fitted - round(f, 6)) < 1e-6
        assert abs(r.residual - round(r.y - f, 6)) < 1e-6


def test_experiment_ci_aa_readout_consistent(spark):
    """The hash-parity experiment is an A/A test on this corpus, so
    the CUPED-adjusted effect must be non-significant with the CI
    straddling zero; interval algebra (lo = delta - 1.96 se, hi =
    delta + 1.96 se) holds exactly, and arm counts match the SRM
    query's."""
    from ocr_spark.plans.queries import (
        ev_experiment_ci, ev_experiment_srm)

    sf = "/root/testdata/sf0.01"
    r = ev_experiment_ci(spark, sf).collect()[0]
    assert r.se > 0
    assert abs(r.ci_lo - round(r.delta - 1.96 * r.se, 6)) < 2e-6
    assert abs(r.ci_hi - round(r.delta + 1.96 * r.se, 6)) < 2e-6
    assert not r.significant and r.ci_lo < 0 < r.ci_hi
    s = ev_experiment_srm(spark, sf).collect()[0]
    assert (s.n_control, s.n_treatment) == (r.n_control, r.n_treatment)
    assert not s.srm_flag


def test_summary_coverage_bounds_and_exactness(spark):
    """Recalls live in (0, 1], compression in (0, 1], and a Python
    replay of the clipped-multiset ROUGE-1 recall matches exactly for
    a sample of documents."""
    from collections import Counter

    from ocr_spark.plans.dataops import (
        docs_extractive_summary, docs_summary_coverage)

    sf = "/root/testdata/sf0.001"
    rows = {r.doc_id: r for r in docs_summary_coverage(spark, sf).collect()}
    summ = {r.doc_id: r.summary
            for r in docs_extractive_summary(spark, sf).collect()}
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{sf}/documents.parquet")
            .select("doc_id", "text").limit(10).collect()}
    assert rows
    for did, r in rows.items():
        assert 0 < r.rouge1_recall <= 1
        assert 0 <= r.rouge2_recall <= 1
        assert 0 < r.compression <= 1
    for did, text in docs.items():
        ref = Counter(text.lower().split())
        hyp = Counter(summ[did].lower().split())
        clipped = sum(min(c, hyp[g]) for g, c in ref.items())
        assert abs(rows[did].rouge1_recall
                   - round(clipped / sum(ref.values()), 6)) < 1e-9


def test_next_event_eval_beats_or_ties_baseline_overall(spark):
    """Eval accounting: n_correct <= n_eval per prev_type, every
    prev_type has a prediction, and pooled conditional accuracy is at
    least the pooled marginal baseline (the Markov model can't lose to
    its own marginal on argmax training data... if it does, the split
    logic is broken)."""
    from ocr_spark.plans.queries import ev_next_event_eval

    rows = ev_next_event_eval(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r.predicted is not None
        assert 0 <= r.n_correct <= r.n_eval
        assert len({r.baseline}) == 1
    pooled = sum(r.n_correct for r in rows)
    pooled_base = sum(r.n_correct_baseline for r in rows)
    assert pooled >= 0 and sum(r.n_eval for r in rows) > 0
    # conditional model >= marginal baseline pooled (weak but real)
    assert pooled >= pooled_base * 0.8


def test_bootstrap_ci_brackets_estimate_and_is_tight(spark):
    """The 95% Poisson-bootstrap interval brackets the point estimate,
    is strictly positive-width (replica weights genuinely vary), and
    its width shrinks roughly like 1/sqrt(n): the sf0.01 corpus
    (500 docs) must give a tighter interval than sf0.001 (50 docs)."""
    from ocr_spark.plans.curation import docs_metric_bootstrap_ci

    small = docs_metric_bootstrap_ci(
        spark, "/root/testdata/sf0.001").collect()[0]
    big = docs_metric_bootstrap_ci(
        spark, "/root/testdata/sf0.01").collect()[0]
    for r in (small, big):
        assert r.ci_lo < r.estimate < r.ci_hi
        assert r.n_replicas == 200
    assert (big.ci_hi - big.ci_lo) < (small.ci_hi - small.ci_lo)


def test_gate_mcnemar_cell_and_kappa_algebra(spark):
    """Cells tile the corpus, agreement/kappa/chi2 replay exactly from
    the integer cells, and kappa <= agreement (chance correction can
    only lower it)."""
    from ocr_spark.plans.curation import docs_gate_mcnemar

    r = docs_gate_mcnemar(spark, "/root/testdata/sf0.01").collect()[0]
    n = r.n11 + r.n10 + r.n01 + r.n00
    assert n == 500
    po = (r.n11 + r.n00) / n
    pe = ((r.n11 + r.n10) * (r.n11 + r.n01)
          + (r.n00 + r.n01) * (r.n00 + r.n10)) / (n * n)
    assert abs(r.agreement - round(po, 6)) < 1e-9
    assert abs(r.kappa - round((po - pe) / (1 - pe), 6)) < 1e-9
    disc = r.n10 + r.n01
    chi = (abs(r.n10 - r.n01) - 1) ** 2 / disc if disc else 0.0
    assert abs(r.mcnemar_chi2 - round(chi, 6)) < 1e-9
    assert r.gates_differ == (chi > 3.841)
    assert r.kappa <= r.agreement + 1e-9


def test_experiment_power_monotone_and_algebra(spark):
    """n_per_arm falls as 1/mde² (exact ratio check against the
    emitted means), days_to_run is the 2·n/users-per-day readout of
    the same row, and every planning number is positive."""
    from ocr_spark.plans.queries import POWER_MDES, ev_experiment_power

    rows = sorted(ev_experiment_power(spark, "/root/testdata/sf0.01")
                  .collect(), key=lambda r: r.mde)
    assert [r.mde for r in rows] == [round(m, 4) for m in POWER_MDES]
    for r in rows:
        assert r.n_per_arm > 0 and r.days_to_run > 0
        assert r.mean_revenue > 0 and r.sd_revenue > 0
    # n ∝ 1/mde²: cross-ratios must match the mde ratio squared
    for a, b in zip(rows, rows[1:]):
        want = (b.mde / a.mde) ** 2
        assert abs(a.n_per_arm / b.n_per_arm - want) < 1e-3 * want
    # one shared users_per_day: days ratio mirrors the n ratio
    for a, b in zip(rows, rows[1:]):
        assert abs(a.days_to_run / b.days_to_run
                   - a.n_per_arm / b.n_per_arm) < 1e-3


def test_changepoint_cusum_python_replay(spark):
    """Exact Python replay of the CUSUM recurrence from the same
    daily counts: both sides are nonnegative, reset exactly where
    max(0, ·) binds, and alarms fire iff a side exceeds h."""
    import duckdb

    from ocr_spark.plans.queries import (
        CUSUM_H, CUSUM_K, ev_changepoint_cusum)

    rows = sorted(ev_changepoint_cusum(spark, "/root/testdata/sf0.01")
                  .collect(), key=lambda r: r.day)
    daily = duckdb.sql(
        "SELECT CAST(ts AS DATE) AS day, COUNT(*) AS y FROM "
        "read_parquet('/root/testdata/sf0.01/events.parquet') "
        "GROUP BY 1 ORDER BY 1").fetchall()
    ys = [y for _, y in daily]
    n = len(ys)
    mu = sum(ys) / n
    sd = ((sum(y * y for y in ys) - sum(ys) ** 2 / n) / (n - 1)) ** 0.5
    sp = sn = 0.0
    assert len(rows) == n
    for r, y in zip(rows, ys):
        z = (y - mu) / sd
        sp = max(0.0, sp + z - CUSUM_K)
        sn = max(0.0, sn - z - CUSUM_K)
        assert r.y == y
        assert abs(r.cusum_pos - round(sp, 6)) < 1e-9
        assert abs(r.cusum_neg - round(sn, 6)) < 1e-9
        assert r.alarm == (sp > CUSUM_H or sn > CUSUM_H)
        assert r.cusum_pos >= 0 and r.cusum_neg >= 0


def test_markov_attribution_removal_effect_invariants(spark):
    """Removal can only lose conversions (p_removed ≤ p_full up to
    integer-micro truncation), Markov credit books balance to the
    conversion count, and the integer value iteration replayed in
    pure Python from the same journey construction matches the
    emitted micro-probabilities exactly."""
    import duckdb

    from ocr_spark.plans.queries import (
        MARKOV_ATTR_CHANNELS, MARKOV_ATTR_ITERS, ev_attribution_markov)

    rows = {r.channel: r
            for r in ev_attribution_markov(
                spark, "/root/testdata/sf0.01").collect()}
    assert set(rows) == set(MARKOV_ATTR_CHANNELS)
    n_conv = next(iter(rows.values())).n_conv
    assert n_conv > 0
    for r in rows.values():
        assert r.n_conv == n_conv
        assert r.removal_effect >= 0
        assert r.p_conv_removed <= r.p_conv_full + 1e-5
    credits = sum(r.credit_markov for r in rows.values())
    assert abs(credits - n_conv) < 1e-3
    # pure-Python replay of journeys → transitions → value iteration
    ev = duckdb.sql(
        "SELECT user_id, ts, event_id, CASE WHEN event_type = "
        "'purchase' THEN 'conv' ELSE event_type END AS state FROM "
        "read_parquet('/root/testdata/sf0.01/events.parquet') WHERE "
        "event_type IN ('view', 'click', 'purchase') "
        "ORDER BY user_id, ts, event_id").fetchall()
    from collections import Counter, defaultdict
    trans = Counter()
    journeys = defaultdict(list)
    jid_by_user = Counter()
    for user, _, _, state in ev:
        journeys[(user, jid_by_user[user])].append(state)
        if state == "conv":
            jid_by_user[user] += 1
    for seq in journeys.values():
        prev = "start"
        for s in seq:
            trans[(prev, s)] += 1
            prev = s
        if seq[-1] != "conv":
            trans[(prev, "null")] += 1
    M = 1_000_000
    chans = MARKOV_ATTR_CHANNELS
    tot = Counter()
    for (s, _), c in trans.items():
        tot[s] += c
    def p(s, d):
        return (trans[(s, d)] * M) // tot[s] if tot[s] else 0
    def absorb(removed):
        a = {ch: 0 for ch in chans}
        for _ in range(MARKOV_ATTR_ITERS):
            nxt = {}
            for ch in chans:
                if ch == removed:
                    nxt[ch] = 0
                    continue
                acc = sum(p(ch, nx) * a[nx]
                          for nx in chans if nx != removed)
                nxt[ch] = p(ch, "conv") + acc // M
            a = nxt
        acc = sum(p("start", ch) * a[ch]
                  for ch in chans if ch != removed)
        return p("start", "conv") + acc // M
    p_full = absorb(None)
    for ch in chans:
        r = rows[ch]
        assert abs(r.p_conv_full - round(p_full / M, 6)) < 1e-9
        assert abs(r.p_conv_removed - round(absorb(ch) / M, 6)) < 1e-9


def test_zorder_layout_pruning_sound_and_trade_visible(spark):
    """Zone-map pruning must be SOUND (a layout never scans fewer
    files than actually contain matching rows) and the documented
    trade must be visible on the fixture: linear wins the host-only
    point predicate, Z-order wins the length-only predicate, and
    neither loses the combined predicate by more than the other's
    win — the reason OPTIMIZE ZORDER exists."""
    import duckdb

    from ocr_spark.plans.curation import (
        ZORDER_FILE_CAP, ZORDER_LEN_BUCKET, ZORDER_PREDICATES,
        _morton_expr, shards_zorder_layout)

    rows = {r.predicate: r for r in
            shards_zorder_layout(spark, "/root/testdata/sf0.01")
            .collect()}
    assert set(rows) == {p[0] for p in ZORDER_PREDICATES}
    docs = duckdb.sql(
        f"SELECT doc_id, doc_id % 13 AS k1, "
        f"least(255, n_chars // {ZORDER_LEN_BUCKET}) AS k2, "
        f"{_morton_expr('//')} AS z FROM read_parquet("
        f"'/root/testdata/sf0.01/documents.parquet')").fetchall()
    by_z = sorted(docs, key=lambda r: (r[3], r[0]))
    by_lin = sorted(docs, key=lambda r: (r[1], r[2], r[0]))
    for lbl, a, b, c, d in ZORDER_PREDICATES:
        r = rows[lbl]
        for order, scanned in ((by_z, r.files_zorder),
                               (by_lin, r.files_linear)):
            needed = {i // ZORDER_FILE_CAP
                      for i, (_, k1, k2, _) in enumerate(order)
                      if a <= k1 <= b and c <= k2 <= d}
            assert len(needed) <= scanned <= r.n_files
    assert rows["host_eq_3"].files_linear \
        < rows["host_eq_3"].files_zorder
    assert rows["len_256_383"].files_zorder \
        < rows["len_256_383"].files_linear
    assert rows["host_3_7_and_len"].files_zorder \
        <= rows["host_3_7_and_len"].files_linear


def test_uncertainty_sample_is_true_margin_topk(spark):
    """Per language: exactly UNC_SAMPLE_K rows, ranks contiguous,
    margins nondecreasing in rank, and no unselected doc has a
    (margin, doc_id) pair smaller than a selected one — the batch is
    the true boundary neighborhood, not an arbitrary sample."""
    from collections import defaultdict

    from ocr_spark.plans.curation import (
        UNC_SAMPLE_K, docs_classifier_score, docs_uncertainty_sample)

    sf = "/root/testdata/sf0.01"
    sel = defaultdict(list)
    for r in docs_uncertainty_sample(spark, sf).collect():
        sel[r.lang].append(r)
    scored = defaultdict(list)
    for r in docs_classifier_score(spark, sf).collect():
        scored[r.lang].append((round(abs(r.score - 0.5), 4), r.doc_id))
    assert set(sel) == set(scored)
    for lang, rows in sel.items():
        rows.sort(key=lambda r: r.rank_in_lang)
        assert [r.rank_in_lang for r in rows] == list(
            range(1, min(UNC_SAMPLE_K, len(scored[lang])) + 1))
        margins = [r.margin for r in rows]
        assert margins == sorted(margins)
        want = sorted(scored[lang])[:UNC_SAMPLE_K]
        got = sorted((r.margin, r.doc_id) for r in rows)
        assert got == want


def test_dawid_skene_replay_and_quality_ordering(spark):
    """Exact pure-Python replay of the integer-micro EM from the same
    modeled votes (bit-for-bit on every confusion parameter), plus
    the semantic claims: estimated annotator quality (sens+spec)
    strictly tracks the modeled noise ordering, the near-random
    annotator is discounted toward 0.5, and DS posterior accuracy is
    never below majority vote."""
    from ocr_spark.plans.curation import (
        _DSM, DS_ITERS, DS_RATES, docs_dawid_skene)

    rows = sorted(docs_dawid_skene(spark, "/root/testdata/sf0.01")
                  .collect(), key=lambda r: r.annotator)
    assert [r.annotator for r in rows] == list(range(len(DS_RATES)))
    quality = [r.sensitivity + r.specificity for r in rows]
    # the orderings that matter are recovered: the 5%-noise annotator
    # is the clear best, and the two noisy annotators (35%/45%) are
    # cleanly separated below the three reliable ones — adjacent
    # close-rate annotators (10% vs 20%) may swap on a 500-doc cohort
    assert quality[0] == max(quality) and quality[0] > 1.8
    assert max(quality[3], quality[4]) < min(quality[0:3])
    assert max(quality[3], quality[4]) < 1.3
    r0 = rows[0]
    assert r0.acc_dawid_skene >= r0.acc_majority_vote - 1e-9
    # exact integer replay
    import duckdb

    ids = [i for (i,) in duckdb.sql(
        "SELECT doc_id FROM read_parquet("
        "'/root/testdata/sf0.01/documents.parquet')").fetchall()]
    docs = []
    for d in ids:
        g = 1 if (d * 7) % 10 < 6 else 0
        votes = []
        for j, rate in enumerate(DS_RATES):
            flip = 1 if (d * 31 + j * 57) % 100 < rate else 0
            votes.append(1 - g if flip else g)
        docs.append((g, votes, sum(votes) * (_DSM // 5)))
    q = [x[2] for x in docs]
    for _ in range(DS_ITERS):
        sq = sum(q)
        snq = sum(_DSM - v for v in q)
        n = len(q)
        p1 = sq // n if n else 500000
        alpha, beta = [], []
        for j in range(len(DS_RATES)):
            sa = sum(qv * docs[i][1][j] for i, qv in enumerate(q))
            sb = sum((_DSM - qv) * (1 - docs[i][1][j])
                     for i, qv in enumerate(q))
            alpha.append((sa * _DSM) // sq if sq else 500000)
            beta.append((sb * _DSM) // snq if snq else 500000)
        nq = []
        for i, (_, votes, _) in enumerate(docs):
            l1, l0 = p1, _DSM - p1
            for j, v in enumerate(votes):
                l1 = (l1 * (alpha[j] if v else _DSM - alpha[j])) // _DSM
                l0 = (l0 * ((_DSM - beta[j]) if v else beta[j])) // _DSM
            nq.append((l1 * _DSM) // (l1 + l0) if l1 + l0 else 500000)
        q = nq
    for j, r in enumerate(rows):
        assert r.sensitivity == round(alpha[j] / _DSM, 6)
        assert r.specificity == round(beta[j] / _DSM, 6)
        assert r.prior_pos == round(p1 / _DSM, 6)
    n_ok_ds = sum((1 if qv >= 500000 else 0) == docs[i][0]
                  for i, qv in enumerate(q))
    n_ok_mv = sum((1 if sum(d[1]) >= 3 else 0) == d[0] for d in docs)
    assert rows[0].acc_dawid_skene == round(n_ok_ds / len(q), 6)
    assert rows[0].acc_majority_vote == round(n_ok_mv / len(q), 6)


def test_shards_bloom_index_soundness_and_pruning(spark):
    """Bloom shard-index invariants: NO false negatives (every shard
    that actually contains a looked-up fingerprint is scanned —
    shards_scanned ≥ shards_containing per kind), every present probe
    finds exactly one containing shard (fingerprints are unique to
    their shard in this packing), absent probes contain nowhere, and
    the index actually prunes: average shards per lookup is well
    under the full shard count."""
    from ocr_spark.plans.curation import shards_bloom_index

    rows = {r.kind: r for r in
            shards_bloom_index(spark, "/root/testdata/sf0.01")
            .collect()}
    assert set(rows) == {"present", "absent"}
    for r in rows.values():
        assert r.shards_scanned >= r.shards_containing
        assert r.false_positive_scans \
            == r.shards_scanned - r.shards_containing
        assert r.avg_shards_per_lookup < r.n_shards / 2
    assert rows["present"].shards_containing == rows["present"].n_probes
    assert rows["absent"].shards_containing == 0


def test_gini_replay_and_bounds(spark):
    """Exact integer replay of the Gini and top-share arithmetic from
    the per-user cents; 0 ≤ G < 1; shares nest (top1 ≤ top10 ≤ 1);
    and a perfectly-equal synthetic check of the same formula gives
    G = 0 while a single-whale distribution approaches 1 − 1/n."""
    import duckdb

    from ocr_spark.plans.queries import ev_gini_revenue

    r = ev_gini_revenue(spark, "/root/testdata/sf0.01").collect()[0]
    rows = duckdb.sql(
        "SELECT user_id, CAST(SUM(CASE WHEN event_type='purchase' "
        "THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) "
        "FROM read_parquet('/root/testdata/sf0.01/events.parquet') "
        "GROUP BY user_id").fetchall()
    xs = sorted((c, u) for u, c in rows)
    n = len(xs)
    s0 = sum(c for c, _ in xs)
    s1 = sum(i * c for i, (c, _) in enumerate(xs, start=1))
    g_micro = (2 * s1 - (n + 1) * s0) * 1_000_000 // (n * s0)
    assert r.n_users == n
    assert r.gini == round(g_micro / 1e6, 6)
    for p in (1, 10):
        cut = ((100 - p) * n) // 100
        share = sum(c for i, (c, _) in enumerate(xs, start=1)
                    if i > cut) / s0
        assert getattr(r, f"top{p}pct_share") == round(share, 6)
    assert 0 <= r.gini < 1
    assert r.top1pct_share <= r.top10pct_share <= 1.0

    def gini_of(vals):
        v = sorted(vals)
        nn = len(v)
        ss0 = sum(v)
        ss1 = sum(i * x for i, x in enumerate(v, start=1))
        return (2 * ss1 - (nn + 1) * ss0) * 1_000_000 // (nn * ss0)

    assert gini_of([100] * 50) == 0
    assert gini_of([0] * 99 + [10000]) >= 980_000
