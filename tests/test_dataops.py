"""Dataops scale-guard behavior not covered by the value oracle."""

from pyspark.sql import functions as F

from ocr_spark.plans.dataops import (
    LSH_BUCKET_CAP, docs_minhash_lsh_pairs, docs_minhash_signature,
)


def _write_docs(spark, tmp_path, texts):
    df = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_lsh_bucket_cap_guards_degenerate_duplicates(spark, tmp_path):
    """A mass-duplicated page must NOT produce O(n²) candidate pairs:
    its buckets exceed LSH_BUCKET_CAP and are excluded (exact dedup owns
    those docs). Distinct docs still pair normally."""
    spam = "buy cheap widgets now best price free shipping today only deal"
    near_a = "the quick brown fox jumps over the lazy dog every day"
    near_b = "the quick brown fox jumps over the lazy dog every night"
    texts = [spam] * (LSH_BUCKET_CAP + 30) + [near_a, near_b]
    sf_dir = _write_docs(spark, tmp_path, texts)

    pairs = docs_minhash_lsh_pairs(spark, sf_dir).collect()
    spam_ids = set(range(LSH_BUCKET_CAP + 30))
    spam_pairs = [p for p in pairs
                  if p.doc_a in spam_ids and p.doc_b in spam_ids]
    assert not spam_pairs, "degenerate bucket leaked O(n^2) pairs"
    # the two genuine near-dups still collide on at least one band
    others = [(p.doc_a, p.doc_b) for p in pairs]
    assert (len(texts) - 2, len(texts) - 1) in others


def test_signature_stable_under_partitioning(spark, tmp_path):
    texts = [f"alpha beta gamma delta epsilon zeta eta theta doc {i}"
             for i in range(40)]
    sf_dir = _write_docs(spark, tmp_path, texts)
    one = {r.doc_id: r.minhash_sig
           for r in docs_minhash_signature(spark, sf_dir).collect()}
    many = {r.doc_id: r.minhash_sig
            for r in docs_minhash_signature(spark, sf_dir)
            .repartition(16).collect()}
    assert one == many


def test_clustered_embedding_fixture_has_structure():
    """The mixture-of-Gaussians fixture must be deterministic and have
    REAL cosine cluster structure (within-cluster >> cross-cluster) —
    the property the driver's synthetic embeddings lack, and the one
    ANN recall tuning depends on (VERDICT r2 #5)."""
    import numpy as np

    from ocr_spark.gen.embeddings import clustered_embeddings

    v1, l1 = clustered_embeddings(n=200, n_clusters=10, seed=1234)
    v2, l2 = clustered_embeddings(n=200, n_clusters=10, seed=1234)
    assert np.array_equal(v1, v2) and np.array_equal(l1, l2)
    # all unit-norm
    assert np.allclose(np.linalg.norm(v1, axis=1), 1.0, atol=1e-5)
    sims = v1 @ v1.T
    same = sims[l1[:, None] == l1[None, :]]
    cross = sims[(l1[:, None] != l1[None, :])]
    assert same.mean() > 0.6
    assert abs(cross.mean()) < 0.2
    assert same.mean() > cross.mean() + 0.5


def test_minhash_jaccard_estimate_tracks_exact(spark):
    """The signature-overlap estimator vs the exact-gram verifier on
    the same LSH candidates: identical texts have identical signatures
    (estimate exactly 1.0), and the estimator's error stays within a
    few sigma (K=16 → sigma ~0.125) of the exact value on every pair."""
    from ocr_spark.plans.dataops import (
        docs_jaccard_verify_candidates, docs_minhash_jaccard_estimate,
    )

    SF = "/root/testdata/sf0.01"
    est = {(r.doc_a, r.doc_b): r.jaccard_est
           for r in docs_minhash_jaccard_estimate(spark, SF).collect()}
    exact = {(r.doc_a, r.doc_b): r.jaccard
             for r in docs_jaccard_verify_candidates(spark, SF).collect()}
    common = set(est) & set(exact)
    assert common
    for k in common:
        if exact[k] == 1.0:
            assert est[k] == 1.0, (k, est[k])
        assert abs(est[k] - exact[k]) <= 0.5, (k, est[k], exact[k])


def test_bpe_artifact_validates_loudly(tmp_path, monkeypatch):
    """A malformed merges artifact must raise, not silently tokenize
    wrong — the same loud-failure discipline as the layout/OCR/CRF
    artifact heads (tests/test_inference.py)."""
    import json

    import pytest

    from ocr_spark.plans import dataops

    good = json.load(open(dataops.BPE_ARTIFACT, encoding="utf-8"))

    def _write(obj):
        p = tmp_path / "bpe_bad.json"
        p.write_text(json.dumps(obj), encoding="utf-8")
        return str(p)

    for mutate in (
        lambda m: {**m, "kind": "not-merges"},
        lambda m: {**m, "merges": []},
        lambda m: {**m, "merges": [["a", "b c"]]},
        lambda m: {**m, "merges": [["a"]]},
        lambda m: {**m, "space_symbol": "GG"},
    ):
        bad_path = _write(mutate(good))
        monkeypatch.setattr(dataops, "BPE_ARTIFACT", bad_path)
        with pytest.raises(ValueError, match="bad BPE artifact"):
            dataops._bpe_model()


def test_bpe_merges_count_matches_reference_loop():
    """The chained-replace formulation equals a straightforward Python
    implementation of sequential-exhaustive merge application on
    representative pre-tokens (incl. staggered repeats that need the
    multi-pass boundary replace)."""
    import json

    from ocr_spark.plans import dataops

    model = json.load(open(dataops.BPE_ARTIFACT, encoding="utf-8"))
    space = model["space_symbol"]

    def py_count(tok: str) -> int:
        syms = list(tok.replace(" ", space))
        for a, b in model["merges"]:
            out = []
            i = 0
            changed = True
            while changed:
                changed = False
                out = []
                i = 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == a
                            and syms[i + 1] == b):
                        out.append(a + b)
                        i += 2
                        changed = True
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            syms = out or syms
        return len(syms)

    def sql_like_count(tok: str) -> int:
        s = " " + " ".join(tok.replace(" ", space)) + " "
        for a, b in model["merges"]:
            for _ in range(dataops._BPE_RULE_PASSES):
                s = s.replace(f" {a} {b} ", f" {a}{b} ")
        return len(s.strip().split(" "))

    cases = [" the", " data", " spark", " thththth", " tttt",
             " question", "word", " the the", "   ", " rowrow",
             " thethethe", " datadata", " star", " in", "x"]
    for tok in cases:
        assert sql_like_count(tok) == py_count(tok), (
            tok, sql_like_count(tok), py_count(tok))


def test_bpe_trained_merges_feed_apply_seam(spark, tmp_path, monkeypatch):
    """Round-trip the tokenizer family: merges TRAINED in-plan
    (docs_bpe_train_merges) written as a bpe-merges artifact must (a)
    pass _bpe_model's loud validation and (b) tokenize through
    docs_bpe_merges_token_count exactly as a pure-Python reference
    applying the same ranked rules — i.e. the training op really does
    produce the table the apply op's artifact seam consumes."""
    import json
    import re

    from ocr_spark.plans import dataops

    sf = "/root/testdata/sf0.001"
    trained = (dataops.docs_bpe_train_merges(spark, sf)
               .orderBy("merge_rank").collect())
    assert len(trained) == dataops.BPE_TRAIN_ROUNDS
    art = {"kind": "bpe-merges", "version": "trained-roundtrip-test",
           "space_symbol": dataops._BPE_SPACE,
           "merges": [[r.lhs, r.rhs] for r in trained]}
    p = tmp_path / "bpe_trained.json"
    p.write_text(json.dumps(art), encoding="utf-8")
    monkeypatch.setattr(dataops, "BPE_ARTIFACT", str(p))
    assert dataops._bpe_model()["merges"] == art["merges"]

    rows = dataops.docs_bpe_merges_token_count(spark, sf).collect()

    pat = re.compile(dataops._BPE_PAT)
    space = dataops._BPE_SPACE

    def py_count(text: str) -> int:
        total = 0
        for tok in pat.findall(text):
            s = " " + " ".join(tok.replace(" ", space)) + " "
            for a, b in art["merges"]:
                for _ in range(dataops._BPE_RULE_PASSES):
                    s = s.replace(f" {a} {b} ", f" {a}{b} ")
            total += len(s.strip().split(" "))
        return total

    docs = (spark.read.parquet(f"{sf}/documents.parquet")
            .select("doc_id", "text").collect())
    expected = {d.doc_id: py_count(d.text) for d in docs}
    got = {r.doc_id: r.n_bpe_tokens for r in rows}
    assert got == expected
    # the trained rules genuinely fire on the corpus they came from
    assert sum(r.n_merges_applied for r in rows) > 0


def test_hll_registers_merge_by_max(spark):
    """The mergeable-sketch property the HLL docstring claims: the
    register frame of corpus-half A combined with half B's by
    elementwise MAX equals the full-corpus register frame — the
    incremental-snapshot combine that never rescans history."""
    from pyspark.sql import functions as F

    from ocr_spark.plans.sketches import _rho_col, _tok_col

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def regs(df):
        h = F.md5("tok")
        return (df.select("doc_id", "text").select(
                    F.col("doc_id"), _tok_col())
                .select(F.substring(h, 1, 2).alias("reg"),
                        _rho_col(F.substring(h, 3, 9)).alias("rho"),
                        "doc_id")
                .groupBy("reg").agg(F.max("rho").alias("m_reg")))

    full = {r.reg: r.m_reg for r in regs(docs).collect()}
    a = {r.reg: r.m_reg
         for r in regs(docs.filter(F.col("doc_id") % 2 == 0)).collect()}
    b = {r.reg: r.m_reg
         for r in regs(docs.filter(F.col("doc_id") % 2 == 1)).collect()}
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == full


def test_cms_counters_merge_by_add(spark):
    """CMS combine is elementwise ADD: half-A counters + half-B
    counters == full-corpus counters for every (row, bucket)."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def counters(df):
        toks = df.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))),
                              r"\s+")).alias("tok"))
        rb = F.array(*[
            F.struct(F.lit(r).alias("r"),
                     F.substring(
                         F.md5(F.concat(F.lit(f"{r}:"), F.col("tok"))),
                         1, 2).alias("b"))
            for r in range(4)])
        return {(row.r, row.b): row.c for row in
                (toks.select(F.explode(rb).alias("rb"))
                 .groupBy(F.col("rb.r").alias("r"),
                          F.col("rb.b").alias("b"))
                 .agg(F.count(F.lit(1)).alias("c"))).collect()}

    full = counters(docs)
    a = counters(docs.filter(F.col("doc_id") % 2 == 0))
    b = counters(docs.filter(F.col("doc_id") % 2 == 1))
    merged = {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}
    assert merged == full


def test_lexical_diversity_partial_agg_and_invariants(spark):
    """Both distinct-count chains must partial-aggregate below their
    exchanges (map-side combine on the token-volume shuffle), and the
    metrics obey their identities: 0 < ttr ≤ 1, distinct2 ≥ ttr is NOT
    required but hapax ≤ types ≤ tokens and bigrams = tokens - docs
    per language."""
    from pyspark.sql import functions as F

    from ocr_spark.plans.dataops import _tokens, docs_lexical_diversity, t
    from tests.test_plans import SF

    df = docs_lexical_diversity(spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in simple or "partial_sum" in simple
    rows = {r["lang"]: r for r in df.collect()}
    assert rows
    docs = (t(spark, SF, "documents")
            .select("lang", F.size(_tokens()).alias("n"))
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"),
                                 F.sum("n").alias("n_tokens")).collect())
    by_lang = {r["lang"]: r for r in docs}
    for lang, r in rows.items():
        assert 0 < r["ttr"] <= 1.0
        assert 0 < r["distinct2"] <= 1.0
        assert r["n_hapax"] <= r["n_types"] <= r["n_tokens"]
        assert abs(r["hapax_frac"] - r["n_hapax"] / r["n_types"]) < 1e-4
        exp = by_lang[lang]
        assert r["n_tokens"] == exp["n_tokens"]
        assert r["n_bigrams"] == exp["n_tokens"] - exp["n_docs"]


def test_bm25_ranking_properties(spark):
    """BM25 top-K: ranks are dense 1..n, scores non-increasing, every
    hit matches >=1 query term, and the physical plan takes the top-K
    via TakeOrdered (no global sort shuffle of the scored corpus)."""
    from ocr_spark.plans.dataops import BM25_TOP_K, docs_bm25_search
    from tests.test_plans import SF

    df = docs_bm25_search(spark, SF)
    rows = df.collect()
    assert 0 < len(rows) <= BM25_TOP_K
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["score_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r["n_terms_hit"] >= 1 and r["score_micro"] > 0
               for r in rows)


def test_lsh_eval_identities(spark):
    """The LSH quality scorecard's counters must be internally
    consistent (tp + fp = candidates, found <= truth, rates in [0,1]),
    and on the sf0.01 corpus the banded plan should recover most true
    near-dup pairs (recall is the number the operator exists to
    publish)."""
    from ocr_spark.plans.dataops import docs_lsh_eval
    from tests.test_plans import SF

    r = docs_lsh_eval(spark, SF).collect()[0]
    assert r["n_tp"] + r["n_fp"] == r["n_candidates"]
    assert r["n_truth_found"] <= r["n_truth"]
    assert 0.0 <= r["precision"] <= 1.0
    assert 0.0 <= r["recall"] <= 1.0
    assert r["n_truth"] > 0, "fixture must contain true near-dup pairs"
    assert r["recall"] >= 0.5


def test_lang_segments_detects_modeled_multilingual(spark):
    """Every doc carrying the modeled German tail must surface as
    mixed-language with a trailing 'de' segment and >=1 switch;
    segment counts equal ceil(tokens/SEG_TOKENS) on the widened text."""
    from ocr_spark.plans.dataops import (
        SEG_TOKENS, _MULTI_MOD, docs_lang_segments,
    )
    from tests.test_plans import SF

    rows = docs_lang_segments(spark, SF).collect()
    modeled = [r for r in rows if r["modeled_multilingual"]]
    assert modeled and all(r["doc_id"] % _MULTI_MOD == 1 for r in modeled)
    for r in modeled:
        langs = r["langs_str"].split(",")
        assert len(langs) == r["n_segments"]
        assert "de" in langs and langs[-1] == "de"
        # mixed/switch flags must agree with the segment sequence (a
        # very short doc can be swamped by the tail: all-'de', unmixed)
        assert r["is_mixed"] == (len(set(langs)) > 1)
        exp_switches = sum(a != b for a, b in zip(langs, langs[1:]))
        assert r["n_switches"] == exp_switches
    # corpus-level: the tail is 30 tokens (>1 segment), so docs of
    # typical length surface as genuinely mixed
    mixed = [r for r in modeled if r["is_mixed"]]
    assert len(mixed) >= 0.8 * len(modeled)
    # majority election: argmax segment count, ties to earliest in the
    # language precedence order ('und' only when no label has votes)
    order = ("en", "de", "fr", "es", "und")
    for r in rows:
        langs = r["langs_str"].split(",")
        counts = {lg: langs.count(lg) for lg in order}
        exp = max(order, key=lambda lg: (counts[lg], -order.index(lg)))
        exp = exp if counts[exp] > 0 else "und"
        assert r["majority_lang"] == exp, (r["doc_id"], langs)


def test_code_detect_routes_modeled_cohort_only(spark):
    """Every modeled code doc must flip is_code; no prose doc may
    (the corpus is prose by construction); signals agree with the
    vote; zero-shuffle plan."""
    from ocr_spark.plans.dataops import (
        CODE_KW_MIN, CODE_MOD, CODE_SYM_MIN, docs_code_detect,
    )
    from tests.test_webops import fmt, n_shuffles

    df = docs_code_detect(spark, "/root/testdata/sf0.01")
    assert n_shuffles(fmt(df)) == 0
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["modeled_code"] == (r["doc_id"] % CODE_MOD == 4)
        assert r["is_code"] == ((r["symbol_frac"] > CODE_SYM_MIN)
                                and (r["n_keywords"] > CODE_KW_MIN))
        assert r["is_code"] == r["modeled_code"]


def test_fim_split_partition_algebra(spark):
    """prefix+middle+suffix lengths must repartition the document
    exactly, the split must land inside the center window, the digest
    must match a Python recomputation, and the plan is zero-shuffle."""
    import hashlib

    from ocr_spark.plans.dataops import (
        _CODE_BLOCK, CODE_MOD, FIM_MID, FIM_PRE, FIM_SUF, docs_fim_split,
    )
    from tests.test_webops import fmt, n_shuffles

    df = docs_fim_split(spark, "/root/testdata/sf0.001")
    assert n_shuffles(fmt(df)) == 0
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").collect()
    for d in docs[:40]:
        r = rows[d["doc_id"]]
        text = _CODE_BLOCK if d["doc_id"] % CODE_MOD == 4 else d["text"]
        n = len(text)
        assert r["n_chars"] == n
        if not r["fim_applied"]:
            assert n < 3
            continue
        third = n // 3
        s = r["split_start"]
        assert third + 1 <= s <= 2 * third
        assert r["prefix_len"] + r["middle_len"] + r["suffix_len"] == n
        pre, mid, suf = (text[:s - 1], text[s - 1:s - 1 + third],
                         text[s - 1 + third:])
        fim = FIM_PRE + pre + FIM_SUF + suf + FIM_MID + mid
        assert r["fim_digest"] == hashlib.md5(
            fim.encode("utf-8")).hexdigest()


def test_fim_split_exercises_code_cohort(spark):
    from ocr_spark.plans.dataops import CODE_MOD, docs_fim_split
    rows = docs_fim_split(spark, "/root/testdata/sf0.001").collect()
    modeled = [r for r in rows if r["modeled_code"]]
    assert modeled and all(r["doc_id"] % CODE_MOD == 4 for r in modeled)
    assert all(r["fim_applied"] for r in modeled)


def _py_cdc_chunks(text: str) -> list[str]:
    """Pure-Python mirror of docs_cdc_chunks' boundary rule."""
    import re

    from ocr_spark.plans.dataops import _RH_BASE, _RH_MOD, CDC_D, CDC_W

    norm = re.sub(r"\s+", " ", text.lower().strip())
    n = len(norm)
    bnd = []
    for p in range(CDC_W, n + 1):
        acc = 0
        for c in norm[p - CDC_W:p]:
            acc = (acc * _RH_BASE + ord(c)) % _RH_MOD
        if acc % CDC_D == 0:
            bnd.append(p)
    starts = [1] + [p + 1 for p in bnd]
    ends = bnd + [n]
    return [norm[s - 1:e] for s, e in zip(starts, ends) if s <= e]


def test_cdc_chunks_python_parity_and_insertion_robustness(spark):
    """The Spark expression pipeline must agree with an independent
    pure-Python CDC on chunk counts and mean lengths, corpus-level
    duplicate chunks must genuinely exist (the fixture has exact and
    near duplicates), and the defining CDC property must hold: a
    head insertion leaves the downstream chunking untouched."""
    import pandas as pd

    from ocr_spark.plans.dataops import docs_cdc_chunks

    sf = "/root/testdata/sf0.01"
    res = {r["doc_id"]: r
           for r in docs_cdc_chunks(spark, sf).collect()}
    docs = pd.read_parquet(f"{sf}/documents.parquet").head(25)
    for _, d in docs.iterrows():
        chunks = _py_cdc_chunks(d["text"])
        r = res[d["doc_id"]]
        assert r["n_chunks"] == len(chunks), d["doc_id"]
        mean = sum(len(c) for c in chunks) / len(chunks)
        assert abs(r["mean_chunk_len"] - round(mean, 4)) < 1e-9
    assert any(r["n_dup_chunks"] > 0 for r in res.values())
    assert any(r["n_dup_chunks"] == 0 for r in res.values())

    s = docs.iloc[0]["text"]
    base = _py_cdc_chunks(s)
    shifted = _py_cdc_chunks("zq inserted head. " + s)
    # all but the first chunk(s) survive the insertion untouched
    overlap = set(base) & set(shifted)
    assert len(overlap) >= len(base) - 2


def test_bbit_minhash_identity_and_variance(spark):
    """b-bit estimates must clamp to [0, 1], agree exactly with the
    full estimate at J=1 (all positions match in any bit width), and
    genuinely differ from the full-width estimate somewhere (the
    storage trade is real, not a no-op)."""
    from ocr_spark.plans.dataops import docs_bbit_minhash

    rows = docs_bbit_minhash(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["jaccard_bbit"] <= 1.0
        if r["jaccard_est"] == 1.0:
            assert r["jaccard_bbit"] == 1.0
        assert abs(r["bbit_err"]
                   - round(r["jaccard_bbit"] - r["jaccard_est"], 4)) \
            <= 1e-9
    assert any(r["jaccard_est"] == 1.0 for r in rows)
    assert any(r["bbit_err"] != 0.0 for r in rows)


def test_dedup_agreement_matrix_identities(spark):
    """Set-algebra identities must hold on every matrix row
    (n_both <= min(n_a, n_b), n_either = n_a + n_b - n_both,
    agreement in [0, 1]), and the fixture must genuinely exercise the
    comparison: this corpus has near-dups but NO byte-identical dups
    (verified directly), so the exact drop set is empty while the two
    near-dup families must both fire and agree on a nonzero overlap
    (both see token-level duplication)."""
    from ocr_spark.plans.dataops import docs_dedup_method_agreement

    sf = "/root/testdata/sf0.01"
    rows = {(r["method_a"], r["method_b"]): r
            for r in docs_dedup_method_agreement(spark, sf).collect()}
    assert set(rows) == {("exact", "minhash"), ("exact", "simhash"),
                         ("minhash", "simhash")}
    for key, r in rows.items():
        assert r["n_both"] <= min(r["n_drop_a"], r["n_drop_b"]), key
        assert r["n_either"] == r["n_drop_a"] + r["n_drop_b"] \
            - r["n_both"], key
        if r["agreement"] is not None:
            assert 0.0 <= r["agreement"] <= 1.0
    em = rows[("exact", "minhash")]
    assert em["n_drop_a"] == 0          # no byte-dups in this fixture
    assert em["agreement"] is None or em["agreement"] == 0.0
    ms = rows[("minhash", "simhash")]
    assert ms["n_drop_a"] > 0 and ms["n_drop_b"] > 0
    assert ms["agreement"] and ms["agreement"] > 0.0


def test_ct_langid_signal_is_load_bearing(spark):
    """Rank-order classification must actually classify: >=0.95
    accuracy on the modeled multilingual cohort (measured 0.22 =
    chance without the markers, so the marker cohort, profile depth,
    and out-of-place distance are all load-bearing), every prediction
    drawn from the trained label set, and only odd-half (test) docs
    scored."""
    from ocr_spark.plans.dataops import CT_MARKERS, docs_ct_langid

    sf = "/root/testdata/sf0.01"
    rows = docs_ct_langid(spark, sf).collect()
    assert rows
    assert all(r["doc_id"] % 2 == 1 for r in rows)
    assert {r["pred_lang"] for r in rows} <= set(CT_MARKERS)
    acc = sum(r["correct"] for r in rows) / len(rows)
    assert acc >= 0.95, acc


def test_prefix_filter_join_is_complete(spark):
    """The no-false-negative guarantee — the property that separates
    the prefix filter from LSH: the emitted pair set must EQUAL a
    brute-force python sweep over every doc pair's distinct-shingle
    Jaccard at the threshold (complete and nothing extra), and must
    cover every pair the LSH tier verified at the same threshold."""
    import itertools
    import re

    import pandas as pd

    from ocr_spark.plans.dataops import (
        PFX_JACCARD_T, SHINGLE_W, docs_prefix_filter_join)

    sf = "/root/testdata/sf0.01"
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in docs_prefix_filter_join(spark, sf).collect()}
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    sets = {}
    for _, d in docs.iterrows():
        toks = re.split(r"\s+", d["text"].lower().strip())
        sets[d["doc_id"]] = {
            " ".join(toks[i:i + SHINGLE_W])
            for i in range(len(toks) - SHINGLE_W + 1)}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
        if j >= PFX_JACCARD_T:
            want[(a, b)] = j
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, k


def test_extractive_summary_selects_centroid_segments(spark):
    """Summaries must be <= EX_SUMMARY_K verbatim token segments in
    original order, recomputable in pure Python (same tf-mass scoring
    and tie-breaks), and the selection must be non-positional for a
    healthy share of docs (score decides, not segment order)."""
    import re

    import pandas as pd

    from ocr_spark.plans.dataops import (
        EX_SEG_W, EX_SUMMARY_K, docs_extractive_summary)

    sf = "/root/testdata/sf0.01"
    got = {r["doc_id"]: r for r in
           docs_extractive_summary(spark, sf).collect()}
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    nontrivial = 0
    for _, d in docs.iterrows():
        toks = [x for x in
                re.split(r"\s+", d["text"].lower().strip()) if x]
        segs = [toks[i:i + EX_SEG_W]
                for i in range(0, len(toks), EX_SEG_W)]
        tf = {}
        for x in toks:
            tf[x] = tf.get(x, 0) + 1
        scores = [(round(sum(tf[x] for x in seg) / len(seg), 6), i)
                  for i, seg in enumerate(segs)]
        top = sorted(range(len(segs)),
                     key=lambda i: (-scores[i][0], i))[:EX_SUMMARY_K]
        want = " ".join(" ".join(segs[i]) for i in sorted(top))
        r = got[d["doc_id"]]
        assert r["n_selected"] == min(EX_SUMMARY_K, len(segs))
        assert r["summary"] == want, d["doc_id"]
        if sorted(top) != list(range(min(EX_SUMMARY_K, len(segs)))):
            nontrivial += 1
    assert nontrivial > 50


def test_oph_kernel_densification_and_estimates():
    """OPH kernel invariants without Spark: (a) every densified slot
    is filled from the nearest non-empty bin to its cyclic right;
    (b) identical texts hash identically; (c) on a duplicate-heavy
    pair the OPH bin-match fraction tracks exact Jaccard at least as
    well as chance, while a disjoint pair matches (almost) nowhere —
    the estimator property one hash per shingle must preserve."""
    from ocr_spark.plans.dataops import (
        _KM_MOD, OPH_BINS, SHINGLE_W, oph_vec_py)
    import hashlib
    import re

    text = "alpha beta gamma delta epsilon zeta eta theta"
    sig, n_empty = oph_vec_py(text)
    assert len(sig) == OPH_BINS and 0 <= n_empty < OPH_BINS
    # replay the binning by hand
    toks = re.split(r"\s+", text.lower().strip())
    shingles = [" ".join(toks[i:i + SHINGLE_W])
                for i in range(len(toks) - SHINGLE_W + 1)]
    bins = [None] * OPH_BINS
    for sh in shingles:
        h = int(hashlib.md5(sh.encode()).hexdigest()[0:15], 16) % _KM_MOD
        b = h % OPH_BINS
        if bins[b] is None or h < bins[b]:
            bins[b] = h
    assert n_empty == sum(1 for v in bins if v is None)
    for j in range(OPH_BINS):
        for off in range(OPH_BINS):
            v = bins[(j + off) % OPH_BINS]
            if v is not None:
                assert sig[j] == v
                break
    # determinism + self-identity
    assert oph_vec_py(text)[0] == sig
    # near-duplicate vs disjoint separation
    a = " ".join(f"tok{i}" for i in range(60))
    b = " ".join(f"tok{i}" for i in range(58)) + " other words"
    c = " ".join(f"zzz{i}" for i in range(60))
    sa, _ = oph_vec_py(a)
    sb, _ = oph_vec_py(b)
    sc, _ = oph_vec_py(c)
    near = sum(x == y for x, y in zip(sa, sb)) / OPH_BINS
    far = sum(x == y for x, y in zip(sa, sc)) / OPH_BINS
    assert near > 0.5 > far
    # degenerate inputs
    assert oph_vec_py("") is None
    assert oph_vec_py("one two") is None


def test_oph_plan_is_narrow_map(spark):
    """The OPH signature pass must stay scan → project (zero
    shuffle) — its entire reason to exist is cutting per-split CPU,
    so any exchange in this plan is a regression."""
    import re

    from ocr_spark.plans.dataops import docs_minhash_oph

    df = docs_minhash_oph(spark, "/root/testdata/sf0.01")
    qe = df._jdf.queryExecution()
    plan = df._sc._jvm.org.apache.spark.sql.api.python.PythonSQLUtils \
        .explainString(qe, "formatted")
    assert not re.findall(r"\(\d+\) Exchange\b", plan)


def test_rouge_l_kernel_matches_textbook_dp_and_bounds():
    """The masked-prefix-max LCS form equals the textbook three-way
    recurrence on adversarial token pairs (repeats, shuffles,
    disjoint, prefix/suffix), and ROUGE-L invariants hold: an
    in-order extractive summary gets precision 1, a shuffled one
    loses LCS mass (the order sensitivity docs_summary_coverage's
    bag-of-grams cannot see)."""
    from ocr_spark.plans.dataops import (
        ROUGE_L_SRC_CAP, ROUGE_L_SUM_CAP, rouge_l_py)

    def lcs_ref(a, b):
        dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i][j] = (dp[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1]
                            else max(dp[i - 1][j], dp[i][j - 1]))
        return dp[len(a)][len(b)]

    cases = [
        ("a b c d e f g", "b d f"),
        ("a a b a b b a", "a b b a"),
        ("x y z", "p q r"),
        ("a b c a b c a b c", "c b a"),
        ("one two three four", "one two three four"),
        ("w1 w2 w3 w4 w5 w6 w7 w8", "w8 w1 w2"),
        ("t " * 80, "t t t"),               # cap engagement
    ]
    for text, summ in cases:
        n, m, lcs = rouge_l_py(text, summ)
        src = text.lower().split()[:ROUGE_L_SRC_CAP]
        hyp = summ.split()[:ROUGE_L_SUM_CAP]
        assert (n, m) == (len(src), len(hyp))
        assert lcs == lcs_ref(src, hyp), (text, summ)
        assert lcs <= min(n, m)
    # order sensitivity: same bag, different order, smaller LCS
    _, _, in_order = rouge_l_py("a b c d e", "b c d")
    _, _, shuffled = rouge_l_py("a b c d e", "d c b")
    assert in_order == 3 and shuffled < 3


def test_license_detect_precedence_and_gate(spark):
    """All three marker forms are genuinely routed (tag, phrase,
    unmarked), the phrase map recovers the same SPDX ids the tag form
    carries, copyleft is the only held license family among marked
    docs, and unmarked code is never admitted."""
    from ocr_spark.plans.dataops import LICENSES, docs_license_detect

    rows = docs_license_detect(spark, "/root/testdata/sf0.01").collect()
    by_det = {}
    for r in rows:
        by_det.setdefault(r.detector, []).append(r)
    assert set(by_det) == {"spdx", "phrase", "none"}
    ids = {lid for lid, _, _ in LICENSES}
    for det in ("spdx", "phrase"):
        assert {r.license for r in by_det[det]} == ids
        for r in by_det[det]:
            fam = next(f for lid, _, f in LICENSES if lid == r.license)
            assert r.family == fam
            assert r.allowed_for_training == (fam == "permissive")
            assert r.n_docs > 0
    (none_row,) = by_det["none"]
    assert none_row.license == "none"
    assert none_row.family == "unknown"
    assert not none_row.allowed_for_training


def test_bm25_eval_ap_replay_and_discrimination(spark):
    """AP@K replays exactly from a brute-force Python BM25 over the
    same planted cohort (integer micro arithmetic end to end), the
    eval genuinely discriminates (MAP strictly between 0.3 and
    0.999 — an all-1.0 scorecard would mean the plant swamped K),
    and MAP equals the integer mean of the per-topic APs."""
    import math

    import duckdb

    from ocr_spark.plans.dataops import (
        BM25_B, BM25_EVAL_K, BM25_EVAL_SEC_TF, BM25_EVAL_TOPICS,
        BM25_K1, docs_bm25_eval)

    rows = sorted(docs_bm25_eval(spark, "/root/testdata/sf0.01")
                  .collect(), key=lambda r: r.topic)
    assert len(rows) == BM25_EVAL_TOPICS
    map_v = rows[0].map_at_k
    assert all(r.map_at_k == map_v for r in rows)
    assert 0.3 < map_v < 0.999
    assert min(r.ap_at_k for r in rows) < max(r.ap_at_k for r in rows)
    # brute-force replay
    docs = duckdb.sql(
        "SELECT doc_id, CASE WHEN trim(text)='' THEN 0 ELSE "
        "len(string_split_regex(lower(trim(text)),'\\s+')) END AS n "
        "FROM read_parquet("
        "'/root/testdata/sf0.01/documents.parquet')").fetchall()
    T = BM25_EVAL_TOPICS
    lens = {d: n + 4 for d, n in docs}
    n_corpus = len(lens)
    avgdl = sum(lens.values()) / n_corpus
    df = 2 * n_corpus / T  # uniform-ish; compute exactly instead
    from collections import defaultdict
    df_exact = defaultdict(int)
    tfs = defaultdict(dict)
    for d in lens:
        tfs[f"topic{d % T}"][d] = 3
        tfs[f"topic{(d + 1) % T}"][d] = BM25_EVAL_SEC_TF
    aps = []
    for t in range(T):
        term = f"topic{t}"
        dfv = len(tfs[term])
        idf = math.log(1.0 + (n_corpus - dfv + 0.5) / (dfv + 0.5))
        scored = []
        for d, tf in tfs[term].items():
            w = (idf * tf * (BM25_K1 + 1)
                 / (tf + BM25_K1 * (1 - BM25_B
                                    + BM25_B * lens[d] / avgdl)))
            scored.append((-int(round(w * 1e6)), d))
        scored.sort()
        hits = 0
        sum_p = 0
        n_rel = sum(1 for d in lens if d % T == t)
        for i, (_, d) in enumerate(scored[:BM25_EVAL_K], start=1):
            if d % T == t:
                hits += 1
                sum_p += (hits * 1_000_000) // i
        ap = sum_p // min(n_rel, BM25_EVAL_K)
        aps.append(ap)
        r = next(x for x in rows if x.topic == term)
        assert r.ap_at_k == round(ap / 1e6, 6), term
        assert r.tp_at_k == hits and r.n_rel == n_rel
    assert map_v == round((sum(aps) // T) / 1e6, 6)


def test_silhouette_discriminates_structure_from_noise(spark):
    """The simplified-silhouette metric must DISCRIMINATE: on the
    driver's near-uniform embeddings it reads ≈0 (no structure — the
    honest diagnosis), while the same pipeline over the clustered
    mixture-of-Gaussians fixture scores an order of magnitude higher;
    per-cell means replay exactly from the integer micro rows."""
    import numpy as np
    import pandas as pd

    from ocr_spark.gen.embeddings import clustered_embeddings
    from ocr_spark.plans.simsearch import emb_silhouette

    rows = emb_silhouette(spark, "/root/testdata/sf0.01").collect()
    overall_noise = rows[0].overall_silhouette
    for r in rows:
        assert r.overall_silhouette == overall_noise
        assert -1.0 <= r.mean_silhouette <= 1.0
    assert abs(overall_noise) < 0.15
    # clustered fixture through the same op via a temp parquet dir
    import tempfile

    v, l = clustered_embeddings(n=500, n_clusters=10, seed=77)
    with tempfile.TemporaryDirectory() as td:
        pdf = pd.DataFrame({
            "vec_id": np.arange(len(v), dtype=np.int64),
            "embedding": [x.astype(np.float32).tolist() for x in v],
            "label": l.astype(np.int32)})
        spark.createDataFrame(pdf).write.mode("overwrite") \
            .parquet(f"{td}/embeddings.parquet")
        crows = emb_silhouette(spark, td).collect()
    overall_clustered = crows[0].overall_silhouette
    assert overall_clustered > max(0.2, 4 * abs(overall_noise))


def test_soft_dedup_weights_conserve_cluster_mass(spark):
    """Every doc appears once; singleton weight is exactly 1; within
    a cluster all members share 10⁶ DIV size micro-weight so cluster
    mass is ≤ 1 and short of 1 only by integer truncation; the
    effective corpus size (Σ weights) equals
    n_singletons + Σ_clusters size·(10⁶ DIV size)/10⁶."""
    from collections import Counter

    from ocr_spark.plans.dataops import docs_soft_dedup_weights

    rows = docs_soft_dedup_weights(spark, "/root/testdata/sf0.01") \
        .collect()
    assert len(rows) == len({r.doc_id for r in rows}) == 500
    sizes = Counter()
    for r in rows:
        if r.in_cluster:
            assert r.cluster_size >= 2
            sizes[r.cluster_size] += 1
        else:
            assert r.cluster_size == 1 and r.weight == 1.0
        assert r.weight == round((1_000_000 // r.cluster_size) / 1e6, 6)
    assert sizes, "fixture must contain near-dup clusters"
    for size, n_members in sizes.items():
        assert n_members % size == 0   # whole clusters only
    eff = sum(r.weight for r in rows)
    n_docs_in_clusters = sum(sizes.values())
    assert eff < 500 - n_docs_in_clusters + sum(
        n / s for s, n in sizes.items()) + 1e-6


def test_nprobe_sweep_monotone_and_consistent_with_multiprobe(spark):
    """The recall curve is monotone nondecreasing in the probe budget
    (probe sets nest), strictly informative (recall@max > recall@1 on
    the fixture), bounded in [0, 1], and the shipped IVF_NPROBE
    operating point is one of the swept budgets so the curve actually
    prices the production setting."""
    from ocr_spark.plans.simsearch import (
        IVF_NPROBE, NPROBE_SWEEP, emb_ivf_nprobe_sweep)

    sf = "/root/testdata/sf0.01"
    rows = sorted(emb_ivf_nprobe_sweep(spark, sf).collect(),
                  key=lambda r: r.nprobe)
    assert [r.nprobe for r in rows] == sorted(NPROBE_SWEEP)
    recalls = [r.mean_recall for r in rows]
    assert recalls == sorted(recalls)
    assert recalls[-1] > recalls[0]
    assert all(0.0 <= r <= 1.0 for r in recalls)
    assert all(r.n_queries == rows[0].n_queries for r in rows)
    assert IVF_NPROBE in NPROBE_SWEEP


def test_kmeans_elbow_monotone_and_full_cells(spark):
    """Inertia is strictly decreasing in K on the fixture (more
    centroids always help an unclustered cloud a little), every K
    keeps all its cells populated (first-K init over a dense cloud),
    mean = inertia/n exactly, and the flat-curve diagnosis matches
    emb_silhouette: no K cuts inertia by even 15% over K=2 — there
    is no elbow because there are no clusters."""
    from ocr_spark.plans.simsearch import ELBOW_KS, emb_kmeans_elbow

    rows = sorted(emb_kmeans_elbow(spark, "/root/testdata/sf0.01")
                  .collect(), key=lambda r: r.k)
    assert [r.k for r in rows] == sorted(ELBOW_KS)
    inert = [r.inertia for r in rows]
    assert inert == sorted(inert, reverse=True)
    assert len(set(inert)) == len(inert)
    for r in rows:
        assert r.n_cells_used == r.k
        assert r.n_vectors == 500
        assert abs(r.mean_inertia - round(r.inertia / 500, 6)) < 2e-6
    assert inert[-1] > 0.85 * inert[0]   # flat: no cluster structure
