#!/usr/bin/env python
"""Headline benchmark for the ocr_spark engine.

Runs the flagship extraction job plus the headline analytics queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall-seconds across the headline set (lower = better).
Per-query seconds are in ``queries``; the extraction job also reports
docs/sec as ``extract_docs_per_sec`` (informational key, not a timing).

Results are forced with the noop sink (or count for tiny outputs) so we
measure cluster execution, not driver-side collect/pretty-print.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline subset: the extraction pipeline (the engine's reason to exist)
# + one representative of each analytics shape (scan-agg, broadcast-join
# top-k, snowflake join, window sessionization, window rank, dedup hash,
# quality scoring).
HEADLINE = [
    "extract_roundtrip",
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q5_nation_revenue",
    "ev_sessionize",
    "top3_customers_per_nation",
    "docs_exact_dedup",
    "docs_quality_score",
    "docs_minhash_lsh_pairs",
    "docs_jaccard_verify_candidates",
    "emb_cosine_topk",
    "emb_lsh_multiprobe_topk",
    "ev_asof_last_purchase",
    "mm_frame_rollup",
    # round 3: near-dup clustering + corpus paragraph/span dedup
    "docs_near_dup_clusters",
    "pages_para_dedup",
    "pages_span_dedup",
    # round 3 (late): semantic dedup, URL frontier dedup, phrase mining,
    # eval decontamination, bigram-LM scoring
    "emb_semdedup",
    "pages_url_dedup",
    "docs_top_ngrams",
    "docs_decontaminate",
    "docs_bigram_logprob",
    "docs_fineweb_verdict",
    # round 4: Lloyd k-means IVF training, extraction-composed line
    # gate, full-edge-list PageRank, artifact-BPE token counting
    "emb_kmeans_train",
    "docs_gopher_line_filters",
    "hosts_pagerank_full",
    "docs_bpe_merges_token_count",
    # round 4 (cont.): DSIR selection, per-host template removal,
    # cross-snapshot near-dup, IVF-PQ, BPE training, quality keepers
    "docs_dsir_weights",
    "pages_host_boilerplate",
    "docs_near_dup_vs_snapshot",
    "emb_ivfpq_topk",
    "docs_bpe_train_merges",
    "docs_near_dup_quality_keepers",
    # round 4 (late): Bloom dedup pre-screen (broadcast bitset probe),
    # document-level mixture realization (broadcast domain table)
    "docs_bloom_probe",
    "docs_mixture_realize",
    # round 4 (final): capture-log window election, mergeable HLL
    # sketch, inverted-index term rollup
    "pages_revisit_records",
    "docs_hll_sketch",
    "docs_inverted_index",
    # round 4 (close): quantile histogram, KMV distinct sampler,
    # weighted reservoir — the rest of the mergeable-sketch family
    "docs_length_quantile_sketch",
    "docs_kmv_distinct",
    "docs_weighted_reservoir",
    # round 4 (closing session): extraction-eval token F1 (the scoring
    # harness over the full pipeline), crawl-age-decayed PageRank
    "extract_eval_tokenf1",
    "hosts_pagerank_aged",
    # round 4 (this session): power-iteration PCA (bounded-exchange
    # iterative corpus pass), lexical diversity (token-volume distinct
    # agg), perceptual-hash visual near-dup (banded Hamming join)
    "emb_pca_power",
    "docs_lexical_diversity",
    "mm_phash_near_dup",
    # round 4 (final session): pre-extraction routing over raw-bytes
    # DOM heuristics (zero-shuffle JVM regexp map), Matryoshka
    # prefix-dim recall scorecard (tiered broadcast ANN), FIM split
    # (hash-jittered narrow transform)
    "pages_extract_router",
    "emb_mrl_recall",
    "docs_fim_split",
    # round 4 (continuation): content-defined chunk dedup (per-row
    # window hashing + chunk-hash exchange), preference-pair
    # construction (classifier subplan + mirror-rank join), per-
    # subspace PQ codebook training (bounded iterative aggregates)
    "docs_cdc_chunks",
    "docs_preference_pairs",
    "emb_pq_train",
    # round 4 (this continuation): structured-metadata harvest
    # (JVM from_json, zero shuffle), RAKE keyphrases (doc-co-partitioned
    # multi-stage), SCD2 page history (one url-keyed shuffle),
    # association rules (single collect_set event shuffle + AQE reuse)
    "pages_structured_meta",
    "docs_keyphrases_rake",
    "pages_scd2_history",
    "ev_assoc_rules",
    # round 4 (closing continuation): Markov removal-effect
    # attribution (user-keyed journey window + 1-row integer value
    # iteration), synchronous LPA communities (host-keyed iterative
    # rounds), one-permutation MinHash (the 16x-cheaper narrow
    # signature map), Z-order layout planner (Morton pack + zone maps)
    "ev_attribution_markov",
    "hosts_label_propagation",
    "docs_minhash_oph",
    "shards_zorder_layout",
    # round 5: FAISS-form trained-residual IVF-PQ (the measured 2x2
    # winner), JusText per-block densitometry (zero-shuffle narrow
    # map), DOM depth profile (url-keyed running balance), kernel-vs-
    # JusText cross-method agreement (extractor-QA dashboard)
    "emb_ivfpq_residual_trained_topk",
    "pages_block_density",
    "pages_dom_depth",
    "pages_extract_method_agreement",
]


def _prev_round_queries(
        sf: float, cpus: int,
) -> tuple[int | None, dict[str, float], float | None]:
    """Latest BENCH_r{N}.json's per-query seconds — the regression
    baseline (driver records one per round). Baselines measured at a
    different sf or cpu count are SKIPPED: comparing sf0.01 timings to
    an sf0.1 baseline would produce spurious regressions (or mask real
    ones)."""
    import glob
    import re

    best: tuple[int, dict[str, float], float | None] | None = None
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
            parsed = data.get("parsed", data)
            queries = parsed.get("queries", {})
            if parsed.get("sf") != sf or parsed.get("cpus") != cpus:
                print(f"bench: skipping baseline {os.path.basename(path)}"
                      f" (sf={parsed.get('sf')}, cpus={parsed.get('cpus')}"
                      f" != current sf={sf}, cpus={cpus})",
                      file=sys.stderr)
                continue
        except Exception:
            continue
        n = int(m.group(1))
        if queries and (best is None or n > best[0]):
            # prefer the parallel calibration for host-drift normalization:
            # single-core turbo can hold steady while all-core throughput
            # (memory bus, noisy neighbors) drops 2x — which is exactly
            # the drift that moves Spark local[32] timings.
            best = (n, queries,
                    parsed.get("host_calibration_docs_per_sec_8core")
                    or parsed.get("host_calibration_docs_per_sec_1core"))
    return best if best else (None, {}, None)


def _calibrate_kernel() -> tuple[float, float]:
    """(1-core, 8-core-parallel) extraction-kernel docs/sec on a fixed
    workload, measured WITHOUT Spark. The 1-core rate tracks silicon
    speed; the 8-core rate additionally sees memory-bandwidth and
    noisy-neighbor contention — the component that actually moves
    local[32] wall-clock between sessions. Runs before the JVM starts
    so the worker processes fork a clean interpreter."""
    import multiprocessing as mp

    from ocr_spark.core.extract import extract_document
    from ocr_spark.gen.corpus import generate_pages

    rows = [(r["url"], r["html"])
            for r in generate_pages(300, seed=99, oversized_rows=0)]
    t0 = time.perf_counter()
    for url, html in rows:
        extract_document(url, html)
    rate1 = round(len(rows) / (time.perf_counter() - t0), 1)

    nworkers = 8
    with mp.Pool(nworkers) as pool:
        t0 = time.perf_counter()
        pool.starmap(extract_document, rows * nworkers, chunksize=50)
        dt = time.perf_counter() - t0
    rate8 = round(len(rows) * nworkers / dt, 1)
    return rate1, rate8


REGRESSION_FACTOR = 1.3


def _force(df) -> None:
    """Execute the full plan via the noop sink. count() would let
    Catalyst prune a projection-only query down to a footer-row-count
    scan, timing none of its expressions; the noop write materializes
    every output column."""
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    # Shield stdout at the fd level: the driver parses stdout as ONE
    # JSON line, but the JVM child inherits fd 1 and can write banner /
    # progress noise to it (BENCH_r03 recorded "parsed": null). Route
    # fd 1 to stderr for the whole run; keep a dup of the real stdout
    # and write only the final JSON line to it.
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1

    # host calibration first (pre-JVM): this sandbox VM's effective
    # speed swings >2x between sessions (outside-VM noisy neighbors);
    # recording a fixed no-Spark workload's single-core AND 8-core
    # rates alongside each bench lets cross-round comparisons separate
    # host-condition shifts from code regressions.
    cal_rate, cal_rate8 = _calibrate_kernel()

    import __spark_entry__ as entrymod
    from ocr_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")
    qs = entrymod.queries()

    # warm the JVM + Python workers once (tiny query) so query #1 doesn't
    # absorb executor-startup cost.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        if name == "extract_roundtrip" and dt > 0:
            extra["extract_docs_per_sec"] = round(n_docs / dt, 2)

    total = round(sum(timings.values()), 3)

    # per-query regression tracking vs the previous round's driver bench:
    # flag queries >REGRESSION_FACTOR slower. Warnings go to stderr; the
    # structured list rides inside the one stdout JSON line.
    prev_round, prev, prev_cal = _prev_round_queries(sf, int(cpus))
    # normalize the baseline for host drift when both rounds carry a
    # calibration (8-core preferred): if the box is measured 2x slower
    # today, a query is only a regression when it is slow BEYOND that.
    host_scale = (prev_cal / cal_rate8
                  if prev_cal and cal_rate8 else 1.0)
    regressions = {}
    for name, sec in timings.items():
        base = prev.get(name)
        if base and base > 0 \
                and sec > base * host_scale * REGRESSION_FACTOR:
            regressions[name] = {"prev_sec": base, "now_sec": sec,
                                 "ratio": round(sec / base, 2),
                                 "host_scale": round(host_scale, 3)}
            print(f"REGRESSION {name}: {base}s -> {sec}s "
                  f"({sec / base:.2f}x, round r{prev_round} baseline, "
                  f"host-drift-normalized x{host_scale:.2f})",
                  file=sys.stderr)

    out = {
        "metric": "headline_total_sec (extraction + analytics)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "host_calibration_docs_per_sec_1core": cal_rate,
        "host_calibration_docs_per_sec_8core": cal_rate8,
        **extra,
    }
    if prev_round is not None:
        out["regressions_vs_r" + str(prev_round)] = regressions
    spark.stop()
    os.write(real_stdout, (json.dumps(out) + "\n").encode())
    os.close(real_stdout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
