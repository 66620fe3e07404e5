#!/usr/bin/env python
"""sf-scaling bench (round-4 verdict #2): run the most expensive
round-4 queries at sf0.1 AND at the synthesized 10x sf1 corpus
(scripts/make_sf1.py) on the same local[32] session, and record the
per-query sec-vs-sf scaling factor. A documented-linear query whose
factor lands far above 10x means a cap or broadcast silently stopped
engaging -- exactly the failure mode the plan docstrings claim cannot
happen; this is the empirical check.

Interpretation notes baked into the output:
* fixed Spark overhead (scheduling, JVM, Python workers) does NOT
  scale with sf, so short queries land well BELOW 10x -- that is
  expected, not suspicious;
* the flag threshold is factor > FLAG_FACTOR (15 = 10x work + 50%
  headroom for cache effects/memory pressure);
* pair-generating queries (minhash pairs, jaccard verify, phash) are
  the ones the caps protect; their factors are the headline numbers.

Writes BENCH/sf1.json. Env: SF1_BENCH_QUERIES (comma list) to subset.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".bench_tmp", "sf1")
FLAG_FACTOR = 15.0

# the 15 most expensive BENCH_r04 queries + the cap-protected pair
# generators (the queries whose scale story most needs the 10x point)
QUERIES = [
    "docs_fineweb_verdict",
    "emb_ivfpq_topk",
    "docs_decontaminate",
    "docs_near_dup_quality_keepers",
    "docs_near_dup_clusters",
    "docs_dsir_weights",
    "docs_bigram_logprob",
    "hosts_pagerank_aged",
    "mm_phash_near_dup",
    "docs_jaccard_verify_candidates",
    "extract_roundtrip",
    "hosts_pagerank_full",
    "emb_lsh_multiprobe_topk",
    "docs_top_ngrams",
    "ev_attribution_markov",
    "docs_minhash_lsh_pairs",
]


def _force(df) -> int:
    """noop-sink force (the bench.py discipline): count() lets Spark
    prune computed columns down to the scan, under-measuring queries
    whose cost lives in projections; the noop write materializes every
    expression. Row count comes from a cheap second count()."""
    df.write.format("noop").mode("overwrite").save()
    return df.count()


def main() -> int:
    if not os.path.isdir(SF1):
        print("run scripts/make_sf1.py first", file=sys.stderr)
        return 2

    import __spark_entry__ as entrymod
    from ocr_spark.session import get_spark

    only = os.environ.get("SF1_BENCH_QUERIES")
    names = only.split(",") if only else QUERIES
    qs = entrymod.queries()

    spark = get_spark("sf1_bench", master="local[32]")
    spark.read.parquet(f"{SF01}/region.parquet").count()  # warm JVM

    out: dict = {
        "sf01_dir": SF01, "sf1_dir": SF1, "scale_ratio": 10,
        "flag_factor": FLAG_FACTOR,
        "note": ("sec-vs-sf factor per query at 10x data on the same "
                 "local[32] session. Sub-10x factors = fixed overhead "
                 "amortizing (expected); factors above flag_factor "
                 "mean a cap/broadcast stopped engaging. Corpus from "
                 "scripts/make_sf1.py (shape-preserving, dedup-safe "
                 "redraw -- NOT row replication)."),
        "queries": {},
    }
    flagged = []
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        df01 = fn(spark, SF01)
        df01.write.format("noop").mode("overwrite").save()
        t01 = time.perf_counter() - t0
        n01 = df01.count()
        t0 = time.perf_counter()
        df1 = fn(spark, SF1)
        df1.write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter() - t0
        n1 = df1.count()
        factor = round(t1 / t01, 2) if t01 > 0 else None
        rec = {"sf01_sec": round(t01, 3), "sf1_sec": round(t1, 3),
               "rows_sf01": n01, "rows_sf1": n1, "factor": factor}
        if factor is not None and factor > FLAG_FACTOR:
            rec["flagged_super_linear"] = True
            flagged.append(name)
        out["queries"][name] = rec
        print(f"{name}: {t01:.2f}s -> {t1:.2f}s  x{factor} "
              f"(rows {n01} -> {n1})", flush=True)
    out["flagged"] = flagged
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    dest = os.path.join(REPO, "BENCH", "sf1.json")
    if only and os.path.exists(dest):
        # subset run: MERGE into the existing record instead of
        # clobbering the full sweep's rows
        with open(dest) as f:
            prev = json.load(f)
        prev["queries"].update(out["queries"])
        prev["flagged"] = sorted(
            set(prev.get("flagged", [])) | set(flagged))
        out = prev
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"flagged": flagged}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
