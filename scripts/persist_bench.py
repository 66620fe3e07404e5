#!/usr/bin/env python
"""Measure shared-subtree persist for the composed verdicts (round-3
verdict #7): docs_fineweb_verdict re-derives the `documents` scan +
tokenize in 6+ independent subplans (gopher, repetition, substring-dup,
dedup keepers, classifier/percentile, decontamination — plus the
extraction-based line gate). Does persisting the shared `documents`
frame pay at sf0.1, or is the zstd parquet re-scan cheaper than the
cache round-trip?

Protocol: order-alternating interleaved A/B (the arrow_batch.json
discipline — this host's speed swings between runs, so A and B must
interleave within each cycle and the verdict is the per-cycle-ratio
median). A = stock; B = same query with the three plan modules'
documents-scan helpers monkeypatched to return one persisted
(MEMORY_AND_DISK, deserialized) DataFrame. Extraction's
pages_from_documents keeps its own scan in both arms — the pages side
feeds a pandas UDF and is not the re-derived subtree under test.

Writes BENCH/persist.json with the adoption decision.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CYCLES = int(os.environ.get("PERSIST_BENCH_CYCLES", "5"))
QUERIES = ("docs_fineweb_verdict", "docs_drop_reason_report")


def main() -> int:
    from pyspark import StorageLevel

    from ocr_spark.plans import curation, dataops, webops
    from ocr_spark.session import get_spark

    spark = get_spark("persist_bench", master="local[32]")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()  # warm JVM

    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    stock_docs = curation._docs
    stock_t = dataops.t
    stock_wdocs = webops._docs

    cached = {}

    def cached_docs(spark, sf_dir):
        df = cached.get(sf_dir)
        if df is None:
            df = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                  .persist(StorageLevel.MEMORY_AND_DISK))
            df.count()  # materialize before timing consumers
            cached[sf_dir] = df
        return df

    def cached_t(spark, sf_dir, name):
        if name == "documents":
            return cached_docs(spark, sf_dir)
        return stock_t(spark, sf_dir, name)

    def set_mode(persist: bool) -> None:
        if persist:
            curation._docs = cached_docs
            webops._docs = cached_docs
            dataops.t = cached_t
        else:
            curation._docs = stock_docs
            webops._docs = stock_wdocs
            dataops.t = stock_t

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop") \
            .mode("overwrite").save()
        return time.perf_counter() - t0

    out = {"sf_dir": SF_DIR, "cycles": CYCLES,
           "protocol": "order-alternating interleaved A/B; "
                       "verdict = median per-cycle ratio",
           "queries": {}}
    for qname in QUERIES:
        # one discarded warmup per arm
        set_mode(False); run(qname)
        set_mode(True); run(qname)
        pairs = []
        for c in range(CYCLES):
            if c % 2 == 0:
                set_mode(False); a = run(qname)
                set_mode(True); b = run(qname)
            else:
                set_mode(True); b = run(qname)
                set_mode(False); a = run(qname)
            pairs.append((round(a, 3), round(b, 3)))
        ratios = sorted(a / b for a, b in pairs)
        med = ratios[len(ratios) // 2]
        out["queries"][qname] = {
            "stock_vs_persist_sec_per_cycle": pairs,
            "per_cycle_speedup_ratio": [round(r, 3) for r in ratios],
            "median_speedup": round(med, 3),
        }
    meds = [v["median_speedup"] for v in out["queries"].values()]
    win = all(m >= 1.1 for m in meds)
    out["verdict"] = (
        "ADOPT: persisting the shared documents frame speeds the "
        "composed verdicts >=1.1x median" if win else
        "REJECT: median speedup below 1.1x — the zstd parquet re-scan "
        "is within noise of the cache round-trip on this corpus; keep "
        "the stateless plan (caching would cost executor memory and a "
        "cache-invalidation seam for no measured win)")
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, "BENCH", "persist.json"), "w") as f:
        json.dump(out, f, indent=2)
    for df in cached.values():
        df.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
