#!/usr/bin/env python
"""mapInPandas vs mapInArrow extraction runner, interleaved A/B.

The local[32] saturation gap is attributed to Arrow-IN + per-batch
Python worker overhead (ROADMAP #1; offsets-out and JVM-pre-scan both
measured dead). mapInArrow removes the pandas layer on BOTH sides of
the boundary — no object-Series boxing of multi-MB html bytes on input,
no pandas→Arrow conversion on output — with a byte-identical kernel
(tests/test_arrow_impl.py). This measures whether that pays.

Protocol: interleaved cycles, order alternating per cycle, verdict =
median of per-cycle ratios (the arrow_batch.json discipline). Also runs
the pair at local[8] — the unsaturated regime where per-batch overhead
is a larger share of wall time.

Writes BENCH/arrow_impl.json. Usage:
    python scripts/arrow_impl_bench.py [n_docs] [cycles]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
CYCLES = int(sys.argv[2]) if len(sys.argv) > 2 else 5
LEVELS = tuple(int(x) for x in os.environ.get(
    "ARROW_IMPL_LEVELS", "32,8").split(","))
IMPLS = ("pandas", "arrow")


def main() -> int:
    os.environ.setdefault("SCALING_BENCH_DOCS", str(N_DOCS))
    from scripts.scaling_bench import CORPUS_DIR, build_corpus

    from ocr_spark.operators.extraction import run_extraction
    from ocr_spark.session import get_spark

    build_corpus()
    out = {"n_docs": N_DOCS, "cycles": CYCLES, "levels": {}}
    for cpus in LEVELS:
        spark = get_spark(f"arrow_impl_bench_{cpus}",
                          master=f"local[{cpus}]")
        df = spark.read.parquet(CORPUS_DIR)

        def run(impl: str) -> float:
            t0 = time.perf_counter()
            run_extraction(df, partitions=cpus * 4, big_partitions=2,
                           impl=impl) \
                .write.format("noop").mode("overwrite").save()
            return N_DOCS / (time.perf_counter() - t0)

        for impl in IMPLS:
            run(impl)  # discarded warm-up per impl
        per: dict[str, list[float]] = {i: [] for i in IMPLS}
        for c in range(CYCLES):
            order = IMPLS if c % 2 == 0 else tuple(reversed(IMPLS))
            for impl in order:
                per[impl].append(round(run(impl), 1))
            print(f"local[{cpus}] cycle {c}: " + " ".join(
                f"{i}:{per[i][-1]}" for i in IMPLS), file=sys.stderr)
        med = lambda xs: sorted(xs)[len(xs) // 2]
        ratios = sorted(per["arrow"][c] / per["pandas"][c]
                        for c in range(CYCLES))
        out["levels"][str(cpus)] = {
            "pandas_docs_per_sec_cycles": per["pandas"],
            "arrow_docs_per_sec_cycles": per["arrow"],
            "pandas_median": med(per["pandas"]),
            "arrow_median": med(per["arrow"]),
            "arrow_over_pandas_per_cycle": [round(r, 3) for r in ratios],
            "arrow_over_pandas_median": round(ratios[len(ratios) // 2], 3),
        }
        spark.stop()

    meds = [v["arrow_over_pandas_median"] for v in out["levels"].values()]
    win = all(m >= 1.1 for m in meds)
    out["verdict"] = (
        "ADOPT arrow: >=1.1x median at every level — flip the "
        "OCR_SPARK_EXTRACT_IMPL default" if win else
        "KEEP pandas default: arrow below the 1.1x adoption bar "
        "(median ratios per level: "
        + ", ".join(f"local[{k}]={v['arrow_over_pandas_median']}"
                    for k, v in out["levels"].items())
        + ") — the kernel dominates and the pandas layer is not the "
        "bottleneck it was hypothesized to be; impl stays available "
        "as a knob")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "arrow_impl.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
