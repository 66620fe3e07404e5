#!/usr/bin/env python
"""Measure the JVM boilerplate pre-scan (OCR_SPARK_JVM_PRESCAN) on a
script-heavy corpus.

The synthetic golden corpus is script-lean (~100 bytes of head/script
per page), so the pre-scan is a no-op there by construction. Real
Common-Crawl pages are the opposite — script/style routinely exceed
half the page bytes — and THAT is the regime the pre-scan targets: the
bytes deleted JVM-side never cross the Arrow boundary and never occupy
the Python parser. This bench reproduces the regime deterministically
by injecting a fixed-size script blob into every html page, then times
run_extraction with the pre-scan off vs on (same input, same
parallelism, interleaved reps, steady-state: warm-up rep discarded).

Writes BENCH/prescan.json. Usage:
    python scripts/prescan_bench.py [n_docs] [script_kb] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
SCRIPT_KB = int(sys.argv[2]) if len(sys.argv) > 2 else 12
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def build_rows() -> list[tuple[str, bytearray]]:
    from ocr_spark.gen.corpus import generate_pages

    # deterministic filler: analytics-looking js, no randomness
    unit = "var v%d = {k: 'payload', n: %d};\n"
    blob_parts, size, i = [], 0, 0
    while size < SCRIPT_KB * 1024:
        s = unit % (i, i * 7)
        blob_parts.append(s)
        size += len(s)
        i += 1
    blob = f"<script>{''.join(blob_parts)}</script>"

    rows = []
    for r in generate_pages(N_DOCS, seed=11, fixture_frac=0.0,
                            oversized_rows=0):
        html = r["html"]
        # inject right after <body> — same DOM position on every page
        idx = html.find(b"<body>")
        pos = idx + len(b"<body>") if idx >= 0 else 0
        rows.append((r["url"],
                     bytearray(html[:pos] + blob.encode() + html[pos:])))
    return rows


def main() -> int:
    from pyspark.sql import functions as F

    from ocr_spark.operators.extraction import run_extraction
    from ocr_spark.session import get_spark

    spark = get_spark("prescan_bench", master=f"local[{CPUS}]")
    rows = build_rows()
    df = spark.createDataFrame(rows, "url string, html binary")
    df = df.withColumn("warc_ts", F.lit("2025-01-01").cast("timestamp")) \
           .withColumn("text", F.lit(None).cast("string")) \
           .withColumn("lang", F.lit("en"))
    df.persist().count()  # input materialized once; both modes read it

    bytes_total = sum(len(h) for _, h in rows)

    def run(prescan: bool) -> float:
        t0 = time.perf_counter()
        run_extraction(df, partitions=CPUS * 4, big_partitions=2,
                       jvm_prescan=prescan) \
            .write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # interleaved A/B with a discarded warm-up pair
    run(False), run(True)
    base, pre = [], []
    for _ in range(REPS):
        base.append(run(False))
        pre.append(run(True))

    med = lambda xs: sorted(xs)[len(xs) // 2]
    out = {
        "n_docs": N_DOCS,
        "script_kb_injected": SCRIPT_KB,
        "bytes_total_mb": round(bytes_total / 1e6, 1),
        "cpus": CPUS,
        "reps": REPS,
        "sec_base": [round(x, 2) for x in base],
        "sec_prescan": [round(x, 2) for x in pre],
        "median_sec_base": round(med(base), 2),
        "median_sec_prescan": round(med(pre), 2),
        "speedup": round(med(base) / med(pre), 3),
        "docs_per_sec_base": round(N_DOCS / med(base), 1),
        "docs_per_sec_prescan": round(N_DOCS / med(pre), 1),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "prescan.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
