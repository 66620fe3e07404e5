#!/usr/bin/env python
"""Materialize the synthetic pages table as an iceberg-shim snapshot."""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--fixture-frac", type=float, default=0.1)
    ap.add_argument("--oversized", type=int, default=2)
    ap.add_argument("--partitions", type=int, default=32)
    args = ap.parse_args()

    from ocr_spark.session import get_spark
    from ocr_spark.sources import iceberg_shim as shim

    spark = get_spark("ocr_spark.gen")
    n, seed, ff, ov = args.rows, args.seed, args.fixture_frac, args.oversized
    # generate distributed: each task regenerates its own rows from the seed
    rdd = spark.sparkContext.parallelize(range(n), args.partitions)

    def gen(i):
        from ocr_spark.gen.corpus import make_row as mk
        r = mk(i, seed=seed, n_rows=n, fixture_frac=ff, oversized_rows=ov)
        return (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])

    df = spark.createDataFrame(
        rdd.map(gen),
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    ).select("url", "warc_ts", "html", "text", "lang")
    sid = shim.write_snapshot(df, args.out)
    print(f"snapshot {sid} rows={n} at {args.out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
