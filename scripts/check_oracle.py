#!/usr/bin/env python
"""Self-check of the driver contract: run every queries() entry on Spark
and its oracle_sql() on DuckDB, compare row count, column names, and an
order-insensitive value hash (floats rounded) — a local approximation of
the driver's CORRECTNESS gate.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]

Env ``ORACLE_TZ`` sets the DuckDB session TimeZone (default UTC-as-is):
oracles must be timezone-independent (naive-timestamp domain only —
DuckDB's to_timestamp/TIMESTAMPTZ comparisons silently change results
with the host zone); run once with ORACLE_TZ=America/New_York to catch
that class.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

SF_DIR = "/root/testdata/sf0.01"


def value_hash(df) -> tuple[int, list[str], str]:
    """(row_count, sorted columns, hash) from a pandas frame."""
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        col = df[c]
        if col.dtype == "float64" or col.dtype == "float32":
            df[c] = col.round(6)
        # normalize timestamps/dates to ISO strings
        if "datetime" in str(col.dtype):
            df[c] = col.astype("datetime64[us]").dt.strftime("%Y-%m-%d %H:%M:%S.%f")
    rows = ["\x1f".join(repr(v) for v in rec) for rec in df.itertuples(index=False)]
    rows.sort()
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return len(df), cols, h


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from ocr_spark.plans.queries import TABLES
    from ocr_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DIR
    only = set(sys.argv[2:])

    spark = get_spark("check_oracle", master="local[8]")
    con = duckdb.connect()
    tz = os.environ.get("ORACLE_TZ")
    if tz:
        con.execute(f"SET TimeZone='{tz}'")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error {exc}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows ({spark_s:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error {exc}")
            failures.append(name)
            continue
        sc, scols, sh = value_hash(spark_pdf)
        dc, dcols, dh = value_hash(duck_pdf)
        ok = (sc == dc) and (scols == dcols) and (sh == dh)
        status = "OK  " if ok else "FAIL"
        print(f"{status} {name}: spark {sc} rows / duck {dc} rows "
              f"cols={'=' if scols == dcols else f'{scols} vs {dcols}'} "
              f"hash={'=' if sh == dh else 'MISMATCH'} ({spark_s:.1f}s)")
        if not ok:
            failures.append(name)
            if scols == dcols and sc == dc:
                # show a value diff sample
                import pandas as pd
                a = spark_pdf[sorted(spark_pdf.columns)].sort_values(
                    sorted(spark_pdf.columns)).reset_index(drop=True)
                b = duck_pdf[sorted(duck_pdf.columns)].sort_values(
                    sorted(duck_pdf.columns)).reset_index(drop=True)
                neq = (a.astype(str) != b.astype(str)).any(axis=1)
                print(a[neq].head(3))
                print(b[neq].head(3))
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}" if failures
          else "\nall checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
