#!/usr/bin/env python
"""Drive the public driver contract end-to-end, as the external driver would.

Vanilla SparkSession (deliberately hostile: non-UTC timezone, no engine
configs), import __spark_entry__, run entry() + every queries() entry and
compare against oracle_sql() via DuckDB. Non-zero exit on any mismatch.
"""

from __future__ import annotations

import argparse
import math
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_equal(x, y) -> bool:
    if x is None and y is None:
        return True
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y):
            return True
        return x == y or abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
    return x == y


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--tz", default="America/New_York")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--driver-mem",
        default=None,
        help="driver heap (e.g. 8g). Default: Spark's vanilla 1g — the "
        "external contract fidelity setting. The sf1 scale sweep needs "
        "more because THIS HARNESS collects full result sets for "
        "hashing (millions of rows at sf1), which shares the heap with "
        "broadcast builds.",
    )
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[8]")
        .appName("drive-contract")
        .config("spark.sql.session.timeZone", args.tz)
    )
    if args.driver_mem:
        builder = builder.config("spark.driver.memory", args.driver_mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    edf = e.entry(spark)
    n_entry = edf.count()
    print(f"entry(): rows={n_entry} schema={edf.schema.simpleString()}")
    assert n_entry > 0, "entry() returned no rows"

    con = duckdb.connect()
    for t in TABLES.split():
        # driver fixtures are single files; Spark-written fixtures (e.g. the
        # sf1 scale set from scripts/make_sf1.py) are directories of parts
        src = f"{args.sf}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs, osql = e.queries(), e.oracle_sql()
    names = [args.only] if args.only else sorted(qs)
    fails = []
    for name in names:
        try:
            got = norm(qs[name](spark, args.sf).toPandas())
            if name not in osql:
                print(f"{name}: rows-only, rows={len(got)} OK")
                continue
            want = norm(con.execute(osql[name]).df())
            ok = (
                list(got.columns) == list(want.columns)
                and len(got) == len(want)
                and list(map(str, got.dtypes)) == list(map(str, want.dtypes))
            )
            if ok:
                for c in got.columns:
                    if not all(
                        values_equal(x, y) for x, y in zip(got[c].tolist(), want[c].tolist())
                    ):
                        ok = False
                        break
            if not ok:
                fails.append(name)
            print(f"{name}: rows={len(got)} {'MATCH' if ok else 'MISMATCH'}")
        except Exception as ex:  # noqa: BLE001 — report and continue the sweep
            fails.append(name)
            print(f"{name}: ERROR {str(ex)[:160]}")
    print("FAILED:", fails if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
