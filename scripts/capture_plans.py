#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/r<N>/.

Usage: python scripts/capture_plans.py <suffix> [q_name,...]
  suffix: "before" or "after" (file name suffix)
  queries: comma-separated; default = the full bench HEADLINE list.
  round dir: $SPARK_GRAFT_PLANS_ROUND (default r13).

Planning only (explain does not run jobs). Session mirrors bench.py's so
plan shapes (AQE, shuffle partitions, thresholds) match what the bench
executes.
"""

from __future__ import annotations

import io
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("capture-plans")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        # r13: mirror the bench session's join policy so captured shapes
        # match what the bench executes (r12 captures predate the flip)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    from cdc_worker_spark.plans import all_queries

    qs = all_queries()
    names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else list(bench.HEADLINE)
    )
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
    out_dir = pathlib.Path(__file__).resolve().parent.parent / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
