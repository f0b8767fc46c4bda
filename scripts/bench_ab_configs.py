#!/usr/bin/env python
"""Interleaved A/B of shuffle-partition / AQE-coalescing configs on the
headline suite (VERDICT r12 next #3: "32 cores is slower than 8 on the whole
suite at sf0.1" — hypothesis: shuffle.partitions = cpus*2 = 64 floors AQE
coalescing into 64 tiny partitions per exchange, so per-task scheduling/GC
overhead dominates at this SF).

All variants run inside ONE session (every config below is runtime-settable
SQL conf), in boustrophedon order per round (A,B,C,D then D,C,B,A) so box
drift cancels. Per-query min per variant across rounds; summary prints
totals and the per-query win/loss table vs base.

    python scripts/bench_ab_configs.py --rounds 3 --cpus 32
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402

VARIANTS: dict[str, dict[str, str]] = {
    # current bench session: partitions = cpus*2, AQE parallelism-first
    "base64": {
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
    },
    # fewer initial partitions (the 8-core bench ran 16 and was FASTER)
    "p16": {
        "spark.sql.shuffle.partitions": "16",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
    },
    # bracket the initial-partition sweep (round 0 signal: p16 −21%)
    "p32": {
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
    },
    "p8": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
    },
    # scale-adaptive: AQE targets bytes-per-partition, not parallelism —
    # partition count derives from shuffle size (the 100 TB-safe form)
    "pf64m": {
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
    },
    # same, smaller advisory (middle ground: fewer tasks but not serial)
    "pf16m": {
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16777216",
    },
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/ab_configs.json")
    ap.add_argument(
        "--variants", default=",".join(VARIANTS), help="comma list to run"
    )
    args = ap.parse_args()
    names = [v for v in args.variants.split(",") if v]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("bench-ab-configs")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_worker_spark.plans import all_queries
    from cdc_worker_spark.sources.layout import ingest_sized

    qs = all_queries()

    # same layout as the bench PRIMARY pass
    cache = tempfile.mkdtemp(prefix="ab_ingest_")
    ingest_sized(spark, args.sf_dir, cache)

    # warmup (same as bench.py)
    for name in HEADLINE:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    qs["q_sim_ann_ivf"](spark, cache)  # memoize centroids at target dir

    def run_suite(variant: str) -> dict[str, float]:
        for k, v in VARIANTS[variant].items():
            spark.conf.set(k, v)
        t: dict[str, float] = {}
        for name in HEADLINE:
            spark.sparkContext.setJobDescription(f"{variant}: {name}")
            t0 = time.perf_counter()
            qs[name](spark, cache).write.format("noop").mode(
                "overwrite"
            ).save()
            t[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return t

    best: dict[str, dict[str, float]] = {v: {} for v in names}
    rounds_log = []
    for r in range(args.rounds):
        order = names if r % 2 == 0 else list(reversed(names))
        for v in order:
            t = run_suite(v)
            rounds_log.append({"round": r, "variant": v, "total": round(sum(t.values()), 3), "queries": t})
            print(f"round {r} {v}: {sum(t.values()):.2f} s", flush=True)
            for q, s in t.items():
                if q not in best[v] or s < best[v][q]:
                    best[v][q] = s

    shutil.rmtree(cache, ignore_errors=True)

    summary = {
        v: {"total_of_mins": round(sum(best[v].values()), 3), "queries": best[v]}
        for v in names
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "rounds": rounds_log}, f, indent=2)

    print("\n=== totals (sum of per-query mins) ===")
    for v in names:
        print(f"  {v:8s} {summary[v]['total_of_mins']:8.3f} s")
    base = names[0]
    print(f"\n=== per-query delta vs {base} (negative = faster) ===")
    for q in HEADLINE:
        row = "  ".join(
            f"{best[v][q] - best[base][q]:+6.3f}" for v in names[1:]
        )
        print(f"  {q:28s} {best[base][q]:6.3f}  {row}")
    spark.stop()


if __name__ == "__main__":
    main()
