#!/usr/bin/env python
"""Interleaved A/B of q_emb_pq's PQ assignment: fused single-Arrow-pass
pq_assign_udf vs the r12 multipass per-subspace centroid_dists_udf chain
(VERDICT r12 next #5 — q_emb_pq read 0.38x in the driver window with the
suite's second-worst core-scaling ratio, diagnosed as m ArrowEvalPython
nodes x JVM<->Python round trips per batch; guide §4.1).

Both forms run in ONE session (the fused flag is a plain function arg),
alternating order per round. The aggregation mirrors the declared query so
the timed work is identical except the assignment pass. Centroids are
memoized at warmup exactly as the bench does (build-once/probe-many, the
standing declared exclusion).

    python scripts/bench_emb_pq_ab.py --rounds 5 --cpus 32
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("emb-pq-ab")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_worker_spark.operators.traindata import pq_codes
    from cdc_worker_spark.sources.tables import load_table
    from cdc_worker_spark.operators.dedup import with_double_vec

    def report(fused: bool):
        emb = with_double_vec(load_table(spark, args.sf_dir, "embeddings"))
        coded = pq_codes(
            emb, emb_path=f"{args.sf_dir}/embeddings.parquet", fused=fused
        )
        return (
            coded.groupBy("label")
            .agg(
                F.count("*").alias("n_vecs"),
                F.round(F.avg("sq_err"), 6).alias("avg_sq_err"),
                F.countDistinct("code_0").alias("codes_used_s0"),
            )
            .orderBy("label")
        )

    # warmup both forms at sf0.001 + memoize sf-dir centroids (bench parity)
    for fused in (True, False):
        report_df = pq_codes(
            with_double_vec(load_table(spark, "/root/testdata/sf0.001", "embeddings")),
            emb_path="/root/testdata/sf0.001/embeddings.parquet",
            fused=fused,
        )
        report_df.write.format("noop").mode("overwrite").save()
    report(True).write.format("noop").mode("overwrite").save()

    times: dict[bool, list[float]] = {True: [], False: []}
    for r in range(args.rounds):
        order = (True, False) if r % 2 == 0 else (False, True)
        for fused in order:
            spark.sparkContext.setJobDescription(
                f"emb_pq {'fused' if fused else 'multipass'} round {r}"
            )
            t0 = time.perf_counter()
            report(fused).write.format("noop").mode("overwrite").save()
            times[fused].append(round(time.perf_counter() - t0, 3))
        print(
            f"round {r}: fused {times[True][-1]:.3f} s  "
            f"multipass {times[False][-1]:.3f} s",
            flush=True,
        )

    for fused, label in ((True, "fused"), (False, "multipass")):
        ts = sorted(times[fused])
        print(
            f"{label:10s} best {ts[0]:.3f}  median {ts[len(ts)//2]:.3f}  "
            f"all {times[fused]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
