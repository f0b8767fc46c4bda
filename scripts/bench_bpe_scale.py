"""BPE merge-rate measurement (VERDICT r11 next #4): the sf1 corpus's
word-frequency table through both trainer paths —

- the distributed per-round fold (one Spark job pair per merge): the
  pre-r12 only path, measured at its honest per-round job-latency
  ceiling over N_DIST merges;
- the r12 in-driver incremental trainer (heap + occurrence index) over
  N_INCR merges — the path a real 10k-50k-merge vocab takes, after the
  one genuinely corpus-scale step (the distributed word-frequency
  aggregation, timed separately).

Equality is asserted on the shared prefix (first N_DIST merges) — the
same bit-equality the tests/test_traindata.py gates pin at fixture
scale — so the speedup row in SCALE.md is for a PROVEN-equal result.

The FIXTURE corpus has a ~40-word vocabulary (driver-synthesized text),
which exhausts after ~100 merges and cannot exercise a real tokenizer
run — so --synthetic-vocab V additionally measures both paths on a
V-distinct-word Zipf-weighted hashed vocabulary (hex tokens, lengths
4-15), the shape that sustains 10k+ merges. The fixture row stays in
the output as the corpus-derived anchor.

Usage: python scripts/bench_bpe_scale.py [--sf /root/repo/.fixtures/sf1]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

N_DIST = 8
N_INCR = 4096


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.fixtures/sf1")
    ap.add_argument("--n-dist", type=int, default=N_DIST)
    ap.add_argument("--n-incr", type=int, default=N_INCR)
    ap.add_argument("--synthetic-vocab", type=int, default=500_000)
    ap.add_argument("--n-incr-synth", type=int, default=10_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cdc_worker_spark.operators.traindata import (
        bpe_merges,
        bpe_merges_incremental,
    )
    from cdc_worker_spark.session import get_spark
    from cdc_worker_spark.sources.tables import load_table

    spark = get_spark("bench-bpe-scale")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, args.sf, "documents")
    t0 = time.perf_counter()
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)  # vocab-sized: fine in memory
    )
    n_vocab = words.count()
    freq_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    dist = bpe_merges(words, n_merges=args.n_dist, driver_vocab_cap=0)
    dist_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    rows = [(r["word"], r["cnt"]) for r in words.collect()]
    collect_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    incr = bpe_merges_incremental(rows, args.n_incr)
    incr_sec = time.perf_counter() - t0

    prefix_equal = incr[: len(dist)] == dist

    # ---- synthetic deep-vocab cell: the regime a real tokenizer runs
    synth = None
    if args.synthetic_vocab:
        v = args.synthetic_vocab
        sw = spark.range(v).select(
            F.substring(
                F.hex(F.xxhash64("id")), 1, (4 + F.pmod("id", F.lit(12))).cast("int")
            ).alias("word"),
            (F.lit(v) / (F.col("id") + 1) + 1).cast("long").alias("cnt"),
        ).groupBy("word").agg(F.sum("cnt").alias("cnt"))
        t0 = time.perf_counter()
        srows = [(r["word"], r["cnt"]) for r in sw.collect()]
        s_collect = time.perf_counter() - t0
        t0 = time.perf_counter()
        s_dist = bpe_merges(sw, n_merges=args.n_dist, driver_vocab_cap=0)
        s_dist_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        s_incr = bpe_merges_incremental(srows, args.n_incr_synth)
        s_incr_sec = time.perf_counter() - t0
        synth = {
            "n_vocab": len(srows),
            "vocab_collect_sec": round(s_collect, 2),
            "distributed": {
                "n_merges": len(s_dist),
                "wall_sec": round(s_dist_sec, 2),
                "merges_per_sec": round(len(s_dist) / s_dist_sec, 3),
            },
            "incremental": {
                "n_merges": len(s_incr),
                "wall_sec": round(s_incr_sec, 2),
                "merges_per_sec": round(len(s_incr) / s_incr_sec, 1),
            },
            "prefix_equal": s_incr[: len(s_dist)] == s_dist,
        }
        prefix_equal = prefix_equal and synth["prefix_equal"]

    print(
        json.dumps(
            {
                "metric": "bpe_merges_per_sec",
                "sf_dir": args.sf,
                "n_vocab": n_vocab,
                "word_freq_agg_sec": round(freq_sec, 2),
                "vocab_collect_sec": round(collect_sec, 2),
                "distributed": {
                    "n_merges": len(dist),
                    "wall_sec": round(dist_sec, 2),
                    "merges_per_sec": round(len(dist) / dist_sec, 3),
                },
                "incremental": {
                    "n_merges": len(incr),
                    "wall_sec": round(incr_sec, 2),
                    "merges_per_sec": round(len(incr) / incr_sec, 1),
                },
                "prefix_equal": prefix_equal,
                "synthetic": synth,
            }
        )
    )
    spark.stop()
    return 0 if prefix_equal else 1


if __name__ == "__main__":
    raise SystemExit(main())
