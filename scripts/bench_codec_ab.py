#!/usr/bin/env python
"""Interleaved lz4-vs-zstd A/B for the shuffle/spill codec on the heaviest
shufflers (VERDICT r12 next #8; guide §2.3 "Compression ... there is no
universal answer — measure shuffle bytes written and stage time with each").

`spark.io.compression.codec` is a STATIC conf (fixed at JVM start), so each
(codec, round) pair runs in its own subprocess JVM; rounds alternate codec
order (boustrophedon) so box drift cancels. Per query we record wall seconds
to a noop sink (best across rounds) plus the suite's total shuffle bytes
written, read from the status store so the ratio claim is measured, not
assumed.

    python scripts/bench_codec_ab.py --sf-dir /root/repo/.fixtures/sf1 --rounds 3
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent

#: the five largest shufflers per VERDICT r12 (quiet-box cost ranking)
QUERIES = [
    "q_graph_pagerank",
    "q_graph_pagerank_directed",
    "q_basket_pairs",
    "q_dedup_embedding",
    "q_tpch_q21",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

codec, sf_dir, queries = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
spark = (
    SparkSession.builder.master("local[32]")
    .appName(f"codec-ab-{{codec}}")
    .config("spark.io.compression.codec", codec)
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
qs = all_queries()
# warmup at the smallest SF (codegen + Python workers), not timed
for name in queries:
    qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
out = {}
for name in queries:
    spark.sparkContext.setJobDescription(f"codec {{codec}}: {{name}}")
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = round(time.perf_counter() - t0, 3)
# total shuffle bytes written across the app (executor summaries)
store = spark._jsparkSession.sparkContext().statusStore()
sw = sum(
    store.executorList(False).apply(i).totalShuffleWrite()
    for i in range(store.executorList(False).size())
)
print("CODEC_RESULT " + json.dumps({"codec": codec, "queries": out, "shuffle_write_bytes": int(sw)}))
spark.stop()
"""


def run_child(codec: str, sf_dir: str) -> dict:
    script = _CHILD.format(repo=str(HERE.parent))
    p = subprocess.run(
        [sys.executable, "-c", script, codec, sf_dir, ",".join(QUERIES)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for ln in p.stdout.splitlines():
        if ln.startswith("CODEC_RESULT "):
            return json.loads(ln[len("CODEC_RESULT "):])
    raise RuntimeError(
        f"{codec} child produced no result; tail:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.fixtures/sf1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="/tmp/codec_ab.json")
    args = ap.parse_args()

    codecs = ["lz4", "zstd"]
    best: dict[str, dict[str, float]] = {c: {} for c in codecs}
    bytes_seen: dict[str, list[int]] = {c: [] for c in codecs}
    log = []
    for r in range(args.rounds):
        order = codecs if r % 2 == 0 else list(reversed(codecs))
        for c in order:
            res = run_child(c, args.sf_dir)
            log.append({"round": r, **res})
            bytes_seen[c].append(res["shuffle_write_bytes"])
            print(
                f"round {r} {c}: total {sum(res['queries'].values()):.2f} s, "
                f"shuffle {res['shuffle_write_bytes']/1e6:.1f} MB",
                flush=True,
            )
            for q, s in res["queries"].items():
                if q not in best[c] or s < best[c][q]:
                    best[c][q] = s

    summary = {
        c: {
            "total_of_mins": round(sum(best[c].values()), 3),
            "queries": best[c],
            "shuffle_write_bytes": bytes_seen[c],
        }
        for c in codecs
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "rounds": log}, f, indent=2)
    print("\n=== per-query mins ===")
    for q in QUERIES:
        print(f"  {q:28s} lz4 {best['lz4'][q]:7.3f}  zstd {best['zstd'][q]:7.3f}")
    print(
        f"  totals: lz4 {summary['lz4']['total_of_mins']:.3f} s  "
        f"zstd {summary['zstd']['total_of_mins']:.3f} s"
    )


if __name__ == "__main__":
    main()
