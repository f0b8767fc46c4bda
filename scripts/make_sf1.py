#!/usr/bin/env python
"""Generate an sf1 fixture set (10x sf0.1) for scale validation.

The driver ships fixtures only up to sf0.1 (TESTDATA.md); every scale claim
beyond that was extrapolated. This builds a 10x set the same way
scripts/bench_scaling.py builds its 2x-8x shards — key-shifted unions of
sf0.1, each copy a disjoint self-consistent shard sharing the dim tables —
plus two content perturbations the scaling shards didn't need but a
CORRECTNESS run at 10x does:

- ``documents.text`` gets a per-copy marker token prepended (and n_chars
  adjusted), so copies are not verbatim clones: near-dup clusters stay
  fixture-sized instead of multiplying 10x (a 10x cluster means 100x
  candidate PAIRS — that would benchmark the fixture artifact, not the
  operator).
- ``embeddings.embedding`` is cyclically rotated per copy, which
  decorrelates copies (cosine between a vector and its rotation is ~random)
  for the same reason.

Copy 0 is byte-identical content to sf0.1, so every query keyed on low ids
(point lookups, probe sets) still finds its rows.

Usage: python scripts/make_sf1.py [--out /root/repo/.fixtures/sf1] [--factor 10]

Round 6 generalization (VERDICT r05 next #1): ``--factor 100`` builds the
sf10 set (~1.7 GB parquet) for the two-decade scale sweep; rotation-wrapped
embedding copies (factor > 64 dims) are sign-flipped so no copy clones
another.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

BASE_SF = "/root/testdata/sf0.1"

from scripts.bench_scaling import COPY_STRIDE, KEY_SHIFTS  # noqa: E402


def build_sf1(spark, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from cdc_worker_spark.sources.tables import TABLES, load_table

    for name in TABLES:
        base = load_table(spark, BASE_SF, name)
        shifts = KEY_SHIFTS[name]
        parts = []
        for i in range(factor if shifts else 1):
            df = base
            for col in shifts:
                df = df.withColumn(
                    col, (F.col(col) + F.lit(i * COPY_STRIDE)).cast("long")
                )
            if i > 0 and name == "documents":
                marker = F.lit(f"shard{i} ")
                df = df.withColumn(
                    "text", F.concat(marker, F.col("text"))
                ).withColumn(
                    "n_chars", F.col("n_chars") + F.length(marker)
                )
            if i > 0 and name == "embeddings":
                # rotate by i positions: slice(i+1..n) ++ slice(1..i)
                n = len(base.select("embedding").first()[0])
                rot = i % n
                if rot:
                    df = df.withColumn(
                        "embedding",
                        F.concat(
                            F.slice("embedding", rot + 1, n - rot),
                            F.slice("embedding", 1, rot),
                        ),
                    )
                if (i // n) % 2 == 1:
                    # factor > dim wraps the rotation; negate wrapped
                    # copies so no copy is a verbatim clone of another
                    # (cosine of v and -rot(v) is ~-cosine — decorrelated)
                    df = df.withColumn(
                        "embedding",
                        F.transform("embedding", lambda x: -x),
                    )
                wrap2 = i // (2 * n)
                if wrap2 > 0:
                    # factor > 2*dim wraps (rotation, sign) pairs too
                    # (first hit at factor>128): apply a deterministic
                    # per-wrap Rademacher mask (md5-derived ±1 per dim,
                    # ~half flipped) so wrapped copies decorrelate
                    # (cosine of v and mask*v is ~0) instead of cloning
                    import hashlib

                    mask = [
                        1.0
                        if int(
                            hashlib.md5(f"sfmask:{wrap2}:{d}".encode()).hexdigest()[:2],
                            16,
                        )
                        % 2
                        else -1.0
                        for d in range(n)
                    ]
                    df = df.withColumn(
                        "embedding",
                        F.zip_with(
                            "embedding",
                            F.array(*[F.lit(m) for m in mask]),
                            lambda x, m: x * m,
                        ),
                    )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        n_files = max(1, min(64, (out.count() + 49_999) // 50_000))
        out.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"  {name}: {out.count()} rows, {n_files} files", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.fixtures/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("make-sf1")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    build_sf1(spark, args.factor, args.out)
    print(f"sf1 fixtures at {args.out}")


if __name__ == "__main__":
    main()
