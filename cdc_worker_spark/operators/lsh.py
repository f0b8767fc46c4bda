"""Random-hyperplane LSH primitives shared by similarity search and
embedding dedup.

The banding shape (T tables x B bits, candidate = any-table bucket
collision) is the standard scale path for cosine neighbor problems: the
doc x doc cross product never materializes — candidates come from equi-joins
on (table, signature), so shuffle volume tracks bucket co-occupancy, not n^2.
Hyperplanes are deterministic (md5-derived literals), so plans and results
are stable run-to-run and engine-free.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pseudo_hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (md5-derived, engine-free)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"lsh:{p}:{d}".encode()).hexdigest()
            row.append((int(h[:8], 16) / 0x7FFFFFFF) - 1.0)  # ~U(-1, 1)
        planes.append(row)
    return planes


def with_lsh_buckets(
    emb: DataFrame,
    n_tables: int,
    n_bits: int,
    dim: int = 64,
    dv_col: str = "dv",
) -> DataFrame:
    """Explode each vector row into ``n_tables`` rows carrying (tbl, sig):
    sig = B sign-bits of hyperplane dot products (sequential folds, JVM-side).

    All input columns pass through; one output row per (vector, table).
    """
    from cdc_worker_spark.operators.dedup import dot_col

    planes = pseudo_hyperplanes(n_tables * n_bits, dim)
    tables = []
    for t in range(n_tables):
        sig = F.lit(0)
        for b in range(n_bits):
            plane_col = F.array(*[F.lit(v) for v in planes[t * n_bits + b]])
            sig = sig + F.when(
                dot_col(F.col(dv_col), plane_col) > 0, F.lit(1 << b)
            ).otherwise(0)
        tables.append(F.struct(F.lit(t).alias("tbl"), sig.alias("sig")))
    return emb.withColumn("_b", F.explode(F.array(*tables))).select(
        *emb.columns, F.col("_b.tbl").alias("tbl"), F.col("_b.sig").alias("sig")
    )
