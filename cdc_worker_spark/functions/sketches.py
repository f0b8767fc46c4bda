"""Mergeable-sketch aggregates: heavy hitters (DataSketches frequent items)
and HLL sketch build/union/estimate.

The 100 TB property on display is MERGEABILITY: each executor builds a
bounded-size partial state, and partials combine associatively across any
re-partitioning — the only aggregate shape that scales to thousands of
shards without a giant shuffle. ``q_agg_approx_distinct`` uses the fused
form; here the sketch is a first-class VALUE (built per group, unioned
across groups), which is what incremental pipelines store and re-merge.

Rows-only by design (sketch internals are engine-specific; DuckDB has no
twin) — accuracy is gated against exact twins in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_table


@query("q_agg_heavy_hitters")  # rows-only: DataSketches internals are engine-specific
def q_agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most frequent tokens across the corpus via approx_top_k
    (DataSketches frequent-items): bounded-memory per partition, partials
    merge — the corpus-vocabulary profile you cannot afford to compute with
    an exact global groupBy at 100 TB. Output exploded to (token, est_count)
    rows ordered by estimated count."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    top = toks.select(
        F.expr("approx_top_k(w, 20, 1024)").alias("tk")
    )
    return (
        top.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("token"),
            F.col("e.count").cast("long").alias("est_count"),
        )
        .orderBy(F.col("est_count").desc(), "token")
    )


@query("q_agg_hll_union")  # rows-only: HLL sketch binary is engine-specific
def q_agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order-priority AND overall — from ONE pass:
    per-group HLL sketches (hll_sketch_agg), group estimates via
    hll_sketch_estimate, and the overall estimate by UNIONING the group
    sketches (hll_union_agg) instead of re-scanning. Sketch-union is the
    incremental/rollup pattern: daily partitions keep sketches, any window
    re-aggregates by merge."""
    o = load_table(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderpriority").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk")
    )
    groups = per_group.select(
        "o_orderpriority",
        F.expr("hll_sketch_estimate(sk)").cast("long").alias("n_cust_est"),
    )
    overall = per_group.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").alias(
            "n_cust_est"
        )
    ).select(F.lit("__ALL__").alias("o_orderpriority"), "n_cust_est")
    return groups.unionByName(overall).orderBy("o_orderpriority")
