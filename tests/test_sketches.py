"""Accuracy gates for the mergeable-sketch queries (same discipline as
test_sketch_tolerance.py): rows-only sketches must estimate the right
quantities, pinned against exact twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import all_queries
from cdc_worker_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_heavy_hitters_contain_exact_top_and_counts_match(spark):
    """DataSketches frequent-items with a 1024 map over a small vocabulary
    is effectively exact: the exact top-10 tokens must all appear, with
    estimated counts within 1% of exact."""
    got = {
        r.token: r.est_count
        for r in all_queries()["q_agg_heavy_hitters"](spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents")
    exact = {
        r.w: r.n
        for r in (
            docs.select(F.explode(F.split("text", " ")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w").agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), "w").limit(10)
        ).collect()
    }
    assert set(exact) <= set(got), f"missing: {set(exact) - set(got)}"
    for w, n in exact.items():
        assert abs(got[w] - n) <= max(1, 0.01 * n), (w, got[w], n)


def test_hll_union_estimates_within_rsd(spark):
    """Per-group estimates AND the union-of-sketches overall estimate land
    within 3x the default HLL rsd (~1.56%) of exact COUNT(DISTINCT)."""
    got = {
        r.o_orderpriority: r.n_cust_est
        for r in all_queries()["q_agg_hll_union"](spark, SF).collect()
    }
    o = load_table(spark, SF, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact["__ALL__"] = o.select("o_custkey").distinct().count()
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert n > 100
        rel = abs(got[k] - n) / n
        assert rel <= 3 * 0.0156, (k, got[k], n, rel)
