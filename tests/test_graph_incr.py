"""Incremental co-purchase edge maintenance (operators/graph_incr): the
monoid merge must equal the from-scratch derive for ANY order-atomic split,
chain across multiple deltas, and feed pagerank_bucketed the exact edge
table a full re-derive would have produced."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_worker_spark.operators.graph import copurchase_pair_counts, pagerank
from cdc_worker_spark.operators.graph_incr import (
    MIN_PAIR_ORDERS,
    edges_from_counts,
    extend_copurchase_edges,
)
from cdc_worker_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def _counts_rows(df):
    return sorted((r["src"], r["dst"], r["w"]) for r in df.collect())


def test_incremental_equals_full_for_any_split(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    want = _counts_rows(copurchase_pair_counts(li))
    for mod, rem in ((10, 9), (2, 0), (3, 1)):
        is_delta = F.pmod(F.col("l_orderkey"), F.lit(mod)) == rem
        base = copurchase_pair_counts(li.filter(~is_delta))
        merged = extend_copurchase_edges(base, li.filter(is_delta))
        assert _counts_rows(merged) == want, f"split %{mod}=={rem}"


def test_chained_deltas_equal_full(spark):
    """Folding three successive order-atomic deltas == one full derive
    (associativity over a partition of the order set)."""
    li = load_table(spark, SF_DIR, "lineitem")
    want = _counts_rows(copurchase_pair_counts(li))
    part = F.pmod(F.col("l_orderkey"), F.lit(4))
    counts = copurchase_pair_counts(li.filter(part == 0))
    for rem in (1, 2, 3):
        counts = extend_copurchase_edges(counts, li.filter(part == rem))
    assert _counts_rows(counts) == want


def test_threshold_crossing_in_both_directions(spark):
    """Counts are stored unthresholded so a pair below MIN_PAIR_ORDERS in
    the base can cross it via a delta — the edge appears only after the
    merge, exactly as a full re-derive would have it."""
    rows_base = [(1, 10), (1, 11)]          # pair (10,11) once
    rows_delta = [(2, 10), (2, 11), (2, 12)]  # pair (10,11) again + new part
    base = copurchase_pair_counts(
        spark.createDataFrame(rows_base, "l_orderkey: bigint, l_partkey: bigint")
    )
    assert edges_from_counts(base).count() == 0  # below threshold
    merged = extend_copurchase_edges(
        base,
        spark.createDataFrame(rows_delta, "l_orderkey: bigint, l_partkey: bigint"),
    )
    got = sorted(
        (r["src"], r["dst"]) for r in edges_from_counts(merged).collect()
    )
    assert got == [(10, 11), (11, 10)]
    assert MIN_PAIR_ORDERS == 2


def test_incremental_edges_feed_pagerank_identically(spark):
    """PageRank over incrementally-maintained edges == PageRank over the
    full re-derive's edges (the layout refresh contract: delta maintenance
    is a drop-in producer for pagerank / pagerank_bucketed)."""
    li = load_table(spark, SF_DIR, "lineitem")
    full_edges = (
        copurchase_pair_counts(li)
        .filter(F.col("w") >= MIN_PAIR_ORDERS)
        .select("src", "dst")
    )
    is_delta = F.pmod(F.col("l_orderkey"), F.lit(10)) == 9
    merged = extend_copurchase_edges(
        copurchase_pair_counts(li.filter(~is_delta)), li.filter(is_delta)
    )
    incr_edges = edges_from_counts(merged)
    want = {
        (r["node"], round(r["rank"], 9)) for r in pagerank(full_edges).collect()
    }
    got = {
        (r["node"], round(r["rank"], 9)) for r in pagerank(incr_edges).collect()
    }
    assert got == want
