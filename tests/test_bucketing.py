"""Bucketed co-located join tests: same key + same bucket count on both sides
must plan a join with ZERO shuffle exchanges (the repeated-join cost collapse
that motivates bucketing at 100 TB), and return the same rows as the plain
join of the unbucketed inputs."""

from __future__ import annotations

import pytest

from cdc_worker_spark.sources.bucketing import colocated_join, write_bucketed
from cdc_worker_spark.sources.tables import load_table


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "b_orders", "o_orderkey", 8, path=str(tmp_path / "bo"))
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8, path=str(tmp_path / "bl"))
    yield orders, lineitem
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    """With broadcast disabled (at 100 TB neither side broadcasts), matching
    bucket specs plan a SortMergeJoin with zero exchanges."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        tree = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        ).split("\n(1)")[0]
        assert "Exchange" not in tree  # bucket specs match: shuffle-free join
        assert "SortMergeJoin" in tree
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    plain = orders.join(lineitem, "o_orderkey")
    bucketed = colocated_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    assert plain.count() == bucketed.count()
    key = ["o_orderkey", "o_custkey", "l_quantity"]
    assert sorted(map(tuple, plain.select(*key).collect())) == sorted(
        map(tuple, bucketed.select(*key).collect())
    )
