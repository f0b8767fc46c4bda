"""Salting equivalence tests: the skew rewrites must return exactly the same
result as the straightforward plan (they only change the shuffle layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_worker_spark.operators.skew import salted_agg, salted_join
from cdc_worker_spark.sources.tables import load_table


def _sorted_rows(df, *keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sq"),
        F.count("*").alias("n"),
        F.max("l_discount").alias("mx"),
    )
    salted = salted_agg(
        li,
        ["l_returnflag"],
        [("sum", "l_quantity", "sq"), ("count", "l_quantity", "n"),
         ("max", "l_discount", "mx")],
        n_salts=8,
    )
    assert _sorted_rows(plain, "l_returnflag") == _sorted_rows(salted, "l_returnflag")


def test_salted_agg_rejects_non_decomposable(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    try:
        salted_agg(li, ["l_returnflag"], [("avg", "l_quantity", "a")])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    salted = salted_join(
        orders, customer.withColumnRenamed("c_custkey", "o_custkey"),
        key="o_custkey", n_salts=4,
    )
    assert sorted(_sorted_rows(plain, "o_orderkey")) == sorted(
        _sorted_rows(salted, "o_orderkey")
    )


def test_salted_join_rejects_dim_driven_outer(spark, sf_dir):
    """right/full outer would emit each unmatched dim row once per salt
    replica — must be rejected, not silently wrong."""
    import pytest

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    ).withColumnRenamed("c_custkey", "o_custkey")
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(orders, customer, key="o_custkey", how=how)
