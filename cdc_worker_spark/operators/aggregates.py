"""Aggregation surface (SURVEY §2.3): hash agg, global, distinct, approx,
having, rollup/cube/grouping sets.

Provenance: running counters / max-offset tracking (reference client.js:747-778
— C3), checkpoint tracking (design doc D3), plus standard relational
completeness.

Scale notes: groupBy aggregates run partial (map-side combine) + final
automatically — the shuffle carries pre-aggregated state, not raw rows.
COUNT(DISTINCT) expands to a two-phase plan; for 100 TB cardinality estimation
use q_agg_approx_distinct (HLL, constant memory per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_worker_spark.functions.exprs import dec_sum, money_expr
from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_table


@query(
    "q_agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-measure hash aggregate. SUMs via exact DECIMAL
    (bitwise-deterministic), AVGs rounded to 4."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        dec_sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("sum_base_price"),
        dec_sum(money_expr("l_extendedprice", discount="l_discount")).alias("sum_disc_price"),
        dec_sum(money_expr("l_extendedprice", discount="l_discount", tax="l_tax")).alias(
            "sum_charge"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "q_agg_global",
    oracle="""
    SELECT count(*) AS n_orders,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           count(DISTINCT o_orderstatus) AS n_status
    FROM orders
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand aggregate — the reference's running counters/max shape (C3:
    receivedEventCount++, lastReplayId=max)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        dec_sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_price"),
        F.countDistinct("o_orderstatus").alias("n_status"),
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (Catalyst plans the two-phase expand)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count("*").alias("n_orders"),
    )


@query("q_agg_approx_distinct")  # rows-only: HLL estimates are engine-specific
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB-scale cardinality
    path — constant memory per group vs COUNT(DISTINCT)'s expand+shuffle.
    Rows-only oracle: sketch estimates differ across engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_n_cust")
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_custkey HAVING count(*) > 10
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            dec_sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        )
        .filter(F.col("n_orders") > 10)
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        dec_sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate (all grouping combinations)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        dec_sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL path — Catalyst expands to a union-free
    Expand node, one pass over the data)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders_gs_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev / correlation / covariance): all
    single-pass mergeable moments — partial-aggregated map-side like any
    sum, so the shuffle carries O(groups) moment tuples. Rounded because
    moment accumulation order differs between engines in the last bits."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
    )


@query(
    "q_agg_percentiles",
    oracle="""
    SELECT event_type,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY value), 6) AS p50,
           round(percentile_cont(0.95) WITHIN GROUP (ORDER BY value), 6) AS p95
    FROM events GROUP BY event_type
    """,
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (interpolated + discrete). Exact percentile sorts
    within group — fine at per-group scale; the declared 100 TB path is
    approx_percentile (t-digest-style mergeable sketch), exactly as
    q_agg_approx_distinct stands in for exact COUNT DISTINCT."""
    from cdc_worker_spark.sources.tables import load_events_ms

    ev = load_events_ms(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )


@query("q_agg_approx_percentile")  # rows-only: t-digest-style sketch is engine-specific
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declared 100 TB percentile path: approx_percentile's mergeable
    sketch (map-side partials of bounded size, like approx_count_distinct's
    HLL) — the exact twin q_agg_percentiles is the small-scale oracle."""
    from cdc_worker_spark.sources.tables import load_events_ms

    ev = load_events_ms(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
        F.percentile_approx("value", 0.99, 10000).alias("p99_approx"),
    )
