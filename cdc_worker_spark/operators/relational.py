"""Scans, projections, filters, predicates, sorts, limits (SURVEY §2.3).

Standard relational completeness needed to query CDC-maintained tables; the
reference's only read paths are point lookup + range scan
(toolingApiHelper.js:21-49; design doc :348-352).

Scale notes: every filter here is a parquet-pushable predicate and every
select prunes columns at the scan (verify: ``.explain`` shows PushedFilters /
ReadSchema). Top-k uses orderBy+limit which Spark plans as
TakeOrderedAndProject — per-partition heap + driver merge, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_table


@query(
    "q_scan_project",
    oracle="SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice FROM lineitem",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan + projection (column pruning reaches the parquet reader)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@query(
    "q_scan_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-06-01'
    """,
)
def q_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan with pushed predicate (PushedFilters: GreaterThanOrEqual)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp_ntz"))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


@query(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity > 25 AS bulky
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic/boolean expressions + aliasing (per-row IEEE math is
    deterministic across engines; no rounding needed)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "charge"
        ),
        (F.col("l_quantity") > 25).alias("bulky"),
    )


@query(
    "q_filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice BETWEEN 1000 AND 5000)
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND NOT (o_orderkey % 7 = 0)
      AND o_orderpriority LIKE '%-%'
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT, IN, BETWEEN, LIKE."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | F.col("o_totalprice").between(1000, 5000))
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ~(F.col("o_orderkey") % 7 == 0)
        & F.col("o_orderpriority").like("%-%")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "q_filter_null",
    oracle="""
    SELECT c_custkey, c_name, NULLIF(c_mktsegment, 'BUILDING') AS seg
    FROM customer
    WHERE NULLIF(c_mktsegment, 'BUILDING') IS NULL AND c_acctbal IS NOT NULL
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL + NULLIF-manufactured nulls (CDC treats NULL as
    "field unchanged" — SURVEY §1.2)."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.expr("NULLIF(c_mktsegment, 'BUILDING')")
    return c.filter(seg.isNull() & F.col("c_acctbal").isNotNull()).select(
        "c_custkey", "c_name", seg.alias("seg")
    )


@query(
    "q_case_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_adj,
           CAST(floor(o_totalprice) AS BIGINT) AS price_int
    FROM orders
    """,
)
def q_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF / casts (floor-then-cast: DuckDB rounds
    on double->int casts, Spark truncates — floor first on both sides)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.expr("NULLIF(o_orderstatus, 'O')"), F.lit("OPEN")).alias("status_adj"),
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
    )


@query(
    "q_point_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 42 LIMIT 1
    """,
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key point lookup + LIMIT 1 (reference: SOQL single-row lookup,
    toolingApiHelper.js:21-49). Deterministic: c_custkey is unique."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select("c_custkey", "c_name", "c_acctbal")
        .limit(1)
    )


@query(
    "q_sort_multi",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    ORDER BY c_mktsegment ASC, c_acctbal DESC NULLS LAST, c_custkey ASC
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort asc/desc with NULLS LAST (range-partitioned global sort
    in Spark; hash compare is order-insensitive but the plan is exercised)."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
        .orderBy(
            F.col("c_mktsegment").asc(),
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_custkey").asc(),
        )
    )


@query(
    "q_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
)
def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition heaps,
    no full sort — the 100 TB-safe top-k). Total order via o_orderkey
    tie-break keeps the selected set deterministic."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )
