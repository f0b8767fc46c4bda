"""Set operations (SURVEY §2.3): UNION ALL / UNION / INTERSECT / EXCEPT.

Provenance: snapshot ∪ changes reconciliation (design doc D5) + relational
completeness. UNION ALL is shuffle-free (plan concatenation); the DISTINCT
variants shuffle on the full row — at 100 TB prefer keyed dedup
(dropDuplicates on the key) over row-level DISTINCT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_table


def _cust_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping key sets: high-balance customers vs urgent-order
    customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    left = c.filter(F.col("c_acctbal") > 3000).select(F.col("c_custkey").alias("custkey"))
    right = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return left, right


_LEFT_SQL = "SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 3000"
_RIGHT_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'"


@query("q_union_all", oracle=f"{_LEFT_SQL} UNION ALL {_RIGHT_SQL}")
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no shuffle)."""
    left, right = _cust_sides(spark, sf_dir)
    return left.unionByName(right)


@query("q_union_distinct", oracle=f"{_LEFT_SQL} UNION {_RIGHT_SQL}")
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set union = union all + distinct)."""
    left, right = _cust_sides(spark, sf_dir)
    return left.unionByName(right).distinct()


@query("q_intersect", oracle=f"{_LEFT_SQL} INTERSECT {_RIGHT_SQL}")
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    left, right = _cust_sides(spark, sf_dir)
    return left.intersect(right)


@query("q_except", oracle=f"{_LEFT_SQL} EXCEPT {_RIGHT_SQL}")
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics; Spark's subtract)."""
    left, right = _cust_sides(spark, sf_dir)
    return left.subtract(right)


_PRICY_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000"


@query("q_intersect_all", oracle=f"{_RIGHT_SQL} INTERSECT ALL {_PRICY_SQL}")
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: each row kept min(count_l, count_r)
    times — Spark plans a count-based aggregation, one shuffle on the full
    row). BOTH sides are multisets (urgent orders x pricy orders, repeated
    custkeys), so min-count duplicates genuinely survive, unlike the
    DISTINCT variant."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    pricy = o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersectAll(pricy)


@query("q_except_all", oracle=f"{_RIGHT_SQL} EXCEPT ALL {_LEFT_SQL}")
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics: count_l - count_r occurrences survive —
    driven from the multiset side so the arithmetic is visible)."""
    left, right = _cust_sides(spark, sf_dir)
    return right.exceptAll(left)
