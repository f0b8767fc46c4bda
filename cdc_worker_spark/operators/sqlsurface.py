"""SQL-surface depth operators: listagg, correlated subqueries, ignore-nulls
window navigation, median/mode — the long tail of warehouse SQL a user
switching engines reaches for first.

Cross-engine determinism notes (these are the queries where engines love to
diverge):
- listagg/string_agg: concatenation order is engine-arbitrary — sort the
  collected array by value before joining, and the result is total-ordered
  text on both sides.
- first/last IGNORE NULLS: Spark `first(col, ignorenulls=True)` over an
  ordered window == DuckDB's `first_value(col IGNORE NULLS) OVER (...)`
  given identical frames and total order.
- median: Spark `median` == DuckDB `median` for even counts only under the
  same interpolation; both interpolate the middle pair for DOUBLE inputs.
- mode: ties broken by taking the smallest value (explicit min over the
  max-count set) — neither engine's bare mode() is deterministic under ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_events_ms, load_table


@query(
    "q_listagg_per_group",
    oracle="""
    SELECT n_name,
           string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
           CAST(count(*) AS BIGINT) AS n_sup
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_listagg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg/string_agg with deterministic order: collect, sort, join —
    the order-insensitive formulation both engines agree on. One hash agg;
    the sort is per-group over collected arrays (bounded by group size, not
    a global sort)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers"),
            F.count(F.lit(1)).alias("n_sup"),
        )
    )


@query(
    "q_exists_correlated",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — expressed via Spark SQL so Catalyst
    performs the standard decorrelation to a left-semi + left-anti join
    (same plan the DataFrame formulation would build, but proving the SQL
    front door handles correlation)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_v c
        WHERE EXISTS (SELECT 1 FROM orders_v o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders_v o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        """
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 6) AS vs_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (global average referenced twice): Catalyst computes
    the subquery once and broadcasts the scalar — no per-row re-evaluation.
    SQL front door again, since scalar subqueries are the textbook form."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               round(o_totalprice - (SELECT avg(o_totalprice) FROM orders_sq_v), 6)
                 AS vs_avg
        FROM orders_sq_v
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_sq_v)
        """
    )


@query(
    "q_win_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    """,
)
def q_win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_value IGNORE NULLS over an ordered frame — the carry-forward /
    fill-down pattern (CDC: latest non-null observation per key as of each
    event). Same single exchange as any window on the entity key."""
    ev = load_events_ms(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.last(pv, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@query(
    "q_agg_median_mode",
    oracle="""
    SELECT med.event_type,
           med.med_value,
           CAST(min(t.m) AS BIGINT) AS mode_user
    FROM (SELECT event_type, round(median(value), 6) AS med_value
          FROM events GROUP BY event_type) med
    JOIN (
      SELECT event_type AS et, user_id AS m
      FROM (SELECT event_type, user_id, count(*) AS c,
                   max(count(*)) OVER (PARTITION BY event_type) AS mx
            FROM events GROUP BY 1, 2)
      WHERE c = mx
    ) t ON t.et = med.event_type
    GROUP BY med.event_type, med.med_value
    """,
)
def q_agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median (exact interpolated) and deterministic mode (most frequent
    user per event type, ties -> smallest id — bare mode() is
    nondeterministic under ties in BOTH engines, so the tie-break is
    explicit). The mode side is counts-only (two aggs + a window over tiny
    (type, user) counts); the join keys are the 5 event types.

    r11: the DUAL aggregates the median PRE-join too. Its original
    median-AFTER-join form (median over the mode-join row product —
    equal because tied modes duplicate rows uniformly) livelocked the
    sf100 sweep in the object-agg sort-based fallback (~600s/task of
    per-row percentile-state churn, jstack-diagnosed r10); aggregating
    before the join is the builder's own scale shape and keeps DuckDB
    semantics bit-identical."""
    ev = load_events_ms(spark, sf_dir)
    med = ev.groupBy("event_type").agg(F.round(F.median("value"), 6).alias("med_value"))
    counts = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("c"))
    mx = Window.partitionBy("event_type")
    mode = (
        counts.withColumn("mx", F.max("c").over(mx))
        .filter(F.col("c") == F.col("mx"))
        .groupBy("event_type")
        .agg(F.min("user_id").alias("mode_user"))
    )
    return med.join(mode, "event_type")


@query(
    "q_recursive_tree",
    oracle="""
    WITH RECURSIVE tree(c_custkey, depth) AS (
      SELECT c_custkey, 0 FROM customer WHERE c_custkey = 1
      UNION ALL
      SELECT c.c_custkey, t.depth + 1
      FROM customer c JOIN tree t ON c.c_custkey // 2 = t.c_custkey
      WHERE c.c_custkey > 1
    )
    SELECT depth,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(c_custkey) AS BIGINT) AS min_key,
           CAST(max(c_custkey) AS BIGINT) AS max_key
    FROM tree GROUP BY depth
    """,
)
def q_recursive_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): BFS over the implicit
    binary tree parent(k)=k/2 rooted at custkey 1 — per-depth node counts
    and key ranges. Both engines genuinely iterate (depth ~log2 of the key
    space); each recursion step is a broadcast-able equi-join against the
    previous frontier, the same loop shape as connected components
    (operators/dedup.py) but driven by the engine's own fixpoint operator
    instead of a hand-rolled driver loop.

    r12 (guide §3.1): each recursion step joins the full customer table
    against the previous frontier; the BROADCAST(t) hint pins the build
    side to the FRONTIER — one tree level, bounded — so the customer side
    is never shuffled per step. At 100 TB that is the only viable side
    (the table outgrows any broadcast; the per-level frontier does not).
    Measured at sf0.1: 3.76 s -> 3.49 s mean of 5 interleaved, rows
    identical."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_rc_v")
    return spark.sql(
        """
        WITH RECURSIVE tree(c_custkey, depth) AS (
          SELECT c_custkey, 0 AS depth FROM customer_rc_v WHERE c_custkey = 1
          UNION ALL
          SELECT /*+ BROADCAST(t) */ c.c_custkey, t.depth + 1
          FROM customer_rc_v c JOIN tree t ON c.c_custkey DIV 2 = t.c_custkey
          WHERE c.c_custkey > 1
        )
        SELECT depth,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(min(c_custkey) AS BIGINT) AS min_key,
               CAST(max(c_custkey) AS BIGINT) AS max_key
        FROM tree GROUP BY depth
        """
    )


@query(
    "q_dq_profile",
    oracle="""
    SELECT 'o_totalprice' AS col, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(o_totalprice) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           round(min(o_totalprice), 6) AS min_v, round(max(o_totalprice), 6) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           round(CAST(min(o_custkey) AS DOUBLE), 6), round(CAST(max(o_custkey) AS DOUBLE), 6)
    FROM orders
    UNION ALL
    SELECT 'o_orderkey', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_orderkey) AS BIGINT),
           CAST(count(DISTINCT o_orderkey) AS BIGINT),
           round(CAST(min(o_orderkey) AS DOUBLE), 6), round(CAST(max(o_orderkey) AS DOUBLE), 6)
    FROM orders
    """,
)
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile (the deequ/dbt-test shape): per-column row/null/
    distinct counts and value ranges in ONE scan — all metrics are
    map-side-combinable aggregates computed together, then melted to the
    (col, metric...) long form. The per-column-UNION oracle rescans; the
    engine does not."""
    o = load_table(spark, sf_dir, "orders")

    def metrics(col: str):
        v = F.col(col)
        return [
            F.count(F.lit(1)).cast("bigint").alias(f"{col}__n_rows"),
            (F.count(F.lit(1)) - F.count(v)).cast("bigint").alias(f"{col}__n_null"),
            F.countDistinct(v).cast("bigint").alias(f"{col}__n_distinct"),
            F.round(F.min(v).cast("double"), 6).alias(f"{col}__min_v"),
            F.round(F.max(v).cast("double"), 6).alias(f"{col}__max_v"),
        ]

    cols = ["o_totalprice", "o_custkey", "o_orderkey"]
    wide = o.agg(*[m for c in cols for m in metrics(c)])
    # melt the single wide row to one row per column (pure projection)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__n_rows").alias("n_rows"),
                F.col(f"{c}__n_null").alias("n_null"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                F.col(f"{c}__min_v").alias("min_v"),
                F.col(f"{c}__max_v").alias("max_v"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(structs).alias("m")).select("m.*")
