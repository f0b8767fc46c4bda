"""Reshape operators: pivot (long->wide) and unpivot (wide->long).

Standard analytics-engine surface (PIVOT/UNPIVOT in every warehouse SQL
dialect; `DataFrame.pivot` / `unpivot` in Spark). The CDC relevance: a
latest-state table per entity type is the wide form of the long change
stream, and metric matrices ship wide while the engine computes long.

Scale notes:
- pivot with an EXPLICIT value list compiles to one partial+final hash agg
  (same plan as any groupBy) — the map-side partials already produce one row
  per group, so the wide row never shuffles more than the long aggregation
  would. An implicit pivot (no value list) adds a distinct-scan job to
  discover categories; the explicit list is the 100 TB form.
- unpivot (Spark `melt`) is a pure projection (Expand node): N output rows
  per input row, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_events_ms, load_table

#: the event-type dictionary (fixture form): explicit pivot columns — the
#: scale path needs the category list known at plan time
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q_pivot_events",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 6)
             AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide: per-user event-type count matrix + purchase value, as ONE
    conditional aggregation — one scan, one partial+final hash agg, one
    exchange (plan-asserted). This is the engine's pivot lowering for an
    explicit category list: `DataFrame.pivot(col, values)` would compile to
    a pivotfirst over a pre-agg (an EXTRA exchange) and an implicit pivot
    adds a category-discovery job on top, so the conditional-sum form is
    the 100 TB shape. Output columns are fixed by the dictionary: schema is
    plan-stable under data drift (an unseen category lands in no column)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            ),
            6,
        ).alias("purchase_value"),
    )


@query(
    "q_unpivot_orders",
    oracle="""
    SELECT o_orderkey, metric, round(val, 6) AS val_r
    FROM (
      SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
    ) t
    WHERE val IS NOT NULL
    """,
)
def q_unpivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long: order measures melted to (key, metric, value) rows via
    Spark's native ``unpivot`` — a pure Expand projection (no shuffle, no
    Python; the plan-shape test asserts exchange-free). The long form is
    what generic metric sinks and sparse-matrix pipelines ingest."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return (
        o.unpivot("o_orderkey", ["totalprice", "custkey"], "metric", "val")
        .filter(F.col("val").isNotNull())
        .select("o_orderkey", "metric", F.round("val", 6).alias("val_r"))
    )


@query(
    "q_pivot_daily_matrix",
    oracle="""
    SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day_no,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_purchase,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_error,
           round(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
                 / greatest(count(*), 1), 6) AS purchase_share
    FROM events GROUP BY 1
    """,
)
def q_pivot_daily_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed wide matrix: per-day purchase/error counts + purchase
    share — the daily-metrics rollup shape (conditional aggregation form of
    pivot; one hash agg on the derived day key)."""
    ev = load_events_ms(spark, sf_dir)
    day = F.expr("CAST(ts_ms DIV 86400000 AS BIGINT)")  # exact integer division
    n_purchase = F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
    n_error = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return (
        ev.groupBy(day.alias("day_no"))
        .agg(
            n_purchase.cast("bigint").alias("n_purchase"),
            n_error.cast("bigint").alias("n_error"),
            F.round(
                n_purchase.cast("double")
                / F.greatest(F.count(F.lit(1)), F.lit(1)),
                6,
            ).alias("purchase_share"),
        )
    )
