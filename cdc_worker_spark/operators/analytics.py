"""Event-analytics operators over the CDC stream: session rollups, funnel
conversion, and cohort retention — the standard product-analytics queries a
consumer of the reference's change feed (design doc
Node-based_Salesforce_PubSub_Setup.md:211-259 downstream-consumption
sections) runs on the materialized event log.

Scale design (100 TB):
- Session stats build ON TOP of the sessionize window (one entity-key
  exchange) and aggregate per (entity, session) — the agg reuses the
  window's hash partitioning on user_id, so the whole rollup is one
  shuffle of the event log plus map-side-combined partials.
- The funnel is two hash aggregations and one broadcast-able join of
  per-entity FIRST-STEP timestamps against the candidate second-step
  events; per-entity state is O(steps), never the event list.
- Retention joins each entity's cohort day (one row per entity) back to its
  events; the cohort side is entity-cardinality, shuffles once on the
  entity key, and the final matrix is (cohorts x offsets) — tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_events_ms

_DAY_MS = 86_400_000
_GAP_MS = 1_800_000  # 30-min session gap, same as q_cdc_sessionize


def sessionized(ev: DataFrame) -> DataFrame:
    """events + session_seq (the q_cdc_sessionize assignment, shared)."""
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w)
    new_session = F.when(gap.isNull() | (gap > _GAP_MS), 1).otherwise(0)
    return ev.withColumn(
        "session_seq", F.sum(new_session).over(run).cast("bigint")
    )


@query(
    "q_cdc_session_stats",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id
                                         ORDER BY epoch_ms(ts), event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_seq
      FROM (
        SELECT *,
               CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                         OVER (PARTITION BY user_id
                               ORDER BY epoch_ms(ts), event_id) > {_GAP_MS}
                    OR lag(epoch_ms(ts))
                         OVER (PARTITION BY user_id
                               ORDER BY epoch_ms(ts), event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events) t)
    SELECT user_id, session_seq, count(*) AS n_events,
           min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
           max(ts_ms) - min(ts_ms) AS duration_ms,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, session_seq
    """,
)
def q_cdc_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup (count, span, duration, exact decimal total) on
    top of the sessionize assignment. The aggregation keys on
    (user_id, session_seq) with the input already hash-partitioned by
    user_id from the sessionize window — the agg adds no new shuffle of the
    event log."""
    ev = sessionized(load_events_ms(spark, sf_dir))
    return ev.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts_ms").alias("start_ms"),
        F.max("ts_ms").alias("end_ms"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


@query(
    "q_events_funnel",
    oracle="""
    WITH step1 AS (
      SELECT user_id, min(epoch_ms(ts)) AS t1
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    step2 AS (
      SELECT e.user_id, min(epoch_ms(e.ts)) AS t2
      FROM events e JOIN step1 s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= s.t1
      GROUP BY e.user_id)
    SELECT count(*) AS n_entered,
           count(t2) AS n_converted,
           CAST(sum(CASE WHEN t2 IS NOT NULL THEN t2 - t1 END) AS BIGINT)
             AS total_delay_ms
    FROM step1 LEFT JOIN step2 USING (user_id)
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered two-step funnel: entities whose first 'signup' is later
    followed by a 'purchase' (strictly ordered conversion — a purchase
    BEFORE the first signup does not count). Per-entity state is two
    timestamps: the entered set aggregates once, then ONE left join (equi
    key + ordering predicate in the join condition) attaches candidate
    conversions, and the per-entity re-aggregation reuses the join's
    entity-key partitioning. The type filters push to the scan, so each
    side reads only its step's events; the final count row is a
    driver-sized reduction."""
    ev = load_events_ms(spark, sf_dir)
    step1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t1"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_ms").alias("p_ts")
    )
    # ONE left join from the entered set to candidate conversions (equi key +
    # the ordering predicate inside the join condition), so step1 is consumed
    # once — no double-scan of the first-step aggregation at 100 TB
    per_user = (
        step1.join(
            purchases,
            (step1.user_id == purchases.user_id) & (purchases.p_ts >= step1.t1),
            "left",
        )
        .groupBy(step1.user_id)
        .agg(F.min("t1").alias("t1"), F.min("p_ts").alias("t2"))
    )
    return per_user.agg(
        F.count("*").alias("n_entered"),
        F.count("t2").alias("n_converted"),
        F.sum(
            F.when(F.col("t2").isNotNull(), F.col("t2") - F.col("t1"))
        ).cast("bigint").alias("total_delay_ms"),
    )


@query(
    "q_events_retention",
    oracle=f"""
    WITH cohort AS (
      SELECT user_id,
             min(epoch_ms(ts)) - min(epoch_ms(ts)) % {_DAY_MS * 7}
               AS cohort_wk
      FROM events GROUP BY user_id)
    SELECT c.cohort_wk,
           (epoch_ms(e.ts) - epoch_ms(e.ts) % {_DAY_MS * 7}) - c.cohort_wk
             AS wk_offset_ms,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN cohort c USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: entities grouped by first-seen week, counted
    distinct per (cohort week, weeks-since-cohort). The cohort table is one
    row per entity (entity-key shuffle it shares with every CDC query);
    events join it on the same key and reduce to the (cohorts x offsets)
    matrix — the distinct-count shuffles (entity, cohort, offset) tuples,
    already near-unique, and the output is dashboard-sized."""
    ev = load_events_ms(spark, sf_dir)
    wk = F.lit(_DAY_MS * 7)
    cohort = ev.groupBy("user_id").agg(
        (F.min("ts_ms") - F.min("ts_ms") % wk).alias("cohort_wk")
    )
    return (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_wk",
            (
                (F.col("ts_ms") - F.col("ts_ms") % wk) - F.col("cohort_wk")
            ).alias("wk_offset_ms"),
        )
        .groupBy("cohort_wk", "wk_offset_ms")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
