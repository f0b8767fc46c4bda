"""Window-function surface (SURVEY §2.3): rank/dense_rank/row_number, top-k
per group, running frames, lag/lead, range frames.

Provenance: per-key ordering (reference README.md:67, design doc D7), gap
detection via offset deltas (D6), top-k read paths (D11).

Scale notes: a window shuffles once on its partition key; all windows over the
same key in one query reuse that exchange. Ordering keys always carry an
event_id tie-break so ranks are total (hash-match determinism + reproducible
results under retry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_events_ms

# deterministic per-type ordering: value desc, event_id asc tie-break
_BY_VALUE = "PARTITION BY event_type ORDER BY value DESC, event_id"


@query(
    "q_win_rank",
    oracle=f"""
    SELECT event_id, event_type, value,
           CAST(rank()       OVER ({_BY_VALUE}) AS INT) AS rnk,
           CAST(dense_rank() OVER ({_BY_VALUE}) AS INT) AS drnk,
           CAST(row_number() OVER ({_BY_VALUE}) AS INT) AS rn
    FROM events
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per group."""
    ev = load_events_ms(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


@query(
    "q_win_topk_pergroup",
    oracle=f"""
    SELECT event_id, event_type, value, rn FROM (
      SELECT event_id, event_type, value,
             CAST(row_number() OVER ({_BY_VALUE}) AS INT) AS rn
      FROM events) t
    WHERE rn <= 3
    """,
)
def q_win_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group. Spark pushes the rn<=3 filter into the window sort
    (WindowGroupLimit) — per-partition heaps, no full per-group sort."""
    ev = load_events_ms(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.select("event_id", "event_type", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_running",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS running_n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count/sum per entity (ROWS frame). Sum in exact DECIMAL —
    prefix sums stay bitwise-identical across engines."""
    ev = load_events_ms(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("running_n"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_value"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
           lag(event_id)  OVER w AS prev_event_id,
           lead(event_id) OVER w AS next_event_id,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_ms
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: event deltas per entity — the reference's gap-detection
    primitive (D6). Gap math on epoch-ms BIGINTs (integer, tz-free)."""
    ev = load_events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("gap_ms"),
    )


@query(
    "q_win_range_frame",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_last_hour,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                 RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering key: trailing 1-hour window per
    entity (the sliding-window batch analogue)."""
    ev = load_events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms").rangeBetween(-3600000, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("value_last_hour"),
    )


@query(
    "q_win_distribution",
    oracle=f"""
    SELECT event_id, event_type,
           CAST(ntile(4) OVER ({_BY_VALUE}) AS INT) AS quartile,
           round(percent_rank() OVER ({_BY_VALUE}), 6) AS pct_rank,
           round(cume_dist()    OVER ({_BY_VALUE}), 6) AS cdist
    FROM events
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist —
    ratios of integer rank counts, so both engines agree exactly after a
    common rounding. Same single exchange as every other window on the
    (event_type) key."""
    ev = load_events_ms(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )
