"""CDC semantics in batch form (SURVEY §2.2 D1-D7) — the reference's core
computations over its change stream, expressed on the `events` fixture
(event_id -> replayId, user_id -> recordId, event_type -> topic/changeType,
ts -> commitTimestamp; FIXTURES.md §B mapping).

Reference citations:
- latest-wins upsert  : design doc Node-based_Salesforce_PubSub_Setup.md:670-676, 1137-1156 (D1)
- delete apply        : design doc :806-809 (D2)
- checkpoint tracking : design doc :272-279, 1057 (D3); counters client.js:747-778 (C3)
- dedup by replayId   : design doc :542, 685, 772 (D4)
- snapshot + CDC merge: design doc :211-259 (D5)
- gap / staleness     : design doc :306, 376, 1325-1348 (D6)
- ordered apply       : design doc :729-734; README.md:67 (D7)

Scale notes: every query shuffles once on the entity key (user_id) or the
topic key (event_type); latest-wins is the windowed row_number formulation —
partial per-partition top-1 via WindowGroupLimit keeps shuffle input small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_events_ms

def _latest_window() -> Window:
    """Latest event per entity: commit time desc, replayId desc tie-break."""
    return Window.partitionBy("user_id").orderBy(
        F.col("ts_ms").desc(), F.col("event_id").desc()
    )


_LATEST_SQL = """
      SELECT user_id, event_id AS last_event_id, epoch_ms(ts) AS last_ts_ms,
             event_type AS last_event_type, value AS last_value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      FROM events
"""


def latest_state(ev: DataFrame) -> DataFrame:
    """Latest-wins state reconstruction (D1): one row per entity = the fields
    of its most recent change event. THE core CDC computation."""
    return (
        ev.select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts_ms").alias("last_ts_ms"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.row_number().over(_latest_window()).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "q_cdc_latest_state",
    oracle=f"""
    SELECT user_id, last_event_id, last_ts_ms, last_event_type, last_value
    FROM ({_LATEST_SQL}) t WHERE rn = 1
    """,
)
def q_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: latest-wins state per entity (D1)."""
    return latest_state(load_events_ms(spark, sf_dir))


@query(
    "q_cdc_upsert_apply",
    oracle=f"""
    SELECT user_id, last_event_id, last_ts_ms, last_event_type, last_value
    FROM ({_LATEST_SQL}) t WHERE rn = 1 AND last_event_type <> 'error'
    """,
)
def q_cdc_upsert_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert + delete apply (D1+D2): latest-wins state, then entities whose
    final event is a delete ('error' plays changeType=DELETE) drop out."""
    return latest_state(load_events_ms(spark, sf_dir)).filter(
        F.col("last_event_type") != "error"
    )


@query(
    "q_cdc_checkpoint",
    oracle="""
    SELECT event_type, max(event_id) AS last_replay_id,
           max(epoch_ms(ts)) AS last_ts_ms, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q_cdc_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint tracking (D3): max replayId + counters per topic — the
    reference's SubscriptionInfo bookkeeping (client.js:747-778) as an agg."""
    ev = load_events_ms(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.max("event_id").alias("last_replay_id"),
        F.max("ts_ms").alias("last_ts_ms"),
        F.count("*").alias("n_events"),
    )


@query(
    "q_cdc_dedup",
    oracle="""
    SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value FROM events
    """,
)
def q_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent redelivery dedup (D4): at-least-once delivery simulated by
    doubling the stream, then dropDuplicates on the replayId key recovers
    exactly-once state. Deterministic because duplicate rows are identical."""
    ev = load_events_ms(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts_ms", "value"
    )
    redelivered = ev.unionByName(ev)  # simulate at-least-once
    return redelivered.dropDuplicates(["event_id"])


@query(
    "q_cdc_snapshot_merge",
    oracle=f"""
    WITH cutoff AS (SELECT max(event_id) // 2 AS c FROM events),
         snap  AS (SELECT e.* FROM events e, cutoff WHERE event_id <= c),
         delta AS (SELECT e.* FROM events e, cutoff WHERE event_id > c),
         merged AS (SELECT * FROM snap UNION ALL SELECT * FROM delta)
    SELECT user_id, last_event_id, last_ts_ms, last_event_type, last_value
    FROM (
      SELECT user_id, event_id AS last_event_id, epoch_ms(ts) AS last_ts_ms,
             event_type AS last_event_type, value AS last_value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      FROM merged) t
    WHERE rn = 1
    """,
)
def q_cdc_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot + CDC reconciliation (D5): bulk snapshot up to a captured
    replayId, replay events after it, latest-wins merge — consistent state
    equal to replaying everything."""
    ev = load_events_ms(spark, sf_dir)
    cutoff = ev.agg((F.max("event_id") / 2).cast("bigint").alias("c"))
    snap = ev.join(F.broadcast(cutoff), ev.event_id <= cutoff.c).drop("c")
    delta = ev.join(F.broadcast(cutoff), ev.event_id > cutoff.c).drop("c")
    return latest_state(snap.unionByName(delta))


@query(
    "q_cdc_gap_detect",
    oracle="""
    WITH per AS (SELECT event_type, max(epoch_ms(ts)) AS last_ts_ms
                 FROM events GROUP BY event_type),
         g AS (SELECT max(epoch_ms(ts)) AS global_max_ms FROM events)
    SELECT event_type, last_ts_ms, global_max_ms - last_ts_ms AS staleness_ms,
           global_max_ms - last_ts_ms > 3600000 AS is_stale
    FROM per, g
    """,
)
def q_cdc_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staleness detection (D6): per-topic last-offset age vs the stream head
    (reference: 70 h-of-72 h retention resync trigger, scaled to the fixture's
    time range)."""
    ev = load_events_ms(spark, sf_dir)
    per = ev.groupBy("event_type").agg(F.max("ts_ms").alias("last_ts_ms"))
    g = ev.agg(F.max("ts_ms").alias("global_max_ms"))
    return per.join(F.broadcast(g)).select(
        "event_type",
        "last_ts_ms",
        (F.col("global_max_ms") - F.col("last_ts_ms")).alias("staleness_ms"),
        ((F.col("global_max_ms") - F.col("last_ts_ms")) > 3600000).alias("is_stale"),
    )


@query(
    "q_cdc_txn_order",
    oracle="""
    SELECT event_id, user_id,
           CAST(row_number() OVER (PARTITION BY user_id
                              ORDER BY epoch_ms(ts), event_id) AS INT) AS seq
    FROM events
    """,
)
def q_cdc_txn_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered apply per entity (D7): deterministic apply sequence within each
    key — what the reference gets from its synchronous per-topic callback and
    Spark restores with a keyed window (repartition + sort within key)."""
    ev = load_events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    return ev.select("event_id", "user_id", F.row_number().over(w).alias("seq"))


@query(
    "q_cdc_sessionize",
    oracle="""
    SELECT event_id, user_id, ts_ms,
           CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
    FROM (
      SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                       OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
                       > 1800000
                  OR lag(epoch_ms(ts))
                       OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events) t
    """,
)
def q_cdc_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (batch analogue of session windows): 30-min gap starts a
    new session; session id = running sum of gap flags. Pure integer math."""
    ev = load_events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w)
    new_session = F.when(gap.isNull() | (gap > 1800000), 1).otherwise(0)
    return ev.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.sum(new_session).over(run).cast("bigint").alias("session_seq"),
    )


@query(
    "q_cdc_tumbling",
    oracle="""
    SELECT event_type, (epoch_ms(ts) // 3600000) * 3600000 AS hour_ms,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type, (epoch_ms(ts) // 3600000) * 3600000
    """,
)
def q_cdc_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate, batch analogue (1-hour buckets per topic) —
    the streaming twin is groupBy(window('ts','1 hour')) in streaming/."""
    ev = load_events_ms(spark, sf_dir)
    hour_ms = (F.col("ts_ms") - F.col("ts_ms") % 3600000).alias("hour_ms")
    return ev.groupBy("event_type", hour_ms).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


#: AS-OF cutoff: 2024-01-16 00:00 UTC — mid-range of the fixture's event
#: window at every scale factor
_ASOF_CUTOFF_MS = 1705363200000


@query(
    "q_cdc_state_asof",
    oracle=f"""
    SELECT user_id, last_event_id, last_ts_ms, last_event_type, last_value
    FROM (
      SELECT user_id, event_id AS last_event_id, epoch_ms(ts) AS last_ts_ms,
             event_type AS last_event_type, value AS last_value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      FROM events WHERE epoch_ms(ts) <= {_ASOF_CUTOFF_MS}) t
    WHERE rn = 1
    """,
)
def q_cdc_state_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal state reconstruction: the latest-wins state AS OF a past
    point in time — the batch twin of the state store's manifest time travel
    (audit: "what did this record look like on the 16th?"). The cutoff is a
    pushed-down scan predicate, so the log read is bounded by time before
    the same WindowGroupLimit-pruned latest-wins plan runs."""
    ev = load_events_ms(spark, sf_dir).filter(F.col("ts_ms") <= _ASOF_CUTOFF_MS)
    return latest_state(ev)
