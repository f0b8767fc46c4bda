"""Streaming windowed aggregations + stateful operators (SURVEY §2.3
streaming-only table).

Reference mapping:
- tumbling/sliding/session aggs: the north-star streaming analogues of the
  batch queries q_cdc_tumbling / q_cdc_sessionize.
- running per-topic counters (count + max offset): the reference's
  SubscriptionInfo bookkeeping — ``receivedEventCount++`` per event and
  ``lastReplayId`` advance (client.js:747-748,778; keepalive client.js:846-857)
  — reimplemented as an explicitly-stateful per-key operator
  (``applyInPandasWithState``), the Spark-native form of C3.
- stream-static enrich: dimension join against a batch table (D5 snapshot
  enrichment); the static side is broadcast by Catalyst when small, so the
  stream never shuffles.

Scale notes (100 TB): all window aggs carry a watermark so state is bounded
and evicted; per-key state for the counters is O(distinct keys), and the
key space here is topics/entities (small). Counts and maxes are
map-side-combined before touching state.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "commit_ts",
    key_col: str = "entity",
) -> DataFrame:
    """Per-entity event counts in tumbling windows with late-data drop
    (watermark => bounded state, append-mode emission on window close)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.max("replay_id").alias("max_replay_id"))
        .select("win.start", "win.end", key_col, "n_events", "max_replay_id")
    )


def sliding_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "commit_ts",
    key_col: str = "entity",
) -> DataFrame:
    """Sliding-window counts: each event lands in window_len/slide windows."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len, slide).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select("win.start", "win.end", key_col, "n_events")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "commit_ts",
    key_col: str = "record_id",
) -> DataFrame:
    """Session windows: a session closes after ``gap`` of per-key silence
    (streaming twin of the batch q_cdc_sessionize lag+cumsum formulation)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select("win.start", "win.end", key_col, "n_events")
    )


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, on: list[str] | str, how: str = "left"
) -> DataFrame:
    """Enrich a stream against a static dimension table (D5). The static side
    re-resolves per micro-batch; small dims broadcast — no stream shuffle."""
    return stream.join(dim, on=on, how=how)


#: output schema of running_counters
COUNTERS_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("received_event_count", T.LongType()),
        T.StructField("last_replay_id", T.DecimalType(20, 0)),
    ]
)

_COUNTER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("max_rid", T.StringType()),  # uint64-safe as string
    ]
)


def _update_counters(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-key state update: fold this batch's (count, max replay id) into the
    running totals. Pure-Python ints (unbounded) keep uint64 offsets exact."""
    n, max_rid = state.get if state.exists else (0, None)
    cur = int(max_rid) if max_rid is not None else -1
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            cur = max(cur, max(int(r) for r in pdf["replay_id"]))
    state.update((n, str(cur) if cur >= 0 else None))
    yield pd.DataFrame(
        {
            "entity": [key[0]],
            "received_event_count": [n],
            "last_replay_id": [cur if cur >= 0 else None],
        }
    )


def running_counters(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Reference C3 as an arbitrary stateful op: per-entity
    ``receivedEventCount`` and ``lastReplayId``, updated every micro-batch and
    emitted in update mode (one row per touched key per batch).

    ``ttl_ms`` evicts state for keys idle longer than the TTL (processing
    time) — the reference drops idle subscription bookkeeping the same way,
    and at scale unbounded per-key state for dead topics is a leak. An
    evicted key restarts its counters from zero on its next event."""
    if ttl_ms is None:
        return events.groupBy("entity").applyInPandasWithState(
            _update_counters,
            outputStructType=COUNTERS_SCHEMA,
            stateStructType=_COUNTER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def update_with_ttl(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # idle past TTL: free the key's state, emit nothing
            return
        yield from _update_counters(key, pdfs, state)
        state.setTimeoutDuration(ttl_ms)

    return events.groupBy("entity").applyInPandasWithState(
        update_with_ttl,
        outputStructType=COUNTERS_SCHEMA,
        stateStructType=_COUNTER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "record_id",
    interval: str = "10 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "commit_ts",
) -> DataFrame:
    """Watermarked stream-stream join: rows of two live streams pair when
    they share ``key`` and their event times fall within ``interval`` of
    each other. Both sides carry a watermark AND the join carries the time
    bound, so Spark can size and EVICT the join state — without the
    interval condition, stream-stream join state grows forever (the classic
    unbounded-state trap). State per side is O(events within watermark +
    interval), the same bound as the windowed aggs."""
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(ts_col).alias("l_ts"),
        F.col("replay_id").alias("l_replay_id"),
        F.col("change_type").alias("l_change_type"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(ts_col).alias("r_ts"),
        F.col("replay_id").alias("r_replay_id"),
        F.col("change_type").alias("r_change_type"),
    ).withWatermark("r_ts", watermark)
    return l.join(
        r,
        F.expr(
            f"""
            l_key = r_key AND
            r_ts BETWEEN l_ts - INTERVAL {interval} AND l_ts + INTERVAL {interval}
            """
        ),
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API): timer-closed
# sessions. applyInPandasWithState (above) covers the legacy GroupState
# surface; this is the modern processor API — typed state handles + true
# EVENT-TIME timers — which is what a production session-close pipeline
# uses at scale (state lives in the state store, incl. RocksDB; timers fire
# when the watermark passes, not when a batch happens to arrive).
# ---------------------------------------------------------------------------

SESSION_SUMMARY_SCHEMA = (
    "record_id string, n_events bigint, first_ts_ms bigint, last_ts_ms bigint"
)


def _session_processor(gap_ms: int):
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class SessionCloser(StatefulProcessor):
        """Per-key open-session accumulator. Each input batch extends the
        session (count + time span) and re-arms an event-time timer at
        last_ts + gap; when the watermark passes that point the timer
        fires, the CLOSED session summary is emitted, and state clears —
        the next event starts a fresh session. State per key is three
        longs; timers are state-store-backed (no driver involvement)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.sess = handle.getValueState(
                "sess", "n BIGINT, t0 BIGINT, t1 BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            n, t0, t1 = 0, None, None
            if self.sess.exists():
                n, t0, t1 = self.sess.get()
            for pdf in rows:
                ts = pdf["ts_ms"]
                n += len(pdf)
                lo, hi = int(ts.min()), int(ts.max())
                t0 = lo if t0 is None else min(t0, lo)
                t1 = hi if t1 is None else max(t1, hi)
            self.sess.update((n, t0, t1))
            # re-arm: one live timer per key at the current session's close
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            self.handle.registerTimer(t1 + gap_ms)
            return iter(())  # nothing emits until the session closes

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ):
            if not self.sess.exists():
                return iter(())
            n, t0, t1 = self.sess.get()
            self.sess.clear()
            yield pd.DataFrame(
                {
                    "record_id": [key[0]],
                    "n_events": [n],
                    "first_ts_ms": [t0],
                    "last_ts_ms": [t1],
                }
            )

        def close(self) -> None:
            pass

    return SessionCloser()


def session_close_summaries(
    events: DataFrame, gap: str = "30 minutes", gap_ms: int = 30 * 60_000
) -> DataFrame:
    """Timer-closed session summaries via ``transformWithStateInPandas``:
    one row per CLOSED session (count + span), emitted exactly when the
    event-time watermark passes session_end + gap. Equivalent to the
    built-in ``session_window`` aggregation's closed windows — asserted in
    tests — but as an arbitrary-state processor, the template for session
    logic the built-in can't express (per-session payload digests,
    conditional emission, cross-session carry-over)."""
    with_ts = events.withColumn(
        "ts_ms", (F.col("commit_ts").cast("double") * 1000).cast("long")
    ).withWatermark("commit_ts", gap)
    return (
        with_ts.select("record_id", "commit_ts", "ts_ms")
        .groupBy("record_id")
        .transformWithStateInPandas(
            statefulProcessor=_session_processor(gap_ms),
            outputStructType=SESSION_SUMMARY_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
