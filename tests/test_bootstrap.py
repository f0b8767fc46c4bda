"""Snapshot + CDC reconciliation tests (D5 boot sequence, D6 staleness):
bulk snapshot -> stamp with pre-snapshot replay id -> stream resumes after the
stamp -> retention-window replay does not double-apply; stale entities are
flagged for full resync."""

from __future__ import annotations

import pytest
import datetime as dt

from pyspark.sql import functions as F

from cdc_worker_spark.streaming import (
    LatestWinsState,
    bootstrap_from_snapshot,
    run_cdc_pipeline,
    stale_topics,
)
from cdc_worker_spark.streaming.envelope import account_payload_schema

from tests.test_cdc_event_model import make_envelope
from tests.test_streaming import write_batch_file

T0 = 1696444513000


def _snapshot_df(spark):
    """Source-system snapshot reflecting state as of replay id 3: A with the
    pre-update city, B untouched by later events."""
    event_schema = account_payload_schema()
    rows = [
        ("Account", "A", {"BillingAddress": {"City": "SnapCityA", "State": "CA"}}),
        ("Account", "B", {"BillingAddress": {"City": "SnapCityB", "State": "NY"}}),
    ]
    return spark.createDataFrame(
        [(e, r, dt.datetime(2023, 10, 4, 18, 0, 0), p) for e, r, p in rows],
        f"entity string, record_id string, commit_ts timestamp, event {event_schema.simpleString()}",
    ).withColumn("event", F.col("event").dropFields("_corrupt"))


@pytest.mark.slow
def test_snapshot_bootstrap_then_stream_resume(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("input", "state", "dlq", "chk")}
    # the bus holds the FULL retention window: replays 1-3 predate the
    # snapshot (already reflected in it) and must not re-apply
    write_batch_file(dirs["input"], "b1.jsonl", [
        make_envelope(1, record_id="A", change_type="CREATE", commit_ts=T0, city="Ancient"),
        make_envelope(2, record_id="A", change_type="UPDATE", commit_ts=T0 + 1, city="Old"),
        make_envelope(3, record_id="B", change_type="CREATE", commit_ts=T0 + 2, city="OldB"),
    ])
    write_batch_file(dirs["input"], "b2.jsonl", [
        make_envelope(4, record_id="A", change_type="UPDATE", commit_ts=T0 + 10,
                      city="PostSnapCity"),
        make_envelope(5, record_id="C", change_type="CREATE", commit_ts=T0 + 11, city="NewC"),
    ])

    state = bootstrap_from_snapshot(_snapshot_df(spark), dirs["state"], snapshot_replay_id=3)
    boot = {r.record_id: r for r in state.read(spark).collect()}
    assert set(boot) == {"A", "B"}
    assert boot["A"].event.BillingAddress.City == "SnapCityA"

    q = run_cdc_pipeline(
        spark, dirs["input"], dirs["state"], dirs["dlq"], dirs["chk"],
        start_after_replay_id=3,
    )
    q.awaitTermination(120)

    final = {r.record_id: r for r in state.read(spark).collect()}
    assert set(final) == {"A", "B", "C"}
    # A: post-snapshot update applied on top of the snapshot
    assert final["A"].event.BillingAddress.City == "PostSnapCity"
    assert int(final["A"].replay_id) == 4
    # B: pre-snapshot event 3 did NOT re-apply over the snapshot row
    assert final["B"].event.BillingAddress.City == "SnapCityB"
    assert int(final["B"].replay_id) == 3  # the snapshot stamp
    # C: new record streamed in
    assert final["C"].event.BillingAddress.City == "NewC"


def test_stale_topics_flags_resync(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("input", "state", "dlq", "chk")}
    fresh_ts = T0 + 100
    stale_ts = T0 - 71 * 3600 * 1000  # 71 h before T0: beyond the 70 h threshold
    write_batch_file(dirs["input"], "b1.jsonl", [
        make_envelope(1, record_id="A", commit_ts=fresh_ts),
    ])
    q = run_cdc_pipeline(spark, dirs["input"], dirs["state"], dirs["dlq"], dirs["chk"])
    q.awaitTermination(120)
    state_df = LatestWinsState(dirs["state"]).read(spark)

    now = dt.datetime.fromtimestamp(T0 / 1000 + 3600, dt.timezone.utc).replace(tzinfo=None)
    fresh = {r.entity: r for r in stale_topics(state_df, now).collect()}
    assert fresh["Account"].needs_full_resync is False

    # age the state: pretend the last commit was 71 h ago
    aged = state_df.withColumn(
        "commit_ts", F.timestamp_millis(F.lit(stale_ts))
    )
    flagged = {r.entity: r for r in stale_topics(aged, now).collect()}
    assert flagged["Account"].needs_full_resync is True
