"""Subscribe-bridge semantics: flow control, keepalive offset advance,
atomic file handoff, and the full CDC pipeline over a bridged inbox."""

from __future__ import annotations

import base64
import os

import pytest

from cdc_worker_spark.functions.offsets import encode_replay_id
from cdc_worker_spark.sources.grpc_bridge import (
    GrpcSubscribeTransport,
    run_subscribe_bridge,
)
from tests.test_cdc_event_model import make_envelope


class FakeTransport:
    """Scripted FetchResponse batches + recorded flow-control requests."""

    def __init__(self, batches):
        self.batches = batches
        self.more = []

    def fetch(self, topic, replay_preset, replay_id_b64, num_requested):
        yield from self.batches

    def request_more(self, n):
        self.more.append(n)


def _ev(rid: int, **kw) -> dict:
    return make_envelope(rid, **kw)


def _b64(rid: int) -> str:
    return base64.b64encode(encode_replay_id(rid)).decode()


def test_flow_control_rerequests_on_drain(tmp_path):
    """numRequested=3: after 3 events the semaphore drains and the bridge
    must issue a new FetchRequest (reference client.js:977-995)."""
    t = FakeTransport([
        {"events": [_ev(1), _ev(2)]},
        {"events": [_ev(3)]},      # drains to 0 here -> re-request
        {"events": [_ev(4)]},
    ])
    status = run_subscribe_bridge(
        t, "/data/AccountChangeEvent", str(tmp_path / "inbox"), num_requested=3
    )
    assert status.received == 4
    assert t.more == [3]
    assert status.fetch_requests == [3, 3]
    # one atomically-renamed file per non-empty response, no .tmp left
    files = os.listdir(tmp_path / "inbox")
    assert len(files) == 3 and not [f for f in files if f.endswith(".tmp")]


def test_keepalive_advances_offset_without_events(tmp_path):
    t = FakeTransport([
        {"events": [_ev(10)]},
        {"events": [], "latest_replay_id_b64": _b64(55)},  # keepalive
    ])
    status = run_subscribe_bridge(
        t, "topic", str(tmp_path / "inbox"), num_requested=100
    )
    assert status.keepalives == 1
    assert status.last_replay_id_b64 == _b64(55)
    assert status.received == 1


def test_grpc_transport_is_declared_stub():
    with pytest.raises(NotImplementedError, match="grpcio"):
        GrpcSubscribeTransport()


def test_bridged_inbox_feeds_full_cdc_pipeline(spark, tmp_path):
    """End-to-end: transport batches -> bridge inbox -> run_cdc_pipeline ->
    latest-wins state, exactly as if the events had arrived on the bus."""
    from cdc_worker_spark.streaming import LatestWinsState, run_cdc_pipeline

    t = FakeTransport([
        {"events": [_ev(100, record_id="A", city="Rome"),
                    _ev(101, record_id="B", city="Oslo")]},
        {"events": [_ev(102, record_id="A", city="Cairo")]},  # A updates
    ])
    inbox = str(tmp_path / "inbox")
    status = run_subscribe_bridge(t, "topic", inbox, num_requested=10)
    assert status.received == 3

    q = run_cdc_pipeline(
        spark,
        input_dir=inbox,
        state_dir=str(tmp_path / "state"),
        dlq_dir=str(tmp_path / "dlq"),
        checkpoint_dir=str(tmp_path / "chk"),
        max_files_per_trigger=None,
    )
    q.awaitTermination(120)
    rows = {
        r.record_id: r for r in LatestWinsState(str(tmp_path / "state")).read(spark).collect()
    }
    assert set(rows) == {"A", "B"}
    assert int(rows["A"].replay_id) == 102  # latest wins
    assert rows["A"].event.BillingAddress.City == "Cairo"


def test_commit_offset_roundtrip_and_resume(tmp_path):
    """commitReplayId parity: the committed offset survives, loads, and is
    what the next bridge run passes to the transport as its resume point."""
    from cdc_worker_spark.sources.grpc_bridge import (
        commit_offset,
        load_committed_offset,
    )

    off = str(tmp_path / "offset")
    assert load_committed_offset(off) is None

    class RecordingTransport(FakeTransport):
        def fetch(self, topic, replay_preset, replay_id_b64, num_requested):
            self.seen = (replay_preset, replay_id_b64)
            yield from self.batches

    t = RecordingTransport([{"events": [_ev(7)]}])
    status = run_subscribe_bridge(t, "topic", str(tmp_path / "in"), num_requested=5)
    commit_offset(off, status.last_replay_id_b64)

    assert load_committed_offset(off) == _b64(7)
    t2 = RecordingTransport([])
    run_subscribe_bridge(
        t2, "topic", str(tmp_path / "in2"),
        replay_preset="CUSTOM", replay_id_b64=load_committed_offset(off),
    )
    assert t2.seen == ("CUSTOM", _b64(7))
