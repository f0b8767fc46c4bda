"""``cdc_replay`` Python DataSource (sources/replay_datasource.py): the
replay presets as a first-class format with replay-id offsets.

Covers the reference's subscribe contract re-expressed as a Spark source:
EARLIEST/LATEST/CUSTOM start positions (client.js:205-258), per-trigger
flow control (client.js:49), and exactly-once resume from a checkpointed
replay id (client.js:265-338) — plus integration with decode_envelope so
the decoded stream is byte-identical to the built-in file-source path.
"""

from __future__ import annotations

import os

import pytest

from cdc_worker_spark.sources.replay_datasource import (
    ENVELOPE_DDL,
    CdcReplayDataSource,
    _file_id_range,
)
from cdc_worker_spark.sources.streams import publish_batch


@pytest.fixture()
def bus(tmp_path):
    d = str(tmp_path / "bus")
    publish_batch(d, [{"v": i} for i in range(5)], next_replay_id=0)
    publish_batch(d, [{"v": i} for i in range(5, 12)], next_replay_id=5)
    return d


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(CdcReplayDataSource)
    return spark


def _rids(df):
    from cdc_worker_spark.streaming.envelope import decode_envelope

    return sorted(int(r.replay_id) for r in decode_envelope(df).collect())


def test_ddl_matches_envelope_schema(spark):
    """The DataSource's DDL string and streams.ENVELOPE_SCHEMA must stay in
    lockstep — decode_envelope consumes both paths."""
    from pyspark.sql.types import _parse_datatype_string

    from cdc_worker_spark.streaming.envelope import ENVELOPE_SCHEMA

    assert _parse_datatype_string(ENVELOPE_DDL) == ENVELOPE_SCHEMA


def test_batch_read_whole_bus(registered, bus):
    df = registered.read.format("cdc_replay").load(bus)
    assert _rids(df) == list(range(12))


def test_batch_read_start_after(registered, bus):
    df = registered.read.format("cdc_replay").option("start_after", 6).load(bus)
    assert _rids(df) == list(range(7, 12))


def test_file_id_range_reads_endpoints_only(bus):
    """Planning metadata comes from each file's first and last line."""
    for f in sorted(os.listdir(bus)):
        lo, hi = _file_id_range(os.path.join(bus, f))
        assert 0 <= lo <= hi <= 11


def test_stream_earliest_replays_all(registered, bus, tmp_path):
    sdf = registered.readStream.format("cdc_replay").load(bus)
    q = (
        sdf.writeStream.format("memory")
        .queryName("pyds_earliest")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rids(registered.table("pyds_earliest")) == list(range(12))


def test_stream_custom_starts_after_id(registered, bus, tmp_path):
    sdf = (
        registered.readStream.format("cdc_replay")
        .option("preset", "custom")
        .option("start_after", 4)
        .load(bus)
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("pyds_custom")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rids(registered.table("pyds_custom")) == list(range(5, 12))


def test_stream_latest_skips_existing(registered, bus, tmp_path):
    """LATEST notes the bus high-water mark at subscribe time; only events
    published AFTER the stream starts are delivered."""
    sdf = (
        registered.readStream.format("cdc_replay")
        .option("preset", "latest")
        .load(bus)
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("pyds_latest")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # let the first (empty) trigger plan against the pre-existing bus
        q.processAllAvailable()
        assert registered.table("pyds_latest").count() == 0
        publish_batch(bus, [{"v": 12}, {"v": 13}], next_replay_id=12)
        q.processAllAvailable()
        assert _rids(registered.table("pyds_latest")) == [12, 13]
    finally:
        q.stop()


def test_flow_control_caps_ids_per_trigger(registered, bus, tmp_path):
    """max_ids_per_trigger bounds every STEADY-STATE micro-batch — the A5
    fetch-batch semantics on the engine's own offset ledger. The first
    trigger of a (re)started stream is an uncapped catch-up batch by design
    (latestOffset has no start position to cap from; a guessed base could
    rewind the offset log into silent duplicates — see the source module)."""
    sdf = (
        registered.readStream.format("cdc_replay")
        .option("max_ids_per_trigger", 4)
        .load(bus)
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("pyds_cap")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()  # catch-up batch drains the 12-id backlog
        publish_batch(bus, [{"v": i} for i in range(12, 22)], next_replay_id=12)
        q.processAllAvailable()  # steady state: 10 new ids, capped 4+4+2
        assert _rids(registered.table("pyds_cap")) == list(range(22))
        steady = [
            pr.numInputRows
            for pr in q.recentProgress
            if pr.numInputRows > 0
        ][1:]  # drop the catch-up batch
        assert steady and max(steady) <= 4, steady
    finally:
        q.stop()


def test_exactly_once_across_restart(registered, bus, tmp_path):
    """Stop mid-stream, publish more, restart on the same checkpoint: every
    id delivered exactly once (the reference's store-replay-id-and-resume
    loop, here carried by the checkpoint)."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        sdf = registered.readStream.format("cdc_replay").load(bus)
        q = (
            sdf.writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    publish_batch(bus, [{"v": i} for i in range(12, 20)], next_replay_id=12)
    run_once()

    from cdc_worker_spark.streaming.envelope import ENVELOPE_SCHEMA

    got = registered.read.schema(ENVELOPE_SCHEMA).json(out)
    assert _rids(got) == list(range(20))


def test_decoded_stream_matches_file_source_path(registered, bus, tmp_path):
    """decode_envelope over the cdc_replay stream == the built-in file-source
    subscribe_earliest path, row for row."""
    from cdc_worker_spark.streaming.envelope import ENVELOPE_SCHEMA, decode_envelope

    sdf = decode_envelope(
        registered.readStream.format("cdc_replay").load(bus)
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("pyds_decoded")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    via_ds = registered.table("pyds_decoded")
    via_file = decode_envelope(
        registered.read.schema(ENVELOPE_SCHEMA).json(bus)
    )
    assert via_ds.schema == via_file.schema
    a = sorted(map(tuple, via_ds.collect()))
    b = sorted(map(tuple, via_file.collect()))
    assert a == b
