"""``cdc_replay`` — a PySpark 4 Python DataSource for the event bus, so the
replay-preset semantics (SURVEY §2.1 A1-A4) are a first-class *format*:

    spark.dataSource.register(CdcReplayDataSource)
    spark.read.format("cdc_replay").load(bus_dir)                  # batch
    spark.readStream.format("cdc_replay")
         .option("preset", "custom").option("start_after", 41)
         .option("max_ids_per_trigger", 100).load(bus_dir)         # stream

The reference subscribes with three start presets — LATEST
(client.js:250-258), EARLIEST (client.js:205-218), CUSTOM replay id
(client.js:227-242) — and per-fetch flow control (client.js:49). The
file-bus stand-ins in :mod:`cdc_worker_spark.sources.streams` express those
as filters over Spark's built-in file source; this module expresses them as
a proper source with the bus's OWN offset model instead:

**The stream offset is the replay-id high-water mark** — not a file index.
Bus files are uuid-named (appends are not name-monotonic), so file position
is not a valid offset; the monotonically increasing replay id the bus
assigns at publish time (`publish_batch`) is. That is exactly the
reference's resume contract (store the last replay id, subscribe CUSTOM
after it), and it makes checkpoint recovery self-describing: a replayed
``(start, end]`` id range re-reads identical rows from immutable files.

Scale shape: ``latestOffset``/``partitions`` read only each file's FIRST and
LAST line (consecutive ids within a publish batch ⇒ a file's id range is its
endpoints), so driver planning is O(files), never O(events); each file whose
range intersects the trigger's id range becomes one ``InputPartition`` and
is parsed on an EXECUTOR. Flow control (A5) caps ``latestOffset`` at
``max_ids_per_trigger`` ids per micro-batch — backpressure via the offset
the engine already tracks, the same mechanism as Kafka's
``maxOffsetsPerTrigger`` (the production swap-in). The cap is exact in
steady state; the first trigger of a (re)started stream takes the whole
backlog uncapped, because the Python offset API gives ``latestOffset`` no
start position to cap from (see ``_start_rid``).

Contract required of the bus (and guaranteed by the reference's bus): replay
ids are assigned monotonically — a file that appears after an id has been
observed as the high-water mark never carries ids at or below it.
"""

from __future__ import annotations

import base64
import json
import os
import struct

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

#: wire envelope columns (streaming/envelope.ENVELOPE_SCHEMA as DDL — the
#: DataSource API wants a schema string; kept in sync by a registry test)
ENVELOPE_DDL = "replay_id_b64 string, schema_id string, payload string"


def _rid_of(line: str) -> int:
    """Replay id of one wire envelope line (8-byte big-endian, base64)."""
    return struct.unpack(">Q", base64.b64decode(json.loads(line)["replay_id_b64"]))[0]


def _bus_files(path: str) -> list[str]:
    """Data files currently on the bus (atomic-rename publish ⇒ no partials;
    hidden/_tmp names excluded the same way Spark's file source does)."""
    if not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if not f.startswith((".", "_")) and not f.endswith(".tmp")
    )


def _file_id_range(fpath: str) -> tuple[int, int] | None:
    """(first, last) replay id of a bus file from its endpoint lines only.

    publish_batch assigns consecutive ids within a file, so the endpoints
    bound every id in it; reading two lines keeps driver planning O(files).
    The last line is found by a tail seek, not a full read — a 1 GB bus
    file costs two small reads, not a gigabyte of driver parsing.
    """
    size = os.path.getsize(fpath)
    if size == 0:
        return None
    with open(fpath, "rb") as f:
        first = f.readline()
        if not first.strip():
            return None
        # tail: read a fixed window from the end and take its last line;
        # envelope lines are small (id + schema id + payload line), widen
        # geometrically if a giant payload line exceeds the window
        window = 1 << 16
        while True:
            f.seek(max(0, size - window))
            tail = f.read()
            lines = [ln for ln in tail.split(b"\n") if ln.strip()]
            # the window must contain one COMPLETE line: either it spans the
            # whole file, or it starts mid-stream and holds >= 2 newlines
            if max(0, size - window) == 0 or len(lines) >= 2:
                last = lines[-1]
                break
            window <<= 1
    return _rid_of(first.decode()), _rid_of(last.decode())


class _FilePartition(InputPartition):
    """One bus file clipped to the trigger's (start, end] id range."""

    def __init__(self, fpath: str, start_exclusive: int, end_inclusive: int):
        self.fpath = fpath
        self.start_exclusive = start_exclusive
        self.end_inclusive = end_inclusive


def _read_clipped(part: _FilePartition):
    """Executor-side parse of one file, filtered to the committed id range —
    deterministic over immutable files, so offset-range replay is
    exactly-once."""
    with open(part.fpath) as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            rid = struct.unpack(">Q", base64.b64decode(row["replay_id_b64"]))[0]
            if part.start_exclusive < rid <= part.end_inclusive:
                yield (row["replay_id_b64"], row["schema_id"], row["payload"])


class CdcReplayBatchReader(DataSourceReader):
    """Batch form: the whole retention window (optionally after an id)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_replay requires a bus directory: .load(path)")
        self.start_after = int(options.get("start_after", -1))

    def partitions(self):
        parts = []
        for fpath in _bus_files(self.path):
            rng = _file_id_range(fpath)
            if rng is None or rng[1] <= self.start_after:
                continue
            parts.append(_FilePartition(fpath, self.start_after, rng[1]))
        # an empty bus still needs one (empty) partition — Spark requires >=1
        return parts or [_FilePartition(os.devnull, 0, -1)]

    def read(self, partition):
        if partition.fpath == os.devnull:
            return iter(())
        return _read_clipped(partition)


class CdcReplayStreamReader(DataSourceStreamReader):
    """Streaming form: replay-id offsets, preset initial position, per-trigger
    id cap (A5 flow control)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_replay requires a bus directory: .load(path)")
        self.preset = options.get("preset", "earliest").lower()
        if self.preset not in ("earliest", "latest", "custom"):
            raise ValueError(f"unknown preset {self.preset!r}")
        if self.preset == "custom" and "start_after" not in options:
            raise ValueError("preset=custom requires option start_after")
        self.start_after = int(options.get("start_after", -1))
        self.max_ids = int(options.get("max_ids_per_trigger", 0)) or None

    # -- offset model: {"rid": <high-water mark>} ------------------------

    def _high_water_mark(self) -> int:
        hwm = -1
        for fpath in _bus_files(self.path):
            rng = _file_id_range(fpath)
            if rng is not None:
                hwm = max(hwm, rng[1])
        return hwm

    def initialOffset(self) -> dict:
        if self.preset == "earliest":
            rid = -1
        elif self.preset == "custom":
            rid = self.start_after
        else:  # latest: note the bus's current position now
            rid = self._high_water_mark()
        # also seeds the flow-control base — though the engine calls
        # latestOffset BEFORE initialOffset (traced empirically), so the
        # very first trigger is never capped; see _start_rid below
        self._start_rid = rid
        return {"rid": rid}

    def latestOffset(self) -> dict:
        # flow control clamps how far a single trigger may advance; the
        # engine calls again next trigger and catches up cap-by-cap
        hwm = self._high_water_mark()
        if (
            self.max_ids is not None
            and self._start_rid is not None
            and hwm > self._start_rid + self.max_ids
        ):
            hwm = self._start_rid + self.max_ids
        return {"rid": hwm}

    # Spark's latestOffset takes no start argument AND is called before
    # initialOffset (traced), so on the first trigger of any (re)start the
    # cap's base is unknown (None) and the cap is SKIPPED: one uncapped
    # catch-up batch, exact caps from the next trigger on. Guessing a base
    # instead (e.g. the preset initial) would be catastrophic on restart —
    # a capped end below the checkpointed start plans a backwards batch,
    # and the rewound offset log then replays already-committed ids as
    # silent duplicates. Correctness never depends on the cap; it bounds
    # steady-state micro-batches, the regime flow control exists for.
    _start_rid: int | None = None

    def partitions(self, start: dict, end: dict):
        self._start_rid = max(start["rid"], end["rid"])
        lo, hi = start["rid"], end["rid"]
        if hi <= lo:
            return [_FilePartition(os.devnull, 0, -1)]
        parts = []
        for fpath in _bus_files(self.path):
            rng = _file_id_range(fpath)
            if rng is None or rng[1] <= lo or rng[0] > hi:
                continue
            parts.append(_FilePartition(fpath, lo, hi))
        return parts or [_FilePartition(os.devnull, 0, -1)]

    def read(self, partition):
        if partition.fpath == os.devnull:
            return iter(())
        return _read_clipped(partition)

    def commit(self, end: dict) -> None:
        base = -1 if self._start_rid is None else self._start_rid
        self._start_rid = max(base, end["rid"])

    def stop(self) -> None:
        pass


class CdcReplayDataSource(DataSource):
    """Register with ``spark.dataSource.register(CdcReplayDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "cdc_replay"

    def schema(self) -> str:
        return ENVELOPE_DDL

    def reader(self, schema):
        return CdcReplayBatchReader(self.options)

    def streamReader(self, schema):
        return CdcReplayStreamReader(self.options)
