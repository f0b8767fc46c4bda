"""HTTP-forward sink tests (C5/C12/D9/D10): executor-side delivery with
bounded exponential-backoff retries; flaky endpoints succeed on retry;
permanent failures land in the cdcFailures table; the stream continues.

The poster fake records attempts in a shared temp directory (executor Python
workers are separate processes — file-based state is the honest cross-process
channel in local mode)."""

from __future__ import annotations

import json
import os

from cdc_worker_spark.streaming import decode_envelope
from cdc_worker_spark.streaming.pipeline import read_event_stream
from cdc_worker_spark.streaming.sinks import run_forwarding_sink

from tests.test_cdc_event_model import make_envelope
from tests.test_streaming import write_batch_file


def make_poster(log_dir: str, flaky_rid: int | None = None, dead_rid: int | None = None):
    """Poster recording each attempt as a file; fails the first 2 attempts for
    flaky_rid, fails always for dead_rid."""

    def poster(entity: str, payload_json: str) -> None:
        rid = int(json.loads(payload_json)["replay_id"])
        n_prev = sum(1 for f in os.listdir(log_dir) if f.startswith(f"try-{rid}-"))
        with open(os.path.join(log_dir, f"try-{rid}-{n_prev}"), "w") as f:
            f.write(entity)
        if rid == dead_rid:
            raise ConnectionError("endpoint permanently down")
        if rid == flaky_rid and n_prev < 2:
            raise TimeoutError("transient timeout")
        with open(os.path.join(log_dir, f"ok-{rid}"), "w") as f:
            f.write(entity)

    return poster


def test_retry_and_dead_letter(spark, tmp_path):
    in_dir, log_dir = str(tmp_path / "in"), str(tmp_path / "log")
    os.makedirs(log_dir)
    t0 = 1696444513000
    write_batch_file(in_dir, "b1.jsonl", [
        make_envelope(500, record_id="A", commit_ts=t0),
        make_envelope(501, record_id="B", commit_ts=t0 + 1),  # flaky: ok on 3rd try
        make_envelope(502, record_id="C", commit_ts=t0 + 2),  # dead: exhausts retries
    ])
    stream = decode_envelope(read_event_stream(spark, in_dir, max_files_per_trigger=None))
    q = run_forwarding_sink(
        stream,
        make_poster(log_dir, flaky_rid=501, dead_rid=502),
        failures_dir=str(tmp_path / "failures"),
        checkpoint_dir=str(tmp_path / "chk"),
        base_delay_s=0.01,
    )
    q.awaitTermination(120)
    assert not q.isActive

    delivered = {f for f in os.listdir(log_dir) if f.startswith("ok-")}
    assert delivered == {"ok-500", "ok-501"}  # flaky recovered, dead did not
    # retry counts: flaky took 3 attempts, dead exhausted all 4 (design doc:628)
    assert sum(1 for f in os.listdir(log_dir) if f.startswith("try-501-")) == 3
    assert sum(1 for f in os.listdir(log_dir) if f.startswith("try-502-")) == 4

    failures = spark.read.parquet(str(tmp_path / "failures")).collect()
    assert len(failures) == 1
    row = failures[0]
    assert int(row.replay_id) == 502 and row.attempts == 4
    assert "ConnectionError" in row.error
