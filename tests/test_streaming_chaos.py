"""Streaming chaos: kill-and-resume the multiplexed multi-topic pipeline
MID-BATCH (VERDICT r06 next #5). The exactly-once story must survive a
hard stop at any point between the sink write and the checkpoint commit —
not just clean restarts. 10 randomized seeds choose kill points across
(batch, position) where position is pre-decode, between the two sink
writes (the torn-write window), or after both writes but before the
checkpoint commit (the classic replay-duplication window). After every
crash the query restarts from the checkpoint; the final output must hold
per-topic exactly-once replay-id sets and per-record ordering against the
generator's ledger. Reference contract: client.js:227-242 + design doc
:1137-1156 (replays re-deliver; the consumer must be idempotent)."""

from __future__ import annotations

import json
import os
import random

import pytest

from cdc_worker_spark.streaming.envelope import (
    ACCOUNT_CHILD_FIELDS,
    ACCOUNT_FIELDS,
    account_payload_schema,
)
from cdc_worker_spark.streaming.registry import (
    SchemaRegistry,
    TopicSchema,
    run_multiplexed_pipeline,
)
from tests.test_cdc_event_model import make_envelope
from tests.test_streaming import write_batch_file

N_TOPICS, N_FILES, PER_FILE = 4, 6, 40
POINTS = ("pre", "mid", "post")


class Killer:
    """One-shot fault injector: raises at each configured (batch, point)
    exactly once across the whole run, surviving query restarts."""

    def __init__(self, kills):
        self.pending = set(kills)
        self.fired = []

    def __call__(self, batch_id: int, point: str) -> None:
        key = (batch_id, point)
        if key in self.pending:
            self.pending.discard(key)
            self.fired.append(key)
            raise RuntimeError(f"chaos kill at batch={batch_id} point={point}")


def _registry():
    reg = SchemaRegistry()
    for t in range(N_TOPICS):
        reg.register(
            TopicSchema(
                schema_id=f"cht{t}-v1",
                fields=ACCOUNT_FIELDS,
                child_fields=ACCOUNT_CHILD_FIELDS,
                payload_schema=account_payload_schema(),
            )
        )
    return reg


def _write_input(input_dir: str):
    """Interleaved 4-topic bus, one file per micro-batch; returns the
    ledger: expected last (replay, city) per (topic, record) and the full
    per-topic replay-id sets."""
    expected, per_topic = {}, {t: set() for t in range(N_TOPICS)}
    rid = 0
    for f_idx in range(N_FILES):
        rows = []
        for _ in range(PER_FILE):
            topic = rid % N_TOPICS
            rec = f"T{topic}R{rid % 11}"
            city = f"City{rid}"
            e = make_envelope(
                rid, record_id=rec, commit_ts=1696444513000 + rid, city=city
            )
            e["schema_id"] = f"cht{topic}-v1"
            rows.append(e)
            expected[(topic, rec)] = (rid, city)
            per_topic[topic].add(rid)
            rid += 1
        write_batch_file(input_dir, f"f{f_idx:02d}.jsonl", rows)
        os.utime(
            os.path.join(input_dir, f"f{f_idx:02d}.jsonl"),
            (1_700_000_000 + 2 * f_idx,) * 2,
        )
    return expected, per_topic, rid


def _run_until_done(spark, dirs, reg, killer, max_restarts=12):
    restarts = 0
    while True:
        q = run_multiplexed_pipeline(
            spark,
            dirs["input"],
            dirs["out"],
            dirs["dlq"],
            dirs["chk"],
            reg,
            max_files_per_trigger=1,
            fault_injector=killer,
        )
        try:
            q.awaitTermination(300)
            if not q.isActive and q.exception() is None:
                return restarts
            raise RuntimeError(str(q.exception()))
        except Exception as ex:  # noqa: BLE001 — the injected crash
            if "chaos kill" not in str(ex):
                raise
            restarts += 1
            if restarts > max_restarts:
                raise AssertionError("pipeline never drained") from ex
        finally:
            try:
                q.stop()
            except Exception:  # noqa: BLE001
                pass


def _assert_exactly_once(spark, dirs, expected, per_topic, total):
    out = spark.read.parquet(dirs["out"]).collect()
    assert len(out) == total, f"loss/dup: {len(out)} rows vs {total} events"
    got = {t: set() for t in range(N_TOPICS)}
    latest = {}
    for r in out:
        topic = int(r.schema_id.removeprefix("cht").split("-")[0])
        rp = int(r.replay_id)
        got[topic].add(rp)
        key = (topic, r.record_id)
        if key not in latest or rp > latest[key][0]:
            city = (json.loads(r.event_json).get("BillingAddress") or {}).get(
                "City"
            )
            latest[key] = (rp, city)
    assert got == per_topic  # per-topic exactly-once
    assert latest == expected  # per-topic per-record ordering
    assert spark.read.parquet(dirs["dlq"]).filter("is_corrupt").count() == 0


@pytest.mark.parametrize("seed", range(10))
@pytest.mark.slow
def test_kill_and_resume_mid_batch(spark, tmp_path, seed):
    rng = random.Random(seed)
    n_kills = rng.randint(1, 3)
    kills = set()
    while len(kills) < n_kills:
        kills.add((rng.randrange(N_FILES), rng.choice(POINTS)))
    dirs = {k: str(tmp_path / k) for k in ("input", "out", "dlq", "chk")}
    expected, per_topic, total = _write_input(dirs["input"])
    killer = Killer(kills)
    restarts = _run_until_done(spark, dirs, _registry(), killer)
    assert restarts == n_kills, (killer.fired, kills)
    assert not killer.pending  # every kill point actually fired
    _assert_exactly_once(spark, dirs, expected, per_topic, total)


@pytest.mark.slow
def test_post_write_kill_would_duplicate_under_append(spark, tmp_path):
    """Negative control: the pre-r7 append sink DOES double-write under a
    post-write kill — proving the chaos suite distinguishes the idempotent
    sink from the broken one (guards against a vacuous pass)."""
    from pyspark.sql import DataFrame

    dirs = {k: str(tmp_path / k) for k in ("input", "out", "chk")}
    _, _, total = _write_input(dirs["input"])
    reg = _registry()
    from cdc_worker_spark.streaming.envelope import ENVELOPE_SCHEMA
    from cdc_worker_spark.streaming.registry import (
        decode_multiplexed,
        resolve_new_ids,
    )

    killed = {"armed": True}

    def apply_batch_append(batch_df: DataFrame, batch_id: int) -> None:
        resolve_new_ids(reg, batch_df)
        decode_multiplexed(batch_df, reg).filter("NOT is_corrupt").write.mode(
            "append"
        ).parquet(dirs["out"])
        if batch_id == 2 and killed["armed"]:
            killed["armed"] = False
            raise RuntimeError("chaos kill post-append")

    def run():
        return (
            spark.readStream.schema(ENVELOPE_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(dirs["input"])
            .writeStream.foreachBatch(apply_batch_append)
            .option("checkpointLocation", dirs["chk"])
            .trigger(availableNow=True)
            .start()
        )

    q = run()
    with pytest.raises(Exception, match="chaos kill"):
        q.awaitTermination(300)
        if q.exception() is not None:
            raise RuntimeError(str(q.exception()))
    q.stop()
    q = run()
    q.awaitTermination(300)
    n = spark.read.parquet(dirs["out"]).count()
    assert n == total + PER_FILE  # batch 2 landed twice: the bug the
    # per-batch overwrite sink exists to prevent
