"""Dynamic schema registry tests (reference A7 GetSchema fetch+cache, C2
per-topic demux, C4 unknown-schema dead-lettering): two topics with different
schemas in one bus, one resolved lazily through the resolver callback."""

from __future__ import annotations

import pytest
import base64
import json
from decimal import Decimal

from pyspark.sql import types as T

from cdc_worker_spark.functions.offsets import encode_replay_id
from cdc_worker_spark.streaming.envelope import (
    ACCOUNT_CHILD_FIELDS,
    ACCOUNT_FIELDS,
    ENVELOPE_SCHEMA,
    account_payload_schema,
)
from cdc_worker_spark.streaming.registry import (
    SchemaRegistry,
    TopicSchema,
    decode_multiplexed,
    decode_topic,
)

from tests.test_cdc_event_model import make_envelope

CONTACT_FIELDS = ["ChangeEventHeader", "FirstName", "LastName", "Email", "AccountId"]

_HEADER = account_payload_schema()["ChangeEventHeader"].dataType


def contact_payload_schema() -> T.StructType:
    return T.StructType(
        [T.StructField("_corrupt", T.StringType()),
         T.StructField("ChangeEventHeader", _HEADER)]
        + [T.StructField(n, T.StringType()) for n in CONTACT_FIELDS[1:]]
    )


def contact_schema_entry() -> TopicSchema:
    return TopicSchema(
        schema_id="contact-cdc-v1",
        fields=CONTACT_FIELDS,
        child_fields={},
        payload_schema=contact_payload_schema(),
    )


def account_schema_entry() -> TopicSchema:
    return TopicSchema(
        schema_id="account-cdc-v1",
        fields=ACCOUNT_FIELDS,
        child_fields=ACCOUNT_CHILD_FIELDS,
        payload_schema=account_payload_schema(),
    )


def make_contact_envelope(replay_id: int, email: str) -> dict:
    payload = {
        "ChangeEventHeader": {
            "entityName": "Contact",
            "recordIds": ["003000000000001"],
            "changeType": "UPDATE",
            "transactionKey": "t",
            "sequenceNumber": 1,
            "commitTimestamp": 1696444513000,
            "commitNumber": 1,
            "commitUser": "u",
            "nulledFields": [],
            "diffFields": [],
            "changedFields": ["0x8"],  # bit 3 = Email
        },
        "Email": email,
    }
    return {
        "replay_id_b64": base64.b64encode(encode_replay_id(replay_id)).decode(),
        "schema_id": "contact-cdc-v1",
        "payload": json.dumps(payload),
    }


def _mixed_bus(spark):
    rows = [
        make_envelope(1, record_id="A"),                       # account-cdc-v1
        make_contact_envelope(2, "a@example.com"),             # contact-cdc-v1
        {"replay_id_b64": base64.b64encode(encode_replay_id(3)).decode(),
         "schema_id": "orphan-v9", "payload": "{}"},           # unregistered
    ]
    return spark.createDataFrame(rows, ENVELOPE_SCHEMA)


def test_decode_topic_typed_per_schema(spark):
    reg = SchemaRegistry()
    reg.register(account_schema_entry())
    reg.register(contact_schema_entry())
    bus = _mixed_bus(spark)

    acc = decode_topic(bus, reg, "account-cdc-v1").collect()
    assert len(acc) == 1 and acc[0].entity == "Account"
    assert acc[0].event.BillingAddress.City == "San Francisco"

    con = decode_topic(bus, reg, "contact-cdc-v1").collect()
    assert len(con) == 1 and con[0].entity == "Contact"
    assert con[0].event.Email == "a@example.com"
    # bitmap expansion uses the CONTACT field dictionary
    assert con[0].changed_fields == ["Email"]


def test_resolver_fetches_unseen_schema_and_memoizes(spark):
    """A7: unseen schema_id -> resolver callback (the GetSchema RPC), result
    cached — the resolver runs once."""
    calls: list[str] = []

    def resolver(sid: str) -> TopicSchema | None:
        calls.append(sid)
        return contact_schema_entry() if sid == "contact-cdc-v1" else None

    reg = SchemaRegistry(resolver=resolver)
    reg.register(account_schema_entry())
    bus = _mixed_bus(spark)

    assert decode_topic(bus, reg, "contact-cdc-v1").count() == 1
    assert decode_topic(bus, reg, "contact-cdc-v1").count() == 1
    assert calls == ["contact-cdc-v1"]  # memoized after first fetch


def test_multiplexed_decode_and_unknown_to_dlq(spark):
    reg = SchemaRegistry()
    reg.register(account_schema_entry())
    reg.register(contact_schema_entry())
    out = {int(r.replay_id): r for r in decode_multiplexed(_mixed_bus(spark), reg).collect()}
    assert len(out) == 3
    assert out[1].entity == "Account" and not out[1].is_corrupt
    assert out[2].entity == "Contact" and not out[2].is_corrupt
    assert json.loads(out[2].event_json)["Email"] == "a@example.com"
    # the orphan row: flagged, replay id preserved (EventParseError semantics)
    assert out[3].is_corrupt and out[3].schema_id == "orphan-v9"
    assert out[3].replay_id == Decimal(3)


def test_null_schema_id_routed_to_dlq(spark):
    """A row with NULL schema_id must surface as is_corrupt for DLQ routing,
    not silently vanish (NOT-isin is NULL-valued on NULL input)."""
    reg = SchemaRegistry()
    reg.register(account_schema_entry())
    rows = [
        make_envelope(1, record_id="A"),
        {"replay_id_b64": base64.b64encode(encode_replay_id(7)).decode(),
         "schema_id": None, "payload": "{}"},
    ]
    bus = spark.createDataFrame(rows, ENVELOPE_SCHEMA)
    out = {int(r.replay_id): r for r in decode_multiplexed(bus, reg).collect()}
    assert len(out) == 2  # nothing dropped
    assert out[7].is_corrupt and out[7].schema_id is None


def test_midstream_schema_resolution_no_restart(spark, tmp_path):
    """A schema id FIRST SEEN mid-stream is resolved at foreachBatch time
    (the GetSchema analogue) and its rows land decoded, not in the DLQ —
    no stream restart (reference client.js:896-909)."""
    import os

    from cdc_worker_spark.streaming.registry import run_multiplexed_pipeline
    from tests.test_streaming import write_batch_file

    dirs = {k: str(tmp_path / k) for k in ("input", "out", "dlq", "chk")}
    calls: list[str] = []

    def resolver(sid: str):
        calls.append(sid)
        return contact_schema_entry() if sid == "contact-cdc-v1" else None

    reg = SchemaRegistry(resolver=resolver)
    reg.register(account_schema_entry())

    write_batch_file(dirs["input"], "b1.jsonl", [make_envelope(1, record_id="A")])
    write_batch_file(dirs["input"], "b2.jsonl", [
        make_contact_envelope(2, "late@example.com"),  # id unseen at start
        {"replay_id_b64": base64.b64encode(encode_replay_id(3)).decode(),
         "schema_id": "orphan-v9", "payload": "{}"},   # never resolvable
    ])
    q = run_multiplexed_pipeline(
        spark, dirs["input"], dirs["out"], dirs["dlq"], dirs["chk"], reg
    )
    q.awaitTermination(120)
    assert not q.isActive

    out = {int(r.replay_id): r for r in spark.read.parquet(dirs["out"]).collect()}
    assert out[2].entity == "Contact"
    assert json.loads(out[2].event_json)["Email"] == "late@example.com"
    assert "contact-cdc-v1" in calls  # fetched mid-stream, not at plan build
    dlq = {int(r.replay_id): r for r in spark.read.parquet(dirs["dlq"]).collect()}
    assert set(dlq) == {3}  # only the unresolvable orphan dead-letters


def test_unresolvable_topic_raises_at_subscribe(spark):
    reg = SchemaRegistry()
    try:
        decode_topic(_mixed_bus(spark), reg, "nope-v1")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_multiplexed_avro_py_demux_with_dlq(spark):
    """Per-topic Avro decode through the demux (reference: per-schemaId
    fromBuffer, client.js:760-763): two topics' payloads Avro-encoded
    against THEIR registry schemas in one bus + one unknown schema id ->
    typed rows per topic, unknown row dead-lettered with base64 raw bytes."""
    from cdc_worker_spark.functions.avro_codec import encode as avro_encode, parse_schema
    from cdc_worker_spark.streaming.envelope import (
        AVRO_ENVELOPE_SCHEMA,
        avro_schema_json,
    )

    reg = SchemaRegistry()
    reg.register(account_schema_entry())
    reg.register(contact_schema_entry())
    acct_sch = parse_schema(avro_schema_json(account_payload_schema()))
    cont_sch = parse_schema(avro_schema_json(contact_payload_schema()))

    a = make_envelope(11, record_id="AA")
    c = make_contact_envelope(12, "x@y.z")
    rows = [
        {"replay_id_b64": a["replay_id_b64"], "schema_id": a["schema_id"],
         "payload": bytearray(avro_encode(json.loads(a["payload"]), acct_sch))},
        {"replay_id_b64": c["replay_id_b64"], "schema_id": c["schema_id"],
         "payload": bytearray(avro_encode(json.loads(c["payload"]), cont_sch))},
        {"replay_id_b64": a["replay_id_b64"], "schema_id": "mystery-v9",
         "payload": bytearray(b"\x01\x02")},
    ]
    raw = spark.createDataFrame(rows, AVRO_ENVELOPE_SCHEMA)
    out = decode_multiplexed(raw, reg, codec="avro_py").collect()
    by_sid = {r.schema_id: r for r in out}
    assert len(out) == 3
    assert by_sid["account-cdc-v1"].record_id == "AA"
    assert not by_sid["account-cdc-v1"].is_corrupt
    assert json.loads(by_sid["contact-cdc-v1"].event_json)["Email"] == "x@y.z"
    dlq = by_sid["mystery-v9"]
    assert dlq.is_corrupt and base64.b64decode(dlq.raw_payload) == b"\x01\x02"

    typed = decode_topic(raw, reg, "contact-cdc-v1", codec="avro_py").collect()
    assert len(typed) == 1 and typed[0].event.Email == "x@y.z"


@pytest.mark.slow
def test_multi_topic_pipeline_exactly_once_and_ordered(spark, tmp_path):
    """Multi-topic scale-out invariants (VERDICT r05 next #3): the
    multiplexed pipeline over an interleaved 4-topic bus, one file per
    micro-batch, must deliver every topic's events EXACTLY ONCE (replay-id
    sets equal per topic, no loss, no dup) and preserve per-topic
    per-record order: reconstructing latest state from the output by max
    replay_id equals the last event the generator wrote for that record —
    the same ordering contract the reference's one-worker-per-topic model
    guarantees, here through one multiplexed stream."""
    import os

    from cdc_worker_spark.streaming.registry import run_multiplexed_pipeline
    from tests.test_streaming import write_batch_file

    n_topics, n_files, per_file = 4, 6, 50
    reg = SchemaRegistry()
    for t in range(n_topics):
        reg.register(
            TopicSchema(
                schema_id=f"mtt{t}-v1",
                fields=ACCOUNT_FIELDS,
                child_fields=ACCOUNT_CHILD_FIELDS,
                payload_schema=account_payload_schema(),
            )
        )
    dirs = {k: str(tmp_path / k) for k in ("input", "out", "dlq", "chk")}
    expected = {}  # (topic, record) -> (last replay_id, last city)
    per_topic_replays: dict[int, set[int]] = {t: set() for t in range(n_topics)}
    rid = 0
    for f_idx in range(n_files):
        rows = []
        for _ in range(per_file):
            topic = rid % n_topics
            rec = f"T{topic}R{rid % 13}"
            city = f"City{rid}"
            e = make_envelope(rid, record_id=rec, commit_ts=1696444513000 + rid, city=city)
            e["schema_id"] = f"mtt{topic}-v1"
            rows.append(e)
            expected[(topic, rec)] = (rid, city)
            per_topic_replays[topic].add(rid)
            rid += 1
        write_batch_file(dirs["input"], f"f{f_idx:02d}.jsonl", rows)
        os.utime(
            os.path.join(dirs["input"], f"f{f_idx:02d}.jsonl"),
            (1_700_000_000 + 2 * f_idx,) * 2,
        )
    q = run_multiplexed_pipeline(
        spark, dirs["input"], dirs["out"], dirs["dlq"], dirs["chk"], reg,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    assert not q.isActive
    out = spark.read.parquet(dirs["out"]).collect()
    assert len(out) == rid  # exactly once: no loss, no dup
    got_replays: dict[int, set[int]] = {t: set() for t in range(n_topics)}
    latest: dict[tuple, tuple] = {}
    for r in out:
        topic = int(r.schema_id.removeprefix("mtt").split("-")[0])
        rp = int(r.replay_id)
        got_replays[topic].add(rp)
        key = (topic, r.record_id)
        if key not in latest or rp > latest[key][0]:
            city = (json.loads(r.event_json).get("BillingAddress") or {}).get("City")
            latest[key] = (rp, city)
    assert got_replays == per_topic_replays  # per-topic exactly-once
    assert latest == expected  # per-topic per-record order preserved
    assert not os.path.exists(dirs["dlq"]) or not spark.read.parquet(
        dirs["dlq"]
    ).count()
