"""Golden-event decode test (SURVEY §5.2 item 2): the documented Account
change event (reference README.md:275-346) flows through the wire envelope ->
decode_envelope and reproduces the golden parsed output — including the
bitmap-form changedFields expanding to exactly the golden name list (the
reference only ever tested this against a live org)."""

from __future__ import annotations

import base64
import json
from decimal import Decimal

from cdc_worker_spark.functions.offsets import encode_replay_id
from cdc_worker_spark.streaming.envelope import ENVELOPE_SCHEMA, decode_envelope

GOLDEN_REPLAY_ID = 18098167  # README.md:277


def make_envelope(
    replay_id: int,
    record_id: str = "0014H00002LbR7QQAV",
    change_type: str = "UPDATE",
    commit_ts: int = 1696444513000,
    seq_no: int = 1,
    txn_key: str = "000046c7-a642-11e2-c29b-229c6786473e",
    changed_bitmaps: list[str] | None = None,
    city: str | None = "San Francisco",
    state: str | None = "CA",
    name: str | None = None,
    corrupt: bool = False,
) -> dict:
    """Wire-form envelope: bitmap-encoded changedFields (eventParser.js input
    form), base64 8-byte-BE replay id (pubsub_api.proto:72)."""
    payload = {
        "ChangeEventHeader": {
            "entityName": "Account",
            "recordIds": [record_id],
            "changeType": change_type,
            "changeOrigin": "com/salesforce/api/soap/58.0;client=SfdcInternalAPI/",
            "transactionKey": txn_key,
            "sequenceNumber": seq_no,
            "commitTimestamp": commit_ts,
            "commitNumber": 11657372702432,
            "commitUser": "00558000000yFyDAAU",
            "nulledFields": [],
            "diffFields": [],
            # 0x400000 = bit 22 = LastModifiedDate; "4-0x6" = BillingAddress
            # children bits 1,2 = City, State
            "changedFields": changed_bitmaps
            if changed_bitmaps is not None
            else ["0x400000", "4-0x6"],
        },
        "Name": name,
        "BillingAddress": {"City": city, "State": state} if city or state else None,
        "LastModifiedDate": commit_ts,
    }
    return {
        "replay_id_b64": base64.b64encode(encode_replay_id(replay_id)).decode(),
        "schema_id": "account-cdc-v1",
        "payload": "{not-json!" if corrupt else json.dumps(payload),
    }


def test_golden_account_event_decode(spark):
    raw = spark.createDataFrame([make_envelope(GOLDEN_REPLAY_ID)], ENVELOPE_SCHEMA)
    row = decode_envelope(raw).collect()[0]

    # offset decode (eventParser.js:160-162): uint64 BE -> number
    assert row.replay_id == Decimal(GOLDEN_REPLAY_ID)
    # bitmap expansion reproduces the golden changedFields, in order
    assert row.changed_fields == [
        "LastModifiedDate",
        "BillingAddress.City",
        "BillingAddress.State",
    ]
    assert row.nulled_fields == [] and row.diff_fields == []
    # header enrichment
    assert row.entity == "Account"
    assert row.record_id == "0014H00002LbR7QQAV"
    assert row.change_type == "UPDATE"
    assert row.seq_no == 1
    assert row.commit_number == 11657372702432
    # payload fields: changed ones carry values, unchanged are NULL
    assert row.event.BillingAddress.City == "San Francisco"
    assert row.event.BillingAddress.State == "CA"
    assert row.event.Name is None
    assert row.event.LastModifiedDate == 1696444513000
    assert not row.is_corrupt


def test_corrupt_payload_flagged_not_fatal(spark):
    """C4: a parse failure becomes a flagged row (EventParseError analogue),
    never an exception — the stream must continue."""
    raw = spark.createDataFrame(
        [make_envelope(1), make_envelope(2, corrupt=True)], ENVELOPE_SCHEMA
    )
    rows = {r.replay_id: r for r in decode_envelope(raw).collect()}
    assert not rows[Decimal(1)].is_corrupt
    assert rows[Decimal(2)].is_corrupt
    assert rows[Decimal(2)].raw_payload == "{not-json!"
    # replay id still decodes on the corrupt row (it lives outside the payload)
    assert rows[Decimal(2)].replay_id == Decimal(2)


def test_uint64_replay_id_beyond_int64(spark):
    """Replay ids are unsigned 64-bit (eventParser.js readBigUInt64BE):
    values above 2^63 must survive via DECIMAL(20,0)."""
    big = (1 << 64) - 42
    raw = spark.createDataFrame([make_envelope(big)], ENVELOPE_SCHEMA)
    row = decode_envelope(raw).collect()[0]
    assert row.replay_id == Decimal(big)
