"""Replay-ID codec property tests (SURVEY §5.2 item 3):
encode∘decode = id over the full uint64 range, Python twin and column form
(reference eventParser.js:160-174)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_worker_spark.functions.offsets import (
    UINT64_MAX,
    decode_replay_id,
    decode_replay_id_col,
    encode_replay_id,
    encode_replay_id_col,
)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=UINT64_MAX))
def test_python_roundtrip(n):
    assert decode_replay_id(encode_replay_id(n)) == n


def test_python_big_endian_order():
    assert encode_replay_id(1) == b"\x00\x00\x00\x00\x00\x00\x00\x01"
    assert decode_replay_id(b"\x01\x00\x00\x00\x00\x00\x00\x00") == 1 << 56


def test_python_range_checks():
    with pytest.raises(ValueError):
        encode_replay_id(-1)
    with pytest.raises(ValueError):
        encode_replay_id(1 << 64)
    with pytest.raises(ValueError):
        decode_replay_id(b"\x00" * 7)


def test_column_roundtrip_including_beyond_int64(spark):
    """Column codec: binary -> DECIMAL(20,0) -> binary, incl. > 2^63 values
    (the reference's BigInt edge; commitNumber overflow note README.md:519)."""
    cases = [0, 1, 42, 18098167, (1 << 53) + 1, (1 << 63) + 7, UINT64_MAX]
    df = spark.createDataFrame(
        [(i, encode_replay_id(v)) for i, v in enumerate(cases)], "i: int, buf: binary"
    )
    out = df.select(
        "i",
        decode_replay_id_col("buf").alias("n"),
        encode_replay_id_col(decode_replay_id_col("buf")).alias("back"),
    ).collect()
    for row, v in zip(sorted(out, key=lambda r: r.i), cases):
        assert row.n == Decimal(v)
        assert bytes(row.back) == encode_replay_id(v)
