"""Replay-ID (stream offset) codec — reference eventParser.js:160-174.

The wire form is an unsigned 64-bit big-endian integer in an 8-byte buffer
(`decodeReplayId` = readBigUInt64BE, `encodeReplayId` = writeBigUInt64BE).
Values can exceed int64 in principle, so the decoded column form is
DECIMAL(20,0) (SURVEY §1.1); the Python twin round-trips full uint64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UINT64_MAX = (1 << 64) - 1


def encode_replay_id(replay_id: int) -> bytes:
    """uint64 -> 8-byte big-endian buffer (writeBigUInt64BE twin)."""
    if not 0 <= replay_id <= UINT64_MAX:
        raise ValueError(f"replay id out of uint64 range: {replay_id}")
    return replay_id.to_bytes(8, "big")


def decode_replay_id(buf: bytes) -> int:
    """8-byte big-endian buffer -> uint64 (readBigUInt64BE twin)."""
    if len(buf) != 8:
        raise ValueError(f"replay id buffer must be 8 bytes, got {len(buf)}")
    return int.from_bytes(buf, "big")


def decode_replay_id_col(binary_col: str | Column) -> Column:
    """Column form: BINARY(8) big-endian -> DECIMAL(20,0).

    ``hex()`` renders the bytes most-significant-first, which IS big-endian
    order, then ``conv`` parses base 16 -> base 10. Native expressions only —
    no UDF, full uint64 range preserved via DECIMAL(20,0).
    """
    col = F.col(binary_col) if isinstance(binary_col, str) else binary_col
    return F.conv(F.hex(col), 16, 10).cast("decimal(20,0)")


def encode_replay_id_col(num_col: str | Column) -> Column:
    """Column form: integral/decimal replay id -> BINARY(8) big-endian."""
    col = F.col(num_col) if isinstance(num_col, str) else num_col
    # conv(dec->hex) then left-pad to 16 hex digits = 8 bytes
    hex_str = F.lpad(F.conv(col.cast("string"), 10, 16), 16, "0")
    return F.unhex(hex_str)
