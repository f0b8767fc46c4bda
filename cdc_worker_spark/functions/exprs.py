"""Shared column-expression helpers.

Cross-engine determinism (driver hash-compares Spark vs DuckDB): double
summation order differs between engines, so money-style SUMs go through exact
DECIMAL arithmetic and are cast to DOUBLE once at the end — bitwise identical
on both sides. Matching DuckDB oracle pattern:
``CAST(sum(CAST(x AS DECIMAL(18,2)) * ...) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_expr(price: str, discount: str | None = None, tax: str | None = None) -> Column:
    """Exact-decimal money expression: price [* (1-discount)] [* (1+tax)]."""
    e = F.col(price).cast("decimal(18,2)")
    if discount is not None:
        e = e * (F.lit(1).cast("decimal(3,0)") - F.col(discount).cast("decimal(18,2)"))
    if tax is not None:
        e = e * (F.lit(1).cast("decimal(3,0)") + F.col(tax).cast("decimal(18,2)"))
    return e


def dec_sum(e: Column) -> Column:
    """Exact decimal SUM, surfaced as DOUBLE (deterministic across engines)."""
    return F.sum(e).cast("double")


def ts_ms_col(ts_type=None) -> Column:
    """events.ts -> epoch milliseconds BIGINT, matching DuckDB ``epoch_ms(ts)``
    for EVERY fixture vintage of the column, in ANY session time zone.

    The driver has shipped events.ts as parquet TIMESTAMP(NANOS) (read as
    int64 ns under ``nanosAsLong``) and as TIMESTAMP(MICROS)
    isAdjustedToUTC=false (read as TIMESTAMP_NTZ). Branch on the actual type:

    - int64 ns: integer division (the raw value exceeds 2^53, float math
      would lose precision).
    - TIMESTAMP_NTZ: DuckDB's epoch_ms treats the naive wall time as UTC,
      but Spark's ``CAST(ntz AS TIMESTAMP)`` interprets it in the SESSION
      zone — under a non-UTC session (the correctness harness runs
      America/New_York) that shifts every value by the zone offset. So the
      conversion is pure wall-clock-field arithmetic (unix_date + h/m/s.ms),
      which no session zone can touch.
    - TIMESTAMP (instant): unix_millis directly, session-zone-free.
    """
    from pyspark.sql import types as T

    if ts_type is None or isinstance(ts_type, T.LongType):
        return F.expr("CAST(ts DIV 1000000 AS BIGINT)")
    if isinstance(ts_type, T.TimestampNTZType):
        return F.expr(
            "CAST(unix_date(CAST(ts AS DATE)) AS BIGINT) * 86400000"
            " + hour(ts) * 3600000 + minute(ts) * 60000"
            " + CAST(date_part('SECOND', ts) * 1000 AS BIGINT)"
        )
    if isinstance(ts_type, T.TimestampType):
        return F.expr("unix_millis(ts)")
    raise TypeError(f"unsupported events.ts type {ts_type!r}")
