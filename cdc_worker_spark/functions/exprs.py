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


def ts_ms_col() -> Column:
    """events.ts (int64 nanos via nanosAsLong) -> epoch milliseconds BIGINT.

    Integer division — the raw ns value exceeds 2^53 so float math would lose
    precision. Matches DuckDB ``epoch_ms(ts)`` exactly.
    """
    return F.expr("CAST(ts DIV 1000000 AS BIGINT)")
