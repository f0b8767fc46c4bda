"""Changed-field bitmap expansion — the reference's most distinctive scalar
operator (eventParser.js:79-152,195-214 `parseFieldBitmaps`).

Wire form: `ChangeEventHeader.changedFields/nulledFields/diffFields` arrive as
hex bitmaps over the schema's field list, LSB = field 0. Compound (nested
record) fields appear as `"<parentFieldIndex>-<hexBitmap>"` entries whose bits
index the child field list, expanded to `Parent.Child` names.

Two implementations:
- :func:`expand_bitmap_py` — plain Python, the behavioral twin used by golden
  and property tests (and by driver-side tooling).
- :func:`changed_fields_col` — a native Spark column expression (higher-order
  functions over a per-schema field-name literal; JVM-side, codegen'd, no
  Python in the hot path) used by the batch/streaming decode pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _bits_of_hex(hex_bitmap: str) -> list[int]:
    """Set-bit positions of a hex bitmap string (LSB-first, i.e. bit 0 =
    field 0 — the reference reverses the binary string to get this order,
    eventParser.js:195-214)."""
    h = hex_bitmap[2:] if hex_bitmap.lower().startswith("0x") else hex_bitmap
    if not h:
        return []
    value = int(h, 16)
    out = []
    i = 0
    while value:
        if value & 1:
            out.append(i)
        value >>= 1
        i += 1
    return out


def expand_bitmap_py(
    fields: list[str],
    bitmaps: list[str],
    child_fields: dict[str, list[str]] | None = None,
) -> list[str]:
    """Expand hex bitmaps to field names (eventParser.js:79-152 semantics).

    ``fields`` is the schema's ordered top-level field list; ``child_fields``
    maps a compound field's name to its ordered child field list. Plain
    entries (`"0x..."`) index ``fields``; compound entries
    (`"<parentIdx>-0x..."`) index the parent's children, producing
    `Parent.Child` names.
    """
    child_fields = child_fields or {}
    out: list[str] = []
    for bm in bitmaps:
        if "-" in bm:
            parent_idx_s, child_bm = bm.split("-", 1)
            parent = fields[int(parent_idx_s)]
            children = child_fields.get(parent, [])
            out.extend(f"{parent}.{children[i]}" for i in _bits_of_hex(child_bm))
        else:
            out.extend(fields[i] for i in _bits_of_hex(bm))
    return out


def changed_fields_col(bitmap_col: str | Column, fields: list[str]) -> Column:
    """Native column expression: hex bitmap -> array of set field names.

    JVM-side higher-order functions over the (broadcast-as-literal) field
    list: ``conv`` parses the hex, a ``filter(sequence(...))`` tests each bit,
    ``transform`` maps positions to names. No Python UDF — stays inside
    whole-stage codegen at any scale.

    Handles the plain (non-compound) form; compound `"idx-hex"` entries are
    handled by :func:`expand_bitmaps_array_col` over the exploded array.
    """
    col = F.col(bitmap_col) if isinstance(bitmap_col, str) else bitmap_col
    n = len(fields)
    fields_arr = F.array(*[F.lit(x) for x in fields])
    hex_digits = F.regexp_replace(F.upper(col), "^0X", "")
    value = F.conv(hex_digits, 16, 10).cast("decimal(20,0)")
    # bit test via integer div/mod on DECIMAL — safe through 64 bits
    positions = F.filter(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: ((value / F.pow(F.lit(2.0), i.cast("double")).cast("decimal(20,0)"))
                   .cast("bigint") % 2 == 1),
    )
    return F.transform(positions, lambda i: F.element_at(fields_arr, i + 1))


def changed_fields_col_small(bitmap_col: str | Column, fields: list[str]) -> Column:
    """64-bit fast path: hex bitmap (<= 16 digits) -> array of field names
    using BIGINT shifts (cheaper than the DECIMAL-safe variant)."""
    col = F.col(bitmap_col) if isinstance(bitmap_col, str) else bitmap_col
    n = min(len(fields), 63)
    fields_arr = F.array(*[F.lit(x) for x in fields])
    hex_digits = F.regexp_replace(F.upper(col), "^0X", "")
    value = F.conv(hex_digits, 16, 10).cast("bigint")
    positions = F.filter(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.getbit(value, i.cast("int")) == 1,
    )
    return F.transform(positions, lambda i: F.element_at(fields_arr, i + 1))


def expand_bitmaps_array_col(
    bitmaps_col: str | Column,
    fields: list[str],
    child_fields: dict[str, list[str]] | None = None,
) -> Column:
    """Full reference semantics over an ``array<string>`` of bitmap entries,
    including compound `"<parentIdx>-<hex>"` entries -> `Parent.Child`.

    Composition of native HOFs: flatten(transform(entries, expand-one-entry)).
    The per-schema field dictionaries become array literals (they are tiny —
    schema metadata, not data)."""
    child_fields = child_fields or {}
    col = F.col(bitmaps_col) if isinstance(bitmaps_col, str) else bitmaps_col
    fields_arr = F.array(*[F.lit(x) for x in fields])

    def one_entry(entry: Column) -> Column:
        parent_idx = F.split(entry, "-").getItem(0)
        child_hex = F.split(entry, "-").getItem(1)
        parent_name = F.element_at(fields_arr, parent_idx.cast("int") + 1)
        # child dictionary lookup: map literal parent -> array of children
        if child_fields:
            child_map = F.create_map(
                *[
                    x
                    for parent, kids in child_fields.items()
                    for x in (F.lit(parent), F.array(*[F.lit(k) for k in kids]))
                ]
            )
            children = F.element_at(child_map, parent_name)
        else:
            children = F.array().cast("array<string>")
        compound = F.transform(
            _positions_of(child_hex),
            lambda i: F.concat_ws(".", parent_name, F.element_at(children, i + 1)),
        )
        plain = F.transform(
            _positions_of(entry), lambda i: F.element_at(fields_arr, i + 1)
        )
        return F.when(entry.contains("-"), compound).otherwise(plain)

    return F.flatten(F.transform(col, one_entry))


def _positions_of(hex_col: Column, max_bits: int = 63) -> Column:
    """Set-bit positions (0-based) of a hex string column, 64-bit range."""
    value = F.conv(F.regexp_replace(F.upper(hex_col), "^0X", ""), 16, 10).cast("bigint")
    return F.filter(
        F.sequence(F.lit(0), F.lit(max_bits - 1)),
        lambda i: F.getbit(value, i.cast("int")) == 1,
    )
