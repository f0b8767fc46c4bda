"""Bitmap-expansion tests (SURVEY §5.2 item 3): FIXTURES.md §B3 cases + a
hypothesis property test of the native column expression against the plain
Python twin (the reference's trickiest pure function had zero direct tests —
eventParser.js:79-152)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_worker_spark.functions.bitmap import (
    changed_fields_col_small,
    expand_bitmap_py,
    expand_bitmaps_array_col,
)

FIELDS3 = ["Id", "Name", "Phone"]
FIELDS10 = [
    "Id", "Name", "Phone", "Email", "Industry",
    "BillingAddress", "Website", "Rating", "OwnerId", "LastModifiedDate",
]
CHILDREN = {"BillingAddress": ["Street", "City", "State", "PostalCode"]}

# FIXTURES.md §B3 table
B3_CASES = [
    (FIELDS3, ["0x2"], ["Name"]),
    (FIELDS3, ["0x5"], ["Id", "Phone"]),
    (FIELDS10, ["0x200"], ["LastModifiedDate"]),
    (FIELDS10, ["0x0", "5-0x6"], ["BillingAddress.City", "BillingAddress.State"]),
    (FIELDS10, [], []),
]


@pytest.mark.parametrize("fields,bitmaps,expected", B3_CASES)
def test_python_twin_b3_cases(fields, bitmaps, expected):
    assert expand_bitmap_py(fields, bitmaps, CHILDREN) == expected


@pytest.mark.parametrize("fields,bitmaps,expected", B3_CASES)
def test_column_expr_b3_cases(spark, fields, bitmaps, expected):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(bitmaps,)], "bitmaps: array<string>")
    got = df.select(
        expand_bitmaps_array_col("bitmaps", fields, CHILDREN).alias("out")
    ).collect()[0].out
    assert got == expected


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 63) - 1))
def test_python_twin_matches_reference_bit_semantics(value):
    """LSB = field 0 over a 63-field dictionary."""
    fields = [f"F{i}" for i in range(63)]
    expected = [f"F{i}" for i in range(63) if (value >> i) & 1]
    assert expand_bitmap_py(fields, [f"0x{value:X}"]) == expected


def test_column_expr_matches_python_twin_random(spark):
    """Differential: native HOF expression vs the Python twin over random
    bitmaps (single Spark job for all cases — keeps the test fast)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(42)
    fields = [f"F{i}" for i in range(40)]
    cases = [rng.getrandbits(40) for _ in range(200)]
    df = spark.createDataFrame(
        [(i, f"0x{v:x}") for i, v in enumerate(cases)], "i: int, bm: string"
    )
    got = {
        r.i: r.out
        for r in df.select(
            "i", changed_fields_col_small("bm", fields).alias("out")
        ).collect()
    }
    for i, v in enumerate(cases):
        assert got[i] == expand_bitmap_py(fields, [f"0x{v:x}"]), f"case {i}: 0x{v:x}"


def test_wide_bitmap_beyond_63_bits(spark):
    """Bitmaps wider than 63 bits must decode every bit — the naive
    conv->bigint path overflows to NULL at bit 63+ and silently drops the
    whole entry (real change-event schemas routinely exceed 63 fields)."""
    fields = [f"F{i}" for i in range(130)]
    cases = [
        1 << 63,                       # exactly the overflow bit
        1 << 64,
        1 << 100,
        (1 << 129) | (1 << 63) | 1,    # straddles all three 60-bit chunks
        (1 << 120) - 1,                # 120 consecutive set bits
    ]
    df = spark.createDataFrame(
        [(i, [f"0x{v:x}"]) for i, v in enumerate(cases)],
        "i: int, bms: array<string>",
    )
    got = {
        r.i: r.out
        for r in df.select(
            "i", expand_bitmaps_array_col("bms", fields).alias("out")
        ).collect()
    }
    for i, v in enumerate(cases):
        assert got[i] == expand_bitmap_py(fields, [f"0x{v:x}"]), f"0x{v:x}"


def test_wide_bitmap_differential_random(spark):
    """Differential vs the Python twin over random 200-bit bitmaps."""
    import random

    rng = random.Random(13)
    fields = [f"F{i}" for i in range(200)]
    cases = [rng.getrandbits(200) for _ in range(60)]
    df = spark.createDataFrame(
        [(i, [f"0x{v:x}"]) for i, v in enumerate(cases)],
        "i: int, bms: array<string>",
    )
    got = {
        r.i: r.out
        for r in df.select(
            "i", expand_bitmaps_array_col("bms", fields).alias("out")
        ).collect()
    }
    for i, v in enumerate(cases):
        assert got[i] == expand_bitmap_py(fields, [f"0x{v:x}"]), f"case {i}"


def test_wide_compound_children(spark):
    """Compound entries whose CHILD list exceeds 63 fields."""
    children = {"Big": [f"C{i}" for i in range(80)]}
    fields = ["Id", "Big"]
    bms = [f"1-0x{(1 << 79) | (1 << 63) | 2:x}"]
    df = spark.createDataFrame([(bms,)], "bms: array<string>")
    got = df.select(
        expand_bitmaps_array_col("bms", fields, children).alias("out")
    ).collect()[0].out
    assert got == expand_bitmap_py(fields, bms, children)
    assert "Big.C79" in got and "Big.C63" in got and "Big.C1" in got


def test_compound_entries_differential(spark):
    """Compound "<parentIdx>-<hex>" entries against the Python twin."""
    import random

    rng = random.Random(7)
    children = {"BillingAddress": [f"C{i}" for i in range(11)]}
    fields = ["Id", "Name", "BillingAddress", "Phone"]
    cases = []
    for i in range(50):
        plain = rng.getrandbits(4)
        child = rng.getrandbits(11)
        cases.append((i, [f"0x{plain:x}", f"2-0x{child:x}"]))
    df = spark.createDataFrame(cases, "i: int, bms: array<string>")
    got = {
        r.i: r.out
        for r in df.select(
            "i", expand_bitmaps_array_col("bms", fields, children).alias("out")
        ).collect()
    }
    for i, bms in cases:
        assert got[i] == expand_bitmap_py(fields, bms, children), f"case {bms}"
