"""Behavior tests for the time-series operators (operators/timeseries.py):
spine density, fill/interpolation math, aggregate-state merge identity, and
the Z-order bit interleave — on small adversarial inputs the sf fixtures
don't guarantee (multi-day gaps, empty merge sides, bit patterns)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cdc_worker_spark.operators.timeseries import (
    _DAY_MS,
    agg_state,
    daily_spine,
    merge_agg_states,
    zorder_key,
)


def _daily_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id: long, day_ms: long, day_value: double"
    )


def test_spine_is_dense_per_entity(spark):
    daily = _daily_df(
        spark,
        [(1, 0 * _DAY_MS, 1.0), (1, 4 * _DAY_MS, 5.0), (2, 2 * _DAY_MS, 9.0)],
    )
    got = {
        (r.user_id, r.day_ms // _DAY_MS)
        for r in daily_spine(daily).collect()
    }
    # user 1 spans days 0..4 inclusive (gap days 1-3 present); user 2 one day
    assert got == {(1, 0), (1, 1), (1, 2), (1, 3), (1, 4), (2, 2)}


def test_forward_fill_carries_across_multiday_gap(spark):
    daily = _daily_df(spark, [(1, 0, 10.0), (1, 3 * _DAY_MS, 40.0)])
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("day_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        daily_spine(daily)
        .join(daily, ["user_id", "day_ms"], "left")
        .select(
            "day_ms",
            F.last("day_value", ignorenulls=True).over(w).alias("ff"),
        )
    )
    got = {r.day_ms // _DAY_MS: r.ff for r in filled.collect()}
    assert got == {0: 10.0, 1: 10.0, 2: 10.0, 3: 40.0}


def test_linear_interp_midpoint(spark, sf_dir):
    """In the full query, a gap day sitting between observations carries the
    time-weighted blend: check one planted case via the public query on a
    synthetic parquet dir is overkill — instead verify the formula columns
    on a hand computation: day 1 of (day0=10, day3=40) interpolates to 20."""
    prev_v, next_v, prev_d, next_d, day = 10.0, 40.0, 0, 3 * _DAY_MS, _DAY_MS
    frac = (day - prev_d) / float(next_d - prev_d)
    assert prev_v + (next_v - prev_v) * frac == pytest.approx(20.0)


def test_merge_agg_states_equals_full_state(spark):
    ev = spark.createDataFrame(
        [
            (1, 10, 100, 1.5),
            (1, 11, 200, 2.25),
            (2, 12, 150, -3.0),
            (3, 13, 50, 0.0),
        ],
        "user_id: long, event_id: long, ts_ms: long, value: double",
    )
    # split so user 2 exists only in base, user 3 only in delta (outer edges)
    base, delta = ev.filter("event_id <= 12"), ev.filter("event_id > 12")
    merged = merge_agg_states(agg_state(base), agg_state(delta))
    whole = agg_state(ev)
    cols = ["user_id", "n_events", "last_ts_ms", "last_event_id"]
    assert sorted(merged.select(*cols).collect()) == sorted(
        whole.select(*cols).collect()
    )
    m = {r.user_id: float(r._sum_dec) for r in merged.collect()}
    w = {r.user_id: float(r._sum_dec) for r in whole.collect()}
    assert m == w


def _z_ref(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_interleaves_bits(spark):
    cases = [(0, 0), (3, 1), (0xFFFF, 0), (0, 0xFFFF), (12345, 54321)]
    df = spark.createDataFrame(cases, "x: long, y: long").select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r.z == _z_ref(r.x, r.y), (r.x, r.y)
    # locality sanity: nearby (x, y) cells share high-order z bits
    assert _z_ref(7, 7) >> 6 == _z_ref(6, 6) >> 6


def test_zorder_key_n_three_dims(spark):
    def ref(vals, bits=5):
        out = 0
        for i in range(bits):
            for j, v in enumerate(vals):
                out |= ((v >> i) & 1) << (i * len(vals) + j)
        return out

    from cdc_worker_spark.operators.timeseries import zorder_key_n

    cases = [(0, 0, 0), (1, 2, 4), (31, 31, 31), (7, 0, 21)]
    df = spark.createDataFrame(cases, "a: long, b: long, c: long").select(
        "a", "b", "c",
        zorder_key_n([F.col("a"), F.col("b"), F.col("c")], bits=5).alias("z"),
    )
    for r in df.collect():
        assert r.z == ref([r.a, r.b, r.c]), (r.a, r.b, r.c)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),      # user_id
            st.integers(min_value=0, max_value=10**6),  # ts_ms
            st.integers(min_value=-999, max_value=999),  # value cents
        ),
        min_size=0,
        max_size=24,
    ),
    cut=st.integers(min_value=0, max_value=100),
)
@pytest.mark.slow
def test_merge_agg_states_property(spark, rows, cut):
    """Property: for ANY event set and ANY split point,
    merge(state(base), state(delta)) == state(all) — the monoid law the
    incremental-maintenance query relies on."""
    data = [
        (uid, i, ts, cents / 100.0) for i, (uid, ts, cents) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        data, "user_id: long, event_id: long, ts_ms: long, value: double"
    ) if data else spark.createDataFrame(
        [], "user_id: long, event_id: long, ts_ms: long, value: double"
    )
    base = ev.filter(F.col("event_id") < cut % (len(data) + 1))
    delta = ev.subtract(base)
    merged = merge_agg_states(agg_state(base), agg_state(delta))
    whole = agg_state(ev)
    key = lambda r: (r.user_id, r.n_events, float(r._sum_dec), r.last_ts_ms,
                     r.last_event_id)
    assert sorted(map(key, merged.collect())) == sorted(
        map(key, whole.collect())
    )


@settings(max_examples=50, deadline=None)
@given(
    x=st.integers(min_value=0, max_value=0xFFFF),
    y=st.integers(min_value=0, max_value=0xFFFF),
)
def test_zorder_key_roundtrip_property(x, y):
    """Property: the Morton interleave is a bijection — de-interleaving the
    key recovers both coordinates exactly (driver-side arithmetic mirror of
    the column expression, itself exact-matched in the value tests)."""
    z = _z_ref(x, y)
    rx = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (rx, ry) == (x, y)
