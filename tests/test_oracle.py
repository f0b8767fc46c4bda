"""Differential correctness harness: every registered query vs its DuckDB
oracle — the local twin of the driver's CORRECTNESS gate (row count + column
names + order-insensitive values; exact by default, because the builders are
designed to be bitwise-deterministic across engines)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from cdc_worker_spark.plans import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # unify bytes/None representations
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v
            )
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    got = _normalize(sdf.toPandas())
    want = _normalize(duck.execute(ORACLES[name]).df())

    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert list(map(str, got.dtypes)) == list(map(str, want.dtypes)), (
        f"{name}: dtype mismatch {list(zip(got.columns, got.dtypes, want.dtypes))}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"

    mismatches = []
    for col in got.columns:
        ga, wa = got[col].tolist(), want[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(ga, wa)) if not _values_equal(x, y)
        ]
        if bad:
            mismatches.append((col, bad[:5]))
    assert not mismatches, f"{name}: value mismatches {mismatches}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    """Rows-only queries (no SQL-expressible oracle) must at least run and
    return a stable schema + deterministic rows across two executions."""
    df1 = QUERIES[name](spark, sf_dir)
    n1 = df1.count()
    df2 = QUERIES[name](spark, sf_dir)
    assert df1.schema == df2.schema
    assert n1 == df2.count()
    assert n1 >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_zscore_degenerate_groups_null_like_sql(spark):
    """Single-row groups (stddev NULL) and constant groups (stddev 0) must
    yield NULL zscores, matching the SQL window formulation (ADVICE r01)."""
    from cdc_worker_spark.functions.udx import _ZSCORE_SCHEMA, _zscore_group

    df = spark.createDataFrame(
        [(1, "solo", 5.0), (2, "const", 3.0), (3, "const", 3.0),
         (4, "vary", 1.0), (5, "vary", 3.0)],
        "event_id: long, event_type: string, value: double",
    )
    out = {
        r.event_id: r.zscore
        for r in df.groupBy("event_type")
        .applyInPandas(_zscore_group, _ZSCORE_SCHEMA)
        .collect()
    }
    assert out[1] is None          # stddev of 1 row is NULL
    assert out[2] is None and out[3] is None  # stddev 0 -> NULL, not 0.0
    assert out[4] is not None and abs(out[4] + 0.707107) < 1e-6
