"""Unit tests for scripts/drive_contract.stream_compare — the streamed
verdict must match the collected path's semantics (ADVICE r6: the per-value
type fingerprint is checked on EVERY row, not a 256-row prefix, so a dtype
divergence whose first non-null pair appears deep in the result still fails)."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest


@pytest.fixture(scope="module")
def dc():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "drive_contract.py",
    )
    spec = importlib.util.spec_from_file_location("drive_contract", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["drive_contract"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("SET default_null_order='nulls_first'")
    yield c
    c.close()


def test_stream_compare_matches_identical_results(dc, spark, con):
    sdf = spark.range(300).selectExpr("id AS v")
    ok, n, why = dc.stream_compare(sdf, con, "SELECT range AS v FROM range(300)")
    assert ok and n == 300, why


def test_stream_compare_catches_dtype_split_past_prefix(dc, spark, con):
    """299 leading NULLs (nulls-first sort) push the first non-null pair to
    row 299 — past the old 256-row cutoff. Spark emits BIGINT 5, the oracle
    DOUBLE 5.0; values_equal(5, 5.0) is True, so only the type fingerprint
    can catch it, and it must."""
    sdf = spark.sql(
        "SELECT CAST(NULL AS BIGINT) AS v FROM range(299) "
        "UNION ALL SELECT CAST(5 AS BIGINT)"
    )
    ok, n, why = dc.stream_compare(
        sdf,
        con,
        "SELECT CAST(NULL AS DOUBLE) AS v FROM range(299) "
        "UNION ALL SELECT 5.0::DOUBLE",
    )
    assert not ok
    assert "type v: int != float" in str(why)


def test_stream_compare_value_mismatch_still_fails(dc, spark, con):
    sdf = spark.range(10).selectExpr("id AS v")
    ok, n, why = dc.stream_compare(
        sdf, con, "SELECT range + 1 AS v FROM range(10)"
    )
    assert not ok
