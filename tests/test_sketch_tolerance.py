"""Tolerance gates for the two sketch-based aggregate paths (VERDICT r02
item 6 / r03 next #6): the approx operators are rows-only in the driver
artifact (sketch estimates are engine-specific), so these tests pin them to
their EXACT twins within the algorithms' published error bounds — the
evidence that the 100 TB-scale paths estimate the right quantities, not just
run.
"""

from __future__ import annotations

import pytest

from cdc_worker_spark.plans.registry import all_queries

# sf0.01 has real cardinalities (~1.5k custkeys, 40k events) so the relative
# error bounds are meaningful; sf0.001 groups are too small to exercise the
# sketches beyond their exact-small-set regimes.
SF_001 = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    """approx_count_distinct(rsd=0.02) must land within a few standard
    errors of exact COUNT(DISTINCT) per group. HLL++ guarantees relative
    standard deviation <= rsd; 5x rsd (=10%) is a >5-sigma gate that still
    fails hard on any wiring bug (wrong column, wrong group)."""
    qs = all_queries()
    exact = {
        r.o_orderpriority: r.n_cust
        for r in qs["q_agg_distinct"](spark, SF_001).collect()
    }
    approx = {
        r.o_orderpriority: r.approx_n_cust
        for r in qs["q_agg_approx_distinct"](spark, SF_001).collect()
    }
    assert set(exact) == set(approx)
    for grp, n in exact.items():
        assert n > 100, f"group {grp} too small to gate ({n})"
        rel_err = abs(approx[grp] - n) / n
        assert rel_err <= 5 * 0.02, (
            f"{grp}: approx {approx[grp]} vs exact {n} (rel_err {rel_err:.4f})"
        )


def test_approx_percentile_within_accuracy(spark):
    """percentile_approx(accuracy=10000) must land within the quantile-rank
    bound: the returned value's true rank is within 1/accuracy of the target
    quantile. Gate: the approx value falls between the exact quantiles at
    q +/- 5/accuracy (a loose multiple of the guarantee that still catches
    wrong-column / wrong-quantile wiring)."""
    from cdc_worker_spark.sources.tables import load_events_ms
    from pyspark.sql import functions as F

    qs = all_queries()
    approx = {
        r.event_type: (r.p50_approx, r.p95_approx)
        for r in qs["q_agg_approx_percentile"](spark, SF_001).collect()
    }
    slack = 5.0 / 10000
    ev = load_events_ms(spark, SF_001)
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5 - slack)).alias("p50_lo"),
        F.percentile("value", F.lit(0.5 + slack)).alias("p50_hi"),
        F.percentile("value", F.lit(0.95 - slack)).alias("p95_lo"),
        F.percentile("value", F.lit(0.95 + slack)).alias("p95_hi"),
    )
    rows = {r.event_type: r for r in bounds.collect()}
    assert set(rows) == set(approx)
    for et, (p50a, p95a) in approx.items():
        b = rows[et]
        assert b.p50_lo <= p50a <= b.p50_hi, (
            f"{et}: p50 approx {p50a} outside [{b.p50_lo}, {b.p50_hi}]"
        )
        assert b.p95_lo <= p95a <= b.p95_hi, (
            f"{et}: p95 approx {p95a} outside [{b.p95_lo}, {b.p95_hi}]"
        )
