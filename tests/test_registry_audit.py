"""Whole-registry invariants: every registered query's physical plan is free
of row-at-a-time Python and of undeclared cartesian products, and the
rows-only queries actually produce evidence rows. The per-query plan tests
(test_plans.py) pin the interesting shapes; this audit catches a regression
sneaking into ANY of the 85 registered queries."""

from __future__ import annotations

import pytest

from cdc_worker_spark.plans import all_oracles, all_queries

#: the one query whose cartesian product is the declared semantics
ALLOWED_CARTESIAN = {"q_join_cross"}

#: rows-only queries expected to return 0 rows at fixture scale by design
EMPTY_BY_DESIGN = {"q_dedup_embedding"}


def test_no_rowwise_python_or_undeclared_cartesian(spark, sf_dir):
    failures = []
    for name, builder in sorted(all_queries().items()):
        plan = builder(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: row-at-a-time BatchEvalPython")
        if name not in ALLOWED_CARTESIAN and "CartesianProduct" in plan:
            failures.append(f"{name}: undeclared CartesianProduct")
    assert not failures, "\n".join(failures)


def test_rows_only_queries_produce_evidence(spark, sf_dir):
    """A rows-only correctness check is only evidence if rows exist — catch a
    rows-only query silently degenerating to empty output."""
    oracles = all_oracles()
    for name, builder in sorted(all_queries().items()):
        if name in oracles or name in EMPTY_BY_DESIGN:
            continue
        n = builder(spark, sf_dir).count()
        assert n > 0, f"rows-only query {name} returned 0 rows at fixture scale"
