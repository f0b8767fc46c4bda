"""Degenerate-input sweep: EVERY registered query must plan and execute
against completely empty (but correctly-typed) fixture tables.

Empty partitions are routine at 100 TB (a fresh tenant, a filtered branch,
a time window before first ingest); an operator that crashes on zero rows
— an unguarded collect()[0], a sequence(0, -1) step inference, a
centroids[0] on an untrained index — is a production incident, not an edge
case. One sweep, all queries."""

from __future__ import annotations

import os

import pytest

from cdc_worker_spark.plans import all_queries
from cdc_worker_spark.sources.tables import TABLES, load_table


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(0).write.parquet(
            os.path.join(out, f"{t}.parquet")
        )
    return out


@pytest.mark.slow
def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, builder in sorted(all_queries().items()):
        try:
            builder(spark, empty_sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001 — collecting the full list
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
    assert not failures, "\n".join(failures)
