"""Dynamic partition pruning evidence (the 100 TB fact-table contract).

A date/key-partitioned fact joined to a filtered dimension must scan ONLY
the fact partitions the dimension's surviving keys name — Catalyst injects
a runtime `dynamicpruning` subquery into the fact scan. At 100 TB this is
the difference between reading one day and reading the lake. Plan-asserted
AND result-verified here, because a silently-degraded DPP (e.g. a config
regression or a non-deterministic expression blocking the filter) would
still return correct rows — just catastrophically slower.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory) -> str:
    """events re-written partitioned by event day (the production layout
    for a CDC event log: one directory per day)."""
    from cdc_worker_spark.sources.tables import load_events_ms

    out = str(tmp_path_factory.mktemp("events_by_day"))
    ev = load_events_ms(spark, sf_dir).withColumn(
        "day", F.date_format(F.timestamp_millis(F.col("ts_ms")), "yyyy-MM-dd")
    )
    ev.select("event_id", "user_id", "event_type", "value", "ts_ms", "day").write.partitionBy(
        "day"
    ).mode("overwrite").parquet(out)
    return out


def _dim_days(spark, fact):
    """A small 'dimension' naming 3 of the fact's partition days — the
    broadcast side whose surviving keys should prune the fact scan."""
    days = [r["day"] for r in fact.select("day").distinct().orderBy("day").limit(3).collect()]
    return spark.createDataFrame([(d, "keep") for d in days], ["day", "tag"]), days


def test_dpp_injects_runtime_partition_filter(spark, partitioned_events):
    fact = spark.read.parquet(partitioned_events)
    dim, days = _dim_days(spark, fact)
    joined = fact.join(dim.filter(F.col("tag") == "keep"), "day").groupBy("day").agg(
        F.count("*").alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # result correctness: counts equal the per-day counts of the kept days
    got = {r["day"]: r["n"] for r in joined.collect()}
    want = {
        r["day"]: r["n"]
        for r in fact.filter(F.col("day").isin(days)).groupBy("day").agg(F.count("*").alias("n")).collect()
    }
    assert got == want and set(got) == set(days)


def test_dpp_filter_reaches_the_fact_scan_partition_filters(spark, partitioned_events):
    """The dynamicpruningexpression must sit INSIDE the fact scan's
    PartitionFilters (not merely appear somewhere in the plan) — that is
    the line that turns into 'skip the other N-3 day directories' at
    execution. Requires a selective dim filter: an unfiltered dim
    correctly plans NO pruning (also asserted, as the negative control)."""
    import re

    fact = spark.read.parquet(partitioned_events)
    n_days_total = fact.select("day").distinct().count()
    dim, days = _dim_days(spark, fact)
    assert n_days_total > len(days)  # pruning would be non-trivial

    pruned = fact.join(dim.filter(F.col("tag") == "keep"), "day").groupBy("day").count()
    pruned.collect()
    text = pruned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*dynamicpruning", text, re.I), (
        text[:2000]
    )

    # negative control: no dim filter -> Catalyst correctly skips DPP
    plain = fact.join(dim, "day").groupBy("day").count()
    plain.collect()
    text2 = plain._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"PartitionFilters: \[[^\]]*dynamicpruning", text2, re.I)
