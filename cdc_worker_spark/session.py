"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the configs
below are chosen so the same logical plans scale to a multi-executor cluster:
AQE handles runtime re-planning (coalescing post-shuffle partitions, skew-join
splitting), shuffle partitions sized for the test scale, and Arrow enabled so
any pandas-UDF path is batched, never per-row.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "cdc-worker-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Runtime re-planning: partition coalescing + skew-join splitting.
        # At 100 TB this is what turns a static 32-partition plan into one
        # sized by actual shuffle bytes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Sized for local test SFs; a cluster deployment would raise this to
        # ~2-3x total cores (AQE coalesces the excess).
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas_udf / applyInPandas path (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Push IN filters with up to this many values down to parquet as
        # point predicates (default 10, above which Spark degrades to a
        # useless min/max range for spread keys). The incremental-label
        # fold's delta-endpoint lookups rely on this + doc_id-sorted row
        # groups to prune the corpus-scale label scan (cluster_incr r11).
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "4096")
        # r13 (VERDICT r12 next #4 — converge the join policy): the bench
        # session has preferred shuffled-hash joins since r12 (guide §9
        # batch-ETL baseline: SHJ skips both SMJ sort passes; the planner's
        # choice stays size-gated by canBuildLocalHashMap, and operators
        # that must never hash-build an O(corpus) side pin SMJ explicitly
        # with .hint("merge")). The verified path (tests, oracle contract,
        # invariants sweeps) now exercises the same plans — split-brain
        # config retired. Same explicit escape hatch as bench.py for
        # deployments with unreliable statistics.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            "true"
            if os.environ.get("SPARK_GRAFT_PREFER_SMJ", "").lower()
            in ("1", "true", "yes")
            else "false",
        )
        .getOrCreate()
    )
