"""Batch table loaders over the driver-generated parquet fixtures.

Scan efficiency notes (100 TB design): every query builder projects/filters on
top of ``spark.read.parquet`` so Catalyst pushes predicates and prunes columns
into the parquet scan itself (verify with ``.explain`` -> ``PushedFilters`` /
``ReadSchema``). Nothing in this module collects to the driver.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession

#: every fixture table the driver pre-registers as a DuckDB view (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table (SURVEY §2.3 q_scan_*).

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) — which Spark
    rejects unless ``nanosAsLong`` reads it as int64 nanoseconds — and as
    TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ). The flag is harmless
    when no nanos column exists; ``functions.exprs.ts_ms_col`` branches on
    the actual type for the epoch-ms view.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _tune_for_heap(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _tune_for_heap(spark: SparkSession) -> None:
    """Memory-aware engine knobs for sessions the engine did not build.

    The contract hands the engine an arbitrary SparkSession — including
    Spark's vanilla 1 GB heap, where in local mode that single heap is
    simultaneously the driver AND every executor. Two defaults are sized
    for multi-GB executors and concretely OOM a 1 GB JVM on the sf1 sweep:

    - AQE's 64 MB post-shuffle partition target makes each task's
      hash-agg spill-merge fan-in (one ~1 MB reader buffer per spill file)
      scale past the per-task memory slice (measured: HashAggregateExec
      finishAggregate OOM in q_dedup_ngram_jaccard at sf1);
    - the 10 MB broadcast threshold admits build sides whose in-memory
      hash relation is several times their compressed estimate.

    Both are runtime-settable SQL confs, so when the heap is small the
    engine shrinks them — the same sizing a cluster deployment would do
    per-executor-GB. Sessions with normal executor memory (>= 4 GB heap)
    keep Spark's defaults; user-set values are never overridden (the knob
    is only touched while it still holds its default — a user who
    explicitly re-set a knob to its default is indistinguishable, which
    is why every change is logged once and the whole pass is disabled by
    ``SPARK_GRAFT_NO_HEAP_TUNE=1``; see README "Small-heap sessions")."""
    if os.environ.get("SPARK_GRAFT_NO_HEAP_TUNE", "") == "1":
        return
    try:
        max_heap = int(
            spark._jvm.java.lang.Runtime.getRuntime().maxMemory()  # noqa: SLF001
        )
    except Exception:  # pragma: no cover — Connect or restricted gateway
        return
    if max_heap >= 4 * 1024**3:
        return
    adv = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    if spark.conf.get(adv, "64MB") in ("64MB", "64m", "67108864b", "67108864"):
        _set_logged(spark, adv, "8m")
    # parallelismFirst makes AQE coalesce to ~defaultParallelism partitions
    # regardless of the advisory size (min partition size 1 MB) — exactly
    # wrong at small heap: 8 fat post-shuffle partitions of compressed text
    # decompress past the per-task memory slice. Respect the advisory.
    pf = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    if spark.conf.get(pf, "true") == "true":
        _set_logged(spark, pf, "false")
    thr = "spark.sql.autoBroadcastJoinThreshold"
    if spark.conf.get(thr, "10MB") in ("10MB", "10m", "10485760b", "10485760"):
        _set_logged(spark, thr, "4m")
    # scan tasks are where map-side partial aggregation happens; a 128 MB
    # scan split of compressed parquet can explode (shingle/pair
    # generation) into dozens of sort spills whose MERGE allocates one
    # read-ahead buffer per spill file — the measured q_graph_pagerank OOM
    # at sf1. Smaller splits bound the per-task spill fan-in.
    mpb = "spark.sql.files.maxPartitionBytes"
    if spark.conf.get(mpb, "128MB") in ("128MB", "128m", "134217728b", "134217728"):
        _set_logged(spark, mpb, "16m")


#: knobs _tune_for_heap has already announced this process (log ONCE per
#: conf key, not once per load_table call — load_table runs per query)
_TUNE_LOGGED: set = set()


def _set_logged(spark: SparkSession, key: str, value: str) -> None:
    """Set a small-heap SQL conf and say so once on stderr, so the session
    owner can tell an engine override from an unset default (ADVICE r6)."""
    spark.conf.set(key, value)
    if key not in _TUNE_LOGGED:
        _TUNE_LOGGED.add(key)
        print(
            f"[cdc_worker_spark] small-heap session (<4 GB): set {key}={value} "
            "(disable with SPARK_GRAFT_NO_HEAP_TUNE=1)",
            file=sys.stderr,
        )


def load_events_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts_ms`` (epoch milliseconds BIGINT) added.

    CDC queries treat events as the change stream: event_id -> replayId,
    user_id -> recordId, event_type -> topic/changeType (FIXTURES.md §B).
    """
    from cdc_worker_spark.functions.exprs import ts_ms_col

    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts_ms", ts_ms_col(ev.schema["ts"].dataType))


#: interchange formats the engine reads/writes besides the parquet fixtures
SUPPORTED_FORMATS = ("parquet", "orc", "json", "csv")


def export_table(
    spark: SparkSession, sf_dir: str, name: str, out_path: str, fmt: str
) -> None:
    """Materialize a fixture table in another storage format — the seam a
    user with ORC/JSON/CSV data plugs into. CSV keeps a header; all formats
    overwrite."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"format {fmt!r} not in {SUPPORTED_FORMATS}")
    writer = load_table(spark, sf_dir, name).write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(out_path)


def load_path(
    spark: SparkSession, path: str, fmt: str, schema=None
) -> DataFrame:
    """Read a table from any supported format. Pass the authoritative
    ``schema`` for the text formats (JSON/CSV) — schema inference is a
    sampling scan plus type guessing, both of which a 100 TB pipeline
    avoids; columnar formats carry their own schema."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"format {fmt!r} not in {SUPPORTED_FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(path)


class Catalog:
    """Attribute-style access to the fixture tables of one scale factor.

    >>> t = Catalog(spark, "/root/testdata/sf0.001")
    >>> t.lineitem.join(t.orders, ...)
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return load_table(self._spark, self._sf_dir, name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so the engine is usable
    from plain ``spark.sql`` — the same names the driver pre-registers in
    DuckDB, so any oracle SQL in this repo also runs verbatim via
    ``spark.sql`` (modulo dialect). Views are lazy scans; pushdown and
    pruning behave exactly as the DataFrame loaders."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
