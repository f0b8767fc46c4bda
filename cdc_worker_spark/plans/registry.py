"""Query registry: the driver contract.

Every operator from SURVEY.md §2 registers here with a declared query name, a
Spark builder ``(spark, sf_dir) -> DataFrame``, and (unless genuinely
non-SQL-expressible) the equivalent DuckDB oracle SQL. ``__spark_entry__.py``
exposes the registry to the driver, which hash-compares Spark vs DuckDB
results at sf0.01.

Determinism rules for hash-matching (SURVEY §7 "what's hard"):
- alias every computed column identically in builder and oracle;
- round floating aggregates the same way on both sides (FP summation order
  differs between engines, so raw double sums differ in the last bits);
- cast DuckDB integer SUMs to BIGINT (DuckDB widens to HUGEINT, Spark stays
  LongType);
- any LIMIT/top-k query needs a total order (tie-breaker keys).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # None => rows-only check (non-SQL-expressible)
    doc: str


REGISTRY: dict[str, QuerySpec] = {}

#: modules whose import registers queries (kept explicit so import order and
#: the resulting registry are deterministic).
#:
#: ORDER MATTERS for the driver's CORRECTNESS artifact, which snapshots the
#: first 50 registry-insertion-order entries: the extension set (scalar
#: functions, UDx, dedup, similarity, text, multimodal, sampling — 37 queries)
#: and the CDC suite (10) register first so they land inside that window; the
#: relational core already has two rounds of green driver artifacts
#: (CORRECTNESS_r01/r02) and rotates to the tail.
_QUERY_MODULES = (
    "cdc_worker_spark.functions.scalar_queries",
    "cdc_worker_spark.functions.udx",
    "cdc_worker_spark.operators.dedup",
    "cdc_worker_spark.operators.similarity",
    "cdc_worker_spark.operators.text",
    "cdc_worker_spark.operators.multimodal",
    "cdc_worker_spark.operators.sampling",
    "cdc_worker_spark.operators.cdc",
    "cdc_worker_spark.operators.relational",
    "cdc_worker_spark.operators.joins",
    "cdc_worker_spark.operators.aggregates",
    "cdc_worker_spark.operators.windows",
    "cdc_worker_spark.operators.setops",
)


def query(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Decorator registering a query builder under its declared name."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, Builder]:
    _load_all()
    return {name: spec.builder for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
