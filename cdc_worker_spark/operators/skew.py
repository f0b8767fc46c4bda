"""Skew-mitigation utilities (SCALE.md "Joins": structural salting for
known-hot keys, complementing AQE's runtime skew-join splitting).

The reference never faces skew (one worker, serial per-topic apply), but at
100 TB a hot entity (one Salesforce object producing most change events, one
document cluster in dedup) concentrates a shuffle partition. AQE splits
oversized partitions for sort-merge joins; these helpers handle the cases AQE
can't: hot keys in aggregations entering a single reducer, and salted
replication for joins where the hot side must stay distributed.

Both transforms are equivalence-preserving — tests assert result equality
with the unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decomposable aggregates: name -> (stage-1 fn, stage-2 merge fn).
#: count merges as SUM of partial counts; avg must be derived as sum/count by
#: the caller (it is not directly mergeable).
_AGG_FNS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _row_salt(n_salts: int):
    """Deterministic-enough per-row salt: hash of the physical row position.
    Any row-to-salt assignment preserves aggregate correctness; spreading is
    what matters."""
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation through a salt: stage 1 aggregates on
    (keys, salt) — a hot key spreads over n_salts reducers — stage 2 merges
    the partials on keys alone.

    ``specs``: (fn, column, alias) with fn in sum|count|min|max; pass
    column ``"*"`` with ``count`` for a SQL count(*) (row count, not
    non-null count — the stage-2 merge is still a SUM of partials).

    Note Spark's own map-side partial aggregation already handles most skew
    for aggregates; reach for this only when the per-key FINAL state is the
    bottleneck (e.g. count-distinct rewritten as two-level exact distinct).
    """
    for fn, _, _ in specs:
        if fn not in _AGG_FNS:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    stage1 = (
        df.withColumn("_salt", _row_salt(n_salts))
        .groupBy(*keys, "_salt")
        .agg(*[_AGG_FNS[fn][0](col).alias(alias) for fn, col, alias in specs])
    )
    return stage1.groupBy(*keys).agg(
        *[_AGG_FNS[fn][1](alias).alias(alias) for fn, _, alias in specs]
    )


#: join types for which replicating the dim side n_salts-fold preserves
#: semantics: every output row is driven by a fact row, so unmatched DIM
#: rows never surface. right/full outer would emit each unmatched dim row
#: once per salt replica — silently wrong — so they are rejected.
_SALT_SAFE_JOINS = {"inner", "left", "left_outer", "leftouter", "left_semi",
                    "leftsemi", "semi", "left_anti", "leftanti", "anti"}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: the fact side gets a per-row salt, the dim side is
    replicated n_salts times (explode of a literal sequence), and the join
    runs on (key, salt): a hot fact key now spreads across n_salts shuffle
    partitions. The dim side grows n_salts-fold — use where broadcast is too
    big but replication is affordable (the classic skew-join rewrite).

    Only fact-driven join types are accepted (see _SALT_SAFE_JOINS)."""
    if how.lower() not in _SALT_SAFE_JOINS:
        raise ValueError(
            f"salted_join does not preserve {how!r} semantics: the replicated "
            "dim side would emit unmatched dim rows once per salt. Use "
            "inner/left/left_semi/left_anti, or salt the other side."
        )
    salted_fact = fact.withColumn("_salt", _row_salt(n_salts))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(salted_dim, on=[key, "_salt"], how=how).drop("_salt")
