"""Time-series operators over the CDC event stream: gap-filled regular
grids, forward-fill and linear interpolation, OHLC-style downsampling,
incremental aggregate maintenance, and the Z-order layout key.

Reference parity: the reference (bai-admin/cdc-worker) delivers a raw change
stream and leaves downstream rollups to consumers; its design doc's staleness
/ windowed-consumption semantics (Node-based_Salesforce_PubSub_Setup.md
:306, :1325-1348 — D6) imply exactly these per-entity time-grid reductions.
The operators here are the standard analytic surface any consumer of that
stream builds next (resample, fill, interpolate, maintain aggregates
incrementally), expressed Spark-first.

Scale design (100 TB):
- The daily grid is generated per entity with ``sequence()`` + ``explode`` —
  a pure projection whose output is bounded by (entities x days in span),
  never a driver loop or a cross join against a calendar table.
- Fill/interpolation are single-exchange window ops on the entity key; the
  daily pre-aggregation shrinks the windowed input to one row per
  (entity, day) before any window runs.
- Incremental maintenance merges PARTIAL aggregate states (count/sum/max are
  all mergeable), so refreshing a materialized rollup shuffles only the
  delta batch + the state table — never a rescan of the base fact. This is
  the batch twin of the streaming state store's latest-wins MERGE
  (streaming/pipeline.py).
- The Z-order key is 32 shift-and-mask expressions, fully codegen'd, no UDF;
  production writes sort by it (``repartitionByRange(zkey)`` +
  ``sortWithinPartitions``) so parquet row-group min/max skipping works on
  BOTH joined dimensions of a two-dimensional predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_events_ms, load_table

_DAY_MS = 86_400_000


def _daily(ev: DataFrame) -> DataFrame:
    """One row per (user_id, day): event count + exact decimal day total.

    The decimal cast makes the sum associative-exact so Spark and the oracle
    agree bit-for-bit regardless of partial-aggregation order (registry
    determinism rule #2)."""
    day_ms = (F.col("ts_ms") - F.col("ts_ms") % _DAY_MS).alias("day_ms")
    return ev.groupBy("user_id", day_ms).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("day_value"),
    )


def daily_spine(daily: DataFrame) -> DataFrame:
    """Dense per-entity day grid spanning [min day, max day] of that entity.

    ``sequence`` + ``explode`` keeps grid generation a projection over the
    per-entity span row — output volume is entities x span-days, and the
    only exchange is the span aggregation itself."""
    spans = daily.groupBy("user_id").agg(
        F.min("day_ms").alias("_lo"), F.max("day_ms").alias("_hi")
    )
    return spans.select(
        "user_id",
        F.explode(F.sequence("_lo", "_hi", F.lit(_DAY_MS))).alias("day_ms"),
    )


_GAPFILL_SQL = f"""
    WITH daily AS (
      SELECT user_id, (epoch_ms(ts) // {_DAY_MS}) * {_DAY_MS} AS day_ms,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT user_id,
             unnest(generate_series(min(day_ms), max(day_ms), {_DAY_MS}))
               AS day_ms
      FROM daily GROUP BY user_id
    )
    SELECT s.user_id, s.day_ms,
           COALESCE(d.n_events, 0) AS n_events,
           last_value(d.day_value IGNORE NULLS)
             OVER (PARTITION BY s.user_id ORDER BY s.day_ms
                   ROWS UNBOUNDED PRECEDING) AS day_value_ff,
           d.day_value IS NULL AS is_gap
    FROM spine s LEFT JOIN daily d USING (user_id, day_ms)
"""


@query("q_ts_gapfill", oracle=_GAPFILL_SQL)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize an irregular event stream onto a dense per-entity daily
    grid and forward-fill the measure across gap days (the classic
    time-series ``resample().ffill()``, distributed). Grid days with no
    events carry the previous observed day's total and ``is_gap = true``."""
    daily = _daily(load_events_ms(spark, sf_dir))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        daily_spine(daily)
        .join(daily, ["user_id", "day_ms"], "left")
        .select(
            "user_id",
            "day_ms",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("day_value", ignorenulls=True).over(w).alias("day_value_ff"),
            F.col("day_value").isNull().alias("is_gap"),
        )
    )


_INTERP_SQL = f"""
    WITH daily AS (
      SELECT user_id, (epoch_ms(ts) // {_DAY_MS}) * {_DAY_MS} AS day_ms,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT user_id,
             unnest(generate_series(min(day_ms), max(day_ms), {_DAY_MS}))
               AS day_ms
      FROM daily GROUP BY user_id
    ),
    ctx AS (
      SELECT s.user_id, s.day_ms, d.day_value,
             last_value(d.day_value IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.day_ms
                     ROWS UNBOUNDED PRECEDING) AS prev_v,
             last_value(CASE WHEN d.day_value IS NOT NULL THEN s.day_ms END
                        IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.day_ms
                     ROWS UNBOUNDED PRECEDING) AS prev_d,
             first_value(d.day_value IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.day_ms
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_v,
             first_value(CASE WHEN d.day_value IS NOT NULL THEN s.day_ms END
                         IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.day_ms
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_d
      FROM spine s LEFT JOIN daily d USING (user_id, day_ms)
    )
    SELECT user_id, day_ms,
           round(CASE
             WHEN day_value IS NOT NULL THEN day_value
             WHEN prev_v IS NULL THEN next_v
             WHEN next_v IS NULL THEN prev_v
             ELSE prev_v + (next_v - prev_v)
                  * ((day_ms - prev_d) / CAST(next_d - prev_d AS DOUBLE))
           END, 6) AS day_value_interp,
           day_value IS NULL AS is_interpolated
    FROM ctx
"""


@query("q_ts_interp", oracle=_INTERP_SQL)
def q_ts_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across grid gaps: a missing day gets the value
    linearly blended between its nearest observed neighbors (time-weighted);
    leading/trailing gaps clamp to the nearest observation. Same single
    entity-key exchange as the forward fill — both direction context columns
    come from ONE window partitioning, two frames."""
    daily = _daily(load_events_ms(spark, sf_dir)).drop("n_events")
    back = (
        Window.partitionBy("user_id")
        .orderBy("day_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("day_ms")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_value").isNotNull(), F.col("day_ms"))
    ctx = (
        daily_spine(daily)
        .join(daily, ["user_id", "day_ms"], "left")
        .select(
            "user_id",
            "day_ms",
            "day_value",
            F.last("day_value", ignorenulls=True).over(back).alias("prev_v"),
            F.last(obs_day, ignorenulls=True).over(back).alias("prev_d"),
            F.first("day_value", ignorenulls=True).over(fwd).alias("next_v"),
            F.first(obs_day, ignorenulls=True).over(fwd).alias("next_d"),
        )
    )
    frac = (F.col("day_ms") - F.col("prev_d")) / (
        (F.col("next_d") - F.col("prev_d")).cast("double")
    )
    interp = (
        F.when(F.col("day_value").isNotNull(), F.col("day_value"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
    )
    return ctx.select(
        "user_id",
        "day_ms",
        F.round(interp, 6).alias("day_value_interp"),
        F.col("day_value").isNull().alias("is_interpolated"),
    )


_OHLC_SQL = f"""
    WITH t AS (
      SELECT user_id, (epoch_ms(ts) // {_DAY_MS}) * {_DAY_MS} AS day_ms, value,
             row_number() OVER (
               PARTITION BY user_id, (epoch_ms(ts) // {_DAY_MS}) * {_DAY_MS}
               ORDER BY epoch_ms(ts), event_id) AS ra,
             row_number() OVER (
               PARTITION BY user_id, (epoch_ms(ts) // {_DAY_MS}) * {_DAY_MS}
               ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rd
      FROM events)
    SELECT user_id, day_ms,
           max(CASE WHEN ra = 1 THEN value END) AS open_value,
           max(CASE WHEN rd = 1 THEN value END) AS close_value,
           max(value) AS high_value,
           min(value) AS low_value,
           count(*) AS n_events
    FROM t GROUP BY 1, 2
"""


@query("q_ts_resample_ohlc", oracle=_OHLC_SQL)
def q_ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC-style downsample: per (entity, day) the first/last/extreme
    measure values. ``min_by``/``max_by`` on the (ts, replayId) struct pick
    open/close in the SAME single hash aggregate that computes high/low —
    one exchange total, no window pass, map-side partials for all five
    measures ((ts, event_id) is unique, so first/last are deterministic).
    The oracle expresses open/close with the two-window row_number
    formulation; Spark's plan is strictly cheaper (agg partials vs two
    full window sorts)."""
    ev = load_events_ms(spark, sf_dir)
    day_ms = (F.col("ts_ms") - F.col("ts_ms") % _DAY_MS).alias("day_ms")
    key = F.struct("ts_ms", "event_id")
    return ev.groupBy("user_id", day_ms).agg(
        F.min_by("value", key).alias("open_value"),
        F.max_by("value", key).alias("close_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.count("*").alias("n_events"),
    )


def agg_state(ev: DataFrame) -> DataFrame:
    """Mergeable per-entity aggregate state: (count, exact decimal sum, max
    ts, max replayId). Every component is a commutative monoid, which is
    what makes the incremental MERGE below exact."""
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("_sum_dec"),
        F.max("ts_ms").alias("last_ts_ms"),
        F.max("event_id").alias("last_event_id"),
    )


def merge_agg_states(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two aggregate-state tables (full outer on the entity key,
    component-wise monoid combine). Cost is O(|state| + |delta|) — the base
    FACT table is never rescanned; this is how a 100 TB rollup stays fresh
    under CDC without nightly recomputes."""
    zero = F.lit(0).cast("decimal(28,2)")
    b, d = base.alias("b"), delta.alias("d")
    return b.join(d, "user_id", "full").select(
        "user_id",
        (
            F.coalesce(F.col("b.n_events"), F.lit(0))
            + F.coalesce(F.col("d.n_events"), F.lit(0))
        ).alias("n_events"),
        (
            F.coalesce(F.col("b._sum_dec").cast("decimal(28,2)"), zero)
            + F.coalesce(F.col("d._sum_dec").cast("decimal(28,2)"), zero)
        ).alias("_sum_dec"),
        F.greatest(F.col("b.last_ts_ms"), F.col("d.last_ts_ms")).alias(
            "last_ts_ms"
        ),
        F.greatest(F.col("b.last_event_id"), F.col("d.last_event_id")).alias(
            "last_event_id"
        ),
    )


@query(
    "q_cdc_incr_agg",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           max(epoch_ms(ts)) AS last_ts_ms,
           max(event_id) AS last_event_id
    FROM events GROUP BY user_id
    """,
)
def q_cdc_incr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: per-entity rollup
    kept fresh by merging the PARTIAL aggregate state of a delta batch into
    the stored state — the aggregate twin of the latest-wins upsert (D1) and
    the reason CDC beats nightly recompute at 100 TB. The fixture split (base
    = replayId <= max/2, delta = the rest) replays a checkpointed refresh;
    the ORACLE is the naive full recompute, so the hash match IS the proof
    that merge(state(base), state(delta)) == state(all)."""
    ev = load_events_ms(spark, sf_dir)
    # checkpoint the 1-row cutoff: both branch joins consume it, and each
    # would otherwise re-plan the max() scan (4 event scans in the plan)
    cutoff = ev.agg(
        (F.max("event_id") / 2).cast("bigint").alias("c")
    ).localCheckpoint(eager=False)
    base = ev.join(F.broadcast(cutoff), ev.event_id <= cutoff.c).drop("c")
    delta = ev.join(F.broadcast(cutoff), ev.event_id > cutoff.c).drop("c")
    return merge_agg_states(agg_state(base), agg_state(delta)).select(
        "user_id",
        "n_events",
        F.col("_sum_dec").cast("double").alias("total_value"),
        "last_ts_ms",
        "last_event_id",
    )


_Z_BITS = 16


def zorder_key_n(cols: list[Column], bits: int = _Z_BITS) -> Column:
    """Round-robin bit interleave of N int columns into one Z-order
    (Morton) key: bit i of column j lands at position i*N + j. Pure
    shift/mask expressions — codegen'd, branch-free, no UDF; N*bits must
    stay under 63. Columns should be domain-normalized to comparable bit
    widths first (see ``sources.layout.scaled_zorder_key``) or the widest
    column monopolizes the high bits."""
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key(x: Column, y: Column, bits: int = _Z_BITS) -> Column:
    """Two-column Z-order key: bit i of x at 2i, bit i of y at 2i+1 (the
    N=2 case of :func:`zorder_key_n`)."""
    return zorder_key_n([x, y], bits=bits)


def _zorder_sql(x: str, y: str, bits: int = _Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "q_layout_zorder",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           {_zorder_sql("l_partkey", "l_suppkey")} AS zkey
    FROM lineitem
    ORDER BY zkey, l_orderkey, l_linenumber
    LIMIT 1000
    """,
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey) — the
    layout-optimization primitive: writing a 100 TB table ordered by this
    key (``repartitionByRange("zkey")`` + ``sortWithinPartitions``) gives
    parquet row-group min/max skipping on BOTH dimensions, where a plain
    sort serves only its leading column. The query itself returns the first
    1000 rows in Z order (totally ordered — plans as
    TakeOrderedAndProject, no global sort materialization)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            zorder_key(F.col("l_partkey"), F.col("l_suppkey")).alias("zkey"),
        )
        .orderBy("zkey", "l_orderkey", "l_linenumber")
        .limit(1000)
    )
