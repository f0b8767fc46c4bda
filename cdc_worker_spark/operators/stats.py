"""Statistical & long-tail SQL-surface operators (round 5).

The reference's downstream consumers are warehouse users (SURVEY §2.2);
these are the next ring of SQL a user switching engines reaches for:
correlation/regression aggregates, conditional aggregates, positional
window navigation, lateral explodes, and exponentially-weighted smoothing.

Cross-engine determinism notes:
- corr/covar/regr_*: both engines compute the two-pass-stable forms; results
  are rounded to 6 dp on BOTH sides so the last-ulp of different summation
  orders cannot flip the hash.
- EWMA: the weighted-prefix closed form sum(x_j*a^-j)*a^i overflows double
  for long series; restrict the frame to the trailing W rows so the weight
  ratio spans at most a^W — numerically identical on both engines.
- nth_value: Spark's default frame is RANGE UNBOUNDED PRECEDING..CURRENT
  ROW, DuckDB's nth_value needs the full-partition frame spelled out; both
  sides use explicit ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
  FOLLOWING.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_events_ms, load_table


@query(
    "q_agg_corr_regr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qp,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation, sample
    covariance, and the least-squares price~quantity line. All five are
    single-pass mergeable aggregates (partial moment tuples combine
    map-side), so the shuffle carries O(groups) moment rows — the same
    scale shape as sum/count. 6-dp rounding pins the cross-engine hash."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("covar_qp"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias("intercept"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT event_type,
           CAST(count(*) FILTER (WHERE value > 50)  AS BIGINT) AS n_high,
           CAST(count(*) FILTER (WHERE value <= 50) AS BIGINT) AS n_low,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 99)  AS any_extreme,
           round(avg(value) FILTER (WHERE event_type <> 'click'), 6)
             AS avg_nonclick
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation surface: count_if / FILTER-ed aggregates and
    the boolean reducers (every/some). One hash agg — the predicates live
    INSIDE the aggregate expressions, so there is exactly one pass and one
    shuffle regardless of how many conditions are stacked (vs the
    self-join-per-condition anti-pattern)."""
    ev = load_events_ms(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 50).alias("n_high"),
        F.count_if(F.col("value") <= 50).alias("n_low"),
        F.every(F.col("value") >= 0).alias("all_nonneg"),
        F.some(F.col("value") > 99).alias("any_extreme"),
        F.round(
            F.avg(F.when(F.col("event_type") != "click", F.col("value"))), 6
        ).alias("avg_nonclick"),
    )


@query(
    "q_win_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window navigation: first/last/nth order value per
    customer over the full partition. The explicit unbounded ROWS frame is
    what makes last_value/nth_value well-defined AND identical across
    engines (both default to current-row-bounded frames otherwise). One
    exchange on the partition key."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "q_lateral_explode",
    oracle="""
    SELECT d.doc_id, ws[i] AS word, CAST(i - 1 AS INT) AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents WHERE lang = 'en') d,
         LATERAL unnest(range(1, len(ws) + 1)) AS t(i)
    WHERE length(ws[i]) >= 8
    """,
)
def q_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW / posexplode: one row per (doc, token, position) with a
    post-explode filter. The explode is a Generate node fed by a pure
    projection — no shuffle at all; the length filter applies after
    generation but Catalyst pushes the lang filter INTO the scan. The
    0-based position matches the oracle's 1-based subscript minus one."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        d.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
        )
        .filter(F.length("word") >= 8)
        .select("doc_id", "word", F.col("pos").cast("int").alias("pos"))
    )


@query(
    "q_ts_ewma",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, value,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS BIGINT) AS rn
      FROM events WHERE event_type = 'purchase'
    )
    SELECT s.user_id, s.event_id, s.value,
           round(sum(t.value * power(0.8, s.rn - t.rn))
                 / sum(power(0.8, s.rn - t.rn)), 6) AS ewma
    FROM seq s
    JOIN seq t
      ON t.user_id = s.user_id AND t.rn BETWEEN s.rn - 7 AND s.rn
    GROUP BY s.user_id, s.event_id, s.value
    """,
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (trailing 8 observations,
    a=0.8) per user over their purchase stream: ewma_i =
    sum_k a^k x_{i-k} / sum_k a^k, weights renormalized over the rows
    actually in the frame (series starts get shorter frames, not leaked
    zeros).

    Spark-first shape: ONE window pass — collect_list over the trailing
    ROWS frame, then higher-order functions (zip_with the frame with its
    index sequence, fold with F.aggregate) compute the weighted mean
    JVM-side with no UDF and no self-join. The oracle is the equivalent
    bounded range self-join — quadratic in frame width, which is why the
    engine's windowed form is the scale path (shuffle = one exchange on
    user_id; per-row cost O(W))."""
    a = 0.8
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(-7, 0)
    )
    ev = load_events_ms(spark, sf_dir).filter(F.col("event_type") == "purchase")
    arr = F.collect_list("value").over(w)
    n = F.size(F.col("_arr"))
    # element p (0-based) in frame order is x_{i-(n-1-p)} -> weight a^(n-1-p)
    weights = F.transform(
        F.sequence(F.lit(0), n - 1), lambda p: F.pow(F.lit(a), (n - 1) - p)
    )
    num = F.aggregate(
        F.zip_with(F.col("_arr"), weights, lambda x, wt: x * wt),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    den = F.aggregate(weights, F.lit(0.0), lambda acc, v: acc + v)
    return (
        ev.select("user_id", "event_id", "value", arr.alias("_arr"))
        .select(
            "user_id", "event_id", "value",
            F.round(num / den, 6).alias("ewma"),
        )
    )
