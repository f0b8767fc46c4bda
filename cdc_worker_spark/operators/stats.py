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


@query(
    "q_dedup_containment",
    oracle="""
    WITH tri_all AS (
      SELECT DISTINCT doc_id, lang,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents) d,
           LATERAL unnest(range(1, greatest(len(ws) - 1, 1))) AS t(i)
    ),
    tri AS (
      SELECT doc_id, lang, g FROM tri_all
      QUALIFY count(*) OVER (PARTITION BY lang, g) <= 100
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM tri a JOIN tri b ON a.g = b.g AND a.lang = b.lang
                                   AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / least(sa.n, sb.n) AS containment
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(n_common AS DOUBLE) / least(sa.n, sb.n) >= 0.6
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (asymmetric overlap) dedup: |A∩B| / min(|A|,|B|) — the
    quote/superset detector Jaccard misses (a paragraph fully contained in
    a 100x longer doc has tiny Jaccard but containment 1.0; CCNet/Gopher
    curation treats those as duplicates of the shorter side). Same
    df-capped shingle space and single blocked self-join as
    q_dedup_ngram_jaccard — only the normalizer changes, so the scale
    shape is identical (bounded candidate buckets, integer counts, one
    double division)."""
    from cdc_worker_spark.operators.dedup import (
        df_capped_shingles,
        ngram_candidate_pairs,
        shingles_distinct,
    )

    docs = load_table(spark, sf_dir, "documents")
    # hashed gram keys through the window+join, as in q_dedup_ngram_jaccard
    tri = df_capped_shingles(
        shingles_distinct(docs).withColumn("g", F.xxhash64("g")),
        max_shingle_df=100,
    )
    sizes = tri.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = ngram_candidate_pairs(tri, max_shingle_df=None)
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    cont = F.col("n_common").cast("double") / F.least(F.col("sa.n"), F.col("sb.n"))
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", cont.alias("containment"))
        .filter(F.col("containment") >= 0.6)
    )


@query(
    "q_events_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, round(median(value), 6) AS med
      FROM events GROUP BY event_type),
    mad AS (
      SELECT e.event_type, round(median(abs(e.value - m.med)), 6) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type),
    j AS (SELECT m.event_type, m.med, d.mad
          FROM med m JOIN mad d USING (event_type))
    SELECT e.event_id, e.event_type, e.value, j.med, j.mad
    FROM events e JOIN j USING (event_type)
    WHERE abs(e.value - j.med) > 3 * 1.4826 * j.mad
    """,
)
def q_events_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flagging via Median Absolute Deviation: flag events
    more than 3 scaled-MADs from their topic's median (the robust twin of
    q_events_anomaly's z-score — a few extreme values cannot drag the
    center or inflate the spread like mean/stddev). Two groups-sized
    aggregates BROADCAST back onto projections — the event stream never
    shuffles for the flagging; medians rounded to 6 dp so both engines
    compare against bit-identical cutoffs."""
    ev = load_events_ms(spark, sf_dir)
    med = ev.groupBy("event_type").agg(
        F.round(F.median("value"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.round(F.median(F.abs(F.col("value") - F.col("med"))), 6).alias("mad")
    )
    j = F.broadcast(med.join(mad, "event_type"))
    return (
        ev.join(j, "event_type")
        .filter(F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
    )


@query(
    "q_events_entropy",
    oracle="""
    WITH b AS (
      SELECT event_type, CAST(floor(value / 10.0) AS INT) AS bin,
             count(*) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    tot AS (SELECT event_type, sum(n) AS tot FROM b GROUP BY event_type)
    SELECT b.event_type,
           CAST(count(*) AS BIGINT) AS n_bins,
           round(-sum((n / CAST(tot AS DOUBLE))
                      * ln(n / CAST(tot AS DOUBLE))), 6) AS entropy
    FROM b JOIN tot USING (event_type)
    GROUP BY b.event_type
    """,
)
def q_events_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each topic's value distribution (10-wide bins) —
    the drift/degeneracy monitor (entropy collapse = a topic's values
    stopped varying). Two stacked aggregations, both on the same
    event_type key, so the second reuses the first's partitioning; the
    shuffle carries O(topics x bins) cells. ln() is IEEE-identical across
    engines for identical double ratios; the ratio is n/tot with both
    integers exact, and the final 6-dp round absorbs summation order."""
    ev = load_events_ms(spark, sf_dir).filter(F.col("value").isNotNull())
    b = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / 10.0).cast("int").alias("bin"),
    ).agg(F.count("*").alias("n"))
    w_t = Window.partitionBy("event_type")
    p = F.col("n") / F.sum("n").over(w_t).cast("double")
    return (
        b.withColumn("_term", p * F.log(p))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_bins"),
            F.round(-F.sum("_term"), 6).alias("entropy"),
        )
    )


@query(
    "q_agg_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(GROUPING(l_returnflag) AS INT)  AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT)  AS g_status,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING / GROUPING_ID over a rollup: the bitmask that tells a
    report consumer which rows are subtotals vs detail (NULL-as-data is
    indistinguishable from NULL-as-rollup without it). Same single
    expanded aggregation as q_agg_rollup; both engines use the same
    bit convention (1 = column rolled up, first column = high bit)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count("*").alias("n"),
    ).select("l_returnflag", "l_linestatus", "gid", "g_flag", "g_status", "n")


@query(
    "q_events_autocorr",
    oracle="""
    WITH seq AS (
      SELECT event_type, value,
             lag(value) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS prev
      FROM events)
    SELECT event_type,
           round(corr(value, prev), 6) AS lag1_autocorr,
           CAST(count(prev) AS BIGINT) AS n_pairs
    FROM seq
    GROUP BY event_type
    """,
)
def q_events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each topic's value series — the
    randomness/trend monitor (near 0 = noise, near 1 = drifting metric,
    near -1 = oscillation). One window (lag over the topic's time order)
    feeding one mergeable corr aggregate; the agg reuses the window's
    event_type partitioning, so the event stream shuffles once."""
    ev = load_events_ms(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts_ms", "event_id")
    seq = ev.select(
        "event_type", "value", F.lag("value").over(w).alias("prev")
    )
    return seq.groupBy("event_type").agg(
        F.round(F.corr("value", "prev"), 6).alias("lag1_autocorr"),
        F.count("prev").alias("n_pairs"),
    )


@query(
    "q_win_rolling_median",
    oracle="""
    SELECT user_id, event_id, value,
           round(median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling (trailing-7-observation) median per user — the robust twin
    of q_win_trailing's moving average: one outlier cannot drag the
    smoothed series. Spark disallows median() over a frame, so the frame
    is collected (bounded: <=7 values), sorted, and the middle element(s)
    selected with the same even-count interpolation DuckDB's windowed
    median uses — all JVM-side HOFs, one exchange on user_id, per-row
    cost O(W log W) with W=7 bounded."""
    ev = load_events_ms(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = F.when(n % 2 == 1, lo).otherwise((lo + hi) / 2.0)
    return ev.select(
        "user_id", "event_id", "value",
        F.round(med, 6).alias("med7"),
    )


@query(
    "q_events_benford",
    oracle="""
    WITH digits AS (
      SELECT event_type,
             CAST(regexp_extract(CAST(value AS VARCHAR), '[1-9]') AS INT) AS d
      FROM events WHERE value > 0
    ),
    counts AS (
      SELECT event_type, d, count(*) AS cnt FROM digits GROUP BY 1, 2
    ),
    spine AS (
      SELECT event_type, t.d, coalesce(cnt, 0) AS cnt
      FROM (SELECT DISTINCT event_type FROM counts) e
      CROSS JOIN (SELECT unnest(range(1, 10)) AS d) t
      LEFT JOIN counts USING (event_type, d)
    ),
    stats AS (
      SELECT event_type, d, cnt,
             sum(cnt) OVER (PARTITION BY event_type) AS n,
             ln(1.0 + 1.0 / d) / ln(10.0) AS exp_share
      FROM spine
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_values,
           round(sum((cnt - n * exp_share) * (cnt - n * exp_share)
                     / (n * exp_share)), 6) AS chi_square,
           CAST(min(CASE WHEN rn = 1 THEN d END) AS INT) AS top_digit,
           round(max(CASE WHEN rn = 1 THEN cnt / CAST(n AS DOUBLE) END), 6)
             AS top_digit_share
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY cnt DESC, d) AS rn
          FROM stats)
    GROUP BY event_type
    """,
)
def q_events_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance per event type: chi-square distance of the
    first-significant-digit distribution from log10(1+1/d), plus the modal
    digit — the classic fabricated-data / unit-mixup detector a warehouse
    runs over money-like measures. Scale shape: ONE scan of the fact table
    projects the leading digit (a regexp over the decimal rendering — no
    log10/floor, whose FP boundary at exact powers of ten flips the digit
    between engines), a partial+final agg shuffles O(types x 9) cells, and
    the digit spine / chi-square / argmax all run on that 9-row-per-type
    frame. The expected share uses ln(1+1/d)/ln(10) identically on both
    engines with 6-dp rounding absorbing last-ulp libm differences."""
    ev = load_events_ms(spark, sf_dir).filter(F.col("value") > 0)
    digits = ev.select(
        "event_type",
        F.regexp_extract(F.col("value").cast("string"), "[1-9]", 0)
        .cast("int")
        .alias("d"),
    )
    counts = digits.groupBy("event_type", "d").agg(F.count("*").alias("cnt"))
    spine = (
        counts.select("event_type")
        .distinct()
        .crossJoin(spark.range(1, 10).select(F.col("id").cast("int").alias("d")))
        .join(counts, ["event_type", "d"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    )
    wn = Window.partitionBy("event_type")
    stats = spine.select(
        "event_type",
        "d",
        "cnt",
        F.sum("cnt").over(wn).alias("n"),
        (F.log(F.lit(1.0) + 1.0 / F.col("d")) / F.log(F.lit(10.0))).alias(
            "exp_share"
        ),
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.col("cnt").desc(), "d")
    )
    dev = F.col("cnt") - F.col("n") * F.col("exp_share")
    return (
        stats.withColumn("rn", rn)
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_values"),
            F.round(
                F.sum(dev * dev / (F.col("n") * F.col("exp_share"))), 6
            ).alias("chi_square"),
            F.min(F.when(F.col("rn") == 1, F.col("d")))
            .cast("int")
            .alias("top_digit"),
            F.round(
                F.max(
                    F.when(
                        F.col("rn") == 1,
                        F.col("cnt") / F.col("n").cast("double"),
                    )
                ),
                6,
            ).alias("top_digit_share"),
        )
    )
