"""Training-data curation + warehouse-depth operators (round 5).

Second ring of the LLM-pipeline extension set (SURVEY §2 "beyond the
reference"): the document-quality filter rules and LM-based scoring used by
C4/Gopher/CCNet-style curation, embedding-health diagnostics, an SCD
Type-2 history build over the CDC stream (the warehouse shape of the
reference's latest-wins state, design doc :654-727 — keep EVERY version,
not just the last), and market-basket co-occurrence mining.

Cross-engine determinism notes:
- word-length / stopword fractions: counts and length sums are small
  integers, exact in double in ANY summation order, so fractions and the
  rule-flag comparisons agree bit-for-bit across engines.
- unigram log-probs: ln() may differ by 1 ulp between libm and the JVM;
  the per-doc mean washes that out far below the 6-dp rounding.
- SCD2 uses the ts_ms BIGINT convention (functions/exprs.ts_ms_col) so
  validity bounds hash identically regardless of session time zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_events_ms, load_table

#: the Gopher-style "does this even look like language" stopword probe set
_STOPWORDS = ("the", "a", "and", "of", "to", "in")


def _words():
    """text -> non-empty token array (both engines split-then-drop-empty)."""
    return F.filter(F.split("text", " "), lambda x: x != F.lit(""))


@query(
    "q_text_gopher_rules",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(ws) AS BIGINT) AS n_words,
           round(list_sum(list_transform(ws, x -> CAST(len(x) AS DOUBLE)))
                 / len(ws), 6) AS mean_word_len,
           round(CAST(len(list_filter(ws,
                 x -> x IN ('the','a','and','of','to','in'))) AS DOUBLE)
                 / len(ws), 6) AS stop_frac,
           (len(ws) BETWEEN 30 AND 90)
             AND (list_sum(list_transform(ws, x -> CAST(len(x) AS DOUBLE)))
                  / len(ws) BETWEEN 4.0 AND 5.0)
             AND (CAST(len(list_filter(ws,
                  x -> x IN ('the','a','and','of','to','in'))) AS DOUBLE)
                  / len(ws) >= 0.05) AS pass_gopher
    FROM w
    """,
)
def q_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1): word
    count bounds, mean word length band, minimum stopword fraction — the
    cheap pre-filter a curation run applies before any model-based scoring.

    Pure per-row projection over array HOFs (filter/transform/aggregate):
    zero shuffles, zero UDFs, scales embarrassingly to 100 TB. The rule
    thresholds are constants, so Catalyst folds them into one codegen'd
    stage over the scan."""
    docs = load_table(spark, sf_dir, "documents")
    ws = _words()
    n = F.size(ws).cast("bigint")
    sum_len = F.aggregate(
        F.transform(ws, lambda x: F.length(x).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    mean_len = sum_len / n
    n_stop = F.size(F.filter(ws, lambda x: x.isin(*_STOPWORDS))).cast("double")
    stop_frac = n_stop / n
    return docs.select(
        "doc_id",
        "lang",
        n.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(stop_frac, 6).alias("stop_frac"),
        (
            n.between(30, 90)
            & mean_len.between(4.0, 5.0)
            & (stop_frac >= 0.05)
        ).alias("pass_gopher"),
    )


@query(
    "q_text_lm_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY tok
    ),
    tot AS (SELECT sum(c) AS n FROM vocab)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln(v.c / (SELECT n FROM tot))), 6) AS avg_logprob
    FROM tok t JOIN vocab v USING (tok)
    GROUP BY t.doc_id
    """,
)
def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring (the CCNet/Wenzek et al. 2020
    perplexity-filter shape with the LM trained on the corpus itself):
    mean token log-probability per document — low scores flag gibberish
    and boilerplate.

    Two passes: (1) token -> global count (shuffle carries O(vocab));
    (2) token stream joins the vocab back. The vocab is *structurally*
    the small side (bounded by distinct tokens, not corpus size), so it
    BROADCASTS and the token stream never shuffles for the score — at
    100 TB the corpus-side pass is scan + explode + map-side join + one
    final per-doc agg."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(_words()).alias("tok")
    )
    vocab = tok.groupBy("tok").agg(F.count("*").cast("double").alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    vocab_p = vocab.crossJoin(F.broadcast(total)).select(
        "tok", F.log(F.col("c") / F.col("n")).alias("logp")
    )
    return (
        tok.join(F.broadcast(vocab_p), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("logp"), 6).alias("avg_logprob"),
        )
    )


@query(
    "q_emb_norm_stats",
    oracle="""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * x)))), 6) AS avg_norm,
           round(stddev_samp(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * x)))), 6) AS sd_norm,
           round(avg(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))) / len(embedding)), 6)
             AS avg_mean_comp
    FROM embeddings
    GROUP BY label
    """,
)
def q_emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-health diagnostics per label: L2-norm mean/spread and
    mean component value — the sanity dashboard run before any ANN build
    (un-normalized or collapsed embeddings break cosine indexes silently).

    The norm is a sequential left-fold over the array on BOTH engines
    (identical doubles in identical order), then mergeable avg/stddev
    moments — shuffle carries O(labels) rows. Zero UDFs."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    comp_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = emb.select(
        "label",
        F.sqrt(sq_sum).alias("norm"),
        (comp_sum / F.size("embedding")).alias("mean_comp"),
    )
    return scored.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg("norm"), 6).alias("avg_norm"),
        F.round(F.stddev_samp("norm"), 6).alias("sd_norm"),
        F.round(F.avg("mean_comp"), 6).alias("avg_mean_comp"),
    )


@query(
    "q_cdc_scd2",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_ms(ts), event_id) AS prev
      FROM events
    ),
    runs AS (
      SELECT *, sum(CASE WHEN prev IS NULL OR prev <> event_type
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
      FROM ordered
    ),
    collapsed AS (
      SELECT user_id, CAST(run_id AS BIGINT) AS version, event_type,
             min(ts_ms) AS valid_from_ms,
             CAST(count(*) AS BIGINT) AS n_events
      FROM runs GROUP BY user_id, run_id, event_type
    )
    SELECT user_id, version, event_type, valid_from_ms,
           lead(valid_from_ms) OVER (PARTITION BY user_id
                                     ORDER BY version) AS valid_to_ms,
           (lead(valid_from_ms) OVER (PARTITION BY user_id
                                      ORDER BY version)) IS NULL
             AS is_current,
           n_events
    FROM collapsed
    """,
)
def q_cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type-2 history build from the CDC stream
    (design doc :654-727 describes latest-wins upsert; SCD2 is the
    warehouse twin that KEEPS every version with validity intervals).
    Consecutive equal states collapse into one versioned run
    (gaps-and-islands), valid_to = next run's valid_from, open interval =
    current row.

    All three passes (lag, running sum, lead) share ONE partitioning on
    user_id — a single exchange; the groupBy collapses within the same
    key space. Interval bounds use the ts_ms BIGINT convention so hashes
    are time-zone-proof."""
    ev = load_events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    runs = ev.select(
        "user_id",
        "event_type",
        "ts_ms",
        "event_id",
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("run_id"),
    )
    collapsed = runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("ts_ms").alias("valid_from_ms"),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("run_id")
    valid_to = F.lead("valid_from_ms").over(w2)
    return collapsed.select(
        "user_id",
        F.col("run_id").cast("bigint").alias("version"),
        "event_type",
        "valid_from_ms",
        valid_to.alias("valid_to_ms"),
        valid_to.isNull().alias("is_current"),
        "n_events",
    )


@query(
    "q_basket_pairs",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pf AS (SELECT l_partkey, CAST(count(*) AS DOUBLE) AS n_ord
           FROM items GROUP BY l_partkey),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
          FROM items),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING count(*) >= 2
    )
    SELECT part_a, part_b, n_both,
           round(n_both / (SELECT n_orders FROM n), 6) AS support,
           round(n_both * (SELECT n_orders FROM n)
                 / (fa.n_ord * fb.n_ord), 6) AS lift
    FROM pairs
    JOIN pf fa ON fa.l_partkey = part_a
    JOIN pf fb ON fb.l_partkey = part_b
    """,
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: part pairs ordered together in
    >= 2 orders, with support and lift (the association-rule primitives).

    The pair generation is a SELF-JOIN CO-PARTITIONED on l_orderkey —
    one shuffle of the distinct (order, part) set, and the fan-out per
    order is quadratic only in that order's item count (bounded at 7 in
    TPC-H; unbounded baskets get a per-basket cap in production). The
    per-part frequency table is O(parts) and BROADCASTS onto the pair
    counts; n_orders is a 1-row broadcast. Exact integer counts make
    support/lift bit-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    pf = items.groupBy("l_partkey").agg(
        F.count("*").cast("double").alias("n_ord")
    )
    n_orders = items.agg(
        F.count_distinct("l_orderkey").cast("double").alias("n_orders")
    )
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    fa = pf.select(
        F.col("l_partkey").alias("part_a"), F.col("n_ord").alias("na")
    )
    fb = pf.select(
        F.col("l_partkey").alias("part_b"), F.col("n_ord").alias("nb")
    )
    return (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.round(F.col("n_both") / F.col("n_orders"), 6).alias("support"),
            F.round(
                F.col("n_both") * F.col("n_orders") / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "q_join_asof_tol",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         e AS (SELECT event_id AS e_id, user_id, ts AS e_ts FROM events
               WHERE event_type = 'error'),
         m AS (
           SELECT p.event_id, e.e_id, e.e_ts,
                  row_number() OVER (PARTITION BY p.event_id
                                     ORDER BY e.e_ts, e.e_id) AS rn
           FROM p JOIN e ON p.user_id = e.user_id
                        AND e.e_ts > p.ts
                        AND e.e_ts <= p.ts + INTERVAL 48 HOUR)
    SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
           m.e_id AS next_error_id,
           epoch_ms(m.e_ts) AS next_error_ts_ms
    FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
    """,
)
def q_join_asof_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a tolerance bound (the pandas
    ``merge_asof(direction='forward', tolerance=...)`` surface, the twin of
    q_join_asof's backward form): for each purchase, the EARLIEST error of
    the same user strictly after it but within 48 h — unmatched purchases
    survive with NULLs (left semantics). Same scale shape as the backward
    form: ONE user_id shuffle serves the equi join, the range predicate
    prunes candidates before the per-purchase row_number, and the final
    left join is purchase-keyed. The tolerance bound is what makes this
    scale-safe: it caps each purchase's candidate window."""
    ev = load_events_ms(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "ts_ms"
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("e_ts"),
        F.col("ts_ms").alias("e_ts_ms"),
    )
    w = Window.partitionBy("event_id").orderBy("e_ts", "e_id")
    matched = (
        p.join(
            e,
            (p.user_id == e.e_user_id)
            & (e.e_ts > p.ts)
            & (e.e_ts <= p.ts + F.expr("INTERVAL 48 HOURS")),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "e_id", "e_ts_ms")
    )
    return p.join(matched, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts_ms",
        F.col("e_id").alias("next_error_id"),
        F.col("e_ts_ms").alias("next_error_ts_ms"),
    )


@query(
    "q_part_skyline",
    oracle="""
    SELECT p.p_partkey, p.p_brand, p.p_size, p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_brand = p.p_brand
        AND q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
)
def q_part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query per brand: parts not dominated on
    (cheaper price, larger size) by any same-brand part — the classic
    multi-criteria shortlist operator (Borzsony et al., ICDE 2001).

    Expressed as a dominance anti-join CO-PARTITIONED on p_brand: one
    brand-keyed shuffle, and the quadratic dominance check is confined to
    each brand's partition (the standard block-partitioned skyline; an
    unpartitioned skyline would pre-filter with a grid/sample pass). The
    anti join keeps exactly the non-dominated rows."""
    part = load_table(spark, sf_dir, "part")
    p = part.select("p_partkey", "p_brand", "p_size", "p_retailprice")
    q = p.select(
        F.col("p_brand").alias("q_brand"),
        F.col("p_size").alias("q_size"),
        F.col("p_retailprice").alias("q_price"),
    )
    dominated = (
        (F.col("q_brand") == F.col("p_brand"))
        & (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") >= F.col("p_size"))
        & (
            (F.col("q_price") < F.col("p_retailprice"))
            | (F.col("q_size") > F.col("p_size"))
        )
    )
    return p.join(q, dominated, "left_anti")
