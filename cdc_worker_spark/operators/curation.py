"""Training-data curation quality operators (round 5).

Second ring of the LLM-pipeline extension set (SURVEY §2 "beyond the
reference"): the document-quality filter rules and LM-based scoring used
by C4/Gopher/CCNet-style curation (rule filters, unigram and bigram
language-model scoring, Zipf-law fit) plus embedding-health diagnostics.

Cross-engine determinism notes:
- word-length / stopword fractions: counts and length sums are small
  integers, exact in double in ANY summation order, so fractions and the
  rule-flag comparisons agree bit-for-bit across engines.
- unigram/bigram log-probs: ln() may differ by 1 ulp between libm and the
  JVM; the per-doc mean washes that out far below the 6-dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_table

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
    # checkpoint the O(vocab) count table: total and the score join both
    # consume it, and each would re-run the corpus explode+agg otherwise
    vocab = (
        tok.groupBy("tok")
        .agg(F.count("*").cast("double").alias("c"))
        .localCheckpoint(eager=False)
    )
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
    "q_text_bigram_lm",
    oracle="""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    big AS (
      SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
      FROM w, LATERAL unnest(range(1, len(ws))) AS t(i)
      WHERE len(ws) >= 2
    ),
    cb AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS cb
           FROM big GROUP BY w1, w2),
    cu AS (SELECT w1, CAST(count(*) AS DOUBLE) AS cu FROM big GROUP BY w1),
    vv AS (SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v FROM big)
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((cb.cb + 1) / (cu.cu + (SELECT v FROM vv)))), 6)
             AS avg_logprob
    FROM big b JOIN cb USING (w1, w2) JOIN cu USING (w1)
    GROUP BY b.doc_id
    """,
)
def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-smoothed BIGRAM language-model scoring — the next order up
    from q_text_lm_score's unigram form (the KenLM-filter shape without
    the backoff tables): per doc the mean ln P(w_i | w_{i-1}) with add-one
    smoothing over the corpus-trained bigram/context counts.

    Scale shape mirrors the unigram scorer: the bigram and context count
    tables are bounded by VOCABULARY (pairs actually observed), not corpus
    size, so both BROADCAST onto the exploded bigram stream — the corpus
    side shuffles only for the final per-doc mean. Bigram extraction is
    arrays_zip over two slices: a pure projection, no self-join."""
    docs = load_table(spark, sf_dir, "documents")
    ws = _words()
    # slice() throws on negative length, so clamp for empty/one-word docs
    # (n-1 would be -1 on whitespace-only text) — they yield zero bigrams.
    n = F.greatest(F.size(ws) - F.lit(1), F.lit(0))
    pairs = F.arrays_zip(
        F.slice(ws, 1, n).alias("w1"), F.slice(ws, 2, n).alias("w2")
    )
    big = (
        docs.select("doc_id", pairs.alias("ps"))
        .filter(F.size("ps") >= 1)
        .select("doc_id", F.explode("ps").alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # ONE corpus pass builds the bigram counts; the unigram-context counts
    # and the continuation vocabulary then derive from the CHECKPOINTED
    # O(distinct-bigrams) table instead of three more corpus explodes
    # (cu = sum of cb over w1 and vv = distinct w2 of cb are identities)
    cb = (
        big.groupBy("w1", "w2")
        .agg(F.count("*").cast("double").alias("cb"))
        .localCheckpoint(eager=False)
    )
    cu = cb.groupBy("w1").agg(F.sum("cb").alias("cu"))
    vv = cb.agg(F.count_distinct("w2").cast("double").alias("v"))
    return (
        big.join(F.broadcast(cb), ["w1", "w2"])
        .join(F.broadcast(cu), "w1")
        .crossJoin(F.broadcast(vv))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("cb") + 1) / (F.col("cu") + F.col("v")))), 6
            ).alias("avg_logprob"),
        )
    )


@query(
    "q_text_zipf_fit",
    oracle="""
    WITH tok AS (
      SELECT lang,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT lang, term, CAST(count(*) AS DOUBLE) AS freq
           FROM tok GROUP BY lang, term),
    ranked AS (
      SELECT lang, freq,
             row_number() OVER (PARTITION BY lang
                                ORDER BY freq DESC, term) AS rnk
      FROM tf
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_terms,
           round(regr_slope(ln(freq), ln(CAST(rnk AS DOUBLE))), 6)
             AS zipf_slope,
           round(regr_r2(ln(freq), ln(CAST(rnk AS DOUBLE))), 6) AS r2
    FROM ranked WHERE rnk <= 100
    GROUP BY lang
    """,
)
def q_text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per language: least-squares slope of ln(freq) on
    ln(rank) over the top-100 terms — natural text sits near -1; a corpus
    whose slope drifts toward 0 is template/machine-generated (a standard
    corpus-health diagnostic). The term-frequency table is vocabulary-sized;
    the per-lang rank window and the regression aggregate both run on that
    SMALL table — the token stream only feeds the one tf groupBy. Identical
    freq-desc/term tiebreak makes rank assignments engine-identical."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(_words()).alias("term"))
    tf = tok.groupBy("lang", "term").agg(
        F.count("*").cast("double").alias("freq")
    )
    w = Window.partitionBy("lang").orderBy(F.col("freq").desc(), "term")
    ranked = tf.select(
        "lang", "freq", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= 100)
    lf, lr = F.log("freq"), F.log(F.col("rnk").cast("double"))
    return ranked.groupBy("lang").agg(
        F.count("*").alias("n_terms"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_r2(lf, lr), 6).alias("r2"),
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
    "q_text_heaps_law",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ),
    per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok
                FROM tok GROUP BY doc_id),
    firsts AS (SELECT t, min(doc_id) AS first_doc FROM tok GROUP BY t),
    new_vocab AS (SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_new
                  FROM firsts GROUP BY first_doc),
    cum AS (
      SELECT p.doc_id,
             sum(p.n_tok) OVER (ORDER BY p.doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_tok,
             sum(coalesce(v.n_new, 0)) OVER (ORDER BY p.doc_id
                                             ROWS UNBOUNDED PRECEDING)
               AS cum_vocab
      FROM per_doc p LEFT JOIN new_vocab v USING (doc_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(cum_tok) AS BIGINT) AS total_tokens,
           CAST(max(cum_vocab) AS BIGINT) AS vocab_size,
           round(regr_slope(ln(CAST(cum_vocab AS DOUBLE)),
                            ln(CAST(cum_tok AS DOUBLE))), 6) AS heaps_beta,
           round(exp(regr_intercept(ln(CAST(cum_vocab AS DOUBLE)),
                                    ln(CAST(cum_tok AS DOUBLE)))), 6)
             AS heaps_k
    FROM cum
    """,
)
def q_text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit: vocabulary growth V(n) ~ K * n^beta over the corpus
    in doc order — the companion diagnostic to q_text_zipf_fit (natural
    text sits near beta 0.4-0.6; templated/synthetic corpora flatten).
    Cumulative DISTINCT vocabulary uses the same first-seen collapse as
    q_events_cum_distinct (shuffle carries O(vocab) firsts, never the
    token stream); the regression runs over the docs-sized cumulative
    table. The doc-id total order pins both engines' cumulative sums."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_words()).alias("t"))
    per_doc = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    new_vocab = (
        tok.groupBy("t")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_new"))
    )
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        per_doc.join(new_vocab, "doc_id", "left")
        .select(
            "doc_id",
            F.sum("n_tok").over(w).alias("cum_tok"),
            F.sum(F.coalesce("n_new", F.lit(0))).over(w).alias("cum_vocab"),
        )
    )
    lv = F.log(F.col("cum_vocab").cast("double"))
    lt = F.log(F.col("cum_tok").cast("double"))
    return cum.agg(
        F.count("*").alias("n_docs"),
        F.max("cum_tok").cast("bigint").alias("total_tokens"),
        F.max("cum_vocab").cast("bigint").alias("vocab_size"),
        F.round(F.regr_slope(lv, lt), 6).alias("heaps_beta"),
        F.round(F.exp(F.regr_intercept(lv, lt)), 6).alias("heaps_k"),
    )


@query(
    "q_docs_js_divergence",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents WHERE source IN ('src0', 'src1')
    ),
    c AS (SELECT source, t, CAST(count(*) AS DOUBLE) AS c
          FROM tok GROUP BY source, t),
    tot AS (SELECT source, sum(c) AS n FROM c GROUP BY source),
    p AS (SELECT c.t,
            max(CASE WHEN c.source = 'src0' THEN c.c / tot.n END) AS pa,
            max(CASE WHEN c.source = 'src1' THEN c.c / tot.n END) AS pb
          FROM c JOIN tot USING (source) GROUP BY c.t),
    f AS (SELECT coalesce(pa, 0) AS pa, coalesce(pb, 0) AS pb,
                 (coalesce(pa, 0) + coalesce(pb, 0)) / 2 AS m FROM p)
    SELECT CAST(count(*) AS BIGINT) AS vocab_union,
           round(sum(CASE WHEN pa > 0 THEN pa * ln(pa / m) ELSE 0 END) / 2
                 + sum(CASE WHEN pb > 0 THEN pb * ln(pb / m) ELSE 0 END) / 2,
                 6) AS js_div
    FROM f
    """,
)
def q_docs_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between two sources' unigram
    distributions — the domain-shift detector a curation run points at
    'did this crawl slice drift from the reference corpus' (0 = identical,
    ln 2 = disjoint; symmetric and finite unlike raw KL). Token counting
    shuffles O(source x vocab); everything after runs on the vocab-sized
    distribution table. Probabilities divide exact counts, so only ln()'s
    last ulp separates engines — absorbed by the 6-dp rounding."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.filter(F.col("source").isin("src0", "src1")).select(
        "source", F.explode(_words()).alias("t")
    )
    c = tok.groupBy("source", "t").agg(F.count("*").cast("double").alias("c"))
    tot = c.groupBy("source").agg(F.sum("c").alias("n"))
    p = (
        c.join(F.broadcast(tot), "source")
        .groupBy("t")
        .agg(
            F.max(F.when(F.col("source") == "src0", F.col("c") / F.col("n"))).alias("pa"),
            F.max(F.when(F.col("source") == "src1", F.col("c") / F.col("n"))).alias("pb"),
        )
    )
    pa = F.coalesce("pa", F.lit(0.0))
    pb = F.coalesce("pb", F.lit(0.0))
    m = (pa + pb) / 2
    kl_a = F.when(pa > 0, pa * F.log(pa / m)).otherwise(0.0)
    kl_b = F.when(pb > 0, pb * F.log(pb / m)).otherwise(0.0)
    return p.agg(
        F.count("*").alias("vocab_union"),
        F.round(F.sum(kl_a) / 2 + F.sum(kl_b) / 2, 6).alias("js_div"),
    )


@query(
    "q_emb_centroid_separation",
    oracle="""
    WITH comp AS (
      SELECT label, i, avg(embedding[i + 1]) AS c
      FROM embeddings, LATERAL unnest(range(0, 64)) AS t(i)
      WHERE label < 4
      GROUP BY label, i
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round(sqrt(sum(pow(CAST(a.c AS DOUBLE) - b.c, 2))), 6) AS dist
    FROM comp a JOIN comp b ON a.i = b.i AND a.label < b.label
    GROUP BY a.label, b.label
    """,
)
def q_emb_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-class centroid distance matrix (labels 0-3): the class-
    separation sanity check run before trusting an embedding space for
    classification or clustered ANN (collapsed centroids = the space
    does not separate those classes). Per-dimension means are mergeable
    aggregates over the posexploded stream (shuffle carries
    O(labels x dims)); the pairwise matrix is computed on the
    centroids-sized table. Summation order differs per engine only in
    the last ulp, absorbed by the rounding."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = (
        emb.filter(F.col("label") < 4)
        .select("label", F.posexplode("embedding").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg(F.col("x").cast("double")).alias("c"))
    )
    a = comp.select(
        F.col("label").alias("label_a"), "i", F.col("c").alias("ca")
    )
    b = comp.select(
        F.col("label").alias("label_b"), "i", F.col("c").alias("cb")
    )
    return (
        a.join(b, "i")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.round(
                F.sqrt(F.sum(F.pow(F.col("ca") - F.col("cb"), 2))), 6
            ).alias("dist")
        )
    )


@query(
    "q_emb_outlier_report",
    # r12 un-pin (VERDICT r11 next #2): the r9-r11 oracle exploded
    # embeddings TWICE (comp and dist each carried `embeddings, LATERAL
    # unnest`), and dist shuffled the exploded rows into the comp join
    # with the FULL 64-float array still attached — 64x row fan-out of
    # ~520-byte rows at the join boundary, the abort at sf100. The wide
    # shuffle is INCIDENTAL: only (vec_id, label, i, x) is consumed past
    # the explode, so one narrow `el` CTE projects the element in the
    # same SELECT as the lateral (the array never crosses an exchange)
    # and both comp and dist read it — identical values, ~17x less
    # shuffle byte volume, and one explode instead of two.
    oracle="""
    WITH el AS (
      SELECT vec_id, label, t.i AS i,
             CAST(embedding[t.i + 1] AS DOUBLE) AS x
      FROM embeddings, LATERAL unnest(range(0, 64)) AS t(i)
    ),
    comp AS (
      SELECT label, i, avg(x) AS c FROM el GROUP BY label, i
    ),
    dist AS (
      SELECT el.vec_id, el.label,
             sqrt(sum(pow(el.x - comp.c, 2))) AS d
      FROM el
      JOIN comp ON comp.label = el.label AND comp.i = el.i
      GROUP BY el.vec_id, el.label
    ),
    stats AS (
      SELECT label, avg(d) AS mu, stddev_samp(d) AS sd FROM dist GROUP BY label
    )
    SELECT d.label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(d.d), 6) AS mean_dist,
           round(max(d.d), 6) AS max_dist,
           CAST(sum(CASE WHEN round(d.d, 6) > round(s.mu + 2 * s.sd, 6)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dist d JOIN stats s USING (label)
    GROUP BY d.label
    ORDER BY d.label
    """,
)
def q_emb_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier report: per label, the count of vectors
    whose Euclidean distance to the label centroid exceeds mean + 2 sigma
    of that label's distance distribution — the screen that catches
    corrupted rows, wrong-space vectors, and mislabeled clusters before
    they poison ANN indexes or dedup thresholds.

    Cross-engine determinism: all distances come from per-dimension sums
    whose engine-order differences live in the last ulp; every emitted
    value AND the outlier comparison operate on round(.,6) so both engines
    cut at the identical threshold (same contract as
    q_emb_centroid_separation).

    100 TB design: centroids are mergeable per-dimension avgs over the
    posexploded stream (shuffle carries O(labels x dims) partials); the
    per-vector distance re-scan joins the O(labels x dims) centroid table
    BROADCAST, so the corpus-scale stream never shuffles for the distance;
    the stats and outlier passes run on the O(n) scalar distance frame —
    one hash-agg each, no window over data-scale partitions. Reference
    scope: beyond the reference (LLM-pipeline extension set, SURVEY
    §2.3)."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = (
        emb.select("label", F.posexplode("embedding").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg(F.col("x").cast("double")).alias("c"))
    )
    dist = (
        emb.select("vec_id", "label", F.posexplode("embedding").alias("i", "x"))
        .join(F.broadcast(comp), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.sqrt(F.sum(F.pow(F.col("x").cast("double") - F.col("c"), 2))).alias("d")
        )
    )
    stats = dist.groupBy("label").agg(
        F.avg("d").alias("mu"), F.stddev_samp("d").alias("sd")
    )
    return (
        dist.join(F.broadcast(stats), "label")
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.round(F.avg("d"), 6).alias("mean_dist"),
            F.round(F.max("d"), 6).alias("max_dist"),
            F.sum(
                F.when(
                    F.round(F.col("d"), 6)
                    > F.round(F.col("mu") + 2 * F.col("sd"), 6),
                    F.lit(1).cast("bigint"),
                ).otherwise(F.lit(0).cast("bigint"))
            ).cast("bigint").alias("n_outliers"),
        )
        .orderBy("label")
    )
