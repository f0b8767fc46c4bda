"""Batch retrieval: BM25 top-k for a SET of probe queries in one corpus pass.

The decontamination-triage use case ("find the training examples most
relevant to each of N eval prompts") needs N ranked lists WITHOUT N corpus
scans. The single-query plan (operators/traindata.bm25_topk) projects one
tf column per probe term — fine for one query, linear blow-up in N. The
batch plan here is join-based, the probe_ivf_index_batch shape
(operators/ivf.py): the query set is tiny and BROADCASTS; the corpus is
scanned ONCE and only its query-vocabulary hits ever shuffle.

Reference scope: beyond the reference (LLM-pipeline extension set);
ranking math is the public Robertson/Sparck Jones BM25 with the
Lucene-default non-negative idf, identical to q_text_bm25.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.operators.traindata import (
    BM25_B,
    BM25_K1,
    BM25_TOPK,
)
from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_table

#: fixed probe set for the registered fixture query — mid-frequency fixture
#: vocabulary, incl. one shared term across queries and one no-hit term.
BM25_BATCH_PROBES: tuple[tuple[int, str], ...] = (
    (1, "hash join vector"),
    (2, "index scan"),
    (3, "vector stream"),
    (4, "shuffle partition hash"),
    (5, "zzz-no-such-term merge"),
)

#: above this many distinct query terms the literal-array token filter
#: (an O(|V_q|) codegen'd scan per token) switches to the explode +
#: broadcast-join path (an O(1) hash probe per token, no plan literal).
BM25_VQ_LITERAL_MAX = 512


def bm25_topk_batch(
    queries: DataFrame,
    docs: DataFrame,
    k: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
    vq_mode: str = "auto",
) -> DataFrame:
    """Per-query BM25 top-k for every query in ``queries`` (query_id,
    query_text) over ``docs`` (doc_id, text), in ONE corpus scan.

    Plan (100 TB shape):
    - the query set's distinct (query_id, term) pairs are driver-side
      small (eval prompts, not a corpus) and broadcast;
    - ONE corpus scan reduces the corpus to per-(doc, term) tf rows for
      terms in the query vocabulary V_q, via one of two size-gated
      branches (``vq_mode``: auto/literal/semijoin — auto switches at
      BM25_VQ_LITERAL_MAX distinct terms):
        * literal (small V_q): project (doc_id, dl, hits) where hits
          keeps only tokens ∈ an inlined literal array (an O(|V_q|)
          codegen'd equality loop per token), then explode only the hits;
        * semijoin (large V_q): explode_outer all tokens, broadcast-LEFT-
          join V_q and null out non-matching terms, then
          groupBy(doc_id, dl, term) — map-side partial aggregation
          collapses the corpus tokens to O(docs + hits) rows BEFORE the
          shuffle, each token costs an O(1) hash probe instead of the
          literal scan, no |V_q|-sized literal enters the plan, and the
          term-null rows keep every doc (incl. zero-hit docs) visible to
          the corpus stats;
      either way the slim result is lazily checkpointed, so the fat text
      column is read and tokenized exactly once for stats + scoring;
    - per-term df is an O(|V_q|)-row aggregate that broadcasts back, as
      do the 1-row corpus stats (N, avgdl);
    - scoring joins tf to the broadcast query-term table and sums term
      scores per (query_id, doc_id); ranking is a per-query window top-k
      on the ROUNDED score with doc_id tiebreak — the same total order as
      the single-query TakeOrderedAndProject, so batch == per-query loop
      exactly (asserted on 20 probes in tests/test_retrieval.py, and
      literal == semijoin on a >5k-term probe set).

    Semantics match bm25_topk per query: terms are deduped per query
    (multiplicity does not re-weight), df/N/avgdl are corpus-global, docs
    with zero hits for a query are absent from that query's list.
    An empty query set (or one with no non-empty terms) returns an empty
    frame with the output schema instead of an unplannable empty literal.
    """
    if vq_mode not in ("auto", "literal", "semijoin"):
        raise ValueError(f"vq_mode must be auto|literal|semijoin: {vq_mode}")
    qterms = (
        queries.select(
            "query_id",
            F.explode(
                F.array_distinct(
                    F.filter(F.split("query_text", " "), lambda x: x != "")
                )
            ).alias("term"),
        )
        .distinct()
    )
    # V_q itself is always driver-side small even when "large" (eval-prompt
    # vocabularies, not a corpus); only the LITERAL branch inlines it.
    vq = sorted({r["term"] for r in qterms.select("term").distinct().collect()})
    if not vq:  # F.array() with zero args is an analysis error
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField("query_id", queries.schema["query_id"].dataType),
                StructField("doc_id", docs.schema["doc_id"].dataType),
                StructField("n_hit", IntegerType()),
                StructField("bm25", DoubleType()),
            ]
        )
        return docs.sparkSession.createDataFrame([], schema)
    use_literal = vq_mode == "literal" or (
        vq_mode == "auto" and len(vq) <= BM25_VQ_LITERAL_MAX
    )
    ws = F.filter(F.split("text", " "), lambda x: x != "")
    # tf has two consumers (dfreq + scoring) and DataFrame branches re-plan
    # shared subtrees — without the checkpoint the tokenize+agg runs twice
    # (counted in the formatted plan). O(docs + hits) rows only, never the
    # raw corpus tokens.
    if use_literal:
        vq_lit = F.array(*[F.lit(t) for t in vq])
        per_doc = docs.select(
            "doc_id",
            F.size(ws).cast("double").alias("dl"),
            F.filter(ws, lambda x: F.array_contains(vq_lit, x)).alias("hits"),
        ).localCheckpoint(eager=False)
        stats = per_doc.agg(
            F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
        )
        tf = (
            per_doc.select("doc_id", "dl", F.explode("hits").alias("term"))
            .groupBy("doc_id", "dl", "term")
            .agg(F.count("*").cast("double").alias("tf"))
            .localCheckpoint(eager=False)
        )
    else:
        vq_df = qterms.select("term").distinct()
        tok = docs.select(
            "doc_id",
            F.size(ws).cast("double").alias("dl"),
            F.explode_outer(ws).alias("tok"),
        )
        marked = tok.join(
            F.broadcast(vq_df.select(F.col("term").alias("tok")).withColumn("_m", F.lit(1))),
            "tok",
            "left",
        ).select(
            "doc_id",
            "dl",
            F.when(F.col("_m") == 1, F.col("tok")).alias("term"),
        )
        # term IS NULL rows carry the non-matching (and zero-token) mass:
        # exactly one surviving group per doc, so per_doc-equivalent stats
        # fall out of the same single scan.
        per_doc_term = (
            marked.groupBy("doc_id", "dl", "term")
            .agg(F.count("*").cast("double").alias("tf"))
            .localCheckpoint(eager=False)
        )
        stats = (
            per_doc_term.groupBy("doc_id")
            .agg(F.first("dl").alias("dl"))
            .agg(
                F.count("*").cast("double").alias("n"),
                F.avg("dl").alias("avgdl"),
            )
        )
        tf = per_doc_term.filter(F.col("term").isNotNull())
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + k1 * (
        (1.0 - b) + b * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").cast("int").alias("n_hit"),
            F.round(F.sum(idf * F.col("tf") * (k1 + 1.0) / denom), 6).alias(
                "bm25"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
        .select("query_id", "doc_id", "n_hit", "bm25")
    )


def _bm25_batch_oracle() -> str:
    probes = ", ".join(f"({qid}, '{text}')" for qid, text in BM25_BATCH_PROBES)
    k1p1 = BM25_K1 + 1.0
    one_minus_b = 1.0 - BM25_B
    return f"""
    WITH probes(query_id, query_text) AS (VALUES {probes}),
    q AS (
      SELECT DISTINCT query_id, unnest(string_split(query_text, ' ')) AS term
      FROM probes
    ),
    t AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE) AS dl
      FROM documents),
    s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM t),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
      FROM tok
      WHERE term <> '' AND term IN (SELECT DISTINCT term FROM q)
      GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             CAST(count(*) AS INT) AS n_hit,
             round(sum(
               ln((s.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * tf.tf * {k1p1}
               / (tf.tf + {BM25_K1} * ({one_minus_b} + {BM25_B} * t.dl / s.avgdl))
             ), 6) AS bm25
      FROM tf
      JOIN q USING (term)
      JOIN dfq USING (term)
      JOIN t ON t.doc_id = tf.doc_id
      CROSS JOIN s
      GROUP BY q.query_id, tf.doc_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY bm25 DESC, doc_id
      ) AS rk
      FROM scored
    )
    SELECT query_id, doc_id, n_hit, bm25
    FROM ranked WHERE rk <= {BM25_TOPK}
    """


@query("q_text_bm25_batch", oracle=_bm25_batch_oracle())
def q_text_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k for a fixed SET of probe queries in one corpus pass —
    the batch twin of q_text_bm25 (see bm25_topk_batch for the plan).
    One probe shares terms with others, one contains a term absent from
    the corpus (it must still rank on its remaining term)."""
    probes = spark.createDataFrame(
        list(BM25_BATCH_PROBES), "query_id: int, query_text: string"
    )
    return bm25_topk_batch(probes, load_table(spark, sf_dir, "documents"))
