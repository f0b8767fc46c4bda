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


def bm25_topk_batch(
    queries: DataFrame,
    docs: DataFrame,
    k: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-query BM25 top-k for every query in ``queries`` (query_id,
    query_text) over ``docs`` (doc_id, text), in ONE corpus scan.

    Plan (100 TB shape):
    - the query set's distinct (query_id, term) pairs and its vocabulary
      V_q are driver-side small (eval prompts, not a corpus) — V_q is
      inlined as a literal array, the pair table broadcasts;
    - ONE corpus scan projects (doc_id, dl, hits) where hits keeps only
      tokens ∈ V_q (an O(|V_q|) codegen'd equality loop per token; for
      |V_q| in the many-thousands an explode + broadcast-semi-join filter
      replaces the literal — same downstream plan). The slim frame is
      lazily checkpointed, so the fat text column is read and tokenized
      exactly once for stats + scoring;
    - per-(doc, term) tf comes from exploding ONLY the hits (shuffle
      carries query-vocabulary matches, never the corpus); per-term df is
      an O(|V_q|)-row aggregate that broadcasts back, as do the 1-row
      corpus stats (N, avgdl);
    - scoring joins tf to the broadcast query-term table and sums term
      scores per (query_id, doc_id); ranking is a per-query window top-k
      on the ROUNDED score with doc_id tiebreak — the same total order as
      the single-query TakeOrderedAndProject, so batch == per-query loop
      exactly (asserted on 20 probes in tests/test_retrieval.py).

    Semantics match bm25_topk per query: terms are deduped per query
    (multiplicity does not re-weight), df/N/avgdl are corpus-global, docs
    with zero hits for a query are absent from that query's list.
    """
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
    vq = sorted({r["term"] for r in qterms.select("term").distinct().collect()})
    vq_lit = F.array(*[F.lit(t) for t in vq])
    ws = F.filter(F.split("text", " "), lambda x: x != "")
    per_doc = docs.select(
        "doc_id",
        F.size(ws).cast("double").alias("dl"),
        F.filter(ws, lambda x: F.array_contains(vq_lit, x)).alias("hits"),
    ).localCheckpoint(eager=False)
    stats = per_doc.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    # tf has two consumers (dfreq + scoring) and DataFrame branches re-plan
    # shared subtrees — without the checkpoint the explode+agg runs twice
    # (counted in the formatted plan). Hit-scale rows only (query-vocab
    # matches), never the corpus.
    tf = (
        per_doc.select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
        .localCheckpoint(eager=False)
    )
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
