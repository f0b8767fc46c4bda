"""Corpus-level curation ops that cross table/corpus boundaries:
benchmark decontamination and embedding storage compression.

Reference parity: these extend the LLM-pipeline surface (SURVEY §2.3
north-star set) beyond the reference's own operators — the reference
(bai-admin/cdc-worker) has no training-data path at all; the designs follow
standard published pipeline practice (n-gram overlap decontamination as in
open LM training reports; symmetric int8 quantization for vector storage).

Scale design (100 TB):
- Decontamination joins the CORPUS against a SMALL eval/benchmark set: the
  eval shingles broadcast, so corpus shingles never shuffle for the match —
  the only exchange is the (doc, eval) hit aggregation, whose volume is
  bounded by actual overlap, not corpus size.
- Quantization is a pure per-row projection (no shuffle, 4x storage cut for
  float32 corpora; 8x for float64) with the scale factor kept per-vector so
  dequantization error is bounded by 0.5/127 of each vector's max |x|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_worker_spark.operators.dedup import shingles_distinct, with_double_vec
from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_table

#: stand-in eval/benchmark set: doc_id < EVAL_MAX_ID (production: a separate
#: benchmark table); contamination = >= MIN_SHARED distinct shared trigrams
EVAL_MAX_ID = 25
MIN_SHARED = 3


@query(
    "q_docs_decontaminate",
    oracle="""
    WITH tri AS (
      SELECT DISTINCT doc_id, lang,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents) d,
           LATERAL unnest(range(1, greatest(len(ws) - 1, 1))) AS t(i)
    )
    SELECT c.doc_id, e.doc_id AS eval_id, count(*) AS n_shared
    FROM tri c JOIN tri e ON c.g = e.g AND c.lang = e.lang
    WHERE e.doc_id < 25 AND c.doc_id >= 25
    GROUP BY 1, 2
    HAVING count(*) >= 3
    """,
)
def q_docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing >=
    MIN_SHARED distinct word-trigram shingles with any eval-set document
    (the n-gram overlap check every open LM training report runs before
    training). Eval shingles BROADCAST (the benchmark set is small by
    construction), so the corpus side streams through the match map-side;
    only actual (doc, eval) hits reach the aggregation shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tri = shingles_distinct(docs)
    corpus = tri.filter(F.col("doc_id") >= EVAL_MAX_ID)
    eval_tri = tri.filter(F.col("doc_id") < EVAL_MAX_ID).select(
        F.col("doc_id").alias("eval_id"), "lang", "g"
    )
    return (
        corpus.join(F.broadcast(eval_tri), ["lang", "g"])
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED)
    )


@query(
    "q_docs_quality_band",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang,
             round(
               (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                  / greatest(length(text), 1))
               * ln(1 + len(string_split(text, ' '))), 6) AS score
      FROM documents WHERE text IS NOT NULL AND length(text) > 0),
    r AS (
      SELECT doc_id, lang, score,
             round(percent_rank() OVER (PARTITION BY lang
                                        ORDER BY score, doc_id), 6) AS band
      FROM s)
    SELECT doc_id, lang, score, band FROM r WHERE band >= 0.5
    """,
)
def q_docs_quality_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality banding: score = alpha-character ratio x
    log(1 + word count) (a cheap monotone quality proxy — real pipelines
    plug a model score into the same shape), percentile within language,
    keep the top half. Banding WITHIN strata is the point: an absolute
    threshold starves low-resource languages, a per-stratum percentile
    doesn't.

    percent_rank is computed as (rank-1)/(n-1) with the rank coming from
    :func:`~cdc_worker_spark.operators.sampling.distributed_prefix_sum`
    over a column of ones — the same two-phase range-partitioned form as
    q_docs_pack, so parallelism is not bounded by language cardinality the
    way a per-lang percent_rank window is. (score, doc_id) totally orders
    the rank, so both engines agree exactly."""
    from cdc_worker_spark.operators.sampling import distributed_prefix_sum

    docs = load_table(spark, sf_dir, "documents")
    score = F.round(
        (
            F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
            / F.greatest(F.length("text"), F.lit(1))
        )
        * F.log(F.lit(1) + F.size(F.split("text", " "))),
        6,
    )
    scored = (
        docs.filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select("doc_id", "lang", score.alias("score"))
        .withColumn("_one", F.lit(1).cast("long"))
    )
    counts = scored.groupBy("lang").agg(F.count("*").alias("_n"))
    ranked = distributed_prefix_sum(
        scored, ["lang"], ["score", "doc_id"], "_one", "_rank0"
    )
    band = F.when(F.col("_n") == 1, F.lit(0.0)).otherwise(
        F.round(F.col("_rank0") / (F.col("_n") - 1), 6)
    )
    return (
        ranked.join(F.broadcast(counts), "lang")
        .withColumn("band", band)
        .filter(F.col("band") >= 0.5)
        .select("doc_id", "lang", "score", "band")
    )


@query(
    "q_emb_quantize",
    oracle="""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
               FROM embeddings),
         s AS (SELECT vec_id, dv,
                      127.0 / list_max(list_transform(dv, x -> abs(x))) AS scale
               FROM v
               WHERE list_max(list_transform(dv, x -> abs(x))) > 0)
    SELECT vec_id, round(scale, 6) AS scale_r,
           array_to_string(
             list_transform(dv, x -> CAST(floor(x * scale + 0.5) AS INTEGER)),
             ',') AS qv_csv
    FROM s
    """,
)
def q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column: per-vector scale
    = 127 / max|x|, q = floor(x * scale + 0.5) — explicit half-up rounding
    (floor(x+0.5)) because round() half-even vs half-up differs across
    engines, while floor of exact IEEE products is bitwise identical. A
    pure projection: the 100 TB effect is 4-8x smaller vector storage and
    proportionally cheaper ANN scans, with max dequantization error
    0.5/scale per component."""
    emb = with_double_vec(load_table(spark, sf_dir, "embeddings"))
    max_abs = F.array_max(F.transform("dv", F.abs))
    scale = F.lit(127.0) / F.col("_ma")
    return (
        emb.withColumn("_ma", max_abs)
        .filter(F.col("_ma") > 0)
        .withColumn("_s", scale)
        .select(
            "vec_id",
            F.round("_s", 6).alias("scale_r"),
            # the driver's value-hash covers scalar columns only, so the
            # int8 vector ships as CSV text — full-vector evidence, exact
            F.array_join(
                F.transform(
                    "dv",
                    lambda x: F.floor(x * F.col("_s") + 0.5)
                    .cast("int")
                    .cast("string"),
                ),
                ",",
            ).alias("qv_csv"),
        )
    )
