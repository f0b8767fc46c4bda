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


def quality_score():
    """The cheap monotone quality proxy shared by the standalone banding
    query and the export pipeline: alpha-character ratio x log(1 + word
    count). Real pipelines plug a model score into the same shape."""
    return F.round(
        (
            F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
            / F.greatest(F.length("text"), F.lit(1))
        )
        * F.log(F.lit(1) + F.size(F.split("text", " "))),
        6,
    )


def with_quality_band(scored: DataFrame, part_col: str = "lang") -> DataFrame:
    """Append ``band`` = percent_rank of ``score`` within ``part_col``,
    computed as (rank-1)/(n-1) with the rank coming from
    :func:`~cdc_worker_spark.operators.sampling.distributed_prefix_sum`
    over a column of ones — so parallelism is not bounded by stratum
    cardinality the way a per-stratum percent_rank window is. ``scored``
    must carry (part_col, score, doc_id); (score, doc_id) totally orders
    the rank, so both engines agree exactly. All other columns pass
    through."""
    from cdc_worker_spark.operators.sampling import distributed_prefix_sum

    counts = scored.groupBy(part_col).agg(F.count("*").alias("_n"))
    ranked = distributed_prefix_sum(
        scored.withColumn("_one", F.lit(1).cast("long")),
        [part_col],
        ["score", "doc_id"],
        "_one",
        "_rank0",
    )
    band = F.when(F.col("_n") == 1, F.lit(0.0)).otherwise(
        F.round(F.col("_rank0") / (F.col("_n") - 1), 6)
    )
    return (
        ranked.join(F.broadcast(counts), part_col)
        .withColumn("band", band)
        .drop("_one", "_rank0", "_n")
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

    Score and banding live in :func:`quality_score` /
    :func:`with_quality_band`, shared verbatim with
    q_pipeline_train_export so the two can never drift apart."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    ).select("doc_id", "lang", quality_score().alias("score"))
    return (
        with_quality_band(scored)
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


@query(
    "q_pipeline_train_export",
    oracle="""
    WITH tri AS (
      SELECT DISTINCT doc_id, lang,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents) d,
           LATERAL unnest(range(1, greatest(len(ws) - 1, 1))) AS t(i)
    ),
    flagged AS (
      SELECT DISTINCT doc_id FROM (
        SELECT c.doc_id, e.doc_id AS eid
        FROM tri c JOIN tri e ON c.g = e.g AND c.lang = e.lang
        WHERE e.doc_id < 25 AND c.doc_id >= 25
        GROUP BY 1, 2 HAVING count(*) >= 3)
    ),
    clean AS (
      SELECT doc_id, lang, text FROM documents
      WHERE doc_id >= 25 AND text IS NOT NULL AND length(text) > 0
        AND doc_id NOT IN (SELECT doc_id FROM flagged)
    ),
    scored AS (
      SELECT doc_id, lang,
             round(
               (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                  / greatest(length(text), 1))
               * ln(1 + len(string_split(text, ' '))), 6) AS score,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM clean
    ),
    banded AS (
      SELECT * FROM (
        SELECT doc_id, lang, n_tokens,
               round(percent_rank() OVER (PARTITION BY lang
                                          ORDER BY score, doc_id), 6) AS band
        FROM scored)
      WHERE band >= 0.5
    ),
    train AS (
      SELECT doc_id, lang, n_tokens FROM banded
      WHERE substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'f0'
        AND n_tokens > 0
    ),
    offs AS (
      SELECT doc_id, lang, n_tokens,
             COALESCE(CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                      0) AS start_off
      FROM train
    )
    SELECT doc_id, lang, n_tokens, start_off, start_off // 512 AS first_seq
    FROM offs
    """,
)
def q_pipeline_train_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 curation ops composed end-to-end — the query a training
    run actually executes to materialize its data: benchmark decontamination
    (broadcast anti-join) -> per-language quality banding (top half via the
    distributed prefix-sum percentile) -> deterministic train split (salted
    md5 bucket) -> sequence packing offsets (distributed prefix sum again).
    Every stage is the same primitive its standalone query uses, so the
    whole export is: one broadcast match, two range-partitioned prefix
    sums, and pure projections — no per-group serialization anywhere."""
    from cdc_worker_spark.operators.sampling import (
        PACK_BUDGET,
        distributed_prefix_sum,
        sample_bucket,
    )

    docs = load_table(spark, sf_dir, "documents")
    flagged = (
        q_docs_decontaminate(spark, sf_dir).select("doc_id").distinct()
    )
    clean = (
        docs.filter(
            (F.col("doc_id") >= EVAL_MAX_ID)
            & F.col("text").isNotNull()
            & (F.length("text") > 0)
        )
        .join(F.broadcast(flagged), "doc_id", "left_anti")
    )
    scored = clean.select(
        "doc_id", "lang", quality_score().alias("score"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    # Each distributed_prefix_sum opens with repartitionByRange, whose
    # range-boundary SAMPLING job re-executes everything upstream of it —
    # here that would replay the decontamination join once per prefix sum.
    # A lazy localCheckpoint materializes the (doc_id, lang, score,
    # n_tokens) manifest — scalar columns only, tiny next to the text — so
    # the sampler and the real shuffle both read the materialized rows
    # (measured at sf0.1: 2.53 s -> 2.11 s). Production analogue:
    # persisting the curation manifest between pipeline stages.
    scored = scored.localCheckpoint(eager=False)
    banded = (
        with_quality_band(scored)  # shared with q_docs_quality_band
        .filter(F.col("band") >= 0.5)
        .select("doc_id", "lang", "n_tokens")
    )
    split_bucket = sample_bucket(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
    )
    train = banded.filter((split_bucket < "f0") & (F.col("n_tokens") > 0))
    train = train.localCheckpoint(eager=False)
    b = F.lit(PACK_BUDGET)
    return distributed_prefix_sum(
        train, ["lang"], ["doc_id"], "n_tokens", "start_off"
    ).select(
        "doc_id", "lang", "n_tokens", "start_off",
        F.floor(F.col("start_off") / b).alias("first_seq"),
    )


@query(
    "q_docs_shuffle",
    oracle="""
    WITH k AS (
      SELECT doc_id, lang,
             md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents)
    SELECT doc_id, lang, shuffle_key,
           CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS BIGINT)
             AS seq
    FROM k
    """,
)
def q_docs_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle for training order: every doc
    gets a salted-md5 shuffle key and its GLOBAL position in that order —
    reproducible across runs/engines (no RNG), and resumable (position is a
    pure function of the corpus). The global sequence is the classic scale
    trap (row_number over an empty partition = one task); here it comes
    from :func:`~cdc_worker_spark.operators.sampling.distributed_prefix_sum`
    with NO partition columns — range-partitioned local counts + broadcast
    partition offsets — so the total order materializes with full
    parallelism."""
    from cdc_worker_spark.operators.sampling import distributed_prefix_sum

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", "lang",
        F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    ).withColumn("_one", F.lit(1).cast("long"))
    return distributed_prefix_sum(
        keyed, [], ["shuffle_key", "doc_id"], "_one", "seq"
    ).select("doc_id", "lang", "shuffle_key", "seq")


@query(
    "q_docs_filter_funnel",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.w AS w
      FROM documents, unnest(string_split(text, ' ')) AS t(w)
    ),
    per_word AS (
      SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w
    ),
    per_doc AS (
      SELECT doc_id,
             sum(c) AS nw,
             max(c) AS maxc,
             sum(length(w) * c) * 1.0 / sum(c) AS mwl
      FROM per_word GROUP BY doc_id
    ),
    surv AS (
      SELECT d.doc_id,
             (p.nw >= 25) AS p1,
             (p.mwl >= 4.3) AS p2,
             (p.maxc * 1.0 / p.nw <= 0.12) AS p3,
             (d.doc_id = min(d.doc_id) OVER (
               PARTITION BY md5(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g'))))
             )) AS p4
      FROM documents d JOIN per_doc p USING (doc_id)
    ),
    agg AS (
      SELECT count(*) AS s0,
             sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS s1,
             sum(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS s2,
             sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS s3,
             sum(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END) AS s4
      FROM surv
    )
    SELECT * FROM (
      SELECT CAST(0 AS INT) AS stage_idx, 'total' AS stage,
             CAST(s0 AS BIGINT) AS n_surviving,
             CAST(100.0 AS DOUBLE) AS survival_pct,
             CAST(0 AS BIGINT) AS dropped_from_prev FROM agg
      UNION ALL SELECT 1, 'min_word_count', CAST(s1 AS BIGINT),
             round(s1 * 100.0 / s0, 4), CAST(s0 - s1 AS BIGINT) FROM agg
      UNION ALL SELECT 2, 'mean_word_length', CAST(s2 AS BIGINT),
             round(s2 * 100.0 / s0, 4), CAST(s1 - s2 AS BIGINT) FROM agg
      UNION ALL SELECT 3, 'top_word_ratio', CAST(s3 AS BIGINT),
             round(s3 * 100.0 / s0, 4), CAST(s2 - s3 AS BIGINT) FROM agg
      UNION ALL SELECT 4, 'exact_dedup', CAST(s4 AS BIGINT),
             round(s4 * 100.0 / s0, 4), CAST(s3 - s4 AS BIGINT) FROM agg
    ) ORDER BY stage_idx
    """,
)
def q_docs_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged curation-attrition report — the table every pipeline run
    prints before anyone trusts its output corpus: per filter stage
    (length floor, mean-word-length band, top-word-repetition cap, exact
    dedup), how many documents survive CUMULATIVELY, the survival
    percentage, and the marginal drop attributable to that stage.

    All stage predicates are integer-arithmetic on word counts (ratios are
    single IEEE divisions of exact integers), so engine and oracle agree
    bit-for-bit with no rounding slack needed on the flags themselves.

    100 TB design: ONE corpus scan feeds the (doc, word) histogram (the
    only corpus-scale shuffle, hash-keyed on doc_id), the dup-survivor
    flag shuffles 72-byte digests (same shape as q_dedup_exact), and every
    stage count comes out of ONE conditional aggregation — adding a stage
    is a new CASE column, not a new pass. The output frame is O(stages).
    Reference scope: beyond the reference (LLM-pipeline extension set,
    SURVEY §2.3)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    per_word = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    per_doc = per_word.groupBy("doc_id").agg(
        F.sum("c").alias("nw"),
        F.max("c").alias("maxc"),
        (
            F.sum(F.length("w") * F.col("c")).cast("double") / F.sum("c")
        ).alias("mwl"),
    )
    digest = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    from pyspark.sql import Window

    dup_w = Window.partitionBy("dig")
    flags = (
        docs.select("doc_id", digest.alias("dig"))
        .withColumn("keep_id", F.min("doc_id").over(dup_w))
        .join(per_doc, "doc_id")
        .select(
            (F.col("nw") >= 25).alias("p1"),
            (F.col("mwl") >= 4.3).alias("p2"),
            (F.col("maxc").cast("double") / F.col("nw") <= 0.12).alias("p3"),
            (F.col("doc_id") == F.col("keep_id")).alias("p4"),
        )
    )
    one = F.lit(1).cast("long")
    agg = flags.agg(
        F.count("*").alias("s0"),
        F.sum(F.when(F.col("p1"), one).otherwise(F.lit(0))).alias("s1"),
        F.sum(
            F.when(F.col("p1") & F.col("p2"), one).otherwise(F.lit(0))
        ).alias("s2"),
        F.sum(
            F.when(F.col("p1") & F.col("p2") & F.col("p3"), one).otherwise(
                F.lit(0)
            )
        ).alias("s3"),
        F.sum(
            F.when(
                F.col("p1") & F.col("p2") & F.col("p3") & F.col("p4"), one
            ).otherwise(F.lit(0))
        ).alias("s4"),
    )
    stages = [
        (0, "total", "s0", None),
        (1, "min_word_count", "s1", "s0"),
        (2, "mean_word_length", "s2", "s1"),
        (3, "top_word_ratio", "s3", "s2"),
        (4, "exact_dedup", "s4", "s3"),
    ]
    rows = [
        F.struct(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(cur).cast("bigint").alias("n_surviving"),
            (
                F.lit(100.0).cast("double")
                if prev is None
                else F.round(
                    F.col(cur) * F.lit(100.0) / F.col("s0"), 4
                ).cast("double")
            ).alias("survival_pct"),
            (
                F.lit(0).cast("bigint")
                if prev is None
                else (F.col(prev) - F.col(cur)).cast("bigint")
            ).alias("dropped_from_prev"),
        )
        for i, name, cur, prev in stages
    ]
    return (
        agg.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("stage_idx")
    )
