"""Sampling operators for pipeline-scale corpus curation.

A training-data pipeline downsamples by stratum (language, source, quality
band) with REPRODUCIBLE membership: the same document must make the same
in/out decision on every run, engine, and retry — so membership derives from
a content-stable hash of the key, never from an RNG. md5 is the
cross-engine choice here (Spark and DuckDB produce identical hex), and the
comparison happens on the hex string itself, so no integer-parsing
divergence can creep in: doc is kept iff its first two md5 hex digits sort
below the stratum's threshold (256 buckets; threshold '33' ≈ 20%).

Scale: the decision is a pure per-row projection — no shuffle, no sort, no
RNG state; pushdown-friendly (a lang filter above it still prunes at the
scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_table

#: per-language keep-rate as a 2-hex-digit threshold over 256 md5 buckets:
#: 'en' keeps ~50% (0x80/0x100), everything else ~20% (0x33/0x100)
SAMPLE_THRESHOLDS = {"en": "80"}
DEFAULT_THRESHOLD = "33"


def sample_bucket(key: Column) -> Column:
    """Deterministic 2-hex-digit bucket of a key column (256 buckets)."""
    return F.substring(F.md5(key.cast("string")), 1, 2)


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    thresholds: dict[str, str],
    default_threshold: str,
) -> DataFrame:
    """Keep rows whose key-bucket sorts below their stratum's threshold."""
    thr = F.lit(default_threshold)
    for value, t in sorted(thresholds.items()):
        thr = F.when(F.col(stratum) == value, F.lit(t)).otherwise(thr)
    return df.filter(sample_bucket(F.col(key)) < thr)


@query(
    "q_docs_sample_stratified",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE WHEN lang = 'en' THEN '80' ELSE '33' END
    """,
)
def q_docs_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-language downsampling: ~50% of 'en', ~20% of the
    rest, membership stable across runs/engines (md5-hex bucket compare)."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "doc_id", "lang", SAMPLE_THRESHOLDS, DEFAULT_THRESHOLD
    ).select("doc_id", "lang", "source", "n_chars")


@query(
    "q_docs_cap_per_source",
    oracle="""
    SELECT doc_id, source, n_chars, CAST(rn AS INT) AS rn
    FROM (SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS rn
          FROM documents)
    WHERE rn <= 5
    """,
)
def q_docs_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (domain balancing: no single crawl source may
    dominate the corpus): keep the top-5 docs per source by length with a
    deterministic tie-break. Plans as WindowGroupLimit partial+final — each
    executor pre-prunes to its local top-5 per source BEFORE the shuffle, so
    shuffle volume is O(sources x 5), not O(docs)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )


@query(
    "q_pipeline_curation",
    oracle=r"""
    WITH scrub AS (
      SELECT doc_id, lang, source, n_chars,
             regexp_replace(
               regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
                              '<EMAIL>', 'g'),
               '[0-9]{7,}', '<NUM>', 'g') AS text
      FROM documents),
    filt AS (
      SELECT * FROM scrub
      WHERE n_chars >= 100 AND len(string_split(text, ' ')) >= 20),
    canon AS (
      SELECT *, min(doc_id) OVER (
               PARTITION BY sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
             ) AS cluster_id
      FROM filt)
    SELECT doc_id, lang, source, n_chars, text
    FROM canon
    WHERE doc_id = cluster_id
      AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE WHEN lang = 'en' THEN '80' ELSE '33' END
    """,
)
def q_pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operators composed as one curation pipeline — what a user of this
    engine actually runs end-to-end: PII scrub (projection) -> length
    filters (pushable) -> exact-dedup canonicalization (keep the min doc_id
    per normalized digest; one digest shuffle) -> reproducible stratified
    sample (projection). Every stage is a stage from this module family;
    the whole chain stays in two Spark stages (scan+project, digest
    window)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    scrubbed = docs.select(
        "doc_id", "lang", "source", "n_chars",
        F.regexp_replace(
            F.regexp_replace(
                "text", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"
            ),
            "[0-9]{7,}",
            "<NUM>",
        ).alias("text"),
    )
    filt = scrubbed.filter(
        (F.col("n_chars") >= 100) & (F.size(F.split("text", " ")) >= 20)
    )
    digest = F.sha2(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), 256)
    canon = filt.withColumn(
        "cluster_id", F.min("doc_id").over(Window.partitionBy(digest))
    )
    kept = canon.filter(F.col("doc_id") == F.col("cluster_id"))
    return stratified_sample(
        kept, "doc_id", "lang", SAMPLE_THRESHOLDS, DEFAULT_THRESHOLD
    ).select("doc_id", "lang", "source", "n_chars", "text")


@query(
    "q_docs_split",
    oracle="""
    SELECT doc_id, lang, source,
           CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'f0'
                  THEN 'train'
                WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'f8'
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_docs_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~94%/3%/3%) from a salted
    md5 bucket of the doc key — the same document lands in the same split on
    every run, engine, and corpus revision, and membership never depends on
    row order or an RNG (the property leakage audits need). Pure projection:
    no shuffle, no state; the salt ('split:') decorrelates it from the
    sampling buckets above so split and sample decisions are independent."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = sample_bucket(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
    return docs.select(
        "doc_id", "lang", "source",
        F.when(bucket < "f0", "train")
        .when(bucket < "f8", "val")
        .otherwise("test")
        .alias("split"),
    )


#: tokens per packed training sequence (context window) for q_docs_pack
PACK_BUDGET = 512


def distributed_prefix_sum(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str,
) -> DataFrame:
    """EXCLUSIVE running sum of ``value_col`` per ``part_cols`` group in
    ``order_cols`` order — the two-phase distributed prefix sum.

    A plain ``Window.partitionBy(part_cols)`` cumsum funnels each group
    through ONE task, so parallelism is bounded by group cardinality (5
    languages -> 5 tasks at 100 TB). Here rows range-partition on
    (part_cols, order_cols) — globally ordered partitions — then:

    1. local exclusive cumsum per (group, partition) window: parallel across
       ALL partitions;
    2. per-(group, partition) totals (tiny: one row per partition per
       group present in it) get their own exclusive cumsum over partition id
       — the cross-partition offsets;
    3. offsets broadcast-join back; final = local + offset.

    Values are boundary-independent (where the range partitioner cuts never
    changes any prefix), so results are identical to the single-window form
    — only the physical parallelism changes.

    The ranged frame is MATERIALIZED (eager localCheckpoint) before the two
    consumers read it. This is load-bearing, not an optimization: the
    ``local`` and ``offsets`` subtrees both consume the range exchange, and
    without pinning, each consumer can observe a DIFFERENT physical
    partitioning — the range partitioner re-samples boundaries per
    execution, and AQE may coalesce the two reads differently — so
    ``spark_partition_id()`` stops being one consistent value per row and
    local+offset composes garbage (duplicate/gapped ranks). sf0.01 never
    triggered it; the sf1 validation did (q_docs_shuffle hash mismatch,
    r5). Cost: one linear materialization of the ranged table; at cluster
    scale the equivalent is staging the ranged table before the two
    window passes."""
    from pyspark.sql import Window

    # NB: no df.rdd.getNumPartitions() here — under AQE, touching .rdd
    # materializes the final plan by EXECUTING the upstream stages, so a
    # composed pipeline would run its expensive prefix (e.g. the
    # decontamination join) once per prefix-sum call just to read a
    # partition count (measured: 5.9 s -> 2.6 s for q_pipeline_train_export
    # at sf0.1). A fixed multiple of defaultParallelism gives the range
    # partitioner all the spread it needs at any scale.
    n_parts = df.sparkSession.sparkContext.defaultParallelism * 2
    # DISK_ONLY (r12): the ranged frame is FACT-SCALE, and the default
    # MEMORY_AND_DISK localCheckpoint pinned ~40 B/row of deserialized
    # InternalRows in the block manager's PROTECTED storage region —
    # ~25 GB at sf100's 600M-row lineitem — which execution memory
    # cannot evict; the unmanaged remainder (parquet readers, codegen
    # scratch) then threw the r10->r12 "memory creep" OOMs
    # (SCALE.md §r12 post-mortem: 14 g -> 28 g -> none-sufficient as
    # consumers were added round over round). DISK_ONLY streams blocks
    # straight to local disk with NO memory unroll and pins zero heap;
    # both window consumers re-read serialized blocks, which is the
    # same I/O MEMORY_AND_DISK was already doing for the overflow
    # majority of partitions at any realistic heap. Measured: the
    # range-bounds builder+bespoke goes OOM-at-14g -> passes at 6g
    # (scripts/probe_memory_creep.py grid, SCALE.md §r12).
    from pyspark import StorageLevel

    ranged = (
        df.repartitionByRange(n_parts, *part_cols, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    w_local = (
        Window.partitionBy(*part_cols, "_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "_local", F.coalesce(F.sum(value_col).over(w_local), F.lit(0))
    )
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        ranged.groupBy(*part_cols, "_pid")
        .agg(F.sum(value_col).alias("_ptot"))
        .withColumn("_off", F.coalesce(F.sum("_ptot").over(w_off), F.lit(0)))
        .select(*part_cols, "_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), [*part_cols, "_pid"])
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )


@query(
    "q_docs_pack",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    offs AS (
      SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS BIGINT) AS raw_off
      FROM toks)
    SELECT doc_id, lang, n_tokens,
           COALESCE(raw_off, 0) AS start_off,
           COALESCE(raw_off, 0) // 512 AS first_seq,
           (COALESCE(raw_off, 0) + n_tokens - 1) // 512 AS last_seq
    FROM offs
    WHERE n_tokens > 0
    """,
)
def q_docs_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (the standard LLM pre-training
    prep): per language, documents concatenate in doc_id order into one
    token stream that is cut into fixed 512-token sequences; each doc maps
    to its token offset and the [first_seq, last_seq] range it spans.

    The running total uses :func:`distributed_prefix_sum`, NOT a plain
    per-lang window — a per-lang window funnels each language through one
    task (parallelism 5 at 100 TB); the two-phase form keeps every
    partition busy and produces identical values (oracle-checked against
    the single-window SQL)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    b = F.lit(PACK_BUDGET)
    return (
        distributed_prefix_sum(toks, ["lang"], ["doc_id"], "n_tokens", "start_off")
        .filter(F.col("n_tokens") > 0)
        .select(
            "doc_id", "lang", "n_tokens", "start_off",
            F.floor(F.col("start_off") / b).alias("first_seq"),
            F.floor((F.col("start_off") + F.col("n_tokens") - 1) / b).alias("last_seq"),
        )
    )


@query(
    "q_docs_sample_weighted",
    oracle="""
    SELECT doc_id, lang, source, n_chars, priority
    FROM (
      SELECT doc_id, lang, source, n_chars,
             (CAST(n_chars AS BIGINT) * 1099511627776)
               // greatest(CAST('0x' ||
                    substring(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 10)
                    AS BIGINT), 1) AS priority
      FROM documents) t
    ORDER BY priority DESC, doc_id
    LIMIT 100
    """,
)
def q_docs_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement by PRIORITY SAMPLING
    (Duffield, Lund & Thorup, JACM 2007): each doc gets priority w/u with
    w = its length and u a uniform draw; the k largest priorities are a
    weighted sample whose subset-sum estimates are provably near-optimal.

    Determinism contract: u comes from a salted md5 of the doc key (40-bit
    integer H), and the priority is computed in EXACT integer arithmetic —
    (w << 40) div H — so Spark and the oracle agree bit-for-bit; no float
    pow/log (whose libm rounding differs across engines) touches the
    ranking. Pure projection + TakeOrderedAndProject top-k: no shuffle, no
    RNG state, reproducible across runs, engines, and retries."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string"))),
            1,
            10,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        docs.select("doc_id", "lang", "source", "n_chars")
        .withColumn("_h", F.greatest(h, F.lit(1)))
        .withColumn(
            "priority",
            F.expr("CAST(n_chars AS BIGINT) * 1099511627776L div _h"),
        )
        .drop("_h")
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(100)
    )
