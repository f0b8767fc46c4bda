"""Streaming corpus ingest with incremental dedup: each micro-batch of
documents probes the materialized dedup index (operators/dedup_index.py),
rejected docs land in an audit table with their match evidence, accepted
docs append to the corpus AND to the index — so batch N+1 dedups against
everything batch N accepted.

This is the ingest loop a 100 TB corpus actually runs: dedup state lives in
the compact on-disk index (digests + MinHash sigs + band keys), never in
executor memory, so the stream's state size is O(1) and a restart resumes
from the checkpoint with the index already current (extend is idempotent per
Spark's exactly-once foreachBatch contract only if the batch write is
atomic — accepted/index appends happen before the checkpoint commit, giving
at-least-once appends; the downstream exact-dedup pass absorbs replays,
which is the standard idempotence recipe for append-only corpus sinks).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.operators.dedup_index import (
    _digest,
    build_dedup_index,
    extend_dedup_index,
    probe_dedup_index,
)

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def dedup_batch_against_index(
    spark: SparkSession, index_dir: str, batch: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(accepted, rejected) split of a document batch.

    Three passes over the dedupable (non-NULL, non-empty text) docs:
    (1) intra-batch EXACT dedup — keep the smallest doc_id per normalized
    digest (a batch can contain its own duplicates, which the index cannot
    know about yet); (2) intra-batch NEAR dedup — LSH band self-join +
    signature-estimate verify among the exact survivors, keep the smaller
    doc_id of each near pair (greedy: a chain A~B~C keeps A, rejects B
    against A and C against B); (3) index probe for exact/near matches
    against everything previously accepted. The batch's shingle/signature
    derivatives are computed ONCE and shared by passes 2 and 3.

    NULL/empty-text docs cannot be deduplicated (a NULL digest matches
    nothing cross-batch) and pass straight through as accepted — grouping
    their NULL digests would wrongly collapse distinct empty docs.

    Probe hits of kind 'replay' (a doc matching its own id — the post-crash
    re-delivery of an already-ingested batch) are dropped from BOTH sides:
    the doc is already in the corpus, and it is not a duplicate of anything.

    ``rejected`` carries the match evidence (match_id, kind, score)."""
    from cdc_worker_spark.operators.dedup import (
        _MINHASH_K,
        minhash_band_table,
        minhash_signatures_from_tokens,
        shingles_distinct,
    )

    dedupable = batch.filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    passthrough = batch.filter(
        F.col("text").isNull() | (F.length("text") == 0)
    )

    # pass 1: intra-batch exact
    w = Window.partitionBy("_h").orderBy("doc_id")
    intra = (
        dedupable.withColumn("_h", _digest())
        .withColumn("_rn", F.row_number().over(w))
    )
    intra_dups = (
        intra.withColumn("_first", F.min("doc_id").over(Window.partitionBy("_h")))
        .filter(F.col("_rn") > 1)
        .select(
            *batch.columns,
            F.col("_first").alias("match_id"),
            F.lit("exact").alias("kind"),
            F.lit(1.0).alias("score"),
        )
    )
    ex_survivors = intra.filter(F.col("_rn") == 1).select(*batch.columns, "_h")

    # batch derivatives, computed once (review finding: probe recomputed
    # the shingle/signature work per join branch)
    b_digests = ex_survivors.select("doc_id", F.col("_h").alias("text_hash"))
    ex_survivors = ex_survivors.drop("_h").localCheckpoint(eager=True)
    tok = shingles_distinct(ex_survivors).withColumnRenamed("g", "w")
    b_sigs = minhash_signatures_from_tokens(tok).localCheckpoint(eager=True)
    b_bands = minhash_band_table(b_sigs)

    # pass 2: intra-batch near (same banding + estimate as the index verify)
    x = b_bands.select("band_idx", "band_val", F.col("doc_id").alias("doc_a"))
    y = b_bands.select("band_idx", "band_val", F.col("doc_id").alias("doc_b"))
    pairs = (
        x.join(y, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    agree = sum(
        F.when(F.col(f"ha{k}") == F.col(f"hb{k}"), 1).otherwise(0)
        for k in range(_MINHASH_K)
    )
    sa = b_sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{k}").alias(f"ha{k}") for k in range(_MINHASH_K)],
    )
    sb = b_sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{k}").alias(f"hb{k}") for k in range(_MINHASH_K)],
    )
    near_pairs = (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("score", (agree / F.lit(float(_MINHASH_K))).cast("double"))
        .filter(F.col("score") >= 0.5)
    )
    near_best = (
        near_pairs.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("doc_b").orderBy(
                    F.col("score").desc(), F.col("doc_a")
                )
            ),
        )
        .filter(F.col("_rk") == 1)
        .select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("match_id"),
            "score",
        )
        .localCheckpoint(eager=True)
    )
    intra_near = ex_survivors.join(F.broadcast(near_best), "doc_id").select(
        *batch.columns,
        "match_id",
        F.lit("near").alias("kind"),
        "score",
    )
    survivors = ex_survivors.join(
        F.broadcast(near_best.select("doc_id")), "doc_id", "left_anti"
    )
    kept_ids = F.broadcast(survivors.select("doc_id"))

    # pass 3: index probe, reusing the derivatives restricted to survivors
    hits = probe_dedup_index(
        spark,
        index_dir,
        survivors,
        frames=(
            b_digests.join(kept_ids, "doc_id"),
            b_sigs.join(kept_ids, "doc_id"),
            b_bands.join(kept_ids, "doc_id"),
        ),
    )
    # one verdict per doc: replay beats exact beats near, then best score
    best = (
        hits.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.when(F.col("kind") == "replay", 0)
                    .when(F.col("kind") == "exact", 1)
                    .otherwise(2),
                    F.col("score").desc(),
                    F.col("match_id"),
                )
            ),
        )
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    index_rejects = (
        survivors.join(F.broadcast(best), "doc_id")
        .filter(F.col("kind") != "replay")  # already ingested: not a dup
        .select(*batch.columns, "match_id", "kind", "score")
    )
    accepted = survivors.join(
        F.broadcast(best.select("doc_id")), "doc_id", "left_anti"
    ).unionByName(passthrough)
    return accepted, intra_dups.unionByName(intra_near).unionByName(index_rejects)


def run_dedup_ingest_pipeline(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    corpus_dir: str,
    rejects_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = 1,
    available_now: bool = True,
):
    """Stream jsonl document batches from ``input_dir`` through the
    probe -> split -> append -> extend loop. Bootstraps an empty index when
    ``index_dir`` does not exist yet."""
    from cdc_worker_spark.operators.index_layout import table_exists

    if not table_exists(index_dir, "digests"):
        build_dedup_index(
            spark.createDataFrame([], DOC_SCHEMA), index_dir
        )
    os.makedirs(checkpoint_dir, exist_ok=True)

    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(input_dir)

    committed_path = os.path.join(checkpoint_dir, "_ingest_committed")

    def _committed() -> set[int]:
        try:
            with open(committed_path) as fh:
                return {int(line) for line in fh if line.strip()}
        except FileNotFoundError:
            return set()

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: after a crash between the sink
        # writes and the checkpoint commit, the same batch_id replays. The
        # committed-batch ledger makes the replay a no-op, so corpus/index
        # appends are effectively exactly-once (the ledger write is the
        # last step; a crash before it re-runs the batch, whose duplicate
        # corpus rows the downstream exact dedup absorbs — the narrow
        # remaining window of the standard recipe).
        if batch_id in _committed():
            return
        accepted, rejected = dedup_batch_against_index(
            spark, index_dir, batch_df
        )
        # materialize the split BEFORE mutating the index: both sides derive
        # from the same probe joins, and extending first would change what a
        # recomputed `accepted` sees
        accepted = accepted.localCheckpoint(eager=True)
        rejected.write.mode("append").parquet(rejects_dir)
        accepted.write.mode("append").parquet(corpus_dir)
        # batch_id as the idempotency token: if the ledger write below
        # crashes and the batch replays, the index extend is a no-op at
        # the segment layer too (exactly-once, not just at-least-once)
        extend_dedup_index(accepted, index_dir, token=f"b{batch_id}")
        with open(committed_path, "a") as fh:
            fh.write(f"{batch_id}\n")

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
