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

    Two passes: (1) intra-batch exact dedup (keep the smallest doc_id per
    normalized digest — a batch can contain its own duplicates, which the
    index cannot know about yet); (2) index probe for exact + near matches
    against everything previously accepted. ``rejected`` carries the match
    evidence (match_id, kind, score)."""
    w = Window.partitionBy("_h").orderBy("doc_id")
    intra = (
        batch.withColumn("_h", _digest())
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
    survivors = intra.filter(F.col("_rn") == 1).select(*batch.columns)

    hits = probe_dedup_index(spark, index_dir, survivors)
    # one verdict per doc: best match (exact over near, then highest score)
    best = (
        hits.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.when(F.col("kind") == "exact", 0).otherwise(1),
                    F.col("score").desc(),
                    F.col("match_id"),
                )
            ),
        )
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    index_rejects = survivors.join(
        F.broadcast(best), "doc_id"
    ).select(*batch.columns, "match_id", "kind", "score")
    accepted = survivors.join(
        F.broadcast(best.select("doc_id")), "doc_id", "left_anti"
    )
    return accepted, intra_dups.unionByName(index_rejects)


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
    if not os.path.isdir(os.path.join(index_dir, "digests")):
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
        extend_dedup_index(accepted, index_dir)
        with open(committed_path, "a") as fh:
            fh.write(f"{batch_id}\n")

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
