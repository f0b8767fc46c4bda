"""Structured Streaming pipeline (SURVEY §7 M3): file-source CDC stream ->
decode/enrich -> watermarked dedup -> foreachBatch latest-wins merge + DLQ.

Reference mapping:
- A1-A4 source presets  : ``startingOffsets``/checkpoint restore; here a file
  source whose checkpoint IS the replay cursor (A3/A6) — restart resumes
  exactly after the last committed batch.
- A5 flow control       : ``maxFilesPerTrigger`` (declarative backpressure vs
  the reference's 100-event fetch batches, client.js:49).
- D1/D2 upsert/delete   : latest-wins MERGE per record key in foreachBatch.
- D4 dedup              : dropDuplicatesWithinWatermark on replay_id.
- D7/O5 ordered apply   : within-batch ordering by (commit_ts, replay_id)
  window before the merge — sort within key, not global.
- C4/D10 DLQ            : corrupt payloads appended to a failures table;
  the stream continues.

State storage: versioned parquet snapshots with a _VERSION pointer (an
explicit, dependency-free stand-in for a Delta/Iceberg MERGE target — the
production swap-in is ``MERGE INTO state USING batch ON key``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.streaming.envelope import ENVELOPE_SCHEMA, decode_envelope


def read_event_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """File-source CDC stream of JSON-line envelopes (A1; A5 backpressure via
    maxFilesPerTrigger)."""
    reader = spark.readStream.schema(ENVELOPE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(input_dir)


@dataclass
class LatestWinsState:
    """Versioned parquet latest-wins table (the foreachBatch MERGE target)."""

    path: str

    def _version_file(self) -> str:
        return os.path.join(self.path, "_VERSION")

    def current_version(self) -> int:
        try:
            with open(self._version_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def read(self, spark: SparkSession) -> DataFrame | None:
        v = self.current_version()
        if v < 0:
            return None
        return spark.read.parquet(os.path.join(self.path, f"v{v}"))

    def write(self, df: DataFrame) -> None:
        v = self.current_version() + 1
        df.write.mode("overwrite").parquet(os.path.join(self.path, f"v{v}"))
        os.makedirs(self.path, exist_ok=True)
        with open(self._version_file(), "w") as f:
            f.write(str(v))


def _latest_per_key(df: DataFrame) -> DataFrame:
    """D7 ordered apply collapsed to its effect: the latest row per record key
    by (commit_ts, replay_id) — sort within key, never a global sort."""
    w = Window.partitionBy("entity", "record_id").orderBy(
        F.col("commit_ts").desc(), F.col("replay_id").desc()
    )
    return df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def merge_latest_wins(state: LatestWinsState, batch_df: DataFrame) -> None:
    """D1/D2: upsert batch into state, latest wins; DELETE drops the key.

    Idempotent under redelivery: replaying events <= the stored replay id
    cannot change the outcome (latest-wins is monotone in (commit_ts,
    replay_id)) — the D4 guarantee without per-row bookkeeping.
    """
    spark = batch_df.sparkSession
    batch_latest = _latest_per_key(batch_df)
    existing = state.read(spark)
    merged = (
        batch_latest
        if existing is None
        else _latest_per_key(existing.unionByName(batch_latest))
    )
    # apply deletes last: a key whose latest change is DELETE leaves the table
    state.write(merged.filter(F.col("change_type") != "DELETE"))


def bootstrap_from_snapshot(
    snapshot_df: DataFrame, state_dir: str, snapshot_replay_id: int
) -> LatestWinsState:
    """D5 boot sequence (reference design doc:211-259): bulk-load a source
    snapshot into the latest-wins state table, stamped with the replay id
    captured BEFORE the snapshot was taken. Resume the stream with
    ``run_cdc_pipeline(..., start_after_replay_id=snapshot_replay_id)`` —
    events at or before the stamp are skipped (already reflected in the
    snapshot), later events apply on top; latest-wins makes the overlap
    window idempotent.

    ``snapshot_df`` columns: entity, record_id, commit_ts, event (the record
    struct). Synthesized rows carry change_type CREATE and the stamp as
    replay_id, so ordinary merge semantics handle them.
    """
    state = LatestWinsState(state_dir)
    stamped = snapshot_df.select(
        F.lit(snapshot_replay_id).cast("decimal(20,0)").alias("replay_id"),
        "commit_ts",
        "entity",
        "record_id",
        F.lit("CREATE").alias("change_type"),
        F.lit(None).cast("string").alias("txn_key"),
        F.lit(None).cast("int").alias("seq_no"),
        F.lit(None).cast("array<string>").alias("changed_fields"),
        "event",
    )
    merge_latest_wins(state, stamped)
    return state


def stale_topics(
    state_df: DataFrame, now_ts, max_age_hours: int = 70
) -> DataFrame:
    """D6 staleness / gap detection (design doc:306,376,1325-1348): per entity,
    the latest applied commit_ts; entities older than the resync threshold
    (70 h against the 72 h retention window) are flagged for full resync —
    the batch analogue of the daily resync cron."""
    age_limit = F.lit(max_age_hours * 3600)
    return (
        state_df.groupBy("entity")
        .agg(F.max("commit_ts").alias("last_commit_ts"))
        .withColumn(
            "needs_full_resync",
            F.unix_timestamp(F.lit(now_ts)) - F.unix_timestamp("last_commit_ts")
            > age_limit,
        )
    )


def run_cdc_pipeline(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    dlq_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = 1,
    available_now: bool = True,
    start_after_replay_id: int | None = None,
):
    """Wire the full pipeline and start it (availableNow for tests — drains
    the backlog then stops; drop it for a continuous trigger).

    Flow: stream -> decode (one native projection) -> [A3 offset filter] ->
    DLQ split -> watermark + dropDuplicatesWithinWatermark on replay_id (D4)
    -> foreachBatch merge (D1).
    """
    decoded = decode_envelope(read_event_stream(spark, input_dir, max_files_per_trigger))
    if start_after_replay_id is not None:
        # A3 subscribeFromReplayId: corrupt rows pass through (their offset
        # still decodes, but they must reach the DLQ regardless of position)
        decoded = decoded.filter(
            (F.col("replay_id") > F.lit(start_after_replay_id).cast("decimal(20,0)"))
            | F.col("is_corrupt")
        )

    state = LatestWinsState(state_dir)
    select_cols = [
        "replay_id",
        "commit_ts",
        "entity",
        "record_id",
        "change_type",
        "txn_key",
        "seq_no",
        "changed_fields",
        "event",
    ]

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            # C4/D10: corrupt events to the dead-letter table, stream continues
            (
                batch_df.filter("is_corrupt")
                .select(
                    "replay_id",
                    F.col("schema_id"),
                    F.col("raw_payload"),
                    F.lit("payload JSON decode failed").alias("error"),
                    F.current_timestamp().alias("failed_at"),
                )
                .write.mode("append")
                .parquet(dlq_dir)
            )
            good = batch_df.filter(~F.col("is_corrupt")).select(*select_cols)
            merge_latest_wins(state, good)
        finally:
            batch_df.unpersist()

    stream = (
        decoded.withWatermark("commit_ts", watermark)
        .dropDuplicatesWithinWatermark(["replay_id"])
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        stream = stream.trigger(availableNow=True)
    return stream.start()
