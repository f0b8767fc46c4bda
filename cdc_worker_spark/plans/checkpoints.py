"""Disk-backed lineage checkpoints for iterative operators.

Iterative DataFrame algorithms (cc_star, the pagerank family, pointer-jump
CC) must TRUNCATE lineage every round — otherwise the logical plan doubles
per round and the driver dies just analyzing it (the r3 lesson: persist
caches data, not plan size). ``localCheckpoint`` truncates, but it pins the
materialized blocks in the executors' block managers: storage memory that
the iteration's own shuffles then compete with, and state that is simply
LOST when an executor dies — Spark's own docs mark localCheckpoint unsafe
under dynamic allocation. At 1000 executors node loss is routine and memory
is the contended resource, so the production pattern for iterative graph
state is a RELIABLE checkpoint to the cluster filesystem (GraphX's
PeriodicGraphCheckpointer is exactly this; on a real cluster the spill root
below would be an HDFS/object-store path).

``disk_checkpoint`` is that pattern in one call: write the frame to parquet
under a session-scoped spill root, read it back. The returned frame's plan
is a leaf parquet scan — zero heap pinned, accurate size statistics for the
planner (an aggregate's output has no estimate, a parquet scan does), and
each round's state survives any executor. Round 6 evidence: with
localCheckpoint the sf1 contract sweep in Spark's vanilla 1 GB heap OOMed
the shared local-mode JVM inside the graph queries; with disk checkpoints
the full 180-query sweep passes (scripts/drive_contract.py --hash-mode
streamed, SCALE.md round-6 section).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame

_ROOT: str | None = None


def _spill_root() -> str:
    """Lazily created per-process spill directory, removed at exit. On a
    real cluster this would be a job-scoped object-store prefix instead."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="cdcspark-ckpt-")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def disk_checkpoint(df: DataFrame, tag: str = "state") -> DataFrame:
    """Materialize ``df`` to parquet and return a leaf-scan frame over it.

    Eager (the write is an action). Schema is re-applied on read so an
    empty frame (zero part files) round-trips with its schema intact.
    """
    path = os.path.join(_spill_root(), f"{tag}-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.schema(df.schema).parquet(path)


def lazy_spill_checkpoint(df: DataFrame, tag: str = "state") -> DataFrame:
    """Lineage truncation WITHOUT an eager materialization job: a lazy
    ``localCheckpoint`` at ``StorageLevel.DISK_ONLY``.

    Same plan-size-O(1) property as :func:`disk_checkpoint`, but the state
    materializes inside the consuming action (no separate write+read job
    per checkpoint) and every downstream reference shares the one
    materialized RDD — the fix for iteration bodies that reference their
    state 2-3 times (pagerank_general's dangling-mass + contribution +
    carry reads re-executed the un-checkpointed tail combinatorially:
    its final plan held 72 Exchanges for 2 un-checkpointed iterations).
    DISK_ONLY per the r12 memory-creep policy: zero heap pinned, so
    O(corpus) frames never starve execution memory (SCALE.md §r12).

    Trade-off vs :func:`disk_checkpoint`: blocks live on executor-local
    disk, so state is lost on executor death and the whole lineage re-runs
    (Spark docs mark localCheckpoint unsafe under dynamic allocation).
    Right for BENCH/single-box iteration state and for iterative loops
    whose restart-from-scratch cost is acceptable; long multi-hour jobs on
    lossy clusters should keep the reliable parquet form (r12 measured at
    sf0.1: pagerank 6.3 s -> 5.2 s, directed 5.2 s -> 4.8 s swapping forms;
    both bit-equal at 9dp).

    r13 (ADVICE r12): that deployment choice is now a RUNTIME switch, not
    an edit — ``SPARK_GRAFT_RELIABLE_CHECKPOINTS=1`` routes every call
    site through :func:`disk_checkpoint` (reliable parquet, survives
    executor death / dynamic allocation), mirroring the
    SPARK_GRAFT_PREFER_SMJ escape hatch. Default stays the lazy DISK_ONLY
    form: correct for the single-box bench and for restartable iteration."""
    if os.environ.get("SPARK_GRAFT_RELIABLE_CHECKPOINTS", "").lower() in (
        "1",
        "true",
        "yes",
    ):
        return disk_checkpoint(df, tag)
    from pyspark import StorageLevel

    return df.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
