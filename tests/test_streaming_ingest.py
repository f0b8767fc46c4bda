"""Streaming ingest-dedup loop: batch N+1 must dedup against what batch N
accepted, intra-batch dups must collapse, and rejects must carry match
evidence."""

from __future__ import annotations

import json
import os
import time

from cdc_worker_spark.streaming.ingest import run_dedup_ingest_pipeline


def _write_batch(in_dir: str, name: str, rows: list[dict]) -> None:
    os.makedirs(in_dir, exist_ok=True)
    with open(os.path.join(in_dir, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _doc(doc_id: int, text: str) -> dict:
    return {
        "doc_id": doc_id, "text": text, "lang": "en",
        "source": "s", "n_chars": len(text),
    }


def test_ingest_dedups_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    base = "the quick brown fox jumps over the lazy dog tonight in the park"
    _write_batch(in_dir, "b0.jsonl", [
        _doc(1, base),
        _doc(2, "a totally different document about markets and trading"),
        _doc(3, base.upper()),   # intra-batch exact dup of 1 (normalizes)
    ])
    time.sleep(0.05)  # distinct mtimes => deterministic file order
    _write_batch(in_dir, "b1.jsonl", [
        _doc(10, base),          # exact dup of batch-0's accepted doc 1
        _doc(11, base.replace("dog", "cat")),  # near dup of doc 1
        _doc(12, "entirely novel content about cooking pasta with tomatoes"),
    ])

    q = run_dedup_ingest_pipeline(
        spark,
        input_dir=in_dir,
        index_dir=str(tmp_path / "idx"),
        corpus_dir=str(tmp_path / "corpus"),
        rejects_dir=str(tmp_path / "rejects"),
        checkpoint_dir=str(tmp_path / "chk"),
    )
    q.awaitTermination(120)

    corpus = {r.doc_id for r in spark.read.parquet(str(tmp_path / "corpus")).collect()}
    rejects = {
        r.doc_id: (r.match_id, r.kind)
        for r in spark.read.parquet(str(tmp_path / "rejects")).collect()
    }
    assert corpus == {1, 2, 12}, f"corpus={corpus} rejects={rejects}"
    assert rejects[3] == (1, "exact")      # intra-batch
    assert rejects[10] == (1, "exact")     # cross-batch exact
    assert rejects[11][0] == 1 and rejects[11][1] == "near"  # cross-batch near

    # the extended index now contains exactly the accepted docs
    idx_ids = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "idx" / "digests")).collect()
    }
    assert idx_ids == corpus


def test_replayed_batches_do_not_double_append(spark, tmp_path):
    """Crash-replay semantics: if the engine re-delivers already-committed
    batch ids (fresh checkpoint, same inputs — the post-crash shape), the
    committed-batch ledger turns the replays into no-ops."""
    import shutil

    in_dir = str(tmp_path / "in")
    _write_batch(in_dir, "b0.jsonl", [
        _doc(1, "first unique document about gardens and flowers today"),
    ])
    time.sleep(0.05)
    _write_batch(in_dir, "b1.jsonl", [
        _doc(2, "second unique document about mountains and rivers yesterday"),
    ])
    kw = dict(
        input_dir=in_dir,
        index_dir=str(tmp_path / "idx"),
        corpus_dir=str(tmp_path / "corpus"),
        rejects_dir=str(tmp_path / "rejects"),
        checkpoint_dir=str(tmp_path / "chk"),
    )
    run_dedup_ingest_pipeline(spark, **kw).awaitTermination(120)
    first = sorted(
        r.doc_id for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    )
    assert first == [1, 2]

    # simulate the crash window: Spark's checkpoint is gone (batch ids
    # restart at 0 and everything re-delivers) but the ledger survived
    ledger = (tmp_path / "chk" / "_ingest_committed").read_text()
    shutil.rmtree(tmp_path / "chk")
    (tmp_path / "chk").mkdir()
    (tmp_path / "chk" / "_ingest_committed").write_text(ledger)

    run_dedup_ingest_pipeline(spark, **kw).awaitTermination(120)
    again = sorted(
        r.doc_id for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    )
    assert again == [1, 2], f"replay double-appended: {again}"
