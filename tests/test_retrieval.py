"""Batch BM25 (operators/retrieval.bm25_topk_batch): per-query results must
equal the single-query reference (operators/traindata.bm25_topk) run in a
loop — same docs, same n_hit, same rounded scores, same top-k cut — and the
plan must stay join-broadcast-shaped: the corpus is scanned once into the
slim checkpoint, never sort-merge-joined, never sent through Python."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_worker_spark.operators.retrieval import (
    BM25_BATCH_PROBES,
    bm25_topk_batch,
    q_text_bm25_batch,
)
from cdc_worker_spark.operators.traindata import bm25_topk
from cdc_worker_spark.sources.tables import load_table

from tests.conftest import SF_DIR

K = 10


def _probe_set(spark, n_probes: int = 20):
    """n_probes deterministic probes drawn from the fixture's own frequent
    vocabulary (so hits exist), plus edge probes: a no-hit term and a
    duplicated term (multiplicity must not re-weight)."""
    docs = load_table(spark, SF_DIR, "documents")
    top = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter((F.col("w") != "") & (F.length("w") >= 3))
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), "w")
        .limit(3 * n_probes)
        .collect()
    )
    vocab = [r["w"] for r in top]
    probes = []
    for i in range(n_probes - 2):
        terms = [vocab[(3 * i + j) % len(vocab)] for j in range(3)]
        probes.append((i + 1, " ".join(dict.fromkeys(terms))))
    probes.append((n_probes - 1, f"zzz-absent-term {vocab[0]}"))
    probes.append((n_probes, f"{vocab[1]} {vocab[1]} {vocab[2]}"))
    return probes


def test_batch_equals_per_query_loop(spark):
    probes = _probe_set(spark, 20)
    docs = load_table(spark, SF_DIR, "documents")
    batch = bm25_topk_batch(
        spark.createDataFrame(probes, "query_id: int, query_text: string"),
        docs,
        k=K,
    )
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["n_hit"], r["bm25"])
        )
    for qid, text in probes:
        terms = tuple(dict.fromkeys(t for t in text.split(" ") if t))
        want = [
            (r["doc_id"], r["n_hit"], r["bm25"])
            for r in bm25_topk(docs, terms=terms, k=K).collect()
        ]
        have = sorted(
            got.get(qid, []), key=lambda t: (-t[2], t[0])
        )
        assert have == want, f"probe {qid} ({text!r}): {have} != {want}"


def test_batch_registered_query_runs(spark):
    out = q_text_bm25_batch(spark, SF_DIR)
    rows = out.collect()
    qids = {r["query_id"] for r in rows}
    # the all-but-one-absent-term probe still ranks on its live term
    assert 5 in qids
    assert {q for q, _ in BM25_BATCH_PROBES} >= qids
    for r in rows:
        assert r["n_hit"] >= 1


def test_batch_empty_query_set(spark):
    """Zero probes (and zero non-empty terms) must return an empty frame
    with the output schema, not an unplannable zero-arg array literal."""
    docs = load_table(spark, SF_DIR, "documents")
    for rows in ([], [(1, ""), (2, "  ")]):
        probes = spark.createDataFrame(
            rows, "query_id: int, query_text: string"
        )
        out = bm25_topk_batch(probes, docs, k=K)
        assert out.columns == ["query_id", "doc_id", "n_hit", "bm25"]
        assert out.count() == 0


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["n_hit"], r["bm25"])
        for r in df.collect()
    )


def test_semijoin_equals_literal_small(spark):
    probes = spark.createDataFrame(
        _probe_set(spark, 20), "query_id: int, query_text: string"
    )
    docs = load_table(spark, SF_DIR, "documents")
    lit = bm25_topk_batch(probes, docs, k=K, vq_mode="literal")
    semi = bm25_topk_batch(probes, docs, k=K, vq_mode="semijoin")
    assert _rows(semi) == _rows(lit)


def test_semijoin_equals_literal_large_vq_and_auto_gate(spark):
    """The verdict's 'done' bar: a synthetic >=5k-term probe set runs
    through both branches with identical results, and auto mode picks the
    semijoin branch (no giant literal reaches the plan)."""
    docs = load_table(spark, SF_DIR, "documents")
    top = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter("w <> ''")
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), "w")
        .limit(200)
        .collect()
    )
    vocab = [r["w"] for r in top]
    probes = []
    marker = "zzqqmarkerterm0"
    for i in range(520):
        live = [vocab[(i + j) % len(vocab)] for j in range(3)]
        # ~10 synthetic absent terms per probe push |V_q| past 5k
        absent = [f"zzqqmarkerterm{10 * i + j}" for j in range(10)]
        probes.append((i + 1, " ".join(live + absent)))
    pdf = spark.createDataFrame(probes, "query_id: int, query_text: string")
    lit = bm25_topk_batch(pdf, docs, k=5, vq_mode="literal")
    auto = bm25_topk_batch(pdf, docs, k=5, vq_mode="auto")
    plan = auto._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert marker not in plan, "auto mode inlined the large V_q as a literal"
    assert _rows(auto) == _rows(lit)


def test_semijoin_plan_single_scan_no_python(spark):
    """Same plan contract as the literal branch: the corpus is scanned
    once (shielded by the tf-level checkpoint), joins broadcast, nothing
    goes through Python, wide exchanges stay O(docs + hits)-scale."""
    probes = spark.createDataFrame(
        _probe_set(spark, 20), "query_id: int, query_text: string"
    )
    docs = load_table(spark, SF_DIR, "documents")
    df = bm25_topk_batch(probes, docs, k=K, vq_mode="semijoin")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    tree = plan.split("\n(1)")[0]
    assert plan.count("documents.parquet") == 0, plan
    assert "SortMergeJoin" not in tree and "ShuffledHashJoin" not in tree
    assert "ArrowEvalPython" not in tree and "BatchEvalPython" not in tree
    assert "BroadcastHashJoin" in tree
    wide = tree.count("Exchange") - tree.count("BroadcastExchange")
    assert wide <= 7, tree


def test_batch_plan_single_scan_broadcast_joins(spark):
    """The corpus reaches the plan exactly once (the slim lazily-
    checkpointed projection — downstream consumers read that RDD, so
    documents.parquet itself never reappears), every join against the
    query-side tables broadcasts, no Python eval, and no exchange carries
    corpus-scale rows: the remaining wide exchanges are hit-scale (tf,
    dfreq, per-(query,doc) scoring, per-query window) or tiny (query-term
    distinct, 1-row stats)."""
    df = q_text_bm25_batch(spark, SF_DIR)
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = qe.explainString(mode)
    tree = plan.split("\n(1)")[0]
    assert plan.count("documents.parquet") == 0, plan
    assert "SortMergeJoin" not in tree and "ShuffledHashJoin" not in tree
    assert "ArrowEvalPython" not in tree and "BatchEvalPython" not in tree
    assert "BroadcastHashJoin" in tree
    wide = tree.count("Exchange") - tree.count("BroadcastExchange")
    assert wide <= 6, tree
