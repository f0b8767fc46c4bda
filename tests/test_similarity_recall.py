"""Recall checks for the approximate similarity paths (LSH tables, IVF
probing) against the exact brute-force top-k. The synthetic embeddings are
near-random (best cosine ~0.33), so absolute recall is structurally low —
these gates catch an ANN variant that returns garbage (zero overlap with the
exact answer, malformed shape), not tuned recall; on clustered real data the
same operators' recall tracks nprobe / table count."""

from __future__ import annotations

from cdc_worker_spark.plans import all_queries


def _recall(spark, sf_dir: str, ann_name: str) -> tuple[float, int]:
    qs = all_queries()
    exact3 = {
        (r.q_id, r.c_id) for r in qs["q_sim_cosine_topk"](spark, sf_dir).collect()
        if r.rnk <= 3
    }
    ann_rows = qs[ann_name](spark, sf_dir).collect()
    ann = {(r.q_id, r.c_id) for r in ann_rows}
    return len(ann & exact3) / len(exact3), len(ann_rows)


def test_ivf_recall_vs_exact(spark, sf_dir):
    recall, n = _recall(spark, sf_dir, "q_sim_ann_ivf")
    assert recall >= 0.2
    assert n <= 30  # 10 queries x top-3, fewer if a bucket runs dry


def test_lsh_recall_vs_exact(spark, sf_dir):
    recall, n = _recall(spark, sf_dir, "q_sim_ann_lsh")
    assert recall >= 0.05
    assert n <= 30
