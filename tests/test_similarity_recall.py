"""Recall checks for the approximate similarity paths (LSH tables, IVF
probing) against the exact brute-force top-k. The synthetic embeddings are
near-random (best cosine ~0.33), so absolute recall is structurally low —
these gates catch an ANN variant that returns garbage (zero overlap with the
exact answer, malformed shape), not tuned recall; on clustered real data the
same operators' recall tracks nprobe / table count."""

from __future__ import annotations

import pytest
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
    # KMeans centroids (2 Lloyd iterations) lifted recall 0.2 -> 0.9 at both
    # fixture scales; the gate sits at 0.6 to absorb FP jitter in the means
    recall, n = _recall(spark, sf_dir, "q_sim_ann_ivf")
    assert recall >= 0.6
    assert n <= 30  # 10 queries x top-3, fewer if a bucket runs dry


def test_lsh_recall_vs_exact(spark, sf_dir):
    # 1-bit multi-probe lifted recall 0.10 -> 0.73 (sf0.001) / 0.63 (sf0.01)
    recall, n = _recall(spark, sf_dir, "q_sim_ann_lsh")
    assert recall >= 0.4
    assert n <= 30


@pytest.mark.slow
def test_ivfpq_recall_on_planted_clusters(spark, tmp_path):
    """IVF-PQ recall gate in the PLANTED regime (VERDICT r08 next #5): on
    the isotropic fixture embeddings, PQ recall ~0.10 is the information
    floor (SCALE.md §r8) and the gate tests nothing. On a planted
    clustered-neighborhood set (make_sf1.build_planted_embeddings — the
    same generator as the .fixtures/sf10p scale fixture) the exact top-k
    is the ~11-member micro neighborhood, so recall measures the index:
    gate >= 0.6 @10 at nprobe=8. PQ is sized for the data — m=8 subspaces
    x k=64 codes (the production IVFADC shape); the registered query's
    demo-scale 4x16 codebook cannot resolve 160 micro neighborhoods
    (measured 0.34: ADC flattens to macro resolution and the shortlist
    becomes a random sample of the macro)."""
    import importlib.util
    import os

    import numpy as np

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "make_sf1.py",
    )
    spec = importlib.util.spec_from_file_location("make_sf1", path)
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    gen.build_planted_embeddings(spark, 2000, str(tmp_path), 16)

    from cdc_worker_spark.operators.dedup import with_double_vec
    from cdc_worker_spark.operators.traindata import ivfpq_topk
    from cdc_worker_spark.sources.tables import load_table

    emb = with_double_vec(load_table(spark, str(tmp_path), "embeddings"))
    emb_path = os.path.join(str(tmp_path), "embeddings.parquet")
    k, n_q = 10, 16
    got_rows = ivfpq_topk(
        spark, emb, emb_path, q_max_id=n_q, nprobe=8, shortlist=4 * k,
        topk=k, pq_m=8, pq_k=64,
    ).collect()
    got: dict[int, set] = {}
    for r in got_rows:
        got.setdefault(r.q_id, set()).add(r.c_id)

    # independent exact truth: numpy brute force on the collected table
    rows = sorted(
        (r.vec_id, r.embedding)
        for r in spark.read.parquet(emb_path).collect()
    )
    m = np.array([v for _, v in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m[:n_q] @ m.T
    hits = total = 0
    for q in range(n_q):
        s = sims[q].copy()
        s[q] = -np.inf  # exclude self
        truth = set(np.argsort(-s)[:k].tolist())
        hits += len(truth & got.get(q, set()))
        total += k
    recall = hits / total
    assert recall >= 0.6, f"planted IVF-PQ recall@{k}={recall:.3f}"


def test_materialized_ivf_index_probe(spark, sf_dir, tmp_path):
    """Build-once/probe-many IVF layout: the probe plan reads ONLY the
    probed bucket partitions (partition pruning on the parquet scan) and its
    recall matches the one-shot IVF query's gate."""
    import os

    from pyspark.sql import functions as F

    from cdc_worker_spark.operators.dedup import with_double_vec
    from cdc_worker_spark.operators.ivf import build_ivf_index, probe_ivf_index
    from cdc_worker_spark.sources.tables import load_table

    idx = str(tmp_path / "ivf")
    emb = with_double_vec(load_table(spark, sf_dir, "embeddings"))
    build_ivf_index(emb, idx, k=16, n_iters=2)
    # layout: one directory per centroid bucket
    from cdc_worker_spark.operators.index_layout import resolve_table

    lists_dir = resolve_table(idx, "lists")
    buckets = [d for d in os.listdir(lists_dir) if d.startswith("bucket=")]
    assert len(buckets) > 1

    queries = emb.filter(F.col("vec_id") < 10)
    probed = probe_ivf_index(spark, idx, queries, nprobe=2, topk=3)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the bucket predicate must reach the scan as a PARTITION filter
    # (directory pruning), not a post-scan data filter
    import re

    m = re.search(r"PartitionFilters: \[bucket#\d+ INSET ([0-9, ]+)", plan)
    assert m is not None, f"no INSET partition filter in:\n{plan[:2000]}"
    # the pruned scan reads at most nprobe * n_queries distinct buckets
    assert len(m.group(1).strip().rstrip(",").split(",")) <= 2 * 10

    rows = probed.collect()
    exact3 = {
        (r.q_id, r.c_id)
        for r in all_queries()["q_sim_cosine_topk"](spark, sf_dir).collect()
        if r.rnk <= 3
    }
    got = {(r.q_id, r.c_id) for r in rows}
    assert len(got & exact3) / len(exact3) >= 0.6
    assert len(rows) <= 30


def test_centroid_cache_fingerprint_invalidation(tmp_path):
    """The centroid memo key must change when the data under the path is
    rewritten (ADVICE r03: a raw path key serves stale centroids after
    in-process regeneration), and must be stable when nothing changed."""
    import time

    from cdc_worker_spark.operators.ivf import _source_fingerprint

    d = tmp_path / "emb"
    d.mkdir()
    f = d / "part-0.parquet"
    f.write_bytes(b"v1")
    fp1 = _source_fingerprint(str(d))
    assert fp1 == _source_fingerprint(str(d))  # stable while unchanged
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse filesystems
    f.write_bytes(b"v2-longer")
    fp2 = _source_fingerprint(str(d))
    assert fp1 != fp2
    # non-directory keys fall back to the opaque string
    assert _source_fingerprint("not/a/dir") == "not/a/dir"


def test_extend_ivf_index_appends_and_probes(spark, sf_dir, tmp_path):
    """New vectors append to the materialized lists under the STORED
    centroids (no retraining) and are immediately probe-able."""
    from pyspark.sql import functions as F

    from cdc_worker_spark.operators.dedup import with_double_vec
    from cdc_worker_spark.operators.ivf import (
        _read_lists, build_ivf_index, extend_ivf_index, probe_ivf_index,
    )
    from cdc_worker_spark.sources.tables import load_table

    idx = str(tmp_path / "ivf")
    emb = with_double_vec(load_table(spark, sf_dir, "embeddings"))
    base = emb.filter(F.col("vec_id") >= 100)
    build_ivf_index(base, idx, k=8, n_iters=1)
    n_before = _read_lists(spark, idx).count()

    newcomers = emb.filter(F.col("vec_id") < 100)
    extend_ivf_index(newcomers, idx)
    lists = _read_lists(spark, idx)
    assert lists.count() == n_before + newcomers.count()

    # a query identical to an appended vector must find it as top neighbor:
    # self-match (q_id == c_id) is excluded, so probe with a copy under a
    # synthetic id
    target = newcomers.filter(F.col("vec_id") == 5)
    probe = target.withColumn("vec_id", F.lit(99999).cast("long"))
    got = probe_ivf_index(spark, idx, probe, nprobe=2, topk=1).collect()
    assert got and got[0].c_id == 5 and got[0].cos_sim >= 0.999999


def test_compact_ivf_index_preserves_lists_and_probes(spark, sf_dir, tmp_path):
    """Compaction after incremental appends must preserve every (vec, bucket)
    row, leave one file per bucket dir, and keep probes working."""
    import glob

    from pyspark.sql import functions as F

    from cdc_worker_spark.operators.dedup import with_double_vec
    from cdc_worker_spark.operators.index_layout import resolve_table
    from cdc_worker_spark.operators.ivf import (
        build_ivf_index, compact_ivf_index, extend_ivf_index, probe_ivf_index,
    )
    from cdc_worker_spark.sources.tables import load_table

    idx = str(tmp_path / "ivf")
    emb = with_double_vec(load_table(spark, sf_dir, "embeddings"))
    build_ivf_index(emb.filter(F.col("vec_id") >= 100), idx, k=8, n_iters=1)
    for lo in (0, 50):  # two appends => multiple part files per touched bucket
        extend_ivf_index(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 50)), idx
        )
    from cdc_worker_spark.operators.ivf import _read_lists

    before = sorted(
        (r.vec_id, r.bucket)
        for r in _read_lists(spark, idx)
        .select("vec_id", "bucket").collect()
    )

    compact_ivf_index(spark, idx)
    live = resolve_table(idx, "lists")  # compaction publishes a new generation
    after = sorted(
        (r.vec_id, r.bucket)
        for r in spark.read.parquet(live).select("vec_id", "bucket").collect()
    )
    assert after == before
    for bdir in glob.glob(live + "/bucket=*"):
        assert len(glob.glob(bdir + "/*.parquet")) == 1, bdir

    probe = emb.filter(F.col("vec_id") == 7).withColumn(
        "vec_id", F.lit(99999).cast("long")
    )
    got = probe_ivf_index(spark, idx, probe, nprobe=2, topk=1).collect()
    assert got and got[0].c_id == 7


def test_extend_ivf_index_replay_is_exactly_once(spark, sf_dir, tmp_path):
    """A replayed extend with the same token (the streaming batch_id) must
    not double-count, and crashed unregistered debris is rewritten."""
    import os

    from pyspark.sql import functions as F

    from cdc_worker_spark.operators.dedup import with_double_vec
    from cdc_worker_spark.operators.index_layout import segment_name
    from cdc_worker_spark.operators.ivf import (
        _read_lists, build_ivf_index, extend_ivf_index, probe_ivf_index,
    )
    from cdc_worker_spark.sources.tables import load_table

    idx = str(tmp_path / "ivf")
    emb = with_double_vec(load_table(spark, sf_dir, "embeddings"))
    build_ivf_index(emb.filter(F.col("vec_id") >= 100), idx, k=8, n_iters=1)
    n_base = _read_lists(spark, idx).count()
    newcomers = emb.filter(F.col("vec_id") < 100)

    # crash: a half-written, unregistered segment from a first attempt
    junk = os.path.join(idx, segment_name("lists", "b7"))
    os.makedirs(os.path.join(junk, "bucket=0"))
    with open(os.path.join(junk, "bucket=0", "part-00000.parquet"), "w") as f:
        f.write("truncated by crash")

    extend_ivf_index(newcomers, idx, token="b7")
    assert _read_lists(spark, idx).count() \
        == n_base + newcomers.count()
    extend_ivf_index(newcomers, idx, token="b7")  # replay: no-op
    assert _read_lists(spark, idx).count() \
        == n_base + newcomers.count()

    probe = emb.filter(F.col("vec_id") == 5).withColumn(
        "vec_id", F.lit(99999).cast("long")
    )
    got = probe_ivf_index(spark, idx, probe, nprobe=2, topk=1).collect()
    assert got and got[0].c_id == 5


def test_probe_ivf_index_batch_matches_serving_path(spark, sf_dir, tmp_path):
    """The join-based batch probe (no driver collect of the query set)
    must return exactly the serving path's top-k for every query, and its
    plan must (a) keep bucket-directory pruning on the lists scan and
    (b) join the probe pairs to the lists WITHOUT broadcasting them —
    the pair frame is query-sized and must stay distributed."""
    import re

    from pyspark.sql import functions as F

    from cdc_worker_spark.operators.dedup import with_double_vec
    from cdc_worker_spark.operators.ivf import (
        build_ivf_index, probe_ivf_index, probe_ivf_index_batch,
    )
    from cdc_worker_spark.sources.tables import load_table

    idx = str(tmp_path / "ivf")
    emb = with_double_vec(load_table(spark, sf_dir, "embeddings"))
    build_ivf_index(emb, idx, k=16, n_iters=2)
    queries = emb.filter(F.col("vec_id") < 40)

    serving = probe_ivf_index(spark, idx, queries, nprobe=2, topk=3)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        # tiny fixture pairs would auto-broadcast and hide the shape the
        # batch path is FOR; disable to see the at-scale plan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        batch = probe_ivf_index_batch(spark, idx, queries, nprobe=2, topk=3)
        rows_b = sorted(tuple(r) for r in batch.collect())
        plan = batch._jdf.queryExecution().executedPlan().toString()
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    rows_s = sorted(tuple(r) for r in serving.collect())
    assert rows_b == rows_s and len(rows_b) == 40 * 3

    assert re.search(r"PartitionFilters: \[bucket#\d+ INSET", plan), plan[:3000]
    # the pairs->lists join must be a shuffle join, not a broadcast of the
    # query-scale side (BroadcastHashJoin is fine only for the KxD
    # centroid join inside the pair ranking, which sits under the Window)
    join_lines = [
        ln for ln in plan.splitlines()
        if "Join" in ln and "bucket" in ln
    ]
    assert join_lines, plan[:3000]
    assert all("Broadcast" not in ln for ln in join_lines), join_lines
