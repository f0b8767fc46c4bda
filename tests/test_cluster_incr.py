"""Incremental near-dup cluster maintenance (operators/cluster_incr.py):
incremental labels must EQUAL the batch connected_components recompute on
order-atomic splits — including the hard merge cases (a delta doc bridging
two existing clusters, a previously-isolated base doc gaining a pair, a
delta-only cluster) — and the reduced-graph fold must be a no-op on an
empty delta."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_worker_spark.operators.cluster_incr import (
    delta_near_pairs,
    extend_dedup_clusters,
    q_dedup_cluster_incr,
)
from cdc_worker_spark.operators.dedup import connected_components, minhash_pairs
from cdc_worker_spark.operators.dedup_index import build_dedup_index
from cdc_worker_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def _lab(df):
    return {(r["doc_id"], r["cluster_id"]) for r in df.collect()}


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a: long, doc_b: long")


def _labels_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, cluster_id: long")


def test_empty_delta_is_noop(spark):
    labels = _labels_df(spark, [(1, 1), (2, 1), (5, 5), (6, 5)])
    out = extend_dedup_clusters(labels, _pairs_df(spark, []))
    assert _lab(out) == _lab(labels)


def test_bridge_merges_two_existing_clusters(spark):
    """A new doc pairing into BOTH clusters must merge them under the
    global min label."""
    labels = _labels_df(spark, [(1, 1), (2, 1), (5, 5), (6, 5)])
    out = extend_dedup_clusters(
        labels, _pairs_df(spark, [(2, 9), (6, 9)])
    )
    assert _lab(out) == {(1, 1), (2, 1), (5, 1), (6, 1), (9, 1)}


def test_isolated_base_doc_and_delta_only_cluster(spark):
    """A base doc with no prior pairs (absent from labels) can be pulled
    in by a delta pair, and two delta docs can form a brand-new cluster."""
    labels = _labels_df(spark, [(1, 1), (2, 1)])
    out = extend_dedup_clusters(
        labels, _pairs_df(spark, [(3, 10), (11, 12)])
    )
    assert _lab(out) == {(1, 1), (2, 1), (3, 3), (10, 3), (11, 11), (12, 11)}


def test_intra_cluster_delta_pair_is_stable(spark):
    """A delta pair between two docs already sharing a cluster reduces to
    a self-loop and must change nothing."""
    labels = _labels_df(spark, [(1, 1), (2, 1), (5, 5), (6, 5)])
    out = extend_dedup_clusters(labels, _pairs_df(spark, [(1, 2)]))
    assert _lab(out) == _lab(labels)


@pytest.mark.slow
def test_incremental_equals_batch_on_fixture_split(spark):
    """The end-to-end contract at fixture scale: index-probed delta pairs
    + reduced-CC fold == connected_components(minhash_pairs(all docs))."""
    docs = load_table(spark, SF_DIR, "documents")
    is_delta = F.pmod(F.col("doc_id"), F.lit(10)) == 9
    base, delta = docs.filter(~is_delta), docs.filter(is_delta)
    batch = connected_components(minhash_pairs(docs))
    base_labels = connected_components(minhash_pairs(base))
    tmp = tempfile.mkdtemp(prefix="ci_test_idx_")
    try:
        build_dedup_index(base, tmp)
        pairs = delta_near_pairs(spark, tmp, docs, delta)
        incr = extend_dedup_clusters(base_labels, pairs)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert _lab(incr) == _lab(batch)


def test_delta_pairs_match_batch_pair_slice(spark):
    """delta_near_pairs == the pairs of the full batch run that touch a
    delta doc (same rounded jaccard) — candidate generation via the index
    loses nothing and invents nothing."""
    docs = load_table(spark, SF_DIR, "documents")
    is_delta = F.pmod(F.col("doc_id"), F.lit(10)) == 9
    base, delta = docs.filter(~is_delta), docs.filter(is_delta)
    tmp = tempfile.mkdtemp(prefix="ci_test_idx2_")
    try:
        build_dedup_index(base, tmp)
        got = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in delta_near_pairs(spark, tmp, docs, delta).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_pairs(docs).collect()
        if r["doc_a"] % 10 == 9 or r["doc_b"] % 10 == 9
    }
    assert got == want


@pytest.mark.slow
def test_registered_query_runs_and_matches_cluster_near(spark):
    incr = q_dedup_cluster_incr(spark, SF_DIR)
    from cdc_worker_spark.operators.dedup import q_dedup_cluster_near

    batch = q_dedup_cluster_near(spark, SF_DIR)
    assert _lab(incr) == _lab(batch)
