"""Large-star/small-star connected components vs a union-find reference,
and vs the pointer-jumping implementation the near-dup clustering uses."""

from __future__ import annotations

import random

import pytest


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _labels_of(spark, edges):
    from cdc_worker_spark.operators.graph import cc_star

    df = spark.createDataFrame(edges, "a: long, b: long")
    return {r.node: r.component for r in cc_star(df).collect()}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2)],
        [(1, 2), (2, 3), (3, 4), (4, 5)],              # chain
        [(i, i + 1) for i in range(1, 30)],             # long chain
        [(1, 2), (1, 3), (1, 4), (10, 11), (12, 12)],   # star + pair + loop
        [(a, b) for a in range(1, 6) for b in range(a + 1, 6)],  # clique
    ],
)
def test_cc_star_matches_union_find(spark, edges):
    want = _union_find(edges)
    got = _labels_of(spark, edges)
    # union-find roots are component minima here (union by min), so the
    # label maps must be identical up to self-loop-only nodes
    for n, c in got.items():
        assert want.get(n, n) == c, (n, c, want.get(n))


def test_cc_star_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for _ in range(3):
        n = 40
        edges = [
            (rng.randint(1, n), rng.randint(1, n)) for _ in range(35)
        ]
        want = _union_find(edges)
        got = _labels_of(spark, edges)
        for node, comp in got.items():
            assert want.get(node, node) == comp


def test_cc_star_agrees_with_pointer_jumping(spark):
    from cdc_worker_spark.operators.dedup import connected_components
    from cdc_worker_spark.operators.graph import cc_star

    edges = [(1, 2), (2, 3), (5, 6), (7, 7), (8, 9), (9, 10), (10, 11)]
    df = spark.createDataFrame(edges, "a: long, b: long")
    star = {r.node: r.component for r in cc_star(df).collect()}
    pj_df = connected_components(
        df.selectExpr("a as doc_a", "b as doc_b")
    )
    cols = pj_df.columns
    node_c, comp_c = cols[0], cols[1]
    pj = {r[node_c]: r[comp_c] for r in pj_df.collect()}
    for n in pj:
        assert star.get(n, n) == pj[n], (n, star.get(n), pj[n])


def test_cluster_star_matches_cluster_near(spark, sf_dir):
    """Both CC strategies over the same MinHash pair graph must assign the
    same clusters (same components, same min-id roots)."""
    from cdc_worker_spark.plans import all_queries

    qs = all_queries()
    star = {
        r.doc_id: r.cluster_id
        for r in qs["q_dedup_cluster_star"](spark, sf_dir).collect()
    }
    pj_df = qs["q_dedup_cluster_near"](spark, sf_dir)
    a, b = pj_df.columns[0], pj_df.columns[1]
    pj = {r[a]: r[b] for r in pj_df.collect()}
    assert star == pj
