"""Large-star / small-star connected components — the web-scale CC
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14), as DataFrame rounds.

`dedup.connected_components` (min-label pointer jumping) is the right tool
for near-dup graphs: components are small dense cliques, diameter ~2-3, and
each round is one join. Its weakness at web scale is HIGH-DEGREE nodes — a
pointer-jumping round shuffles every edge of a hub again. The star
alternation contracts hubs directly: large-star hangs every
larger-id neighbor off the neighborhood minimum (cutting long tails in one
round), small-star re-hangs the smaller-id side, and the alternation
converges to star graphs rooted at each component's minimum id in
O(log^2 n) rounds with edge volume that SHRINKS monotonically.

Scale shape per round: symmetrize (projection) -> one groupBy(min) per
star step -> join back -> distinct. Lineage is truncated per round with
``localCheckpoint`` (the r3 pointer-jumping lesson: persist caches data,
not plan size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Both directions of every undirected edge, self-loops dropped."""
    e = edges.select(F.col("a").cast("long"), F.col("b").cast("long"))
    return (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """For each node u: connect every neighbor v > u to
    m = min(neighborhood(u) ∪ {u})."""
    m = sym.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("m")
    )
    return (
        sym.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(sym: DataFrame) -> DataFrame:
    """For each node u: connect u and every neighbor v <= u to the minimum
    of that small neighborhood."""
    small = sym.filter(F.col("b") <= F.col("a"))
    m = small.groupBy("a").agg(F.min("b").alias("m"))
    re_hung = (
        small.join(m, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    self_edge = m.select(F.col("a"), F.col("m").alias("b"))
    return (
        re_hung.union(self_edge)
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _edge_fingerprint(e: DataFrame):
    """Order-insensitive edge-set fingerprint for the convergence test:
    (count, xor-ish sum of per-edge hashes) — one tiny aggregate."""
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.xxhash64("a", "b") % 1_000_000_007), F.lit(0)).alias("h"),
    ).collect()[0]
    return (row.n, row.h)


def cc_star(edges: DataFrame, max_rounds: int = 25) -> DataFrame:
    """Connected components by large-star/small-star alternation.

    ``edges``: columns (a, b), undirected. Returns (node, component) with
    component = the minimum node id of each component; isolated input nodes
    (self-loop-only rows) keep themselves.

    Convergence = the edge set reaches a fixpoint (star graphs); each round
    `localCheckpoint`s so the logical plan stays O(1) per round."""
    e = _symmetrize(edges).localCheckpoint(eager=True)
    prev = None
    converged = False
    for _ in range(max_rounds):
        # large-star reads the SYMMETRIC adjacency (its output, and
        # small-star's, is canonically (bigger, smaller)-directed)
        e = _small_star(_large_star(_symmetrize(e))).localCheckpoint(
            eager=True
        )
        fp = _edge_fingerprint(e)
        if fp == prev:
            converged = True
            break
        prev = fp
    if not converged:
        # the final labeling assumes a depth-1 star forest; a non-fixpoint
        # edge set would yield silently wrong labels
        raise RuntimeError(
            f"cc_star did not reach the star-forest fixpoint in "
            f"{max_rounds} rounds; raise max_rounds (converges in "
            f"O(log^2 n) rounds on any graph)"
        )
    # the fixpoint is a star forest: every remaining edge points child->root
    sym = _symmetrize(e)
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.min("b"), F.first("a")).alias("component"))
    )
    nodes = (
        edges.select(F.col("a").cast("long").alias("node"))
        .union(edges.select(F.col("b").cast("long").alias("node")))
        .distinct()
    )
    return (
        nodes.join(labels, "node", "left")
        .select(
            "node",
            F.coalesce("component", F.col("node")).alias("component"),
        )
    )


def _register_queries() -> None:
    """Registry hook (module is listed in plans.registry._QUERY_MODULES)."""
    from pyspark.sql import SparkSession

    from cdc_worker_spark.plans.registry import query

    @query("q_dedup_cluster_star")  # rows-only: iterative; candidates engine-specific
    def q_dedup_cluster_star(spark: SparkSession, sf_dir: str) -> DataFrame:
        """NEAR-duplicate cluster assignment via the large-star/small-star
        alternation (:func:`cc_star`) over the SAME MinHash pair graph as
        q_dedup_cluster_near — the web-scale algorithm variant, exposed
        end-to-end so both CC strategies run the full candidate → cluster
        path. Labels are asserted equal to the pointer-jumping variant in
        tests/test_graph_cc.py (same components, same min-id roots)."""
        from cdc_worker_spark.operators.dedup import minhash_pairs
        from cdc_worker_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        pairs = minhash_pairs(docs).select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        )
        return cc_star(pairs).select(
            F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
        )


_register_queries()
