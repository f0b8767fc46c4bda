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
:func:`~cdc_worker_spark.plans.checkpoints.disk_checkpoint` (the r3
pointer-jumping lesson: persist caches data, not plan size; the r6 lesson:
localCheckpoint pins the blocks in executor storage memory and loses them
on executor death — disk checkpoints are the production form, see
plans/checkpoints.py). The per-round min-label table is O(nodes) — at web
scale that must NEVER broadcast (billions of rows; the 1 GB sf1 contract
sweep also proved the failure concretely: "Not enough memory to build and
broadcast"), so both star steps pin their label join to sort-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_worker_spark.plans.checkpoints import (
    disk_checkpoint,
    lazy_spill_checkpoint,
)


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
        sym.join(m.hint("merge"), "a")
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
        small.join(m.hint("merge"), "a")
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
    disk-checkpoints so the logical plan stays O(1) per round and no round's
    edge set pins executor memory (the set shrinks monotonically, so the
    per-round parquet spill shrinks too)."""
    e = disk_checkpoint(_symmetrize(edges), "cc-edges")
    prev = None
    converged = False
    for _ in range(max_rounds):
        # large-star reads the SYMMETRIC adjacency (its output, and
        # small-star's, is canonically (bigger, smaller)-directed)
        e = disk_checkpoint(_small_star(_large_star(_symmetrize(e))), "cc-round")
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


#: PageRank constants shared by the Spark builder and the unrolled oracle
_PR_DAMPING = 0.85
_PR_ITERS = 10


def pagerank(edges: DataFrame, damping: float = _PR_DAMPING, iters: int = _PR_ITERS) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (src, dst) —
    Brin & Page 1998, power iteration form.

    Scale design: the edge derivation runs ONCE and is checkpointed for
    reuse every iteration (deriving anything from the un-checkpointed
    frames would re-run edge generation inside every iteration). Each
    iteration is one src-keyed equi join + one dst-keyed sum — the
    standard distributed power-iteration shape, and the whole 10-step
    chain pipelines as ONE Spark action (a broadcast-the-ranks variant
    was measured SLOWER at every tested scale: 10 sequential broadcast
    collects = 10 driver round-trips, ~0.5 s each, vs chained exchanges
    of an O(nodes) rank table). Ranks checkpoint every 5 rounds so the
    plan stays O(1) like :func:`cc_star`; at web scale the edge table is
    bucketed by src so only rank state moves per iteration
    (:func:`pagerank_bucketed` is that layout, written). Dangling nodes
    are absent by construction for symmetric graphs; for general graphs
    callers add the dangling mass term. Fixed iteration count (not
    convergence) keeps the result engine-reproducible.

    r12 optimization (guide §2.3/§2.4 + §1.2): the iteration-invariant
    contribution table (src, dst, deg) is built in ONE src-keyed pass — a
    window count over src replaces the former groupBy + join-back, which
    cost a second edge-scale exchange plus a join — and the three eager
    parquet checkpoints (edges, deg, contrib_edges: each a write job + a
    read-back) collapse into one :func:`lazy_spill_checkpoint` that
    materializes inside the consuming action. Measured at sf0.1 (best-of-4
    interleaved): 6.3 s -> 5.2 s, ranks bit-equal at 9dp. The window's
    per-src buffering spills via ExternalAppendOnlyUnsafeRowArray, so a
    hot src degrades to disk, never OOM."""
    from pyspark.sql import Window

    contrib_edges = lazy_spill_checkpoint(
        edges.withColumn(
            "deg", F.count("*").over(Window.partitionBy("src")).cast("double")
        )
    )
    # one row per src; first() is exact here (deg is constant within src)
    deg = contrib_edges.groupBy("src").agg(F.first("deg").alias("deg"))
    n_nodes = deg.agg(F.count("*").cast("double").alias("n"))
    ranks = (
        deg.crossJoin(F.broadcast(n_nodes))
        .select(F.col("src").alias("node"), (F.lit(1.0) / F.col("n")).alias("rank"))
    )
    for i in range(iters):
        ranks = (
            contrib_edges.join(ranks, contrib_edges["src"] == ranks["node"])
            .groupBy(F.col("dst").alias("_dst"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
            .crossJoin(F.broadcast(n_nodes))
            .select(
                F.col("_dst").alias("node"),
                (
                    (1.0 - damping) / F.col("n") + damping * F.col("contrib")
                ).alias("rank"),
            )
        )
        if (i + 1) % 5 == 0:
            ranks = lazy_spill_checkpoint(ranks, tag="pr-ranks")
    return ranks


def pagerank_general(
    edges: DataFrame, damping: float = _PR_DAMPING, iters: int = _PR_ITERS
) -> DataFrame:
    """PageRank correct on GENERAL directed graphs (VERDICT r05 next #4):
    the node universe is src ∪ dst (sink-only nodes hold rank too), and
    each iteration redistributes the DANGLING MASS — the rank sitting on
    nodes with no out-edges — uniformly, so total rank stays exactly 1
    instead of leaking (the classic power-iteration correction; Brin &
    Page 1998 §2.1.1). :func:`pagerank` remains the fast path for graphs
    where every node has out-edges (e.g. symmetric graphs — there the two
    are identical and the dangling machinery is dead weight: an extra
    anti-join + scalar aggregate per iteration).

    Scale shape: same as :func:`pagerank` — one src-keyed join + one
    dst-keyed sum per iteration — plus a per-iteration scalar (the
    dangling mass) computed as a 1-row broadcast, and a node-keyed left
    join to pay ranks to in-degree-0 nodes. Everything chains as one plan;
    no driver-side collects.

    r12 optimization: (1) the rank state CARRIES the out-degree (null for
    sinks), so the dangling mass is a filter + scalar aggregate instead of
    a per-iteration anti-join against the degree table; (2) ranks
    checkpoint lazily EVERY iteration — the body references the previous
    ranks three times (dangling, contribution, carry), so the former
    every-3-rounds eager-parquet cadence re-executed the un-checkpointed
    tail combinatorially (3^k subtree copies; the final plan held 72
    Exchanges). With :func:`lazy_spill_checkpoint` each iteration's RDD
    materializes exactly once inside the one timed action. Measured at
    sf0.1: 5.20 s -> 4.76 s best-of-4 interleaved (and the cold first run
    16.7 s -> 6.8 s), ranks bit-equal at 9dp."""
    from pyspark.sql import Window

    contrib_edges = lazy_spill_checkpoint(
        edges.withColumn(
            "deg", F.count("*").over(Window.partitionBy("src")).cast("double")
        )
    )
    deg = contrib_edges.groupBy("src").agg(F.first("deg").alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # node universe with out-degree attached (null = sink): built once,
    # reused as the left side of every iteration's pay-all-nodes join AND
    # as the deg column the dangling filter reads off the rank state
    nodes_deg = lazy_spill_checkpoint(
        nodes.join(deg, nodes["node"] == deg["src"], "left").select(
            "node", "deg"
        )
    )
    n_nodes = nodes_deg.agg(F.count("*").cast("double").alias("n"))
    ranks = lazy_spill_checkpoint(
        nodes_deg.crossJoin(F.broadcast(n_nodes)).select(
            "node", "deg", (F.lit(1.0) / F.col("n")).alias("rank")
        )
    )
    for i in range(iters):
        dangling = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contrib = (
            contrib_edges.join(
                ranks.select("node", "rank"),
                contrib_edges["src"] == ranks["node"],
            )
            .groupBy(F.col("dst").alias("cnode"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        ranks = lazy_spill_checkpoint(
            nodes_deg.join(contrib, nodes_deg["node"] == contrib["cnode"], "left")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                "deg",
                (
                    (1.0 - damping) / F.col("n")
                    + damping
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dm") / F.col("n")
                    )
                ).alias("rank"),
            )
        )
    return ranks.select("node", "rank")


def pagerank_bucketed(
    spark,
    edges: DataFrame,
    table_name: str,
    path: str,
    n_buckets: int | None = None,
    damping: float = _PR_DAMPING,
    iters: int = _PR_ITERS,
) -> DataFrame:
    """:func:`pagerank` against a MATERIALIZED src-bucketed edge layout —
    the written form of the docstring promise "at web scale the edge table
    is bucketed by src so only rank state moves" (VERDICT r05 next #4).

    The iteration-invariant contribution table (src, dst, deg) is written
    ONCE via ``bucketBy(n_buckets, src)`` + ``sortBy(src)``; every
    iteration's src-keyed join then reads the bucketed scan with NO
    exchange on the edge side — only the O(nodes) rank state shuffles
    (into the join, and out of the dst-keyed sum). At 100 TB the edge
    table is the 1000x-bigger side, so this converts the per-iteration
    shuffle from O(edges) to O(nodes). Plan-asserted in
    tests/test_graph_cc.py (bucketed scan + exactly the two rank-side
    exchanges per iteration).

    ``n_buckets`` defaults to ``spark.sql.shuffle.partitions``: when the
    bucket count equals the shuffle partitioning the rank aggregate's
    output already co-partitions with the buckets and the planner keeps
    the bucketed scan; with a MISMATCH Spark's
    DisableUnnecessaryBucketedScan may instead re-shuffle the EDGE side
    to reuse the rank side's partitioning — the exact wrong choice at
    scale (measured: 'Bucketed: false (disabled by query planner)')."""
    from cdc_worker_spark.sources.bucketing import write_bucketed

    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    deg = edges.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    write_bucketed(
        edges.join(deg, "src"), table_name, "src", n_buckets, path=path
    )
    ce = spark.table(table_name)
    # degrees/nodes re-derived FROM the bucketed table: groupBy(src) reuses
    # the bucket partitioning, so even setup adds no edge-side exchange
    bdeg = ce.groupBy("src").agg(F.first("deg").alias("deg"))
    n_nodes = bdeg.agg(F.count("*").cast("double").alias("n"))
    ranks = bdeg.crossJoin(F.broadcast(n_nodes)).select(
        F.col("src").alias("node"), (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for i in range(iters):
        ranks = (
            ce.join(ranks, ce["src"] == ranks["node"])
            .groupBy(F.col("dst").alias("_dst"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
            .crossJoin(F.broadcast(n_nodes))
            .select(
                F.col("_dst").alias("node"),
                (
                    (1.0 - damping) / F.col("n") + damping * F.col("contrib")
                ).alias("rank"),
            )
        )
        if (i + 1) % 5 == 0:
            ranks = disk_checkpoint(ranks, "prb-ranks")
    return ranks


def copurchase_pair_counts(li: DataFrame) -> DataFrame:
    """Directed co-purchase pair counts (src, dst, w) from an order-atomic
    lineitem slice — the monoid element of the co-purchase graph: counts
    over disjoint order sets simply ADD, which is what makes incremental
    edge maintenance (operators/graph_incr.extend_copurchase_edges) exact.

    Pair expansion without a self-join: ONE basket-keyed shuffle, then the
    shared nested array transform (functions/exprs.basket_pair_array) with
    the cap_basket hot-basket valve — the derive dominates PageRank's cost
    at sf10, and one unbounded basket would make it quadratic in that
    basket's size. No pre-distinct: collect_set dedups within the group,
    so a distinct() here would be a second full fact-scale exchange."""
    from cdc_worker_spark.functions.exprs import basket_pair_array, cap_basket

    per_order = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
    )
    return (
        per_order.select(cap_basket("parts").alias("parts"))
        .select(
            F.explode(
                basket_pair_array("parts", directed=True, packed=True)
            ).alias("pk")
        )
        .groupBy("pk")
        .agg(F.count("*").alias("w"))
        .select(
            F.shiftrightunsigned("pk", 32).alias("src"),
            F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).alias("dst"),
            "w",
        )
    )


def _pagerank_oracle() -> str:
    """The oracle unrolls the ``_PR_ITERS`` power iterations as chained
    CTEs (recursive CTEs disallow aggregation in the recursive member, so
    unrolling is the portable SQL form; MATERIALIZED stops DuckDB re-inlining the pair CTE at every reference, which exhausted temp disk at sf1). rank*N rescaling keeps 6-dp
    rounding far above cross-engine FP summation noise."""
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(f"""
    p{i} AS MATERIALIZED (
      SELECT e.dst AS node,
             (1 - {_PR_DAMPING}) / (SELECT n FROM nn)
               + {_PR_DAMPING} * sum(p.rank / d.deg) AS rank
      FROM p{i - 1} p
      JOIN pairs e ON p.node = e.src
      JOIN deg d ON d.src = p.node
      GROUP BY e.dst
    )""")
    return (
        """
    WITH items AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS MATERIALIZED (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING count(*) >= 2
    ),
    deg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM pairs GROUP BY src),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
    p0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS rank FROM deg),"""
        + ",".join(steps)
        + f"""
    SELECT node, round(rank * (SELECT n FROM nn), 6) AS rank_scaled
    FROM p{_PR_ITERS}
    """
    )


#: directed-variant iteration count: 5 keeps the unrolled dangling-mass
#: oracle (2 CTEs per step) readable while still compounding the mass
#: redistribution enough that a missing term would diverge by iteration 2
_PR_DIR_ITERS = 5

#: dst namespace offset: l_suppkey and l_partkey overlap numerically, so
#: part nodes shift far above any supplier key
_PR_DIR_DST_SHIFT = 100_000_000


def _pagerank_directed_oracle() -> str:
    """Unrolled power iterations for the DIRECTED supplier->part graph:
    every part is a sink (no out-edges), so each step must compute the
    dangling mass dm_i (rank parked on sinks) and redistribute dm_i / N to
    every node — without it, total rank leaks ~85% of the sink mass per
    iteration and nothing matches."""
    steps = []
    for i in range(1, _PR_DIR_ITERS + 1):
        steps.append(f"""
    dm{i} AS MATERIALIZED (
      SELECT COALESCE(sum(p.rank), 0) AS dm
      FROM p{i - 1} p LEFT JOIN deg d ON d.src = p.node
      WHERE d.src IS NULL
    ),
    p{i} AS MATERIALIZED (
      SELECT nd.node,
             (1 - {_PR_DAMPING}) / (SELECT n FROM nn)
             + {_PR_DAMPING} * (COALESCE(c.contrib, 0)
                                + (SELECT dm FROM dm{i}) / (SELECT n FROM nn))
               AS rank
      FROM nodes nd LEFT JOIN (
        SELECT e.dst AS node, sum(p.rank / d.deg) AS contrib
        FROM p{i - 1} p
        JOIN edges e ON e.src = p.node
        JOIN deg d ON d.src = p.node
        GROUP BY e.dst
      ) c ON c.node = nd.node
    )""")
    return (
        f"""
    WITH edges AS MATERIALIZED (
      SELECT DISTINCT l_suppkey AS src,
                      l_partkey + {_PR_DIR_DST_SHIFT} AS dst
      FROM lineitem
    ),
    nodes AS MATERIALIZED (
      SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
    ),
    deg AS MATERIALIZED (
      SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src
    ),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    p0 AS MATERIALIZED (
      SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
    ),"""
        + ",".join(steps)
        + f"""
    SELECT node, round(rank * (SELECT n FROM nn), 6) AS rank_scaled
    FROM p{_PR_DIR_ITERS}
    """
    )


def _register_queries() -> None:
    """Registry hook (module is listed in plans.registry._QUERY_MODULES)."""
    from pyspark.sql import SparkSession

    from cdc_worker_spark.plans.registry import query

    @query("q_graph_pagerank", oracle=_pagerank_oracle())
    def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
        """PageRank over the co-purchase part graph (parts ordered together
        in >= 2 orders, symmetric — the q_basket_pairs graph), 10 power
        iterations, damping 0.85 — 'which parts sit at the center of the
        purchase network'. ORACLE-CHECKED, unlike the usual rows-only fate
        of iterative algorithms: the fixed iteration count makes the result
        a pure function of the edge list, and the oracle unrolls the same
        10 steps as chained SQL CTEs. Emitted ranks are rescaled by N so
        6-dp rounding sits ~1e7 above cross-engine FP noise."""
        from cdc_worker_spark.sources.tables import load_table

        li = load_table(spark, sf_dir, "lineitem")
        edges = copurchase_pair_counts(li).filter(F.col("w") >= 2).select(
            "src", "dst"
        )
        ranks = pagerank(edges)
        # N from the (checkpointed) rank table — one row per node — NOT
        # from the raw edges plan: counting there would re-run the whole
        # pair-expansion derivation a second time (measured: the sf10
        # query was ~2x its iteration+derive cost before this)
        n_nodes = ranks.agg(F.count("*").cast("double").alias("n"))
        return ranks.crossJoin(F.broadcast(n_nodes)).select(
            "node", F.round(F.col("rank") * F.col("n"), 6).alias("rank_scaled")
        )

    @query("q_graph_pagerank_directed", oracle=_pagerank_directed_oracle())
    def q_graph_pagerank_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
        """PageRank on a genuinely DIRECTED graph with sinks — supplier ->
        part shipment edges (every part node is dangling: no out-edges) —
        via :func:`pagerank_general`, which redistributes the dangling
        mass each iteration so total rank stays 1. ORACLE-CHECKED against
        the unrolled dangling-mass SQL (_pagerank_directed_oracle): a
        missing or misplaced dm term diverges by iteration 2, so the hash
        match pins the correction itself, not just the happy path the
        symmetric q_graph_pagerank exercises. 5 iterations, damping 0.85,
        ranks rescaled by N for 6-dp stability."""
        from cdc_worker_spark.sources.tables import load_table

        li = load_table(spark, sf_dir, "lineitem")
        edges = (
            li.select(
                F.col("l_suppkey").cast("long").alias("src"),
                (F.col("l_partkey") + F.lit(_PR_DIR_DST_SHIFT))
                .cast("long")
                .alias("dst"),
            )
            .distinct()
        )
        ranks = pagerank_general(edges, iters=_PR_DIR_ITERS)
        # one row per node in src ∪ dst by construction, so N comes from
        # the rank table — re-deriving the node universe from `edges` here
        # would scan + distinct the fact table a second time
        n_nodes = ranks.agg(F.count("*").cast("double").alias("n"))
        return ranks.crossJoin(F.broadcast(n_nodes)).select(
            "node", F.round(F.col("rank") * F.col("n"), 6).alias("rank_scaled")
        )

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
