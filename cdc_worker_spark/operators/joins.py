"""Join surface (SURVEY §2.3): inner/broadcast/multi/outer/semi/anti/range/
cross/as-of.

Provenance: snapshot+CDC reconciliation joins (design doc D5), new-keys-only
anti join (D4), point/range read paths (D11).

Scale notes:
- Small dimensions (region, nation) are explicitly ``broadcast()`` — no
  shuffle of the big side.
- Fact-fact joins shuffle on the join key; AQE handles skew splitting.
- The as-of join is join + windowed row_number, which shuffles both sides by
  the entity key once and reuses that partitioning for the window — the
  standard scalable batch as-of formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.functions.exprs import dec_sum, money_expr
from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_events_ms, load_table


@query(
    "q_join_inner",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join (Catalyst picks broadcast/shuffled-hash/sort-merge)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_custkey", "c_name", "o_totalprice"
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: dimension ships to every executor, zero shuffle
    of the fact side."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@query(
    "q_join_multi",
    oracle="""
    SELECT n_name, r_name, count(*) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join. nation/region broadcast; lineitem⋈orders⋈customer
    shuffle on their keys. Revenue summed in exact DECIMAL then cast to
    DOUBLE once (cross-engine bitwise determinism)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count("*").alias("n_items"),
            dec_sum(money_expr("l_extendedprice", discount="l_discount")).alias("revenue"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
           COALESCE(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + per-customer aggregate (COUNT skips the nulls the
    outer join manufactures)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dec_sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0.0)).alias(
                "total_spent"
            ),
        )
    )


@query(
    "q_join_full",
    oracle="""
    WITH rich AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000),
         freq AS (SELECT o_custkey, count(*) AS n_orders
                  FROM orders GROUP BY o_custkey HAVING count(*) > 12)
    SELECT c_custkey, c_acctbal, o_custkey, n_orders
    FROM rich FULL JOIN freq ON c_custkey = o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (snapshot ∪ changes reconciliation shape, D5)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_acctbal")
    freq = (
        o.groupBy("o_custkey").agg(F.count("*").alias("n_orders")).filter(F.col("n_orders") > 12)
    )
    return rich.join(freq, rich.c_custkey == freq.o_custkey, "full").select(
        "c_custkey", "c_acctbal", "o_custkey", "n_orders"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS) — the D4 "new keys only" dedup shape."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, o_orderdate, l_shipdate
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) predicate: equi key drives the shuffle, the range
    predicate is evaluated post-match — no nested-loop blowup."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        & li.l_shipdate.between(o.o_orderdate, o.o_orderdate + F.expr("INTERVAL 90 DAY")),
    ).select("l_orderkey", "l_linenumber", "o_orderdate", "l_shipdate")


@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, count(*) AS n_pairs
    FROM region CROSS JOIN nation GROUP BY r_name
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cross join (dims only — a cross join of facts would never
    survive 100 TB; Spark requires the explicit crossJoin call)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).groupBy("r_name").agg(F.count("*").alias("n_pairs"))


@query(
    "q_join_asof",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         s AS (SELECT event_id AS s_event_id, user_id, ts AS s_ts
               FROM events WHERE event_type = 'signup')
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
           asof_event_id, epoch_ms(s_ts) AS asof_ts_ms
    FROM (
      SELECT p.event_id, p.user_id, p.ts, s.s_event_id AS asof_event_id, s.s_ts,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY s.s_ts DESC, s.s_event_id DESC) AS rn
      FROM p JOIN s ON p.user_id = s.user_id AND s.s_ts <= p.ts
    ) t WHERE rn = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest signup of the same user at or
    before its timestamp (reference semantics: snapshot + replay-after, D5).
    Formulated as equi join on the entity key + windowed row_number — one
    shuffle by user_id serves both the join and the window."""
    ev = load_events_ms(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "ts_ms")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_event_id"),
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("s_ts"),
        F.col("ts_ms").alias("s_ts_ms"),
    )
    w = Window.partitionBy("event_id").orderBy(F.col("s_ts").desc(), F.col("s_event_id").desc())
    return (
        p.join(s, (p.user_id == s.s_user_id) & (s.s_ts <= p.ts))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "ts_ms",
            F.col("s_event_id").alias("asof_event_id"),
            F.col("s_ts_ms").alias("asof_ts_ms"),
        )
    )
