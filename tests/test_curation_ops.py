"""Semantic tests for the curation/warehouse operators beyond the oracle
hash-match: invariants the SQL twin can't express as directly (interval
algebra, probability-mass sanity, rule discrimination, division laws)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cdc_worker_spark.plans import all_queries

QUERIES = all_queries()


def test_gopher_rules_discriminate(spark, sf_dir):
    """The rule thresholds must actually split the fixture corpus — a
    filter that passes (or fails) everything is a mis-tuned no-op."""
    flags = (
        QUERIES["q_text_gopher_rules"](spark, sf_dir)
        .groupBy("pass_gopher")
        .count()
        .collect()
    )
    by_flag = {r["pass_gopher"]: r["count"] for r in flags}
    assert by_flag.get(True, 0) > 0 and by_flag.get(False, 0) > 0


def test_lm_score_is_log_probability(spark, sf_dir):
    """Unigram log-probs are strictly negative and bounded below by
    ln(1/total_tokens); token counts match the tokenizer."""
    rows = QUERIES["q_text_lm_score"](spark, sf_dir).collect()
    assert rows
    total = sum(r["n_tokens"] for r in rows)
    lower = math.log(1.0 / total)
    for r in rows:
        assert lower <= r["avg_logprob"] < 0.0


def test_bigram_lm_below_unigram_on_fixture(spark, sf_dir):
    """Sanity relation on this corpus: add-one smoothing over the large
    bigram space pushes mean bigram log-prob below 0 and the per-doc
    bigram count is exactly n_tokens - 1."""
    uni = {
        r["doc_id"]: r
        for r in QUERIES["q_text_lm_score"](spark, sf_dir).collect()
    }
    for r in QUERIES["q_text_bigram_lm"](spark, sf_dir).collect():
        assert r["avg_logprob"] < 0.0
        assert r["n_bigrams"] == uni[r["doc_id"]]["n_tokens"] - 1


def test_scd2_intervals_partition_each_user_timeline(spark, sf_dir):
    """SCD2 algebra: per user, versions are 1..K dense, exactly one open
    (is_current) interval, and each valid_to equals the next valid_from —
    no gaps, no overlaps."""
    rows = QUERIES["q_cdc_scd2"](spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        assert sum(r["is_current"] for r in rs) == 1
        assert rs[-1]["is_current"] and rs[-1]["valid_to_ms"] is None
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to_ms"] == b["valid_from_ms"]
            # consecutive versions must differ in state (runs collapsed)
            assert a["event_type"] != b["event_type"]


def test_basket_pairs_support_lift_consistency(spark, sf_dir):
    """support = n_both/n_orders and pairs are canonicalized a < b."""
    df = QUERIES["q_basket_pairs"](spark, sf_dir)
    bad = df.filter(
        (F.col("part_a") >= F.col("part_b")) | (F.col("n_both") < 2)
    ).count()
    assert bad == 0
    # support monotone in n_both: max-support pair is a max-count pair
    top = df.orderBy(F.col("support").desc(), "part_a", "part_b").first()
    max_n = df.agg(F.max("n_both")).first()[0]
    assert top["n_both"] == max_n


def test_pagerank_mass_conserved_and_positive(spark, sf_dir):
    """On the symmetric co-purchase graph (no dangling nodes) the total
    rank mass stays 1: sum(rank_scaled) == N within FP tolerance; every
    rank is positive and bounded below by the teleport floor (1-d)."""
    rows = QUERIES["q_graph_pagerank"](spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    total = sum(r["rank_scaled"] for r in rows)
    assert abs(total - n) < 1e-3 * n
    assert all(r["rank_scaled"] >= 0.15 - 1e-9 for r in rows)


def test_supplier_coverage_division_law(spark, sf_dir):
    """Relational-division law: every reported (brand, supplier) really
    covers the whole brand catalog — spot-check the full pair set against
    an independent anti-join formulation."""
    from cdc_worker_spark.sources.tables import load_table

    got = {
        (r["p_brand"], r["l_suppkey"])
        for r in QUERIES["q_supplier_coverage"](spark, sf_dir).collect()
    }
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    brand_parts = part.filter(F.col("p_size") >= 48).select("p_brand", "p_partkey")
    sp = li.select("l_suppkey", "l_partkey").distinct()
    # NOT EXISTS form: (supplier, brand) pairs with NO uncovered part
    cand = sp.select("l_suppkey").distinct().crossJoin(
        brand_parts.select("p_brand").distinct()
    )
    uncovered = (
        cand.join(brand_parts, "p_brand")
        .join(
            sp.withColumnRenamed("l_partkey", "p_partkey").withColumn(
                "_has", F.lit(1)
            ),
            ["l_suppkey", "p_partkey"],
            "left",
        )
        .filter(F.col("_has").isNull())
        .select("p_brand", "l_suppkey")
        .distinct()
    )
    want = {
        (r["p_brand"], r["l_suppkey"])
        for r in cand.join(
            uncovered, ["p_brand", "l_suppkey"], "left_anti"
        ).collect()
    }
    assert got == want


def test_cusum_ends_near_zero(spark, sf_dir):
    """Standardized deviations sum to ~0 over the whole partition, so the
    FINAL cusum per topic is ~0 even though the path wanders — the
    detector keys on max |path|, which must exceed the final value."""
    rows = QUERIES["q_events_cusum"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["max_abs_cusum"] > 0.0
        assert abs(r["mean_cusum"]) < r["max_abs_cusum"]


def test_out_of_order_bounds(spark, sf_dir):
    rows = QUERIES["q_cdc_out_of_order"](spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["n_late"] < r["n_events"]
        if r["n_late"]:
            assert r["max_lag_ms"] > 0
            assert r["total_lag_ms"] >= r["max_lag_ms"]


def test_rfm_quintiles_balanced(spark, sf_dir):
    """ntile(5) must split customers into near-equal buckets on every
    dimension (sizes differ by at most 1)."""
    df = QUERIES["q_orders_rfm"](spark, sf_dir)
    for col in ("r_score", "f_score", "m_score"):
        sizes = [r["count"] for r in df.groupBy(col).count().collect()]
        assert len(sizes) == 5
        assert max(sizes) - min(sizes) <= 1


def test_skyline_is_maximal_and_undominated(spark, sf_dir):
    """No skyline point dominates another within a brand (mutual
    non-domination) — the defining property beyond the oracle's filter."""
    rows = QUERIES["q_part_skyline"](spark, sf_dir).collect()
    by_brand: dict[str, list] = {}
    for r in rows:
        by_brand.setdefault(r["p_brand"], []).append(r)
    assert by_brand
    for rs in by_brand.values():
        for a in rs:
            for b in rs:
                if a is b:
                    continue
                dominates = (
                    a["p_retailprice"] <= b["p_retailprice"]
                    and a["p_size"] >= b["p_size"]
                    and (
                        a["p_retailprice"] < b["p_retailprice"]
                        or a["p_size"] > b["p_size"]
                    )
                )
                assert not dominates


def test_bigram_lm_robust_to_empty_and_one_word_docs(spark, tmp_path):
    """Zero- and one-word documents must yield zero bigrams (not a
    negative-length slice error) and drop out of the per-doc result."""
    docs = spark.createDataFrame(
        [
            (1, "", "en", "web", 0),
            (2, "   ", "en", "web", 3),
            (3, "solo", "en", "web", 4),
            (4, "two words here", "en", "web", 14),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = QUERIES["q_text_bigram_lm"](spark, str(tmp_path)).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert set(by_doc) == {4}  # only the multi-word doc produces bigrams
    assert by_doc[4]["n_bigrams"] == 2
