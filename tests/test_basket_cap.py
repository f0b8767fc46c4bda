"""Hot-basket valve (functions/exprs.cap_basket + basket_pair_array): the
per-basket cap on quadratic pair fan-out must (a) bound candidate volume on
a planted 10k-item basket, (b) be bit-inert on bounded baskets, and (c) keep
q_basket_pairs / the PageRank co-purchase derive end-to-end correct with the
valve engaged (VERDICT r6 "wrong" #1)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_worker_spark.functions.exprs import (
    BASKET_CAP,
    basket_pair_array,
    cap_basket,
)

HOT = 10_000  # planted bot-cart size; uncapped fan-out would be 10^8 pairs


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "l_orderkey: bigint, parts: array<bigint>")


def test_planted_hot_basket_candidate_volume_bounded(spark):
    hot = list(range(HOT))
    df = _baskets(spark, [(1, hot), (2, [3, 1, 2])])
    out = df.select(cap_basket("parts").alias("parts")).select(
        F.explode(basket_pair_array("parts", directed=False)).alias("p")
    )
    n = out.count()
    # capped basket contributes C(cap,2), the 3-item one C(3,2)
    assert n == BASKET_CAP * (BASKET_CAP - 1) // 2 + 3
    directed = (
        df.select(cap_basket("parts").alias("parts"))
        .select(F.explode(basket_pair_array("parts", directed=True)).alias("p"))
        .count()
    )
    assert directed == BASKET_CAP * (BASKET_CAP - 1) + 6


def test_cap_is_deterministic_smallest_items(spark):
    """The kept subset is a pure function of the basket's CONTENTS (sorted
    slice), not of collect_set's arrival order — two baskets with the same
    items over the cap produce identical pair sets."""
    hot = list(range(HOT))
    rev = list(reversed(hot))
    df = _baskets(spark, [(1, hot), (2, rev)])
    kept = df.select(
        "l_orderkey", F.sort_array(cap_basket("parts")).alias("kept")
    ).collect()
    assert kept[0]["kept"] == kept[1]["kept"] == list(range(BASKET_CAP))


def test_cap_inert_under_threshold(spark):
    """Baskets at or under the cap pass through untouched — same array
    object, no sort, no reorder (results on bounded data bit-identical)."""
    rows = [(1, [5, 3, 9]), (2, list(range(BASKET_CAP)))]
    got = (
        _baskets(spark, rows)
        .select("l_orderkey", cap_basket("parts").alias("parts"))
        .orderBy("l_orderkey")
        .collect()
    )
    assert got[0]["parts"] == [5, 3, 9]
    assert got[1]["parts"] == list(range(BASKET_CAP))


def test_basket_pairs_end_to_end_with_planted_hot_basket(spark, tmp_path):
    """q_basket_pairs over a synthetic lineitem with one 10k-item order:
    completes with bounded candidates, and pairs from NORMAL baskets keep
    exact support/lift (the valve must not perturb them)."""
    from cdc_worker_spark.operators.warehouse import q_basket_pairs

    rows = [(100, p) for p in range(HOT)]  # the bot cart
    # two normal orders sharing a pair DISJOINT from the hot basket's parts
    # -> n_both=2 passes HAVING and the valve can't touch it
    a, b = HOT + 1, HOT + 2
    rows += [(1, a), (1, b), (2, a), (2, b)]
    (
        spark.createDataFrame(rows, "l_orderkey: bigint, l_partkey: bigint")
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    )
    out = q_basket_pairs(spark, str(tmp_path)).collect()
    by_pair = {(r["part_a"], r["part_b"]): r for r in out}
    want = by_pair[(a, b)]
    assert want["n_both"] == 2
    # n_orders=3 (cap does NOT shrink the frequency tables): support=2/3
    assert abs(want["support"] - round(2 / 3, 6)) < 1e-12
    # a,b appear in 2 orders each: lift = 2*3/(2*2)
    assert abs(want["lift"] - round(6 / 4, 6)) < 1e-12
    # every OTHER pair comes from the capped hot basket, each appearing
    # once -> filtered by n_both >= 2; output stays tiny with the bomb in
    assert len(out) == 1
