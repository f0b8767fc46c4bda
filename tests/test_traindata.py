"""Tests for the wave-2 training-data pipeline operators
(operators/traindata.py): passage dedup, temperature mixing, product
quantization, and BPE merge training."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_worker_spark.operators.dedup import with_double_vec
from cdc_worker_spark.operators.ivf import kmeans_centroids_cached
from cdc_worker_spark.operators.traindata import (
    BOILER_MIN_DOCS,
    BPE_MERGES,
    SEG_WORDS,
    bpe_merges,
    pq_codes,
    q_docs_mix_temperature,
    q_emb_pq,
    q_text_bpe_vocab,
    q_text_passage_dedup,
)
from cdc_worker_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ passage dedup


def test_passage_dedup_flags_planted_boilerplate(spark, tmp_path):
    """A 10-word segment planted verbatim in BOILER_MIN_DOCS docs is
    removed from each; unique segments are retained."""
    boiler = " ".join(f"b{i}" for i in range(SEG_WORDS))
    rows = []
    for d in range(BOILER_MIN_DOCS):
        uniq = " ".join(f"u{d}x{i}" for i in range(SEG_WORDS))
        rows.append((d, boiler + " " + uniq))
    rows.append((99, " ".join(f"z{i}" for i in range(SEG_WORDS))))
    path = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id: long, text: string").write.parquet(
        path + "/documents.parquet"
    )
    out = {
        r.doc_id: r
        for r in q_text_passage_dedup(spark, path).collect()
    }
    for d in range(BOILER_MIN_DOCS):
        assert out[d].n_seg == 2
        assert out[d].n_boiler == 1
        assert out[d].retained_ratio == 0.5
    assert out[99].n_boiler == 0 and out[99].retained_ratio == 1.0


def test_passage_dedup_fixture_invariants(spark):
    rows = q_text_passage_dedup(spark, SF).collect()
    docs = load_table(spark, SF, "documents").count()
    assert len(rows) == docs  # every doc reports, even 100%-retained ones
    for r in rows:
        assert 0 <= r.n_boiler <= r.n_seg
        assert 0.0 <= r.retained_ratio <= 1.0


# ------------------------------------------------------- temperature mixing


def test_mix_temperature_weights_normalize_and_flatten(spark):
    rows = q_docs_mix_temperature(spark, SF).collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.p_raw for r in rows) - 1.0) < 1e-4
    # α=0.5 compresses the distribution: every boost moves toward 1 from
    # the p_raw side (small sources boosted >1, large damped <1), and the
    # mixture is strictly flatter than the raw shares.
    for r in rows:
        if r.p_raw < 1.0 / len(rows):
            assert r.boost >= 1.0
        elif r.p_raw > 1.0 / len(rows):
            assert r.boost <= 1.0
    spread_raw = max(r.p_raw for r in rows) / min(r.p_raw for r in rows)
    spread_mix = max(r.mix_weight for r in rows) / min(
        r.mix_weight for r in rows
    )
    assert spread_mix <= spread_raw + 1e-9


# ---------------------------------------------------- product quantization


def test_pq_assignment_matches_numpy_reference(spark):
    """Codes and sq_err agree with a numpy re-derivation against the SAME
    trained codebooks (training is deterministic and cached; this pins the
    assignment + error math, the part that runs at corpus scale)."""
    emb = with_double_vec(load_table(spark, SF, "embeddings"))
    coded = {r.vec_id: r for r in pq_codes(emb, f"{SF}/embeddings.parquet").collect()}
    raw = {
        r.vec_id: np.asarray(r.dv, dtype=np.float64)
        for r in emb.select("vec_id", "dv").collect()
    }
    dim = len(next(iter(raw.values())))
    m, sub_w = 4, dim // 4
    for j in range(m):
        sub = emb.select(
            "vec_id",
            F.slice("dv", j * sub_w + 1, sub_w).alias("dv"),
        ).withColumn("nrm", F.lit(0.0))
        cents = np.asarray(
            kmeans_centroids_cached(
                sub, cache_key=f"{SF}/embeddings.parquet#pq4x16s{j}", k=16, n_iters=2
            ),
            dtype=np.float64,
        )
        c_nrm = (cents * cents).sum(axis=1)
        for vid, v in raw.items():
            x = v[j * sub_w : (j + 1) * sub_w]
            d = (x @ x) + c_nrm - 2.0 * (cents @ x)
            assert coded[vid][f"code_{j}"] == int(np.argmin(d))
    # total sq_err equals the clamped sum of per-subspace minima
    for vid, v in raw.items():
        total = 0.0
        for j in range(m):
            sub = emb.select(
                "vec_id", F.slice("dv", j * sub_w + 1, sub_w).alias("dv")
            )
            cents = np.asarray(
                kmeans_centroids_cached(
                    sub.withColumn("nrm", F.lit(0.0)),
                    cache_key=f"{SF}/embeddings.parquet#pq4x16s{j}",
                    k=16,
                    n_iters=2,
                ),
                dtype=np.float64,
            )
            x = v[j * sub_w : (j + 1) * sub_w]
            d = (x @ x) + (cents * cents).sum(axis=1) - 2.0 * (cents @ x)
            total += max(float(d.min()), 0.0)
        assert coded[vid].sq_err == pytest.approx(total, rel=1e-9, abs=1e-9)


def test_pq_16_codewords_beat_one(spark):
    """Reconstruction with K=16 codewords per subspace must beat the
    trivial K=1 codebook (per-subspace mean) — the minimum bar for the
    Lloyd training to be doing anything."""
    emb = with_double_vec(load_table(spark, SF, "embeddings"))
    err16 = (
        pq_codes(emb, f"{SF}/embeddings.parquet", k=16)
        .agg(F.sum("sq_err"))
        .first()[0]
    )
    err1 = (
        pq_codes(emb, f"{SF}/embeddings.parquet", k=1)
        .agg(F.sum("sq_err"))
        .first()[0]
    )
    assert err16 < err1 * 0.9


def test_pq_query_shape(spark):
    rows = q_emb_pq(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.avg_sq_err >= 0.0
        assert 1 <= r.codes_used_s0 <= 16


# ------------------------------------------------------------- BPE training


def _python_bpe(word_counts: dict[str, int], n_merges: int):
    """Pure-Python reference: identical pair counting, tie-break, and
    greedy left-to-right merge application."""
    tbl = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in tbl.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = left + right
        merges.append((rank, left, right, merged, cnt))
        for w, syms in tbl.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = merged
                else:
                    out.append(x)
            tbl[w] = out
    return merges


def test_bpe_matches_python_reference(spark):
    docs = load_table(spark, SF, "documents")
    counts: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in r.text.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    expected = _python_bpe(counts, BPE_MERGES)
    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in q_text_bpe_vocab(spark, SF).orderBy("merge_rank").collect()
    ]
    assert got == expected


def test_bpe_handles_single_char_words(spark):
    words = spark.createDataFrame(
        [("a", 5), ("b", 3)], "word: string, cnt: bigint"
    )
    assert bpe_merges(words, n_merges=3) == []


def test_bpe_overlapping_merge_is_greedy_left_to_right(spark):
    # "aaaa" x1 with merge (a,a): greedy gives (aa)(aa), so round 2's top
    # pair is (aa, aa) — the classic overlap case.
    words = spark.createDataFrame(
        [("aaaa", 2), ("ab", 1)], "word: string, cnt: bigint"
    )
    merges = bpe_merges(words, n_merges=2)
    assert merges[0][1:4] == ("a", "a", "aa")
    # pair COUNTING sees all 3 adjacencies in "aaaa" (standard BPE counts
    # overlapping pairs) x2 words; APPLICATION is then non-overlapping
    assert merges[0][4] == 6
    assert merges[1][1:4] == ("aa", "aa", "aaaa")
    assert merges[1][4] == 2  # (aa)(aa) x2 — proves greedy L-to-R rewrite
