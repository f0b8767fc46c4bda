"""Planted-evidence tests for the corpus-level ops (decontamination and
embedding quantization) — non-vacuous by construction, same style as the
planted-duplicates dedup test."""

from __future__ import annotations

from cdc_worker_spark.plans.registry import all_queries


def test_decontaminate_flags_planted_overlap(spark, tmp_path):
    """A training doc quoting >=3 consecutive trigrams from an eval doc is
    flagged against THAT eval doc; a clean doc is not flagged."""
    leak = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, f"benchmark question: {leak}", "en", "eval", 0),      # eval set
            (2, "unrelated eval text entirely different", "en", "eval", 0),
            (100, f"training blob contains {leak} verbatim copy", "en", "web", 0),
            (101, "completely clean training document no overlap", "en", "web", 0),
        ],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    )
    path = str(tmp_path / "docs")
    docs.write.parquet(path + "/documents.parquet")
    hits = {
        (r.doc_id, r.eval_id): r.n_shared
        for r in all_queries()["q_docs_decontaminate"](spark, path).collect()
    }
    assert (100, 1) in hits and hits[(100, 1)] >= 3
    assert all(doc != 101 for doc, _ in hits)
    assert all(ev != 2 for _, ev in hits)


def test_quantize_roundtrip_error_bounded(spark, sf_dir):
    """Dequantized vectors reconstruct the original within the symmetric
    int8 bound: |x - q/scale| <= 0.5/scale per component, and every q fits
    int8 range [-127, 127]."""
    rows = all_queries()["q_emb_quantize"](spark, sf_dir).collect()
    assert rows
    import duckdb

    con = duckdb.connect()
    orig = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) "
            f"FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    }
    con.close()
    checked = 0
    for r in rows[:50]:
        dv = orig[r.vec_id]
        scale = 127.0 / max(abs(x) for x in dv)
        qs = [int(s) for s in r.qv_csv.split(",")]
        assert len(qs) == len(dv)
        for x, q in zip(dv, qs):
            assert -127 <= q <= 127
            assert abs(x - q / scale) <= 0.5 / scale + 1e-12
            checked += 1
    assert checked > 0
