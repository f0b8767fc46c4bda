"""Similarity search over embeddings (north-star extension set).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (bucket equi-join instead of full cross product).

Scale design (100 TB): the query set broadcasts (it is small by construction);
candidates stream through executors — per-partition heap via the windowed
top-k, never a global sort of all pairs. The LSH variant bounds the pair space
to same-bucket vectors; production would add multi-probe + IVF re-ranking.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.operators.dedup import dot_col, with_double_vec
from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_table


@query(
    "q_sim_cosine_topk",
    oracle="""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
               FROM embeddings),
         n AS (SELECT vec_id, dv,
                      list_reduce(list_transform(list_zip(dv, dv), p -> p[1] * p[2]),
                                  (a, b) -> a + b) AS nrm
               FROM v),
         pairs AS (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                  list_reduce(list_transform(list_zip(q.dv, c.dv), p -> p[1] * p[2]),
                              (x, y) -> x + y) / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos
           FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         ranked AS (
           SELECT q_id, c_id, cos,
                  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk
           FROM pairs)
    SELECT q_id, c_id, round(cos, 6) AS cos_sim, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: 10 query vectors (vec_id < 10) against the
    whole corpus, top-5 each. Query side broadcasts; cosine uses sequential
    folds (bitwise cross-engine determinism); ties broken by c_id."""
    emb = with_double_vec(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("dv").alias("q_dv"), F.col("nrm").alias("q_nrm")
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"), F.col("dv").alias("c_dv"), F.col("nrm").alias("c_nrm")
    )
    cos = dot_col(F.col("q_dv"), F.col("c_dv")) / (
        F.sqrt(F.col("q_nrm")) * F.sqrt(F.col("c_nrm"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return (
        F.broadcast(q)
        .join(c, F.col("q_id") != F.col("c_id"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("q_id", "c_id", F.round("cos", 6).alias("cos_sim"), "rnk")
    )


def _pseudo_hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (md5-derived, engine-free)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"lsh:{p}:{d}".encode()).hexdigest()
            row.append((int(h[:8], 16) / 0x7FFFFFFF) - 1.0)  # ~U(-1, 1)
        planes.append(row)
    return planes


@query("q_sim_ann_lsh")  # rows-only: LSH recall set is approximate by design
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH: 8 signature bits -> 256
    buckets; queries only meet same-bucket candidates (the scale path — the
    cross product never materializes). Hyperplanes are deterministic literals,
    so the result is stable run-to-run; it is approximate vs q_sim_cosine_topk
    (that exact query is the recall baseline)."""
    emb = with_double_vec(load_table(spark, sf_dir, "embeddings"))
    planes = _pseudo_hyperplanes(8, 64)
    sig = F.lit(0)
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(v) for v in plane])
        sig = sig + F.when(dot_col(F.col("dv"), plane_col) > 0, F.lit(1 << p)).otherwise(0)
    bucketed = emb.withColumn("bucket", sig)
    q = bucketed.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("dv").alias("q_dv"),
        F.col("nrm").alias("q_nrm"),
        "bucket",
    )
    c = bucketed.select(
        F.col("vec_id").alias("c_id"),
        F.col("dv").alias("c_dv"),
        F.col("nrm").alias("c_nrm"),
        "bucket",
    )
    cos = dot_col(F.col("q_dv"), F.col("c_dv")) / (
        F.sqrt(F.col("q_nrm")) * F.sqrt(F.col("c_nrm"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return (
        F.broadcast(q)
        .join(c, ["bucket"])
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("q_id", "c_id", F.round("cos", 6).alias("cos_sim"), "rnk")
    )
