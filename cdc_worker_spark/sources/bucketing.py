"""Bucketed-table layout for co-located, shuffle-free joins (SCALE.md
"Joins"; the brief's "bucketing for co-located joins").

At 100 TB the dominant repeated cost is re-shuffling fact tables on the same
join key query after query. Writing both sides bucketed by that key
(`bucketBy(n, key)` + `sortBy(key)`) makes every subsequent equi-join on it
shuffle-free: Spark matches bucket specs and plans a SortMergeJoin with NO
Exchange on either side — the join cost collapses to a per-bucket merge.

This is the batch analogue of the reference's per-topic partitioning (C2:
one subscription map entry per topic, events of a topic co-located on one
callback — client.js:74-77): the bucket IS the co-location unit.

Bucketed tables require the session catalog (``saveAsTable``); data lands
under ``spark.sql.warehouse.dir`` or the explicit ``path`` option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key``. Sorting
    within buckets lets the join skip its Sort as well on Spark's
    bucket-sorted scans."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-key same-bucket-count tables: planned with no Exchange
    (asserted by tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
