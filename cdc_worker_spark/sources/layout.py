"""Storage-layout optimization: Z-ordered writes for multi-dimensional
data skipping, and sized-file writes.

At 100 TB the dominant query cost is the scan, and the dominant scan saving
is SKIPPING — parquet row-group/file pruning on min/max statistics. A table
sorted by one key skips perfectly on that key and not at all on any other;
interleaving the bits of two keys (operators/timeseries.zorder_key) makes
files cluster in BOTH dimensions, so point/range predicates on either
column prune most files. The writer here is the production seam: curated
tables (dedup indexes, packed corpora, CDC state snapshots) are rewritten
through it after compaction.

Evidence: tests/test_layout.py writes the same table plain-sorted and
Z-ordered, reads the parquet footers (pyarrow), and asserts the Z layout
prunes files on the SECOND dimension where the plain sort cannot.

Spark's own runtime complement — row-level bloom-filter join pruning
(`spark.sql.optimizer.runtime.bloomFilter.*`, on by default) — is
plan-asserted in tests/test_plans.py: a selective dim-side filter injects a
`might_contain` semi-filter into the fact scan, the shuffle-join analogue
of broadcast pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_worker_spark.operators.timeseries import zorder_key


def scaled_zorder_key(
    x, y, x_lo: int, x_hi: int, y_lo: int, y_hi: int, bits: int = 8
):
    """Z-order key over DOMAIN-NORMALIZED coordinates: each column is first
    rescaled to a ``bits``-wide rank over its [lo, hi] range, THEN
    interleaved. Raw interleaving silently degrades to a single-key sort
    when the domains have unequal bit widths (an 11-bit key x a 7-bit key
    puts every high interleaved bit on the wide key, so range splits never
    cluster the narrow one) — normalization is what makes Z-ordering work
    on real columns. 2^bits cells per dimension bounds the grid; 8 bits
    (256 x 256 cells) is plenty for file-level pruning."""
    m = (1 << bits) - 1
    sx = F.floor((x - F.lit(x_lo)) * m / F.lit(max(x_hi - x_lo, 1))).cast(
        "long"
    )
    sy = F.floor((y - F.lit(y_lo)) * m / F.lit(max(y_hi - y_lo, 1))).cast(
        "long"
    )
    return zorder_key(sx, sy, bits=bits)


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the normalized Z-order key of
    (``col_x``, ``col_y``): range-partition on the key (so each output file
    owns a contiguous Z range) and sort within partitions (so row groups
    inside a file are tight too). The helper column is dropped before the
    write; dropping is a projection, which preserves the physical order.

    The domain bounds come from one min/max aggregate over the two columns
    — a metadata-sized driver read, negligible next to the write itself
    (production: table statistics serve the same numbers for free)."""
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).collect()[0]
    keyed = df.withColumn(
        "_zkey",
        scaled_zorder_key(
            F.col(col_x), F.col(col_y), lo_x, hi_x, lo_y, hi_y, bits=bits
        ),
    )
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_sorted(
    df: DataFrame, path: str, col: str, n_files: int
) -> None:
    """Single-key clustered write (the baseline the Z layout is compared
    against): perfect skipping on ``col``, none on anything else."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax(path: str, column: str) -> list[tuple]:
    """(file_name, min, max) of ``column`` per parquet data file under
    ``path``, read from the footer statistics — exactly the metadata a scan
    planner prunes with. Driver-side metadata read; no data pages touched.
    Files with no statistics for the column (e.g. empty parts) are omitted;
    the name in each tuple lets callers join by file instead of position."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                if col.path_in_schema != column or col.statistics is None:
                    continue
                st = col.statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((name, lo, hi))
    return out


def files_hit(minmax: list[tuple], value) -> int:
    """How many files a point predicate ``col = value`` must scan under the
    given per-file (name, min, max) stats — the skipping metric."""
    return sum(1 for _, lo, hi in minmax if lo <= value <= hi)


def scan_manifest(spark, path: str, columns: list[str]):
    """Per-file zone map AS A DATAFRAME: (file, n_rows, min/max of each
    audited column), computed distributed via an ``input_file_name()``
    group-by. :func:`file_minmax` reads footers on the driver — exact and
    cheap up to ~1e5 files; this is the 100 TB form (a million-file table's
    manifest is itself a dataset), and doubles as the layout-quality audit:
    join the manifest to a predicate range and you get the files a scan
    would touch before running it."""
    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("n_rows")]
    for c in columns:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def ingest_sized(
    spark,
    sf_dir: str,
    out_dir: str,
    rows_per_file: int = 20_000,
    max_files: int = 32,
) -> None:
    """Re-materialize the fixture tables in a SPLIT-ABLE multi-file layout.

    The driver-shipped fixtures are single-file/single-row-group parquet —
    and a row group is the unit of scan parallelism, so every query's scan
    + partial aggregation runs on ONE core no matter the cluster size. This
    is precisely the "one giant uploaded file" pathology of real lakes; the
    fix is the same: ingest once into right-sized files (here
    ``rows_per_file`` per file, capped at ``max_files``), and every
    downstream scan fans out. Round-robin repartition — clustering choices
    (Z-order, range) belong to :func:`write_zordered` / :func:`write_sorted`;
    this is the parallelism floor.

    r12 (guide §2.6 overlap independent jobs): the per-table
    count+rewrite jobs are independent, and each one's tail (a handful of
    write tasks) left most cores idle — they now run from a small driver
    thread pool so one table's tail back-fills with the next table's
    scan. Three in flight is enough to fill the tail without the jobs
    fighting for executors; results are byte-identical (same per-table
    plans, just overlapped scheduling)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    from cdc_worker_spark.sources.tables import TABLES, load_table

    def rewrite(name: str) -> None:
        spark.sparkContext.setJobDescription(f"ingest_sized: {name}")
        df = load_table(spark, sf_dir, name)
        n = df.count()
        files = max(1, min(max_files, (n + rows_per_file - 1) // rows_per_file))
        df.repartition(files).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )

    with ThreadPoolExecutor(max_workers=3) as pool:
        list(pool.map(rewrite, TABLES))
