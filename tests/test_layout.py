"""Z-order layout evidence: footer-stats file pruning on BOTH dimensions.

Writes lineitem twice — plain-sorted by l_partkey vs Z-ordered on
(l_partkey, l_suppkey) — then reads the parquet footers and counts how many
files a point predicate must scan under each layout. The plain sort prunes
perfectly on its sort key and not at all on the second key; the Z layout
must prune on BOTH. This is the actual mechanism (min/max skipping) a
100 TB scan relies on, measured on real written files, not a simulation."""

from __future__ import annotations

import pytest

from cdc_worker_spark.sources.layout import (
    file_minmax,
    files_hit,
    write_sorted,
    write_zordered,
)
from cdc_worker_spark.sources.tables import load_table

N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    base = tmp_path_factory.mktemp("layout")
    sorted_path = str(base / "by_partkey")
    z_path = str(base / "zorder")
    write_sorted(li, sorted_path, "l_partkey", N_FILES)
    write_zordered(li, z_path, "l_partkey", "l_suppkey", N_FILES)
    return li, sorted_path, z_path


def _probe_values(minmax):
    """A few probe points spread over the key domain."""
    lo = min(m for _, m, _h in minmax)
    hi = max(m for _, _l, m in minmax)
    step = max((hi - lo) // 7, 1)
    return list(range(lo + step, hi, step))[:5]


def test_zorder_prunes_second_dimension(layouts):
    """On l_suppkey (NOT the plain layout's sort key) the Z layout must
    scan strictly fewer files; the plain layout scans essentially all."""
    _, sorted_path, z_path = layouts
    mm_sorted = file_minmax(sorted_path, "l_suppkey")
    mm_z = file_minmax(z_path, "l_suppkey")
    assert len(mm_sorted) > N_FILES // 2 and len(mm_z) > N_FILES // 2
    probes = _probe_values(mm_z)
    hit_sorted = sum(files_hit(mm_sorted, v) for v in probes)
    hit_z = sum(files_hit(mm_z, v) for v in probes)
    # plain sort on partkey leaves suppkey unclustered: ~every file hit
    assert hit_sorted >= 0.9 * len(probes) * len(mm_sorted)
    assert hit_z < 0.75 * hit_sorted, (hit_z, hit_sorted)


def test_zorder_still_prunes_first_dimension(layouts):
    """The Z layout trades a little leading-key locality for the second
    dimension — it must still skip a meaningful fraction of files on
    l_partkey (a plain sort is perfect; Z must stay well under scan-all)."""
    _, _, z_path = layouts
    mm_z = file_minmax(z_path, "l_partkey")
    probes = _probe_values(mm_z)
    hit_z = sum(files_hit(mm_z, v) for v in probes)
    assert hit_z < 0.75 * len(probes) * len(mm_z), hit_z


def test_zorder_write_preserves_rows(layouts, spark):
    li, _, z_path = layouts
    got = spark.read.parquet(z_path)
    assert got.count() == li.count()
    assert sorted(got.columns) == sorted(li.columns)
    # spot-check content equality on an aggregate
    import pyspark.sql.functions as F

    a = li.agg(F.sum("l_orderkey"), F.sum("l_suppkey")).collect()[0]
    b = got.agg(F.sum("l_orderkey"), F.sum("l_suppkey")).collect()[0]
    assert tuple(a) == tuple(b)


def test_scan_manifest_matches_footers(layouts, spark):
    """The distributed zone-map manifest must agree with the parquet
    footers file-for-file (same mins/maxes the planner would prune with)."""
    import os

    from cdc_worker_spark.sources.layout import scan_manifest

    _, _, z_path = layouts
    mani = {
        os.path.basename(r.file): (r.l_suppkey_min, r.l_suppkey_max)
        for r in scan_manifest(spark, z_path, ["l_suppkey"]).collect()
    }
    foot = {name: (lo, hi) for name, lo, hi in file_minmax(z_path, "l_suppkey")}
    assert mani == foot


def test_ingest_sized_multiplies_row_groups(spark, sf_dir, tmp_path):
    """The sized ingest must turn the single-row-group fixtures into
    multi-file tables with identical content — the scan-parallelism floor."""
    import os

    from cdc_worker_spark.sources.layout import ingest_sized
    from cdc_worker_spark.sources.tables import load_table

    out = str(tmp_path / "ingested")
    ingest_sized(spark, sf_dir, out, rows_per_file=500, max_files=8)
    li_src = load_table(spark, sf_dir, "lineitem")
    li_new = spark.read.parquet(os.path.join(out, "lineitem.parquet"))
    n_files = len(
        [f for f in os.listdir(os.path.join(out, "lineitem.parquet"))
         if f.endswith(".parquet")]
    )
    assert n_files >= 4
    assert li_new.count() == li_src.count()
    import pyspark.sql.functions as F

    # decimal sum: associative-exact, so equality holds across layouts
    # (a raw double sum differs in the last bits with partition order)
    dec = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    assert li_new.agg(dec).collect()[0][0] == li_src.agg(dec).collect()[0][0]
