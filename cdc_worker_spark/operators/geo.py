"""Geospatial operators (round 5): radius-bounded nearest neighbor with
EXACT grid blocking, and grid-cell density rollups. Coordinates are
synthesized deterministically from keys (the fixtures carry none — the
operators are the point); the blocking geometry is chosen so neighbor
cells COVER the search radius, making the blocked join equivalent to the
brute-force oracle (hash-matched at sf0.01 and sf1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_worker_spark.plans.registry import query
from cdc_worker_spark.sources.tables import load_table

#: geo demo constants: synthetic coords (fixtures carry none), radius-bounded
#: nearest with grid blocking sized so neighbor cells COVER the radius
_GEO_RADIUS_KM = 2000.0
_GEO_LAT_CELL = 20.0  # deg; radius needs <= 18.0 deg of latitude
_GEO_LON_CELL = 36.0  # deg; radius needs <= 31.3 deg of longitude at |lat|<=55


def _hav_km(lat1, lon1, lat2, lon2):
    """Haversine great-circle distance in km (identical expression tree on
    both engines; rounded before any comparison so 1-ulp libm differences
    cannot flip an argmin)."""
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.pow(F.sin(dlat), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon), 2)
    )
    return F.round(2 * 6371.0 * F.asin(F.sqrt(a)), 6)


@query(
    "q_geo_nearest_supplier",
    oracle="""
    WITH c AS (
      SELECT c_custkey,
             ((c_custkey * 37) % 11000) / 100.0 - 55.0 AS lat,
             ((c_custkey * 53) % 16000) / 100.0 - 80.0 AS lon
      FROM customer WHERE c_custkey % 29 = 0
    ),
    s AS (
      SELECT s_suppkey,
             ((s_suppkey * 41) % 11000) / 100.0 - 55.0 AS lat,
             ((s_suppkey * 59) % 16000) / 100.0 - 80.0 AS lon
      FROM supplier
    ),
    pairs AS (
      SELECT c.c_custkey, s.s_suppkey,
             round(2 * 6371.0 * asin(sqrt(
               pow(sin(radians(s.lat - c.lat) / 2), 2)
               + cos(radians(c.lat)) * cos(radians(s.lat))
                 * pow(sin(radians(s.lon - c.lon) / 2), 2))), 6) AS dist_km
      FROM c, s
    ),
    near AS (
      SELECT *, row_number() OVER (PARTITION BY c_custkey
                                   ORDER BY dist_km, s_suppkey) AS rn
      FROM pairs WHERE dist_km <= 2000.0
    )
    SELECT c.c_custkey, n.s_suppkey AS nearest_suppkey, n.dist_km
    FROM c LEFT JOIN (SELECT * FROM near WHERE rn = 1) n USING (c_custkey)
    """,
)
def q_geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial radius-bounded nearest neighbor: for each probe customer
    the closest supplier within 2000 km by haversine (NULL if none) —
    coordinates synthesized deterministically from the keys (the fixtures
    carry none; the OPERATOR is the point). The oracle brute-forces every
    pair; the engine uses GRID BLOCKING: suppliers replicate into their
    3x3 neighbor cells (explode — the small side), probes equi-join on
    their single cell. Cell sizes (20 deg lat / 36 deg lon with |lat|<=55)
    are chosen so ANY pair within the radius falls in neighboring cells —
    blocking is exact, not approximate, and a hash match proves it. At
    100 TB the supplier side is dimension-sized and broadcasts; the probe
    stream never shuffles. Distances round to 6 dp BEFORE the argmin so
    libm 1-ulp differences cannot flip the winner."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 29 == 0)
        .select(
            "c_custkey",
            (((F.col("c_custkey") * 37) % 11000) / 100.0 - 55.0).alias("lat"),
            (((F.col("c_custkey") * 53) % 16000) / 100.0 - 80.0).alias("lon"),
        )
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (((F.col("s_suppkey") * 41) % 11000) / 100.0 - 55.0).alias("s_lat"),
        (((F.col("s_suppkey") * 59) % 16000) / 100.0 - 80.0).alias("s_lon"),
    )
    lat_cell = lambda col: F.floor((col + 55.0) / _GEO_LAT_CELL)  # noqa: E731
    lon_cell = lambda col: F.floor((col + 80.0) / _GEO_LON_CELL)  # noqa: E731
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    s_rep = (
        s.withColumn("dy", F.explode(offsets))
        .withColumn("dx", F.explode(offsets))
        .select(
            "s_suppkey",
            "s_lat",
            "s_lon",
            (lat_cell(F.col("s_lat")) + F.col("dy")).alias("cell_y"),
            (lon_cell(F.col("s_lon")) + F.col("dx")).alias("cell_x"),
        )
    )
    probes = c.withColumn("cell_y", lat_cell(F.col("lat"))).withColumn(
        "cell_x", lon_cell(F.col("lon"))
    )
    dist = _hav_km(F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon"))
    cand = (
        probes.join(F.broadcast(s_rep), ["cell_y", "cell_x"])
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= _GEO_RADIUS_KM)
    )
    w = Window.partitionBy("c_custkey").orderBy("dist_km", "s_suppkey")
    near = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", F.col("s_suppkey").alias("nearest_suppkey"), "dist_km")
    )
    return c.select("c_custkey").join(near, "c_custkey", "left")


@query(
    "q_geo_cell_density",
    oracle="""
    WITH s AS (
      SELECT s_suppkey, s_acctbal,
             ((s_suppkey * 41) % 11000) / 100.0 - 55.0 AS lat,
             ((s_suppkey * 59) % 16000) / 100.0 - 80.0 AS lon
      FROM supplier
    )
    SELECT CAST(floor((lat + 55.0) / 10.0) AS BIGINT) AS cell_y,
           CAST(floor((lon + 80.0) / 10.0) AS BIGINT) AS cell_x,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(avg(s_acctbal), 6) AS avg_acctbal
    FROM s GROUP BY 1, 2
    """,
)
def q_geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial grid-cell density rollup (the geohash-aggregation shape:
    bin points into fixed cells, aggregate per cell — heatmaps, coverage
    maps, partition keys for spatial layouts). Pure projection + one hash
    aggregate; the cell id doubles as the spatial partition key a layout
    like write_zordered would cluster on."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_acctbal",
        (((F.col("s_suppkey") * 41) % 11000) / 100.0 - 55.0).alias("lat"),
        (((F.col("s_suppkey") * 59) % 16000) / 100.0 - 80.0).alias("lon"),
    )
    return (
        s.groupBy(
            F.floor((F.col("lat") + 55.0) / 10.0).alias("cell_y"),
            F.floor((F.col("lon") + 80.0) / 10.0).alias("cell_x"),
        )
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 6).alias("avg_acctbal"),
        )
    )
