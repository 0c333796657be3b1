"""Geospatial operators without any geo library: deterministic synthetic
coordinates + haversine math as plain Catalyst expressions.

Customers get reproducible lat/lon derived from their key (hash-scattered
over a continental box), so both engines build the identical point set.
The radius join uses the scale pattern every spatial engine implements
under the hood: GRID BLOCKING — points bucket into fixed-degree cells,
candidate pairs come only from the 3×3 neighborhood (equi-join on cell
ids), and the exact haversine verifies candidates. No all-pairs scan at
any scale; cell fanout is bounded by the grid constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query

EARTH_KM = 6371.0
RADIUS_KM = 25.0
# 1 degree latitude ≈ 111.32 km; the cell edge must be ≥ the search radius
# so a 3×3 neighborhood covers it even at the box's worst-case longitude
CELL_DEG = 0.5

# deterministic scatter: md5-derived fraction in [0, 1) per axis
_LAT_SQL = "(30.0 + 15.0 * (CAST(('0x' || substr(md5('lat' || CAST(c_custkey AS VARCHAR)), 1, 6)) AS BIGINT) / 16777216.0))"
_LON_SQL = "(-120.0 + 30.0 * (CAST(('0x' || substr(md5('lon' || CAST(c_custkey AS VARCHAR)), 1, 6)) AS BIGINT) / 16777216.0))"


def _lat_col():  # noqa: ANN202
    frac = F.conv(F.substring(F.md5(F.concat(F.lit("lat"), F.col("c_custkey").cast("string"))), 1, 6), 16, 10).cast("double") / 16777216.0
    return F.lit(30.0) + 15.0 * frac


def _lon_col():  # noqa: ANN202
    frac = F.conv(F.substring(F.md5(F.concat(F.lit("lon"), F.col("c_custkey").cast("string"))), 1, 6), 16, 10).cast("double") / 16777216.0
    return F.lit(-120.0) + 30.0 * frac


def _sql_haversine(lat_a: str, lon_a: str, lat_b: str, lon_b: str) -> str:
    return (
        f"2.0 * {EARTH_KM} * asin(sqrt("
        f"pow(sin(radians(({lat_b}) - ({lat_a})) / 2.0), 2)"
        f" + cos(radians({lat_a})) * cos(radians({lat_b}))"
        f" * pow(sin(radians(({lon_b}) - ({lon_a})) / 2.0), 2)))"
    )


def _haversine(lat_a, lon_a, lat_b, lon_b):  # noqa: ANN001, ANN202
    dlat = F.radians(lat_b - lat_a) / 2.0
    dlon = F.radians(lon_b - lon_a) / 2.0
    h = (
        F.pow(F.sin(dlat), F.lit(2.0))
        + F.cos(F.radians(lat_a)) * F.cos(F.radians(lat_b))
        * F.pow(F.sin(dlon), F.lit(2.0))
    )
    return 2.0 * EARTH_KM * F.asin(F.sqrt(h))


def _points(spark: SparkSession, sf_dir: str, limit_key: int) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < limit_key)
    return c.select(
        F.col("c_custkey").alias("pid"),
        _lat_col().alias("lat"),
        _lon_col().alias("lon"),
    )


@query(
    "geo_radius_join",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey AS pid, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
  FROM customer WHERE c_custkey < 2000
)
SELECT a.pid AS pid_a, b.pid AS pid_b,
       floor(({_sql_haversine('a.lat', 'a.lon', 'b.lat', 'b.lon')}) * 10000 + 0.5) / 10000
         AS dist_km
FROM pts a JOIN pts b
  ON a.pid < b.pid
 AND floor(b.lat / {CELL_DEG}) BETWEEN floor(a.lat / {CELL_DEG}) - 1
                                   AND floor(a.lat / {CELL_DEG}) + 1
 AND floor(b.lon / {CELL_DEG}) BETWEEN floor(a.lon / {CELL_DEG}) - 1
                                   AND floor(a.lon / {CELL_DEG}) + 1
WHERE {_sql_haversine('a.lat', 'a.lon', 'b.lat', 'b.lon')} <= {RADIUS_KM}
""",
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within 25 km (haversine), via grid blocking: each
    point replicates into its 3×3 neighbor cells on the build side, the
    probe side joins on its OWN cell (equi-join on cell id), exact
    haversine verifies. The blocking contract (cell ≥ radius in degrees at
    this box's latitudes) is part of the key: both engines enumerate the
    identical candidate set, so the oracle checks blocking + verify, not
    just the formula. Scale: Σ per-cell |build|·|probe| bounded by the
    grid constant — never O(n²).
    """
    pts = _points(spark, sf_dir, 2000)
    cell_lat = F.floor(F.col("lat") / CELL_DEG)
    cell_lon = F.floor(F.col("lon") / CELL_DEG)
    probe = pts.select(
        F.col("pid").alias("pid_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        cell_lat.alias("cla"),
        cell_lon.alias("clo"),
    )
    # build side replicated into the 3x3 neighborhood: the classic
    # replicate-build/partition-probe trade for bounded-range joins
    offsets = F.expr("explode(flatten(transform(sequence(-1, 1), i -> transform(sequence(-1, 1), j -> struct(i AS di, j AS dj)))))")
    build = pts.select(
        F.col("pid").alias("pid_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        cell_lat.alias("clb"),
        cell_lon.alias("clb_lon"),
    ).select("*", offsets.alias("o")).select(
        "pid_b", "lat_b", "lon_b",
        (F.col("clb") + F.col("o.di")).alias("cla"),
        (F.col("clb_lon") + F.col("o.dj")).alias("clo"),
    )
    dist = _haversine(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"))
    return (
        probe.join(build, ["cla", "clo"])
        .filter(F.col("pid_a") < F.col("pid_b"))
        .withColumn("dist_raw", dist)
        .filter(F.col("dist_raw") <= RADIUS_KM)
        .select("pid_a", "pid_b", r4(F.col("dist_raw")).alias("dist_km"))
    )


@query(
    "geo_grid_aggregate",
    oracle=f"""
SELECT CAST(floor({_LAT_SQL} / 1.0) AS BIGINT) AS cell_lat,
       CAST(floor({_LON_SQL} / 1.0) AS BIGINT) AS cell_lon,
       count(*) AS n_points,
       floor(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) * 10000 + 0.5)
         / 10000 AS sum_balance
FROM customer
GROUP BY cell_lat, cell_lon
""",
)
def geo_grid_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial binning: 1-degree grid cells with per-cell point count and
    balance sum — the map-side density rollup behind heatmaps and spatial
    partitioning decisions. One grouped pass, cell id computed inline.

    The money sum accumulates in exact DECIMAL(18,2) on BOTH engines (the
    repo's accumulation-order parity rule, stats_ext precedent): a raw
    double sum near a .00005 rounding boundary can hash-diverge when
    partition merge order differs from DuckDB's scan order (ADVICE r8)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            F.floor(_lat_col() / 1.0).cast("long").alias("cell_lat"),
            F.floor(_lon_col() / 1.0).cast("long").alias("cell_lon"),
            "c_acctbal",
        )
        .groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            r4(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")).alias(
                "sum_balance"
            ),
        )
    )


KNN_K = 3
KNN_N_PROBES = 20


@query(
    "geo_knn_join",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey AS pid, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
  FROM customer WHERE c_custkey < 2000
),
probes AS (SELECT pid AS qid, lat AS qlat, lon AS qlon FROM pts WHERE pid < {KNN_N_PROBES}),
scored AS (
  SELECT q.qid, p.pid AS neighbor,
         {_sql_haversine("q.qlat", "q.qlon", "p.lat", "p.lon")} AS dist,
         row_number() OVER (PARTITION BY q.qid
                            ORDER BY {_sql_haversine("q.qlat", "q.qlon", "p.lat", "p.lon")} ASC,
                                     p.pid ASC) AS rk
  FROM probes q JOIN pts p ON p.pid <> q.qid
)
SELECT qid, neighbor, CAST(rk AS BIGINT) AS rk,
       floor(dist * 10000 + 0.5) / 10000 AS dist_km
FROM scored WHERE rk <= {KNN_K}
""",
)
def geo_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor spatial join: each of the {KNN_N_PROBES} probe
    points gets its {KNN_K} nearest other points by exact haversine — the
    store-siting / coverage primitive beside the radius join.

    The probe side is small by construction, so the join is a broadcast
    map-side scan of the point set (no shuffle of points), and per-probe
    top-k is a (probe)-partitioned window — rank determinism comes from the
    shared IEEE haversine tree + pid tie-break. At scale with a LARGE probe
    side, switch to the grid-cell candidate pattern of geo_radius_join with
    expanding-ring search; the verify step stays this exact formula.
    """
    from pyspark.sql import Window

    pts = _points(spark, sf_dir, 2000)
    probes = pts.filter(F.col("pid") < KNN_N_PROBES).select(
        F.col("pid").alias("qid"), F.col("lat").alias("qlat"), F.col("lon").alias("qlon")
    )
    scored = pts.join(
        F.broadcast(probes), F.col("pid") != F.col("qid")
    ).select(
        "qid",
        F.col("pid").alias("neighbor"),
        _haversine(F.col("qlat"), F.col("qlon"), F.col("lat"), F.col("lon")).alias("dist"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("neighbor").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= KNN_K)
        .select("qid", "neighbor", "rk", r4(F.col("dist")).alias("dist_km"))
    )
