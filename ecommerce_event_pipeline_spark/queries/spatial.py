"""Spatial analytics over hash-derived coordinates (T160).

Round-11 expansion: the one operator family the engine did not yet
cover — a distributed SPATIAL join. Coordinates are synthesized
deterministically from the portable hash (the fixtures carry no geo
columns; a production deployment reads real lat/lon and keeps the
identical plan), and the join uses the standard distributed-spatial
recipe: grid-cell blocking (each point keyed by its cell, candidate
pairs only within a cell) followed by an exact haversine verify — the
same block-then-verify shape as the SimHash/MinHash dedup tiers, so
no all-pairs join ever exists at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry_core import register
from ..sources.readers import read_table

_GEO_ORACLE = """
WITH pts AS (
  SELECT c_custkey,
         CAST(CAST(('0x' || substr(md5('lat#' || c_custkey), 1, 8))
                   AS BIGINT) % 1800000 AS DOUBLE) / 10000.0 - 90.0 AS lat,
         CAST(CAST(('0x' || substr(md5('lon#' || c_custkey), 1, 8))
                   AS BIGINT) % 3600000 AS DOUBLE) / 10000.0 - 180.0 AS lon
  FROM customer
),
cells AS (
  SELECT c_custkey, lat, lon,
         CAST(floor(lat / 10.0) AS BIGINT) AS cy,
         CAST(floor(lon / 10.0) AS BIGINT) AS cx
  FROM pts
),
pairs AS (
  SELECT a.c_custkey AS cust_1, b.c_custkey AS cust_2,
         a.lat AS lat1, a.lon AS lon1, b.lat AS lat2, b.lon AS lon2
  FROM cells a JOIN cells b
    ON a.cy = b.cy AND a.cx = b.cx AND a.c_custkey < b.c_custkey
),
dist AS (
  SELECT cust_1, cust_2,
         ROUND(2.0 * 6371.0088 * asin(sqrt(
           sin(radians(lat2 - lat1) / 2.0) * sin(radians(lat2 - lat1) / 2.0)
           + cos(radians(lat1)) * cos(radians(lat2))
             * sin(radians(lon2 - lon1) / 2.0)
             * sin(radians(lon2 - lon1) / 2.0))), 4) AS km
  FROM pairs
)
SELECT cust_1, cust_2, km
FROM dist
ORDER BY km, cust_1, cust_2
LIMIT 100
"""


@register("geo_cell_neighbors", _GEO_ORACLE)
def geo_cell_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T160: nearest customer pairs by grid-blocked spatial join — the
    distributed spatial-join recipe: key every point by its 10°×10°
    grid cell (one shuffle), generate candidate pairs only within a
    cell (the blocking tier; candidates per cell are density-bounded,
    never all-pairs), verify with the exact haversine distance, and
    take the 100 nearest (TakeOrderedAndProject). Coordinates are
    hash-derived microdegree integers divided once to DOUBLE, so both
    engines replay every bit; the haversine is one fixed trig tree,
    rounded. Production swap-ins: real lat/lon columns, a finer cell
    size matched to the query radius, and neighbor-cell union for
    radius queries crossing cell borders — the plan shape is
    unchanged.

    ACCEPTED LIBM RISK (documented per ADVICE r11): unlike sqrt (IEEE
    correctly rounded everywhere, the discipline value_ks_drift relies
    on), sin/cos/asin are only ~1-ulp accurate and may differ between
    the JVM and DuckDB's libm. A 1-ulp divergence near a 4-decimal
    rounding boundary, or near the rank-100 tie, could in principle
    change the reported km or the cutoff set on another platform. Both
    engines agree on this host (driver-hash green r11). The cutoff
    half of the risk could be removed by ranking on an integer
    squared-chord proxy, but the displayed km would still be
    libm-computed and hash-relevant, so the proxy buys no cross-engine
    guarantee — we accept and document instead. A production variant
    that must be engine-portable should report fixed-point distances
    computed from an integer-only metric, or tolerate last-decimal
    slack in comparisons."""
    cust = read_table(spark, sf_dir, "customer")
    from ..functions.hashing import md5_prefix_long

    pts = cust.select(
        "c_custkey",
        (
            (md5_prefix_long("lat", F.col("c_custkey")) % 1800000).cast(
                "double"
            )
            / 10000.0
            - 90.0
        ).alias("lat"),
        (
            (md5_prefix_long("lon", F.col("c_custkey")) % 3600000).cast(
                "double"
            )
            / 10000.0
            - 180.0
        ).alias("lon"),
    )
    cells = pts.select(
        "c_custkey",
        "lat",
        "lon",
        F.floor(F.col("lat") / 10.0).cast("long").alias("cy"),
        F.floor(F.col("lon") / 10.0).cast("long").alias("cx"),
    )
    a = cells.select(
        F.col("c_custkey").alias("cust_1"),
        F.col("lat").alias("lat1"),
        F.col("lon").alias("lon1"),
        "cy",
        "cx",
    )
    b = cells.select(
        F.col("c_custkey").alias("cust_2"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
        "cy",
        "cx",
    )
    pairs = a.join(b, ["cy", "cx"]).where(F.col("cust_1") < F.col("cust_2"))
    dlat = F.radians(F.col("lat2") - F.col("lat1")) / 2.0
    dlon = F.radians(F.col("lon2") - F.col("lon1")) / 2.0
    km = F.round(
        2.0
        * 6371.0088
        * F.asin(
            F.sqrt(
                F.sin(dlat) * F.sin(dlat)
                + F.cos(F.radians("lat1"))
                * F.cos(F.radians("lat2"))
                * F.sin(dlon)
                * F.sin(dlon)
            )
        ),
        4,
    )
    return (
        pairs.select("cust_1", "cust_2", km.alias("km"))
        .orderBy("km", "cust_1", "cust_2")
        .limit(100)
    )
