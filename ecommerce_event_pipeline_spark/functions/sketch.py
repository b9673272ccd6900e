"""Mergeable frequency sketches — the approximate tier for corpus-scale
token statistics.

A count-min sketch summarizes token frequencies in a fixed d×w cell table
regardless of corpus size: each of d hash rows maps a token to one of w
buckets and accumulates its count; a point estimate is the MIN over the d
cells the token hashes to — always an over-estimate (collisions only add),
within eN of truth with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉.

Scale shape: the cell table is built with one explode + one (d·w)-key
aggregation (map-side partial combine collapses each partition to ≤ d·w
rows before the shuffle), and sketches from different corpus shards merge
by cell-wise SUM — the property that makes the sketch work on a stream or
a 100 TB fan-in where exact per-token counts would need a corpus-wide
shuffle on a billion-key domain.

The bucket hash is an md5 prefix (not xxhash64) so the whole sketch —
cells and estimates — is reproducible by the DuckDB oracle byte-for-byte,
keeping even the approximate tier value-hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(token: F.Column, row: F.Column, width: int) -> F.Column:
    """Row-salted md5 bucket: identical arithmetic exists in any engine."""
    h = F.md5(F.concat(row.cast("string"), F.lit("#"), token))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).cast("int")


def cms_build(
    tokens: DataFrame, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the d×w cell table from a ``(token)`` row stream.

    Output: (row, bucket, cell) — exactly depth·width rows upper-bound,
    merge-able with another sketch by summing cells.
    """
    spark = tokens.sparkSession
    rows = spark.range(depth).select(F.col("id").cast("int").alias("row"))
    return (
        tokens.crossJoin(F.broadcast(rows))
        .groupBy("row", _bucket(F.col("token"), F.col("row"), width).alias("bucket"))
        .agg(F.count("*").alias("cell"))
    )


def cms_estimate(
    cells: DataFrame, queries: DataFrame, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each query token: min over its d cells.

    ``queries`` has a ``token`` column; the (tiny) query×depth probe set
    broadcasts against the (tiny) cell table — no corpus access at all,
    which is the point of carrying a sketch.
    """
    spark = cells.sparkSession
    rows = spark.range(depth).select(F.col("id").cast("int").alias("row"))
    probes = queries.crossJoin(F.broadcast(rows)).select(
        "token", "row", _bucket(F.col("token"), F.col("row"), width).alias("bucket")
    )
    return (
        probes.join(F.broadcast(cells), ["row", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce("cell", F.lit(0))).alias("cms_estimate"))
    )
