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

The bucket hash is an md5 prefix (``functions/hashing.py``, not xxhash64)
so the whole sketch — cells and estimates — is reproducible by the DuckDB
oracle byte-for-byte, keeping even the approximate tier
value-hash-checkable.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import md5_prefix_long


def _bucket(token: F.Column, row: F.Column, width: int) -> F.Column:
    """Row-salted engine-portable bucket (see functions/hashing.py)."""
    return (md5_prefix_long(row, token) % width).cast("int")


class CMS(NamedTuple):
    """A built sketch with its geometry attached: estimates computed with
    a different depth/width than the build probe the WRONG buckets and
    silently void the over-estimate guarantee, so the two travel together."""

    cells: DataFrame  # (row int, bucket int, cell long)
    depth: int
    width: int


def cms_build(
    tokens: DataFrame,
    depth: int = 4,
    width: int = 256,
    weight: str | None = None,
) -> CMS:
    """Build the d×w cell table from a ``(token[, weight])`` DataFrame.

    ``weight=None`` counts rows (a raw token stream); a weight column sums
    pre-aggregated counts — same totals, one input row per distinct token.
    Merge two sketches with equal geometry by unioning ``cells`` and
    summing ``cell`` per (row, bucket).
    """
    spark = tokens.sparkSession
    rows = spark.range(depth).select(F.col("id").cast("int").alias("row"))
    agg = F.sum(weight).alias("cell") if weight else F.count("*").alias("cell")
    cells = (
        tokens.crossJoin(F.broadcast(rows))
        .groupBy("row", _bucket(F.col("token"), F.col("row"), width).alias("bucket"))
        .agg(agg)
    )
    return CMS(cells, depth, width)


def cms_estimate(cms: CMS, queries: DataFrame) -> DataFrame:
    """Point-estimate each query token: min over its d cells.

    ``queries`` has a ``token`` column; the (tiny) query×depth probe set
    broadcasts against the (tiny) cell table — no corpus access at all,
    which is the point of carrying a sketch.
    """
    spark = cms.cells.sparkSession
    rows = spark.range(cms.depth).select(F.col("id").cast("int").alias("row"))
    probes = queries.crossJoin(F.broadcast(rows)).select(
        "token",
        "row",
        _bucket(F.col("token"), F.col("row"), cms.width).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cms.cells), ["row", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce("cell", F.lit(0))).alias("cms_estimate"))
    )
