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


def misra_gries_candidates(tokens: DataFrame, k: int = 200) -> DataFrame:
    """Per-partition Misra–Gries summaries (k counters each) — a bounded
    superset of every token with global frequency > n/k.

    Guarantee (averaging argument): if a token's global count f > n/k,
    then in at least one partition f_p > n_p/k, and Misra–Gries never
    evicts a token whose partition count exceeds n_p/k — so the UNION of
    the per-partition survivor sets contains every global heavy hitter.
    The union is ≤ k·partitions rows total, independent of corpus size;
    which LIGHT tokens also survive depends on arrival order, which is
    why callers must re-count candidates exactly (``heavy_hitters``)
    before claiming frequencies.

    mapInPandas (Arrow-batched, no per-row Python) holds exactly k
    counters per partition: increment a tracked token, adopt into a free
    slot, else decrement ALL counters by the untracked batch-remainder —
    the classic O(k)-space stream summary (Misra & Gries 1982).
    """
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("token", StringType()),
            StructField("lower_bound", LongType()),
        ]
    )

    def _mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for tok in pdf["token"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < k:
                    counters[tok] = 1
                else:
                    # decrement-all; drop zeros (dict comp, no per-token
                    # Python beyond this k-sized pass)
                    counters = {t: c - 1 for t, c in counters.items() if c > 1}
        if counters:
            yield pd.DataFrame(
                {"token": list(counters), "lower_bound": list(counters.values())}
            )

    return tokens.select("token").mapInPandas(_mg, out_schema)


def heavy_hitters(tokens: DataFrame, k: int = 200) -> DataFrame:
    """Exact heavy hitters (global frequency > n/k) via the two-pass
    sketch-then-verify pattern: pass 1 collapses each partition to ≤ k
    Misra–Gries survivors (no corpus-wide shuffle — the shuffled
    candidate union is ≤ k·partitions rows); pass 2 re-scans the stream,
    keeps only candidate tokens (broadcast semi-join BEFORE the shuffle,
    so the zipfian long tail never shuffles), counts them exactly, and
    applies the threshold with integer arithmetic.

    Output is EXACT and partitioning-independent: the candidate set
    varies with arrival order but is always a superset of the true heavy
    hitters, and the exact re-count discards the extras — which is what
    makes this oracle-able by a plain GROUP BY/HAVING in DuckDB.
    """
    cands = misra_gries_candidates(tokens, k).select("token").distinct()
    total = tokens.agg(F.count("*").alias("_n"))
    exact = (
        tokens.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("freq") * k > F.col("_n"))
        .select(
            "token",
            "freq",
            F.round(F.col("freq") * 100.0 / F.col("_n").cast("double"), 4).alias(
                "share_pct"
            ),
        )
        .orderBy(F.desc("freq"), "token")
    )
