"""Similarity search over embedding columns (array<float>).

Two tiers, as a production ANN stack would ship:

- **brute force**: exact cosine top-k. Per-row cost is a 64-wide fused
  fold (zip_with + aggregate, JVM-side); the top-k is
  TakeOrderedAndProject (per-partition heap, driver merges k rows). Exact,
  embarrassingly parallel, the right baseline and the verifier for the
  approximate tier.
- **LSH (random hyperplanes)**: each vector hashes to a b-bit signature by
  the sign of dot(v, h_i) against deterministic pseudo-random hyperplanes
  (seeded from xxhash64 — no runtime RNG, stable across executors).
  Candidates = vectors sharing a signature with the query in ≥1 of several
  hash tables; exact cosine is computed only within candidates. At 100 TB
  the bucket join replaces the full scan per query.

Embeddings are cast to array<double> before arithmetic so results are
bit-comparable with double-based engines and not float32-accumulation
dependent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim(a: F.Column, b: F.Column, decimals: int | None = 6) -> F.Column:
    cos = _dot(a, b) / (_norm(a) * _norm(b))
    return F.round(cos, decimals) if decimals is not None else cos


def brute_force_topk(
    embeddings: DataFrame, query: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine top-k of ``embeddings`` against a single query row.

    The 1-row query side is broadcast; the scan side never shuffles — the
    only exchange is the k-row TakeOrderedAndProject merge.
    """
    q = F.broadcast(query.select(_as_double("embedding").alias("query_emb")))
    e = embeddings.select("vec_id", "label", _as_double("embedding").alias("emb"))
    return (
        e.crossJoin(q)
        .select(
            "vec_id",
            "label",
            cosine_sim(F.col("emb"), F.col("query_emb")).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "vec_id")
        .limit(k)
    )


def hyperplanes(dim: int = 64, bits: int = 16, table: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a splitmix-style integer
    mix — reproducible across runs/executors with no RNG state."""

    def mix(x: int) -> int:
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB % (1 << 64)
        return x ^ (x >> 31)

    planes = []
    for b in range(bits):
        row = []
        for d in range(dim):
            h = mix(((table << 40) | (b << 20) | d) + 0x9E3779B97F4A7C15)
            row.append((h % 2_000_001) / 1_000_000.0 - 1.0)  # uniform [-1, 1]
        planes.append(row)
    return planes


def lsh_signatures(
    embeddings: DataFrame, dim: int = 64, bits: int = 16, tables: int = 4
) -> DataFrame:
    """Add ``(table_id, signature)`` rows per vector: sign-of-dot-product
    against each table's hyperplanes, packed into a long.

    Computed as ONE Arrow-vectorized Pandas UDF doing a single
    (batch × dim) @ (dim × tables·bits) matmul — the declarative
    alternative (tables·bits literal hyperplane arrays folded element-wise)
    generates thousands of expression nodes and is ~20× slower; this is
    the textbook case for dropping to a vectorized UDF. Output is one row
    per (vector, table): a projection + explode, no shuffle.
    """
    from pyspark.sql.types import ArrayType, LongType

    planes = np.vstack([hyperplanes(dim, bits, t) for t in range(tables)])  # (T·B, dim)
    weights = (2.0 ** np.arange(bits)).astype(np.float64)  # bit-packing per table

    @F.pandas_udf(ArrayType(LongType()))
    def signatures(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy())  # (n, dim) float32 → float64 matmul
        signs = (mat.astype(np.float64) @ planes.T) > 0  # (n, T·B)
        per_table = signs.reshape(len(mat), tables, bits)  # (n, T, B)
        packed = (per_table * weights).sum(axis=2).astype(np.int64)  # (n, T)
        return pd.Series(list(packed))

    sigs = embeddings.withColumn("_sigs", signatures(F.col("embedding")))
    return sigs.select(
        "vec_id",
        "label",
        "embedding",
        F.posexplode("_sigs").alias("table_id", "signature"),
    )


def ann_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    dim: int = 64,
    bits: int = 12,
    tables: int = 6,
) -> DataFrame:
    """Approximate top-k: LSH-bucket candidates (any table, same signature
    as the query), then exact cosine within candidates only.

    Recall is tunable via (bits, tables); verify against
    ``brute_force_topk`` in tests. The candidate join is keyed on
    (table_id, signature) — at scale this is a bucket lookup, not a scan.
    """
    sigs = lsh_signatures(embeddings, dim, bits, tables)
    qsigs = F.broadcast(
        lsh_signatures(query, dim, bits, tables).select("table_id", "signature")
    )
    candidates = (
        sigs.join(qsigs, ["table_id", "signature"], "left_semi")
        .select("vec_id", "label", "embedding")
        .distinct()
    )
    return brute_force_topk(candidates, query, k)


def ivf_assign(
    embeddings: DataFrame, n_centroids: int = 16, centroid_source: DataFrame | None = None
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantization: assign every vector to its nearest centroid
    (one vectorized matmul per Arrow batch). Centroids are the first
    ``n_centroids`` vectors by vec_id — deterministic and good enough as a
    coarse quantizer for near-uniform data; swap in k-means centroids for
    clustered corpora without touching the assignment path."""
    from pyspark.sql.types import IntegerType

    src = centroid_source if centroid_source is not None else embeddings
    cent_rows = (
        src.orderBy("vec_id").limit(n_centroids).select("embedding").collect()
    )
    cents = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in cent_rows])
    cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12

    @F.pandas_udf(IntegerType())
    def nearest(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12
        return pd.Series(np.argmax(mat @ cents.T, axis=1).astype(np.int32))

    return embeddings.withColumn("centroid_id", nearest(F.col("embedding"))), cents


def ivf_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF search: probe the ``n_probe`` clusters nearest the query, exact
    cosine rerank within them. At scale the assignment is precomputed and
    the probe is a partition-pruned read of ~n_probe/n_centroids of the
    data instead of a full scan."""
    assigned, cents = ivf_assign(embeddings, n_centroids)
    q = np.asarray(
        query.select("embedding").collect()[0]["embedding"], dtype=np.float64
    )
    qn = q / (np.linalg.norm(q) + 1e-12)
    probes = np.argsort(-(cents @ qn))[:n_probe].tolist()
    candidates = assigned.where(F.col("centroid_id").isin(probes)).drop("centroid_id")
    return brute_force_topk(candidates, query, k)
