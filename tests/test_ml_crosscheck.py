"""Cross-validate our MinHash LSH against spark.ml's MinHashLSH.

Two independent implementations (ours: xxhash64 signatures + band
self-join; spark.ml: hash-family approxSimilarityJoin over sparse shingle
vectors) must surface the same near-duplicate pairs on a corpus with
planted duplicates — implementation-level agreement that a single oracle
cannot give for hash-based operators.
"""

from __future__ import annotations

import pytest
from pyspark.ml.feature import CountVectorizer, MinHashLSH
from pyspark.sql import functions as F

from ecommerce_event_pipeline_spark.functions import dedup

BASE = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
NEAR = "the quick brown fox jumps over the lazy dog near the quiet river bank tonight"
DOCS = [
    (1, BASE),
    (2, BASE),
    (3, NEAR),
    (4, "completely different words about spark engines and distributed planning"),
    (5, "another unrelated document discussing parquet files and columnar layouts"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_minhash_agrees_with_spark_ml_lsh(spark, docs):
    ours = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in dedup.minhash_near_dupes(
            docs, num_hashes=32, bands=16, k=3, threshold=0.3
        ).collect()
    }

    shingled = dedup.shingle_sets(docs, k=3)
    cv = CountVectorizer(inputCol="shingles", outputCol="features", binary=True)
    model = cv.fit(shingled)
    feats = model.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    lsh_model = lsh.fit(feats)
    # approxSimilarityJoin distance = 1 − jaccard; threshold 0.7 ⇔ jaccard ≥ 0.3
    pairs = lsh_model.approxSimilarityJoin(feats, feats, 0.7, distCol="dist")
    theirs = {
        (r["a"], r["b"])
        for r in pairs.select(
            F.col("datasetA.doc_id").alias("a"), F.col("datasetB.doc_id").alias("b")
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
        .collect()
    }
    assert ours == theirs
    assert (1, 2) in ours and (1, 3) in ours and (2, 3) in ours
