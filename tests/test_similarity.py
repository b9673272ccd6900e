"""Similarity search: brute-force cosine top-k + LSH ANN recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_event_pipeline_spark.functions import similarity
from ecommerce_event_pipeline_spark.sources.readers import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return read_table(spark, SF_DIR, "embeddings").cache()


def test_self_similarity_is_top_hit(spark, embeddings):
    q = embeddings.where(F.col("vec_id") == 7)
    top = similarity.brute_force_topk(embeddings, q, k=3).collect()
    assert top[0]["vec_id"] == 7
    assert top[0]["cosine_sim"] == 1.0
    assert top[1]["cosine_sim"] < 1.0


def test_brute_force_is_deterministic(spark, embeddings):
    q = embeddings.where(F.col("vec_id") == 3)
    a = similarity.brute_force_topk(embeddings, q, k=10).collect()
    b = similarity.brute_force_topk(embeddings, q, k=10).collect()
    assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]


def test_ann_recall_against_brute_force(spark, embeddings):
    q = embeddings.where(F.col("vec_id") == 7)
    exact = {r["vec_id"] for r in similarity.brute_force_topk(embeddings, q, k=10).collect()}
    # These embeddings are near-random (true top-10 cosines ≈ 0.4), the
    # hardest case for hyperplane LSH: per-table collision P ≈ (1−θ/π)^bits.
    # 4 bits × 16 tables gives ~0.9 expected recall at cos 0.4.
    approx = {
        r["vec_id"]
        for r in similarity.ann_topk(embeddings, q, k=10, bits=4, tables=16).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6
    assert 7 in approx  # the query vector itself always collides with itself


def test_lsh_signatures_deterministic(spark, embeddings):
    a = similarity.lsh_signatures(embeddings.limit(20)).collect()
    b = similarity.lsh_signatures(embeddings.limit(20)).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_ivf_recall_against_brute_force(spark, embeddings):
    from pyspark.sql import functions as F

    q = embeddings.where(F.col("vec_id") == 7)
    exact = {r["vec_id"] for r in similarity.brute_force_topk(embeddings, q, k=10).collect()}
    ivf = {
        r["vec_id"]
        for r in similarity.ivf_topk(embeddings, q, k=10, n_centroids=16, n_probe=6).collect()
    }
    assert len(exact & ivf) / len(exact) >= 0.6
    assert 7 in ivf  # query vector's own cluster is always probed first
