"""Dedup operators: exact, n-gram Jaccard, MinHash LSH, SimHash."""

from __future__ import annotations

import pytest

from ecommerce_event_pipeline_spark.functions import dedup

BASE = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
NEAR = "the quick brown fox jumps over the lazy dog near the quiet river bank tonight"
OTHER = "completely different words about spark engines and distributed query planning"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),        # exact dup of 1
        (3, NEAR),        # near dup of 1 (one word differs)
        (4, OTHER),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark, docs):
    out = {r["canonical_doc_id"]: r for r in dedup.exact_dedup(docs).collect()}
    assert out[1]["doc_count"] == 2  # docs 1 and 2 collapse
    assert len(out) == 3


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0          # exact dup
    assert 0.5 < pairs[(1, 3)] < 1.0     # near dup
    assert (1, 4) not in pairs           # unrelated


def test_minhash_lsh_finds_near_dup_not_unrelated(spark, docs):
    out = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in dedup.minhash_near_dupes(docs, num_hashes=32, bands=16, k=3,
                                          threshold=0.3).collect()
    }
    assert (1, 2) in out and out[(1, 2)] == 1.0
    assert (1, 3) in out
    assert (1, 4) not in out and (2, 4) not in out and (3, 4) not in out


def test_minhash_signature_is_deterministic(spark, docs):
    a = dedup.minhash_signatures(docs, num_hashes=16, k=3).collect()
    b = dedup.minhash_signatures(docs, num_hashes=16, k=3).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_simhash_identical_docs_same_fingerprint(spark, docs):
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[4]


def test_simhash_dupes_blocks_and_verifies(spark, docs):
    out = {
        (r["doc_id_1"], r["doc_id_2"]): r["hamming"]
        for r in dedup.simhash_dupes(docs, max_hamming=3).collect()
    }
    assert out[(1, 2)] == 0
    assert (1, 4) not in out


def test_simhash_dupes_rejects_radius_beyond_pigeonhole(spark, docs):
    import pytest

    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_dupes(docs, max_hamming=4)


def test_dedup_clusters_min_label_over_chain(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    )
    # chain 1-2-3 (transitive), pair 5-6, singletons 4 and 7
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_id_1 long, doc_id_2 long"
    )
    from ecommerce_event_pipeline_spark.functions.dedup import dedup_clusters

    got = [(r["doc_id"], r["cluster_id"]) for r in dedup_clusters(docs, pairs).collect()]
    assert got == [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5), (7, 7)]
