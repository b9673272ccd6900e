"""Empirical scale probe: do the headline operators scale ~linearly?

Builds an M× copy of the sf0.1 fixtures in /tmp (key-shifted unions so
cardinalities actually grow; document text is per-replica token-salted so
replicas are NOT near-duplicates of each other — naive duplication would
inflate every dup cluster M× and grow pair tables M², a data pathology,
not operator superlinearity), then times a representative query set at
both scales in one session and prints the time ratio per query.

A ratio ≈ M (or below, as fixed overheads amortize) is the linear-scaling
evidence the 100 TB design claims rest on; a ratio ≫ M flags a
superlinear term that small-SF correctness runs can't see.

Usage: python tools/scale_probe.py [M] [--once] [query ...]  (default M=10)
Writes nothing to the repo; fixtures land in /tmp/scale_probe_sf/.

``--once`` runs the big side ONCE — for stateful streaming queries whose
single 100× run takes minutes (the session-window job is 427 s at 100×;
the min-of-3 protocol would need ~an hour per query). The CHEAP 1× side
is still warmed first (one untimed pass) so the measured ratio is a
genuine upper bound on warm scaling: without that warm pass the cold 1×
run pays codegen/first-touch that the later big run amortizes, inflating
t_small and making the ratio an optimistic UNDERstatement (ADVICE r9).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/scale_probe_sf"

# representative set: corpus explode+window, blocked pair generation,
# MinHash banding, event marts (agg / sketch / rolling window), the
# lineitem star join, and the streaming family (stream-stream interval
# join state + streaming quantile sketch — state-store scaling is the
# axis the batch queries can't exercise)
DEFAULT_QUERIES = [
    "streaming_attribution_join",
    "streaming_histogram_quantiles",
    "span_dedup_stats",
    "ngram_jaccard_pairs",
    "jaccard_prefix_pairs",
    "simhash_near_dupes",
    "minhash_near_dupes",
    "dedup_corpus_stats",
    "doc_repetition",
    "product_daily",
    "hll_distinct_daily",
    "rolling_active_users",
    "funnel_daily",
    "session_patterns",
    "events_asof_orders",
    "top_parts_by_revenue",
    "pricing_summary",
]

ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build_fixtures(spark, m: int) -> None:
    from ecommerce_event_pipeline_spark.sources.readers import read_table

    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)

    # documents: shift doc_id, salt every token with the replica index so
    # cross-replica shingles never collide (within-replica near-dup
    # structure is preserved: salting is a bijection on tokens)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = docs.count()
    legs = []
    for i in range(m):
        leg = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
        if i > 0:
            salted = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit(f"~{i}")),
                ),
                " ",
            )
            leg = leg.withColumn("text", salted)
        legs.append(leg)
    big_docs = legs[0]
    for leg in legs[1:]:
        big_docs = big_docs.unionByName(leg)
    big_docs.repartition(32).write.parquet(f"{OUT}/documents.parquet")

    # events: shift user/event/session ids; timestamps keep their range so
    # per-day density grows M× (read via read_table so TIMESTAMP(NANOS)
    # normalizes, then write plain µs timestamps the readers also accept)
    ev = read_table(spark, BASE, "events")
    mx = ev.agg(F.max("user_id"), F.max("event_id")).collect()[0]
    n_users, n_eids = 1 + (mx[0] or 0), 1 + (mx[1] or 0)
    legs = []
    for i in range(m):
        leg = ev.withColumn(
            "user_id", F.col("user_id") + F.lit(i * n_users)
        ).withColumn("event_id", F.col("event_id") + F.lit(i * n_eids))
        legs.append(leg)
    big = legs[0]
    for leg in legs[1:]:
        big = big.unionByName(leg)
    big.repartition(32).write.parquet(f"{OUT}/events.parquet")

    # orders + lineitem: shift orderkey together (FK preserved) and
    # o_custkey in lockstep with the events user_id shift, so per-user /
    # per-customer densities stay constant (shifting only one side would
    # fake a skewed join). part/supp FKs stay unshifted — dimensions are
    # shared across replicas, so per-dim-key density grows M×, which is
    # exactly what adding fact data against fixed dimensions does.
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    max_ok = orders.agg(F.max("o_orderkey")).collect()[0][0]
    o_legs, l_legs = [], []
    for i in range(m):
        o_legs.append(
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * (max_ok + 1))
            ).withColumn(
                "o_custkey", F.col("o_custkey") + F.lit(i * n_users)
            )
        )
        l_legs.append(
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * (max_ok + 1))
            )
        )
    big_o, big_l = o_legs[0], l_legs[0]
    for leg in o_legs[1:]:
        big_o = big_o.unionByName(leg)
    for leg in l_legs[1:]:
        big_l = big_l.unionByName(leg)
    big_o.repartition(16).write.parquet(f"{OUT}/orders.parquet")
    big_l.repartition(32).write.parquet(f"{OUT}/lineitem.parquet")

    # embeddings: shift vec_id; nudge each replica's vectors by a tiny
    # per-replica constant so copies are near (not exact) duplicates —
    # exact dupes would pile M identical vectors into one IVF cell, a
    # data pathology rather than a density increase. Replica 0 is
    # untouched so the vec_id=0 query vector the ANN entries probe with
    # still exists verbatim.
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_vecs = 1 + (emb.agg(F.max("vec_id")).collect()[0][0] or 0)
    e_legs = []
    for i in range(m):
        leg = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * n_vecs))
        if i > 0:
            leg = leg.withColumn(
                "embedding",
                F.transform(
                    "embedding", lambda x: (x + F.lit(i * 1e-3)).cast("float")
                ),
            )
        e_legs.append(leg)
    big_e = e_legs[0]
    for leg in e_legs[1:]:
        big_e = big_e.unionByName(leg)
    big_e.repartition(8).write.parquet(f"{OUT}/embeddings.parquet")

    # everything else: same content at both scales (dimensions)
    for t in ALL_TABLES:
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--once"]
    once = "--once" in sys.argv[1:]
    # M is optional (usage: [M] [--once] [query ...]) — only consume the
    # first arg as M when it actually parses as an integer, so
    # `scale_probe.py --once some_query` works as documented
    if argv and argv[0].isdigit():
        m, names = int(argv[0]), argv[1:]
    else:
        m, names = 10, argv
    names = names or DEFAULT_QUERIES

    import __spark_entry__ as e
    from ecommerce_event_pipeline_spark.session import get_spark

    spark = get_spark("scale-probe")
    qs = e.queries()

    if os.path.exists(f"{OUT}/documents.parquet"):
        # NEVER trust the CLI M for reused fixtures: the on-disk build may
        # be from an earlier invocation at a different M (round 8 found the
        # r7 100x build being reported as "10x" — the measured ratios were
        # real but the scale label was wrong by 10x). Detect M from the
        # actual row counts instead.
        base_n = spark.read.parquet(f"{BASE}/documents.parquet").count()
        out_n = spark.read.parquet(f"{OUT}/documents.parquet").count()
        m = round(out_n / base_n)
        print(
            f"reusing fixtures in {OUT}: detected {m}x "
            f"({out_n} vs {base_n} docs; delete to rebuild)",
            flush=True,
        )
    else:
        print(f"building {m}x fixtures in {OUT} ...", flush=True)
        t0 = time.time()
        build_fixtures(spark, m)
        print(f"built in {time.time() - t0:.0f}s", flush=True)

    def run(df):
        # force FULL computation of every output column (count() would let
        # Catalyst prune the expensive ones) while keeping the driver
        # transfer to one row — result-set download must not pollute the
        # operator-cost ratio when the output itself grows M×
        # xxhash64 rejects MapType (and hashing a map would be
        # order-unstable anyway) — route complex columns through to_json
        # so map/array/struct-outputting queries can be probed too
        from pyspark.sql import types as T

        cols = [
            F.to_json(F.col(f.name))
            if isinstance(f.dataType, (T.MapType, T.ArrayType, T.StructType))
            else F.col(f.name)
            for f in df.schema.fields
        ]
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(*cols)).alias("h"),
        ).collect()[0]
        return row["n"]

    print(f"{'query':32s} {'t_1x':>7s} {'t_' + str(m) + 'x':>7s} "
          f"{'ratio':>6s} {'rows_1x':>8s} {'rows_' + str(m) + 'x':>9s}")
    for n in names:
        fn = qs[n]
        t_small, t_big, r1, rm = float("inf"), float("inf"), 0, 0
        if once:
            # single-shot big side, but warm the CHEAP 1x side first so
            # t_small doesn't carry cold codegen/first-touch costs that
            # the long big run amortizes — otherwise the ratio
            # UNDERstates warm scaling (ADVICE r9). With the 1x side
            # warm and the big side cold, the ratio is an upper bound.
            run(fn(spark, BASE))
            t0 = time.time()
            r1 = run(fn(spark, BASE))
            t_small = time.time() - t0
            t0 = time.time()
            rm = run(fn(spark, OUT))
            t_big = time.time() - t0
            print(f"[single-shot, 1x warmed] {n}", flush=True)
        else:
            # warm both paths once so neither side pays first-touch costs
            # (codegen compile, shuffle-service spin-up, OS page cache),
            # then take the MIN of 3 timed runs per scale: this host's
            # co-tenant stall waves inflate single shots 3-30x, and the
            # minimum is the stall-robust estimator of true cost
            run(fn(spark, BASE))
            run(fn(spark, OUT))
        for _ in range(0 if once else 3):
            t0 = time.time()
            r1 = run(fn(spark, BASE))
            t_small = min(t_small, time.time() - t0)
            t0 = time.time()
            rm = run(fn(spark, OUT))
            t_big = min(t_big, time.time() - t0)
        ratio = t_big / t_small if t_small > 0 else float("inf")
        print(
            f"{n:32s} {t_small:7.2f} {t_big:7.2f} {ratio:6.1f} "
            f"{r1:8d} {rm:9d}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
