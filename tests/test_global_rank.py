"""Distributed exact global ranking (operators/windows.py).

``global_row_number`` / ``global_ntile`` must be BIT-IDENTICAL to the SQL
window functions over a total order — they exist purely to replace the
single-partition ``Window.orderBy`` plan with range-partition + offset,
so any divergence is a correctness bug, not an approximation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ecommerce_event_pipeline_spark.operators.windows import (
    global_ntile,
    global_row_number,
)


def _frame(spark, n: int):
    # 7919 is prime vs 1000 → keys collide but are well spread; uid is
    # the total-order tiebreak
    return spark.range(n).select(
        (F.col("id") * 7919 % 1000).alias("k"), F.col("id").alias("uid")
    )


def test_global_row_number_matches_window(spark):
    df = _frame(spark, 257)
    got = {
        (r["uid"], r["global_rn"])
        for r in global_row_number(df, ["k", "uid"]).collect()
    }
    exp = {
        (r["uid"], r["rn"])
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k", "uid"))
        ).collect()
    }
    assert got == exp


def test_global_ntile_matches_sql_ntile_all_shapes(spark):
    # shapes: remainder buckets, N < B, N % B == 0, tiny N, descending
    for n, b, desc in [(103, 5, False), (4, 5, False), (100, 5, True),
                       (17, 3, True), (1, 5, False)]:
        df = _frame(spark, n)
        order = (
            [F.desc("k"), F.asc("uid")] if desc else [F.asc("k"), F.asc("uid")]
        )
        got = {
            (r["uid"], r["nt"])
            for r in global_ntile(df, b, order, out_col="nt").collect()
        }
        exp = {
            (r["uid"], r["nt"])
            for r in df.withColumn(
                "nt", F.ntile(b).over(Window.orderBy(*order))
            ).collect()
        }
        assert got == exp, (n, b, desc)


def test_global_ntile_empty_input(spark):
    df = _frame(spark, 0)
    assert global_ntile(df, 5, ["k", "uid"], out_col="nt").count() == 0


def test_ntile_rejects_nonpositive_buckets(spark):
    """b = 0 would hit `_n % 0` in the bucket arithmetic — silent NULLs
    in default mode, a runtime error under ANSI; both helpers must fail
    loudly at the API boundary instead."""
    import pytest

    from ecommerce_event_pipeline_spark.operators.windows import grouped_ntile

    df = _frame(spark, 10)
    for b in (0, -3):
        with pytest.raises(ValueError, match="n_buckets"):
            global_ntile(df, b, ["k", "uid"])
        with pytest.raises(ValueError, match="n_buckets"):
            grouped_ntile(df, b, ["k"], ["uid"])


def test_global_rank_plan_has_no_unpartitioned_window(spark):
    """The reason these helpers exist: the physical plan must contain no
    single-partition WindowExec (every Window node keys on _pid), so the
    sort parallelizes at any scale."""
    df = _frame(spark, 100)
    plan = (
        global_ntile(df, 5, ["k", "uid"], out_col="nt")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_pid" in line, line


def test_distributed_prefix_sum_matches_window(spark):
    from ecommerce_event_pipeline_spark.operators.windows import (
        distributed_prefix_sum,
    )

    df = _frame(spark, 143).withColumn("v", (F.col("uid") % 13) + 1)
    for exclusive in (True, False):
        got = {
            (r["uid"], r["ps"])
            for r in distributed_prefix_sum(
                df, ["k", "uid"], "v", out_col="ps", exclusive=exclusive
            ).collect()
        }
        w = Window.orderBy("k", "uid").rowsBetween(
            Window.unboundedPreceding, -1 if exclusive else 0
        )
        exp = {
            (r["uid"], r["ps"])
            for r in df.withColumn(
                "ps", F.coalesce(F.sum("v").over(w), F.lit(0))
            ).collect()
        }
        assert got == exp, exclusive


def test_grouped_ntile_matches_partitioned_sql_ntile(spark):
    """The grouped range-partition NTILE must be bit-identical to
    NTILE(b) OVER (PARTITION BY g ORDER BY ...) — including groups
    smaller than the bucket count and heavy in-group ties."""
    from ecommerce_event_pipeline_spark.operators.windows import grouped_ntile

    for n, b in [(211, 4), (9, 4), (40, 7)]:
        df = spark.range(n).select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") * 7919 % 11).alias("k"),  # heavy ties
            F.col("id").alias("uid"),
        )
        got = {
            (r["g"], r["uid"], r["nt"])
            for r in grouped_ntile(
                df, b, ["g"], ["k", "uid"], out_col="nt"
            ).collect()
        }
        exp = {
            (r["g"], r["uid"], r["nt"])
            for r in df.withColumn(
                "nt",
                F.ntile(b).over(Window.partitionBy("g").orderBy("k", "uid")),
            ).collect()
        }
        assert got == exp, (n, b)


def test_prefix_sum_consistent_over_shuffled_input(spark):
    """Round-11 regression: distributed_prefix_sum's ranged partition
    assignment fans out to two consumers; before the materialization
    fix, a shuffle-produced input (nondeterministic within-partition
    row order) could sample DIFFERENT range boundaries per consumer
    and silently corrupt the offsets — caught by the sf0.1 KS query.
    Reproduce the shape: feed the op from a groupBy, check against an
    exact sequential fold, several times."""
    from pyspark.sql import functions as F

    from ecommerce_event_pipeline_spark.operators.windows import (
        distributed_prefix_sum,
    )

    base = spark.range(0, 20000).select(
        (F.col("id") % 4999).alias("k"), F.lit(1).alias("one")
    )
    g = base.groupBy("k").agg(F.count("*").cast("long").alias("c"))
    for _ in range(3):
        got = {
            r["k"]: r["f"]
            for r in distributed_prefix_sum(
                g, ["k"], "c", out_col="f", exclusive=False
            ).collect()
        }
        rows = sorted((r["k"], r["c"]) for r in g.collect())
        acc = 0
        for k, c in rows:
            acc += c
            assert got[k] == acc, f"prefix mismatch at k={k}"


def test_grouped_ntile_consistent_over_shuffled_input(spark):
    """Round-12 extension of the materialize-once regression to
    grouped_ntile, which has the identical fan-out shape (`part` feeds
    both the local row_number window and the per-(group, partition)
    counts groupBy). Feed it from a groupBy — nondeterministic
    within-partition row order, so unmaterialized range boundaries can
    differ per consumer — and check bit-identity with the SQL window,
    several times."""
    from ecommerce_event_pipeline_spark.operators.windows import grouped_ntile

    base = spark.range(0, 20000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 4999).alias("k"),
    )
    shuffled = base.groupBy("g", "k").agg(F.count("*").alias("c"))
    exp = {
        (r["g"], r["k"], r["nt"])
        for r in shuffled.withColumn(
            "nt", F.ntile(4).over(Window.partitionBy("g").orderBy("k"))
        ).collect()
    }
    for _ in range(3):
        got = {
            (r["g"], r["k"], r["nt"])
            for r in grouped_ntile(
                shuffled, 4, ["g"], ["k"], out_col="nt"
            ).collect()
        }
        assert got == exp


def test_grouped_percentiles_consistent_over_shuffled_input(spark):
    """Round-12 fan-out sweep: grouped_exact_percentiles has the same
    two-consumer range-partition shape as the order-statistics operators
    (`part` feeds the local rank window AND the counts groupBy), so it
    gets the same materialize-once fix and the same shuffled-input
    regression: feed it from a groupBy and check bit-identity with the
    single-buffer SQL percentile, several times."""
    from ecommerce_event_pipeline_spark.functions.stats import (
        grouped_exact_percentiles,
    )

    base = spark.range(0, 20000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 4999).cast("double").alias("v"),
    )
    shuffled = base.groupBy("g", "v").agg(F.count("*").alias("c")).drop("c")
    exp = {
        (r["g"], r["p50"], r["p90"])
        for r in shuffled.groupBy("g")
        .agg(
            F.expr("percentile(v, 0.5D)").alias("p50"),
            F.expr("percentile(v, 0.9D)").alias("p90"),
        )
        .collect()
    }
    for _ in range(3):
        got = {
            (r["g"], r["p50"], r["p90"])
            for r in grouped_exact_percentiles(
                shuffled, "v", {"p50": 0.5, "p90": 0.9}, ["g"]
            ).collect()
        }
        assert got == exp


def test_materialize_once_pin_all_fanout_operators(spark):
    """THE falsifiable regression for the materialize-once fix (the
    shuffled-input tests above check bit-identity, but at unit scale the
    two un-checkpointed consumers usually sample identical boundaries —
    measured 0/6 divergence — so they can pass even with the fix
    reverted; the race only reproduced at sf0.1). What IS deterministic:
    with the checkpoint in place, every consumer's executed plan reads
    the pinned ExistingRDD leaf and contains NO re-executable
    rangepartitioning exchange and NO scan of the original source.
    Revert the localCheckpoint and this fails immediately."""
    from ecommerce_event_pipeline_spark.functions.stats import (
        grouped_exact_percentiles,
    )
    from ecommerce_event_pipeline_spark.operators.windows import (
        distributed_prefix_sum,
        global_ntile,
        global_row_number,
        grouped_ntile,
    )

    df = spark.range(0, 2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 97).cast("double").alias("v"),
        F.col("id").alias("uid"),
    )
    outs = {
        "global_row_number": global_row_number(df, ["v", "uid"]),
        "global_ntile": global_ntile(df, 4, ["v", "uid"]),
        "distributed_prefix_sum": distributed_prefix_sum(
            df, ["v", "uid"], "uid"
        ),
        "grouped_ntile": grouped_ntile(df, 4, ["g"], ["v", "uid"]),
        "grouped_exact_percentiles": grouped_exact_percentiles(
            df, "v", {"p50": 0.5}, ["g"]
        ),
    }
    for name, out in outs.items():
        out.collect()  # finalize adaptive plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan, f"{name}: checkpoint leaf missing"
        assert "rangepartitioning" not in plan, (
            f"{name}: re-executable range exchange in consumer plan — "
            "the ranged assignment is not materialized once"
        )
        assert "Scan Range" not in plan, (
            f"{name}: consumer re-scans the original source"
        )
