"""Bucketed tables: the co-located fact-fact join layout contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_event_pipeline_spark.sources.bucketing import (
    cobucketed_join,
    write_bucketed,
)
from ecommerce_event_pipeline_spark.sources.readers import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = read_table(spark, SF_DIR, "orders")
    lineitem = read_table(spark, SF_DIR, "lineitem")
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(base / "orders"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(base / "lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.fixture()
def no_autobroadcast(spark):
    """Pin the non-broadcast path: at fixture scale both sides fit under
    the broadcast threshold, which would hide the bucketed layout (at real
    fact-fact scale neither side broadcasts — that is bucketing's case)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables, no_autobroadcast):
    left, right = bucketed_tables
    joined = cobucketed_join(spark, left, right, ["o_orderkey"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:3000]
    assert "SortMergeJoin" in plan, plan[:3000]


def test_cobucketed_join_matches_shuffle_join(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = cobucketed_join(spark, left, right, ["o_orderkey"])
    n_bucketed = joined.count()
    orders = read_table(spark, SF_DIR, "orders")
    lineitem = read_table(spark, SF_DIR, "lineitem")
    n_plain = orders.join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
    ).count()
    assert n_bucketed == n_plain > 0


def test_bucketed_agg_on_bucket_key_skips_shuffle(spark, bucketed_tables, no_autobroadcast):
    _, right = bucketed_tables
    agg = spark.table(right).groupBy("o_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:3000]


def test_bucket_file_layout_is_one_file_per_bucket(spark, bucketed_tables):
    left, _ = bucketed_tables
    files = spark.table(left).inputFiles()
    assert len(files) == 8  # repartition-by-bucket-key ⇒ one file per bucket
