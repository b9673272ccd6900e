"""Custom Python DataSource: batch partitioning, determinism, streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_event_pipeline_spark.sources import pyds

pytestmark = pytest.mark.skipif(
    not pyds.HAS_DATASOURCE_API, reason="pyspark lacks the DataSource API"
)


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    assert pyds.register(spark)


def test_batch_read_is_deterministic_and_partitioned(spark):
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 500)
        .option("partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    a = df.orderBy("event_id").collect()
    b = (
        spark.read.format("synthetic_events")
        .option("rows", 500)
        .option("partitions", 2)  # different layout, same data
        .load()
        .orderBy("event_id")
        .collect()
    )
    assert len(a) == 500
    assert a == b  # partitioning must not change content
    assert {r["event_type"] for r in a} <= set(pyds._TYPES)


def test_batch_read_composes_with_catalyst(spark):
    df = spark.read.format("synthetic_events").option("rows", 1000).load()
    out = (
        df.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"))
    )
    rows = out.collect()
    assert len(rows) > 0
    # cross-check one user against a driver-side recomputation
    uid = rows[0]["user_id"]
    expected = sum(
        r[4] for i in range(1000) for r in [pyds._row(i)]
        if r[2] == uid and r[3] == "purchase"
    )
    got = [r["total"] for r in rows if r["user_id"] == uid][0]
    assert abs(got - expected) < 1e-9


def test_stream_read_reaches_max_rows(spark):
    q = (
        spark.readStream.format("synthetic_events")
        .option("batchRows", 200)
        .option("maxRows", 600)
        .load()
        .writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("pyds_stream").orderBy("event_id").collect()
    assert len(got) == 600
    # stream rows equal the batch rows over the same range (replayable)
    batch = (
        spark.read.format("synthetic_events").option("rows", 600).load()
        .orderBy("event_id")
        .collect()
    )
    assert got == batch
