"""Structured Streaming jobs equal their batch twins on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_event_pipeline_spark.operators import windows
from ecommerce_event_pipeline_spark.sources.readers import read_events
from ecommerce_event_pipeline_spark.streaming import jobs

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_hourly_equals_batch(spark):
    stream = jobs.run_streaming_hourly_traffic(spark, SF_DIR)
    batch = (
        read_events(spark, SF_DIR)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(F.count("*").alias("event_count"), F.sum("value").alias("total_value"))
        .orderBy("window_start")
    )
    s = [(r["window_start"], r["event_count"]) for r in stream.collect()]
    b = [(r["window_start"], r["event_count"]) for r in batch.collect()]
    assert s == b


def test_streaming_session_windows_match_batch_sessionization(spark):
    stream = jobs.run_streaming_session_windows(spark, SF_DIR, gap="30 minutes")
    batch = windows.inferred_session_stats(
        read_events(spark, SF_DIR), gap_seconds=1800
    )
    # same number of sessions per user (the batch gap rule and the streaming
    # session_window merge rule agree except at exact-boundary gaps, which
    # the µs-precision fixture data cannot hit)
    s = {
        r["user_id"]: r["n"]
        for r in stream.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    b = {
        r["user_id"]: r["n"]
        for r in batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert s == b


def test_streaming_user_state_equals_batch_groupby(spark):
    stream = jobs.run_streaming_user_state(spark, SF_DIR)
    batch = (
        read_events(spark, SF_DIR)
        .groupBy("user_id")
        .agg(F.count("*").alias("events_seen"), F.sum("value").alias("total_value"))
        .orderBy("user_id")
    )
    s = [(r["user_id"], r["events_seen"], round(r["total_value"], 6)) for r in stream.collect()]
    b = [(r["user_id"], r["events_seen"], round(r["total_value"], 6)) for r in batch.collect()]
    assert s == b


def test_foreach_batch_parquet_sink_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "stream_hourly")
    first = jobs.run_streaming_to_parquet(spark, SF_DIR, out).collect()
    # re-running the whole stream (reprocessing every batch) must not
    # duplicate rows — dynamic overwrite rewrites the same partitions
    second = jobs.run_streaming_to_parquet(spark, SF_DIR, out).collect()
    assert sorted(map(str, first)) == sorted(map(str, second))
    batch = (
        read_events(spark, SF_DIR)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .count()
    )
    assert len(first) == batch.count()
