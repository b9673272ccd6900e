"""JDBC wrappers, mock-tested the way the reference mocks its Postgres
hook/cursor (no database in the sandbox): the ``_jdbc_read``/``_jdbc_write``
seams are monkeypatched, everything above them runs for real."""

from __future__ import annotations

import pytest

from ecommerce_event_pipeline_spark.sources import jdbc

URL = "jdbc:postgresql://db:5432/ecommerce"


def test_read_jdbc_table_builds_partitioned_options(spark, monkeypatch):
    captured = {}

    def fake_read(spark_, options):
        captured.update(options)
        return spark_.range(1)

    monkeypatch.setattr(jdbc, "_jdbc_read", fake_read)
    jdbc.read_jdbc_table(
        spark,
        URL,
        "raw_events",
        partition_column="event_seq",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
        fetchsize=5_000,
    )
    assert captured["url"] == URL
    assert captured["dbtable"] == "raw_events"
    assert captured["partitionColumn"] == "event_seq"
    assert captured["lowerBound"] == "0"
    assert captured["upperBound"] == "1000000"
    assert captured["numPartitions"] == "16"
    assert captured["fetchsize"] == "5000"


def test_read_jdbc_table_requires_bounds_with_partition_column(spark):
    with pytest.raises(ValueError, match="bounds"):
        jdbc.read_jdbc_table(spark, URL, "raw_events", partition_column="id")


def test_write_jdbc_append_plumbs_batchsize_and_mode(spark, monkeypatch):
    captured = {}

    def fake_write(df, options, mode):
        captured["options"] = options
        captured["mode"] = mode

    monkeypatch.setattr(jdbc, "_jdbc_write", fake_write)
    df = spark.createDataFrame([(1, "a")], "event_id long, v string")
    jdbc.write_jdbc_append(df, URL, "raw_events", batchsize=500)
    assert captured["mode"] == "append"
    assert captured["options"]["batchsize"] == "500"
    assert captured["options"]["isolationLevel"] == "READ_COMMITTED"


def test_write_jdbc_append_dedup_is_on_conflict_do_nothing(spark, monkeypatch):
    """Within-batch dups collapse, rows whose key already exists in the
    target are skipped, survivors are appended — the reference's
    ON CONFLICT (event_id) DO NOTHING semantics."""
    df = spark.createDataFrame(
        [(1, "old"), (2, "new"), (2, "new-dup"), (3, "new")],
        "event_id long, v string",
    )
    existing = spark.createDataFrame([(1,)], "event_id long")
    captured = {}

    def fake_read(spark_, options):
        captured["read_dbtable"] = options["dbtable"]
        return existing

    def fake_write(frame, options, mode):
        captured["written"] = sorted(r["event_id"] for r in frame.collect())
        captured["write_options"] = options

    monkeypatch.setattr(jdbc, "_jdbc_read", fake_read)
    monkeypatch.setattr(jdbc, "_jdbc_write", fake_write)

    out = jdbc.write_jdbc_append_dedup(
        df, URL, "raw_events", "event_id", batchsize=250
    )
    assert captured["written"] == [2, 3]
    # key-only projection is pushed into the JDBC subquery
    assert captured["read_dbtable"] == "(SELECT event_id FROM raw_events) AS _existing_keys"
    assert captured["write_options"]["batchsize"] == "250"
    assert sorted(r["event_id"] for r in out.collect()) == [2, 3]
