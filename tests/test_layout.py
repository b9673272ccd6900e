"""Z-order layout: interleave correctness + locality property."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_event_pipeline_spark.functions import layout


def _interleave(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_z_value_matches_reference_bit_interleave(spark):
    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 1439), (7, 7)]
    df = spark.createDataFrame(cases, "x long, y long").select(
        "x", "y", layout.z_value(F.col("x"), F.col("y"), 11).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _interleave(r["x"], r["y"], 11), (r["x"], r["y"])


def test_z_value_sql_twin_agrees(spark):
    import duckdb

    cases = [(3, 5), (1023, 1439), (512, 720)]
    expr = layout.z_value_sql("x", "y", 11)
    con = duckdb.connect()
    for x, y in cases:
        (got,) = con.execute(
            f"SELECT ({expr}) FROM (SELECT {x} AS x, {y} AS y)"
        ).fetchone()
        assert got == _interleave(x, y, 11)


def test_zorder_boxes_are_tight_on_both_dims(spark):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, (i * 7) % 24, (i * 13) % 60), i * 31 % 5000)
        for i in range(2000)
    ]
    events = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    boxes = layout.zorder_box_stats(events, prefix_shift=14).collect()
    assert len(boxes) > 4
    # every z-prefix box spans at most 2^7 user buckets and 2^7 minutes:
    # the top 8 of 22 interleaved bits pin 4 bits of each dimension
    for b in boxes:
        assert b["user_hi"] - b["user_lo"] < 128
        assert b["minute_hi"] - b["minute_lo"] < 128
