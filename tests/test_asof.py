"""Generic as-of join vs pandas.merge_asof (the reference semantics)."""

from __future__ import annotations

import pandas as pd
import pytest

from ecommerce_event_pipeline_spark.operators.asof import asof_join

LEFT = [
    (1, 10.0, "e1"),
    (1, 25.0, "e2"),
    (1, 55.0, "e3"),
    (2, 5.0, "e4"),
    (2, 40.0, "e5"),
    (3, 30.0, "e6"),  # key with no right rows at all
]
RIGHT = [
    (1, 10.0, "r-a"),  # equal-ts: inclusive on both directions
    (1, 30.0, "r-b"),
    (2, 20.0, "r-c"),
]


def _spark_frames(spark):
    left = spark.createDataFrame(LEFT, "k long, ts double, ev string")
    right = spark.createDataFrame(RIGHT, "k long, rts double, payload string")
    return left, right


def _pandas_expected(direction, tolerance=None):
    lp = pd.DataFrame(LEFT, columns=["k", "ts", "ev"]).sort_values("ts")
    rp = pd.DataFrame(RIGHT, columns=["k", "rts", "payload"]).sort_values("rts")
    out = pd.merge_asof(
        lp,
        rp,
        left_on="ts",
        right_on="rts",
        by="k",
        direction=direction,
        tolerance=tolerance,
    )
    return {
        (r["k"], r["ts"]): (r["payload"] if pd.notna(r["payload"]) else None)
        for _, r in out.iterrows()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 10.0])
def test_asof_join_matches_pandas(spark, direction, tolerance):
    left, right = _spark_frames(spark)
    got = {
        (r["k"], r["ts"]): r["payload"]
        for r in asof_join(
            left,
            right,
            on="k",
            left_ts="ts",
            right_ts="rts",
            payload_cols=["payload"],
            direction=direction,
            tolerance=tolerance,
        ).collect()
    }
    assert got == _pandas_expected(direction, tolerance)


@pytest.mark.parametrize("tolerance", [None, 10.0])
def test_asof_join_null_payload_not_skipped(spark, tolerance):
    """A right row whose payload is legitimately NULL is still the match —
    merge_asof returns its NULL; ignorenulls must not reach past it to an
    older non-null payload (and pair it with the newer row's ts)."""
    left = spark.createDataFrame([(1, 25.0, "e1")], "k long, ts double, ev string")
    right = spark.createDataFrame(
        [(1, 5.0, "old"), (1, 20.0, None)], "k long, rts double, payload string"
    )
    [row] = asof_join(
        left,
        right,
        on="k",
        left_ts="ts",
        right_ts="rts",
        payload_cols=["payload"],
        direction="backward",
        tolerance=tolerance,
    ).collect()
    # nearest match is (20.0, NULL): payload NULL either way — but with
    # tolerance it must be judged against ts=20 (within), never ts=5
    assert row["payload"] is None
    lp = pd.DataFrame([(1, 25.0, "e1")], columns=["k", "ts", "ev"])
    rp = pd.DataFrame(
        [(1, 5.0, "old"), (1, 20.0, None)], columns=["k", "rts", "payload"]
    )
    exp = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="k",
        direction="backward", tolerance=tolerance,
    )["payload"].iloc[0]
    assert row["payload"] == (None if pd.isna(exp) else exp)


def test_asof_join_rejects_bad_direction(spark):
    left, right = _spark_frames(spark)
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            payload_cols=["payload"], direction="nearest",
        )
