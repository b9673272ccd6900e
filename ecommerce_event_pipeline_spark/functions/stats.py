"""Statistical operators: exact percentiles and grouped-map model fitting.

``percentile`` is JVM-side exact (sort-based within the aggregate);
``applyInPandas`` appears only for the per-group model fit — the canonical
grouped-map use case (each group's rows must be in one place, the model is
a numpy call, output is one row per group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact p50/p90/p99 of value per event type (linear interpolation —
    matches ANSI PERCENTILE_CONT / DuckDB quantile_cont)."""
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("event_count"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.9)).alias("p90"),
            F.percentile("value", F.lit(0.99)).alias("p99"),
        )
        .orderBy("event_type")
    )


def user_purchase_trend(events: DataFrame, min_purchases: int = 3) -> DataFrame:
    """Per-user linear trend of purchase values over time via grouped-map
    ``applyInPandas``: one least-squares fit per user (numpy), one output
    row per user. The shuffle is keyed by user — each group is small, the
    fleet of fits parallelizes across executors."""
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_timestamp("ts").alias("t"), "value"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < min_purchases:
            return pd.DataFrame(
                columns=["user_id", "n_purchases", "slope_per_day", "intercept"]
            )
        t = pdf["t"].to_numpy(dtype=np.float64)
        v = pdf["value"].to_numpy(dtype=np.float64)
        t0 = (t - t.mean()) / 86400.0  # days, centered → stable fit
        slope, intercept = np.polyfit(t0, v, 1)
        return pd.DataFrame(
            [[pdf["user_id"].iloc[0], len(pdf), float(slope), float(intercept)]],
            columns=["user_id", "n_purchases", "slope_per_day", "intercept"],
        )

    return (
        purchases.groupBy("user_id")
        .applyInPandas(
            fit,
            schema="user_id long, n_purchases long, slope_per_day double, "
            "intercept double",
        )
        .orderBy("user_id")
    )
