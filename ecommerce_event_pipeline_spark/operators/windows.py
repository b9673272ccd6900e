"""Window-function operators: sessionization, per-group top-k, running aggs.

The reference's only window use is row_number-per-session (SURVEY §2.5 W1)
because its sessions are pre-materialized keys. A real event engine must
also INFER sessions from gaps — the classic lag + cumulative-sum pattern —
and rank within groups. Everything here is one window spec per logical
pass; Spark plans a single sort per (partition key, order) and reuses it
across functions on the same spec.

Scale note: window partitions are (user, …) keyed — millions of small
partitions parallelize perfectly; no global sort is ever requested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Gap-based session inference: a new session starts when the gap from
    the previous event of the same user exceeds ``gap_seconds``.

    lag(ts) over (user order ts) → gap → cumulative sum of new-session
    flags = session sequence number. Output keeps the event grain and adds
    ``gap_seconds_prev`` (NULL on each user's first event) and
    ``session_seq`` (1-based).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    prev_ts = F.lag(ts_col).over(w)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col)
    ).rowsBetween(Window.unboundedPreceding, 0)
    return (
        events.withColumn("gap_seconds_prev", gap)
        .withColumn("_new_session", is_new)
        .withColumn("session_seq", F.sum("_new_session").over(running).cast("bigint"))
        .drop("_new_session")
    )


def inferred_session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Rollup of inferred sessions: one row per (user, session_seq) with
    bounds, length and event count."""
    s = sessionize(events, user_col=user_col, gap_seconds=gap_seconds)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").alias("event_count"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "duration_seconds"
            ),
        )
        .orderBy(user_col, "session_seq")
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-k rows per group via row_number over a per-group window —
    the standard Spark pattern (no global sort; one shuffle on the group
    key, per-partition sort)."""
    order = [F.desc(order_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .where(F.col("rank_in_group") <= k)
    )


def running_user_spend(events: DataFrame, amount_type: str = "purchase") -> DataFrame:
    """Running (cumulative) purchase total per user over time — rows-frame
    running sum, the canonical frame-spec window.

    The accumulator is exact integer cents, not a float sum: windowed
    float sums are accumulation-STRUCTURE dependent (DuckDB's window sum
    uses a segment tree, Spark's a running buffer), so identical inputs
    produce last-ulp differences at larger frames. Amounts are exact
    2-decimal values, so the cents total is exact and engine-independent —
    the right arithmetic for money at any scale."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    purchases = events.where(F.col("event_type") == amount_type)
    cents = F.round(F.col("value") * 100).cast("long")
    return purchases.select(
        "user_id",
        "event_id",
        "ts",
        F.col("value").alias("amount"),
        (F.sum(cents).over(w) / F.lit(100.0)).alias("running_total"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id")))
        .alias("purchase_seq"),
    )
