"""As-of join — match each left row to the latest right row at-or-before it.

Spark has no native ASOF JOIN. The scalable declarative form used here is
union + ordered window:

1. tag both inputs and union them by name (right rows carry the payload,
   left rows carry NULL payload);
2. one window per join key ordered by (ts, side) with side ordering right
   rows BEFORE left rows at equal timestamps (⇒ `ts >= right.ts`
   inclusive semantics);
3. ``last(payload, ignorenulls=True)`` over the running frame gives every
   left row the most recent right payload;
4. filter back to left rows.

Cost: ONE shuffle on the join key + a per-partition sort — same shape as a
sort-merge join, no range explosion, no per-group Python. This beats the
``applyInPandas``+``merge_asof`` form (which pays Arrow transfer and
Python) and the bucketized-range-join form (which duplicates rows per
bucket) for the common "enrich events with latest dimension state" case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the payload of the matched
    ``right`` row with the same ``on`` key — the ``pandas.merge_asof``
    contract, distributed.

    - ``direction="backward"`` (default): latest right with
      ``right_ts <= left_ts``;
    - ``direction="forward"``: earliest right with ``right_ts >= left_ts``
      (same one-shuffle plan, the window just orders descending);
    - ``tolerance``: maximum |left_ts − right_ts| in the ts column's units
      (seconds for timestamps) — a match farther away yields NULL payload,
      exactly like pandas.

    ``right`` must be unique per (on, right_ts) — pre-dedupe if not, or the
    matched payload among ties is unspecified. ``payload_cols`` must not
    collide with ``left``'s column names (the payload is emitted under its
    own names next to every left column).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    collisions = set(payload_cols) & set(left.columns)
    if collisions:
        raise ValueError(
            f"payload_cols collide with left columns: {sorted(collisions)}; "
            "alias the right-side payload before the join"
        )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts first at equal ts → inclusive
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        *[F.lit(None).cast(t.dataType).alias(c) for c, t in
          zip(left.columns, left.schema.fields) if c != on],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}")
          for c in payload_cols],
        *[F.col(c) for c in left.columns if c != on],
    )
    ts_order = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    order = [ts_order, F.col("_side")]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # payload + the matched row's ts travel in ONE struct: per-column
    # last(_p_c, ignorenulls) would skip a right row whose payload value is
    # legitimately NULL and pair an older payload with a newer _matched_ts
    # (diverging from pandas.merge_asof, which returns that row's NULL).
    # The struct is non-null for every right row, so ignorenulls only skips
    # left rows, and all fields come from the same matched row.
    matched = F.last(
        F.when(
            F.col("_side") == 0,
            F.struct(
                F.col("_ts").alias("_rts"),
                *[F.col(f"_p_{c}").alias(c) for c in payload_cols],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    filled = l.unionByName(r).select("*", matched.alias("_m"))
    within = (
        F.col("_m").isNotNull()
        if tolerance is None
        else F.abs(
            F.col("_ts").cast("double") - F.col("_m._rts").cast("double")
        )
        <= F.lit(float(tolerance))
    )
    out_cols = (
        [on]
        + [c for c in left.columns if c != on]
        + [
            F.when(within, F.col(f"_m.{c}")).alias(c)
            for c in payload_cols
        ]
    )
    return filled.where(F.col("_side") == 1).select(*out_cols)
