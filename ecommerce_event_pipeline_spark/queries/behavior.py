"""Event-behavior analytics: attribution, cohorts, RFM, A/B
stats, churn, recsys evaluation, entropy (T85+ region).

Mechanically split out of registry.py (round-10 trim, VERDICT r9 item
8; zero behavior change — the full oracle mirror is the regression
gate). Imported by registry.py after its own definitions, so pre-split
shared helpers resolve against the already-bound prefix of the
partially-initialized registry module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..sources.readers import read_events, read_table
from ..operators.windows import pin_frame
from ..registry_core import register


_EWMA_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS event_date,
         CAST(COUNT(*) AS DOUBLE) AS c
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
a AS (
  SELECT event_type,
         list(event_date ORDER BY event_date) AS dates,
         list(c ORDER BY event_date) AS vals
  FROM daily GROUP BY 1
),
e AS (
  SELECT event_type, dates, vals,
         unnest(range(1, len(vals) + 1)) AS d
  FROM a
)
SELECT event_type,
       dates[d] AS event_date,
       CAST(vals[d] AS BIGINT) AS event_count,
       ROUND(list_reduce(vals[1:d],
             (acc, x) -> 0.2::DOUBLE * x + 0.8::DOUBLE * acc), 4) AS ewma
FROM e
ORDER BY event_type, event_date
"""


@register("ewma_daily_traffic", _EWMA_ORACLE)
def ewma_daily_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive exponential smoothing as an explicit left fold over the
    date-sorted series — both engines run the IDENTICAL fold, so every
    intermediate double matches bit-for-bit (a window formulation would
    leave accumulation structure engine-defined)."""
    from ..functions import stats

    return stats.ewma_daily_counts(read_events(spark, sf_dir), alpha=0.2)


_ANOMALY_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS event_date,
         CAST(COUNT(*) AS BIGINT) AS event_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
w AS (
  SELECT event_type, event_date, event_count,
         median(event_count) OVER trail AS trail_median,
         COUNT(*) OVER trail AS trail_n
  FROM daily
  WINDOW trail AS (PARTITION BY event_type ORDER BY event_date
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, event_date, event_count,
       CAST(trail_median AS BIGINT) AS trail_median,
       (event_count * 2 > trail_median * 3
        OR event_count * 2 < trail_median) AS is_anomaly
FROM w
WHERE trail_n = 7
ORDER BY event_type, event_date
"""


@register("daily_volume_anomalies", _ANOMALY_ORACLE)
def daily_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume anomaly flags against the TRAILING 7-day median (frame
    excludes the current row, so a spike can't mask itself): a day is
    anomalous when count > 1.5× or < 0.5× the median. Median of 7
    integers is the exact middle value and the 1.5×/0.5× tests are
    integer inequalities (2c > 3m / 2c < m) — no float boundary exists
    anywhere, unlike a z-score formulation."""
    from pyspark.sql import Window

    daily = (
        read_events(spark, sf_dir)
        .where(F.col("ts").isNotNull())
        .groupBy("event_type", "event_date")
        .agg(F.count("*").alias("event_count"))
    )
    trail = (
        Window.partitionBy("event_type")
        .orderBy("event_date")
        .rowsBetween(-7, -1)
    )
    w = daily.select(
        "event_type",
        "event_date",
        "event_count",
        F.expr("percentile(event_count, 0.5)").over(trail).alias("_med"),
        F.count("*").over(trail).alias("_n"),
    )
    return (
        w.where(F.col("_n") == 7)
        .select(
            "event_type",
            "event_date",
            "event_count",
            F.col("_med").cast("long").alias("trail_median"),
            (
                (F.col("event_count") * 2 > F.col("_med").cast("long") * 3)
                | (F.col("event_count") * 2 < F.col("_med").cast("long"))
            ).alias("is_anomaly"),
        )
        .orderBy("event_type", "event_date")
    )


_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
actives AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE ts IS NOT NULL
),
offsets(day_offset) AS (VALUES (0), (1), (3), (7)),
cohort_sizes AS (
  SELECT cohort_date, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM firsts GROUP BY 1
),
ret AS (
  SELECT f.cohort_date, o.day_offset,
         CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
  FROM firsts f
  CROSS JOIN offsets o
  JOIN actives a
    ON a.user_id = f.user_id
   AND a.d = f.cohort_date + CAST(o.day_offset AS INTEGER)
  GROUP BY 1, 2
)
SELECT s.cohort_date, r.day_offset, s.cohort_users, r.active_users,
       ROUND(r.active_users * 100.0 / CAST(s.cohort_users AS DOUBLE), 2)
         AS retention_pct
FROM ret r JOIN cohort_sizes s USING (cohort_date)
ORDER BY s.cohort_date, r.day_offset
"""


@register("retention_cohorts", _RETENTION_ORACLE)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-seen date, the
    share still active at day +0/+1/+3/+7 — two aggregations (firsts,
    actives) + a broadcast-sized offsets table; no window over the raw
    log, so the plan is shuffle-light at any scale."""
    ev = read_events(spark, sf_dir).where(F.col("ts").isNotNull())
    firsts = ev.groupBy("user_id").agg(F.min("event_date").alias("cohort_date"))
    # distinct column names on the self-join leg — both frames descend
    # from the same scan, so `actives["user_id"] == firsts["user_id"]`
    # would collapse to a trivially-true predicate (Spark WARNs and the
    # join becomes a cross product against the wrong leg)
    actives = ev.select(
        F.col("user_id").alias("active_user"),
        F.col("event_date").alias("d"),
    ).distinct()
    offsets = spark.createDataFrame([(0,), (1,), (3,), (7,)], "day_offset int")
    sizes = firsts.groupBy("cohort_date").agg(
        F.count("*").alias("cohort_users")
    )
    ret = (
        firsts.crossJoin(F.broadcast(offsets))
        .join(
            actives,
            (F.col("active_user") == F.col("user_id"))
            & (
                F.col("d")
                == F.date_add(F.col("cohort_date"), F.col("day_offset"))
            ),
        )
        .groupBy("cohort_date", "day_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
    return (
        ret.join(sizes, "cohort_date")
        .select(
            "cohort_date",
            "day_offset",
            "cohort_users",
            "active_users",
            F.round(
                F.col("active_users") * 100.0
                / F.col("cohort_users").cast("double"),
                2,
            ).alias("retention_pct"),
        )
        .orderBy("cohort_date", "day_offset")
    )


_FIRST_TOUCH_ORACLE = """
WITH v AS (
  SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, ts AS purchase_ts, value FROM events
  WHERE event_type = 'purchase'
),
j AS (
  SELECT p.user_id, p.purchase_ts, p.value, v.view_ts
  FROM p JOIN v ON p.user_id = v.user_id
   AND p.purchase_ts >= v.view_ts
   AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE
)
SELECT user_id, purchase_ts,
       MIN(view_ts) AS first_view_ts,
       CAST(COUNT(*) AS BIGINT) AS touches,
       CAST(date_diff('second', MIN(view_ts), purchase_ts) // 60 AS BIGINT)
         AS lag_minutes,
       ROUND(value, 2) AS purchase_value
FROM j
GROUP BY user_id, purchase_ts, value
ORDER BY user_id, purchase_ts
"""


@register("first_touch_attribution", _FIRST_TOUCH_ORACLE)
def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch marketing attribution: each purchase credits the
    EARLIEST view inside its 30-minute lookback (vs the interval join's
    all-pairs credit) — an interval join collapsed by per-purchase
    argmin, still one shuffle keyed by user."""
    ev = read_events(spark, sf_dir)
    # view leg carries a renamed key: both legs descend from the same
    # scan, so p["user_id"] == v["user_id"] is a trivially-true
    # self-reference (Spark WARN) rather than an equi-join condition
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("view_user"), F.col("ts").alias("view_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), "value"
    )
    j = p.join(
        v,
        (F.col("user_id") == F.col("view_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    ).drop("view_user")
    return (
        j.groupBy("user_id", "purchase_ts", "value")
        .agg(
            F.min("view_ts").alias("first_view_ts"),
            F.count("*").alias("touches"),
        )
        .select(
            "user_id",
            "purchase_ts",
            "first_view_ts",
            "touches",
            F.expr(
                "(unix_timestamp(purchase_ts) - unix_timestamp(first_view_ts))"
                " div 60"
            ).alias("lag_minutes"),
            F.round("value", 2).alias("purchase_value"),
        )
        .orderBy("user_id", "purchase_ts")
    )


_BASKET_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
part_orders AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_ord FROM items GROUP BY 1
),
tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM items),
pairs AS (
  SELECT a.l_partkey AS part_1, b.l_partkey AS part_2,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM items a
  JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
)
SELECT p.part_1, p.part_2, p.support,
       ROUND(CAST(p.support AS DOUBLE) * t.n
             / (CAST(o1.n_ord AS DOUBLE) * o2.n_ord), 4) AS lift
FROM pairs p
JOIN part_orders o1 ON o1.l_partkey = p.part_1
JOIN part_orders o2 ON o2.l_partkey = p.part_2
CROSS JOIN tot t
ORDER BY p.support DESC, p.part_1, p.part_2
"""


@register("basket_pairs", _BASKET_ORACLE)
def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought in the same order
    with support ≥ 3 and their lift (support·N / (n₁·n₂), exact integer
    inputs to one double expression). The self-join is keyed by order —
    pair volume is Σ(items-per-order choose 2), bounded by basket size,
    never parts²."""
    # Materialized ONCE (r13 opt): the deduped 2-column projection feeds
    # four branches (both self-join sides, part_orders, tot); unpinned,
    # each branch re-runs the lineitem scan + distinct. Pinning is the
    # guide-§5 persist-when-reused trade — the pinned frame is far
    # narrower than lineitem at any scale.
    items = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .transform(pin_frame)
    )
    part_orders = items.groupBy("l_partkey").agg(F.count("*").alias("n_ord"))
    tot = items.agg(F.count_distinct("l_orderkey").alias("n"))
    a = items.select(
        F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("part_1")
    )
    b = items.select(
        F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("part_2")
    )
    pairs = (
        a.join(b.hint("shuffle_hash"), "_o")
        .where(F.col("part_1") < F.col("part_2"))
        .groupBy("part_1", "part_2")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= 3)
    )
    return (
        pairs.join(
            part_orders.select(
                F.col("l_partkey").alias("part_1"), F.col("n_ord").alias("_n1")
            ),
            "part_1",
        )
        .join(
            part_orders.select(
                F.col("l_partkey").alias("part_2"), F.col("n_ord").alias("_n2")
            ),
            "part_2",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "part_1",
            "part_2",
            "support",
            F.round(
                F.col("support").cast("double")
                * F.col("n")
                / (F.col("_n1").cast("double") * F.col("_n2")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "part_1", "part_2")
    )


_RFM_ORACLE = """
WITH maxd AS (SELECT MAX(CAST(ts AS DATE)) AS as_of FROM events),
p AS (
  SELECT user_id,
         date_diff('day', MAX(CAST(ts AS DATE)), m.as_of) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM events, maxd m
  WHERE event_type = 'purchase'
  GROUP BY user_id, m.as_of
),
scored AS (
  SELECT user_id, recency_days, frequency, monetary_cents,
         NTILE(5) OVER (ORDER BY recency_days ASC, user_id) AS r_score,
         NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
         NTILE(5) OVER (ORDER BY monetary_cents DESC, user_id) AS m_score
  FROM p
)
SELECT user_id, recency_days, frequency, monetary_cents,
       r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS rfm_segment
FROM scored
ORDER BY user_id
"""


@register("rfm_segments", _RFM_ORACLE)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last purchase as of
    the log's max date), frequency, monetary in EXACT integer cents, each
    scored into quintiles with a user_id tie-break (an un-tiebroken NTILE
    over equal keys is engine-nondeterministic — the classic silent
    mismatch), concatenated into the familiar '555'-style segment.

    The quintiles come from :func:`operators.windows.global_ntile` — the
    range-partition + offset form of NTILE — NOT a global ``Window.orderBy``
    (which would sort every customer ever on ONE task at 100 TB; Spark
    emits its "Moving all data to a single partition" warning for exactly
    that plan). The oracle keeps the plain SQL NTILE: with a total order
    the two are bit-identical, which is the point of the rewrite.

    Plan shape: the per-user table is MATERIALIZED once (localCheckpoint;
    on a cluster, persist or write it — RFM is inherently multi-pass) and
    the three metrics are scored INDEPENDENTLY from it, then joined back
    on user_id. Chaining the three global_ntile calls instead would
    double the lineage at every level (each call references its input in
    two branches), re-planning the events aggregation up to 8× — measured
    5× slower at sf0.1."""
    from ..operators.windows import global_ntile

    ev = read_events(spark, sf_dir)
    maxd = ev.agg(F.max("event_date").alias("as_of"))
    p = (
        ev.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(maxd))
        .groupBy("user_id", "as_of")
        .agg(
            F.datediff(F.first("as_of"), F.max("event_date")).alias(
                "recency_days"
            ),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "monetary_cents"
            ),
        )
        .transform(pin_frame)
    )
    scores = {
        "r_score": [F.asc("recency_days"), F.asc("user_id")],
        "f_score": [F.desc("frequency"), F.asc("user_id")],
        "m_score": [F.desc("monetary_cents"), F.asc("user_id")],
    }
    scored = p
    for out_col, order in scores.items():
        s = global_ntile(p, 5, order, out_col=out_col).select(
            "user_id", out_col
        )
        scored = scored.join(s, "user_id")
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("rfm_segment"),
    ).orderBy("user_id")


_LINEAR_ATTR_ORACLE = """
WITH p AS (
  SELECT user_id, ts AS p_ts, event_id AS p_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, ts AS t_ts, event_id AS t_id, event_type
  FROM events WHERE event_type IN ('view', 'click', 'add_to_cart')
),
j AS (
  SELECT p.p_id, p.cents, t.t_ts, t.t_id, t.event_type AS channel
  FROM p LEFT JOIN t
    ON t.user_id = p.user_id
   AND t.t_ts < p.p_ts
   AND t.t_ts >= p.p_ts - INTERVAL 7 DAY
),
r AS (
  SELECT p_id, cents, t_id, channel,
         CASE WHEN t_id IS NULL THEN NULL
              ELSE ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_ts, t_id)
         END AS rk,
         COUNT(t_id) OVER (PARTITION BY p_id) AS n
  FROM j
),
s AS (
  SELECT COALESCE(channel, '(none)') AS channel, p_id,
         CASE WHEN t_id IS NULL THEN cents
              ELSE cents // n + CASE WHEN rk <= cents % n THEN 1 ELSE 0 END
         END AS share_cents,
         CASE WHEN t_id IS NULL THEN 0 ELSE 1 END AS is_touch
  FROM r
)
SELECT channel,
       ROUND(SUM(share_cents) / 100.0, 2) AS attributed_revenue,
       CAST(COUNT(DISTINCT p_id) AS BIGINT) AS conversions,
       CAST(SUM(is_touch) AS BIGINT) AS touches
FROM s GROUP BY 1 ORDER BY 1
"""


@register("linear_attribution", _LINEAR_ATTR_ORACLE)
def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution over a 7-day lookback: each
    purchase's revenue splits EQUALLY across the user's preceding
    view/click/add_to_cart touches; purchases with no touch in the
    window report under '(none)'. The equal split is EXACT integer-cents
    arithmetic with largest-remainder allocation (cents div n, the first
    cents % n touches by time get the extra cent) — revenue is conserved
    to the cent, and both engines replay the identical division, so the
    whole operator hash-matches (a float split would drift in the sum).

    Scale shape: the purchase×touch expansion is an equi-join on user_id
    with the time-range predicate as a join filter — per-user bounded,
    no global term; the per-purchase rank windows key on p_id (bounded
    by one user's 7-day activity). Complements `first_touch_attribution`
    (100 %-to-first) with the spread-credit model."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = ev.where(
        F.col("event_type").isin("view", "click", "add_to_cart")
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("channel"),
    )
    j = p.join(
        t,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
        "left",
    )
    w = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    r = j.select(
        "p_id",
        "cents",
        "t_id",
        "channel",
        F.when(
            F.col("t_id").isNotNull(), F.row_number().over(w)
        ).alias("rk"),
        F.count("t_id").over(Window.partitionBy("p_id")).alias("n"),
    )
    share = F.when(F.col("t_id").isNull(), F.col("cents")).otherwise(
        F.expr("cents div n")
        + F.when(F.col("rk") <= F.col("cents") % F.col("n"), 1).otherwise(0)
    )
    s_df = r.select(
        F.coalesce("channel", F.lit("(none)")).alias("channel"),
        "p_id",
        share.alias("share_cents"),
        F.when(F.col("t_id").isNull(), 0).otherwise(1).alias("is_touch"),
    )
    return (
        s_df.groupBy("channel")
        .agg(
            F.round(F.sum("share_cents") / 100.0, 2).alias(
                "attributed_revenue"
            ),
            F.count_distinct("p_id").alias("conversions"),
            F.sum("is_touch").alias("touches"),
        )
        .orderBy("channel")
    )


_VALUE_QUARTILES_ORACLE = """
WITH q AS (
  SELECT event_type, value,
         NTILE(4) OVER (PARTITION BY event_type
                        ORDER BY value, event_id) AS quartile
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, quartile, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM q GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("value_quartiles_per_type", _VALUE_QUARTILES_ORACLE)
def value_quartiles_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretization (feature binning) of value within each
    event type — quartile label per event, rolled up to (type, quartile)
    count + bounds.

    Since r13 (opt round) the histogram is computed on the VALUE SUPPORT
    (:func:`functions.stats.grouped_ntile_histogram`): the aggregated
    (count, min, max) per bucket depends only on each distinct value's
    rank range — the event_id tie-break merely permutes rows within a
    tie run, invisible to the rollup — so no data row is ever ranked.
    One map-side-combinable aggregate compresses events to (type, value)
    weights; the rank machinery then runs on the support, which
    SATURATES as volume grows (the same flat-at-100× shape as the exact
    percentiles). Bit-identical to aggregating the per-row
    ``grouped_ntile`` (pinned by tests/test_stats.py), which the oracle
    replays as the plain SQL window."""
    from ..functions.stats import grouped_ntile_histogram

    ev = read_events(spark, sf_dir).where(F.col("value").isNotNull())
    hist = grouped_ntile_histogram(
        ev.select("event_type", "value"),
        4,
        ["event_type"],
        "value",
        out_col="quartile",
        materialize_support=True,  # one-shot query path: pin the support
    )
    return hist.select(
        "event_type",
        F.col("quartile").cast("int").alias("quartile"),
        "n",
        "min_value",
        "max_value",
    ).orderBy("event_type", "quartile")


_ROLLING_ACTIVE_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
win AS (
  SELECT user_id, day + CAST(i AS INTEGER) AS window_end
  FROM d, (SELECT unnest(range(0, 7)) AS i)
),
wau AS (
  SELECT window_end, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM win, bounds b
  WHERE window_end <= b.hi
  GROUP BY 1
),
dau AS (
  SELECT day AS window_end, CAST(COUNT(*) AS BIGINT) AS dau FROM d GROUP BY 1
)
SELECT w.window_end, dau.dau, w.wau,
       dau.dau * 1000000 // w.wau AS stickiness_ppm
FROM wau w JOIN dau USING (window_end)
ORDER BY window_end
"""


@register("rolling_active_users", _ROLLING_ACTIVE_ORACLE)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling 7-day active users (WAU) per day plus the DAU/WAU
    stickiness ratio — the engagement mart every product dashboard runs.

    Exact sliding COUNT DISTINCT cannot use a window frame (distinct
    does not decompose over frames); the scalable exact form is BOUNDED
    EXPANSION: each distinct (user, day) row replicates into the ≤ 7
    windows it belongs to, then one distinct-count per window — a 7×
    row expansion of the already-collapsed daily-user table, shuffled
    once on the window key, at any scale. (The approximate tier for
    wider windows is the mergeable-HLL rollup, `hll_weekly_rollup`.)"""
    ev = read_events(spark, sf_dir)
    d = ev.select("user_id", "event_date").distinct()
    hi = d.agg(F.max("event_date").alias("hi"))
    win = (
        d.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
            "event_date",
        )
        .select(
            "user_id", F.date_add("event_date", F.col("i")).alias("window_end")
        )
        .crossJoin(F.broadcast(hi))
        .where(F.col("window_end") <= F.col("hi"))
    )
    wau = win.groupBy("window_end").agg(
        F.count_distinct("user_id").alias("wau")
    )
    dau = d.groupBy(F.col("event_date").alias("window_end")).agg(
        F.count("*").alias("dau")
    )
    # stickiness rides as exact integer ppm (dau·10⁶ div wau) — a
    # ROUND(dau/wau, 4) DOUBLE is the cross-engine decimal-rounding
    # hazard that cost three r6 queries their driver grade
    return (
        wau.join(dau, "window_end")
        .select(
            "window_end",
            "dau",
            "wau",
            F.expr("dau * 1000000 div wau").alias("stickiness_ppm"),
        )
        .orderBy("window_end")
    )


_PSI_ORACLE = """
WITH v AS (
  SELECT CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15' THEN 'a' ELSE 'b' END AS half,
         CAST(least(floor(value / 25), 9) AS INTEGER) AS bin
  FROM events WHERE value IS NOT NULL
),
grid AS (
  SELECT h.half, b.bin
  FROM (SELECT unnest(['a', 'b']) AS half) h,
       (SELECT unnest(range(0, 10)) AS bin) b
),
c AS (
  SELECT g.half, g.bin,
         COALESCE(n.cnt, 0) AS raw_cnt,
         COALESCE(n.cnt, 0) + 1 AS cnt
  FROM grid g LEFT JOIN (
    SELECT half, bin, COUNT(*) AS cnt FROM v GROUP BY 1, 2
  ) n ON n.half = g.half AND n.bin = g.bin
),
t AS (SELECT half, SUM(cnt) AS tot, SUM(raw_cnt) AS raw_tot FROM c GROUP BY 1),
pq AS (
  SELECT a.bin,
         a.cnt / ta.tot AS p,
         b.cnt / tb.tot AS q
  FROM c a JOIN c b ON b.bin = a.bin AND a.half = 'a' AND b.half = 'b'
  JOIN t ta ON ta.half = 'a' JOIN t tb ON tb.half = 'b'
),
terms AS (
  SELECT list_transform(
           list_sort(list(ROW(bin, (p - q) * ln(p / q)))),
           x -> x[2]) AS xs
  FROM pq
)
SELECT (SELECT CAST(raw_tot AS BIGINT) FROM t WHERE half = 'a') AS n_first,
       (SELECT CAST(raw_tot AS BIGINT) FROM t WHERE half = 'b') AS n_last,
       ROUND(list_reduce(list_prepend(0.0::DOUBLE, xs), (acc, x) -> acc + x), 4)
         AS psi
FROM terms
"""


@register("value_drift_psi", _PSI_ORACLE)
def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the log's first and second half
    — the standard production drift monitor for a feature/score
    distribution (PSI < 0.1 stable, > 0.25 shifted).

    Built for exact cross-engine replay: FIXED equal-width bins (value
    div 25, capped at bin 9 — data-derived quantile bins would make the
    binning itself float-sensitive), exact integer counts over a
    completed half × bin grid, add-one smoothing so empty bins stay
    finite, and the PSI sum folded SEQUENTIALLY over bins ascending (the
    same fold trick as EWMA/doc_surprisal) with one ROUND(4) at the end
    riding over any last-ulp ln() difference. Two tiny aggregations over
    the event scan; the 20-cell grid is the only joined state."""
    ev = read_events(spark, sf_dir).where(F.col("value").isNotNull())
    v = ev.select(
        F.when(F.col("event_date") <= F.lit("2024-01-15"), "a")
        .otherwise("b")
        .alias("half"),
        F.least(F.floor(F.col("value") / 25), F.lit(9))
        .cast("int")
        .alias("bin"),
    )
    counts = v.groupBy("half", "bin").agg(F.count("*").alias("cnt"))
    grid = (
        spark.range(10)
        .select(F.col("id").cast("int").alias("bin"))
        .crossJoin(
            spark.createDataFrame([("a",), ("b",)], "half string")
        )
    )
    c = (
        grid.join(counts, ["half", "bin"], "left")
        .select(
            "half",
            "bin",
            F.coalesce("cnt", F.lit(0)).alias("raw_cnt"),
            (F.coalesce("cnt", F.lit(0)) + 1).alias("cnt"),
        )
    )
    t = c.groupBy("half").agg(
        F.sum("cnt").alias("tot"), F.sum("raw_cnt").alias("raw_tot")
    )
    a = c.where(F.col("half") == "a").select(
        "bin", F.col("cnt").alias("cnt_a")
    )
    b = c.where(F.col("half") == "b").select(
        "bin", F.col("cnt").alias("cnt_b")
    )
    ta = t.where(F.col("half") == "a").select(
        F.col("tot").alias("tot_a"), F.col("raw_tot").alias("n_first")
    )
    tb = t.where(F.col("half") == "b").select(
        F.col("tot").alias("tot_b"), F.col("raw_tot").alias("n_last")
    )
    pq = (
        a.join(b, "bin")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .select(
            "bin",
            (F.col("cnt_a") / F.col("tot_a")).alias("p"),
            (F.col("cnt_b") / F.col("tot_b")).alias("q"),
            "n_first",
            "n_last",
        )
    )
    term = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    folded = pq.groupBy("n_first", "n_last").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("bin"), term.alias("term")))
        ).alias("_t")
    )
    psi = F.aggregate(
        F.transform(F.col("_t"), lambda s: s["term"]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return folded.select(
        F.col("n_first").cast("long").alias("n_first"),
        F.col("n_last").cast("long").alias("n_last"),
        F.round(psi, 4).alias("psi"),
    )


_TOPN_CHURN_ORACLE = """
WITH rev AS (
  SELECT CAST(l_shipdate AS DATE) AS day, l_partkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem
  GROUP BY 1, 2
),
m AS (
  SELECT day, l_partkey FROM (
    SELECT day, l_partkey,
           ROW_NUMBER() OVER (PARTITION BY day
                              ORDER BY cents DESC, l_partkey) AS rk
    FROM rev
  ) WHERE rk <= 5
),
days AS (SELECT DISTINCT day FROM m),
entered AS (
  SELECT t.day, COUNT(*) AS entered
  FROM m t LEFT JOIN m y
    ON y.l_partkey = t.l_partkey AND y.day + 1 = t.day
  WHERE y.l_partkey IS NULL GROUP BY 1
),
exited AS (
  SELECT y.day + 1 AS day, COUNT(*) AS exited
  FROM m y
  JOIN days d ON d.day = y.day + 1
  LEFT JOIN m t ON t.l_partkey = y.l_partkey AND t.day = y.day + 1
  WHERE t.l_partkey IS NULL GROUP BY 1
)
SELECT d.day,
       CAST(COALESCE(e.entered, 0) AS BIGINT) AS entered,
       CAST(COALESCE(x.exited, 0) AS BIGINT) AS exited,
       CAST(5 - COALESCE(e.entered, 0) AS BIGINT) AS stayed
FROM days d
LEFT JOIN entered e ON e.day = d.day
LEFT JOIN exited x ON x.day = d.day
ORDER BY d.day
"""


@register("daily_topn_churn", _TOPN_CHURN_ORACLE)
def daily_topn_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard churn: each ship-day's top-5 parts by exact-cents
    revenue, and how many entered / exited / stayed vs the previous
    day's board — the day-over-day ranking-stability mart.

    The per-day top-5 is the ``row_number <= k`` idiom, which Spark
    compiles to Partial+Final WindowGroupLimit: at most 5 rows per day
    per input partition ever reach the shuffle, so a day with a hundred
    million active parts costs the same as one with fifty (the plan
    snapshot pins the node). Membership diffs are two anti-joins on the
    tiny (days × 5) board table. Sparse calendars work unchanged: a day
    with no prior-day board simply enters all five seats."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    rev = (
        li.select(
            F.to_date("l_shipdate").alias("day"),
            "l_partkey",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("_c"),
        )
        .groupBy("day", "l_partkey")
        .agg(F.sum("_c").alias("cents"))
    )
    w = Window.partitionBy("day").orderBy(F.desc("cents"), "l_partkey")
    # The board is (days × 5) rows but its lineage is a full lineitem
    # aggregation + window — and it feeds FIVE branches below (days, the
    # entered anti-join's both sides, the exited semi/anti joins).
    # Materialize it once (r13 opt): one small job instead of ~4
    # lineitem passes re-executed per branch.
    m = (
        rev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("day", "l_partkey")
        .transform(pin_frame)
    )
    days = m.select("day").distinct()
    y = m.select(
        F.date_add("day", 1).alias("day"),
        F.col("l_partkey").alias("_prev_pk"),
    )
    entered = (
        m.join(
            y,
            (y["day"] == m["day"]) & (y["_prev_pk"] == m["l_partkey"]),
            "left_anti",
        )
        .groupBy("day")
        .agg(F.count("*").alias("entered"))
    )
    exited = (
        y.join(days, "day", "left_semi")
        .join(
            m,
            (m["day"] == y["day"]) & (m["l_partkey"] == y["_prev_pk"]),
            "left_anti",
        )
        .groupBy("day")
        .agg(F.count("*").alias("exited"))
    )
    return (
        days.join(entered, "day", "left")
        .join(exited, "day", "left")
        .select(
            "day",
            F.coalesce("entered", F.lit(0)).alias("entered"),
            F.coalesce("exited", F.lit(0)).alias("exited"),
            (F.lit(5) - F.coalesce("entered", F.lit(0))).alias("stayed"),
        )
        .orderBy("day")
    )


_AB_ZTEST_ORACLE = """
WITH u AS (
  SELECT user_id,
         CASE WHEN CAST(CAST(('0x' || substr(md5('ab1#' || user_id), 1, 8))
                            AS BIGINT) % 2 AS INT) = 0
              THEN 'A' ELSE 'B' END AS variant,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1
),
g AS (
  SELECT variant,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS conv
  FROM u GROUP BY 1
),
w AS (
  SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b,
         a.conv / CAST(a.n AS DOUBLE) AS p_a,
         b.conv / CAST(b.n AS DOUBLE) AS p_b,
         (a.conv + b.conv) / CAST(a.n + b.n AS DOUBLE) AS p_pool
  FROM (SELECT * FROM g WHERE variant = 'A') a,
       (SELECT * FROM g WHERE variant = 'B') b
)
SELECT n_a, conv_a, n_b, conv_b,
       ROUND(p_a, 6) AS rate_a, ROUND(p_b, 6) AS rate_b,
       ROUND((p_a - p_b)
             / SQRT(p_pool * (1 - p_pool)
                    * (1 / CAST(n_a AS DOUBLE) + 1 / CAST(n_b AS DOUBLE))),
             4) AS z_score,
       ABS((p_a - p_b)
           / SQRT(p_pool * (1 - p_pool)
                  * (1 / CAST(n_a AS DOUBLE) + 1 / CAST(n_b AS DOUBLE))))
         >= 1.96 AS significant
FROM w
"""


@register("ab_conversion_ztest", _AB_ZTEST_ORACLE)
def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on user conversion between experiment arms —
    the A/B readout mart. Arm assignment is the PRODUCTION idiom: a
    salted md5 hash of user_id mod 2 (deterministic, stable under
    re-runs and partitioning — the same property dataset_split relies
    on), conversion = the user purchased at least once.

    Float discipline: counts and the pooled/arm rates are exact integer
    divisions (identical bits in both engines) and the only
    transcendental is SQRT — which IEEE 754 requires correctly rounded,
    so unlike ln/exp the z-score matches BIT-FOR-BIT before its display
    rounding; `significant` thresholds the raw statistic."""
    from ..functions.hashing import md5_prefix_long

    ev = read_events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    u = u.select(
        F.when(md5_prefix_long("ab1", F.col("user_id")) % 2 == 0, "A")
        .otherwise("B")
        .alias("variant"),
        "converted",
    )
    g = u.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    a = g.where(F.col("variant") == "A").select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = g.where(F.col("variant") == "B").select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    w = a.crossJoin(b).select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        (F.col("conv_a") / F.col("n_a").cast("double")).alias("p_a"),
        (F.col("conv_b") / F.col("n_b").cast("double")).alias("p_b"),
        (
            (F.col("conv_a") + F.col("conv_b"))
            / (F.col("n_a") + F.col("n_b")).cast("double")
        ).alias("p_pool"),
    )
    z = (F.col("p_a") - F.col("p_b")) / F.sqrt(
        F.col("p_pool")
        * (1 - F.col("p_pool"))
        * (
            1 / F.col("n_a").cast("double")
            + 1 / F.col("n_b").cast("double")
        )
    )
    return w.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round("p_a", 6).alias("rate_a"),
        F.round("p_b", 6).alias("rate_b"),
        F.round(z, 4).alias("z_score"),
        (F.abs(z) >= 1.96).alias("significant"),
    )


_ITEM_SIM_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
part_orders AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_ord FROM items GROUP BY 1
),
pairs AS (
  SELECT a.l_partkey AS part_1, b.l_partkey AS part_2,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM items a
  JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
),
sym AS (
  SELECT part_1 AS part_id, part_2 AS partner_id, support FROM pairs
  UNION ALL
  SELECT part_2 AS part_id, part_1 AS partner_id, support FROM pairs
),
scored AS (
  SELECT s.part_id, s.partner_id, s.support,
         CAST(s.support AS DOUBLE)
           / SQRT(CAST(o1.n_ord * o2.n_ord AS DOUBLE)) AS cos_raw
  FROM sym s
  JOIN part_orders o1 ON o1.l_partkey = s.part_id
  JOIN part_orders o2 ON o2.l_partkey = s.partner_id
),
ranked AS (
  SELECT part_id, partner_id, support,
         ROUND(cos_raw, 6) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY part_id
                            ORDER BY support DESC, partner_id) AS rk
  FROM scored
)
SELECT part_id, partner_id, support, cosine, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 3
ORDER BY part_id, rk
"""


@register("item_similarity_topk", _ITEM_SIM_ORACLE)
def item_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering neighbors: for every part, its
    top-3 most-similar parts by basket co-occurrence cosine
    (support / √(n₁·n₂)) — the classic "customers also bought" mart.

    Scale shape: the pair space is keyed by order (Σ basket-choose-2,
    never parts²) like basket_pairs; the support ≥ 2 floor drops the
    singleton-pair long tail BEFORE the symmetrize/union doubles it; the
    per-item top-3 is the row_number ≤ k idiom Spark compiles to
    Partial+Final WindowGroupLimit, so at most 3 rows per part per input
    partition reach the final shuffle. Float discipline: ordering uses
    only integers (support desc, partner asc); the cosine is one
    DOUBLE division by an IEEE-correctly-rounded SQRT of an exact
    integer product, so it hash-matches the oracle bit-for-bit."""
    from pyspark.sql import Window

    # items and pairs are each consumed by MULTIPLE branches (items by
    # both self-join sides + part_orders; pairs twice by the symmetrize
    # union) — unpinned, the expensive basket self-join would run twice.
    # Materialize both once (r13 opt, guide §5 persist-when-reused).
    items = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .transform(pin_frame)
    )
    part_orders = items.groupBy("l_partkey").agg(F.count("*").alias("n_ord"))
    a = items.select(
        F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("part_1")
    )
    b = items.select(
        F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("part_2")
    )
    pairs = (
        a.join(b.hint("shuffle_hash"), "_o")
        .where(F.col("part_1") < F.col("part_2"))
        .groupBy("part_1", "part_2")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= 2)
        .transform(pin_frame)
    )
    sym = pairs.select(
        F.col("part_1").alias("part_id"),
        F.col("part_2").alias("partner_id"),
        "support",
    ).unionByName(
        pairs.select(
            F.col("part_2").alias("part_id"),
            F.col("part_1").alias("partner_id"),
            "support",
        )
    )
    scored = (
        sym.join(
            part_orders.select(
                F.col("l_partkey").alias("part_id"),
                F.col("n_ord").alias("_n1"),
            ),
            "part_id",
        )
        .join(
            part_orders.select(
                F.col("l_partkey").alias("partner_id"),
                F.col("n_ord").alias("_n2"),
            ),
            "partner_id",
        )
        .select(
            "part_id",
            "partner_id",
            "support",
            (
                F.col("support").cast("double")
                / F.sqrt((F.col("_n1") * F.col("_n2")).cast("double"))
            ).alias("_cos"),
        )
    )
    w = Window.partitionBy("part_id").orderBy(F.desc("support"), "partner_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "part_id",
            "partner_id",
            "support",
            F.round("_cos", 6).alias("cosine"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("part_id", "rk")
    )


_PEAK_CONC_ORACLE = """
WITH s AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         MIN(ts) AS ts_start, MAX(ts) AS ts_end
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1, 2
),
deltas AS (
  SELECT ts_start AS ts, 1 AS delta, user_id FROM s
  UNION ALL
  SELECT ts_end AS ts, -1 AS delta, user_id FROM s
),
run AS (
  SELECT ts, delta, user_id,
         SUM(delta) OVER (ORDER BY ts, delta DESC, user_id) AS conc
  FROM deltas
)
SELECT CAST(ts AS DATE) AS day,
       CAST(MAX(conc) AS BIGINT) AS peak_concurrent,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS user_days_started
FROM run GROUP BY 1 ORDER BY 1
"""


@register("peak_concurrency", _PEAK_CONC_ORACLE)
def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily peak concurrent users — the sweep-line interval problem:
    each user-day activity span (first event → last event of that user
    that day) contributes +1 at its start and −1 at its end (inclusive
    ends: the +1 sorts before the −1 at equal timestamps via delta
    DESC), and the peak is the max of the running delta sum. The classic
    SQL solution, `SUM(delta) OVER (ORDER BY ts)`, is the unpartitioned
    single-task window — here it is distributed_prefix_sum's
    range-partition + broadcast-offset pattern over the total order
    (ts, delta DESC, user_id), exact at any scale. State per task is one
    running integer; the day rollup is an ordinary aggregation."""
    from ..operators.windows import distributed_prefix_sum

    ev = read_events(spark, sf_dir).where(F.col("user_id").isNotNull())
    # Materialize the (user, day) span rollup ONCE: the stateless pinned
    # frame inside distributed_prefix_sum re-executes its input subtree
    # per consumer branch (~3×), and here that subtree is a full-events
    # aggregation. The rollup is tiny (≤ users × days rows) at any
    # volume, so pinning it trades one small job for three events
    # passes — the §2.4 "remove shuffles outright" shape (r13 opt).
    s = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.min("ts").alias("ts_start"), F.max("ts").alias("ts_end")
    ).transform(pin_frame)
    deltas = s.select(
        F.col("ts_start").alias("ts"), F.lit(1).alias("delta"), "user_id"
    ).unionByName(
        s.select(
            F.col("ts_end").alias("ts"), F.lit(-1).alias("delta"), "user_id"
        )
    )
    run = distributed_prefix_sum(
        deltas,
        ["ts", F.desc("delta"), "user_id"],
        "delta",
        out_col="conc",
        exclusive=False,
    )
    return (
        run.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.max("conc").alias("peak_concurrent"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
                "user_days_started"
            ),
        )
        .orderBy("day")
    )


_INTERSECT_ORACLE = """
SELECT user_id FROM events
WHERE event_type = 'view' AND CAST(ts AS DATE) = DATE '2024-01-01'
INTERSECT
SELECT user_id FROM events
WHERE event_type = 'purchase' AND CAST(ts AS DATE) = DATE '2024-01-01'
ORDER BY user_id
"""


@register("viewers_also_purchased", _INTERSECT_ORACLE)
def viewers_also_purchased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set intersection) — completes the §2.7 set-op
    family next to UNION ALL (`union_activity`) and EXCEPT
    (`viewers_never_purchased`). Spark plans `intersect` as a left-semi
    join over distincts — hash-shuffle on the key, no sort."""
    events = read_events(spark, sf_dir).where(
        F.col("event_date") == F.lit("2024-01-01")
    )
    viewers = events.where(F.col("event_type") == "view").select("user_id")
    buyers = events.where(F.col("event_type") == "purchase").select("user_id")
    return viewers.intersect(buyers).orderBy("user_id")


_SEQ_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY 1
),
w AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n3
)
SELECT step, users, conv_ppm FROM (
  SELECT '1_signup' AS step, n1 AS users,
         CAST(1000000 AS BIGINT) AS conv_ppm FROM w
  UNION ALL
  SELECT '2_click', n2, n2 * 1000000 // NULLIF(n1, 0) FROM w
  UNION ALL
  SELECT '3_purchase', n3, n3 * 1000000 // NULLIF(n2, 0) FROM w
) ORDER BY step
"""


@register("sequence_funnel", _SEQ_FUNNEL_ORACLE)
def sequence_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order sequence funnel (MATCH_RECOGNIZE-lite): users who
    signed up, then CLICKED STRICTLY AFTER their first signup, then
    PURCHASED STRICTLY AFTER that click — earliest-completion semantics
    per step, with per-step survivors and step-over-step conversion in
    integer ppm. Unlike funnel_daily (same-day count ratios), this is
    the per-user ordered-path definition an experimentation platform
    reports.

    Each step is one filtered aggregation plus a user-keyed join against
    the (shrinking) survivor set of the previous step — k steps cost k
    passes that each read one event-type partition of the log and
    shuffle only user-grain rows; no windows, no per-user event
    buffering. Spark's CTE dedup reuses the scan; the survivor joins are
    AQE-sized (the deeper sets get small enough to broadcast)."""
    ev = read_events(spark, sf_dir)
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    w = (
        s1.agg(F.count("*").alias("n1"))
        .crossJoin(s2.agg(F.count("*").alias("n2")))
        .crossJoin(s3.agg(F.count("*").alias("n3")))
    )
    return w.selectExpr(
        "stack(3,"
        " '1_signup', n1, CAST(1000000 AS BIGINT),"
        " '2_click', n2, n2 * 1000000 div NULLIF(n1, 0),"
        " '3_purchase', n3, n3 * 1000000 div NULLIF(n2, 0)"
        ") AS (step, users, conv_ppm)"
    ).orderBy("step")


_SESSION_STATS_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_id,
         date_diff('second', LAG(ts) OVER w, ts) AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
m AS (
  SELECT user_id, ts,
         SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM g
),
s AS (
  SELECT user_id, session_seq,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS dur
  FROM m GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS bounce_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS bounce_ppm,
       quantile_cont(dur, 0.5) AS p50_duration_sec,
       quantile_cont(dur, 0.9) AS p90_duration_sec,
       CAST(MAX(dur) AS BIGINT) AS max_duration_sec
FROM s
"""


@register("session_duration_stats", _SESSION_STATS_ORACLE)
def session_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-quality summary over gap-inferred sessions (30-min): total
    sessions, bounce rate (single-event sessions, integer ppm), and
    exact p50/p90/max dwell — the canonical engagement KPIs next to
    inferred_sessions' per-session grain. Durations are integer seconds
    (no float until the interpolated percentiles, which Spark
    `percentile` and DuckDB `quantile_cont` compute identically); the
    sessionize windows partition by user."""
    from ..operators.windows import sessionize

    s = (
        sessionize(read_events(spark, sf_dir))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("dur"),
        )
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return s.agg(
        F.count("*").alias("n_sessions"),
        bounce.alias("bounce_sessions"),
        F.expr(
            "CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000"
            " div count(*) AS BIGINT)"
        ).alias("bounce_ppm"),
        F.expr("percentile(dur, 0.5D)").alias("p50_duration_sec"),
        F.expr("percentile(dur, 0.9D)").alias("p90_duration_sec"),
        F.max("dur").alias("max_duration_sec"),
    )


_COHORT_LTV_ORACLE = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1
),
rev AS (
  SELECT e.user_id, f.cohort_week,
         CAST(date_diff('week', f.cohort_week,
                        CAST(date_trunc('week', e.ts) AS DATE)) AS INT)
           AS age_weeks,
         CAST(ROUND(e.value * 100) AS BIGINT) AS cents
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase'
),
sz AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM first_seen GROUP BY 1
),
wk AS (
  SELECT cohort_week, age_weeks, SUM(cents) AS wk_cents
  FROM rev GROUP BY 1, 2
),
cum AS (
  SELECT cohort_week, age_weeks,
         SUM(wk_cents) OVER (PARTITION BY cohort_week
                             ORDER BY age_weeks) AS cum_cents
  FROM wk
)
SELECT c.cohort_week, c.age_weeks, s.cohort_users,
       CAST(c.cum_cents AS BIGINT) AS cum_cents,
       CAST(c.cum_cents // s.cohort_users AS BIGINT)
         AS ltv_cents_per_user
FROM cum c JOIN sz s ON s.cohort_week = c.cohort_week
ORDER BY c.cohort_week, c.age_weeks
"""


@register("cohort_ltv_curve", _COHORT_LTV_ORACLE)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users cohorted by first-seen week,
    purchase revenue accumulated by weeks-since-signup — the revenue
    twin of retention_cohorts' activity triangle, read as "a week-N
    user is worth X cents so far". Exact cents throughout; per-user LTV
    is integer floor division by cohort size.

    The cumulative sum windows PARTITION BY cohort (each frame is
    calendar-bounded — weeks of product age — regardless of user
    volume), so no global window appears; the cohort join is user-keyed
    and the first-seen aggregate is one pass."""
    ev = read_events(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", "ts").cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("int")
            .alias("age_weeks"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    sz = first_seen.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_users")
    )
    wk = rev.groupBy("cohort_week", "age_weeks").agg(
        F.sum("cents").alias("wk_cents")
    )
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = wk.select(
        "cohort_week",
        "age_weeks",
        F.sum("wk_cents").over(wcum).alias("cum_cents"),
    )
    return (
        cum.join(sz, "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "cohort_users",
            "cum_cents",
            F.expr("cum_cents div cohort_users").alias("ltv_cents_per_user"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


_AB_POWER_ORACLE = """
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS c
  FROM u
)
SELECT n AS users_per_arm_pool, c AS converters,
       ROUND(c / CAST(n AS DOUBLE), 6) AS base_rate,
       ROUND((1.959964 + 0.841621)
             * SQRT(2.0 * (c / CAST(n AS DOUBLE))
                    * (1.0 - c / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) / 2.0)), 6) AS mde_abs,
       ROUND(((1.959964 + 0.841621)
              * SQRT(2.0 * (c / CAST(n AS DOUBLE))
                     * (1.0 - c / CAST(n AS DOUBLE))
                     / (CAST(n AS DOUBLE) / 2.0)))
             / (c / CAST(n AS DOUBLE)), 4) AS mde_rel
FROM g
"""


@register("ab_power_mde", _AB_POWER_ORACLE)
def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power planning: the minimum detectable effect for a
    two-arm 50/50 split of the current user pool at α = 0.05 (two-sided)
    and 80 % power — MDE = (z_{α/2}+z_β)·√(2p(1-p)/n_arm), the
    pre-registration companion to ab_conversion_ztest's readout. The z
    quantiles are pinned literals (1.959964, 0.841621), so the only
    transcendental is the IEEE-exact SQRT and the result hash-matches
    cross-engine."""
    u = read_events(spark, sf_dir).groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    g = u.agg(F.count("*").alias("n"), F.sum("conv").alias("c"))
    p = F.col("c") / F.col("n").cast("double")
    mde = (1.959964 + 0.841621) * F.sqrt(
        2.0 * p * (1.0 - p) / (F.col("n").cast("double") / 2.0)
    )
    return g.select(
        F.col("n").alias("users_per_arm_pool"),
        F.col("c").alias("converters"),
        F.round(p, 6).alias("base_rate"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / p, 4).alias("mde_rel"),
    )


_REC_HITRATE_ORACLE = """
WITH train AS (
  SELECT DISTINCT l.l_orderkey, l.l_partkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderdate < DATE '2000-01-01'
),
test AS (
  SELECT DISTINCT l.l_orderkey, l.l_partkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderdate >= DATE '2000-01-01'
),
pairs AS (
  SELECT a.l_partkey AS part_1, b.l_partkey AS part_2,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM train a JOIN train b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
sym AS (
  SELECT part_1 AS part_id, part_2 AS partner_id, support FROM pairs
  UNION ALL
  SELECT part_2, part_1, support FROM pairs
),
nb AS (
  SELECT part_id, partner_id FROM (
    SELECT part_id, partner_id,
           ROW_NUMBER() OVER (PARTITION BY part_id
                              ORDER BY support DESC, partner_id) AS rk
    FROM sym
  ) WHERE rk <= 3
),
eligible AS (
  SELECT l_orderkey FROM test GROUP BY 1 HAVING COUNT(*) >= 2
),
hits AS (
  SELECT DISTINCT t.l_orderkey
  FROM test t
  JOIN eligible e ON e.l_orderkey = t.l_orderkey
  JOIN nb ON nb.part_id = t.l_partkey
  JOIN test t2 ON t2.l_orderkey = t.l_orderkey
             AND t2.l_partkey = nb.partner_id
)
SELECT (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM train)
         AS n_train_orders,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM eligible) AS n_test_baskets,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_hits,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) * 1000000
         // NULLIF((SELECT CAST(COUNT(*) AS BIGINT) FROM eligible), 0)
         AS hitrate_ppm
"""


@register("item_rec_hitrate", _REC_HITRATE_ORACLE)
def item_rec_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline recommender evaluation: train the item-item co-occurrence
    top-3 neighbor table on pre-2000 orders, then score it on held-out
    later baskets — a basket "hits" when any of its items' trained
    neighbors also appears in it. Temporal split (never random) is the
    honest protocol: the model can only use the past.

    Scale shape mirrors training: the neighbor build is order-keyed
    (Σ basket², never parts²) with map-side WindowGroupLimit; evaluation
    is basket-keyed joins of the 3-row-per-item neighbor table against
    the test items — fan-out bounded by basket size × 3. All counts and
    the ppm hit-rate are exact integers."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    od = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    # ONE join + distinct pass over lineitem⋈orders, materialized once
    # (r13 opt): train is consumed by 3 branches (both self-join sides +
    # the order count) and test by 3 more (eligible, the hits join, t2) —
    # unpinned, each branch re-ran the join+distinct. The split flag is
    # order-constant, so distinct over (order, part, is_train) has the
    # same cardinality as the two separate distincts combined.
    flagged = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .select(
            "l_orderkey",
            "l_partkey",
            (F.col("o_orderdate") < "2000-01-01").alias("_is_train"),
        )
        .distinct()
        .transform(pin_frame)
    )
    train = flagged.where(F.col("_is_train")).select("l_orderkey", "l_partkey")
    test = flagged.where(~F.col("_is_train")).select("l_orderkey", "l_partkey")
    a = train.select(
        F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("part_1")
    )
    b = train.select(
        F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("part_2")
    )
    pairs = (
        a.join(b.hint("shuffle_hash"), "_o")
        .where(F.col("part_1") < F.col("part_2"))
        .groupBy("part_1", "part_2")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= 2)
        # pinned: the symmetrize union below consumes pairs TWICE, and
        # its lineage is the expensive basket self-join (r13 opt)
        .transform(pin_frame)
    )
    sym = pairs.select(
        F.col("part_1").alias("part_id"),
        F.col("part_2").alias("partner_id"),
        "support",
    ).unionByName(
        pairs.select(
            F.col("part_2").alias("part_id"),
            F.col("part_1").alias("partner_id"),
            "support",
        )
    )
    wr = Window.partitionBy("part_id").orderBy(F.desc("support"), "partner_id")
    nb = (
        sym.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= 3)
        .select("part_id", "partner_id")
    )
    eligible = (
        test.groupBy("l_orderkey")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") >= 2)
        .select("l_orderkey")
    )
    t2 = test.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_partkey").alias("_pk2")
    )
    hits = (
        test.join(eligible, "l_orderkey", "left_semi")
        .join(nb, test["l_partkey"] == nb["part_id"])
        .join(
            t2,
            (F.col("_ok2") == F.col("l_orderkey"))
            & (F.col("_pk2") == F.col("partner_id")),
            "left_semi",
        )
        .select("l_orderkey")
        .distinct()
    )
    w = (
        train.agg(F.count_distinct("l_orderkey").alias("n_train_orders"))
        .crossJoin(eligible.agg(F.count("*").alias("n_test_baskets")))
        .crossJoin(hits.agg(F.count("*").alias("n_hits")))
    )
    return w.select(
        "n_train_orders",
        "n_test_baskets",
        "n_hits",
        F.expr("n_hits * 1000000 div NULLIF(n_test_baskets, 0)").alias(
            "hitrate_ppm"
        ),
    )


_BUDGET_WATERFALL_ORACLE = """
WITH src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY 1
),
capd AS (
  SELECT source, n_docs, tokens, tokens // 2 AS cap FROM src
),
tot AS (
  SELECT CAST(SUM(cap) * 9 // 10 AS DOUBLE) AS budget,
         CAST(SUM(n_docs) AS DOUBLE) AS wtot
  FROM capd
),
arr AS (
  SELECT t.budget, t.wtot,
         list_sort(list(struct_pack(
           ratio := CAST(c.cap AS DOUBLE) / c.n_docs,
           source := c.source,
           cap := CAST(c.cap AS DOUBLE),
           w := CAST(c.n_docs AS DOUBLE)))) AS s
  FROM capd c, tot t GROUP BY 1, 2
),
ex AS (
  SELECT budget, wtot, s, unnest(range(1, len(s)+1)) AS i FROM arr
),
alloc AS (
  SELECT s[i].source AS source, s[i].cap AS cap, s[i].w AS w,
    list_reduce(
      list_prepend([budget, wtot],
        list_transform(list_slice(s, 1, i-1), p -> [p.cap, p.w])),
      (acc, x) -> [
        acc[1] - LEAST(x[1], FLOOR(acc[1] * x[2] / acc[2])),
        acc[2] - x[2]]) AS st
  FROM ex
)
SELECT c.source, c.n_docs, c.tokens, c.cap,
       CAST(LEAST(a.cap, FLOOR(a.st[1] * a.w / a.st[2])) AS BIGINT)
         AS alloc_tokens,
       CAST(FLOOR(LEAST(a.cap, FLOOR(a.st[1] * a.w / a.st[2]))
                  * 1000000.0 / a.cap) AS BIGINT) AS fill_ppm
FROM alloc a JOIN capd c ON c.source = a.source
ORDER BY c.source
"""


@register("budget_waterfall", _BUDGET_WATERFALL_ORACLE)
def budget_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained corpus mixing — exact water-filling: a token
    budget (90 % of total capacity) is split across sources
    proportionally to doc count, but no source may contribute more than
    half its tokens (the cap); capped sources' unused share cascades to
    the rest. Sources are processed in ascending cap/weight order (the
    water-filling order: binding caps first) with running (remaining
    budget, remaining weight) state, so the allocation is the
    deterministic sequential spec of the classic algorithm.

    Cross-engine exactness: all quantities are integers carried as
    doubles < 2⁵³ (every multiply/divide/floor exact-or-identically-
    rounded in both engines), the fold is the per-prefix list-
    accumulator pattern holt_revenue_backtest established, and the fold
    length is the SOURCE CATALOG (20 here), never the corpus — the only
    data-scale pass is the per-source token count."""
    src = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " "))).alias("tokens"),
        )
    )
    capd = src.withColumn("cap", F.expr("tokens div 2"))
    tot = capd.agg(
        F.expr("CAST(sum(cap) * 9 div 10 AS DOUBLE)").alias("budget"),
        F.sum("n_docs").cast("double").alias("wtot"),
    )
    arr = capd.crossJoin(F.broadcast(tot)).groupBy("budget", "wtot").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (F.col("cap").cast("double") / F.col("n_docs")).alias(
                        "ratio"
                    ),
                    "source",
                    F.col("cap").cast("double").alias("cap"),
                    F.col("n_docs").cast("double").alias("w"),
                )
            )
        ).alias("s")
    )
    rows = arr.select(
        F.expr(
            """
            inline(transform(sequence(1, size(s)), i -> struct(
              element_at(s, i).source AS source,
              element_at(s, i).cap AS cap,
              element_at(s, i).w AS w,
              aggregate(
                slice(s, 1, i - 1),
                named_struct('r', budget, 'u', wtot),
                (acc, x) -> named_struct(
                  'r', acc.r - LEAST(x.cap, FLOOR(acc.r * x.w / acc.u)),
                  'u', acc.u - x.w)) AS st)))
            """
        )
    ).select(
        "source",
        F.least(
            F.col("cap"),
            F.floor(F.col("st.r") * F.col("w") / F.col("st.u")),
        ).alias("_alloc"),
    )
    return (
        capd.join(rows, "source")
        .select(
            "source",
            "n_docs",
            "tokens",
            "cap",
            F.col("_alloc").cast("long").alias("alloc_tokens"),
            F.floor(F.col("_alloc") * 1000000.0 / F.col("cap").cast("double"))
            .cast("long")
            .alias("fill_ppm"),
        )
        .orderBy("source")
    )


_CART_ABANDON_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_id, event_type,
         date_diff('second', LAG(ts) OVER w, ts) AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
m AS (
  SELECT user_id, event_type,
         SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM g
),
s AS (
  SELECT user_id, session_seq,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_cart,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS has_purchase
  FROM m GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(has_cart) AS BIGINT) AS cart_sessions,
       CAST(SUM(CASE WHEN has_cart = 1 AND has_purchase = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS abandoned_sessions,
       CAST(SUM(CASE WHEN has_cart = 1 AND has_purchase = 0
                     THEN 1 ELSE 0 END) * 1000000
            // NULLIF(SUM(has_cart), 0) AS BIGINT) AS abandonment_ppm
FROM s
"""


@register("cart_abandonment", _CART_ABANDON_ORACLE)
def cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cart-abandonment rate over gap-inferred sessions: sessions that
    contain an intent event (click, this log's add-to-cart analog) but
    no purchase before the session expires — THE e-commerce
    recovery-campaign KPI, in integer ppm. Same 30-minute sessionization
    as inferred_sessions; the per-session flags are one grouped MAX pass
    and the rollup is a single row."""
    from ..operators.windows import sessionize

    s = (
        sessionize(read_events(spark, sf_dir))
        .groupBy("user_id", "session_seq")
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("has_cart"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("has_purchase"),
        )
    )
    abandoned = F.sum(
        F.when((F.col("has_cart") == 1) & (F.col("has_purchase") == 0), 1)
        .otherwise(0)
    )
    return s.agg(
        F.count("*").alias("n_sessions"),
        F.sum("has_cart").cast("long").alias("cart_sessions"),
        abandoned.cast("long").alias("abandoned_sessions"),
        F.expr(
            "CAST(sum(CASE WHEN has_cart = 1 AND has_purchase = 0"
            " THEN 1 ELSE 0 END) * 1000000"
            " div NULLIF(sum(has_cart), 0) AS BIGINT)"
        ).alias("abandonment_ppm"),
    )


_BEHAVIOR_ENTROPY_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
), p AS (
  SELECT user_id,
         CAST(SUM(n) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         list_reduce(
           list_prepend(0.0::DOUBLE,
             list(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))
                  ORDER BY event_type)),
           (acc, t) -> acc + t) AS sum_nlnn
  FROM c GROUP BY user_id
)
SELECT user_id, n_events, n_types,
       ROUND(ln(CAST(n_events AS DOUBLE))
         - sum_nlnn / CAST(n_events AS DOUBLE), 6) AS entropy_nats,
       CASE WHEN n_types > 1 THEN
         ROUND((ln(CAST(n_events AS DOUBLE))
            - sum_nlnn / CAST(n_events AS DOUBLE))
           / ln(CAST(n_types AS DOUBLE)), 6)
       END AS evenness
FROM p ORDER BY user_id
"""


@register("behavior_entropy", _BEHAVIOR_ENTROPY_ORACLE)
def behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type mix (plus Pielou
    evenness H/ln(k)) — the behavioral-diversity feature a churn or
    bot-detection model consumes. H = ln(N) − (Σ nᵢ·ln nᵢ)/N from EXACT
    integer type counts, with the Σ computed as a sequential fold over
    the type-sorted array (F.aggregate ↔ list_reduce) so the float
    accumulation order is pinned on both engines — a grouped double SUM
    would accumulate in partition order and break the hash oracle.

    Scale shape: two hash aggregates, both map-side combinable; the
    fold runs over ≤|event-type| elements per user (bounded, tiny).
    The reference has no information-theoretic surface (its per-user
    report is count/sum only, reference: scripts/build_user_metrics.py)."""
    ev = read_events(spark, sf_dir)
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    n_d = F.col("n_events").cast("double")
    k_d = F.col("n_types").cast("double")
    h = F.log(n_d) - F.col("sum_nlnn") / n_d
    return (
        c.groupBy("user_id")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_types"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("event_type", "n"))
                ),
                F.lit(0.0),
                lambda acc, t: acc
                + t["n"].cast("double") * F.log(t["n"].cast("double")),
            ).alias("sum_nlnn"),
        )
        .select(
            "user_id",
            "n_events",
            "n_types",
            # ROUND(6) rides over the last-ulp ln() divergence between
            # Java Math.log and libm (ln(74) differs by 1 ulp) — the
            # same trick as value_drift_psi's ROUND(4)
            F.round(h, 6).alias("entropy_nats"),
            F.when(
                F.col("n_types") > 1, F.round(h / F.log(k_d), 6)
            ).alias("evenness"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# T135 — Time-decay multi-touch attribution (exact power-of-two weights)
# ---------------------------------------------------------------------------

_TIME_DECAY_ATTR_ORACLE = """
WITH p AS (
  SELECT user_id, ts AS p_ts, event_id AS p_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, ts AS t_ts, event_id AS t_id, event_type
  FROM events WHERE event_type IN ('view', 'click', 'add_to_cart')
),
j AS (
  SELECT p.p_id, p.cents, t.t_ts, t.t_id, t.event_type AS channel,
         CASE WHEN t.t_id IS NULL THEN NULL
              ELSE 1 << CAST(7 - date_diff('second', t.t_ts, p.p_ts) // 86400
                             AS INTEGER) END AS w
  FROM p LEFT JOIN t
    ON t.user_id = p.user_id
   AND t.t_ts < p.p_ts
   AND t.t_ts >= p.p_ts - INTERVAL 7 DAY
),
r AS (
  SELECT p_id, cents, t_id, channel, w,
         CASE WHEN t_id IS NULL THEN NULL
              ELSE ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_ts DESC, t_id)
         END AS rk,
         SUM(w) OVER (PARTITION BY p_id) AS tw
  FROM j
),
b AS (
  SELECT p_id, cents, t_id, channel, rk,
         CASE WHEN t_id IS NULL THEN cents * 1000000
              ELSE (cents * 1000000 * w) // tw END AS base
  FROM r
),
s AS (
  SELECT COALESCE(channel, '(none)') AS channel, p_id,
         base + CASE WHEN t_id IS NOT NULL AND
                          rk <= cents * 1000000
                                - SUM(base) OVER (PARTITION BY p_id)
                     THEN 1 ELSE 0 END AS share_micro,
         CASE WHEN t_id IS NULL THEN 0 ELSE 1 END AS is_touch
  FROM b
)
SELECT channel,
       CAST(SUM(share_micro) AS BIGINT) AS attributed_microcents,
       ROUND(SUM(share_micro) / 100000000.0, 2) AS attributed_revenue,
       CAST(COUNT(DISTINCT p_id) AS BIGINT) AS conversions,
       CAST(SUM(is_touch) AS BIGINT) AS touches
FROM s GROUP BY 1 ORDER BY 1
"""


@register("time_decay_attribution", _TIME_DECAY_ATTR_ORACLE)
def time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T135: time-decay multi-touch attribution over the 7-day lookback —
    recent touches earn exponentially more credit with a one-day
    half-life. The decay weights are EXACT powers of two (w = 2^(7−Δdays),
    Δdays = whole days between touch and purchase), so the proportional
    split is pure integer arithmetic at micro-cent grain with
    largest-remainder completion ordered most-recent-first: revenue is
    conserved to the micro-cent and both engines replay the identical
    divisions (the conventional exp(−λΔt) weights would make every
    per-channel sum an order-dependent float accumulation). Same
    per-user-bounded join shape as `linear_attribution`; completes the
    attribution family (first-touch / linear / time-decay)."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = ev.where(
        F.col("event_type").isin("view", "click", "add_to_cart")
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("channel"),
    )
    j = p.join(
        t,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
        "left",
    ).select(
        "p_id",
        "cents",
        "t_ts",
        "t_id",
        "channel",
        F.when(
            F.col("t_id").isNotNull(),
            # shiftleft() takes a plain int for numBits → spell it in SQL
            F.expr(
                "cast(shiftleft(1, cast(7 - ((unix_timestamp(p_ts)"
                " - unix_timestamp(t_ts)) div 86400) as int)) as bigint)"
            ),
        ).alias("w"),
    )
    wrk = Window.partitionBy("p_id").orderBy(F.desc("t_ts"), "t_id")
    r = j.select(
        "p_id",
        "cents",
        "t_id",
        "channel",
        "w",
        F.when(F.col("t_id").isNotNull(), F.row_number().over(wrk)).alias("rk"),
        F.sum("w").over(Window.partitionBy("p_id")).alias("tw"),
    )
    base = F.when(
        F.col("t_id").isNull(), F.col("cents") * 1000000
    ).otherwise(F.expr("(cents * 1000000 * w) div tw"))
    b = r.select("p_id", "cents", "t_id", "channel", "rk", base.alias("base"))
    leftover = F.col("cents") * 1000000 - F.sum("base").over(
        Window.partitionBy("p_id")
    )
    share = F.col("base") + F.when(
        F.col("t_id").isNotNull() & (F.col("rk") <= leftover), 1
    ).otherwise(0)
    s_df = b.select(
        F.coalesce("channel", F.lit("(none)")).alias("channel"),
        "p_id",
        share.alias("share_micro"),
        F.when(F.col("t_id").isNull(), 0).otherwise(1).alias("is_touch"),
    )
    return (
        s_df.groupBy("channel")
        .agg(
            F.sum("share_micro").cast("long").alias("attributed_microcents"),
            F.round(F.sum("share_micro") / 100000000.0, 2).alias(
                "attributed_revenue"
            ),
            F.count_distinct("p_id").alias("conversions"),
            F.sum("is_touch").cast("long").alias("touches"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# T136 — Absorbing-Markov funnel conversion probabilities
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, CAST(ts AS DATE) AS d, event_type, ts, event_id
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
tr AS (
  SELECT event_type AS cur,
         COALESCE(LEAD(event_type) OVER (PARTITION BY user_id, d
                                         ORDER BY ts, event_id),
                  'end') AS nxt
  FROM seq
),
c AS (
  SELECT
    CAST(SUM(CASE WHEN cur = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS tv,
    CAST(SUM(CASE WHEN cur = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS tc,
    CAST(SUM(CASE WHEN cur = 'view' AND nxt = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS vv,
    CAST(SUM(CASE WHEN cur = 'view' AND nxt = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS vc,
    CAST(SUM(CASE WHEN cur = 'view' AND nxt = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS vp,
    CAST(SUM(CASE WHEN cur = 'click' AND nxt = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cv,
    CAST(SUM(CASE WHEN cur = 'click' AND nxt = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cc,
    CAST(SUM(CASE WHEN cur = 'click' AND nxt = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cp
  FROM tr WHERE cur <> 'purchase'
),
p AS (
  SELECT tv, tc,
         CAST(vv AS DOUBLE) / CAST(tv AS DOUBLE) AS pvv,
         CAST(vc AS DOUBLE) / CAST(tv AS DOUBLE) AS pvc,
         CAST(vp AS DOUBLE) / CAST(tv AS DOUBLE) AS pvp,
         CAST(cv AS DOUBLE) / CAST(tc AS DOUBLE) AS pcv,
         CAST(cc AS DOUBLE) / CAST(tc AS DOUBLE) AS pcc,
         CAST(cp AS DOUBLE) / CAST(tc AS DOUBLE) AS pcp
  FROM c
)
SELECT tv AS view_transitions, tc AS click_transitions,
       ROUND(pvv, 6) AS p_view_view, ROUND(pvc, 6) AS p_view_click,
       ROUND(pvp, 6) AS p_view_purchase,
       ROUND(pcv, 6) AS p_click_view, ROUND(pcc, 6) AS p_click_click,
       ROUND(pcp, 6) AS p_click_purchase,
       ROUND((pvp * (1.0 - pcc) + pvc * pcp)
             / ((1.0 - pvv) * (1.0 - pcc) - pvc * pcv), 6) AS absorb_view,
       ROUND((pcp * (1.0 - pvv) + pcv * pvp)
             / ((1.0 - pvv) * (1.0 - pcc) - pvc * pcv), 6) AS absorb_click
FROM p
"""


@register("markov_absorption", _MARKOV_ORACLE)
def markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T136: absorbing-Markov-chain funnel — the eventual purchase
    probability from each funnel state, not just the one-step rates the
    daily funnel reports. Sessions are (user, day) event sequences over
    the funnel alphabet {view, click, purchase}; purchase absorbs
    (post-purchase transitions are dropped), session end is the dropout
    absorber. With two transient states the fundamental-matrix solve
    (I−Q)⁻¹R is closed-form:
    absorb(v) = [p_vp(1−p_cc) + p_vc·p_cp] / [(1−p_vv)(1−p_cc) − p_vc·p_cv]
    — a fixed expression tree over six single-division transition
    probabilities from exact BIGINT counts, so both engines produce
    identical doubles. One LEAD window per (user, day) + one scalar
    aggregate; nothing grows beyond the event pass."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    seq = ev.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_date", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id", "event_date").orderBy("ts", "event_id")
    tr = seq.select(
        F.col("event_type").alias("cur"),
        F.coalesce(F.lead("event_type").over(w), F.lit("end")).alias("nxt"),
    ).where(F.col("cur") != "purchase")

    def _n(cur, nxt=None):
        cond = F.col("cur") == cur
        if nxt is not None:
            cond = cond & (F.col("nxt") == nxt)
        return F.sum(cond.cast("int")).cast("long")

    c = tr.agg(
        _n("view").alias("tv"),
        _n("click").alias("tc"),
        _n("view", "view").alias("vv"),
        _n("view", "click").alias("vc"),
        _n("view", "purchase").alias("vp"),
        _n("click", "view").alias("cv"),
        _n("click", "click").alias("cc"),
        _n("click", "purchase").alias("cp"),
    )
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    pvv, pvc, pvp = d("vv") / d("tv"), d("vc") / d("tv"), d("vp") / d("tv")
    pcv, pcc, pcp = d("cv") / d("tc"), d("cc") / d("tc"), d("cp") / d("tc")
    det = (F.lit(1.0) - pvv) * (F.lit(1.0) - pcc) - pvc * pcv
    return c.select(
        F.col("tv").alias("view_transitions"),
        F.col("tc").alias("click_transitions"),
        F.round(pvv, 6).alias("p_view_view"),
        F.round(pvc, 6).alias("p_view_click"),
        F.round(pvp, 6).alias("p_view_purchase"),
        F.round(pcv, 6).alias("p_click_view"),
        F.round(pcc, 6).alias("p_click_click"),
        F.round(pcp, 6).alias("p_click_purchase"),
        F.round((pvp * (F.lit(1.0) - pcc) + pvc * pcp) / det, 6).alias(
            "absorb_view"
        ),
        F.round((pcp * (F.lit(1.0) - pvv) + pcv * pvp) / det, 6).alias(
            "absorb_click"
        ),
    )


# ---------------------------------------------------------------------------
# T139 — Position-based (U-shaped) multi-touch attribution
# ---------------------------------------------------------------------------

_POSITION_ATTR_ORACLE = """
WITH p AS (
  SELECT user_id, ts AS p_ts, event_id AS p_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, ts AS t_ts, event_id AS t_id, event_type
  FROM events WHERE event_type IN ('view', 'click', 'add_to_cart')
),
j AS (
  SELECT p.p_id, p.cents, t.t_ts, t.t_id, t.event_type AS channel
  FROM p LEFT JOIN t
    ON t.user_id = p.user_id
   AND t.t_ts < p.p_ts
   AND t.t_ts >= p.p_ts - INTERVAL 7 DAY
),
r AS (
  SELECT p_id, cents, t_id, channel,
         CASE WHEN t_id IS NULL THEN NULL
              ELSE ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_ts, t_id)
         END AS rk,
         COUNT(t_id) OVER (PARTITION BY p_id) AS n
  FROM j
),
s AS (
  SELECT COALESCE(channel, '(none)') AS channel, p_id,
         CASE
           WHEN t_id IS NULL THEN cents * 1000000
           WHEN n = 1 THEN cents * 1000000
           WHEN n = 2 THEN (cents * 1000000) // 2
           WHEN rk = 1 OR rk = n THEN (cents * 1000000 * 40) // 100
           ELSE (cents * 1000000
                 - 2 * ((cents * 1000000 * 40) // 100)) // (n - 2)
                + CASE WHEN rk - 1 <= (cents * 1000000
                                       - 2 * ((cents * 1000000 * 40) // 100))
                                      % (n - 2)
                       THEN 1 ELSE 0 END
         END AS share_micro,
         CASE WHEN t_id IS NULL THEN 0 ELSE 1 END AS is_touch
  FROM r
)
SELECT channel,
       CAST(SUM(share_micro) AS BIGINT) AS attributed_microcents,
       ROUND(SUM(share_micro) / 100000000.0, 2) AS attributed_revenue,
       CAST(COUNT(DISTINCT p_id) AS BIGINT) AS conversions,
       CAST(SUM(is_touch) AS BIGINT) AS touches
FROM s GROUP BY 1 ORDER BY 1
"""


@register("position_attribution", _POSITION_ATTR_ORACLE)
def position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T139: position-based (U-shaped) multi-touch attribution over the
    7-day lookback — 40 % to the first touch, 40 % to the last, the
    middle touches splitting the remaining 20 % equally; single-touch
    paths take 100 %, two-touch paths 50/50. Every split is exact
    integer micro-cent arithmetic: the first/last 40 % shares are one
    floor division each, the middle pool is the exact remainder after
    both (so the three buckets always sum to the purchase), and the
    within-pool split completes by largest remainder in touch order —
    revenue conserved to the micro-cent, both engines replaying the
    identical divisions. Completes the attribution family (first-touch
    / linear / time-decay / U-shaped). Same per-user-bounded join shape
    as `linear_attribution`."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = ev.where(
        F.col("event_type").isin("view", "click", "add_to_cart")
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("channel"),
    )
    j = p.join(
        t,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
        "left",
    )
    w = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    r = j.select(
        "p_id",
        "cents",
        "t_id",
        "channel",
        F.when(F.col("t_id").isNotNull(), F.row_number().over(w)).alias("rk"),
        F.count("t_id").over(Window.partitionBy("p_id")).alias("n"),
    )
    micro = F.col("cents") * 1000000
    end_share = F.expr("(cents * 1000000 * 40) div 100")
    mid_base = F.expr(
        "(cents * 1000000 - 2 * ((cents * 1000000 * 40) div 100)) div (n - 2)"
    )
    mid_rem = F.expr(
        "(cents * 1000000 - 2 * ((cents * 1000000 * 40) div 100)) % (n - 2)"
    )
    share = (
        F.when(F.col("t_id").isNull(), micro)
        .when(F.col("n") == 1, micro)
        # n=2 → exact 50/50: micro = cents·1e6 is always even, so the
        # halves are exact with no remainder to assign (ADVICE r10).
        .when(F.col("n") == 2, F.expr("(cents * 1000000) div 2"))
        .when((F.col("rk") == 1) | (F.col("rk") == F.col("n")), end_share)
        .otherwise(
            mid_base
            + F.when(F.col("rk") - 1 <= mid_rem, 1).otherwise(0)
        )
    )
    s_df = r.select(
        F.coalesce("channel", F.lit("(none)")).alias("channel"),
        "p_id",
        share.alias("share_micro"),
        F.when(F.col("t_id").isNull(), 0).otherwise(1).alias("is_touch"),
    )
    return (
        s_df.groupBy("channel")
        .agg(
            F.sum("share_micro").cast("long").alias("attributed_microcents"),
            F.round(F.sum("share_micro") / 100000000.0, 2).alias(
                "attributed_revenue"
            ),
            F.count_distinct("p_id").alias("conversions"),
            F.sum("is_touch").cast("long").alias("touches"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# T145 — gap-allowed sequential pattern support (a ... b within a session)
# ---------------------------------------------------------------------------

_SUBSEQ_ORACLE = """
WITH pos AS (
  SELECT user_id, CAST(ts AS DATE) AS d, event_type,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS p
  FROM events
),
per AS (
  SELECT user_id, d, event_type,
         MIN(p) AS min_p, MAX(p) AS max_p
  FROM pos GROUP BY user_id, d, event_type
),
tot AS (
  SELECT CAST(COUNT(DISTINCT (user_id, d)) AS BIGINT) AS s FROM pos
),
sup AS (
  SELECT a.event_type AS ante, b.event_type AS cons,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM per a JOIN per b ON a.user_id = b.user_id AND a.d = b.d
  WHERE a.min_p < b.max_p
  GROUP BY 1, 2
)
SELECT ante, cons, support,
       ROUND(support * 100.0 / tot.s, 4) AS support_pct
FROM sup, tot
ORDER BY support DESC, ante, cons
LIMIT 25
"""


@register("subsequence_support", _SUBSEQ_ORACLE)
def subsequence_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T145: gap-allowed sequential-pattern support — for every ordered
    event-type pair (a, b), the number of (user, day) sessions
    containing an occurrence of a STRICTLY BEFORE some occurrence of b,
    any gap allowed (the 2-item core of PrefixSpan-style sequence
    mining; `pattern_frequency` by contrast counts only contiguous
    whole-session strings). The exists-subsequence test collapses to
    min_pos(a) < max_pos(b) — one per-(session, type) min/max aggregate
    and a session-keyed self-join bounded by ≤|catalog|² rows per
    session, never a positional blow-up; the (a, b) support aggregate
    is map-side combinable. a = b counts sessions with a repeat
    (min < max ⟺ ≥2 occurrences)."""
    from pyspark.sql import Window

    events = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_date").orderBy("ts", "event_id")
    pos = events.select(
        "user_id",
        "event_date",
        "event_type",
        F.row_number().over(w).alias("p"),
    )
    per = pos.groupBy("user_id", "event_date", "event_type").agg(
        F.min("p").alias("min_p"), F.max("p").alias("max_p")
    )
    tot = pos.select("user_id", "event_date").distinct().agg(
        F.count("*").cast("long").alias("s")
    )
    a = per.select(
        F.col("user_id").alias("ua"),
        F.col("event_date").alias("da"),
        F.col("event_type").alias("ante"),
        "min_p",
    )
    b = per.select(
        F.col("user_id").alias("ub"),
        F.col("event_date").alias("db"),
        F.col("event_type").alias("cons"),
        "max_p",
    )
    sup = (
        a.join(
            b,
            (F.col("ua") == F.col("ub"))
            & (F.col("da") == F.col("db"))
            & (F.col("min_p") < F.col("max_p")),
        )
        .groupBy("ante", "cons")
        .agg(F.count("*").cast("long").alias("support"))
    )
    return (
        sup.crossJoin(F.broadcast(tot))
        .select(
            "ante",
            "cons",
            "support",
            F.round(F.col("support") * 100.0 / F.col("s"), 4).alias(
                "support_pct"
            ),
        )
        .orderBy(F.desc("support"), "ante", "cons")
        .limit(25)
    )
