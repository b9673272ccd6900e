"""Experimentation analytics beyond the plain A/B readout: CUPED
variance-reduced uplift and UCB1 bandit arm scoring (T129/T132).

Round-10 expansion. Exactness discipline: every statistic is a closed
form over EXACT integer sufficient statistics (counts, cent sums, and
their pairwise products), cast to DOUBLE once and composed in a single
fixed expression tree mirrored verbatim in the oracle — no float
accumulation anywhere, so the driver's value hash is stable across
partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry_core import register
from ..sources.readers import read_events

# ---------------------------------------------------------------------------
# Shared experiment design: stable user_id % 2 arms, data-midpoint cutover.
# ONE definition site for the Spark expressions and the oracle CTE so the
# DiD and CUPED readouts can never silently diverge on the design
# (review r10: the block was previously copy-pasted in both).
# ---------------------------------------------------------------------------


def experiment_cells_cte(extra_cols: str = "") -> str:
    """The oracle-side ``WITH b, tagged`` prefix: per-event arm
    (user_id % 2) and post (event_date strictly after the midpoint of
    the observed date range). ``extra_cols`` appends readout-specific
    columns to the tagged CTE (leading comma included by the caller)."""
    return f"""
WITH b AS (
  SELECT min(CAST(ts AS DATE)) AS mn, max(CAST(ts AS DATE)) AS mx FROM events
),
tagged AS (
  SELECT e.user_id,
         e.event_type,
         CASE WHEN e.user_id % 2 = 1 THEN 1 ELSE 0 END AS arm,
         CASE WHEN CAST(e.ts AS DATE) >
              CAST(b.mn + (date_diff('day', b.mn, b.mx) // 2)
                   * INTERVAL 1 DAY AS DATE)
              THEN 1 ELSE 0 END AS post{extra_cols}
  FROM events e, b
)"""


def tag_experiment_cells(events: DataFrame) -> DataFrame:
    """Spark twin of ``experiment_cells_cte``: (user_id, event_type,
    value, arm, post) per event, arms by the stable ``user_id % 2``
    hash, post = event_date strictly after the data-midpoint cutover
    (integer date arithmetic, identical in both engines)."""
    b = events.agg(
        F.min("event_date").alias("mn"), F.max("event_date").alias("mx")
    )
    cutover = F.date_add(F.col("mn"), (F.datediff("mx", "mn") / 2).cast("int"))
    return events.crossJoin(F.broadcast(b)).select(
        "user_id",
        "event_type",
        "value",
        (F.col("user_id") % 2 == 1).cast("int").alias("arm"),
        (F.col("event_date") > cutover).cast("int").alias("post"),
    )


# ---------------------------------------------------------------------------
# T129 — CUPED variance-reduced uplift
# ---------------------------------------------------------------------------

_CUPED_ORACLE = experiment_cells_cte(
    """,
         CASE WHEN e.event_type = 'purchase'
              THEN CAST(ROUND(e.value * 100) AS BIGINT) ELSE 0 END AS cents"""
) + """,
per_user AS (
  SELECT user_id, arm,
         CAST(SUM(CASE WHEN post = 0 THEN cents ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN post = 1 THEN cents ELSE 0 END) AS BIGINT) AS y
  FROM tagged GROUP BY 1, 2
),
pooled AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM per_user
),
arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_a,
         CAST(SUM(x) AS BIGINT) AS sx_a, CAST(SUM(y) AS BIGINT) AS sy_a
  FROM per_user GROUP BY 1
),
wide AS (
  SELECT
    (SELECT n_a FROM arms WHERE arm = 1) AS nt,
    (SELECT sx_a FROM arms WHERE arm = 1) AS sxt,
    (SELECT sy_a FROM arms WHERE arm = 1) AS syt,
    (SELECT n_a FROM arms WHERE arm = 0) AS nc,
    (SELECT sx_a FROM arms WHERE arm = 0) AS sxc,
    (SELECT sy_a FROM arms WHERE arm = 0) AS syc,
    p.n, p.sx, p.sy, p.sxx, p.sxy, p.syy
  FROM pooled p
),
calc AS (
  SELECT nt, nc,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) AS theta,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS covn,
         (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS varxn,
         (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS varyn,
         CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE) AS myt,
         CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE) AS myc,
         CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE) AS mxt,
         CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE) AS mxc
  FROM wide
)
SELECT CAST(nt AS BIGINT) AS treat_users,
       CAST(nc AS BIGINT) AS ctrl_users,
       ROUND(theta, 6) AS theta,
       ROUND(covn * covn / NULLIF(varxn * varyn, 0.0), 6) AS rho_sq,
       ROUND(myt - myc, 4) AS raw_uplift_cents,
       ROUND((myt - myc) - theta * (mxt - mxc), 4) AS cuped_uplift_cents
FROM calc
"""


@register("cuped_uplift", _CUPED_ORACLE)
def cuped_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T129: CUPED (Controlled-experiment Using Pre-Experiment Data)
    variance-reduced uplift. Arms by the stable ``user_id % 2`` hash,
    pre/post at the data-midpoint cutover (same design as
    ``did_conversion_uplift``); the covariate x is each user's
    pre-period purchase cents, the outcome y the post-period cents.
    θ = Cov(x,y)/Var(x) and ρ² (the variance-reduction fraction) come
    from pooled integer sufficient statistics (n, Σx, Σy, Σx², Σxy, Σy²
    — all exact BIGINT sums), cast to DOUBLE once; the adjusted uplift
    is (ȳ_t − ȳ_c) − θ(x̄_t − x̄_c). One shuffle to user grain, then
    scalar aggregates — nothing beyond map-side-combinable sums at any
    scale (cent products stay < 2⁶³ for per-user spends below ~$30 B)."""
    cents = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 100).cast("long"),
    ).otherwise(F.lit(0))
    tagged = tag_experiment_cells(read_events(spark, sf_dir)).select(
        "user_id", "arm", "post", cents.alias("cents")
    )
    per_user = tagged.groupBy("user_id", "arm").agg(
        F.sum(F.when(F.col("post") == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("post") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    pooled = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    arm = lambda a, c: F.sum(F.when(F.col("arm") == a, F.col(c)).otherwise(0))  # noqa: E731
    arms = per_user.agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("nt"),
        arm(1, "x").alias("sxt"),
        arm(1, "y").alias("syt"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("nc"),
        arm(0, "x").alias("sxc"),
        arm(0, "y").alias("syc"),
    )
    wide = pooled.crossJoin(F.broadcast(arms))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    covn = d("n") * d("sxy") - d("sx") * d("sy")
    varxn = d("n") * d("sxx") - d("sx") * d("sx")
    varyn = d("n") * d("syy") - d("sy") * d("sy")
    theta = covn / F.nullif(varxn, F.lit(0.0))
    myt, myc = d("syt") / d("nt"), d("syc") / d("nc")
    mxt, mxc = d("sxt") / d("nt"), d("sxc") / d("nc")
    return wide.select(
        F.col("nt").cast("long").alias("treat_users"),
        F.col("nc").cast("long").alias("ctrl_users"),
        F.round(theta, 6).alias("theta"),
        F.round(covn * covn / F.nullif(varxn * varyn, F.lit(0.0)), 6).alias(
            "rho_sq"
        ),
        F.round(myt - myc, 4).alias("raw_uplift_cents"),
        F.round((myt - myc) - theta * (mxt - mxc), 4).alias(
            "cuped_uplift_cents"
        ),
    )


# ---------------------------------------------------------------------------
# T132 — UCB1 bandit arm scores
# ---------------------------------------------------------------------------

_UCB_ORACLE = """
WITH typed AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS arm,
         event_type
  FROM events WHERE event_type IN ('view', 'purchase')
),
arms AS (
  SELECT arm,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
           AS trials,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS successes
  FROM typed GROUP BY 1
),
tot AS (SELECT CAST(SUM(trials) AS BIGINT) AS n FROM arms)
SELECT arm, trials, successes,
       ROUND(CAST(successes AS DOUBLE) / CAST(trials AS DOUBLE), 6)
         AS mean_reward,
       ROUND(CAST(successes AS DOUBLE) / CAST(trials AS DOUBLE)
             + sqrt(2.0 * ln(CAST(tot.n AS DOUBLE)) / CAST(trials AS DOUBLE)),
             6) AS ucb_score
FROM arms, tot
ORDER BY ucb_score DESC, arm
"""


@register("ucb_arm_scores", _UCB_ORACLE)
def ucb_arm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T132: UCB1 (Upper Confidence Bound) scores per campaign arm — the
    deterministic readout a bandit scheduler consumes: mean reward plus
    the √(2·ln N / n) exploration bonus. Arms are the stable ``k % 4``
    bucket of the event payload; trials are views, rewards purchases.
    All inputs are exact integer counts; the score is a fixed
    single-op expression tree. One map-side-combinable aggregate."""
    events = read_events(spark, sf_dir)
    typed = events.where(F.col("event_type").isin("view", "purchase")).select(
        (F.get_json_object("props", "$.k").cast("long") % 4).alias("arm"),
        "event_type",
    )
    arms = typed.groupBy("arm").agg(
        F.sum((F.col("event_type") == "view").cast("int"))
        .cast("long")
        .alias("trials"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("long")
        .alias("successes"),
    )
    tot = arms.agg(F.sum("trials").cast("long").alias("n"))
    mean = F.col("successes").cast("double") / F.col("trials").cast("double")
    bonus = F.sqrt(
        F.lit(2.0) * F.log(F.col("n").cast("double"))
        / F.col("trials").cast("double")
    )
    return (
        arms.crossJoin(F.broadcast(tot))
        .select(
            "arm",
            "trials",
            "successes",
            F.round(mean, 6).alias("mean_reward"),
            F.round(mean + bonus, 6).alias("ucb_score"),
        )
        .orderBy(F.desc("ucb_score"), "arm")
    )


# ---------------------------------------------------------------------------
# T137 — p-chart SPC screen on the daily error rate
# ---------------------------------------------------------------------------

_PCHART_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS event_date,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS errors
  FROM events GROUP BY 1
),
pooled AS (
  SELECT CAST(SUM(errors) AS BIGINT) AS te, CAST(SUM(n) AS BIGINT) AS tn
  FROM daily
),
lim AS (
  SELECT d.event_date, d.n, d.errors,
         CAST(d.errors AS DOUBLE) / CAST(d.n AS DOUBLE) AS p,
         CAST(p0.te AS DOUBLE) / CAST(p0.tn AS DOUBLE) AS pbar,
         3.0 * sqrt(CAST(p0.te AS DOUBLE) / CAST(p0.tn AS DOUBLE)
                    * (1.0 - CAST(p0.te AS DOUBLE) / CAST(p0.tn AS DOUBLE))
                    / CAST(d.n AS DOUBLE)) AS width
  FROM daily d, pooled p0
)
SELECT event_date, n, errors,
       ROUND(p, 6) AS error_rate,
       ROUND(pbar + width, 6) AS ucl,
       ROUND(GREATEST(pbar - width, 0.0), 6) AS lcl,
       CASE WHEN p > pbar + width OR p < GREATEST(pbar - width, 0.0)
            THEN 1 ELSE 0 END AS out_of_control
FROM lim
ORDER BY event_date
"""


@register("error_rate_pchart", _PCHART_ORACLE)
def error_rate_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T137: Shewhart p-chart over the daily error-event share — the
    statistical-process-control screen an operations team runs on a
    telemetry stream: pooled center line p̄, per-day 3σ binomial control
    limits p̄ ± 3·√(p̄(1−p̄)/n_t), and an out-of-control flag. Every
    double is a fixed single-op tree over two exact BIGINT sums and the
    per-day counts, so the flag comparisons agree across engines. One
    day-grain aggregate + a broadcast pooled scalar; calendar-bounded
    output."""
    events = read_events(spark, sf_dir)
    daily = events.groupBy("event_date").agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("event_type") == "error").cast("int"))
        .cast("long")
        .alias("errors"),
    )
    pooled = daily.agg(
        F.sum("errors").cast("long").alias("te"),
        F.sum("n").cast("long").alias("tn"),
    )
    p = F.col("errors").cast("double") / F.col("n").cast("double")
    pbar = F.col("te").cast("double") / F.col("tn").cast("double")
    width = F.lit(3.0) * F.sqrt(
        pbar * (F.lit(1.0) - pbar) / F.col("n").cast("double")
    )
    lcl = F.greatest(pbar - width, F.lit(0.0))
    return (
        daily.crossJoin(F.broadcast(pooled))
        .select(
            "event_date",
            "n",
            "errors",
            F.round(p, 6).alias("error_rate"),
            F.round(pbar + width, 6).alias("ucl"),
            F.round(lcl, 6).alias("lcl"),
            F.when((p > pbar + width) | (p < lcl), 1)
            .otherwise(0)
            .alias("out_of_control"),
        )
        .orderBy("event_date")
    )
