"""Mart operator semantics on handcrafted micro-fixtures (SURVEY §2.4/§2.5)."""

from __future__ import annotations

from ecommerce_event_pipeline_spark.operators import marts
from ecommerce_event_pipeline_spark.schemas import FUNNEL_STEPS

from .conftest import events_df, make_event


def test_funnel_conversion_counts_distinct_users_per_step(spark):
    rows = []
    # 3 viewers, 2 clickers, 1 cart, 1 purchaser on one day/platform
    for i, steps in enumerate(
        [
            ("page_view",),
            ("page_view", "click"),
            ("page_view", "click", "add_to_cart", "purchase"),
        ]
    ):
        for j, s in enumerate(steps):
            rows.append(
                make_event(
                    s,
                    user_id=f"U00000{i}",
                    session_id=f"s{i}",
                    timestamp=f"2026-01-15T10:0{j}:00",
                )
            )
    # duplicate events by the same user must not inflate distinct counts
    rows.append(
        make_event("page_view", user_id="U000000", session_id="s0",
                   timestamp="2026-01-15T11:00:00")
    )
    out = marts.funnel_conversion(
        events_df(spark, rows), steps=FUNNEL_STEPS,
        group_cols=("event_date", "platform"),
    ).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["step1_page_view_users"] == 3
    assert r["step2_click_users"] == 2
    assert r["step3_add_to_cart_users"] == 1
    assert r["step4_purchase_users"] == 1
    assert r["page_view_to_click_rate"] == 66.67
    assert r["click_to_add_to_cart_rate"] == 50.0
    assert r["add_to_cart_to_purchase_rate"] == 100.0
    assert r["overall_conversion_rate"] == 33.33


def test_funnel_conversion_zero_denominator_yields_null(spark):
    rows = [make_event("purchase")]
    r = marts.funnel_conversion(
        events_df(spark, rows), steps=FUNNEL_STEPS, group_cols=("event_date",)
    ).collect()[0]
    assert r["page_view_to_click_rate"] is None
    assert r["overall_conversion_rate"] is None


def test_hourly_traffic_groups_by_hour(spark):
    rows = [
        make_event("page_view", timestamp="2026-01-15T09:30:00", user_id="U1"),
        make_event("page_view", timestamp="2026-01-15T09:45:00", user_id="U1"),
        make_event("click", timestamp="2026-01-15T10:15:00", user_id="U2"),
    ]
    out = {
        (r["event_hour"]): r
        for r in marts.hourly_traffic(
            events_df(spark, rows), group_cols=("event_date", "event_hour")
        ).collect()
    }
    assert out[9]["event_count"] == 2 and out[9]["unique_users"] == 1
    assert out[10]["event_count"] == 1 and out[10]["unique_users"] == 1


def test_user_daily_amount_and_duration(spark):
    rows = [
        make_event("page_view", timestamp="2026-01-15T10:00:00"),
        make_event("purchase", timestamp="2026-01-15T10:10:30", total_amount=500.0),
        make_event("purchase", timestamp="2026-01-15T10:20:00", total_amount=250.0),
    ]
    r = marts.user_daily(
        events_df(spark, rows),
        event_types=("page_view", "click", "add_to_cart", "purchase", "search"),
    ).collect()[0]
    assert r["page_view_count"] == 1
    assert r["purchase_count"] == 2
    assert r["total_purchase_amount"] == 750.0
    assert r["session_duration_seconds"] == 20 * 60
    assert r["session_count"] == 1


def test_user_daily_no_purchase_coalesces_to_zero(spark):
    rows = [make_event("page_view")]
    r = marts.user_daily(
        events_df(spark, rows), event_types=("page_view", "purchase")
    ).collect()[0]
    assert r["total_purchase_amount"] == 0.0


def test_session_sequences_order_and_flags(spark, valid_session_rows):
    out = marts.session_sequences(events_df(spark, valid_session_rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["event_sequence"] == "page_view -> click -> add_to_cart -> purchase -> search"
    assert r["has_purchase"] is True
    assert r["event_count"] == 5
    assert r["duration_seconds"] == 240


def test_session_sequences_tiebreak_is_deterministic(spark):
    # two events at the identical timestamp — event_id breaks the tie
    rows = [
        make_event("click", event_id="a", timestamp="2026-01-15T10:00:00"),
        make_event("page_view", event_id="b", timestamp="2026-01-15T10:00:00"),
    ]
    seq = marts.session_sequences(events_df(spark, rows)).collect()[0]["event_sequence"]
    assert seq == "click -> page_view"  # 'a' < 'b'


def test_pattern_frequency_rates(spark, valid_session_rows):
    no_purchase = [
        make_event("page_view", session_id="s2", user_id="U000002",
                   timestamp="2026-01-15T12:00:00"),
        make_event("click", session_id="s2", user_id="U000002",
                   timestamp="2026-01-15T12:04:00"),
    ]
    sessions = marts.session_sequences(
        events_df(spark, valid_session_rows + no_purchase)
    )
    out = {r["event_sequence"]: r for r in marts.pattern_frequency(sessions).collect()}
    assert out["page_view -> click"]["purchase_rate"] == 0.0
    full = "page_view -> click -> add_to_cart -> purchase -> search"
    assert out[full]["purchase_rate"] == 100.0
    assert out[full]["avg_duration_seconds"] == 240.0


def test_user_lifetime_incremental_equals_full(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from ecommerce_event_pipeline_spark.operators import marts as m

    rows = [
        (i, dt.datetime(2024, 1, 1 + (i % 9), 8 + (i % 10)), i % 5, float(i % 7))
        for i in range(200)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    cutoff = F.lit("2024-01-05").cast("date")
    base = m.user_lifetime_partials(events.where(F.to_date("ts") < cutoff))
    delta = m.user_lifetime_partials(events.where(F.to_date("ts") >= cutoff))
    inc = m.user_lifetime_rollup(base.unionByName(delta)).collect()
    full = m.user_lifetime_rollup(m.user_lifetime_partials(events)).collect()
    assert [tuple(r) for r in inc] == [tuple(r) for r in full]
    assert inc[0]["active_days"] > 1


def test_traffic_rollup_gid_disambiguates_null_keys(spark):
    """A genuine NULL grouping key must be separable from a subtotal row:
    gid bit set only for aggregated columns."""
    import datetime as dt

    from ecommerce_event_pipeline_spark.operators import olap

    d = dt.date(2024, 1, 1)
    df = spark.createDataFrame(
        [(d, "view"), (d, None), (d, "view")],
        "event_date date, event_type string",
    )
    rows = {
        (r["event_date"], r["event_type"], r["gid"]): r["event_count"]
        for r in olap.traffic_rollup(df).collect()
    }
    assert rows[(d, "view", 0)] == 2       # detail row
    assert rows[(d, None, 0)] == 1         # genuine NULL key, gid=0
    assert rows[(d, None, 1)] == 3         # per-date subtotal, gid=1
    assert rows[(None, None, 3)] == 3      # grand total, gid=3


def test_linear_attribution_conserves_revenue(spark):
    """Largest-remainder cent allocation must conserve total purchase
    revenue exactly: sum of attributed_revenue across channels (incl.
    '(none)') == total purchase value, to the cent."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    from ecommerce_event_pipeline_spark.sources.readers import read_events

    sf = "/root/testdata/sf0.001"
    out = e.queries()["linear_attribution"](spark, sf).collect()
    attributed_cents = sum(round(r["attributed_revenue"] * 100) for r in out)
    total = (
        read_events(spark, sf)
        .where(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")))
        .collect()[0][0]
    )
    assert attributed_cents == total
