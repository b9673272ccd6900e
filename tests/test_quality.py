"""Q1–Q7 quality-check semantics, mirroring the reference's test scenarios
(reference: tests/test_validate_quality.py)."""

from __future__ import annotations

from ecommerce_event_pipeline_spark.quality.checks import QualityValidator

from .conftest import events_df, make_event


def _report(spark, rows):
    rep = QualityValidator(events_df(spark, rows)).run_all().collect()
    return {r["check_name"]: r for r in rep}


def test_all_checks_pass_on_valid_session(spark, valid_session_rows):
    rep = _report(spark, valid_session_rows)
    assert len(rep) == 7
    assert all(r["status"] == "PASS" for r in rep.values())
    assert all(r["failed_records"] == 0 for r in rep.values())


def test_q1_empty_string_fails_common_field_counts_per_field(spark):
    rows = [make_event("page_view", user_id="", page_url=None)]
    rep = _report(spark, rows)
    # two violated fields on one row → 2 failures (per-field counting):
    # empty user_id (falsy common field) + NULL page_url (page_view-required)
    assert rep["q1_required_fields"]["failed_records"] == 2


def test_q1_platform_not_required_by_validator(spark):
    # the JSON Schema requires platform/device_type but the validator's
    # REQUIRED_FIELDS does NOT (reference: scripts/validate_quality.py:57-58)
    rows = [make_event("page_view", platform="", device_type=None)]
    rep = _report(spark, rows)
    assert rep["q1_required_fields"]["failed_records"] == 0


def test_q1_type_specific_field_null(spark):
    rows = [make_event("purchase", order_id=None)]
    rep = _report(spark, rows)
    assert rep["q1_required_fields"]["failed_records"] == 1


def test_q1_click_requires_page_url(spark):
    rows = [make_event("click", page_url=None)]
    rep = _report(spark, rows)
    assert rep["q1_required_fields"]["failed_records"] == 1


def test_q6_null_item_fields_fail(spark):
    payload = (
        '{"products": [{"product_id": "P1", "quantity": null, "unit_price": 100.0}],'
        ' "discount_amount": 0.0, "shipping_fee": 0.0, "coupon_code": null}'
    )
    rows = [make_event("purchase", extra_data=payload, total_amount=100.0)]
    rep = _report(spark, rows)
    # the reference raises TypeError on a null item field → counts as failure
    assert rep["q6_order_amount"]["failed_records"] == 1


def test_q2_duplicate_count_is_n_minus_distinct(spark):
    dup = make_event("page_view", event_id="same-id")
    rows = [dup, dict(dup), dict(dup)]
    rep = _report(spark, rows)
    assert rep["q2_duplicate_event_id"]["failed_records"] == 2


def test_q3_range_violations_count_per_rule(spark):
    rows = [
        make_event("add_to_cart", quantity=0),          # qty out of range
        make_event("add_to_cart", unit_price=-5.0),     # price out of range
        make_event("purchase", total_amount=2e8),       # amount too large
        make_event("search", result_count=-1),          # negative results
        make_event("hover"),                            # unknown type
    ]
    rep = _report(spark, rows)
    assert rep["q3_value_range"]["failed_records"] == 5


def test_q4_purchase_without_cart_fails_session(spark):
    rows = [
        make_event("page_view", timestamp="2026-01-15T10:00:00"),
        make_event("purchase", timestamp="2026-01-15T10:01:00"),
    ]
    rep = _report(spark, rows)
    assert rep["q4_funnel_sequence"]["failed_records"] == 1
    assert rep["q4_funnel_sequence"]["total_records"] == 1  # denominator = sessions


def test_q4_cart_without_prior_view_fails(spark):
    rows = [
        make_event("add_to_cart", timestamp="2026-01-15T10:00:00"),
        make_event("page_view", timestamp="2026-01-15T10:01:00"),
    ]
    rep = _report(spark, rows)
    assert rep["q4_funnel_sequence"]["failed_records"] == 1


def test_q4_purchase_check_is_order_insensitive(spark):
    # cart AFTER purchase: purchase-check passes (cart exists anywhere),
    # but the cart still needs a prior view → this session passes only
    # because page_view precedes the cart
    rows = [
        make_event("page_view", timestamp="2026-01-15T10:00:00"),
        make_event("purchase", timestamp="2026-01-15T10:01:00"),
        make_event("add_to_cart", timestamp="2026-01-15T10:02:00"),
    ]
    rep = _report(spark, rows)
    assert rep["q4_funnel_sequence"]["failed_records"] == 0


def test_q5_timestamp_year_bounds(spark):
    rows = [
        make_event("page_view", timestamp="2019-12-31T23:59:59"),
        make_event("page_view", timestamp="2031-01-01T00:00:00"),
        make_event("page_view", timestamp="not-a-timestamp"),
    ]
    rep = _report(spark, rows)
    assert rep["q5_timestamp_validity"]["failed_records"] == 3


def test_q6_amount_integrity_tolerance_of_one(spark):
    payload = (
        '{"products": [{"product_id": "P1", "quantity": 2, "unit_price": 100.0}],'
        ' "discount_amount": 10.0, "shipping_fee": 5.0, "coupon_code": null}'
    )
    ok = make_event("purchase", extra_data=payload, total_amount=195.5)  # |diff| ≤ 1
    bad = make_event("purchase", extra_data=payload, total_amount=300.0)
    rep = _report(spark, [ok, bad])
    assert rep["q6_order_amount"]["failed_records"] == 1
    assert rep["q6_order_amount"]["total_records"] == 2  # denominator = purchases


def test_q7_device_rule_and_session_platform_switch(spark):
    rows = [
        make_event("page_view", platform="ios", device_type="desktop",
                   timestamp="2026-01-15T10:00:00"),
        make_event("page_view", platform="web", device_type="desktop",
                   session_id="s9", timestamp="2026-01-15T11:00:00"),
        make_event("click", platform="android", device_type="mobile",
                   session_id="s9", timestamp="2026-01-15T11:01:00"),
    ]
    rep = _report(spark, rows)
    # 1 per-row violation (ios+desktop) + 1 mid-session platform switch
    assert rep["q7_platform_consistency"]["failed_records"] == 2


def test_gate_fails_below_threshold(spark):
    # 1 bad of 2 rows → 50% pass rate → FAIL → gate False
    rows = [
        make_event("page_view"),
        make_event("page_view", timestamp="1999-01-01T00:00:00"),
    ]
    assert QualityValidator(events_df(spark, rows)).gate() is False


def test_gate_passes_on_clean_data(spark, valid_session_rows):
    assert QualityValidator(events_df(spark, valid_session_rows)).gate() is True


def test_empty_check_population_passes(spark):
    # a day with zero purchases: Q6's denominator is 0 → the reference
    # floors it at 1 (pass rate 100), never a NULL-rate FAIL
    rows = [make_event("page_view"), make_event("click")]
    rep = _report(spark, rows)
    assert rep["q6_order_amount"]["total_records"] == 0
    assert rep["q6_order_amount"]["pass_rate"] == 100.0
    assert rep["q6_order_amount"]["status"] == "PASS"


def test_q4_tied_timestamp_view_ordered_before_cart_passes(spark):
    """Positional "before": a page_view sharing the cart's timestamp but
    ordered ahead of it (event_id tiebreak standing in for the reference's
    stable input order) satisfies the funnel — a raw ts >= compare would
    wrongly fail the session."""
    ts = "2026-01-15T10:00:00"
    rows = [
        make_event("page_view", event_id="a-view", timestamp=ts),
        make_event("add_to_cart", event_id="b-cart", timestamp=ts),
    ]
    rep = _report(spark, rows)
    assert rep["q4_funnel_sequence"]["failed_records"] == 0


def test_q6_empty_string_payload_is_skipped_not_failed(spark):
    # reference gates on `if extra:` — falsy '' payload is skipped entirely
    rows = [make_event("purchase", extra_data="", total_amount=100.0)]
    rep = _report(spark, rows)
    assert rep["q6_order_amount"]["failed_records"] == 0


def test_quality_trend_counts_null_timestamp_rows(spark):
    import datetime as dt

    from ecommerce_event_pipeline_spark.quality.checks import (
        fixture_quality_trend,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, dt.datetime(2024, 1, 10, 12), 7, "view", 1.0),
        (2, dt.datetime(2024, 1, 10, 13), 7, "click", 2.0),
        (3, None, 7, "view", 3.0),  # NULL ts — must not vanish
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).withColumn("event_date", F.to_date("ts"))
    out = fixture_quality_trend(events, days=7).collect()
    by = {(str(r["check_date"]), r["check_name"]): r for r in out}
    ts_row = by[("2024-01-10", "timestamp_validity")]
    assert ts_row["total_records"] == 3
    assert ts_row["failed_records"] == 1
    assert ts_row["status"] == "FAIL"  # 66.67 < 99 threshold
    null_row = by[("2024-01-10", "null_required_fields")]
    assert null_row["failed_records"] == 1
