"""JSON-payload path: lateral unnest, union, product/order marts (SURVEY §2.3 J1/J2, §2.4 A3/A7/A8)."""

from __future__ import annotations

from ecommerce_event_pipeline_spark.operators import products

from .conftest import events_df, make_event

TWO_ITEM_PAYLOAD = (
    '{"products": [{"product_id": "P1001", "quantity": 2, "unit_price": 100.0},'
    ' {"product_id": "P1002", "quantity": 1, "unit_price": 50.0}],'
    ' "discount_amount": 10.0, "shipping_fee": 5.0, "coupon_code": "C1"}'
)


def test_product_interactions_unions_direct_and_unnested(spark):
    rows = [
        make_event("click", product_id="P1001"),
        make_event("add_to_cart", product_id="P1002"),
        make_event("purchase", extra_data=TWO_ITEM_PAYLOAD),
    ]
    out = products.product_interactions(events_df(spark, rows)).collect()
    # 1 click + 1 cart + 2 unnested purchase items
    assert len(out) == 4
    purchase_items = {r["product_id"]: r for r in out if r["event_type"] == "purchase"}
    assert purchase_items["P1001"]["quantity"] == 2
    assert purchase_items["P1002"]["unit_price"] == 50.0


def test_product_daily_revenue_and_conversion(spark):
    rows = [
        make_event("click", product_id="P1001", user_id="U1"),
        make_event("click", product_id="P1001", user_id="U2"),
        make_event("purchase", user_id="U2", extra_data=TWO_ITEM_PAYLOAD),
    ]
    out = {r["product_id"]: r for r in products.product_daily(events_df(spark, rows)).collect()}
    assert out["P1001"]["click_count"] == 2
    assert out["P1001"]["revenue"] == 200.0
    assert out["P1001"]["units_sold"] == 2
    assert out["P1001"]["unique_viewers"] == 2
    assert out["P1001"]["unique_buyers"] == 1
    assert out["P1001"]["conversion_rate"] == 50.0
    # P1002 purchased but never viewed → NULL-safe conversion rate
    assert out["P1002"]["unique_viewers"] == 0
    assert out["P1002"]["conversion_rate"] is None


def test_orders_mart_payload_extraction(spark):
    rows = [make_event("purchase", extra_data=TWO_ITEM_PAYLOAD, total_amount=245.0)]
    r = products.orders_mart(events_df(spark, rows)).collect()[0]
    assert r["discount_amount"] == 10.0
    assert r["shipping_fee"] == 5.0
    assert r["coupon_code"] == "C1"
    assert r["item_count"] == 2
    assert r["total_amount"] == 245.0


def test_orders_mart_null_and_malformed_payload(spark):
    rows = [
        make_event("purchase", extra_data=None, order_id="ORD0000000000001"),
        make_event("purchase", extra_data="{not json", order_id="ORD0000000000002"),
    ]
    out = {r["order_id"]: r for r in products.orders_mart(events_df(spark, rows)).collect()}
    # missing products → item_count 0, defaults 0.0 (reference: sql/marts/mart_orders.sql:21-24)
    for oid in ("ORD0000000000001", "ORD0000000000002"):
        assert out[oid]["item_count"] == 0
        assert out[oid]["discount_amount"] == 0.0
        assert out[oid]["shipping_fee"] == 0.0
        assert out[oid]["coupon_code"] is None


def test_product_daily_top_n(spark):
    rows = [
        make_event("purchase", extra_data=TWO_ITEM_PAYLOAD),
        make_event("click", product_id="P1003"),
    ]
    out = products.product_daily(events_df(spark, rows), top_n=1).collect()
    assert len(out) == 1
    assert out[0]["product_id"] == "P1001"  # highest revenue
