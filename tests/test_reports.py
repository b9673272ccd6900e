"""Reporting layer: KPI aggregates + deterministic markdown rendering."""

from __future__ import annotations

from ecommerce_event_pipeline_spark import reports
from ecommerce_event_pipeline_spark.quality.checks import QualityValidator
from ecommerce_event_pipeline_spark.sources.generator import generate_events


def test_daily_kpis_and_payment_distribution(spark):
    ev = generate_events(spark, "2026-03-01", n_users=200).cache()
    kpis = reports.daily_kpis(ev).collect()[0].asDict()
    assert kpis["total_events"] == ev.count()
    assert kpis["buyers"] <= kpis["unique_users"]
    assert kpis["revenue"] >= 0.0
    pay = reports.payment_method_distribution(ev).collect()
    revenues = [r["revenue"] for r in pay]
    assert revenues == sorted(revenues, reverse=True)
    ev.unpersist()


def test_build_daily_report_renders_markdown(spark):
    ev = generate_events(spark, "2026-03-02", n_users=100).cache()
    quality = QualityValidator(ev).run_all()
    md = reports.build_daily_report(ev, quality, "2026-03-02")
    assert "# Daily e-commerce report — 2026-03-02" in md
    assert "## KPIs" in md and "## Quality" in md and "## Payment methods" in md
    assert "PASS" in md
    # deterministic render
    assert md == reports.build_daily_report(ev, QualityValidator(ev).run_all(), "2026-03-02")
    ev.unpersist()


def test_html_dashboard_renders(spark):
    ev = generate_events(spark, "2026-03-03", n_users=60)
    quality = [r.asDict() for r in QualityValidator(ev).run_all().collect()]
    html = reports.render_html_dashboard("2026-03-03", quality)
    assert html.startswith("<!DOCTYPE html>")
    assert "q4_funnel_sequence" in html
    assert "PASS" in html
