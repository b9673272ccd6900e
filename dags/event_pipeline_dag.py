"""Airflow DAG shell over the Spark-native pipeline.

The reference orchestrates with a 10-task Airflow DAG
(reference: dags/event_pipeline_dag.py:527-541): generate → validate →
quality branch → load → 4 parallel marts → logs → reports. In this engine
the whole PASS path is ONE Spark driver program
(``ecommerce_event_pipeline_spark.pipeline.run_for_date``) — Spark's
scheduler already runs the four mart jobs over one cached scan, so the
DAG's only remaining jobs are "run the pipeline for {{ ds }}" and "render
the report". Airflow is an optional outer scheduler, exactly as the
BASELINE approach states ("Spark jobs scheduled by Airflow").

This module is import-gated: without Airflow installed it exposes the plain
callables for any scheduler (cron, Dagster, …) and defines no DAG.
"""

from __future__ import annotations

import os

OUTPUT_DIR = os.environ.get("PIPELINE_OUTPUT_DIR", "/tmp/ecommerce-pipeline")


def run_pipeline_task(ds: str, output_dir: str = OUTPUT_DIR) -> dict:
    """generate → 7-check validate → gate → marts → logs for one date."""
    from ecommerce_event_pipeline_spark.pipeline import run_for_date
    from ecommerce_event_pipeline_spark.session import get_spark

    spark = get_spark(f"event-pipeline-{ds}")
    try:
        result = run_for_date(spark, ds, output_dir)
        return {"status": result.status, "event_count": result.event_count,
                "outputs": result.outputs}
    finally:
        spark.stop()


def report_task(ds: str, output_dir: str = OUTPUT_DIR) -> str:
    """Render the daily markdown report from the written marts + logs.

    Guards on the quality gate itself (the DAG edge is unconditional, as
    the report runs on BOTH branches like the reference's converging
    quality_report task): on a FAIL day raw_events was never loaded, so an
    alert report is written from the quality log instead of reading a
    nonexistent/stale mart path.
    """
    from pyspark.sql import functions as F

    from ecommerce_event_pipeline_spark.reports import build_daily_report
    from ecommerce_event_pipeline_spark.session import get_spark

    spark = get_spark(f"event-report-{ds}")
    try:
        quality = spark.read.parquet(f"{output_dir}/quality_check_log").where(
            F.col("check_date") == ds
        )
        quality_rows = [r.asDict() for r in quality.collect()]
        passed = bool(quality_rows) and all(
            q["status"] == "PASS" for q in quality_rows
        )
        os.makedirs(f"{output_dir}/reports", exist_ok=True)
        if passed:
            events = spark.read.parquet(f"{output_dir}/raw_events").where(
                F.col("event_date") == ds
            )
            path = f"{output_dir}/reports/daily_{ds}.md"
            with open(path, "w") as fh:
                fh.write(build_daily_report(events, quality, ds))
        else:
            path = f"{output_dir}/reports/alert_{ds}.md"
            failed = [q["check_name"] for q in quality_rows if q["status"] != "PASS"]
            with open(path, "w") as fh:
                fh.write(
                    f"# QUALITY ALERT — {ds}\n\nData was NOT loaded. "
                    f"Failed checks: {', '.join(failed) or 'no quality log found'}\n"
                )
        return path
    finally:
        spark.stop()


def on_failure_callback(context: dict) -> None:
    """Post the failure to the configured webhook (reference:
    dags/event_pipeline_dag.py:47-74 — SlackAlert.send_pipeline_failure).
    Unconfigured → the client logs instead of sending."""
    import os as _os

    from ecommerce_event_pipeline_spark.delivery import WebhookClient

    ti = context.get("task_instance")
    WebhookClient(url=_os.environ.get("SLACK_WEBHOOK_URL")).post(
        {
            "text": "pipeline task failed: "
            f"{getattr(ti, 'task_id', '?')} @ {context.get('ds', '?')}"
        }
    )


def on_sla_miss_callback(dag, task_list, blocking_task_list, slas, blocking_tis):
    """SLA-miss alert (reference: dags/event_pipeline_dag.py:76-89)."""
    import os as _os

    from ecommerce_event_pipeline_spark.delivery import WebhookClient

    WebhookClient(url=_os.environ.get("SLACK_WEBHOOK_URL")).post(
        {"text": f"SLA missed: {task_list}"}
    )


try:  # Airflow is optional — absent in this environment
    from datetime import datetime, timedelta

    from airflow import DAG
    from airflow.operators.python import PythonOperator

    with DAG(
        dag_id="ecommerce_event_pipeline_spark",
        schedule_interval="0 17 * * *",  # daily, as the reference
        start_date=datetime(2026, 1, 1),
        catchup=False,
        max_active_runs=1,
        dagrun_timeout=timedelta(hours=3),
        sla_miss_callback=on_sla_miss_callback,
        # full operational policy of the reference DAG
        # (reference: dags/event_pipeline_dag.py:107-121)
        default_args={
            "retries": 3,
            "retry_delay": timedelta(minutes=2),
            "retry_exponential_backoff": True,
            "max_retry_delay": timedelta(minutes=30),
            "execution_timeout": timedelta(hours=1),
            "sla": timedelta(hours=2),
            "on_failure_callback": on_failure_callback,
        },
    ) as dag:
        pipeline_op = PythonOperator(
            task_id="run_pipeline",
            python_callable=lambda ds, **_: run_pipeline_task(ds),
            op_kwargs={"ds": "{{ ds }}"},
        )
        report_op = PythonOperator(
            task_id="daily_report",
            python_callable=lambda ds, **_: report_task(ds),
            op_kwargs={"ds": "{{ ds }}"},
        )
        pipeline_op >> report_op
except ImportError:  # pragma: no cover
    dag = None
