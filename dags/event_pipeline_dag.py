"""Airflow DAG shell over the Spark-native pipeline — full reference
topology.

The reference orchestrates with a 12-operator Airflow graph
(reference: dags/event_pipeline_dag.py:527-541): generate → validate →
BranchPythonOperator quality gate → [PASS] load → 4 parallel marts /
[FAIL] alert → converging save_quality_log + quality_report (both
``NONE_FAILED_MIN_ONE_SUCCESS``, reference:
dags/event_pipeline_dag.py:497,504) → llm_daily_report.

Two execution shapes are provided, same code underneath:

1. **Single-driver** (recommended on Spark):
   ``ecommerce_event_pipeline_spark.pipeline.run_for_date`` runs the whole
   PASS path in ONE driver program over one cached events scan — Spark's
   scheduler already parallelizes the four mart jobs, so splitting them
   into separate Airflow tasks only adds four session spin-ups and four
   re-reads. This is what ``run_pipeline_task`` (kept below) does.
2. **Task-per-operator mirror** (this module's graph): each reference
   task is a self-contained callable staging through the filesystem the
   way the reference stages through XCom filepaths + Postgres
   (reference: dags/event_pipeline_dag.py:191-201). Use it when the
   orchestrator — not Spark — must own retries/SLAs per stage, e.g. when
   the four marts write to systems with independent failure domains.

The graph below is declared once in ``TASK_GRAPH`` / ``TRIGGER_RULES`` /
``BRANCH_PATHS`` and materialized 1:1 by the Airflow block, so the
topology is testable without Airflow installed (tests/test_pipeline.py).

This module is import-gated: without Airflow it exposes the plain
callables for any scheduler (cron, Dagster, …) and defines no DAG.
"""

from __future__ import annotations

import json
import os

OUTPUT_DIR = os.environ.get("PIPELINE_OUTPUT_DIR", "/tmp/ecommerce-pipeline")

# ---------------------------------------------------------------------------
# Declarative topology — the reference DAG's task graph, edge for edge
# (reference: dags/event_pipeline_dag.py:527-541).
# ---------------------------------------------------------------------------

MART_TASKS = (
    "create_user_mart",
    "create_funnel_mart",
    "create_product_mart",
    "create_order_mart",
)

TASK_GRAPH: dict[str, tuple[str, ...]] = {
    "generate_events": ("validate_quality",),
    "validate_quality": ("quality_branch",),
    # the branch fans to BOTH paths; BranchPythonOperator picks one at run
    # time via decide_on_quality (reference: dags/event_pipeline_dag.py:181-188)
    "quality_branch": ("load_to_database", "quality_alert"),
    "load_to_database": MART_TASKS,
    "create_user_mart": ("save_quality_log",),
    "create_funnel_mart": ("save_quality_log",),
    "create_product_mart": ("save_quality_log",),
    "create_order_mart": ("save_quality_log",),
    "quality_alert": ("save_quality_log",),
    "save_quality_log": ("quality_report",),
    "quality_report": ("llm_daily_report",),
    "llm_daily_report": (),
}

# converging tasks run when the surviving branch finished and nothing
# failed — the skipped branch must not block them
# (reference: dags/event_pipeline_dag.py:497,504)
TRIGGER_RULES: dict[str, str] = {
    "save_quality_log": "none_failed_min_one_success",
    "quality_report": "none_failed_min_one_success",
}

BRANCH_PATHS = {"PASS": "load_to_database", "FAIL": "quality_alert"}


def decide_on_quality(status: str) -> str:
    """The BranchPythonOperator decision (reference:
    dags/event_pipeline_dag.py:181-188): PASS → load, anything else →
    alert."""
    return BRANCH_PATHS["PASS" if status == "PASS" else "FAIL"]


# ---------------------------------------------------------------------------
# Staging paths — the task-per-operator mirror stages between tasks
# through the filesystem (the reference stages JSONL filepaths through
# XCom; reference: dags/event_pipeline_dag.py:191-201).
# ---------------------------------------------------------------------------


def _staging(ds: str, output_dir: str) -> str:
    return f"{output_dir.rstrip('/')}/staging/{ds}"


def _session(name: str, spark=None):
    """Context manager yielding ``spark`` if given (caller owns its
    lifecycle — the test-suite / single-driver case) else a fresh session
    that is stopped on exit (the one-session-per-Airflow-task case).
    get_spark is getOrCreate, so stopping an externally shared session
    here would kill the caller's."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        if spark is not None:
            from ecommerce_event_pipeline_spark.session import tune

            yield tune(spark)
            return
        from ecommerce_event_pipeline_spark.session import get_spark

        own = get_spark(name)
        try:
            yield own
        finally:
            own.stop()

    return cm()


def generate_events_task(ds: str, output_dir: str = OUTPUT_DIR, spark=None) -> str:
    """Generate one day of events → staging JSONL (the reference's
    generator writes JSONL and XComs the filepath). Only the 24 raw
    EVENT_SCHEMA columns are staged; derived time columns are rebuilt on
    read so every downstream task sees one canonical shape."""
    from ecommerce_event_pipeline_spark.schemas import EVENT_SCHEMA
    from ecommerce_event_pipeline_spark.sources.generator import generate_events
    from ecommerce_event_pipeline_spark.sources.writers import write_jsonl

    with _session(f"generate-events-{ds}", spark) as s:
        path = f"{_staging(ds, output_dir)}/events_jsonl"
        events = generate_events(s, ds).select(*EVENT_SCHEMA.fieldNames())
        write_jsonl(events, path)
        return path


def _read_staged_events(spark, ds: str, output_dir: str):
    from ecommerce_event_pipeline_spark.sources.readers import load_events_jsonl

    return load_events_jsonl(
        spark, f"{_staging(ds, output_dir)}/events_jsonl", dates=[ds]
    )


def validate_quality_task(ds: str, output_dir: str = OUTPUT_DIR, spark=None) -> str:
    """Run the 7-check validator over the staged day; stage the check
    rows + verdict for the branch/log tasks. Returns "PASS"/"FAIL" (the
    reference XComs `quality_status`)."""
    from pyspark.sql import functions as F

    from ecommerce_event_pipeline_spark.quality.checks import QualityValidator

    with _session(f"validate-quality-{ds}", spark) as s:
        events = _read_staged_events(s, ds, output_dir)
        report_df = (
            QualityValidator(events).run_all().withColumn("check_date", F.lit(ds))
        )
        rows = report_df.collect()
        staging = _staging(ds, output_dir)
        s.createDataFrame(rows, report_df.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{staging}/quality")
        status = "PASS" if all(r["status"] == "PASS" for r in rows) else "FAIL"
        with open(f"{staging}/quality_status.json", "w") as fh:
            json.dump({"ds": ds, "status": status}, fh)
        return status


def load_to_database_task(ds: str, output_dir: str = OUTPUT_DIR, spark=None) -> int:
    """Idempotent load of the validated day (reference's bulk INSERT …
    ON CONFLICT DO NOTHING, reference: dags/event_pipeline_dag.py:203-210):
    a per-date dynamic partition overwrite replaces the day's rows exactly,
    so Airflow retries and backfills can't duplicate."""
    from ecommerce_event_pipeline_spark.sources.writers import (
        write_partitioned_parquet,
    )

    with _session(f"load-events-{ds}", spark) as s:
        events = _read_staged_events(s, ds, output_dir)
        write_partitioned_parquet(events, f"{output_dir.rstrip('/')}/raw_events")
        return s.read.parquet(f"{output_dir.rstrip('/')}/raw_events").where(
            f"event_date = '{ds}'"
        ).count()


def quality_alert_task(ds: str, output_dir: str = OUTPUT_DIR, spark=None) -> bool:
    """FAIL branch: post the failed checks to the configured webhook
    (unconfigured → the client logs instead of sending)."""
    from ecommerce_event_pipeline_spark.delivery import WebhookClient

    with _session(f"quality-alert-{ds}", spark) as s:
        rows = (
            s.read.parquet(f"{_staging(ds, output_dir)}/quality")
            .where("status <> 'PASS'")
            .collect()
        )
    failed = [r["check_name"] for r in rows]
    return WebhookClient(url=os.environ.get("SLACK_WEBHOOK_URL")).post(
        {"text": f"quality gate FAILED for {ds}: {', '.join(failed)}"}
    )


def _mart_task(mart_name: str, ds: str, output_dir: str, spark=None) -> str:
    """One mart from the loaded day — partition-pruned scan of raw_events,
    per-date overwrite of the mart (each reference PostgresOperator runs
    one marts/*.sql file; reference: dags/event_pipeline_dag.py:454-492)."""
    from ecommerce_event_pipeline_spark.pipeline import (
        _date_partition_col,
        build_marts,
    )
    from ecommerce_event_pipeline_spark.sources.writers import (
        write_partitioned_parquet,
    )

    out = output_dir.rstrip("/")
    with _session(f"{mart_name}-{ds}", spark) as s:
        events = s.read.parquet(f"{out}/raw_events").where(
            f"event_date = '{ds}'"
        )
        df = build_marts(events)[mart_name]
        path = f"{out}/{mart_name}"
        write_partitioned_parquet(df, path, partition_col=_date_partition_col(df))
        return path


def create_user_mart_task(ds: str, output_dir: str = OUTPUT_DIR, spark=None) -> str:
    return _mart_task("mart_user_daily", ds, output_dir, spark)


def create_funnel_mart_task(ds: str, output_dir: str = OUTPUT_DIR, spark=None) -> str:
    return _mart_task("mart_funnel_daily", ds, output_dir, spark)


def create_product_mart_task(ds: str, output_dir: str = OUTPUT_DIR, spark=None) -> str:
    return _mart_task("mart_product_daily", ds, output_dir, spark)


def create_order_mart_task(ds: str, output_dir: str = OUTPUT_DIR, spark=None) -> str:
    return _mart_task("mart_orders", ds, output_dir, spark)


def save_quality_log_task(ds: str, output_dir: str = OUTPUT_DIR, spark=None) -> str:
    """Converging edge — BOTH branches persist the day's check rows into
    the partitioned quality log (idempotent per-date overwrite)."""
    with _session(f"save-quality-log-{ds}", spark) as s:
        out = output_dir.rstrip("/")
        staged = s.read.parquet(f"{_staging(ds, output_dir)}/quality")
        staged.write.mode("overwrite").partitionBy("check_date").parquet(
            f"{out}/quality_check_log"
        )
        return f"{out}/quality_check_log"


def quality_report_task(ds: str, output_dir: str = OUTPUT_DIR, spark=None) -> str:
    """Render the daily markdown report (PASS day) or the alert report
    (FAIL day) from the written log — runs on both branches like the
    reference's converging quality_report task."""
    return report_task(ds, output_dir, spark)


def llm_daily_report_task(ds: str, output_dir: str = OUTPUT_DIR, spark=None) -> str:
    """LLM daily summary with deterministic fallback (reference:
    scripts/llm_daily_report.py:511-538): KPI block + quality rows +
    payment mix → prompt → LLMReporter (fallback template when no
    endpoint is configured). In the Airflow graph this task follows the
    converging quality_report unconditionally, so on a FAIL day (raw
    data never loaded) it must degrade to the fallback report over the
    quality log — the reference survives the same day via its DB→local
    fallback — instead of crashing on a missing raw_events path."""
    from ecommerce_event_pipeline_spark import reports
    from ecommerce_event_pipeline_spark.delivery import LLMReporter

    out = output_dir.rstrip("/")
    with _session(f"llm-report-{ds}", spark) as s:
        quality = [
            r.asDict()
            for r in s.read.parquet(f"{out}/quality_check_log")
            .where(f"check_date = '{ds}'")
            .collect()
        ]
        try:
            events = s.read.parquet(f"{out}/raw_events").where(
                f"event_date = '{ds}'"
            )
            kpis_rows = reports.daily_kpis(events).collect()
            kpis = kpis_rows[0].asDict() if kpis_rows else {}
            payments = [
                r.asDict()
                for r in reports.payment_method_distribution(events).collect()
            ]
        except Exception:  # FAIL day: raw_events absent for this ds
            kpis, payments = {}, []
    prompt = reports.build_llm_prompt(ds, kpis, quality, payments)
    text = LLMReporter(url=os.environ.get("LLM_REPORT_URL")).generate(
        ds, prompt, kpis
    )
    os.makedirs(f"{out}/reports", exist_ok=True)
    path = f"{out}/reports/llm_daily_{ds}.md"
    with open(path, "w") as fh:
        fh.write(text)
    return path


# callable per task id — what the Airflow block (and any other scheduler)
# dispatches; quality_branch is special-cased as the branch operator
TASK_CALLABLES = {
    "generate_events": generate_events_task,
    "validate_quality": validate_quality_task,
    "load_to_database": load_to_database_task,
    "quality_alert": quality_alert_task,
    "create_user_mart": create_user_mart_task,
    "create_funnel_mart": create_funnel_mart_task,
    "create_product_mart": create_product_mart_task,
    "create_order_mart": create_order_mart_task,
    "save_quality_log": save_quality_log_task,
    "quality_report": quality_report_task,
    "llm_daily_report": llm_daily_report_task,
}


def run_task_graph(
    ds: str, output_dir: str = OUTPUT_DIR, spark=None
) -> dict[str, object]:
    """Execute the task graph without Airflow (topological walk honoring
    the branch + trigger rules) — the plain-scheduler twin of the DAG and
    the unit under test for the topology. Returns {task_id: result} with
    skipped-branch tasks absent."""
    results: dict[str, object] = {}
    results["generate_events"] = generate_events_task(ds, output_dir, spark)
    status = validate_quality_task(ds, output_dir, spark)
    results["validate_quality"] = status
    chosen = decide_on_quality(status)
    results["quality_branch"] = chosen
    if chosen == "load_to_database":
        results["load_to_database"] = load_to_database_task(ds, output_dir, spark)
        for t in MART_TASKS:
            results[t] = TASK_CALLABLES[t](ds, output_dir, spark)
    else:
        results["quality_alert"] = quality_alert_task(ds, output_dir, spark)
    # NONE_FAILED_MIN_ONE_SUCCESS convergence: reached from either branch
    results["save_quality_log"] = save_quality_log_task(ds, output_dir, spark)
    results["quality_report"] = quality_report_task(ds, output_dir, spark)
    # Unconditional, like the Airflow edge it mirrors (quality_report →
    # llm_daily_report with default all_success on a succeeded upstream):
    # on FAIL days llm_daily_report_task degrades to its quality-log
    # fallback rather than reading the never-loaded raw_events (ADVICE r8
    # — the plain-scheduler twin previously dropped the FAIL-day report,
    # silently diverging from the declared topology).
    results["llm_daily_report"] = llm_daily_report_task(ds, output_dir, spark)
    return results


# ---------------------------------------------------------------------------
# Single-driver path (recommended) — kept from the original shell.
# ---------------------------------------------------------------------------


def run_pipeline_task(ds: str, output_dir: str = OUTPUT_DIR, spark=None) -> dict:
    """generate → 7-check validate → gate → marts → logs for one date, in
    ONE Spark driver over one cached scan."""
    from ecommerce_event_pipeline_spark.pipeline import run_for_date

    with _session(f"event-pipeline-{ds}", spark) as s:
        result = run_for_date(s, ds, output_dir)
        return {"status": result.status, "event_count": result.event_count,
                "outputs": result.outputs}


def report_task(ds: str, output_dir: str = OUTPUT_DIR, spark=None) -> str:
    """Render the daily markdown report from the written marts + logs.

    Guards on the quality gate itself (the DAG edge is unconditional, as
    the report runs on BOTH branches like the reference's converging
    quality_report task): on a FAIL day raw_events was never loaded, so an
    alert report is written from the quality log instead of reading a
    nonexistent/stale mart path.
    """
    from pyspark.sql import functions as F

    from ecommerce_event_pipeline_spark.reports import build_daily_report

    with _session(f"event-report-{ds}", spark) as s:
        quality = s.read.parquet(f"{output_dir}/quality_check_log").where(
            F.col("check_date") == ds
        )
        quality_rows = [r.asDict() for r in quality.collect()]
        passed = bool(quality_rows) and all(
            q["status"] == "PASS" for q in quality_rows
        )
        os.makedirs(f"{output_dir}/reports", exist_ok=True)
        if passed:
            events = s.read.parquet(f"{output_dir}/raw_events").where(
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
    from airflow.operators.python import BranchPythonOperator, PythonOperator

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

        def _branch(ds: str, **_):
            staging = _staging(ds, OUTPUT_DIR)
            with open(f"{staging}/quality_status.json") as fh:
                return decide_on_quality(json.load(fh)["status"])

        ops = {}
        for task_id in TASK_GRAPH:
            if task_id == "quality_branch":
                ops[task_id] = BranchPythonOperator(
                    task_id=task_id,
                    python_callable=_branch,
                    op_kwargs={"ds": "{{ ds }}"},
                )
            else:
                fn = TASK_CALLABLES[task_id]
                ops[task_id] = PythonOperator(
                    task_id=task_id,
                    python_callable=(
                        lambda ds, _fn=fn, **_: _fn(ds)
                    ),
                    op_kwargs={"ds": "{{ ds }}"},
                    trigger_rule=TRIGGER_RULES.get(task_id, "all_success"),
                )
        for task_id, downstream in TASK_GRAPH.items():
            for d in downstream:
                ops[task_id] >> ops[d]
except ImportError:  # pragma: no cover
    dag = None
