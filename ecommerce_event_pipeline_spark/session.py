"""SparkSession construction and per-session tuning.

The reference pins ``spark.sql.shuffle.partitions=8`` and an Asia/Seoul
session timezone (reference: scripts/spark_batch_processor.py:77-85). We
instead size shuffle parallelism to the machine, enable AQE so the runtime
re-plans partition counts / skew joins, and pin UTC so derived date/hour
columns compare cleanly against external engines (DuckDB is UTC-naive).

At cluster scale the same builder applies: AQE coalesces the post-shuffle
partitions to match data volume, dynamic partition overwrite makes per-date
mart writes idempotent (the reference's DELETE+INSERT contract), and ANSI
mode stays off so ``x / 0`` yields NULL like the reference's non-ANSI jobs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


#: Conf that is safe (and required for oracle parity) to set at runtime on
#: any externally provided session. shuffle.partitions is pinned to the
#: machine because stateful streaming ops (applyInPandasWithState,
#: dropDuplicatesWithinWatermark) get NO AQE coalescing — under an external
#: session's 200-partition default a 150-user stateful op fans out over 200
#: Python workers (the round-2 streaming_user_state 7x regression).
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.shuffle.partitions": str(default_parallelism()),
}


def tune(
    spark: SparkSession, overrides: dict[str, str] | None = None
) -> SparkSession:
    """Apply runtime-settable conf to an existing session (idempotent).

    Used on sessions we did not build (e.g. the verification driver's) so
    query results are timezone/ANSI stable regardless of who built it.
    ``overrides`` win over ``RUNTIME_CONF`` — callers that explicitly
    request a setting (e.g. ``get_spark(shuffle_partitions=4)`` in tests)
    must not have it silently clobbered by the defaults.
    """
    merged = {**RUNTIME_CONF, **(overrides or {})}
    # Shuffles START wide and AQE coalesces them down to data volume —
    # the standard cluster sizing pattern, and the piece a fixed
    # shuffle.partitions misses as data grows: at 10× sf0.1 the exact-
    # Jaccard self-join runs 17-31 s on 32 fat partitions vs 5.7-6.0 s
    # with a 256-partition start (tools/scale_probe.py; work volume is
    # exactly linear, the blowup was per-partition size). Keyed off the
    # effective shuffle.partitions so test sessions (4) stay small, and
    # left out of RUNTIME_CONF so an explicit override always wins.
    # shuffle.partitions itself stays at machine parallelism because
    # stateful STREAMING ops size their state stores from it and get no
    # AQE coalescing (the round-2 streaming_user_state 7× regression).
    init_key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    if init_key not in merged:
        try:
            base = int(merged["spark.sql.shuffle.partitions"])
        except (KeyError, ValueError):  # pragma: no cover
            base = default_parallelism()
        merged[init_key] = str(8 * base)
    for key, value in merged.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf may be static in some envs
            pass
    return spark


def get_spark(
    app_name: str = "ecommerce-event-pipeline-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # In local mode the driver JVM is the whole cluster. A long
        # many-query session accumulates broadcast blocks / codegen classes
        # faster than the ContextCleaner retires them, and an undersized
        # heap turns that into GC drag on every query after the first few
        # dozen (measured: 80-query bench 154s at 16g → 143s at 48g, with
        # the per-query tail smoothing out). Cached data itself is tiny
        # (~62 MB at sf0.1) — the headroom is for churn, not storage.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for key, value in RUNTIME_CONF.items():
        builder = builder.config(key, value)
    # explicit caller overrides are applied LAST at build time and again as
    # tune() overrides — without this, the RUNTIME_CONF defaults (which
    # include shuffle.partitions) would silently clobber a requested value
    overrides = dict(extra_conf or {})
    if shuffle_partitions is not None:
        overrides["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    for key, value in overrides.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark, overrides)
