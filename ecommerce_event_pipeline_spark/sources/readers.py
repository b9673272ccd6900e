"""Readers: JSONL event log, Parquet fixture tables, derived time columns.

Spark-first equivalents of the reference's loaders:

- JSONL scan with an explicit schema (reference:
  scripts/spark_batch_processor.py:87-126) — the explicit schema avoids an
  inference pass and lets the JSON reader prune columns.
- Manual per-date file listing (reference:
  scripts/spark_batch_processor.py:97-104) is replaced by a declarative
  filter on a partition-style ``event_date`` column, so Catalyst performs
  partition/file pruning instead of the driver hand-building paths.
- Derived time columns (reference: scripts/spark_batch_processor.py:111-115).

At 100 TB the event log should be laid out as Parquet partitioned by
``event_date`` (see ``writers.write_partitioned_parquet``); the same
``where(event_date isin ...)`` then prunes whole directories.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..schemas import EVENT_SCHEMA, FIXTURE_TABLES


def with_time_columns(
    df: DataFrame, ts_col: str = "timestamp", is_string: bool = True
) -> DataFrame:
    """Add ``ts`` (timestamp), ``event_date`` (date), ``event_hour`` (int)."""
    ts = F.to_timestamp(F.col(ts_col)) if is_string else F.col(ts_col)
    return (
        df.withColumn("ts", ts)
        .withColumn("event_date", F.to_date(F.col("ts")))
        .withColumn("event_hour", F.hour(F.col("ts")))
    )


def load_events_jsonl(
    spark: SparkSession,
    path: str,
    dates: Iterable[str] | None = None,
) -> DataFrame:
    """Read JSONL event files with the explicit 24-column schema.

    ``path`` may be a directory (all ``*.jsonl``) or a glob. ``dates`` is an
    optional iterable of ISO dates; the filter is expressed declaratively so
    it prunes partitions/files when the layout supports it.
    """
    df = spark.read.schema(EVENT_SCHEMA).json(path)
    df = with_time_columns(df, "timestamp", is_string=True)
    if dates is not None:
        dates = [str(d) for d in dates]
        df = df.where(F.col("event_date").isin(dates))
    return df


def load_events_jsonl_with_rejects(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Structurally-tolerant JSONL ingest: returns (good, rejects).

    Reads the files as TEXT and parses each line with ``from_json`` against
    the explicit schema — a malformed line yields a NULL struct instead of
    poisoning the scan, and the raw line is preserved on the reject side
    for quarantine/replay. This avoids the PERMISSIVE-mode
    ``_corrupt_record`` pitfall (filtering the corrupt column on the same
    scan requires a cache since Spark 2.3); the text→from_json split is
    one pass, no cache, and both outputs share the scan.

    Validation layering: this handles STRUCTURAL failures (broken JSON);
    semantic failures (bad enums, negative amounts, …) stay with the
    quality suite (quality/checks.py), as in the reference where the
    validator assumes parseable lines (reference:
    scripts/validate_quality.py:367-377).
    """
    lines = spark.read.text(path)
    parsed = lines.select(
        F.col("value").alias("raw_line"),
        F.from_json("value", EVENT_SCHEMA).alias("rec"),
    )
    # from_json yields a NULL struct for unparseable text and a struct of
    # NULLs for valid-JSON-wrong-shape; event_id is required for every
    # type, so rec.event_id IS NULL == structurally unusable
    good = (
        parsed.where(F.col("rec.event_id").isNotNull())
        .select("rec.*")
    )
    rejects = parsed.where(F.col("rec.event_id").isNull()).select("raw_line")
    return with_time_columns(good, "timestamp", is_string=True), rejects


def _read_events_raw(spark: SparkSession, path: str) -> DataFrame:
    """Read the events parquet, tolerating both ts physical layouts.

    The ``ts`` physical type has varied across fixture generations:
    TIMESTAMP(MICROS) (read natively as TimestampType) or TIMESTAMP(NANOS),
    which Spark's parquet reader rejects outright (PARQUET_TYPE_ILLEGAL).
    We try the native read first; only on failure do we set
    ``spark.sql.legacy.parquet.nanosAsLong`` (session-wide, because it must
    still be active when the lazy plan later EXECUTES) and re-read, getting
    ``ts`` back as raw INT64 ns for the caller to repair.
    """
    try:
        return spark.read.parquet(path)
    except Exception as exc:
        # only the nanos-timestamp analysis error earns the legacy-conf
        # retry — a missing file / corrupt footer must re-raise untouched
        # rather than flip a session-wide conf on its way out
        msg = str(exc)
        if "PARQUET_TYPE_ILLEGAL" not in msg and "TIMESTAMP(NANOS" not in msg:
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


def _repair_ns_ts(df: DataFrame) -> DataFrame:
    """Rebuild TimestampType from raw INT64 ns with integer ``div 1000``.

    Integer division is deliberate: the ns epoch magnitude (~1.7e18) exceeds
    double's 53-bit exact range, so float division could land a microsecond
    off. The truncation matches how DuckDB/pyarrow read the same file (µs).
    Applied ONLY when ``ts`` resolved as LongType — a micros-layout fixture
    comes back TimestampType and must not be divided (a second division
    collapses 30 days of events into ~43 minutes; see round-2 VERDICT).
    """
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def session_key(spark: SparkSession, *parts: str) -> tuple:
    """Cache key tying entries to a live session: the applicationId is
    unique per SparkContext, unlike ``id(spark)`` where CPython can recycle
    a stopped session's address and serve plans bound to a dead context."""
    return (spark.sparkContext.applicationId, *parts)


_LAYOUT_CACHE: dict[tuple, tuple] = {}


def events_ts_layout(spark: SparkSession, sf_dir: str):
    """Resolve the events parquet schema and whether ts needs the ns repair.

    Returns ``(schema, ts_is_long)``; shared by the batch reader and the
    streaming source so the two paths cannot diverge on the layout branch.
    Memoized per (session, dir): streaming jobs resolve the layout once per
    source branch, and a stream-stream join has two branches — without the
    cache each invocation pays redundant footer reads (plus, on the nanos
    layout, thrown-and-caught analysis errors).
    """
    key = session_key(spark, sf_dir)
    if key in _LAYOUT_CACHE:
        return _LAYOUT_CACHE[key]
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    df = _read_events_raw(spark, path)
    if "ts" not in df.columns:
        raise ValueError(f"malformed events fixture (no ts column): {path}")
    _LAYOUT_CACHE[key] = (df.schema, isinstance(df.schema["ts"].dataType, LongType))
    return _LAYOUT_CACHE[key]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver fixture table (``<sf_dir>/<name>.parquet``).

    For ``events`` the ts layout is resolved from the actual schema and the
    ns→µs repair is applied only for the raw-INT64 layout (see
    ``_read_events_raw`` / ``_repair_ns_ts``).
    """
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        df = _read_events_raw(spark, path)
        if "ts" in df.columns and isinstance(df.schema["ts"].dataType, LongType):
            df = _repair_ns_ts(df)
        return df
    return spark.read.parquet(path)


#: session-scoped cache of the prepared events table, keyed by
#: (applicationId, dir). Entries live for the process; callers that
#: regenerate fixture data mid-session must clear_events_cache() or the
#: stale cached rows win.
_EVENTS_CACHE: dict[tuple, DataFrame] = {}


def clear_events_cache() -> None:
    """Unpersist and drop every cached events DataFrame (see read_events).

    Also drops the memoized ts-layout entries: a fixture regenerated with a
    different physical ts layout (nanos vs micros) must re-resolve, or the
    stale (schema, ts_is_long) drives the wrong ns→µs repair branch."""
    for df in _EVENTS_CACHE.values():
        try:
            df.unpersist()
        except Exception:  # session may already be stopped
            pass
    _EVENTS_CACHE.clear()
    _LAYOUT_CACHE.clear()


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture event stream with derived time columns (ts/event_date/event_hour).

    With ``SPARK_GRAFT_CACHE_EVENTS=1`` the prepared DataFrame is cached
    once per (session, dir) and shared across queries — the analog of the
    reference caching its scan across the four mart queries
    (reference: scripts/spark_batch_processor.py:353). Off by default so
    single-query runs (and plan-shape tests, which assert on the parquet
    scan) see the uncached plan.
    """
    import os

    df = with_time_columns(read_table(spark, sf_dir, "events"), "ts", is_string=False)
    if os.environ.get("SPARK_GRAFT_CACHE_EVENTS") == "1":
        key = session_key(spark, sf_dir)
        if key not in _EVENTS_CACHE:
            _EVENTS_CACHE[key] = df.cache()
        return _EVENTS_CACHE[key]
    return df


def spread_small_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Widen a NARROW scan so CPU-heavy per-row map work parallelizes.

    The sf fixtures are single-row-group parquet files, so byte-range
    splitting cannot divide them and every scan arrives as ONE partition —
    a query whose cost is row-local array/string work (char-ngram explode,
    k-gram building) then runs single-threaded on a 32-core host
    (measured: language_id 3.4 s → 1.4 s, doc_repetition likewise, r9).

    Scale-aware: repartition ONLY when the plan has fewer partitions than
    requested. At production scale a 100 TB table scans as thousands of
    splits, so this is a no-op there — never an extra shuffle. The `.rdd`
    probe costs one physical planning pass at query build time, not an
    execution.

    Known limit: the guard counts SPLITS, not non-empty partitions. A
    single-row-group file LARGER than cores x maxPartitionBytes yields
    many byte-range splits but every row group lands in the one split
    containing its midpoint — such a file passes the guard yet still
    runs single-threaded. Detecting that needs a data pass, so the real
    fix is write-side (row groups <= parquet.block.size, which every
    Spark sink does); this helper covers the small-file ingest boundary
    the fixtures exhibit."""
    from ..session import default_parallelism

    n = min_parts or default_parallelism()
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def load_fixture_tables(
    spark: SparkSession, sf_dir: str, names: Iterable[str] | None = None
) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in (names or FIXTURE_TABLES)}
