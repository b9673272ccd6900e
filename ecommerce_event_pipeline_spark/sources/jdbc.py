"""JDBC source/sink wrappers (SURVEY §2.1 S7/S8).

The reference loads events into Postgres with batched ``executemany`` +
``ON CONFLICT (event_id) DO NOTHING`` (reference:
dags/event_pipeline_dag.py:191-243) and reads mart tables back for
reporting (reference: scripts/llm_daily_report.py:226-356). The
Spark-native forms:

- **read**: a *partitioned* JDBC scan — ``partitionColumn`` + bounds +
  ``numPartitions`` turn one big cursor into N range-sliced queries that
  executors pull in parallel; ``fetchsize`` keeps each cursor streaming
  instead of buffering the table. An unpartitioned JDBC read is a
  single-task bottleneck at any real scale.
- **append**: ``batchsize`` batches the INSERTs exactly like the
  reference's 1000-row ``executemany`` loop.
- **append_dedup**: the ``ON CONFLICT DO NOTHING`` analog without
  database-specific SQL: read back only the key column (projection pushed
  into the dbtable subquery), anti-join, append the survivors. For a
  transactional upsert use the store's MERGE via its own connector.

No database ships in this sandbox, so all I/O funnels through the two
seams ``_jdbc_read`` / ``_jdbc_write``; tests monkeypatch them the same
way the reference's tests mock their Postgres hook/cursor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .writers import append_dedup_by_key


def _jdbc_read(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """Seam: the one real JDBC read. Everything above it is option
    assembly + plan logic, unit-testable without a database."""
    return spark.read.format("jdbc").options(**options).load()


def _jdbc_write(df: DataFrame, options: dict[str, str], mode: str) -> None:
    """Seam: the one real JDBC write."""
    df.write.format("jdbc").options(**options).mode(mode).save()


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC scan. ``table`` may be a table name or a pushdown
    subquery like ``(SELECT ... ) AS t``. Without ``partition_column`` the
    read is a single task — acceptable only for small dimension tables."""
    options: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetchsize),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        options.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    options.update(properties or {})
    return _jdbc_read(spark, options)


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    *,
    batchsize: int = 1_000,
    isolation_level: str = "READ_COMMITTED",
    properties: dict[str, str] | None = None,
) -> None:
    """Plain batched append — the reference's 1000-row executemany loop,
    executed per-partition by the executors instead of on one client."""
    options: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "batchsize": str(batchsize),
        "isolationLevel": isolation_level,
    }
    options.update(properties or {})
    _jdbc_write(df, options, "append")


def write_jdbc_append_dedup(
    df: DataFrame,
    url: str,
    table: str,
    key: str,
    *,
    batchsize: int = 1_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Idempotent bulk append: the Spark analog of
    ``ON CONFLICT (key) DO NOTHING`` (reference:
    dags/event_pipeline_dag.py:203-216). Reads back ONLY the key column
    (projection pushed down into the JDBC subquery), anti-joins, appends
    the survivors. Returns the appended rows (post-dedup) so callers can
    count/log them like the reference does."""
    existing_keys = read_jdbc_table(
        df.sparkSession,
        url,
        f"(SELECT {key} FROM {table}) AS _existing_keys",
        fetchsize=batchsize,
        properties=properties,
    )
    to_insert = append_dedup_by_key(df, existing_keys, key)
    write_jdbc_append(
        to_insert, url, table, batchsize=batchsize, properties=properties
    )
    return to_insert
