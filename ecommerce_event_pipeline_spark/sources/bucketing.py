"""Bucketed tables — the co-located fact-fact join primitive.

Broadcast joins cover the dimension side; the remaining shuffle at 100 TB
is fact-fact (orders ⨝ lineitem, events ⨝ orders). Bucketing pre-shuffles
ONCE at write time: both tables hashed into the same number of buckets on
the join key, every subsequent join reads bucket i against bucket i with
NO exchange in the plan — the write cost is amortized over every
downstream join and aggregation on that key.

Spark implements this through the session catalog (``bucketBy`` is only
valid with ``saveAsTable``); data lands under ``spark.sql.warehouse.dir``
unless an explicit ``path`` makes the table external. ``sortBy`` within
buckets additionally lets the join skip its sort phase and gives parquet
min/max pruning on the sort key.

Scale notes:
- bucket count is a layout contract: both sides of a co-located join need
  the SAME count (or an integer multiple, which Spark 3+ coalesces);
- one file per (bucket, write-task) — writers should repartition by the
  bucket key first so each bucket is produced by one task, or small-file
  counts multiply;
- AQE cannot re-plan away a bucketed scan's partitioning, which is the
  point: the layout IS the optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally bucket-sorted) table.

    Repartitions by the bucket columns first so each bucket is written by
    one task (one file per bucket instead of one per task×bucket).
    """
    from pyspark.sql import functions as F

    out = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    writer = out.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With matching
    layouts Catalyst plans a SortMergeJoin with ZERO Exchange operators —
    asserted in tests/test_bucketing.py."""
    return spark.table(left_table).join(spark.table(right_table), on)
