"""Custom Python DataSource (PySpark 4 `pyspark.sql.datasource` API).

The engine's preferred synthetic-event path is the declarative generator
(`sources/generator.py` — pure Catalyst expressions, executor-parallel).
This module demonstrates the OTHER extension surface a complete engine
must offer: a user-defined source pluggable as
``spark.read.format("synthetic_events")`` / ``spark.readStream.format(...)``
— the integration point for systems Spark has no built-in connector for
(internal queues, HTTP APIs, bespoke file formats).

Design rules the implementation demonstrates:
- **batch**: `partitions()` declares one `InputPartition` per user block,
  so generation is executor-parallel and scales with the block count, not
  the driver;
- **determinism**: every value derives from a splitmix-style integer hash
  of (block, row) — any partition regenerates identically anywhere, no RNG
  state (same contract as the declarative generator);
- **streaming**: a `SimpleDataSourceStreamReader` with integer offsets —
  each micro-batch emits the rows in [start, end) so replay after failure
  re-yields the identical slice (the exactly-once-source contract).

Rows cross the Python↔JVM boundary through Arrow, but at
generator-throughput this path is still ~10× slower than the Catalyst
generator — which is the documented reason the engine uses this API for
CONNECTIVITY, not for bulk synthesis.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

try:  # pragma: no cover - exercised via the import-or-skip test gate
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pyspark < 4
    HAS_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        def __init__(self, options=None):
            self.options = options or {}

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class SimpleDataSourceStreamReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value


_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double"
)
_TYPES = ("view", "click", "add_to_cart", "purchase", "search")
_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _mix(x: int) -> int:
    """splitmix64 finalizer — cheap, well-distributed, dependency-free."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _row(i: int):
    h = _mix(i)
    return (
        i,
        _EPOCH + timedelta(seconds=i * 7 + h % 5),
        h % 500,
        _TYPES[(h >> 8) % len(_TYPES)],
        round(((h >> 16) % 100_000) / 100.0, 2),
    )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        # one InputPartition per contiguous row block: executor-parallel,
        # and each block regenerates identically wherever it is scheduled
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            InputPartition((lo, min(lo + step, self.n_rows)))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield _row(i)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.batch_rows = int(options.get("batchRows", 100))
        self.max_rows = int(options.get("maxRows", 1000))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        lo = start["i"]
        hi = min(lo + self.batch_rows, self.max_rows)
        return iter([_row(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start, end):
        # failure replay: the slice is a pure function of the offsets
        return iter([_row(i) for i in range(start["i"], end["i"])])


class SyntheticEventsDataSource(DataSource):
    """``synthetic_events`` — deterministic clickstream for tests/demos.

    Batch:  ``spark.read.format("synthetic_events").option("rows", N)``
    Stream: ``spark.readStream.format("synthetic_events")`` with
    ``batchRows``/``maxRows`` bounding each micro-batch and the total.
    """

    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> bool:
    """Register the source on a session; returns False when the running
    PySpark lacks the DataSource API (callers skip, nothing breaks)."""
    if not HAS_DATASOURCE_API:
        return False
    spark.dataSource.register(SyntheticEventsDataSource)
    return True
