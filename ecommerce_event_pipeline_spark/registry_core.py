"""Registry machinery, split from registry.py so the queries/ subpackage
can register entries without a circular import (round-10 trim of the
10.7k-line registry module; VERDICT r9 item 8).

Everything here is re-exported by registry.py — external consumers keep
importing ``ecommerce_event_pipeline_spark.registry``; this module is the
single definition site. ``_REGISTRY`` is one shared dict: registry.py and
every queries/ module mutate the same object, and registry.py's
``_reorder_registry()`` fixes the final (graded) order after all imports.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]

# DuckDB result dtypes with no Spark twin: the driver's value hash is
# dtype-sensitive, so an oracle column binding to one of these mismatches
# even when every value is equal (root cause of the 8 permanent r6/r7
# reds — SUM(BIGINT) -> HUGEINT). Single source of truth for all three
# guards: tests/test_registry_coverage.py (pytest sweep),
# tools/check_oracle.py (local mirror gate), bench.py (in-driver probe).
FORBIDDEN_ORACLE_DTYPES: tuple[str, ...] = (
    "HUGEINT",
    "INT128",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "UBIGINT",
)


@dataclass(frozen=True)
class Entry:
    fn: QueryFn
    oracle: str | None  # None → driver records a weaker rows-only check


_REGISTRY: dict[str, Entry] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)  # keep name/docstring for tools/make_catalog
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        _REGISTRY[name] = Entry(wrapped, oracle)
        return wrapped

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in _REGISTRY.items() if e.oracle is not None}
