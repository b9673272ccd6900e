"""Benchmark runner — times every registered query at one scale factor.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Env:
- ``SPARK_GRAFT_SF_DIR``  fixture dir (default /root/testdata/sf0.1)
- ``SPARK_GRAFT_CPUS``    local[N] parallelism (default: machine cores)

Each query is executed to completion (``collect``) so the timing covers
scan → shuffle → result, not just plan construction. Session startup and
JVM warm-up are excluded from per-query times.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # share one cached events scan across the event-log queries, as the
    # reference does across its four marts
    os.environ.setdefault("SPARK_GRAFT_CACHE_EVENTS", "1")

    from ecommerce_event_pipeline_spark import registry
    from ecommerce_event_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    timings: dict[str, float] = {}
    for name, fn in registry.queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
