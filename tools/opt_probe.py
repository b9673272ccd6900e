"""Optimization-round measurement harness (guide §1).

Times a list of registered queries standalone in one session — bench
methodology (`collect()` wall time, shared bases pre-warmed) — reporting
cold + min-of-N warm seconds, and optionally dumps
``explain('formatted')`` per query to ``plans/<round>/<q>_<tag>.txt``.

Usage:
    python tools/opt_probe.py [--tag before] [--round r14] [--reps 3] q1 q2 ...
    python tools/opt_probe.py --top 30          # slowest from the record
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default=None, help="plans/<round>/<q>_<tag>.txt")
    ap.add_argument("--round", dest="round_dir", default="r14",
                    help="plan-dump subdirectory under plans/ (default r14)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CACHE_EVENTS", "1")
    from ecommerce_event_pipeline_spark import registry
    from ecommerce_event_pipeline_spark.session import get_spark
    from ecommerce_event_pipeline_spark.sources.readers import read_events, read_table

    names = list(args.queries)
    if args.top:
        import glob, re
        recs = sorted(
            (int(m.group(1)), p)
            for p in glob.glob(os.path.join(REPO, "bench_local_r*.json"))
            if (m := re.fullmatch(r"bench_local_r(\d+)\.json", os.path.basename(p)))
        )
        if not recs:
            ap.error("--top needs a committed bench_local_r*.json record")
        rec = json.load(open(recs[-1][1]))["queries"]
        names += sorted(rec, key=rec.get, reverse=True)[: args.top]
    unknown = [n for n in names if n not in registry.queries()]
    if unknown:
        ap.error(f"unknown queries (not in registry): {unknown}")

    spark = get_spark("opt_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("events", "documents", "orders", "lineitem"):
        read_table(spark, args.sf_dir, t).limit(1).collect()
    read_events(spark, args.sf_dir).count()
    for base in registry.SHARED_BASES:
        base(spark, args.sf_dir).count()

    qs = registry.queries()
    out = {}
    for name in names:
        fn = qs[name]
        times = []
        for i in range(max(1, args.reps)):
            spark.sparkContext.setJobDescription(f"opt_probe:{name}#{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).collect()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"cold": times[0], "warm_min": min(times[1:] or times)}
        print(f"{name}: cold={times[0]:.2f} warm_min={out[name]['warm_min']:.2f} all={times}", flush=True)
        if args.tag:
            plan_dir = os.path.join(REPO, "plans", args.round_dir)
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
