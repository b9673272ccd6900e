"""Assemble bench_local_r{N}.json from N saved bench_full.json runs.

Protocol (BENCHNOTES / memory: bench record): per-query MIN over ~3 full
``python bench.py`` runs on a drained host, plus targeted standalone
re-times for drifted entries (patched in via --patch name=sec). The
record's ``note`` documents the composition; the driver's BENCH_r{N}
adjudication uses this file as its per-query ratio base.

Usage:
  python tools/assemble_bench_record.py out.json run1.json run2.json ...
      [--patch name=sec ...] [--note "..."]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    args = sys.argv[1:]
    patches: dict[str, float] = {}
    note = ""
    rest: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--patch":
            name, sec = args[i + 1].split("=")
            patches[name] = float(sec)
            i += 2
        elif args[i] == "--note":
            note = args[i + 1]
            i += 2
        else:
            rest.append(args[i])
            i += 1
    out_path, run_paths = rest[0], rest[1:]
    runs = [json.load(open(p)) for p in run_paths]
    sf = runs[0].get("sf")
    names = set()
    for r in runs:
        names |= set(r["queries"])
    queries = {
        n: min(r["queries"][n] for r in runs if n in r["queries"])
        for n in sorted(names)
    }
    queries.update({n: v for n, v in patches.items() if n in queries})
    rec = {
        "metric": "total_query_wall_time",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_queries": len(queries),
        "note": note
        or (
            f"per-query MIN over {len(run_paths)} full bench.py runs on a "
            f"drained host; {len(patches)} standalone warm min-of-3 "
            "re-timed entries patched in"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(
        f"wrote {out_path}: {rec['value']} s / {len(queries)} queries "
        f"({len(patches)} patched)"
    )


if __name__ == "__main__":
    main()
