"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry in Spark AND its ``oracle_sql()`` twin in
DuckDB on the same fixture dir, then compares:

- row count
- column-name sets
- order-insensitive values (rows sorted; EXACT comparison, including
  full-precision floats — the driver hashes exact values, so any float
  tolerance here would mask a driver-side hash mismatch)

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def normalize(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def values_equal(a, b):
    # Exact, like the driver's value hash. NaN==NaN is the only concession
    # (both engines emit real NaN objects; a hash of the repr treats them
    # identically too).
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b and repr(a) == repr(b)
    if isinstance(a, float) or isinstance(b, float):
        # int-vs-float type drift (e.g. DuckDB DOUBLE vs Spark LONG) would
        # change the hashed repr → flag it even when numerically equal.
        return False
    return a == b


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    problems = []
    if set(spark_cols) != set(duck_cols):
        problems.append(
            f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        )
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count: spark={len(spark_rows)} duck={len(duck_rows)}")
        return problems
    cols = sorted(spark_cols)
    s_idx = [spark_cols.index(c) for c in cols]
    d_idx = [duck_cols.index(c) for c in cols]

    def key(row, idx):
        out = []
        for i in idx:
            v = normalize(row[i])
            if isinstance(v, float):
                v = repr(v)  # full precision — exact rows must sort together
            out.append(str(v))
        return tuple(out)

    s_sorted = sorted(spark_rows, key=lambda r: key(r, s_idx))
    d_sorted = sorted(duck_rows, key=lambda r: key(r, d_idx))
    mism = 0
    for rs, rd in zip(s_sorted, d_sorted):
        for i, c in enumerate(cols):
            a, b = normalize(rs[s_idx[i]]), normalize(rd[d_idx[i]])
            if not values_equal(a, b):
                if mism < 5:
                    problems.append(f"value mismatch col={c}: spark={a!r} duck={b!r}")
                mism += 1
    if mism:
        problems.append(f"total mismatched values: {mism}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from ecommerce_event_pipeline_spark.registry import (
        FORBIDDEN_ORACLE_DTYPES,
    )
    from ecommerce_event_pipeline_spark.session import get_spark

    spark = get_spark("check-oracle")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = list(rel.columns)
            duck_types = [str(t) for t in rel.types]
            duck_rows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        # Native-dtype gate: the driver's value hash is dtype-sensitive
        # (r6/r7 lesson: SUM(BIGINT) -> HUGEINT in DuckDB vs Spark int64
        # hashed red for 8 queries despite value-equal rows). Python
        # `int == int` above can't see it, so check the DuckDB result
        # types directly: anything outside the driver-hashable set must
        # be CAST in the oracle string.
        for c, t in zip(duck_cols, duck_types):
            tu = t.upper()
            if any(f in tu for f in FORBIDDEN_ORACLE_DTYPES):
                problems.append(
                    f"oracle dtype col={c}: DuckDB emits {t} (no Spark "
                    f"twin; driver hash mismatches) — CAST it in the SQL"
                )
        if problems:
            print(f"FAIL {name} ({len(spark_rows)} rows):")
            for p in problems:
                print(f"     {p}")
            failed.append(name)
        else:
            print(f"PASS {name} ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
    print()
    if failed:
        print(f"{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print("all queries match the oracle")


if __name__ == "__main__":
    main()
