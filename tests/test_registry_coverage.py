"""Registry window discipline: the driver grades only the FIRST 50
registered queries, so correctness of off-window entries rests on the
local oracle mirror covering EVERYTHING. These tests pin that contract
(ADVICE r03: nothing previously enforced that the mirror runs over
off-window entries)."""

from __future__ import annotations

from ecommerce_event_pipeline_spark import registry


def test_front_is_exactly_the_graded_window():
    assert len(registry._FRONT) == 50, (
        "the driver grades the first 50 registered queries; _FRONT must "
        "fill the window exactly"
    )
    missing = [n for n in registry._FRONT if n not in registry._REGISTRY]
    assert not missing, f"_FRONT names not registered: {missing}"
    # registration order actually starts with _FRONT (the reorder ran)
    assert list(registry._REGISTRY)[: len(registry._FRONT)] == list(
        registry._FRONT
    )


def test_queries_cover_every_registered_entry():
    """tools/check_oracle.py iterates queries(); queries() must expose ALL
    entries — in-window, off-window, oracle-backed, and rows-only — so a
    regression in a rotated-out query is still caught locally."""
    qs = registry.queries()
    assert set(qs) == set(registry._REGISTRY)
    # off-window oracle-backed entries exist and are reachable
    off = list(registry._REGISTRY)[50:]
    assert any(
        registry._REGISTRY[n].oracle is not None for n in off
    ), "expected oracle-backed entries beyond the graded window"


def test_oracle_sql_matches_oracle_backed_entries():
    oracles = registry.oracle_sql()
    backed = {
        n for n, e in registry._REGISTRY.items() if e.oracle is not None
    }
    assert set(oracles) == backed


def test_window_composition_is_fully_oracle_backed():
    """Rows-only entries spend a graded seat on a weak check. Since the
    round-4 static-quantizer IVF replaced the refit-per-run seat, every
    graded slot carries a full value-hash oracle — keep it that way."""
    rows_only_in_window = [
        n for n in registry._FRONT if registry._REGISTRY[n].oracle is None
    ]
    assert rows_only_in_window == [], rows_only_in_window


def test_front_window_reseats_stalest():
    """Freshness invariant (VERDICT r8 item 7): the driver ledger is the
    graded contract, so rotation must keep every query's last driver
    grade recent. Mechanically: any query whose last green in
    CORRECTNESS_r*.json is more than 4 rounds older than the latest
    recorded round MUST be seated in the current _FRONT. The bound is
    latest-4 (not -3) deliberately: the driver writes CORRECTNESS_r{N}
    BEFORE the round-(N+1) build rotates, so a -3 bound would flip the
    suite red in the window between the driver's grade and the next
    rotation commit; -4 gives exactly one round of grace while still
    forcing every build to re-seat its stalest seats (the r8 judge
    found ~40 seats silently stuck at r05). COVERAGE.md's 'suggested
    next-round window' is the mechanical seating that keeps this
    green."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not files:  # fresh clone without driver artifacts — nothing to pin
        return
    last_green: dict[str, int] = {}
    latest = 0
    for f in files:
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        latest = max(latest, rnd)
        for q, v in json.load(open(f)).items():
            if not isinstance(v, dict):
                continue
            # hash green, or — ONLY for queries that currently have no
            # oracle — a rows-only record (real rows-only driver records
            # carry err='no_oracle' + spark_rows, not rows_match). A query
            # that gained an oracle after an early rows-only grade stays
            # stale until hash-green — same criterion as
            # tools/make_ledger.py (ADVICE r9).
            rows_only_ok = (
                q in registry._REGISTRY
                and registry._REGISTRY[q].oracle is None
            )
            green = v.get("hash_match") is True or (
                rows_only_ok
                and v.get("err") == "no_oracle"
                and v.get("spark_rows") is not None
            )
            if green:
                last_green[q] = max(last_green.get(q, 0), rnd)
    stale_cutoff = latest - 4
    stale_off_window = {
        q: r
        for q, r in last_green.items()
        if r < stale_cutoff
        and q in registry._REGISTRY
        and q not in registry._FRONT
    }
    assert not stale_off_window, (
        f"queries last driver-green before r{stale_cutoff} must be seated "
        f"in _FRONT for the next graded window: {stale_off_window}"
    )


def test_graded_window_schemas_survive_driver_canonicalizer(spark):
    """The driver canonicalizes results with a pandas lexsort over every
    column; an ArrayType/MapType/StructType column raises
    'unhashable type: list' there even when values are correct (the
    r03 embedding_quantize red row). Plan-only check: no graded-window
    query may emit a non-atomic column."""
    from pyspark.sql import types as T

    bad = {}
    for name in registry._FRONT:
        df = registry._REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"non-atomic columns in graded-window outputs: {bad}"


def test_oracle_dtypes_are_driver_hashable():
    """Sweep EVERY oracle_sql() string through DuckDB and assert no result
    column binds to a dtype Spark cannot emit. Root cause of the 8
    permanent r6/r7 reds (VERDICT r7): DuckDB types SUM(BIGINT) as
    HUGEINT (int128); the driver's value hash is dtype-sensitive, so a
    HUGEINT oracle column mismatches Spark's int64 even when every value
    is equal. Binding alone (rel.types) is enough — no query execution,
    so this sweeps all ~190 strings in seconds."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    forbidden = registry.FORBIDDEN_ORACLE_DTYPES
    bad = {}
    for name, sql in registry.oracle_sql().items():
        rel = con.sql(sql)
        hits = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if any(f in str(t).upper() for f in forbidden)
        ]
        if hits:
            bad[name] = hits
    assert not bad, (
        f"oracle columns with no Spark dtype twin (CAST them in the SQL): "
        f"{bad}"
    )


def test_front_window_survives_queries_first_import_order():
    """Import-cycle regression (r10 review): importing a queries/
    submodule BEFORE registry used to trigger registry's tail import
    mid-initialization and run _reorder_registry() before that
    submodule had registered anything — silently pushing its entries
    out of the graded front-50. queries/ modules must not import
    registry (shared bases live in shared_bases.py), making any import
    order safe. Run in a fresh interpreter so this module's own
    registry import can't mask the ordering."""
    import os
    import subprocess
    import sys

    code = (
        "import ecommerce_event_pipeline_spark.queries.corpus\n"
        "import ecommerce_event_pipeline_spark.queries.sampling\n"
        "from ecommerce_event_pipeline_spark import registry\n"
        "front = list(registry._REGISTRY)[:50]\n"
        "assert front == list(registry._FRONT), "
        "[n for n in registry._FRONT if n not in front]\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=repo, capture_output=True, text=True
    )
    assert r.returncode == 0, r.stderr[-2000:]
