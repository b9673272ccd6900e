"""Source-scan pins for the round-12 nondeterminism sweep (VERDICT r12
item 5).

docs/SCALING.md's round-12 sweep asserts two package-wide invariants in
prose:

1. every ``collect_list`` that feeds an ordered fold or rendered
   sequence goes through ``sort_array``/``array_sort`` first
   (``collect_list`` order is partition-arrival order — nondeterministic
   over shuffle-fed inputs);
2. every groupBy ``first``/``last`` aggregate is either windowed (an
   ordered frame makes it deterministic) or takes a group-constant /
   singleton value.

Prose claims rot; these tests re-derive them from the AST on every run,
the same way ``test_materialize_once_pin_all_fanout_operators`` pins the
consistent-_pid idiom. A NEW unsorted ``collect_list`` or bare
``F.first()`` fails the suite unless it is added to the allowlist below
WITH a justification — the allowlist is the reviewed register of
order-insensitive consumers, and stale entries fail too.
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ecommerce_event_pipeline_spark",
)

# (relative path, enclosing function) -> why collect_list order cannot
# matter there. Reviewed in round 12 (SCALING.md sweep), pinned here.
UNSORTED_COLLECT_LIST_OK = {
    ("functions/dedup.py", "ngram_jaccard_pairs"):
        "stop-list fed to array_except — set semantics, order-free",
    ("registry.py", "_synthetic_event_log"):
        "JSON payload construction whose consumers re-explode and "
        "re-aggregate; element order round-trips and is never folded",
    ("registry.py", "json_order_items"):
        "same JSON round-trip shape: _products is exploded back out and "
        "the oracle comparison aggregates per item row, never per array",
}

# (relative path, enclosing function) -> why an unwindowed first()/last()
# is deterministic there (group-constant or singleton input).
BARE_FIRST_LAST_OK = {
    ("queries/behavior.py", "rfm_segments"):
        "as_of is a grouping key — constant within every group by "
        "definition",
    ("quality/checks.py", "platform_flip_sessions"):
        "_first_platform is itself a windowed first over the session "
        "order, so it is group-constant when the outer first() reads it",
    # functions/stats.py grouped_exact_percentiles left this list in
    # r14: the percentile fusion removed the pivot (and its singleton
    # F.first cell) entirely — conditional min aggregates now.
}


def _called_name(call: ast.Call) -> str | None:
    f = call.func
    if isinstance(f, ast.Attribute):
        return f.attr
    if isinstance(f, ast.Name):
        return f.id
    return None


def _link_parents(tree: ast.AST) -> None:
    for node in ast.walk(tree):
        for child in ast.iter_child_nodes(node):
            child._parent = node  # type: ignore[attr-defined]


def _sorted_ancestor(node: ast.AST) -> bool:
    """True when the call is wrapped (possibly many levels up, within
    the same statement) in sort_array/array_sort."""
    cur = getattr(node, "_parent", None)
    while cur is not None and not isinstance(cur, ast.stmt):
        if isinstance(cur, ast.Call) and _called_name(cur) in (
            "sort_array",
            "array_sort",
        ):
            return True
        cur = getattr(cur, "_parent", None)
    return False


def _is_windowed(node: ast.Call) -> bool:
    """True for ``F.first(...).over(w)`` — the parent is the ``.over``
    attribute access whose own parent is the over-call."""
    p = getattr(node, "_parent", None)
    return isinstance(p, ast.Attribute) and p.attr == "over"


def _enclosing_function(tree: ast.AST, node: ast.AST) -> str:
    best = "<module>"
    best_span = None
    for fn in ast.walk(tree):
        if isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if fn.lineno <= node.lineno <= (fn.end_lineno or fn.lineno):
                span = (fn.end_lineno or fn.lineno) - fn.lineno
                if best_span is None or span < best_span:
                    best, best_span = fn.name, span
    return best


def scan_source(src: str, relpath: str = "<inline>") -> dict[str, list]:
    """Return the two violation lists for one source text."""
    tree = ast.parse(src)
    _link_parents(tree)
    unsorted_cl, bare_fl = [], []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        name = _called_name(node)
        if name == "collect_list" and not _sorted_ancestor(node):
            unsorted_cl.append(
                (relpath, _enclosing_function(tree, node), node.lineno)
            )
        elif name in ("first", "last"):
            # only the F.first/F.last COLUMN functions; DataFrame.first()
            # (an action) and unrelated locals are out of scope
            f = node.func
            if (
                isinstance(f, ast.Attribute)
                and isinstance(f.value, ast.Name)
                and f.value.id == "F"
                and not _is_windowed(node)
            ):
                bare_fl.append(
                    (relpath, _enclosing_function(tree, node), node.lineno)
                )
    return {"unsorted_collect_list": unsorted_cl, "bare_first_last": bare_fl}


def scan_package() -> dict[str, list]:
    out = {"unsorted_collect_list": [], "bare_first_last": []}
    for root, _dirs, files in os.walk(PKG):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, PKG)
            with open(path) as fh:
                found = scan_source(fh.read(), rel)
            for k in out:
                out[k].extend(found[k])
    return out


def test_collect_list_feeding_order_is_pinned():
    found = scan_package()
    sites = {(p, fn) for p, fn, _ in found["unsorted_collect_list"]}
    rogue = sites - set(UNSORTED_COLLECT_LIST_OK)
    assert not rogue, (
        "unsorted collect_list outside the reviewed allowlist — wrap it "
        f"in sort_array/array_sort or justify it here: {sorted(rogue)}"
    )
    stale = set(UNSORTED_COLLECT_LIST_OK) - sites
    assert not stale, f"allowlist entries no longer in source: {sorted(stale)}"


def test_bare_first_last_is_pinned():
    found = scan_package()
    sites = {(p, fn) for p, fn, _ in found["bare_first_last"]}
    rogue = sites - set(BARE_FIRST_LAST_OK)
    assert not rogue, (
        "unwindowed F.first/F.last outside the reviewed allowlist — give "
        "it an ordered window or justify the group-constant here: "
        f"{sorted(rogue)}"
    )
    stale = set(BARE_FIRST_LAST_OK) - sites
    assert not stale, f"allowlist entries no longer in source: {sorted(stale)}"


def test_scanner_flags_seeded_counterexamples():
    """The scan must actually FAIL on the patterns it exists to catch
    (a vacuous scanner is worse than prose — ADVICE r12's dead-assert
    lesson)."""
    bad = (
        "def q(df):\n"
        "    a = df.groupBy('g').agg(F.collect_list('x').alias('xs'))\n"
        "    b = df.groupBy('g').agg(F.first('x').alias('fx'))\n"
        "    return a, b\n"
    )
    found = scan_source(bad)
    assert found["unsorted_collect_list"] == [("<inline>", "q", 2)]
    assert found["bare_first_last"] == [("<inline>", "q", 3)]

    good = (
        "def q(df, w):\n"
        "    a = df.groupBy('g').agg(\n"
        "        F.array_sort(F.collect_list(F.struct('o', 'x'))).alias('xs')\n"
        "    )\n"
        "    b = df.select(F.first('x').over(w).alias('fx'))\n"
        "    return a, b\n"
    )
    found = scan_source(good)
    assert found["unsorted_collect_list"] == []
    assert found["bare_first_last"] == []
