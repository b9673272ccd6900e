"""Dump formatted physical plans for the headline queries → PLANS.md.

Evidence artifact for plan review: shows pushdown, pruning, join strategy
and aggregate structure per query. Regenerate after planner-relevant
changes: ``python tools/explain_audit.py``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

HEADLINERS = [
    "funnel_daily",
    "pricing_summary",
    "local_supplier_volume",
    "top_parts_by_revenue",
    "order_priority_counts",
    "orders_projection",
    "inferred_sessions",
    "events_asof_orders",
    "minhash_near_dupes",
    "embedding_topk",
    "embedding_near_dupes",
    "dedup_corpus_stats",
    "orders_mart",
    # round-3 curation + layout additions
    "contamination_check",
    "pack_sequences",
    "doc_chunks",
    "training_shards",
    # round-4 warehouse additions
    "purchase_context_interval_join",
    "orders_cdc_merge",
    "customer_value_scd2",
    "daily_revenue_gapfill",
    "user_lifetime_incremental",
    "zorder_box_stats",
    "daily_reconciliation_full_outer",
    "value_median_udaf",
    # round-4 similarity/sketch/sampling additions
    "jaccard_prefix_pairs",
    "token_heavy_hitters",
    "weighted_doc_sample",
    # round-4 engine-surface wave
    "hll_distinct_daily",
    "bloom_pruned_brand_revenue",
    "ewma_daily_traffic",
    "small_quantity_revenue",
    "traffic_rollup",
    "daily_volume_anomalies",
    # round-4 analytics + vector-serving wave
    "pq_encode_static",
    "pq_adc_topk",
    "retention_cohorts",
    "basket_pairs",
    "rfm_segments",
    "incremental_dedup_report",
    # round-5: distributed order statistics + new pipeline operators
    "customer_balance_deciles",
    "value_percentiles",
    "span_dedup_stats",
    "split_leakage_report",
    "embedding_inference",
    "dup_triangles",
    "dup_chain_stats",
    # round-9: narrow-scan spread (the plan should show a REPARTITION
    # exchange between the 1-split fixture scan and the row-local work)
    "language_id",
    "doc_repetition",
    # round-10 expansion: survival fold, integer link analysis (the plans
    # should show the checkpointed edge base + broadcast score joins),
    # blocked containment, ordered-fold LM scoring, TakeOrderedAndProject
    # NPMI top-k, and the exact-cent attribution window chain
    "km_repeat_purchase",
    "item_pagerank",
    "hits_scores",
    "doc_containment_pairs",
    "doc_bigram_surprisal",
    "token_pmi_pairs",
    "kmv_daily_users",
    "cuped_uplift",
    "time_decay_attribution",
    "markov_absorption",
    "doc_boilerplate_fraction",
    # round-11 expansion: window-form CUSUM (prefix-sum + running-min, no
    # fold), bounded-fan-out bootstrap, integer power iteration, blocked
    # media LSH pairing, session-keyed subsequence self-join, and the
    # ordered-fold IRLS chain
    "revenue_cusum",
    "poisson_bootstrap_ci",
    "transition_stationary",
    "media_phash_dupes",
    "subsequence_support",
    "logistic_conversion_irls",
    "kmv_set_ops",
    "coview_assortativity",
    # round-11 third wave: matched-basket index folds, grid-blocked
    # spatial join (the plan should show the cell-keyed self-join +
    # TakeOrderedAndProject), dyadic HT integer estimator
    "monthly_price_index",
    "geo_cell_neighbors",
    "horvitz_thompson_totals",
    # round-12: log-domain quantile sketch (the plan should show two
    # partial-agg groupBys — daily sketch, merge — and event_type-
    # partitioned windows only; no full-data sort)
    "ddsketch_value_quantiles",
    # round-13: the skew demonstration (the plan should show the join
    # keyed on (hot_key, _salt) — the salt fans the deliberately hot
    # key across reducers; AQE's skew=true split is pinned separately
    # in tests/test_skew_and_io.py with test-scaled thresholds)
    "skew_salted_hot_join",
]


# Global (unpartitioned) windows tolerated because their input is bounded
# by GRAIN, not by data size: one row per calendar day regardless of scale.
# Anything else that plans a single-partition WindowExec fails the audit —
# use operators.windows.global_ntile / global_row_number /
# distributed_prefix_sum instead (range-partition + offset).
GLOBAL_WINDOW_ALLOWLIST = {
    "daily_revenue_gapfill": "calendar grain: one row per day",
    "revenue_7day_ma": "calendar grain: one row per day",
    "ewma_daily_traffic": "calendar grain: one row per day",
    "daily_volume_anomalies": "calendar grain: one row per day",
    "user_lifetime_incremental": "calendar grain: one row per day",
    "revenue_cusum": "calendar grain: one row per day",
    "revenue_changepoint": "calendar grain: one row per day",
    "theil_sen_trend": "calendar grain: pairwise over days (≈n²/2 rows)",
    "poisson_bootstrap_ci": "replicate grain: 64 bootstrap means",
    "kmv_set_ops": "register grain: union rank over ≤128 sketch registers",
    "daily_behavior_jsd": "calendar grain: day-index row_number, one row per day",
}


def unpartitioned_window_lines(plan: str) -> list[str]:
    """Physical-plan lines whose WindowExec has no partition spec.

    A partitioned+ordered Window prints ``Window [fns], [partExprs],
    [orderExprs]`` (three top-level bracket groups). Two groups is
    ambiguous: partition-only windows print ``Window [fns], [partExprs]``
    and global-order windows print ``Window [fns], [orderExprs]`` — the
    two are told apart by the sort markers (every order expression
    carries ``ASC``/``DESC``; partition expressions never do). Only the
    global-order shape moves all rows to one task.
    """
    bad = []
    for line in plan.splitlines():
        if "windowspecdefinition" not in line:
            continue
        groups = line.split("], [")
        if len(groups) >= 3:
            continue  # partition spec + order spec
        last = groups[-1]
        if " ASC" in last or " DESC" in last:
            bad.append(line.strip())
    return bad


# Plan features worth pinning per query: shuffle count and join strategy
# are the two knobs that silently regress (a dim outgrowing the broadcast
# threshold turns a map-side join into a full shuffle; a lost bucketing
# spec adds an Exchange). Counted as substring hits on the physical plan.
PLAN_FEATURES = (
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "TakeOrderedAndProject",
    "WindowGroupLimit",
    "windowspecdefinition",
)


def audit_windows(spark, qs) -> tuple[list[str], dict[str, dict[str, int]]]:
    """Build every non-streaming registered query's physical plan; collect
    single-partition window offenders AND per-query plan-feature counts
    (the shape snapshot diffed across rounds)."""
    offenders = []
    snapshots: dict[str, dict[str, int]] = {}
    for name, fn in qs.items():
        if name.startswith("streaming_"):
            continue  # building these executes a stream; their windows
            # are per-key stateful operators, not WindowExec
        df = fn(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        snapshots[name] = {
            f: plan.count(f) for f in PLAN_FEATURES if plan.count(f)
        }
        for line in unpartitioned_window_lines(plan):
            if name in GLOBAL_WINDOW_ALLOWLIST:
                continue
            offenders.append(f"{name}: {line[:140]}")
    return offenders, snapshots


def diff_snapshots(snapshots: dict[str, dict[str, int]]) -> list[str]:
    """Compare fresh plan features against the committed
    PLAN_SNAPSHOTS.json; return human-readable change lines. Informative,
    not failing — a diff here belongs in the commit message explaining
    the plan change (or points at an unintended regression)."""
    import os

    path = "/root/repo/PLAN_SNAPSHOTS.json"
    if not os.path.exists(path):
        return []
    import json as _json

    with open(path) as fh:
        old = _json.load(fh)
    changes = []
    for name, feats in snapshots.items():
        prev = old.get(name)
        if prev is None:
            changes.append(f"NEW {name}: {feats}")
        elif prev != feats:
            keys = sorted(set(prev) | set(feats))
            delta = {
                k: (prev.get(k, 0), feats.get(k, 0))
                for k in keys
                if prev.get(k, 0) != feats.get(k, 0)
            }
            changes.append(f"CHANGED {name}: {delta}")
    for name in old:
        if name not in snapshots:
            changes.append(f"REMOVED {name}")
    return changes


def main() -> None:
    from ecommerce_event_pipeline_spark import registry
    from ecommerce_event_pipeline_spark.session import get_spark

    spark = get_spark("explain-audit")
    qs = registry.queries()
    out = [
        "# PLANS — formatted physical plans of headline queries",
        "",
        "Generated by `python tools/explain_audit.py` at sf0.001. Read for:",
        "`PushedFilters`/`ReadSchema` (scan pruning), `BroadcastHashJoin` vs",
        "`SortMergeJoin` (join strategy), `TakeOrderedAndProject` (top-k),",
        "`partial_*` aggregates (map-side combine), `Exchange` count (shuffles).",
        "",
    ]
    for name in HEADLINERS:
        df = qs[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        out += [f"## {name}", "", "```", plan.strip(), "```", ""]

    offenders, snapshots = audit_windows(spark, qs)
    n_audited = sum(1 for n in qs if not n.startswith("streaming_"))
    changes = diff_snapshots(snapshots)
    import json as _json

    with open("/root/repo/PLAN_SNAPSHOTS.json", "w") as fh:
        _json.dump(snapshots, fh, indent=1, sort_keys=True)
    if changes:
        print(f"plan-shape changes vs committed snapshot ({len(changes)}):")
        for c in changes:
            print(" ", c)
    out += [
        "## Single-partition window audit",
        "",
        f"All {n_audited} non-streaming registered queries' physical plans",
        "checked for WindowExec nodes with no partition spec (the",
        "move-everything-to-one-task shape). Allowed, with reasons:",
        "",
    ]
    out += [
        f"- `{k}` — {v}" for k, v in sorted(GLOBAL_WINDOW_ALLOWLIST.items())
    ]
    out += ["", f"Offenders outside the allowlist: **{len(offenders)}**", ""]
    out += [f"- {o}" for o in offenders]
    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md with {len(HEADLINERS)} plans")
    if offenders:
        print(f"WINDOW AUDIT FAILED — {len(offenders)} offender(s):")
        for o in offenders:
            print(" ", o)
        spark.stop()
        sys.exit(1)
    print(f"window audit clean ({n_audited} queries)")
    spark.stop()


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1:  # takes no arguments; don't launch Spark on --help
        print(__doc__)
        print("usage: python tools/explain_audit.py   (no arguments)")
        sys.exit(0 if sys.argv[1] in ("-h", "--help") else 2)
    main()
