"""Round-10 batch-2 operators (T129–T132): CUPED uplift, NPMI pairs,
KMV bottom-k sketch, UCB1 arm scores. Tests run the REGISTERED queries
against hand-built parquet fixture dirs (same read path as the driver),
checking hand-computable statistical invariants; cross-engine value
exactness is pinned separately by the DuckDB oracles."""

from __future__ import annotations

import datetime as dt

import pytest

from ecommerce_event_pipeline_spark import registry


def _write_events(spark, path, rows):
    """rows: (event_id, ts, user_id, event_type, value, props)."""
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_docs(spark, path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ---------------------------------------------------------------------------
# T129 CUPED
# ---------------------------------------------------------------------------

def test_cuped_recovers_effect_when_covariate_explains_baseline(spark, tmp_path):
    # 56 users; baseline spend (u%7+1)*100 $ is independent of the
    # user_id%2 arm over this balanced design; post adds a flat +50 $
    # to the treatment arm → theta≈1, rho²≈1, cuped uplift ≈ 5000 cents
    rows = []
    eid = 0
    for u in range(56):
        base = float((u % 7 + 1) * 100)
        effect = 50.0 if u % 2 == 1 else 0.0
        eid += 1
        rows.append(
            (eid, dt.datetime(2024, 1, 2, 10), u, "purchase", base, "{}")
        )
        eid += 1
        rows.append(
            (eid, dt.datetime(2024, 1, 8, 10), u, "purchase", base + effect, "{}")
        )
        # bounds anchors so min/max dates are stable even at the edges
    rows.append((9998, dt.datetime(2024, 1, 1, 0), 0, "view", None, "{}"))
    rows.append((9999, dt.datetime(2024, 1, 9, 23), 1, "view", None, "{}"))
    _write_events(spark, str(tmp_path), rows)
    # cutover = jan1 + (8 // 2) = jan5 → jan2 is pre, jan8 is post
    r = registry.queries()["cuped_uplift"](spark, str(tmp_path)).collect()[0]
    assert r["treat_users"] == 28 and r["ctrl_users"] == 28
    assert r["theta"] == pytest.approx(1.0, abs=0.05)
    assert r["rho_sq"] > 0.9
    assert r["raw_uplift_cents"] == pytest.approx(5000.0, abs=1.0)
    assert r["cuped_uplift_cents"] == pytest.approx(5000.0, abs=1.0)


# ---------------------------------------------------------------------------
# T130 NPMI
# ---------------------------------------------------------------------------

def test_pmi_top_pair_is_engineered_collocation(spark, tmp_path):
    # 30 docs, all containing the ubiquitous "zzz"; "alpha beta" co-occur
    # in 10, alpha appears alone in 5 more → NPMI(alpha,beta) = ln2-based
    # positive, NPMI(·,zzz) = 0
    rows = []
    for d in range(10):
        rows.append((d, "alpha beta zzz", "en", "web", 14))
    for d in range(10, 15):
        rows.append((d, "alpha zzz", "en", "web", 9))
    for d in range(15, 30):
        rows.append((d, "filler zzz", "en", "web", 10))
    _write_docs(spark, str(tmp_path), rows)
    out = registry.queries()["token_pmi_pairs"](spark, str(tmp_path)).collect()
    assert out, "expected pairs"
    top = out[0]
    assert {top["token_a"], top["token_b"]} == {"alpha", "beta"}
    assert top["pair_docs"] == 10 and top["df_a"] == 15 and top["df_b"] == 10
    assert top["npmi"] > 0
    zero_pairs = [r for r in out if "zzz" in (r["token_a"], r["token_b"])]
    assert all(r["npmi"] == pytest.approx(0.0, abs=1e-9) for r in zero_pairs)


# ---------------------------------------------------------------------------
# T131 KMV
# ---------------------------------------------------------------------------

def test_kmv_is_exact_below_k(spark, tmp_path):
    rows = [
        (i, dt.datetime(2024, 3, 1, 12, 0, i), i % 10, "view", None, "{}")
        for i in range(40)
    ]
    _write_events(spark, str(tmp_path), rows)
    out = registry.queries()["kmv_daily_users"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["exact_users"] == 10
    assert r["sketch_size"] == 10
    assert r["kmv_estimate"] == pytest.approx(10.0)
    assert r["err_ppm"] == 0


def test_kmv_bottom_k_state_is_exactly_mergeable():
    # the property that licenses the bounded-state production path:
    # bottom-k of a union == bottom-k of the two bottom-k sets
    import random

    rng = random.Random(7)
    k = 64
    a = {rng.randrange(2**32) for _ in range(5000)}
    b = {rng.randrange(2**32) for _ in range(3000)}
    merged_sketches = sorted(
        set(sorted(a)[:k]) | set(sorted(b)[:k])
    )[:k]
    full = sorted(a | b)[:k]
    assert merged_sketches == full


# ---------------------------------------------------------------------------
# T132 UCB1
# ---------------------------------------------------------------------------

def test_ucb_exploration_bonus_prefers_undersampled_arm(spark, tmp_path):
    # two arms with the SAME empirical mean (0.1); the 10-trial arm must
    # outrank the 100-trial arm on UCB while trailing on trials
    rows = []
    eid = 0
    for _ in range(100):
        eid += 1
        rows.append((eid, dt.datetime(2024, 2, 1, 9), 1, "view", None, '{"k": 0}'))
    for _ in range(10):
        eid += 1
        rows.append((eid, dt.datetime(2024, 2, 1, 9), 2, "purchase", 5.0, '{"k": 0}'))
    for _ in range(10):
        eid += 1
        rows.append((eid, dt.datetime(2024, 2, 1, 9), 3, "view", None, '{"k": 1}'))
    eid += 1
    rows.append((eid, dt.datetime(2024, 2, 1, 9), 4, "purchase", 5.0, '{"k": 1}'))
    _write_events(spark, str(tmp_path), rows)
    out = registry.queries()["ucb_arm_scores"](spark, str(tmp_path)).collect()
    assert [r["arm"] for r in out] == [1, 0]
    by_arm = {r["arm"]: r for r in out}
    assert by_arm[0]["trials"] == 100 and by_arm[1]["trials"] == 10
    assert by_arm[0]["mean_reward"] == by_arm[1]["mean_reward"] == pytest.approx(0.1)
    assert by_arm[1]["ucb_score"] > by_arm[0]["ucb_score"]


# ---------------------------------------------------------------------------
# T136 Markov absorption / T137 p-chart (round-10 batch 4)
# ---------------------------------------------------------------------------

def test_markov_absorption_hand_computed(spark, tmp_path):
    import datetime as dt

    # two single-day user sessions:
    #   u1: view → click → purchase      u2: view → (end)
    # from 'view': 2 transitions → click 1/2, end 1/2
    # from 'click': 1 transition → purchase 1
    # absorb(view) = p_vc·p_cp / 1 = 0.5 ; absorb(click) = 1.0
    t0 = dt.datetime(2024, 5, 1, 9, 0, 0)
    rows = [
        (1, t0, 1, "view", None, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", None, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "purchase", 9.0, "{}"),
        (4, t0, 2, "view", None, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    out = registry.queries()["markov_absorption"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["view_transitions"] == 2 and r["click_transitions"] == 1
    assert r["p_view_click"] == pytest.approx(0.5)
    assert r["p_click_purchase"] == pytest.approx(1.0)
    assert r["absorb_view"] == pytest.approx(0.5)
    assert r["absorb_click"] == pytest.approx(1.0)


def test_pchart_flags_engineered_spike(spark, tmp_path):
    import datetime as dt

    # 9 quiet days at 2% errors (n=100), one day at 50%: only the spike
    # day breaches the 3σ binomial limit around the pooled center line
    rows = []
    eid = 0
    for day in range(1, 10):
        for i in range(100):
            eid += 1
            typ = "error" if i < 2 else "view"
            rows.append(
                (eid, dt.datetime(2024, 6, day, 10, 0, i % 60), i, typ, None, "{}")
            )
    for i in range(100):
        eid += 1
        typ = "error" if i < 50 else "view"
        rows.append(
            (eid, dt.datetime(2024, 6, 10, 10, 0, i % 60), i, typ, None, "{}")
        )
    _write_events(spark, str(tmp_path), rows)
    out = registry.queries()["error_rate_pchart"](spark, str(tmp_path)).collect()
    assert len(out) == 10
    flagged = [r for r in out if r["out_of_control"] == 1]
    assert [str(r["event_date"]) for r in flagged] == ["2024-06-10"]
    quiet = [r for r in out if r["out_of_control"] == 0]
    assert all(r["lcl"] <= r["error_rate"] <= r["ucl"] for r in quiet)


# ---------------------------------------------------------------------------
# T138 boilerplate fraction
# ---------------------------------------------------------------------------

def test_boilerplate_flags_shared_header_only_in_large_sources(spark, tmp_path):
    header = "home about contact menu login"
    rows = []
    # 25-doc source: every doc opens with the same 5-token header → the
    # header shingles exceed the 25% df bar and get flagged
    for d in range(25):
        body = f"unique{d} words{d} here{d} now{d} end{d}"
        text = f"{header} {body}"
        rows.append((d, text, "en", "bigsrc", len(text)))
    # 5-doc source with an identical pattern: exempt (under 20 docs)
    for d in range(25, 30):
        body = f"only{d} some{d} body{d} toks{d} tail{d}"
        text = f"{header} {body}"
        rows.append((d, text, "en", "smallsrc", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = registry.queries()["doc_boilerplate_fraction"](
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 30
    big = [r for r in out if r["source"] == "bigsrc"]
    small = [r for r in out if r["source"] == "smallsrc"]
    # 10 tokens → 8 shingles/doc; the 3 pure-header shingles ("home about
    # contact", …) are in all 25 docs → flagged; the seam and body
    # shingles contain per-doc tokens → unique
    assert all(r["boilerplate_shingles"] == 3 for r in big)
    assert all(r["boilerplate_fraction"] == pytest.approx(3 / 8) for r in big)
    assert all(r["boilerplate_shingles"] == 0 for r in small)
