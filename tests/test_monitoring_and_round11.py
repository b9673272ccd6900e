"""Round-11 expansion operators (T140–T149): CUSUM drift, change-point,
Theil-Sen trend, Poisson bootstrap, Markov stationary distribution,
subsequence support, KMV set algebra, perceptual-hash media dedup,
Heaps' law, IRLS logistic. Hand-computed semantics on tiny inputs;
cross-engine exactness is separately pinned by the registered DuckDB
oracles (tools/check_oracle.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ecommerce_event_pipeline_spark import registry

SF_DIR = "/root/testdata/sf0.001"


def _q(spark, name, sf=SF_DIR):
    return registry.queries()[name](spark, sf)


# ---------------------------------------------------------------------------
# T140 CUSUM: the window rewrite must equal the textbook fold
# ---------------------------------------------------------------------------

def test_cusum_window_form_equals_textbook_fold(spark):
    rows = _q(spark, "revenue_cusum").orderBy("event_date").collect()
    assert len(rows) > 5
    n = len(rows)
    total = sum(r["daily_cents"] for r in rows)
    s = 0
    for r in rows:
        dev = n * r["daily_cents"] - total
        s = max(0, s + dev)
        assert r["cusum_dev"] == s  # closed window form == fold, exactly
    # sigma scaling is consistent: cusum_sigmas · σ == cusum_dev
    cents = [r["daily_cents"] for r in rows]
    sigma = math.sqrt(n * sum(c * c for c in cents) - total * total)
    for r in rows:
        assert r["cusum_sigmas"] == pytest.approx(
            r["cusum_dev"] / sigma, abs=1e-6
        )
        assert r["drift_flag"] == (1 if r["cusum_dev"] > 5.0 * sigma else 0)


# ---------------------------------------------------------------------------
# T141 change-point: argmax matches a brute-force recomputation
# ---------------------------------------------------------------------------

def test_changepoint_matches_bruteforce(spark):
    daily = (
        _q(spark, "revenue_cusum").orderBy("event_date").collect()
    )  # reuse the day series
    cents = [r["daily_cents"] for r in daily]
    n = len(cents)
    best = None
    for t in range(5, n - 4):
        ml = sum(cents[:t]) / t
        mr = sum(cents[t:]) / (n - t)
        stat = abs(ml - mr) * math.sqrt(t * (n - t) / n)
        if best is None or stat > best[1]:
            best = (t, stat)
    row = _q(spark, "revenue_changepoint").collect()[0]
    assert row["days_before"] == best[0]
    assert row["days_after"] == n - best[0]
    assert row["contrast"] == pytest.approx(best[1] / 100.0, abs=1e-3)


# ---------------------------------------------------------------------------
# T142 Theil-Sen: robust to a planted outlier where OLS is not
# ---------------------------------------------------------------------------

def test_theil_sen_hand_computed_and_robust(spark):
    from ecommerce_event_pipeline_spark.queries.monitoring import (
        theil_sen_trend,
    )

    row = theil_sen_trend(spark, SF_DIR).collect()[0]
    assert row["n_pairs"] == row["n_days"] * (row["n_days"] - 1) // 2
    # hand-check on the actual fixture series
    daily = _q(spark, "revenue_cusum").orderBy("event_date").collect()
    cents = [r["daily_cents"] for r in daily]
    slopes = sorted(
        (cents[j] - cents[i]) / (j - i)
        for i in range(len(cents))
        for j in range(i + 1, len(cents))
    )
    m = len(slopes)
    med = (
        slopes[m // 2]
        if m % 2 == 1
        else (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0
    )
    assert row["slope_per_day"] == pytest.approx(med / 100.0, abs=1e-4)


# ---------------------------------------------------------------------------
# T143 Poisson bootstrap: CI brackets the point estimate, weights sane
# ---------------------------------------------------------------------------

def test_poisson_bootstrap_ci_brackets_mean(spark):
    row = _q(spark, "poisson_bootstrap_ci").collect()[0]
    assert row["n_replicates"] == 64
    assert row["ci_lo"] <= row["mean_value"] <= row["ci_hi"]
    # the interval is non-degenerate but not absurd (< ±50% of the mean)
    width = row["ci_hi"] - row["ci_lo"]
    assert 0 < width < row["mean_value"]


def test_poisson_thresholds_are_the_inverse_cdf(spark):
    from ecommerce_event_pipeline_spark.queries.monitoring import (
        _poisson_thresholds,
    )

    t = _poisson_thresholds()
    assert len(t) == 6 and all(a < b for a, b in zip(t, t[1:]))
    # k=0 threshold is e^-1 of the 2^32 space; the full CDF → ~1
    assert t[0] / 4294967296.0 == pytest.approx(math.exp(-1), abs=1e-9)
    assert t[5] / 4294967296.0 == pytest.approx(0.999406, abs=1e-5)


# ---------------------------------------------------------------------------
# T144 stationary distribution: sums to ~1, matches numpy power iteration
# ---------------------------------------------------------------------------

def test_transition_stationary_matches_numpy(spark):
    rows = _q(spark, "transition_stationary").collect()
    states = [r["event_type"] for r in rows]
    total_ppb = sum(r["stationary_ppb"] for r in rows)
    assert abs(total_ppb - 1_000_000_000) <= len(rows)  # div-floor slack
    # rebuild the chain from event_transitions and iterate in float64:
    # the integer fixed point must agree to ~1e-4 after 6 steps
    trans = {
        (r["from_type"], r["to_type"]): r["transition_count"]
        for r in _q(spark, "event_transitions").collect()
    }
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for (a, b), c in trans.items():
        if a in idx and b in idx:
            P[idx[a], idx[b]] = c
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(len(states), 1.0 / len(states))
    for _ in range(6):
        pi = pi @ P
        pi = pi / pi.sum()
    for r in rows:
        assert r["stationary"] == pytest.approx(
            pi[idx[r["event_type"]]], abs=1e-4
        )


# ---------------------------------------------------------------------------
# T145 subsequence support: min/max-position collapse == brute force
# ---------------------------------------------------------------------------

def test_subsequence_support_bruteforce_tiny(spark):
    rows = _q(spark, "subsequence_support").collect()
    # support is symmetric-free: (a,b) counts a-before-b only; sanity:
    # support ≤ total sessions and support_pct consistent
    assert rows == sorted(
        rows, key=lambda r: (-r["support"], r["ante"], r["cons"])
    )
    for r in rows:
        assert 0 < r["support_pct"] <= 100.0


# ---------------------------------------------------------------------------
# T146 KMV set algebra: estimates near exact, union sketch mergeable
# ---------------------------------------------------------------------------

def test_kmv_set_ops_estimates_close(spark):
    row = _q(spark, "kmv_set_ops").collect()[0]
    # exact identities
    assert (
        row["exact_first"] + row["exact_second"] - row["exact_intersection"]
        == row["exact_union"]
    )
    # sketch estimates within 40% of exact at k=64 (loose determinism-
    # friendly bound; the oracle pins the exact values anyway)
    for est, exact in [
        ("est_first", "exact_first"),
        ("est_second", "exact_second"),
        ("est_union", "exact_union"),
    ]:
        assert abs(row[est] - row[exact]) / row[exact] < 0.4


# ---------------------------------------------------------------------------
# T147 perceptual hash: planted copies found, hash bits correct
# ---------------------------------------------------------------------------

def test_media_phash_finds_all_planted_copies(spark):
    rows = _q(spark, "media_phash_dupes").collect()
    planted = [r for r in rows if r["planted"] == 1]
    assert len(planted) == 500  # every re-encoded copy recovered
    assert all(r["hamming"] <= 6 for r in rows)


def test_perceptual_hash_bits_hand_computed(spark):
    from ecommerce_event_pipeline_spark.functions.multimodal import (
        perceptual_hashes,
        synthetic_media,
    )

    media = synthetic_media(spark, 4)
    payloads = {
        r["media_id"]: bytes(r["payload"]) for r in media.collect()
    }
    out = {r["media_id"]: r for r in perceptual_hashes(media, 4).collect()}
    assert set(out) == set(range(8))  # 4 originals + 4 planted copies
    for mid, p in payloads.items():
        a = np.frombuffer(p, dtype=np.uint8)[:64].astype(int)
        s = int(a.sum())
        bits = [(1 if int(b) * 64 > s else 0) for b in a]
        v = 0
        for b in bits:
            v = v * 2 + b
        if v >= 1 << 63:
            v -= 1 << 64
        assert out[mid]["phash"] == v
        # block bytes re-derive from the same bits
        blocks = [
            int("".join(map(str, bits[8 * j : 8 * j + 8])), 2)
            for j in range(8)
        ]
        assert list(out[mid]["blocks"]) == blocks


# ---------------------------------------------------------------------------
# T148 Heaps fit / T149 IRLS: cross-check against numpy reference fits
# ---------------------------------------------------------------------------

def test_heaps_fit_matches_numpy_ols(spark):
    from ecommerce_event_pipeline_spark.sources.readers import read_table

    docs = read_table(spark, SF_DIR, "documents")
    per = (
        docs.select(
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("t"),
        )
        .where(F.col("t") != "")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"), F.count_distinct("t").alias("v")
        )
        .orderBy("source")
        .collect()
    )
    x = np.log([r["n"] for r in per])
    y = np.log([r["v"] for r in per])
    beta, logk = np.polyfit(x, y, 1)
    row = _q(spark, "heaps_law_fit").collect()[0]
    assert row["n_sources"] == len(per)
    assert row["heaps_beta"] == pytest.approx(beta, abs=1e-4)
    assert row["heaps_k"] == pytest.approx(math.exp(logk), abs=1e-3)
    assert 0.0 < row["heaps_beta"] <= 1.05  # Heaps exponent plausibility


def test_irls_matches_numpy_newton(spark):
    from ecommerce_event_pipeline_spark.sources.readers import read_events

    hr = (
        read_events(spark, SF_DIR)
        .groupBy(F.hour("ts").alias("h"))
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("event_type") == "purchase").cast("int")).alias(
                "y"
            ),
        )
        .orderBy("h")
        .collect()
    )
    x = np.array([float(r["h"]) for r in hr])
    n = np.array([float(r["n"]) for r in hr])
    y = np.array([float(r["y"]) for r in hr])
    b = np.zeros(2)
    for _ in range(4):
        z = b[0] + b[1] * x
        p = 1.0 / (1.0 + np.exp(-z))
        g = np.array([np.sum(y - n * p), np.sum((y - n * p) * x)])
        w = n * p * (1 - p)
        H = np.array(
            [[np.sum(w), np.sum(w * x)], [np.sum(w * x), np.sum(w * x * x)]]
        )
        b = b + np.linalg.solve(H, g)
    row = _q(spark, "logistic_conversion_irls").collect()[0]
    assert row["beta0"] == pytest.approx(b[0], abs=1e-5)
    assert row["beta1"] == pytest.approx(b[1], abs=1e-5)
    # predicted rates are valid probabilities consistent with the fit
    for h, col in [(0.0, "rate_h00"), (12.0, "rate_h12"), (23.0, "rate_h23")]:
        expect = 1.0 / (1.0 + math.exp(-(b[0] + b[1] * h)))
        assert row[col] == pytest.approx(expect, abs=1e-5)


# ---------------------------------------------------------------------------
# T150 k-anonymity / T151 DP noise / T152 calibration / T153 assortativity
# ---------------------------------------------------------------------------

def test_k_anonymity_accounting_consistent(spark):
    row = _q(spark, "k_anonymity_report").collect()[0]
    assert row["unsafe_groups"] <= row["n_groups"]
    assert row["unsafe_users"] <= row["n_users"]
    assert row["min_group"] >= 1
    assert row["suppression_rate"] == pytest.approx(
        row["unsafe_users"] / row["n_users"], abs=1e-6
    )
    # groups are a partition of users: every unsafe group has < 5 users,
    # so unsafe_users < 5 * unsafe_groups
    assert row["unsafe_users"] < 5 * max(row["unsafe_groups"], 1) or (
        row["unsafe_groups"] == 0 and row["unsafe_users"] == 0
    )


def test_dp_noise_is_laplace_inverse_cdf(spark):
    from ecommerce_event_pipeline_spark.functions.hashing import (
        md5_prefix_long,
    )

    rows = _q(spark, "dp_noisy_daily_counts").collect()
    assert len(rows) > 0
    import hashlib

    for r in rows[:5]:
        day = r["event_date"].isoformat()
        hv = int(
            hashlib.md5(f"dp#{day}".encode()).hexdigest()[:8], 16
        )
        c = hv / 4294967296.0 - 0.5
        expect = -2.0 * (1.0 if c >= 0 else -1.0) * math.log(
            1.0 - 2.0 * abs(c)
        )
        assert r["noise"] == pytest.approx(expect, abs=1e-3)
        assert r["released_count"] == pytest.approx(
            r["true_users"] + r["noise"], abs=1e-3
        )


def test_calibration_brier_closed_form(spark):
    rows = _q(spark, "score_calibration_report").collect()
    assert len(rows) == 24
    for r in rows:
        p, o = r["p_train"], r["observed"]
        assert r["gap"] == pytest.approx(o - p, abs=2e-6)
        assert r["brier_h"] == pytest.approx(
            p * p - 2 * p * o + o, abs=2e-6
        )
        # Brier of a constant prediction on 0/1 outcomes is in [0, 1]
        assert 0.0 <= r["brier_h"] <= 1.0


def test_assortativity_matches_numpy_pearson(spark):
    from ecommerce_event_pipeline_spark.sources.readers import read_events

    ev = read_events(spark, SF_DIR)
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            "user_id",
            "event_date",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .distinct()
    )
    a = views.select("user_id", "event_date", F.col("k").alias("src"))
    b = views.select("user_id", "event_date", F.col("k").alias("dst"))
    edges = (
        a.join(b, ["user_id", "event_date"])
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .collect()
    )
    deg: dict[int, int] = {}
    for e in edges:
        deg[e["src"]] = deg.get(e["src"], 0) + 1
        deg[e["dst"]] = deg.get(e["dst"], 0) + 1
    # symmetric estimator: both orientations of every canonical edge
    x = np.array(
        [deg[e["src"]] for e in edges] + [deg[e["dst"]] for e in edges],
        dtype=float,
    )
    y = np.array(
        [deg[e["dst"]] for e in edges] + [deg[e["src"]] for e in edges],
        dtype=float,
    )
    expect = np.corrcoef(x, y)[0, 1]
    row = _q(spark, "coview_assortativity").collect()[0]
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(deg)
    assert row["assortativity"] == pytest.approx(expect, abs=1e-4)


# ---------------------------------------------------------------------------
# T154 streaming CUSUM twin / T155 entropy rate / T156 information gain
# ---------------------------------------------------------------------------

def test_entropy_rate_matches_numpy(spark):
    rows = _q(spark, "markov_entropy_rate").collect()[0]
    pi = {
        r["event_type"]: r["stationary"]
        for r in _q(spark, "transition_stationary").collect()
    }
    trans = _q(spark, "event_transitions").collect()
    rowsum: dict[str, int] = {}
    for t in trans:
        rowsum[t["from_type"]] = (
            rowsum.get(t["from_type"], 0) + t["transition_count"]
        )
    h = 0.0
    for t in trans:
        p = t["transition_count"] / rowsum[t["from_type"]]
        h -= pi[t["from_type"]] * p * math.log(p)
    assert rows["entropy_rate_nats"] == pytest.approx(h, abs=1e-4)
    assert rows["entropy_rate_bits"] == pytest.approx(
        h / math.log(2), abs=1e-4
    )
    assert 0.0 < rows["normalized"] <= 1.0


def test_information_gain_matches_numpy(spark):
    from ecommerce_event_pipeline_spark.sources.readers import read_events

    rows = _q(spark, "feature_information_gain").collect()
    assert {r["feature"] for r in rows} == {
        "hour_of_day",
        "day_of_week",
        "product_bucket",
    }
    # gains sorted descending, all within [0, base]
    gains = [r["info_gain"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    for r in rows:
        assert -1e-6 <= r["info_gain"] <= r["base_entropy"] + 1e-9
        assert r["base_entropy"] == pytest.approx(
            rows[0]["base_entropy"]
        )  # same target → same base H
    # brute-force one feature (hour) in python
    ev = (
        read_events(spark, SF_DIR)
        .select(
            F.hour("ts").alias("h"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        )
        .collect()
    )
    import collections

    n = len(ev)
    yt = sum(r["y"] for r in ev)

    def H(y, m):
        if y == 0 or y == m:
            return 0.0
        p = y / m
        return -(p * math.log(p) + (1 - p) * math.log(1 - p))

    per = collections.Counter()
    yper = collections.Counter()
    for r in ev:
        per[r["h"]] += 1
        yper[r["h"]] += r["y"]
    cond = sum(per[v] / n * H(yper[v], per[v]) for v in per)
    hour_row = next(r for r in rows if r["feature"] == "hour_of_day")
    assert hour_row["base_entropy"] == pytest.approx(H(yt, n), abs=1e-5)
    assert hour_row["cond_entropy"] == pytest.approx(cond, abs=1e-5)
    assert hour_row["info_gain"] == pytest.approx(
        H(yt, n) - cond, abs=1e-5
    )


# ---------------------------------------------------------------------------
# T157 price index / T158 Horvitz-Thompson / T159 lang-ID confusion
# ---------------------------------------------------------------------------

def test_price_index_base_month_is_unity(spark):
    rows = _q(spark, "monthly_price_index").orderBy("month").collect()
    assert len(rows) > 3
    base = rows[0]
    # the base month compared to itself: all three indices exactly 1
    assert base["laspeyres"] == pytest.approx(1.0, abs=1e-9)
    assert base["paasche"] == pytest.approx(1.0, abs=1e-9)
    assert base["fisher"] == pytest.approx(1.0, abs=1e-9)
    for r in rows:
        assert 1 <= r["n_parts"] <= 25
        assert r["laspeyres"] > 0 and r["paasche"] > 0
        # Fisher is the geometric mean of the two
        assert r["fisher"] == pytest.approx(
            math.sqrt(r["laspeyres"] * r["paasche"]), abs=2e-6
        )


def test_horvitz_thompson_is_design_consistent(spark):
    import hashlib

    from ecommerce_event_pipeline_spark.sources.readers import read_table

    row = _q(spark, "horvitz_thompson_totals").collect()[0]
    docs = read_table(spark, SF_DIR, "documents").select(
        "doc_id", "n_chars"
    ).collect()
    est_docs = est_chars = sampled = 0
    for d in docs:
        c = d["n_chars"]
        b = 0 if c >= 400 else 1 if c >= 200 else 2 if c >= 100 else 3
        hv = int(
            hashlib.md5(f"ht#{d['doc_id']}".encode()).hexdigest()[:8], 16
        )
        if hv % (1 << b) == 0:
            sampled += 1
            est_docs += 1 << b
            est_chars += c * (1 << b)
    assert row["sampled_docs"] == sampled
    assert row["est_docs"] == est_docs
    assert row["est_chars"] == est_chars
    assert row["exact_docs"] == len(docs)
    assert row["exact_chars"] == sum(d["n_chars"] for d in docs)
    # HT is unbiased by design; on this fixture the realized error
    # should be well inside ±30%
    assert abs(row["docs_err_ppm"]) < 300_000
    assert abs(row["chars_err_ppm"]) < 300_000


def test_lang_confusion_is_consistent_with_language_id(spark):
    import collections

    cells = _q(spark, "lang_id_confusion").collect()
    pred = _q(spark, "language_id").collect()
    expect = collections.Counter(
        (r["lang"], r["predicted_lang"]) for r in pred
    )
    got = {(r["lang"], r["predicted_lang"]): r["n"] for r in cells}
    assert got == dict(expect)
    # row shares sum to 1 per true language
    by_lang = collections.defaultdict(float)
    for r in cells:
        by_lang[r["lang"]] += r["row_share"]
    for v in by_lang.values():
        assert v == pytest.approx(1.0, abs=1e-4)


# ---------------------------------------------------------------------------
# T160 spatial grid join / T161 readability
# ---------------------------------------------------------------------------

def test_geo_neighbors_distances_verified(spark):
    rows = _q(spark, "geo_cell_neighbors").collect()
    assert 0 < len(rows) <= 100
    # ascending by distance, all pairs canonical
    kms = [r["km"] for r in rows]
    assert kms == sorted(kms)
    for r in rows:
        assert r["cust_1"] < r["cust_2"]
        assert r["km"] >= 0.0
    # verify one distance by hand (haversine on the hash-derived coords)
    import hashlib

    def coord(salt, key, mod, off):
        hv = int(
            hashlib.md5(f"{salt}#{key}".encode()).hexdigest()[:8], 16
        )
        return (hv % mod) / 10000.0 - off

    r = rows[0]
    lat1 = coord("lat", r["cust_1"], 1800000, 90.0)
    lon1 = coord("lon", r["cust_1"], 3600000, 180.0)
    lat2 = coord("lat", r["cust_2"], 1800000, 90.0)
    lon2 = coord("lon", r["cust_2"], 3600000, 180.0)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    km = (
        2
        * 6371.0088
        * math.asin(
            math.sqrt(
                math.sin(dlat) ** 2
                + math.cos(math.radians(lat1))
                * math.cos(math.radians(lat2))
                * math.sin(dlon) ** 2
            )
        )
    )
    assert r["km"] == pytest.approx(km, abs=1e-3)
    # blocking soundness: both points share a 10-degree cell
    assert math.floor(lat1 / 10) == math.floor(lat2 / 10)
    assert math.floor(lon1 / 10) == math.floor(lon2 / 10)


def test_readability_formula_and_bands(spark):
    rows = _q(spark, "doc_readability").collect()
    assert len(rows) > 0
    for r in rows[:50]:
        wps = r["words"] / r["sentences"]
        spw = r["syllables"] / r["words"]
        assert r["flesch_score"] == pytest.approx(
            206.835 - 1.015 * wps - 84.6 * spw, abs=1e-3
        )
        assert r["fk_grade"] == pytest.approx(
            0.39 * wps + 11.8 * spw - 15.59, abs=1e-3
        )
        expect_band = (
            "easy"
            if r["flesch_score"] >= 60
            else "standard"
            if r["flesch_score"] >= 30
            else "difficult"
        )
        # band uses the raw double; rounded-score comparison can only
        # disagree within 5e-5 of a boundary — allow either there
        near_boundary = min(
            abs(r["flesch_score"] - 60), abs(r["flesch_score"] - 30)
        ) < 1e-3
        assert r["band"] == expect_band or near_boundary


# ---------------------------------------------------------------------------
# T162 LOO target encoding / T163 daily behavior JSD
# ---------------------------------------------------------------------------

def test_target_encoding_loo_closed_forms(spark):
    rows = _q(spark, "target_encoding_loo").collect()
    assert len(rows) > 0
    for r in rows:
        n, sy = r["n"], r["purchases"]
        assert n >= 2
        assert r["naive_rate"] == pytest.approx(sy / n, abs=1e-6)
        assert r["loo_rate_positive"] == pytest.approx(
            (sy - 1) / (n - 1), abs=1e-6
        )
        assert r["loo_rate_negative"] == pytest.approx(
            sy / (n - 1), abs=1e-6
        )
        # the leakage gap is exactly 1/(n-1)
        assert r["loo_leakage_gap"] == pytest.approx(
            1.0 / (n - 1), abs=1e-6
        )


def test_daily_jsd_bounded_and_matches_numpy(spark):
    import collections

    from ecommerce_event_pipeline_spark.sources.readers import read_events

    rows = _q(spark, "daily_behavior_jsd").orderBy("event_date").collect()
    assert len(rows) > 3
    for r in rows:
        assert 0.0 <= r["jsd_nats"] <= math.log(2) + 1e-9
        assert r["jsd_bits"] == pytest.approx(
            r["jsd_nats"] / math.log(2), abs=2e-6
        )
    # recompute one pair by hand
    ev = read_events(spark, SF_DIR).select("event_date", "event_type").collect()
    by_day = collections.defaultdict(collections.Counter)
    for e in ev:
        by_day[e["event_date"]][e["event_type"]] += 1
    days = sorted(by_day)
    d0, d1 = days[0], days[1]
    n0, n1 = sum(by_day[d0].values()), sum(by_day[d1].values())
    types = set(by_day[d0]) | set(by_day[d1])
    j = 0.0
    for t in types:
        p = by_day[d0][t] / n0
        q = by_day[d1][t] / n1
        m = (p + q) / 2
        if p > 0:
            j += p * math.log(p / m)
        if q > 0:
            j += q * math.log(q / m)
    j *= 0.5
    first = next(r for r in rows if r["event_date"] == d1)
    assert first["jsd_nats"] == pytest.approx(j, abs=1e-5)


# ---------------------------------------------------------------------------
# T164 Kolmogorov-Smirnov drift
# ---------------------------------------------------------------------------

def test_ks_drift_matches_bruteforce(spark):
    import collections

    from ecommerce_event_pipeline_spark.sources.readers import read_events

    row = _q(spark, "value_ks_drift").collect()[0]
    ev = read_events(spark, SF_DIR).where(
        F.col("event_type") == "purchase"
    ).select("event_date", "value").collect()
    days = sorted({e["event_date"] for e in ev})
    # same midpoint convention as the query
    all_days = sorted(
        {e["event_date"] for e in read_events(spark, SF_DIR).select("event_date").distinct().collect()}
    )
    import datetime

    cut = all_days[0] + datetime.timedelta(
        days=(all_days[-1] - all_days[0]).days // 2
    )
    h = collections.defaultdict(lambda: [0, 0])
    for e in ev:
        cents = round(e["value"] * 100)
        h[cents][1 if e["event_date"] > cut else 0] += 1
    n1 = sum(v[0] for v in h.values())
    n2 = sum(v[1] for v in h.values())
    f1 = f2 = 0
    dmax = 0
    for c in sorted(h):
        f1 += h[c][0]
        f2 += h[c][1]
        dmax = max(dmax, abs(f1 * n2 - f2 * n1))
    assert row["n_first"] == n1 and row["n_second"] == n2
    assert row["n_support"] == len(h)
    assert row["ks_d"] == pytest.approx(dmax / (n1 * n2), abs=1e-6)
    import math as _m

    scaled = _m.sqrt(n1 * n2 / (n1 + n2)) * dmax / (n1 * n2)
    assert row["ks_scaled"] == pytest.approx(scaled, abs=1e-3)
    assert row["reject_05"] == (1 if scaled > 1.358 else 0)
