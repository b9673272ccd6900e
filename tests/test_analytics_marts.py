"""Independent recomputation tests for the round-5 analytics marts.

Unlike the DuckDB oracles (which mirror the same SQL formula), these
re-derive expected values in pure Python from the raw sf0.001 parquet —
an arithmetic path that shares nothing with either engine, so a formula
transcribed wrong in BOTH the Spark query and its oracle still fails
here.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _duck(sql: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _query(spark, name):
    import __spark_entry__ as e

    return e.queries()[name](spark, SF)


class TestRevenueConcentration:
    def test_matches_pure_python_gini(self, spark):
        rows = _duck(
            "SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
            " FROM orders GROUP BY 1"
        )
        cents = sorted((c for _, c in rows), reverse=True)
        n, total = len(cents), sum(cents)
        got = _query(spark, "revenue_concentration").collect()[0].asDict()
        assert got["n_customers"] == n
        assert got["total_cents"] == total
        for p in (1, 5, 10, 25, 50):
            k = (n * p + 99) // 100
            assert got[f"top{p}_ppm"] == sum(cents[:k]) * 1_000_000 // total
        # Gini on ascending order with integer arithmetic throughout
        asc = cents[::-1]
        s1 = sum((i + 1) * x for i, x in enumerate(asc))
        gini_ppm = (2 * s1 - (n + 1) * total) * 1_000_000 // (n * total)
        assert got["gini_ppm"] == gini_ppm

    def test_share_monotonicity(self, spark):
        got = _query(spark, "revenue_concentration").collect()[0].asDict()
        shares = [got[f"top{p}_ppm"] for p in (1, 5, 10, 25, 50)]
        assert shares == sorted(shares)
        assert 0 <= got["gini_ppm"] < 1_000_000


class TestHoltBacktest:
    def test_matches_pure_python_fold(self, spark):
        rows = _duck(
            "SELECT CAST(ts AS DATE) AS day,"
            " SUM(CAST(ROUND(value * 100) AS BIGINT))"
            " FROM events WHERE event_type = 'purchase'"
            " GROUP BY 1 ORDER BY 1"
        )
        ys = [float(c) for _, c in rows]
        # identical operand order as both engines' folds
        expected = []
        for i in range(len(ys)):
            if i == 0:
                expected.append(ys[0])
                continue
            level, trend = 0.0, 0.0
            for j, y in enumerate(ys[:i]):
                if j == 0:
                    level, trend = y, 0.0
                else:
                    new_l = 0.5 * y + 0.5 * (level + trend)
                    trend = 0.3 * ((0.5 * y + 0.5 * (level + trend)) - level) + 0.7 * trend
                    level = new_l
            expected.append(level + trend)
        got = _query(spark, "holt_revenue_backtest").collect()
        assert len(got) == len(ys)
        for r, (day, cents), exp in zip(got, rows, expected):
            assert r["day"] == day
            assert r["actual_cents"] == cents
            # hashed projection carries FLOOR BIGINTs since round 7
            # (cross-engine ROUND(DOUBLE, n) semantics); the fold is
            # bit-identical, so the floors must match exactly
            assert r["forecast_floor_cents"] == math.floor(exp)
            assert r["abs_err_floor_cents"] == math.floor(
                abs(float(cents) - exp)
            )


class TestItemSimilarity:
    def test_matches_pure_python_topk(self, spark):
        rows = _duck("SELECT DISTINCT l_orderkey, l_partkey FROM lineitem")
        baskets: dict[int, set[int]] = {}
        for o, p in rows:
            baskets.setdefault(o, set()).add(p)
        n_ord: dict[int, int] = {}
        support: dict[tuple[int, int], int] = {}
        for parts in baskets.values():
            for p in parts:
                n_ord[p] = n_ord.get(p, 0) + 1
            sp = sorted(parts)
            for i, a in enumerate(sp):
                for b in sp[i + 1 :]:
                    support[(a, b)] = support.get((a, b), 0) + 1
        neigh: dict[int, list[tuple[int, int]]] = {}
        for (a, b), s in support.items():
            if s >= 2:
                neigh.setdefault(a, []).append((s, b))
                neigh.setdefault(b, []).append((s, a))
        expected = {}
        for pid, lst in neigh.items():
            lst.sort(key=lambda t: (-t[0], t[1]))
            for rk, (s, partner) in enumerate(lst[:3], start=1):
                cos = s / math.sqrt(float(n_ord[pid] * n_ord[partner]))
                expected[(pid, rk)] = (partner, s, round(cos, 6))
        got = _query(spark, "item_similarity_topk").collect()
        assert len(got) == len(expected)
        for r in got:
            partner, s, cos = expected[(r["part_id"], r["rk"])]
            assert (r["partner_id"], r["support"]) == (partner, s)
            assert r["cosine"] == pytest.approx(cos, abs=0)


class TestHistogramQuantileRollup:
    def test_estimates_match_pure_python_sketch(self, spark):
        rows = _duck(
            "SELECT CAST(date_trunc('week', ts) AS DATE) AS w,"
            " CAST(ROUND(value * 100) AS BIGINT)"
            " FROM events WHERE value IS NOT NULL"
        )
        weeks: dict[object, list[int]] = {}
        for w, c in rows:
            weeks.setdefault(w, []).append(min(c // 1000, 63))
        got = _query(spark, "histogram_quantile_rollup").collect()
        assert len(got) == len(weeks)
        for r in got:
            bins = sorted(weeks[r["week_start"]])
            n = len(bins)
            assert r["n_events"] == n
            from collections import Counter

            cnt = Counter(bins)
            for q in (50, 95, 99):
                # smallest bin whose cumulative count reaches q% — the
                # type-1 quantile read off the merged histogram
                cum, est = 0, None
                for b in sorted(cnt):
                    cum += cnt[b]
                    if cum * 100 >= q * n:
                        est = (b + 1) * 1000
                        break
                assert r[f"est_p{q}_cents"] == est

    def test_weekly_counts_partition_events(self, spark):
        got = _query(spark, "histogram_quantile_rollup").collect()
        (n,) = _duck(
            "SELECT COUNT(*) FROM events WHERE value IS NOT NULL"
        )[0]
        assert sum(r["n_events"] for r in got) == n


class TestBenfordScreen:
    def test_matches_pure_python_counts(self, spark):
        rows = _duck(
            "SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) FROM orders"
            " WHERE o_totalprice > 0"
        )
        counts = {d: 0 for d in range(1, 10)}
        for (c,) in rows:
            counts[int(str(c)[0])] += 1
        total = sum(counts.values())
        exp_ppm = {
            1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
            6: 66947, 7: 57992, 8: 51153, 9: 45757,
        }
        got = _query(spark, "benford_screen").collect()
        assert [r["digit"] for r in got] == list(range(1, 10))
        for r in got:
            d = r["digit"]
            obs = counts[d] * 1_000_000 // total
            assert r["cnt"] == counts[d]
            assert r["obs_ppm"] == obs
            assert r["dev_ppm"] == obs - exp_ppm[d]
            assert r["chi_ppm"] == (obs - exp_ppm[d]) ** 2 // exp_ppm[d]


class TestAbcClasses:
    def test_matches_pure_python_pareto(self, spark):
        rows = _duck(
            "SELECT l_partkey, SUM(CAST(ROUND(l_extendedprice *"
            " (1 - l_discount) * 100) AS BIGINT)) FROM lineitem GROUP BY 1"
        )
        ranked = sorted(rows, key=lambda t: (-t[1], t[0]))
        total = sum(c for _, c in ranked)
        cum, by_class = 0, {"A": [], "B": [], "C": []}
        for _, c in ranked:
            cum += c
            cls = "A" if cum * 100 <= total * 80 else (
                "B" if cum * 100 <= total * 95 else "C"
            )
            by_class[cls].append(c)
        got = {r["abc_class"]: r for r in _query(spark, "abc_inventory_classes").collect()}
        for cls, vals in by_class.items():
            if not vals:
                assert cls not in got
                continue
            r = got[cls]
            assert r["n_parts"] == len(vals)
            assert r["class_cents"] == sum(vals)
            assert r["share_ppm"] == sum(vals) * 1_000_000 // total
            assert r["min_cents"] == min(vals)
            assert r["max_cents"] == max(vals)


class TestRakeKeyphrases:
    def test_matches_pure_python_rake(self, spark):
        from ecommerce_event_pipeline_spark.queries.corpus import _RAKE_STOPWORDS

        docs = _duck("SELECT doc_id, text FROM documents")
        expected = {}
        for doc_id, text in docs:
            toks = text.split(" ")
            phrases: list[list[str]] = [[]]
            for w in toks:
                if w in _RAKE_STOPWORDS:
                    phrases.append([])
                else:
                    phrases[-1].append(w)
            phrases = [p for p in phrases if p]
            freq: dict[str, int] = {}
            deg: dict[str, int] = {}
            for p in phrases:
                for w in p:
                    freq[w] = freq.get(w, 0) + 1
                    deg[w] = deg.get(w, 0) + len(p)
            scored: dict[str, tuple[int, int]] = {}
            for p in phrases:
                s = sum(deg[w] for w in p)
                scored[" ".join(p)] = (s, len(p))
            ranked = sorted(scored.items(), key=lambda kv: (-kv[1][0], kv[0]))
            for rk, (phrase, (s, n)) in enumerate(ranked[:3], start=1):
                expected[(doc_id, rk)] = (phrase, s, n)
        got = _query(spark, "rake_keyphrases").collect()
        assert len(got) == len(expected)
        for r in got:
            phrase, s, n = expected[(r["doc_id"], r["rk"])]
            assert (r["phrase"], r["score"], r["n_words"]) == (phrase, s, n)


class TestPeakConcurrency:
    def test_matches_pure_python_sweep(self, spark):
        rows = _duck(
            "SELECT user_id, CAST(ts AS DATE) AS day, MIN(ts), MAX(ts)"
            " FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2"
        )
        deltas = []
        for uid, day, lo, hi in rows:
            deltas.append((lo, -1, uid))  # delta DESC → +1 first ⇒ sort
            deltas.append((hi, 1, uid))  # key uses negated delta
        deltas.sort(key=lambda t: (t[0], t[1], t[2]))
        conc, peak, starts = 0, {}, {}
        for ts, negd, _ in deltas:
            conc += -negd
            d = ts.date()
            peak[d] = max(peak.get(d, 0), conc)
            if negd == -1:
                starts[d] = starts.get(d, 0) + 1
        got = _query(spark, "peak_concurrency").collect()
        assert len(got) == len(peak)
        for r in got:
            assert r["peak_concurrent"] == peak[r["day"]]
            assert r["user_days_started"] == starts[r["day"]]


class TestHllSegmentOverlap:
    def test_union_bounds_and_exact_overlap(self, spark):
        """The query hashes only the integer register state (libm
        portability — see hll_distinct_daily); the ln()-derived estimates
        are reconstructed HERE from that state via hll_estimate_value and
        bounds-checked: union ≥ each side, inclusion-exclusion
        intersection within sketch error of the exact overlap."""
        from ecommerce_event_pipeline_spark.functions.sketch import (
            hll_estimate_value,
        )

        got = _query(spark, "hll_segment_overlap").collect()
        assert len(got) == 10  # C(5,2) event-type pairs
        exact = {}
        for a, b, n in _duck(
            "SELECT x.event_type, y.event_type, COUNT(*) FROM"
            " (SELECT DISTINCT event_type, user_id FROM events) x JOIN"
            " (SELECT DISTINCT event_type, user_id FROM events) y"
            " ON x.user_id = y.user_id AND x.event_type < y.event_type"
            " GROUP BY 1, 2"
        ):
            exact[(a, b)] = n
        for r in got:
            assert r["exact_intersect"] == exact.get((r["seg_a"], r["seg_b"]), 0)
            est_a = hll_estimate_value(r["v_zero_a"], r["sum_scaled_a"])
            est_b = hll_estimate_value(r["v_zero_b"], r["sum_scaled_b"])
            est_u = hll_estimate_value(r["v_zero_union"], r["sum_scaled_union"])
            # union of two sets is at least as big as either estimate
            assert est_u >= max(est_a, est_b) - 1e-9
            est_i = max(0.0, est_a + est_b - est_u)
            # inclusion-exclusion compounds three ±1.04/√256 sketches;
            # allow 3 × the summed std errors plus slack for tiny overlaps
            err = 3 * 1.04 / 16 * (est_a + est_b + est_u)
            assert abs(est_i - r["exact_intersect"]) <= err + 5.0, (
                r["seg_a"], r["seg_b"], est_i, r["exact_intersect"])


class TestHllEstimates:
    """Tolerance checks for the ln()-derived HLL estimates that the
    daily/weekly queries deliberately keep OUT of their hash-compared
    projections (cross-engine libm — CORRECTNESS_r05's only reds). The
    estimate is recomputed in pure Python from the bit-exact integer
    state each query DOES hash, and compared against the exact distinct
    count the same row carries."""

    @pytest.mark.parametrize(
        "name", ["hll_distinct_daily", "hll_weekly_rollup"]
    )
    def test_estimate_within_theory_error(self, spark, name):
        from ecommerce_event_pipeline_spark.functions.sketch import (
            hll_estimate_value,
        )

        rows = _query(spark, name).collect()
        assert rows
        for r in rows:
            est = hll_estimate_value(r["v_zero"], r["sum_scaled"])
            exact = r["exact_users"]
            # 3σ of the p=8 HLL (~1.04/√256 ≈ 6.5% rel.) + small-n slack
            assert abs(est - exact) <= 3 * 1.04 / 16 * exact + 5.0, (
                name, r, est)


class TestContrastivePairs:
    def test_matches_pure_python_mining(self, spark):
        import numpy as np

        rows = _duck("SELECT vec_id, label, embedding FROM embeddings")
        by_label: dict[str, list] = {}
        for vid, label, emb in rows:
            by_label.setdefault(label, []).append((vid, np.array(emb, dtype=np.float64)))
        expected = {}
        for label, vecs in by_label.items():
            for vid, e in vecs:
                cands = []
                for wid, f in vecs:
                    if wid == vid:
                        continue
                    # same sequential fold order as both engines
                    dot = 0.0
                    na = 0.0
                    nb = 0.0
                    for x, y in zip(e, f):
                        dot += x * y
                    for x in e:
                        na += x * x
                    for y in f:
                        nb += y * y
                    c = round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)
                    cands.append((c, wid))
                pos = sorted(
                    [t for t in cands if t[0] >= 0.35],
                    key=lambda t: (-t[0], t[1]),
                )
                if not pos:
                    continue
                expected[(vid, "positive", 1)] = (pos[0][1], label, pos[0][0])
                negs = sorted(
                    [t for t in cands if t[0] < 0.35],
                    key=lambda t: (-t[0], t[1]),
                )
                for rk, (c, wid) in enumerate(negs[:2], start=1):
                    expected[(vid, "hard_negative", rk)] = (wid, label, c)
        got = _query(spark, "contrastive_pairs").collect()
        assert len(got) == len(expected)
        for r in got:
            wid, label, c = expected[(r["anchor_id"], r["role"], r["rk"])]
            assert (r["partner_id"], r["label"]) == (wid, label)
            assert r["cosine_sim"] == pytest.approx(c, abs=0)


class TestTemperatureMixWeights:
    def test_matches_pure_python_weights(self, spark):
        rows = _duck("SELECT lang, COUNT(*) FROM documents GROUP BY 1")
        counts = dict(rows)
        total = sum(counts.values())
        z = 0.0
        for lang in sorted(counts):  # same fold order as the engines
            z += math.sqrt(float(counts[lang]))
        got = _query(spark, "temperature_mix_weights").collect()
        assert len(got) == len(counts)
        wsum = 0.0
        for r in got:
            n = counts[r["lang"]]
            w = math.sqrt(float(n)) / z
            assert r["n_docs"] == n
            assert r["weight"] == pytest.approx(round(w, 6), abs=0)
            assert r["boost"] == pytest.approx(
                round(w / (float(n) / total), 4), abs=0
            )
            wsum += r["weight"]
        assert wsum == pytest.approx(1.0, abs=1e-4)
        # temperature flattening: smallest language gets boost > 1,
        # largest gets boost < 1 (unless counts are all equal)
        lo = min(got, key=lambda r: r["n_docs"])
        hi = max(got, key=lambda r: r["n_docs"])
        if lo["n_docs"] != hi["n_docs"]:
            assert lo["boost"] > 1.0 > hi["boost"]



class TestSequenceFunnel:
    def test_matches_pure_python_walk(self, spark):
        rows = _duck(
            "SELECT user_id, event_type, ts FROM events ORDER BY user_id, ts"
        )
        by_user: dict[int, list] = {}
        for uid, et, ts in rows:
            by_user.setdefault(uid, []).append((ts, et))
        n1 = n2 = n3 = 0
        for evs in by_user.values():
            t1 = min((t for t, e in evs if e == "signup"), default=None)
            if t1 is None:
                continue
            n1 += 1
            t2 = min(
                (t for t, e in evs if e == "click" and t > t1), default=None
            )
            if t2 is None:
                continue
            n2 += 1
            if any(e == "purchase" and t > t2 for t, e in evs):
                n3 += 1
        got = {r["step"]: r for r in _query(spark, "sequence_funnel").collect()}
        assert got["1_signup"]["users"] == n1
        assert got["2_click"]["users"] == n2
        assert got["3_purchase"]["users"] == n3
        assert got["2_click"]["conv_ppm"] == n2 * 1_000_000 // n1
        assert got["3_purchase"]["conv_ppm"] == n3 * 1_000_000 // n2


class TestCohortLtvCurve:
    def test_cumulative_and_conservation(self, spark):
        got = _query(spark, "cohort_ltv_curve").collect()
        assert got
        # cumulative within each cohort is nondecreasing and LTV is the
        # exact integer division
        by_cohort: dict = {}
        for r in got:
            by_cohort.setdefault(r["cohort_week"], []).append(r)
            assert r["ltv_cents_per_user"] == r["cum_cents"] // r["cohort_users"]
        for rs in by_cohort.values():
            ages = [r["age_weeks"] for r in rs]
            assert ages == sorted(ages)
            cums = [r["cum_cents"] for r in rs]
            assert cums == sorted(cums)
        # the final cumulative across cohorts = total purchase cents
        (total,) = _duck(
            "SELECT SUM(CAST(ROUND(value * 100) AS BIGINT)) FROM events"
            " WHERE event_type = 'purchase'"
        )[0]
        assert sum(max(r["cum_cents"] for r in rs) for rs in by_cohort.values()) == total


class TestSessionDurationStats:
    def test_bounce_and_session_count_match_inferred_sessions(self, spark):
        import __spark_entry__ as e

        per_session = e.queries()["inferred_sessions"](spark, SF).collect()
        n = len(per_session)
        bounce = sum(1 for r in per_session if r["event_count"] == 1)
        got = _query(spark, "session_duration_stats").collect()[0]
        assert got["n_sessions"] == n
        assert got["bounce_sessions"] == bounce
        assert got["bounce_ppm"] == bounce * 1_000_000 // n
        durs = sorted(r["duration_seconds"] for r in per_session)
        assert got["max_duration_sec"] == durs[-1]


class TestItemRecHitrate:
    def test_identity_and_bounds(self, spark):
        got = _query(spark, "item_rec_hitrate").collect()[0]
        assert 0 <= got["n_hits"] <= got["n_test_baskets"]
        if got["n_test_baskets"]:
            assert got["hitrate_ppm"] == (
                got["n_hits"] * 1_000_000 // got["n_test_baskets"]
            )
        (n_train,) = _duck(
            "SELECT COUNT(DISTINCT l.l_orderkey) FROM lineitem l"
            " JOIN orders o ON o.o_orderkey = l.l_orderkey"
            " WHERE o.o_orderdate < DATE '2000-01-01'"
        )[0]
        assert got["n_train_orders"] == n_train


class TestNeymanAllocation:
    def test_matches_pure_python_allocation(self, spark):
        rows = _duck(
            "SELECT event_type, CAST(ROUND(value * 100) AS BIGINT)"
            " FROM events WHERE value IS NOT NULL"
        )
        strata: dict[str, list[int]] = {}
        for et, c in rows:
            strata.setdefault(et, []).append(c)
        sig = {}
        for et, xs in strata.items():
            n = len(xs)
            s1, s2 = sum(xs), sum(x * x for x in xs)
            sig[et] = math.sqrt((s2 - float(s1) * float(s1) / n) / (n - 1))
        z = 0.0
        for et in sorted(sig):
            z += len(strata[et]) * sig[et]
        got = _query(spark, "neyman_allocation").collect()
        assert len(got) == len(strata)
        for r in got:
            et = r["event_type"]
            assert r["n_rows"] == len(strata[et])
            assert r["sigma"] == pytest.approx(round(sig[et], 6), abs=0)
            assert r["alloc_n"] == math.floor(
                10000.0 * (len(strata[et]) * sig[et]) / z
            )
        # allocations use (almost) the whole budget
        assert 10000 - len(strata) < sum(r["alloc_n"] for r in got) <= 10000


class TestSupplierReliability:
    def test_matches_pure_python_sla(self, spark):
        rows = _duck(
            "SELECT li.l_suppkey, date_diff('day',"
            " CAST(o.o_orderdate AS DATE), CAST(li.l_shipdate AS DATE))"
            " FROM lineitem li JOIN orders o"
            " ON o.o_orderkey = li.l_orderkey"
        )
        agg: dict[int, list[int]] = {}
        for sk, lag in rows:
            agg.setdefault(sk, []).append(lag)
        got = {r["s_suppkey"]: r for r in _query(spark, "supplier_reliability").collect()}
        assert len(got) == len(agg)
        for sk, lags in agg.items():
            r = got[sk]
            late = sum(1 for g in lags if g > 90)
            assert r["n_items"] == len(lags)
            assert r["late_items"] == late
            assert r["late_ppm"] == late * 1_000_000 // len(lags)
            assert r["total_delay_days"] == sum(max(g - 90, 0) for g in lags)
            assert r["max_delay_days"] == max(max(g - 90, 0) for g in lags)


class TestNationMarketShare:
    def test_shares_partition_regions(self, spark):
        got = _query(spark, "nation_market_share").collect()
        by_region: dict[str, list] = {}
        for r in got:
            by_region.setdefault(r["region"], []).append(r)
        for region, rs in by_region.items():
            total = rs[0]["region_cents"]
            assert sum(r["cents"] for r in rs) == total
            for r in rs:
                assert r["region_cents"] == total
                assert r["share_ppm"] == r["cents"] * 1_000_000 // total
            # shares sum to ~1e6 (floor division loses < n_nations ppm)
            s = sum(r["share_ppm"] for r in rs)
            assert 1_000_000 - len(rs) < s <= 1_000_000


class TestScd2AsofSnapshot:
    def test_snapshot_counts_customers_once(self, spark):
        import __spark_entry__ as e

        hist = e.queries()["customer_value_scd2"](spark, SF).collect()
        import datetime

        d = datetime.date(1999, 1, 1)
        bands: dict[str, set] = {}
        for r in hist:
            if r["valid_from"] <= d and (
                r["valid_to"] is None or d < r["valid_to"]
            ):
                bands.setdefault(r["value_band"], set()).add(r["o_custkey"])
        # validity ranges are disjoint: no customer in two bands at once
        seen: set = set()
        for s in bands.values():
            assert not (seen & s)
            seen |= s
        got = {r["value_band"]: r for r in _query(spark, "scd2_asof_snapshot").collect()}
        assert set(got) == set(bands)
        for band, custs in bands.items():
            assert got[band]["customers"] == len(custs)
            assert got[band]["min_custkey"] == min(custs)
            assert got[band]["max_custkey"] == max(custs)



class TestPriceQuantityOls:
    def test_matches_pure_python_ols(self, spark):
        rows = _duck(
            "SELECT p_brand, CAST(ROUND(l_quantity) AS BIGINT),"
            " CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
            " FROM lineitem JOIN part ON l_partkey = p_partkey"
        )
        groups: dict[str, list[tuple[int, int]]] = {}
        for b, x, y in rows:
            groups.setdefault(b, []).append((int(x), int(y)))
        got = {r["p_brand"]: r for r in _query(spark, "price_quantity_ols").collect()}
        assert set(got) == set(groups)
        for b, xy in groups.items():
            n = len(xy)
            sx = sum(x for x, _ in xy)
            sy = sum(y for _, y in xy)
            sxx = sum(x * x for x, _ in xy)
            sxy = sum(x * y for x, y in xy)
            syy = sum(y * y for _, y in xy)
            cov = n * sxy - sx * sy
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            # exact-int → float conversions are correctly rounded in
            # Python, so this is bit-for-bit the engine formula
            slope = float(cov) / float(vx)
            r = got[b]
            assert r["n"] == n
            assert r["slope_cents_per_unit"] == pytest.approx(slope, abs=0)
            assert r["intercept_cents"] == pytest.approx(
                (float(sy) - slope * float(sx)) / float(n), abs=0
            )
            assert r["r2"] == pytest.approx(
                slope * (float(cov) / float(vy)), abs=0
            )

    def test_r2_bounds(self, spark):
        rows = _query(spark, "price_quantity_ols").collect()
        assert len(rows) == 25  # one per TPC-H brand
        for r in rows:
            # r² is a squared correlation (slope sign is data-dependent
            # at tiny SF: per-part unit prices dwarf the qty effect)
            assert 0.0 <= r["r2"] <= 1.0


class TestBehaviorEntropy:
    def test_matches_pure_python_entropy(self, spark):
        rows = _duck(
            "SELECT user_id, event_type, COUNT(*) FROM events GROUP BY 1, 2"
        )
        groups: dict[int, dict[str, int]] = {}
        for u, t, n in rows:
            groups.setdefault(u, {})[t] = int(n)
        got = {r["user_id"]: r for r in _query(spark, "behavior_entropy").collect()}
        assert set(got) == set(groups)
        for u, counts in groups.items():
            n = sum(counts.values())
            s = 0.0
            for t in sorted(counts):  # the engines' pinned fold order
                c = float(counts[t])
                s += c * math.log(c)
            h = math.log(float(n)) - s / float(n)
            r = got[u]
            assert r["n_events"] == n
            assert r["n_types"] == len(counts)
            assert r["entropy_nats"] == pytest.approx(h, abs=1e-6)
            if len(counts) > 1:
                assert r["evenness"] == pytest.approx(
                    h / math.log(float(len(counts))), abs=1e-6
                )
                assert 0.0 <= r["evenness"] <= 1.0
            else:
                assert r["evenness"] is None

    def test_uniform_mix_has_max_entropy(self, spark):
        # a user seeing every type equally often would have evenness 1;
        # nobody exceeds it and single-type users pin to zero entropy
        for r in _query(spark, "behavior_entropy").collect():
            if r["n_types"] == 1:
                assert r["entropy_nats"] == 0.0


class TestAnomalyScreens:
    """Float-value checks for the two anomaly screens whose z/deviation
    columns moved to exact integer ppm in round 7: recompute the float
    statistic in pure Python and confirm the integer ppm is its
    truncation, and the flag agrees with the float threshold."""

    @staticmethod
    def _daily_cents():
        return sorted(
            _duck(
                "SELECT CAST(ts AS DATE), "
                "SUM(CAST(ROUND(value * 100) AS BIGINT)) FROM events "
                "WHERE event_type = 'purchase' GROUP BY 1"
            )
        )

    @staticmethod
    def _median(xs):
        xs = sorted(xs)
        n = len(xs)
        lo, hi = xs[(n - 1) // 2], xs[n // 2]
        return lo * 0.5 + hi * 0.5

    @staticmethod
    def _trunc_div(n: int, d: int) -> int:
        # toward-zero integer division (Spark `div` / DuckDB `//`);
        # Python's // floors, which differs for negative numerators
        q = abs(n) // d
        return q if n >= 0 else -q

    def test_mad_ppm_matches_exact_integer_rule(self, spark):
        daily = self._daily_cents()
        med = self._median([c for _, c in daily])
        mad = self._median([abs(c - med) for _, c in daily])
        med2, mad4 = round(med * 2), round(mad * 4)
        for r in _query(spark, "mad_outlier_days").collect():
            assert r["med_x2"] == med2
            assert r["mad_x4"] == mad4
            dev2 = r["cents"] * 2 - med2
            assert r["robust_z_ppm"] == self._trunc_div(
                dev2 * 20_000_000_000, 14826 * mad4
            ), r
            assert r["is_outlier"] == (abs(dev2) * 20000 >= 44478 * mad4), r
            # and the integer ppm is within 1 of the truncated float z
            z = (r["cents"] - med) / (1.4826 * mad)
            assert abs(r["robust_z_ppm"] - z * 1_000_000) <= 1.0, (r, z)

    def test_weekday_ppm_matches_exact_integer_rule(self, spark):
        daily = self._daily_cents()
        by_wd = {}
        for day, cents in daily:
            by_wd.setdefault(day.weekday(), []).append(cents)
        med = {wd: self._median(v) for wd, v in by_wd.items()}
        for r in _query(spark, "weekday_seasonal_anomalies").collect():
            m = med[r["weekday"]]
            m2 = round(m * 2)
            assert r["wd_med_x2"] == m2
            dev2 = r["cents"] * 2 - m2
            assert r["dev_ppm"] == self._trunc_div(dev2 * 1_000_000, m2), r
            assert r["is_anomaly"] == (
                abs(dev2) * 1_000_000 >= 150_000 * m2
            ), r
            # and within 1 ppm of the float deviation
            dev = (r["cents"] - m) * 1_000_000 / m
            assert abs(r["dev_ppm"] - dev) <= 1.0, (r, dev)
