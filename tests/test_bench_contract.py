"""The driver records only the LAST 2000 characters of bench stdout —
BENCH_r04/r05 arrived ``parsed: null`` when the full query dict blew past
that. These tests pin the shedding contract in bench.build_stdout_lines
so a future window/probe change can't silently regress the one artifact
the driver grades."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

RATIO = {
    "ref": "bench_local_r09.json",
    "med": 2.79,
    "p90": 41.2,
    "max": 70.21,
    "max_q": "user_lifetime_incremental",
}


def _lines(n_front=50, name_len=24, probe="PROBE x=OK", n_total=186, **kw):
    names = [f"q{'x' * name_len}{i:03d}" for i in range(n_total)]
    timings = {n: 1.234 for n in names}
    return bench.build_stdout_lines(
        timings, names[:n_front], probe, 0.1, 21.2, **kw
    )


def test_normal_window_fits_without_shedding():
    probe, line = _lines()
    assert len(probe) + len(line) + 2 <= 2000
    payload = json.loads(line)
    assert "dropped" not in payload
    assert len(payload["queries"]) == 50
    assert payload["n_queries"] == 186
    assert payload["value"] == round(186 * 1.234, 3)


def test_oversized_window_sheds_loudly_and_stays_parseable():
    # 120-char names x 50 entries cannot fit in 2000 chars
    probe, line = _lines(name_len=120)
    assert len(probe) + len(line) + 2 <= 2000
    payload = json.loads(line)
    assert payload["dropped"] > 0
    assert len(payload["queries"]) + payload["dropped"] == 50
    # totals are unaffected by shedding
    assert payload["n_queries"] == 186


def test_runaway_probe_is_truncated_not_the_results_line():
    """A runaway probe ERR tail must never evict graded timings: the
    contract line is sized first and the probe only gets the leftover
    (priority: results line is the contract, probe is advisory)."""
    probe, line = _lines(probe="PROBE ERR[" + "e" * 3000 + "]")
    assert len(probe) + len(line) + 2 <= 2000
    payload = json.loads(line)  # the contract line survives intact
    assert payload["metric"] == "total_query_wall_time"
    # all 50 graded entries survive; only the probe was cut
    assert "dropped" not in payload
    assert len(payload["queries"]) == 50
    assert probe.startswith("PROBE ERR[")  # a diagnostic prefix remains


def test_probe_budget_reserve_matches_shedding_budget():
    """The shedding loop reserves MIN_PROBE chars; a normal-length probe
    then fits untruncated next to a full 50-entry line."""
    probe_in = "PROBE duckdb=1.0.0 pyspark=4.1.2 py=3.11.7 a=OK b=OK"
    probe, line = _lines(probe=probe_in)
    assert probe == probe_in  # healthy probes are never cut
    assert len(json.loads(line)["queries"]) == 50


def test_load_and_ratio_ride_in_the_parsed_payload():
    """VERDICT r9 item 4: loadavg samples + the driver/committed-local
    ratio summary must land in the driver-parsed JSON line so a
    stall-inflated record is adjudicable from the record itself."""
    probe, line = _lines(load=[8.8, 2.1], ratio_summary=RATIO)
    assert len(probe) + len(line) + 2 <= 2000
    payload = json.loads(line)
    assert payload["load"] == [8.8, 2.1]
    assert payload["ratio"]["med"] == 2.79
    assert payload["ratio"]["max_q"] == "user_lifetime_incremental"
    assert payload["ratio"]["ref"] == "bench_local_r09.json"


def test_new_fields_are_priced_into_the_shedding_budget():
    """With the diagnostics present, an oversized window still sheds
    loudly and the line stays parseable — the new fields must never
    push the contract line past the driver's capture."""
    probe, line = _lines(
        name_len=120, load=[1.0, 1.0], ratio_summary=RATIO
    )
    assert len(probe) + len(line) + 2 <= 2000
    payload = json.loads(line)
    assert payload["dropped"] > 0
    assert "load" in payload and "ratio" in payload


def test_pathological_ratio_query_name_is_clamped():
    """A 200-char max_q name must not eat the graded timings: it is
    clamped to 40 chars before pricing."""
    r = dict(RATIO, max_q="q" * 200)
    probe, line = _lines(load=[1.0, 1.0], ratio_summary=r)
    payload = json.loads(line)
    assert payload["ratio"]["max_q"] == "q" * 40
    assert len(payload["queries"]) + payload.get("dropped", 0) == 50


def test_stall_ratios_skips_unknown_names_and_foreign_sf():
    """stall_ratios must only compare apples: names missing from the
    committed record (or with sub-50 ms committed times) are skipped,
    and a run at a DIFFERENT scale factor than the committed record
    yields no ratios at all — a cross-sf ratio is scale difference,
    not stall evidence."""
    # committed records are at sf0.1; synthetic names absent from them
    ratios, summary = bench.stall_ratios(
        {"a": 1.0, "b": 2.0, "c": 9.0}, sf=0.1
    )
    assert ratios == {} and summary is None
    # real names, but a foreign sf: guard must refuse the comparison.
    # Pick the reference with the SAME numeric-round key stall_ratios
    # uses — a lexicographic sort diverges once r100 (or an unpadded r9)
    # exists and the test would validate against the wrong file.
    import glob
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = max(
        (
            (int(m.group(1)), p)
            for p in glob.glob(os.path.join(repo, "bench_local_r*.json"))
            if (m := re.fullmatch(r"bench_local_r(\d+)\.json", os.path.basename(p)))
        )
    )[1]
    rec = json.load(open(latest))
    real = dict(
        [(n, t) for n, t in rec["queries"].items() if t >= 0.1][:3]
    )
    ratios, summary = bench.stall_ratios(real, sf=0.01)
    assert ratios == {} and summary is None
    # same sf and real names: ratios of the record against itself are 1
    ratios, summary = bench.stall_ratios(real, sf=rec["sf"])
    assert summary is not None and summary["med"] == 1.0


def test_engine_primer_runs_on_a_live_session(spark):
    """The primer executes real engine paths (window, broadcast join,
    one streaming micro-batch); a PySpark API drift here would kill
    every bench run at warmup, so exercise it in the suite."""
    bench._engine_primer(spark, "/root/testdata/sf0.001")
    # the throwaway memory sink must not leak into the catalog
    assert not any(
        t.name == "bench_primer" for t in spark.catalog.listTables()
    )


def test_tail_position_clustering_in_summary():
    """VERDICT r10 item 5: the ratio summary must carry the top-decile
    tail's run-position median, span, and contiguity flag so "the tail
    is positional" reads straight from the record. Build a 30-query run
    (run order = dict order) whose 3 worst ratios sit contiguously at
    positions 20-22."""
    import glob
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = max(
        (
            (int(m.group(1)), p)
            for p in glob.glob(os.path.join(repo, "bench_local_r*.json"))
            if (m := re.fullmatch(r"bench_local_r(\d+)\.json", os.path.basename(p)))
        )
    )[1]
    rec = json.load(open(latest))
    names = [n for n, t in rec["queries"].items() if t >= 0.1][:30]
    assert len(names) == 30
    timings = {}
    for i, n in enumerate(names):
        mult = 20.0 if i in (19, 20, 21) else 1.0
        timings[n] = rec["queries"][n] * mult
    ratios, summary = bench.stall_ratios(timings, sf=rec["sf"])
    tail = summary["tail"]
    assert tail["span"] == [20, 22]
    assert tail["pos_med"] == 21
    assert tail["contig"] is True
    assert tail["clusters"] == 1  # one contiguous burst
    # scattered tail: same worst ratios at positions 1, 15, 30
    timings2 = {}
    for i, n in enumerate(names):
        mult = 20.0 if i in (0, 14, 29) else 1.0
        timings2[n] = rec["queries"][n] * mult
    _, summary2 = bench.stall_ratios(timings2, sf=rec["sf"])
    assert summary2["tail"]["contig"] is False
    assert summary2["tail"]["clusters"] == 3  # gaps 14 and 15 both > k=3


def test_tail_cluster_count_reads_two_bursts():
    """VERDICT r11 item 5: the r11 driver tail was two load bursts
    (positions 73-89 and 169-170) that the contiguity test correctly
    declined to flag — the cluster count must make "two bursts" readable
    straight from the record. Reproduce the shape at 30-query scale:
    worst ratios at positions 5-6 and 25 → two clusters, contig False."""
    import glob
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = max(
        (
            (int(m.group(1)), p)
            for p in glob.glob(os.path.join(repo, "bench_local_r*.json"))
            if (m := re.fullmatch(r"bench_local_r(\d+)\.json", os.path.basename(p)))
        )
    )[1]
    rec = json.load(open(latest))
    names = [n for n, t in rec["queries"].items() if t >= 0.1][:30]
    timings = {}
    for i, n in enumerate(names):
        mult = 20.0 if i in (4, 5, 24) else 1.0
        timings[n] = rec["queries"][n] * mult
    _, summary = bench.stall_ratios(timings, sf=rec["sf"])
    tail = summary["tail"]
    assert tail["contig"] is False
    assert tail["clusters"] == 2  # 5-6 packed (gap 1 ≤ k=3), 25 separate


def test_stalled_marker_requires_all_three_signals():
    """VERDICT r10 item 7: the stalled marker fires only on the full
    signature — load doubling AND >10x max ratio AND a contiguous
    tail — so a fast quiet run or a genuine plan regression is never
    mislabeled as a stall."""
    contig = {"max": 16.9, "tail": {"contig": True}}
    scattered = {"max": 16.9, "tail": {"contig": False}}
    mild = {"max": 3.0, "tail": {"contig": True}}
    assert bench.is_stalled(3.4, 7.6, contig) is True  # the r10 signature
    assert bench.is_stalled(3.4, 7.6, scattered) is False  # plan-shaped
    assert bench.is_stalled(3.4, 7.6, mild) is False  # no stall-grade tail
    assert bench.is_stalled(3.4, 3.5, contig) is False  # no load wave
    assert bench.is_stalled(0.1, 0.9, contig) is False  # idle-host floor
    assert bench.is_stalled(1.0, 5.0, None) is False  # no committed ref


def test_stalled_flag_rides_in_the_payload_and_is_priced():
    """stalled=true must land in the parsed line and participate in the
    shedding budget like every other diagnostic."""
    r = dict(RATIO, tail={"pos_med": 170, "span": [154, 186], "contig": True})
    probe, line = _lines(load=[3.4, 7.6], ratio_summary=r, stalled=True)
    assert len(probe) + len(line) + 2 <= 2000
    payload = json.loads(line)
    assert payload["stalled"] is True
    assert payload["ratio"]["tail"]["contig"] is True
    # oversized window: still parseable with the new fields present
    probe, line = _lines(
        name_len=120, load=[3.4, 7.6], ratio_summary=r, stalled=True
    )
    payload = json.loads(line)
    assert payload["dropped"] > 0 and payload["stalled"] is True


def test_run_order_rotates_by_round_and_is_a_permutation(tmp_path):
    """VERDICT r12 item 3: the timed execution order must rotate
    deterministically by round so a host-load burst at fixed run
    positions stops mapping to the same queries every round, while
    staying a rotation (not a shuffle) so the contiguity/cluster
    diagnostics in stall_ratios keep their meaning."""
    names = [f"q{i:03d}" for i in range(228)]
    orders = {r: bench.run_order(names, r) for r in (12, 13, 14)}
    for r, order in orders.items():
        assert sorted(order) == sorted(names), r  # permutation
        assert order == bench.run_order(names, r), r  # deterministic
        # a rotation: some split point reassembles the original list
        s = names.index(order[0])
        assert order == names[s:] + names[:s], r
    # consecutive rounds start far apart (the whole point)
    starts = {names.index(o[0]) for o in orders.values()}
    assert len(starts) == 3
    gaps = sorted(starts)
    assert min(
        (b - a) % len(names) for a, b in zip(gaps, gaps[1:])
    ) >= 20
    # degenerate inputs stay safe
    assert bench.run_order([], 13) == []
    assert bench.run_order(["only"], 13) == ["only"]


def test_detect_round_reads_driver_artifacts(tmp_path, monkeypatch):
    """Round = newest committed BENCH_r*.json + 1 (the driver runs bench
    before writing its record); fresh clone ⇒ round 1; decoy files that
    match the glob but not the exact name pattern are ignored."""
    assert bench.detect_round(str(tmp_path)) == 1
    (tmp_path / "BENCH_r03.json").write_text("{}")
    (tmp_path / "BENCH_r11.json").write_text("{}")
    (tmp_path / "BENCH_raw.json").write_text("{}")  # decoy
    assert bench.detect_round(str(tmp_path)) == 12
    # the repo itself: rotation shift recorded this round must match
    repo = os.path.dirname(os.path.abspath(bench.__file__))
    rnd = bench.detect_round(repo)
    assert rnd >= 13
