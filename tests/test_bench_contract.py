"""The driver records only the LAST 2000 characters of bench stdout —
BENCH_r04/r05 arrived ``parsed: null`` when the full query dict blew past
that. These tests pin the shedding contract in bench.build_stdout_lines
so a future window/probe change can't silently regress the one artifact
the driver grades."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench


def _lines(n_front=50, name_len=24, probe="PROBE x=OK", n_total=186):
    names = [f"q{'x' * name_len}{i:03d}" for i in range(n_total)]
    timings = {n: 1.234 for n in names}
    return bench.build_stdout_lines(
        timings, names[:n_front], probe, 0.1, 21.2
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
