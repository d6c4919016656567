"""Bench artifact contract: the round driver captures only the LAST
~2000 chars of bench.py stdout and parses the final JSON line
(BENCH_r03's `parsed: null` was a 91-query line overflowing that
window). These tests pin the fix: the final line stays parseable and
small no matter how many headline queries accumulate, and every
headline name resolves in the registry so the bench can't KeyError
mid-round."""

from __future__ import annotations

import json

import bench


def test_summary_line_fits_tail_capture_window():
    # worst case: every headline query present with a wide float
    per_query = {name: 123.4567 for name in bench.HEADLINE}
    line = bench.summary_line(
        per_query, 9999.1234, 0.1, "BENCH_DETAIL_sf0.1.json",
        probe={"cpu": 12.3456, "io": 12.3456},
    )
    assert len(line) < 1900, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_suite_mean_sec_per_query_sum"
    assert parsed["value"] == 9999.1234
    assert parsed["n_queries"] == len(bench.HEADLINE)
    assert len(parsed["queries"]) <= 12
    # host-health denominator must travel in the driver-facing line
    assert parsed["probe"] == {"cpu": 12.3456, "io": 12.3456}


def test_bench_compare_probe_normalization(tmp_path):
    """A uniform slowdown matching the probes' degradation must NOT
    gate (environmental); a query that regressed beyond the host
    factor must gate."""
    import subprocess
    import sys

    prev = {
        "queries": {"q_cpu": 2.0, "q_ckpt": 4.0, "q_real": 2.0},
        "probe": {"cpu": 1.0, "io": 1.0},
    }
    # host 2x degraded on io (probe io 1->2); q_ckpt doubled with it
    # (environmental), q_real 3.25x (beyond the 2x host factor ->
    # a real regression even after normalization)
    curr = {
        "queries": {"q_cpu": 2.1, "q_ckpt": 8.0, "q_real": 6.5},
        "probe": {"cpu": 1.05, "io": 2.0},
    }
    p, c = tmp_path / "prev.json", tmp_path / "curr.json"
    p.write_text(json.dumps(prev))
    c.write_text(json.dumps(curr))
    r = subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(p), str(c)],
        capture_output=True, text=True,
    )
    assert r.returncode == 1, r.stdout
    assert "q_real" in r.stdout.split("GATED regressions")[1]
    assert "q_ckpt: 4.00s -> 8.00s (2.00x) [environmental (probe)]" in r.stdout
    # without the probe blocks, both raw regressions gate
    p2, c2 = tmp_path / "prev2.json", tmp_path / "curr2.json"
    p2.write_text(json.dumps({"queries": prev["queries"]}))
    c2.write_text(json.dumps({"queries": curr["queries"]}))
    r2 = subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(p2), str(c2)],
        capture_output=True, text=True,
    )
    assert r2.returncode == 1
    assert "q_ckpt" in r2.stdout.split("GATED regressions")[1]


def test_headline_names_all_resolve_in_registry():
    from cs744_big_data_system_spark.workloads import all_workloads

    reg = all_workloads()
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert not missing, missing
