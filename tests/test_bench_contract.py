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
    line = bench.summary_line(per_query, 9999.1234, 0.1, "BENCH_DETAIL_sf0.1.json")
    assert len(line) < 1900, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_suite_mean_sec_per_query_sum"
    assert parsed["value"] == 9999.1234
    assert parsed["n_queries"] == len(bench.HEADLINE)
    assert len(parsed["queries"]) <= 12


def test_headline_names_all_resolve_in_registry():
    from cs744_big_data_system_spark.workloads import all_workloads

    reg = all_workloads()
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert not missing, missing
