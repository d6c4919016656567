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


def _run_compare(tmp_path, prev, curr, *extra, tag=""):
    import subprocess
    import sys

    p, c = tmp_path / f"prev{tag}.json", tmp_path / f"curr{tag}.json"
    p.write_text(json.dumps(prev))
    c.write_text(json.dumps(curr))
    return subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(p), str(c), *extra],
        capture_output=True, text=True,
    )


def test_bench_compare_probe_normalization(tmp_path):
    """Per-dimension normalization (ADVICE r07): an io-degraded probe
    forgives only replay/streaming queries; a compute-bound query that
    doubled under a healthy cpu probe must GATE even when io is 2x."""
    prev = {
        "queries": {"q_cpu": 2.0, "stream_x_replay": 4.0, "q_real": 2.0},
        "probe": {"cpu": 1.0, "io": 1.0},
    }
    # io probe 2x degraded, cpu healthy: the replay doubling is
    # environmental (io-bound family), but q_real doubling is a REAL
    # regression — cpu probe 1.05x cannot forgive a 3.25x cpu query,
    # and the io factor must not leak across dimensions.
    curr = {
        "queries": {"q_cpu": 2.1, "stream_x_replay": 8.0, "q_real": 6.5},
        "probe": {"cpu": 1.05, "io": 2.0},
    }
    r = _run_compare(tmp_path, prev, curr)
    assert r.returncode == 1, r.stdout
    gated = r.stdout.split("GATED regressions")[1]
    assert "q_real" in gated
    assert "stream_x_replay: 4.00s -> 8.00s (2.00x) [environmental (io probe)]" in r.stdout
    # cross-dimension leak check: a cpu-bound query doubled under a
    # healthy cpu probe gates even though io is 2x degraded
    curr_leak = {
        "queries": {"q_cpu": 4.0, "stream_x_replay": 8.0, "q_real": 2.0},
        "probe": {"cpu": 1.05, "io": 2.0},
    }
    r_leak = _run_compare(tmp_path, prev, curr_leak, tag="leak")
    assert r_leak.returncode == 1, r_leak.stdout
    assert "q_cpu" in r_leak.stdout.split("GATED regressions")[1]
    # without the probe blocks, raw regressions gate unnormalized
    r2 = _run_compare(
        tmp_path,
        {"queries": prev["queries"]},
        {"queries": curr["queries"]},
        tag="noprobe",
    )
    assert r2.returncode == 1
    assert "stream_x_replay" in r2.stdout.split("GATED regressions")[1]


def test_bench_compare_environmental_requires_opt_in(tmp_path):
    """Environmental-only rows exit 2 unless --allow-environmental is
    passed (ADVICE r07: the gate must not silently pass regressions
    that only the host factor forgives)."""
    prev = {
        "queries": {"stream_x_replay": 4.0, "q_cpu": 2.0},
        "probe": {"cpu": 1.0, "io": 1.0},
    }
    curr = {
        "queries": {"stream_x_replay": 8.0, "q_cpu": 2.1},
        "probe": {"cpu": 1.0, "io": 2.0},
    }
    r = _run_compare(tmp_path, prev, curr)
    assert r.returncode == 2, r.stdout
    assert "--allow-environmental" in r.stdout
    r_ok = _run_compare(tmp_path, prev, curr, "--allow-environmental", tag="ok")
    assert r_ok.returncode == 0, r_ok.stdout
    # fully clean run exits 0 without the flag
    r_clean = _run_compare(tmp_path, prev, prev, tag="clean")
    assert r_clean.returncode == 0


def test_bench_compare_probe_schema_drift(tmp_path):
    """A probe block missing a dimension on either side degrades to
    no normalization for that dimension instead of crashing
    (ADVICE r07 KeyError guard)."""
    prev = {"queries": {"q_cpu": 2.0}, "probe": {"cpu": 1.0, "io": 1.0}}
    curr = {"queries": {"q_cpu": 2.1}, "probe": {"cpu": 1.0}}  # io missing
    r = _run_compare(tmp_path, prev, curr)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "io missing on one side" in r.stdout


def test_bench_compare_floor_probe_drift_notes(tmp_path):
    """ADVICE r09: a legacy PREV artifact without the floor probe is
    silently tolerated, but a current-format artifact that DROPS the
    key is schema drift and must print the 'missing on one side' note
    like cpu/io."""
    legacy_prev = {"queries": {"q_cpu": 2.0}, "probe": {"cpu": 1.0, "io": 1.0}}
    curr = {"queries": {"q_cpu": 2.0},
            "probe": {"cpu": 1.0, "io": 1.0, "floor": 0.4}}
    r = _run_compare(tmp_path, legacy_prev, curr)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "floor missing on one side" not in r.stdout
    # VERDICT r09 item 7: the gate line itself carries the floor ratio
    assert "floor 1.00x (evidence only" in r.stdout
    # prev HAS the floor probe; curr dropping it must be flagged
    r2 = _run_compare(tmp_path, curr, legacy_prev, tag="drift")
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "floor missing on one side" in r2.stdout


def test_archive_detail_content_addressed(tmp_path, monkeypatch):
    """r10: every bench run is archived under a content-hashed name so
    a later run overwriting the mutable BENCH_DETAIL slot never loses
    an artifact; identical details dedupe to one file."""
    import os

    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(tmp_path / "bench.py"))
    d1 = {"metric": "m", "value": 1.0, "queries": {"a": 1.0}}
    d2 = {"metric": "m", "value": 2.0, "queries": {"a": 2.0}}
    p1 = bench.archive_detail(d1, 0.1)
    p1_again = bench.archive_detail(d1, 0.1)
    p2 = bench.archive_detail(d2, 0.1)
    assert p1 == p1_again and p1 != p2
    assert os.path.dirname(p1).endswith("bench_history")
    assert len(os.listdir(os.path.dirname(p1))) == 2
    import json as _json

    assert _json.load(open(p2))["value"] == 2.0


def test_bench_compare_canary_floor_line(tmp_path):
    """r10: the gate output carries a measured sub-second floor from
    real registry rows (median of canary ratios); absent when fewer
    than two canaries are shared."""
    prev = {"queries": {"dq_checks": 0.4, "attribution_last_touch": 0.4,
                        "merge_upsert": 0.4, "q_other": 2.0},
            "probe": {"cpu": 1.0, "io": 1.0, "floor": 0.4}}
    curr = {"queries": {"dq_checks": 0.56, "attribution_last_touch": 0.56,
                        "merge_upsert": 0.58, "q_other": 2.0},
            "probe": {"cpu": 1.0, "io": 1.0, "floor": 0.4}}
    r = _run_compare(tmp_path, prev, curr)
    assert "sub-second canary floor (median of 3 real rows): 1.40x" in r.stdout
    # ADVICE r10: partial canary loss must be visible, not silent
    assert "only 3/4 canary rows shared" in r.stdout
    # the canary is evidence-only: an elevated canary median must not by
    # itself gate anything (all rows are under the 1.5x threshold here)
    assert r.returncode == 0, r.stdout
    no_canary = {"queries": {"q_other": 2.0}, "probe": {"cpu": 1.0, "io": 1.0}}
    r2 = _run_compare(tmp_path, no_canary, no_canary, tag="nc")
    # ADVICE r10: total canary loss must be announced, not silently absent
    assert "measured-floor evidence LOST" in r2.stdout
    full = {"queries": {"dq_checks": 0.4, "attribution_last_touch": 0.4,
                        "merge_upsert": 0.4, "text_gopher_rules": 0.4},
            "probe": {"cpu": 1.0, "io": 1.0, "floor": 0.4}}
    r3 = _run_compare(tmp_path, full, full, tag="full")
    assert "sub-second canary floor (median of 4 real rows): 1.00x" in r3.stdout
    assert "canary rows shared" not in r3.stdout  # no note when all 4 present


def test_bench_compare_baseline_pointer(tmp_path):
    """ADVICE r10: the gate baseline is a mechanical pointer file
    (BENCH_BASELINE.json -> bench_history/<hash>.json), so a caller
    can never accidentally gate against a host-elevated run sitting in
    the mutable BENCH_DETAIL slot."""
    import subprocess
    import sys

    hist = tmp_path / "bench_history"
    hist.mkdir()
    baseline = {"queries": {"q": 1.0}, "probe": {"cpu": 1.0, "io": 1.0}}
    (hist / "BENCH_DETAIL_sf0.1_abc.json").write_text(json.dumps(baseline))
    pointer = tmp_path / "BENCH_BASELINE.json"
    pointer.write_text(json.dumps(
        {"detail": "bench_history/BENCH_DETAIL_sf0.1_abc.json"}))
    curr = tmp_path / "curr.json"
    curr.write_text(json.dumps(
        {"queries": {"q": 1.1}, "probe": {"cpu": 1.0, "io": 1.0}}))
    r = subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(pointer), str(curr)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "resolved baseline pointer" in r.stdout
    assert "prev total 1.0s -> curr total 1.1s" in r.stdout


def test_repo_baseline_pointer_resolves():
    """The committed BENCH_BASELINE.json must point at an existing
    archived detail with a queries block (the pristine d412b80 run)."""
    import os

    doc = json.load(open("BENCH_BASELINE.json"))
    target = doc["detail"]
    assert os.path.exists(target), target
    detail = json.load(open(target))
    assert "queries" in detail and len(detail["queries"]) > 100
    assert abs(detail["value"] - 224.7) < 1.0


def test_archive_detail_collision_writes_suffixed_copy(tmp_path, monkeypatch):
    """ADVICE r10: on a (hypothetical) truncated-digest collision the
    archive must not silently drop the new run — contents are compared
    and a suffixed copy written on mismatch."""
    import os

    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(tmp_path / "bench.py"))
    d1 = {"metric": "m", "value": 1.0, "queries": {"a": 1.0}}
    p1 = bench.archive_detail(d1, 0.1)
    # simulate a collision: a DIFFERENT detail already occupies d2's path
    d2 = {"metric": "m", "value": 2.0, "queries": {"a": 2.0}}
    (tmp_path / "bench_history" / os.path.basename(p1)).write_text(
        json.dumps({"metric": "m", "value": 9.0, "queries": {"z": 9.0}}))
    p1_colliding = bench.archive_detail(d1, 0.1)
    assert p1_colliding != p1 and p1_colliding.endswith("-1.json")
    assert json.load(open(p1_colliding)) == d1
    # rerunning the colliding detail dedupes to the SAME suffixed copy
    assert bench.archive_detail(d1, 0.1) == p1_colliding
    # and an unrelated detail still gets its own fresh hash name
    p2 = bench.archive_detail(d2, 0.1)
    assert json.load(open(p2)) == d2 and p2 != p1_colliding


def test_archive_detail_dedupes_to_legacy_12char_name(tmp_path, monkeypatch):
    """r04-r10 archives used a 12-char digest; re-archiving the same
    run must dedupe to the existing legacy file, not duplicate it."""
    import os

    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(tmp_path / "bench.py"))
    d = {"metric": "m", "value": 3.0, "queries": {"a": 3.0}}
    p = bench.archive_detail(d, 0.1)
    digest24 = os.path.basename(p).split("_")[-1].removesuffix(".json")
    legacy = tmp_path / "bench_history" / f"BENCH_DETAIL_sf0.1_{digest24[:12]}.json"
    os.rename(p, legacy)
    assert bench.archive_detail(d, 0.1) == str(legacy)
    assert os.listdir(tmp_path / "bench_history") == [legacy.name]


def test_headline_names_all_resolve_in_registry():
    from cs744_big_data_system_spark.workloads import all_workloads

    reg = all_workloads()
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert not missing, missing


def test_rotation_window_matches_attestation_artifacts():
    """The registry front (= the driver's 50-slot attestation window)
    must equal the window derived mechanically from the CORRECTNESS
    artifacts on disk: never-attested first, then stalest-first,
    registry order within a class. Catches a rotation edit or registry
    addition that silently violates the invariant (VERDICT r06/r07)."""
    import os

    from cs744_big_data_system_spark.workloads import all_workloads
    from tools.attest_rotation import WINDOW, latest_attestation, next_window

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = list(all_workloads())
    computed = next_window(names, latest_attestation(root))
    assert names[:WINDOW] == computed, (
        "registry front is stale for the CORRECTNESS artifacts on disk "
        "— a new round's artifact landed (or the rotation was edited by "
        "hand). Fix: `python tools/attest_rotation.py --write` "
        "(regenerates workloads/_rotation.py), then review the diff."
    )


def test_next_window_orders_never_attested_then_stalest():
    from tools.attest_rotation import next_window

    names = [f"q{i}" for i in range(60)]
    latest = {n: 3 for n in names}
    latest["q10"] = 1          # stalest
    latest["q20"] = 2
    del latest["q30"]          # never attested
    del latest["q40"]
    win = next_window(names, latest)
    assert win[:4] == ["q30", "q40", "q10", "q20"]  # never-first, then stalest
    assert len(win) == 50
    # ties keep registry order
    rest = [n for n in win[4:]]
    assert rest == sorted(rest, key=lambda n: names.index(n))


def test_latest_attestation_reads_double_digit_rounds(tmp_path):
    """ADVICE r08: the artifact glob must match CORRECTNESS_r10.json
    and later — a literal 'r0*' prefix would freeze the derived window
    at round-9 staleness from round 10 on."""
    from tools.attest_rotation import latest_attestation

    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 1, "oracle_rows": 1, "err": None}
    (tmp_path / "CORRECTNESS_r09.json").write_text(json.dumps({"a": ok}))
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps({"a": ok, "b": ok}))
    (tmp_path / "CORRECTNESS_r2.json").write_text(json.dumps({"c": ok}))
    # non-artifact JSON that happens to share the prefix must be skipped
    (tmp_path / "CORRECTNESS_rXX.json").write_text(json.dumps({"d": ok}))
    latest = latest_attestation(str(tmp_path))
    assert latest == {"a": 10, "b": 10, "c": 2}


def test_latest_attestation_ignores_failed_rounds(tmp_path):
    """ADVICE r08: a round where the entry errored or hash-mismatched
    must not advance its freshness; a rows-only success (err ==
    'no_oracle' with a row count) must."""
    from tools.attest_rotation import latest_attestation

    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 1, "oracle_rows": 1, "err": None}
    hash_red = dict(ok, hash_match=False)
    schema_red = dict(ok, schema_match=False)  # ADVICE r09
    errored = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": "Traceback ..."}
    rows_only = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": 42, "oracle_rows": None, "err": "no_oracle"}
    rows_only_dead = dict(rows_only, spark_rows=None)
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(
        {"a": ok, "b": ok, "c": ok, "d": ok, "e": ok}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(
        {"a": hash_red, "b": errored, "c": rows_only, "d": rows_only_dead,
         "e": schema_red}))
    latest = latest_attestation(str(tmp_path))
    # failed r02 attestations leave a/b/d/e at r01; rows-only success
    # advances c; e's red schema dimension must not advance it (ADVICE r09)
    assert latest == {"a": 1, "b": 1, "c": 2, "d": 1, "e": 1}


def test_rotation_write_roundtrips_and_is_stable(tmp_path, monkeypatch):
    """--write regenerates the wired front from the artifacts; writing
    the computed window then recomputing must be a fixed point (the
    stability property documented in tools/attest_rotation.py)."""
    import tools.attest_rotation as ar
    from cs744_big_data_system_spark.workloads import all_workloads

    names = list(all_workloads())
    latest = ar.latest_attestation(
        __import__("os").path.dirname(__import__("os").path.dirname(
            __import__("os").path.abspath(__file__))))
    window = ar.next_window(names, latest)
    # fixed point: re-ordering the registry to lead with `window` and
    # recomputing yields the same window
    reordered = window + [n for n in names if n not in set(window)]
    assert ar.next_window(reordered, latest) == window
    # the generated module round-trips through the writer
    target = tmp_path / "_rotation.py"
    monkeypatch.setattr(ar, "_ROTATION_MODULE", str(target))
    ar.write_rotation_module(window, "test")
    ns: dict = {}
    exec(target.read_text(), ns)
    assert ns["FRONT"] == window


def test_scale_data_usage_survives_docstring_stripping(tmp_path):
    """ADVICE r08: the unknown-flag error path must print usage even
    under `python -OO` (docstrings stripped, __doc__ is None)."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-OO", os.path.join(root, "tools", "scale_data.py"),
         "--no-such-flag"],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert r.returncode == 1
    assert "unknown option(s)" in r.stderr and "Usage:" in r.stderr
    assert "TypeError" not in r.stderr
    # and it must NOT have created a directory named after the flag
    assert not os.path.exists(tmp_path / "--no-such-flag")


def test_floor_probe_is_evidence_only(tmp_path):
    """r09: the sub-second floor probe's ratio is printed when both
    artifacts carry it, but must NEVER forgive a gated row — a
    floor-class elevation closes only via worktree A/B. Older
    artifacts without the key compare silently (no drift note)."""
    prev = {
        "queries": {"q_small": 0.4},
        "probe": {"cpu": 1.0, "io": 1.0, "floor": 0.30},
    }
    # floor probe 2.5x degraded AND the sub-second query 2x: if floor
    # ever normalized, this would pass — it must stay GATED.
    curr = {
        "queries": {"q_small": 0.8},
        "probe": {"cpu": 1.0, "io": 1.0, "floor": 0.75},
    }
    r = _run_compare(tmp_path, prev, curr)
    assert r.returncode == 1, r.stdout
    assert "q_small" in r.stdout.split("GATED regressions")[1]
    assert "floor 0.30->0.75s (2.50x)" in r.stdout  # printed as evidence
    # pre-r09 artifact without the floor key: no noisy drift note
    prev_old = {"queries": {"q_small": 0.4}, "probe": {"cpu": 1.0, "io": 1.0}}
    r2 = _run_compare(tmp_path, prev_old, curr, tag="old")
    assert "floor missing" not in r2.stdout
    assert r2.returncode == 1


def test_calibration_probe_carries_floor(spark):
    import bench as b

    p = b.calibration_probe(spark)
    assert set(p) == {"cpu", "io", "floor"}
    assert all(v > 0 for v in p.values())
