"""Derive the next attestation-rotation window from the CORRECTNESS
artifacts on disk — mechanizing the hand-maintained rotation notes in
``cs744_big_data_system_spark/workloads/__init__.py``.

The driver attests the FIRST 50 registry entries each round
(CORRECTNESS_r{N}.json), so the registry front doubles as the rotation
window. The rotation invariant (VERDICT r06/r07):

    never-attested entries first (registry order), then
    stalest-first (oldest latest-attestation round, registry order).

This tool reads every ``CORRECTNESS_r*.json`` at the repo root,
computes each entry's latest SUCCESSFUL attestation round, and prints
the 50-slot window the NEXT round's registry front should be. An
attestation counts only if it passed: hash-green for oracle-backed
entries, or a completed rows-only check (``err == "no_oracle"`` with a
row count) for entries without an oracle. A round where the entry
errored or hash-mismatched does NOT advance its freshness — a
failed-latest entry re-enters the window immediately (ADVICE r08).

Modes:

    python tools/attest_rotation.py            # print next window
    python tools/attest_rotation.py --check    # gate: wired == computed
    python tools/attest_rotation.py --write    # regenerate the wired
                                               # front (workloads/_rotation.py)
    python tools/attest_rotation.py --round-open
                                               # --write PLUS archive the
                                               # mutable BENCH_DETAIL slot
                                               # into bench_history/ (the
                                               # whole round-open checklist
                                               # in one command, VERDICT
                                               # r10 item 7)

``--write`` makes the post-round rotation a one-command, diff-reviewed
operation (VERDICT r08 item 7): the registry front lives in the
generated module ``cs744_big_data_system_spark/workloads/_rotation.py``
and ``all_workloads()`` re-orders itself from it.

Ties within a staleness class follow the CURRENT registry iteration
order, which is itself front-loaded with the active window — so the
computed window is stable under re-runs (attesting the front moves it
to the freshest class and the next-stalest block surfaces).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50

_ROTATION_MODULE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cs744_big_data_system_spark",
    "workloads",
    "_rotation.py",
)


def _attested_ok(rec: dict) -> bool:
    """True iff this artifact record is a SUCCESSFUL attestation.

    Oracle-backed pass: rows/schema/hash all matched, no error.
    Rows-only pass: the driver found no oracle entry but the query ran
    and produced a row count (err == "no_oracle", spark_rows set).
    Anything else (traceback, hash mismatch, missing rows) is a failed
    attestation and must not advance the entry's freshness (ADVICE r08:
    r04 ab_test_zstat / graph_modularity, r05 inverted_index).
    """
    if rec.get("err") == "no_oracle":
        return rec.get("spark_rows") is not None
    # schema_match is part of the pass condition (ADVICE r09): a record
    # with matching rows/hash but a red schema dimension must not
    # advance freshness and drop out of the rotation window.
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match")
        and not rec.get("err")
    )


def latest_attestation(root: str = ".") -> dict[str, int]:
    """entry -> latest round whose driver artifact attested it green."""
    latest: dict[str, int] = {}
    # 'r*' not 'r0*': a literal '0' would silently drop r10+ artifacts
    # and freeze the derived window at round-9 staleness (ADVICE r08).
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, rec in json.load(open(path)).items():
            if _attested_ok(rec):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def next_window(registry_names: list[str], latest: dict[str, int]) -> list[str]:
    """The 50-slot front the next round should lead with."""
    ranked = sorted(
        range(len(registry_names)),
        key=lambda i: (latest.get(registry_names[i], 0), i),
    )
    return [registry_names[i] for i in ranked[:WINDOW]]


def _summary(window: list[str], latest: dict[str, int]) -> str:
    by_round: dict[int, int] = {}
    for n in window:
        by_round[latest.get(n, 0)] = by_round.get(latest.get(n, 0), 0) + 1
    return ", ".join(
        f"{v} from r{k:02d}" if k else f"{v} never-attested"
        for k, v in sorted(by_round.items())
    )


def write_rotation_module(window: list[str], summary: str) -> None:
    body = "\n".join(f'    "{n}",' for n in window)
    with open(_ROTATION_MODULE, "w") as f:
        f.write(
            '"""GENERATED by `python tools/attest_rotation.py --write` — do\n'
            "not edit by hand. The 50-slot attestation window the registry\n"
            "front must lead with: never-attested entries first, then\n"
            "stalest-first (oldest successful attestation round), registry\n"
            "order within a class. Derived from the CORRECTNESS_r*.json\n"
            "artifacts at the repo root; tests/test_bench_contract.py\n"
            "asserts the wired front still matches them.\n\n"
            f"Window classes at generation time: {summary}.\n"
            '"""\n\n'
            "FRONT = [\n" + body + "\n]\n"
        )


def archive_bench_slots(root: str = ".") -> list[str]:
    """Archive every mutable BENCH_DETAIL_sf*.json slot into
    bench_history/ via bench.archive_detail (content-addressed, so this
    is idempotent — an already-archived run dedupes to its existing
    file). Round-open hygiene: the driver and builder share the slot
    and have clobbered each other's runs twice (VERDICT r09/r10); this
    makes 'nothing in the slot is ever lost' a one-command guarantee
    rather than a checklist item."""
    import bench

    archived = []
    for path in sorted(glob.glob(os.path.join(root, "BENCH_DETAIL_sf*.json"))):
        m = re.search(r"BENCH_DETAIL_sf([0-9.]+)\.json$", path)
        if not m:
            continue
        detail = json.load(open(path))
        if "queries" not in detail:
            continue
        archived.append(bench.archive_detail(detail, float(m.group(1))))
    return archived


def main() -> None:
    from cs744_big_data_system_spark.workloads import all_workloads

    names = list(all_workloads())
    latest = latest_attestation()
    unknown = sorted(set(latest) - set(names))
    if unknown:
        # Attested names missing from the registry would mean a rename
        # lost its attestation history — surface loudly.
        print(f"WARNING: attested-but-unregistered: {unknown}", file=sys.stderr)
    window = next_window(names, latest)
    blocks = _summary(window, latest)
    if "--check" in sys.argv[1:]:
        wired = names[:WINDOW]
        if wired != window:
            drift = [
                (i, w, c) for i, (w, c) in enumerate(zip(wired, window)) if w != c
            ]
            print(f"DRIFT at {len(drift)} slots (first: {drift[:5]})")
            sys.exit(1)
        print(f"OK: wired registry front == computed window ({blocks})")
        return
    if "--write" in sys.argv[1:] or "--round-open" in sys.argv[1:]:
        if "--round-open" in sys.argv[1:]:
            for p in archive_bench_slots():
                print(f"bench slot archived -> {p}")
        write_rotation_module(window, blocks)
        print(f"wrote {_ROTATION_MODULE} ({blocks})")
        return
    print(f"# next 50-slot window ({blocks})")
    for n in window:
        print(n)


if __name__ == "__main__":
    main()
