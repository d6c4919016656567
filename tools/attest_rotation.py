"""Derive the next attestation-rotation window from the CORRECTNESS
artifacts on disk — mechanizing the hand-maintained rotation notes in
``cs744_big_data_system_spark/workloads/__init__.py``.

The driver attests the FIRST 50 registry entries each round
(CORRECTNESS_r{N}.json), so the registry front doubles as the rotation
window. The rotation invariant (VERDICT r06/r07):

    never-attested entries first (registry order), then
    stalest-first (oldest latest-attestation round, registry order).

This tool reads every ``CORRECTNESS_r0*.json`` at the repo root,
computes each entry's latest attestation round, and prints the 50-slot
window the NEXT round's registry front should be — plus, with
``--check``, verifies the registry front currently wired in
``all_workloads()`` matches it (exit 1 on drift). The r09 note can
therefore be generated instead of hand-enumerated:

    python tools/attest_rotation.py            # print next window
    python tools/attest_rotation.py --check    # gate: wired == computed

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


def latest_attestation(root: str = ".") -> dict[str, int]:
    """entry -> latest round whose driver artifact attested it."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r0*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        rnd = int(m.group(1))
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def next_window(registry_names: list[str], latest: dict[str, int]) -> list[str]:
    """The 50-slot front the next round should lead with."""
    ranked = sorted(
        range(len(registry_names)),
        key=lambda i: (latest.get(registry_names[i], 0), i),
    )
    return [registry_names[i] for i in ranked[:WINDOW]]


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
    by_round: dict[int, int] = {}
    for n in window:
        by_round[latest.get(n, 0)] = by_round.get(latest.get(n, 0), 0) + 1
    blocks = ", ".join(
        f"{v} from r{k:02d}" if k else f"{v} never-attested"
        for k, v in sorted(by_round.items())
    )
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
    print(f"# next 50-slot window ({blocks})")
    for n in window:
        print(n)


if __name__ == "__main__":
    main()
