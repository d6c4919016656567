"""Compare two BENCH_DETAIL json files and report per-query regressions.

Usage: python tools/bench_compare.py PREV.json CURR.json [threshold]

Prints queries whose time grew by more than ``threshold``× (default
1.5), new/removed queries, and the common-set totals — the per-round
no-regression gate (VERDICT r05 item 4).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    prev_path, curr_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    prev = json.load(open(prev_path))["queries"]
    curr = json.load(open(curr_path))["queries"]
    common = sorted(set(prev) & set(curr))
    regressions = []
    for name in common:
        # sub-100ms queries jitter across sessions; ratio-gate the rest
        if curr[name] > prev[name] * threshold and curr[name] > 0.1:
            regressions.append((name, prev[name], curr[name], curr[name] / prev[name]))
    regressions.sort(key=lambda r: -r[3])
    print(f"common set: {len(common)} queries; "
          f"prev total {sum(prev[n] for n in common):.1f}s -> "
          f"curr total {sum(curr[n] for n in common):.1f}s")
    print(f"added: {sorted(set(curr) - set(prev))}")
    print(f"removed: {sorted(set(prev) - set(curr))}")
    if regressions:
        print(f"\nREGRESSIONS > {threshold}x:")
        for name, p, c, r in regressions:
            print(f"  {name}: {p:.2f}s -> {c:.2f}s ({r:.2f}x)")
    else:
        print(f"\nno regressions > {threshold}x")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
