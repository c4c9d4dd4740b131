"""Refresh stale-HIGH baseline anchors (VERDICT r9 #7): a consolidated
BASELINE.md row whose current bench warm time reads below RATIO× the
anchored warm was recorded in a noisy window (e.g. late-r9) or its plan
has since improved — either way the 2× gate is toothless for it.
Replace such rows in place with the current BENCH_DETAIL.json warm/cold
(anchors are cross-run minima, so only DOWNWARD refreshes are ever
applied; an anchor is never loosened here).

Usage: python tools/baseline_refresh.py [ratio]   # default 0.6
Prints the refreshed rows; exits 0 always (reporting tool).
"""

from __future__ import annotations

import json
import re
import sys

ROW = re.compile(r"^\| (\S+) \| ([\d.]+) \| ([\d.]+) \| (\d+) \|$")


def main(argv: list[str]) -> int:
    ratio = float(argv[0]) if argv else 0.6
    detail = json.load(open("BENCH_DETAIL.json"))
    warm, cold = detail["warm"], detail["cold"]
    lines = open("BASELINE.md").read().splitlines(keepends=True)
    seen: set[str] = set()
    refreshed = []
    for i, line in enumerate(lines):
        m = ROW.match(line.rstrip("\n"))
        if not m:
            continue
        q, aw, ac, rows = (
            m.group(1),
            float(m.group(2)),
            float(m.group(3)),
            m.group(4),
        )
        if q in seen:  # first row wins downstream; only touch that one
            continue
        seen.add(q)
        w = warm.get(q)
        c = cold.get(q)
        if w is None or aw <= 0:
            continue
        if w < ratio * aw:
            nc = min(ac, c) if c is not None else ac
            lines[i] = f"| {q} | {w:.2f} | {nc:.2f} | {rows} |\n"
            refreshed.append((q, aw, w))
    if refreshed:
        with open("BASELINE.md", "w") as f:
            f.writelines(lines)
    print(f"{len(refreshed)} anchors refreshed (<{ratio}x):")
    for q, aw, w in sorted(refreshed, key=lambda t: t[2] / t[1]):
        print(f"  {q}: {aw:.2f}s -> {w:.2f}s ({w / aw:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
