"""Per-query perf regression triage: compare BENCH_DETAIL.json's WARM
times against BASELINE.md's consolidated table and print movers beyond
the noise band (>1.5x warm, per SCALING.md's measured rule). Queries
in the detail file's ``floor_bound`` list (the TWS block — per-stream
planning + state-server RPC floor, 4x rep spreads measured in r10)
get a wider 2.5x band so scheduler noise can't trip the gate. Exit
code 1 when movers exist, so the round's closing checklist can gate
on it.

Usage: python tools/regression_guard.py [threshold] [floor_threshold]
"""

from __future__ import annotations

import json
import re
import sys


def main(argv: list[str]) -> int:
    thresh = float(argv[0]) if argv else 1.5
    floor_thresh = float(argv[1]) if len(argv) > 1 else 2.5
    detail = json.load(open("BENCH_DETAIL.json"))
    warm = detail["warm"]
    floor_bound = set(detail.get("floor_bound", []))
    base: dict[str, float] = {}
    for line in open("BASELINE.md"):
        m = re.match(r"\| (\S+) \| ([\d.]+) \| ([\d.]+) \| (\d+) \|", line)
        if m:
            # first row wins: the table may gain corrected re-appends
            base.setdefault(m.group(1), float(m.group(2)))

    def band(q: str) -> float:
        return floor_thresh if q in floor_bound else thresh

    movers = sorted(
        (
            (w / base[q], q, base[q], w)
            for q, w in warm.items()
            # base[q] > 0 guard: a 0.00 baseline row (sub-centisecond
            # anchor rounded down) must not ZeroDivisionError the gate
            if w is not None and base.get(q, 0) > 0 and w / base[q] > band(q)
        ),
        reverse=True,
    )
    fresh = [q for q in warm if q not in base]
    zeroed = [q for q in warm if base.get(q) == 0.0]
    print(
        f"{len(base)} baseline rows, {len(warm)} benched,"
        f" {len(fresh)} without baseline rows, {len(movers)} movers"
        f" >{thresh}x warm (floor-bound set: >{floor_thresh}x,"
        f" {len(floor_bound)} queries):"
    )
    spread = detail.get("spread", {})
    for ratio, q, b, w in movers:
        tag = " [floor-bound]" if q in floor_bound else ""
        sp = spread.get(q)
        sp_s = f", rep spread {sp}x" if sp else ""
        print(f"  {q}: {b:.2f}s -> {w:.2f}s ({ratio:.2f}x){tag}{sp_s}")
    for q in fresh:
        print(f"  (no baseline row: {q})")
    for q in zeroed:
        print(f"  (zero baseline row, ratio skipped: {q})")
    return 1 if movers else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
