"""Driver-window composition audit — mechanizes the r6 lesson.

The driver verifies only the FIRST 50 of ``queries()``; a registered
query with no driver CORRECTNESS row ever is a coverage hole, so every
never-driver-checked query must sit inside that window (stale greens
may wait — they still have current-fixture evidence in
CORRECTNESS_LOCAL.json). This script recomputes both sets and fails
loudly when a never-checked query is past the cut, so a rotation edit
can't silently orphan a new operator.

Usage: python tools/window_audit.py [--window N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    from fluent_bit_filter_math_spark import registry

    names = list(registry.all_queries())
    checked: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        try:
            checked.update(json.load(open(path)))
        except Exception as exc:  # malformed round file: report, move on
            print(f"warn: skipping {path}: {exc}")

    window = set(names[: args.window])
    never = [n for n in names if n not in checked]
    orphaned = [n for n in never if n not in window]

    print(
        f"{len(names)} registered; {len(never)} never driver-checked; "
        f"window={args.window}"
    )
    if orphaned:
        print("ORPHANED (never checked AND outside the window):")
        for n in orphaned:
            print(f"  {n} @ slot {names.index(n) + 1}")
        return 1
    slack = args.window - len(never)
    print(
        f"ok: every never-checked query is inside the window "
        f"({slack} slots left for stale-green rotation)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
