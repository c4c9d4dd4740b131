"""Per-query driver-green age audit: for every registered query, find
the NEWEST driver CORRECTNESS round with a full hash-green row (rows +
schema + hash all matching), and summarize the staleness distribution.

Fixtures get regenerated between rounds and r6 proved local-green !=
driver-green, so a query whose only driver row is many rounds old is
verification debt. The rotation (registry._PRIORITY tier 3) consumes
this report: the oldest greens head the next round's 50-slot window.

Usage: python tools/green_age.py [--max-age N]
  exit 1 if any query's last green is older than N rounds behind the
  newest CORRECTNESS file (default: no gate, report only).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_green_rounds() -> tuple[dict[str, int], int, set[str]]:
    """(query -> newest hash-green round, newest round seen, ever-red-only)."""
    last: dict[str, int] = {}
    seen: set[str] = set()
    newest = 0
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", p).group(1))
        newest = max(newest, rnd)
        with open(p) as f:
            data = json.load(f)
        for q, v in data.items():
            seen.add(q)
            ok = (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match", True)
            )
            if ok:
                last[q] = max(last.get(q, 0), rnd)
    return last, newest, seen - set(last)


def main(argv: list[str]) -> int:
    max_age = None
    if argv[:1] == ["--max-age"]:
        max_age = int(argv[1])

    sys.path.insert(0, REPO)
    from fluent_bit_filter_math_spark.registry import all_queries

    registered = list(all_queries())
    last, newest, never = last_green_rounds()

    by_round: dict[int, list[str]] = {}
    unchecked = []
    for q in registered:
        if q in last:
            by_round.setdefault(last[q], []).append(q)
        else:
            unchecked.append(q)

    print(f"{len(registered)} registered; newest CORRECTNESS round: r{newest}")
    for rnd in sorted(by_round):
        qs = sorted(by_round[rnd])
        age = newest - rnd
        preview = ", ".join(qs[:6]) + (" ..." if len(qs) > 6 else "")
        print(f"  last green r{rnd} (age {age}): {len(qs)}  [{preview}]")
    if unchecked:
        print(f"  NEVER driver-green: {len(unchecked)}  {sorted(unchecked)}")
    stale_red = sorted(never & set(registered))
    if stale_red:
        print(f"  driver rows exist but never green: {stale_red}")

    if max_age is not None:
        bad = sorted(
            q for q in registered
            if q not in last or newest - last[q] > max_age
        )
        if bad:
            print(f"\nFAIL: {len(bad)} queries older than {max_age} rounds:")
            for q in bad:
                print(f"  {q} (r{last.get(q, 0) or '-'})")
            return 1
        print(f"\nok: every query green within {max_age} rounds")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
