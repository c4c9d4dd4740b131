"""Machine-era re-anchor (r13b): rewrite every guard-visible
BASELINE.md row from the current BENCH_DETAIL.json.

Why this is legitimate (and when it is not): the anchors exist to
catch REGRESSIONS THIS REPO INTRODUCES. In the r13 continuation
session the driver's VM rebooted onto measurably slower footing —
every family shifted ~1.5-2x uniformly (TPC-H joins, window functions
and aggregates this session never touched moved exactly like the
touched table-format paths; PLANS.md re-audit shows byte-identical
plans for the movers), solo spot-checks on an idle box reproduced the
shift, and per-rep samples show multi-second INTERMITTENT stalls
(e.g. mm_adpcm_roundtrip reps [0.87, 4.1, 16.6] s) on top of the
steady component. Keeping the old-era anchors would flag ~80
phantom movers and make the 2x gate meaningless; re-anchoring from a
burst-resistant 5-rep run restores a gate that can catch real
regressions on THIS machine era. The old-era table stays in git
history; the aggregate shift is printed and recorded in BASELINE.md.

Do NOT run this to absorb a code regression: the justification above
is a machine-wide, plan-invariant shift with evidence. A mover whose
plan changed is a regression, not an era shift — and since r14 the
tool ENFORCES that (ADVICE r13 #5): every query whose anchor would
move is checked against the PLANS.md fingerprint (its shuf/bhj/smj/
py/pushed/wscg row) recorded at the last commit that touched
BASELINE.md; a changed fingerprint is refused unless that query is
explicitly forced with --force-plan-changed <query> (repeatable)
after a human triage.

Usage: python tools/baseline_reanchor_r13b.py [--apply]
           [--force-plan-changed QUERY]...
"""

from __future__ import annotations

import json
import re
import subprocess
import sys

ROW = re.compile(r"^\| (\S+) \| ([\d.]+) \| ([\d.]+) \| (\d+) \|$")
PLAN_ROW = re.compile(r"^\| (\S+) \| (.+) \|$")


def _plan_fingerprints(text: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in text.splitlines():
        m = PLAN_ROW.match(line)
        if m and m.group(1) not in ("query", "---"):
            out.setdefault(m.group(1), m.group(2))
    return out


def _anchor_era_plans() -> dict[str, str]:
    """PLANS.md as of the last commit that touched BASELINE.md — the
    fingerprints the current anchors were accepted under."""
    ref = subprocess.run(
        ["git", "log", "-1", "--format=%H", "--", "BASELINE.md"],
        capture_output=True, text=True,
    ).stdout.strip()
    if not ref:
        return {}
    shown = subprocess.run(
        ["git", "show", f"{ref}:PLANS.md"], capture_output=True, text=True
    )
    return _plan_fingerprints(shown.stdout) if shown.returncode == 0 else {}


def main(argv: list[str]) -> int:
    apply = "--apply" in argv
    forced: set[str] = set()
    for i, a in enumerate(argv):
        if a == "--force-plan-changed" and i + 1 < len(argv):
            forced.add(argv[i + 1])
    detail = json.load(open("BENCH_DETAIL.json"))
    warm, cold = detail["warm"], detail["cold"]
    old_plans = _anchor_era_plans()
    new_plans = _plan_fingerprints(open("PLANS.md").read())
    lines = open("BASELINE.md").read().splitlines(keepends=True)
    seen: set[str] = set()
    old_total = new_total = 0.0
    changed = 0
    refused: list[str] = []
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
        if q in seen:
            continue  # the guard reads the first row; later dupes stay
        seen.add(q)
        w, c = warm.get(q), cold.get(q)
        if w is None:
            continue
        old_fp, new_fp = old_plans.get(q), new_plans.get(q)
        if (
            q not in forced
            and old_fp is not None
            and new_fp is not None
            and old_fp != new_fp
            and abs(w - aw) > 1e-9
        ):
            refused.append(q)
            continue  # plan changed since the anchor: not an era shift
        old_total += aw
        new_total += w
        nc = c if c is not None else ac
        newline = f"| {q} | {w:.4f} | {nc:.4f} | {rows} |\n"
        if newline != lines[i]:
            changed += 1
            if apply:
                lines[i] = newline
    if refused:
        print(
            f"REFUSED {len(refused)} plan-changed mover(s) — triage, "
            f"then --force-plan-changed per query: {sorted(refused)}"
        )
    print(
        f"{changed} rows re-anchored; aggregate warm "
        f"{old_total:.1f}s (old era) -> {new_total:.1f}s (this era), "
        f"shift {new_total / old_total:.2f}x"
    )
    if apply:
        open("BASELINE.md", "w").writelines(lines)
        print("applied")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
