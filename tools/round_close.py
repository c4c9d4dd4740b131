"""Round-close checklist (VERDICT r11 "What's wrong" #1: round
artifacts left untracked two rounds running). Run as the LAST step of
a round; exit 0 only when the round is actually closed:

1. working tree clean (no modified/untracked files — in particular no
   BENCH_r*/CORRECTNESS_r* of the closing round left uncommitted),
2. the newest BENCH_r*.json and CORRECTNESS_r*.json are git-tracked,
3. tools/window_audit.py passes (every never-checked query inside the
   driver window),
4. the local gate log (CORRECTNESS_LOCAL.json) reports zero failures,
5. tools/regression_guard.py reports no movers (or the caller already
   triaged them — pass --skip-guard after documenting).

Usage: python tools/round_close.py [--skip-guard]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sh(*args: str) -> str:
    return subprocess.run(
        args, cwd=REPO, capture_output=True, text=True
    ).stdout


def main(argv: list[str]) -> int:
    bad = 0

    status = _sh("git", "status", "--porcelain").strip()
    if status:
        print("FAIL tree not clean:\n" + status)
        bad = 1
    else:
        print("ok   working tree clean")

    tracked = set(_sh("git", "ls-files").splitlines())
    for pat in ("BENCH_r*.json", "CORRECTNESS_r*.json"):
        newest = max(
            glob.glob(os.path.join(REPO, pat)),
            key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
            default=None,
        )
        if newest and os.path.relpath(newest, REPO) not in tracked:
            print(f"FAIL newest round artifact untracked: {newest}")
            bad = 1
        elif newest:
            print(f"ok   tracked: {os.path.basename(newest)}")

    if subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "window_audit.py")],
        cwd=REPO,
    ).returncode:
        print("FAIL window_audit")
        bad = 1
    else:
        print("ok   window_audit")

    local = os.path.join(REPO, "CORRECTNESS_LOCAL.json")
    if os.path.exists(local):
        data = json.load(open(local))
        reds = [
            q
            for q, v in data.get("results", {}).items()
            if v.get("status") != "ok"
        ]
        if reds or data.get("passed") != data.get("total"):
            print(
                f"FAIL local gate {data.get('passed')}/{data.get('total')}"
                f" reds: {reds[:10]}"
            )
            bad = 1
        else:
            print(f"ok   local gate {data['passed']}/{data['total']}")
    else:
        print("WARN no CORRECTNESS_LOCAL.json")

    if "--skip-guard" not in argv:
        if subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "regression_guard.py")],
            cwd=REPO,
        ).returncode:
            print("FAIL regression_guard movers (triage, then --skip-guard)")
            bad = 1
        else:
            print("ok   regression_guard")

    print("ROUND CLOSED" if not bad else "ROUND NOT CLOSED")
    return bad


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
