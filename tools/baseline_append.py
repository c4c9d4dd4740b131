"""Append consolidated-baseline rows (query | warm s | cold s | rows)
for queries missing from BASELINE.md's round-9 table, using the
current BENCH_DETAIL.json for timings and a live run at sf0.1 for row
counts.

Usage: python tools/baseline_append.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    detail = json.load(open("BENCH_DETAIL.json"))
    warm, cold = detail["warm"], detail["cold"]
    lines = open("BASELINE.md").read().splitlines()
    present = {
        l.split("|")[1].strip()
        for l in lines
        if l.startswith("| ") and l.count("|") == 5
    }
    missing = [q for q in warm if q not in present]
    if not missing:
        print("nothing to append")
        return 0

    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark("baseline-rows", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = []
    for q in sorted(missing):
        n = qs[q](spark, SF_DIR).count()
        w = warm.get(q)
        c = cold.get(q)
        out.append(
            f"| {q} | {w if w is not None else '—'} |"
            f" {c if c is not None else '—'} | {n} |"
        )
        print(out[-1], flush=True)
    with open("BASELINE.md", "a") as fh:
        fh.write("\n".join(out) + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
