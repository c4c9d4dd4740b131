"""Dump `.explain("formatted")` for named queries to files (the r16
optimization round's before/after plan evidence).

Usage: python tools/plan_dump.py <suffix> <query> [query ...]
       (suffix = "before" | "after"; files land in plans/r16/)

Executing a registry entry may run its full driver-orchestrated walk
(index creation, stream drain); the dumped plan is the RETURNED frame's
— for those queries the interesting per-job plans are pinned in-query /
in tests, and the file still records the final-frame shape the claim
refers to. Runs at sf0.01 by default (plan shape, not timing).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_PLANS", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r16",
)


def main(argv: list[str]) -> int:
    suffix = argv[0]
    names = argv[1:]
    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(fmt)
        out = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
