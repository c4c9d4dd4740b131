"""Solo quiet-box re-measure of one or more queries: N warm reps of
each named query at $SPARK_GRAFT_SF_DIR with nothing else running, the
triage protocol AUDIT_r14 used for >2x window movers. Prints one JSON
line per query: {"query": ..., "reps": [...], "min": ..., "median": ...}.

Usage: python tools/solo_measure.py q1 [q2 ...] [--reps N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main(argv: list[str]) -> int:
    reps = 7
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    names = argv
    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark("solo-measure", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        _force(fn(spark, SF_DIR))  # untimed warm-up (JVM + codegen)
        samples = []
        for _ in range(reps):
            t0 = time.monotonic()
            _force(fn(spark, SF_DIR))
            samples.append(round(time.monotonic() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": SF_DIR,
                    "reps": samples,
                    "min": min(samples),
                    "median": statistics.median(samples),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
