"""Driver-side cProfile of one query's solo execution (r16 optimization
triage): runs the named query once untimed (JVM/codegen warm-up), then
once under cProfile, and prints the top-N functions by cumulative time.
For the driver-orchestrated lifecycle queries (table-format DML, index
create/probe/maintain, foreachBatch streams) the driver IS the
bottleneck candidate, so py4j-wait attribution per call site is exactly
the map needed before touching code (guide §1: measure first).

Usage: python tools/profile_query.py <query> [--top N] [--sf DIR]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main(argv: list[str]) -> int:
    top = 45
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    sf = SF_DIR
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark("profile", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in argv:
        fn = qs[name]
        _force(fn(spark, sf))  # warm-up
        prof = cProfile.Profile()
        t0 = time.monotonic()
        prof.enable()
        _force(fn(spark, sf))
        prof.disable()
        wall = time.monotonic() - t0
        out = io.StringIO()
        st = pstats.Stats(prof, stream=out)
        st.sort_stats("cumulative").print_stats(top)
        print(f"==== {name}: wall {wall:.2f}s ====")
        # keep only the table body lines that carry real time
        for line in out.getvalue().splitlines():
            ls = line.strip()
            if not ls:
                continue
            print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
