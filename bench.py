"""Benchmark harness — runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed as a full plan execution — scan → transform → a
``noop``-format write. The earlier ``df.count()`` collapse let Catalyst
PRUNE deterministic projections (a count needs no columns), so every
projection-only query timed just the parquet scan — the fold expressions
were verifiably absent from the physical plan (ADVICE r1). The noop V2
sink consumes complete rows, so every output column is computed and
nothing materializes on the driver.

Timing = minimum over $SPARK_GRAFT_BENCH_REPS (default 3) *interleaved
passes* — every query runs once per pass, so a transient host-noise
window (co-tenant CPU burst, GC storm) degrades one pass of many
queries instead of every rep of one query; the per-query min then
recovers the machine's true capability. (Measured: back-to-back reps
let a ~30 s noise window inflate a 0.6 s query to a 9 s "median".)
One untimed warm-up of the first query precedes the passes (JVM +
codegen warmup).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def _force(df) -> None:
    """Execute the full plan, all columns, nothing on the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Warm up untimed: JVM + codegen via the first query, and the Python
    # worker pool via a trivial mapInPandas across all cores (cold spawn
    # of 32 Arrow workers costs ~45 s once per cluster; every long-lived
    # deployment amortizes it, so it doesn't belong in per-query timings).
    first = next(iter(qs))
    _force(qs[first](spark, SF_DIR))
    spark.range(spark.sparkContext.defaultParallelism * 2).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    times: dict[str, list[float]] = {name: [] for name in qs}
    for _ in range(REPS):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            _force(fn(spark, SF_DIR))
            times[name].append(time.perf_counter() - t0)
    per_query = {name: round(min(ts), 4) for name, ts in times.items()}

    total = round(sum(per_query.values()), 4)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "total_min_sec_all_queries",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf_val,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
