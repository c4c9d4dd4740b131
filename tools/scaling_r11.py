"""sf1-scale weak-scaling sweep for the shuffle-heavy graph/rank ops
(VERDICT r10 #4): their 100x claims rested on sf0.001->0.1 sweeps only
(two decades of extrapolation). This adds one more decade: replicate
sf0.1's lineitem/events 10x as DISJOINT key-offset copies (the standard
weak-scaling fixture — 10x nodes/edges/rows, per-copy structure
unchanged) into a scratch dir, then time each query at sf0.1 and the
sf1 fixture (min of REPS passes, noop sink). Pass criterion: growth
less than or equal to the 10x data ratio (modulo fixed per-query floors).

Key strides are multiples of every modulus the queries filter on
(_TRI_PART_MOD=50 part sparsifier, PPR's partkey%100 seed set), so each
copy keeps the same subset densities as the original.

Usage: python tools/scaling_r11.py [--keep]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1"
COPIES = 10
REPS = 2
# strides: > max key in sf0.1, divisible by the query-side moduli
P_STRIDE = 20_000      # max l_partkey 19 999; 20 000 % 50 = % 100 = 0
S_STRIDE = 1_000       # max l_suppkey 999
O_STRIDE = 150_000     # max l_orderkey 149 999
EID_STRIDE = 100_000   # max event_id 99 999
UID_STRIDE = 1_500     # max user_id 1 499

QUERIES = [
    "graph_wl_refinement",
    "graph_clustering_coefficient",
    "graph_personalized_pagerank",
    "dq_spearman_trend",
]


def _gen(spark) -> None:
    from pyspark.sql import functions as F

    from fluent_bit_filter_math_spark.sources import table

    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    li = table(spark, SRC, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice",
    )
    parts = [
        li.select(
            (F.col("l_orderkey") + i * O_STRIDE).alias("l_orderkey"),
            (F.col("l_partkey") + i * P_STRIDE).alias("l_partkey"),
            (F.col("l_suppkey") + i * S_STRIDE).alias("l_suppkey"),
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        )
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.write.parquet(os.path.join(DST, "lineitem.parquet"))

    ev = table(spark, SRC, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    parts = [
        ev.select(
            (F.col("event_id") + i * EID_STRIDE).alias("event_id"),
            "ts",
            (F.col("user_id") + i * UID_STRIDE).alias("user_id"),
            "event_type",
            "value",
        )
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.write.parquet(os.path.join(DST, "events.parquet"))


def main(argv: list[str]) -> int:
    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark("scaling-r11", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    print("generating sf1 fixture ...", flush=True)
    _gen(spark)

    results: dict[str, list[float]] = {}
    for sf in (SRC, DST):
        # iterative-graph caches are keyed by sf_dir — no cross-sf reuse
        for name in QUERIES:
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                qs[name](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, []).append(best)
            print(f"{name} @ {os.path.basename(sf)}: {best:.2f}s",
                  flush=True)

    print("\n| query | sf0.1 | sf1 (10x fixture) | ratio |")
    print("|---|---|---|---|")
    for name, (a, b) in results.items():
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f}x |")
    if "--keep" not in argv:
        shutil.rmtree(DST, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
