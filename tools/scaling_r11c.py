"""Decade sweep for the SEVEN r11-new operators: every operator added
this round gets the same 10x weak-scaling evidence the rest of the
surface already has. Combines scaling_r11's key-offset lineitem/events
replication with scaling_r11b's token-suffixed documents (and key-offset
embeddings) into one fixture, then times each new query at sf0.1 vs 10x.

Usage: python tools/scaling_r11c.py [--keep]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.scaling_r11 as r11
import tools.scaling_r11b as r11b

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1c"
REPS = 2

QUERIES = [
    "kafka_wire_roundtrip",
    "graph_kcore_peel",
    "text_heaps_vocab_growth",
    "q_pareto_frontier",
    "graph_boruvka_msf",
    "graph_random_walks",
    "graph_ppr_sweep_cut",
]


def main(argv: list[str]) -> int:
    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark("scaling-r11c", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    print("generating combined 10x fixture ...", flush=True)
    # borrow both generators by retargeting their DST
    r11.DST = DST
    r11._gen(spark)          # lineitem + events (key-offset copies)
    saved = r11b.DST
    r11b.DST = DST + "-docs"
    r11b._gen(spark)         # documents (token-suffixed) + embeddings
    for t in ("documents.parquet", "embeddings.parquet"):
        shutil.move(os.path.join(r11b.DST, t), os.path.join(DST, t))
    shutil.rmtree(r11b.DST, ignore_errors=True)
    r11b.DST = saved

    results: dict[str, list[float]] = {}
    for sf in (SRC, DST):
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
