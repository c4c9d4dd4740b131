"""Dedicated scaling sweep for the late-r10 SECOND-WAVE queries (the 10 new operators): time each at
sf0.001 / sf0.01 / sf0.1 (min of 2 passes per sf, noop sink) and print
a SCALING.md-ready markdown table.

Usage: python tools/scaling_r10b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "dq_l_diversity",
    "graph_personalized_pagerank",
    "q_repeat_purchase_intervals",
    "agg_hhi_source_mix",
    "agg_lorenz_deciles",
    "dq_cramers_v",
    "dq_spearman_trend",
    "graph_hits",
    "graph_wl_refinement",
    "retrieval_pr_at_k",
    "text_flesch_readability",
    "text_pmi_collocations",
    "emb_silhouette",
]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
REPS = 2


def main() -> int:
    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark("scaling-r10b", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # warm the python worker pool
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    results: dict[str, list[float]] = {}
    for sf in SFS:
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

    print()
    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | t(0.1)/t(0.001) |")
    print("|---|---|---|---|---|")
    for name in QUERIES:
        a, b, c = results[name]
        print(f"| {name} | {a:.2f} | {b:.2f} | {c:.2f} | {c / a:.1f}× |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
