"""Dedicated scaling sweep for the LATE round-10 queries: time each at
sf0.001 / sf0.01 / sf0.1 (min of 2 passes per sf, noop sink) and print
a SCALING.md-ready markdown table.

Usage: python tools/scaling_r10.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "stream_pysink_roundtrip",
    "retrieval_rrf_fusion",
    "retrieval_ndcg_eval",
    "ts_autocorr_lag1",
    "graph_degree_assortativity",
    "sketch_ams_f2",
    "dq_iqr_outliers",
    "dedup_minhash_error_audit",
    "mm_bmp_decode",
    "graph_clustering_coefficient",
    "agg_weighted_median",
    "text_rake_keywords",
    "emb_random_projection_jl",
]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
REPS = 2


def main() -> int:
    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark("scaling-r10", master="local[32]")
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
