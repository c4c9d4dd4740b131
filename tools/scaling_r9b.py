"""Dedicated scaling sweep for the LATE round-9 queries: time each at
sf0.001 / sf0.01 / sf0.1 (min of 2 passes per sf, noop sink) and print
a SCALING.md-ready markdown table.

Usage: python tools/scaling_r9b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "text_gopher_rules",
    "stream_gopher_filter",
    "sample_priority_topk",
    "sample_kcenter_coreset",
    "sketch_theta_set_ops",
    "sim_mips_transform",
    "ts_ewma_fixedpoint",
    "ts_ewma_recursive",
    "agg_theilsen_slope",
    "agg_mad_robust",
    "window_login_streaks",
    "join_spatial_grid",
    "mm_gif_decode",
    "io_orc_roundtrip",
    "graph_label_propagation",
    "dq_benford_anomaly",
    "ts_time_weighted_avg",
    "agg_gini_concentration",
    "sample_epoch_shuffle",
    "stream_tws_priority_sample",
    "dq_k_anonymity",
    "stream_tws_state_inspect",
    "udtf_analyze_polymorphic",
    "pipeline_curate_select",
    "agg_bootstrap_ci",
    "dq_ks_two_sample",
    "ts_cusum_alarms",
    "ts_seasonal_decompose",
    "ts_holt_linear_fold",
    "dq_mann_whitney_u",
    "dq_chi_square_independence",
    "ts_zband_outliers",
]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
REPS = 2


def main() -> int:
    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark("scaling-r8", master="local[32]")
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
