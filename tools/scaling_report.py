"""Scale-sweep evidence: run headline queries at sf0.001 / 0.01 / 0.1
and record how wall-clock grows with data size.

The fixtures span 100× on the relational tables (~6k → ~600k lineitem
rows) and 10× on the corpus tables (500 → 5000 documents), so a query
whose runtime is dominated by per-row work should grow far slower than
data (fixed overhead amortizes), and anything super-linear (an
accidental O(n²) join, a collapsed-to-driver stage) shows up
immediately as a >100× ratio. Writes SCALING.md.

Usage: python tools/scaling_report.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["sf0.001", "sf0.01", "sf0.1"]
ROOT = "/root/testdata"

# Headline set: one per cost family (narrow fold, shuffle agg, broadcast
# join, window, all-pairs dedup family, LSH, GEMM, streaming state).
QUERIES = [
    "math_sum",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "win_session_user",
    "text_doc_freq",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "sim_ann_gemm",
    "sim_topk_bruteforce",
    "sim_ann_ivf",
    "stream_stateful_user_totals",
    "stream_stream_join_attrib",
    "dedup_cluster_cc",
    "text_repetition_filter",
    "pipeline_curate_corpus",
    "sample_stratified",
    "ts_resample_locf",
    "dedup_incremental",
    "pipeline_pack_sequences",
    "text_lm_score",
    "emb_quantize_int8",
    "decontam_ngram_overlap",
    "emb_kmeans",
]


def main() -> int:
    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark("scaling-report")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def force(df):
        # noop write: full plan, every column, nothing on the driver —
        # same forcing as bench.py (count() lets Catalyst prune
        # deterministic projections).
        df.write.format("noop").mode("overwrite").save()

    # Warm up JVM + Python worker pool once.
    force(qs["math_sum"](spark, f"{ROOT}/{SFS[0]}"))
    spark.range(64).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for _ in range(2):  # two passes, keep the min (noise guard)
        for sf in SFS:
            sf_dir = f"{ROOT}/{sf}"
            for q in QUERIES:
                t0 = time.perf_counter()
                force(qs[q](spark, sf_dir))
                dt = time.perf_counter() - t0
                prev = results[q].get(sf)
                results[q][sf] = dt if prev is None else min(prev, dt)

    lines = [
        "# SCALING — wall-clock vs data size (min of 2 passes, local[32])",
        "",
        "Fixture growth: relational tables ×10 per sf step (×100 total);",
        "documents/embeddings ×~3 per step (×10 total). A scalable plan",
        "grows slower than data at this size (fixed overhead dominates);",
        "super-linear growth (≫ data ratio) would expose an accidental",
        "O(n²) stage or driver collapse.",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | t(0.1)/t(0.001) |",
        "|---|---|---|---|---|",
    ]
    for q in QUERIES:
        r = results[q]
        ratio = r["sf0.1"] / r["sf0.001"]
        lines.append(
            f"| {q} | {r['sf0.001']:.2f} | {r['sf0.01']:.2f} "
            f"| {r['sf0.1']:.2f} | {ratio:.1f}× |"
        )
    out = "\n".join(lines) + "\n"
    with open(os.path.join(os.path.dirname(__file__), "..", "SCALING.md"), "w") as f:
        f.write(out)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
