"""Decade-2 weak-scaling sweep for the heavy dedup/text/similarity
queries (companion to scaling_r11.py's graph/rank sweep): replicate
sf0.1's documents/embeddings/events 10x and time each query at sf0.1
vs the 10x fixture.

Replication is family-honest:

- documents: every TOKEN gets a per-copy suffix (copy 0 unchanged), so
  cross-copy shingle/bigram overlap is ZERO — a fair weak-scaling
  corpus for dedup (naively replicating identical text would create
  10x-duplicate groups and QUADRATIC pair growth, i.e. a different
  problem, not more of the same one). n_chars is recomputed.
- embeddings: vec_id offset per copy, vectors unchanged (brute/LSH/IVF
  cost scales with corpus size, not id values).
- events: event_id/user_id offset per copy (the scaling_r11 form).

Usage: python tools/scaling_r11b.py [--keep]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1b"
COPIES = 10
REPS = 2
DOC_STRIDE = 1_000_000
VEC_STRIDE = 1_000_000
EID_STRIDE = 100_000
UID_STRIDE = 1_500

QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_cdc_chunks",
    "text_bpe_train_merges",
    "text_heaps_vocab_growth",
    "sim_mmr_diversify",
    "sim_ann_ivf",
    "agg_bootstrap_poisson",
    "join_spatial_grid",
]


def _gen(spark) -> None:
    from pyspark.sql import functions as F

    from fluent_bit_filter_math_spark.sources import table

    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)

    docs = table(spark, SRC, "documents")
    parts = []
    for i in range(COPIES):
        if i == 0:
            parts.append(docs.select(
                "doc_id", "text", "lang", "source", "n_chars"))
            continue
        tagged = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit(f"~{i}")),
            ),
            " ",
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + i * DOC_STRIDE).alias("doc_id"),
                tagged.alias("text"),
                "lang",
                "source",
                F.length(tagged).cast("long").alias("n_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.write.parquet(os.path.join(DST, "documents.parquet"))

    emb = table(spark, SRC, "embeddings")
    parts = [
        emb.select(
            (F.col("vec_id") + i * VEC_STRIDE).alias("vec_id"),
            "embedding",
            "label",
        )
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.write.parquet(os.path.join(DST, "embeddings.parquet"))

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

    spark = get_spark("scaling-r11b", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    print("generating 10x documents/embeddings/events fixture ...",
          flush=True)
    _gen(spark)

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
