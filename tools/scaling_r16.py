"""sf1 spot-bench of the round-15/16 flagship families (VERDICT r15
#8): persisted dedup/ANN probe + maintenance, table-format DML, and
the classified curation pipeline, timed at sf0.1 vs a 10x replicated
fixture on the same session (min of REPS passes, noop sink).

Fixture construction (the scaling_r11 discipline, one more decade):

* documents — 10 key-offset copies; every copy's TOKENS are suffixed
  with the copy id (a bijection per copy), so within-copy shingle /
  minhash / exact-dup structure is IDENTICAL to sf0.1 while cross-copy
  similarity is ZERO. Without this, replicated texts make every doc a
  10-way exact dup and candidate volume grows with the SQUARE of the
  replication factor — a fixture artifact, not a property of 10x real
  data. doc_id stride is a multiple of 20 so the source = doc_id % 20
  assignment (and the src0 batch/corpus split) is preserved per copy.
* embeddings — 10 vec_id-offset copies, vectors verbatim (timing-only:
  replicated vectors tie in cosine, which does not change the work).
* events — 10 event_id/user_id-offset copies, stride a multiple of
  4800 so the %2/%3/%4/%16/%25 query-side moduli see unchanged
  per-copy densities.

Pass criterion: probe/maintenance families grow sublinearly (cost
tracks the batch / NPROBE / n_bands fractions, never corpus size);
whole-corpus passes (curation) grow about linearly (<= ~10x + floor).

Usage: python tools/scaling_r16.py [--reps N] [--keep]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1_r16"
COPIES = 10
QUERIES = [
    "dedup_incremental_persisted",
    "dedup_index_maintenance",
    "sim_ann_persisted",
    "sim_ann_maintenance",
    "sim_ann_retrain_pq",
    "io_table_format_merge",
    "io_table_format_delete",
    "pipeline_curate_classified",
]


def _gen(spark) -> None:
    import pyspark.sql.functions as F

    from fluent_bit_filter_math_spark.sources import table

    os.makedirs(DST, exist_ok=True)

    docs = table(spark, SF01, "documents")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0]
    stride = ((max_doc // 20) + 1) * 20  # preserves doc_id % 20
    out = None
    for k in range(COPIES):
        suffixed = F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit(f"§{k}")),
            ),
        )
        p = docs.select(
            (F.col("doc_id") + k * stride).alias("doc_id"),
            suffixed.alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 0).alias("n_chars"),
        )
        out = p if out is None else out.unionAll(p)
    out.write.mode("overwrite").parquet(os.path.join(DST, "documents.parquet"))

    emb = table(spark, SF01, "embeddings")
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0]
    vstride = ((max_vec // 100) + 1) * 100
    out = None
    for k in range(COPIES):
        p = emb.select(
            (F.col("vec_id") + k * vstride).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        ).select(*emb.columns)
        out = p if out is None else out.unionAll(p)
    out.write.mode("overwrite").parquet(os.path.join(DST, "embeddings.parquet"))

    orders = table(spark, SF01, "orders")
    max_ok = orders.agg(F.max("o_orderkey")).collect()[0][0]
    # stride a multiple of 4 * 7 * 11 = 308 (the merge/delete
    # quartile + mod-7 update + mod-11 delete selectors keep their
    # per-copy densities)
    ostride = ((max_ok // 308) + 1) * 308
    out = None
    for k in range(COPIES):
        p = orders.select(
            (F.col("o_orderkey") + k * ostride).alias("o_orderkey"),
            *[c for c in orders.columns if c != "o_orderkey"],
        ).select(*orders.columns)
        out = p if out is None else out.unionAll(p)
    out.write.mode("overwrite").parquet(os.path.join(DST, "orders.parquet"))

    ev = table(spark, SF01, "events")
    max_eid = ev.agg(F.max("event_id")).collect()[0][0]
    estride = ((max_eid // 4800) + 1) * 4800
    out = None
    for k in range(COPIES):
        p = ev.select(
            (F.col("event_id") + k * estride).alias("event_id"),
            *[c for c in ev.columns if c != "event_id"],
        ).select(*ev.columns)
        out = p if out is None else out.unionAll(p)
    out.write.mode("overwrite").parquet(os.path.join(DST, "events.parquet"))


def main(argv: list[str]) -> int:
    reps = 2
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
    keep = "--keep" in argv

    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark(
        "scaling-r16",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    print("generating the 10x fixture ...", flush=True)
    t0 = time.monotonic()
    _gen(spark)
    print(f"fixture ready in {time.monotonic() - t0:.1f}s", flush=True)

    def timed(name: str, sf_dir: str) -> float:
        fn = qs[name]
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return best

    rows = []
    for name in QUERIES:
        try:
            a = timed(name, SF01)
            b = timed(name, DST)
            rows.append((name, a, b, b / a))
            print(
                f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f}x |",
                flush=True,
            )
        except Exception as exc:  # keep sweeping, report at the end
            rows.append((name, None, None, None))
            print(f"| {name} | FAILED: {exc!r:.120} |", flush=True)

    print(
        json.dumps(
            {
                "sweep": "r16-sf1",
                "copies": COPIES,
                "rows": [
                    {
                        "query": n,
                        "sf0.1": a and round(a, 2),
                        "sf1": b and round(b, 2),
                        "ratio": r and round(r, 2),
                    }
                    for n, a, b, r in rows
                ],
            }
        ),
        flush=True,
    )
    if not keep:
        shutil.rmtree(DST, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
