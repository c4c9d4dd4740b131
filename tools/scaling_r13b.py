"""r13b scaling sweep: the new DML/metadata surface of the commit-log
table format (RESTORE, UPDATE, CHECK constraints, column mapping).

Four questions, each answering a specific 100 TB concern:

1. RESTORE latency vs how far back the target is — restore is
   metadata-only, so it must scale with the LIVE-SET DIFF, never with
   data volume or the distance travelled.
2. UPDATE cost vs table size at FIXED match size — the stats prune
   candidates, so updating 50 rows must not get slower as the table
   grows files the predicate rules out.
3. Constraint validation overhead per append — one OR-combined
   aggregate job over the incoming batch; measure 0 vs 3 constraints.
4. Rename read overhead — the logical relabel is a projection; a
   renamed table's scan must cost what the unrenamed scan costs.

Usage: python tools/scaling_r13b.py  (prints a markdown table)
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _med(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> int:
    import pyspark.sql.functions as F

    from fluent_bit_filter_math_spark.session import get_spark
    from fluent_bit_filter_math_spark.sources.table_format import (
        tf_append,
        tf_read,
        tf_rename_column,
        tf_restore,
        tf_set_constraint,
        tf_update,
    )

    spark = get_spark("scaling-r13b", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def mk(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )

    base = tempfile.mkdtemp(prefix="scale13b-")

    # --- 1. restore latency vs distance (64-file table) -------------
    t1 = os.path.join(base, "restore")
    for i in range(64):
        tf_append(mk(i * 100, (i + 1) * 100).coalesce(1), t1)
    print("| restore distance (commits back) | median s |")
    print("|---|---|")
    for back in (1, 8, 32, 63):
        target = 63 - back
        # measure the single restore; undo by restoring to 63's state
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            tf_restore(t1, target)
            ts.append(time.perf_counter() - t0)
            tf_restore(t1, 63)  # put the full live set back
        print(f"| {back} | {statistics.median(ts):.4f} |")

    # --- 2. update at fixed match size vs table size -----------------
    print("\n| table files | update(50 rows) median s | files DV'd |")
    print("|---|---|---|")
    for n_files in (4, 16, 64):
        t2 = os.path.join(base, f"upd{n_files}")
        for i in range(n_files):
            tf_append(mk(i * 100, (i + 1) * 100).coalesce(1), t2)
        hi = n_files * 100

        def _u():
            return tf_update(
                spark,
                t2,
                [("k", ">=", hi - 50)],
                {"v": F.col("v") + 1},
            )

        ts, dvd = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            _, dvd, _ = _u()
            ts.append(time.perf_counter() - t0)
        print(f"| {n_files} | {statistics.median(ts):.3f} | {dvd} |")

    # --- 3. constraint overhead per append ---------------------------
    t3a = os.path.join(base, "nocons")
    t3b = os.path.join(base, "cons")
    tf_append(mk(0, 1000).coalesce(2), t3a)
    tf_append(mk(0, 1000).coalesce(2), t3b)
    tf_set_constraint(spark, t3b, "k_pos", "k >= 0")
    tf_set_constraint(spark, t3b, "v_pos", "v >= 0")
    tf_set_constraint(spark, t3b, "v_mul", "v % 3 = 0")
    batch = mk(10_000, 20_000).coalesce(2)
    a = _med(lambda: tf_append(batch, t3a), reps=5)
    b = _med(lambda: tf_append(batch, t3b), reps=5)
    print(
        f"\nappend 10k rows: no constraints {a:.3f} s, "
        f"3 constraints {b:.3f} s (+{(b - a) * 1000:.0f} ms)"
    )

    # --- 4. rename read overhead --------------------------------------
    t4 = os.path.join(base, "ren")
    for i in range(16):
        tf_append(mk(i * 1000, (i + 1) * 1000).coalesce(1), t4)
    plain = _med(
        lambda: tf_read(spark, t4).agg(F.sum("v")).collect(), reps=5
    )
    tf_rename_column(t4, "v", "val")
    renamed = _med(
        lambda: tf_read(spark, t4).agg(F.sum("val")).collect(), reps=5
    )
    print(
        f"scan+agg 16k rows: pre-rename {plain:.3f} s, "
        f"post-rename {renamed:.3f} s"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
