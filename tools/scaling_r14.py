"""r14 scaling sweep: schema-evolution DDL cost, the fused UPDATE
scan, and the banded perceptual-hash join's candidate volume.

Appends a markdown section suitable for SCALING.md (printed to
stdout; paste-reviewed, not auto-written).

Usage: python tools/scaling_r14.py
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from fluent_bit_filter_math_spark.session import get_spark  # noqa: E402
from fluent_bit_filter_math_spark.sources import table_format as tf  # noqa: E402


def _mk_table(spark, n_files: int, rows_per_file: int = 10_000) -> str:
    t = os.path.join(tempfile.mkdtemp(), "t")
    n = n_files * rows_per_file
    tf.tf_append(
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("int").alias("v"),
        )
        .repartitionByRange(n_files, "k"),
        t,
    )
    return t


def _med(fn, reps: int = 5) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main() -> int:
    spark = get_spark("scaling-r14", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    print("## r14 schema-evolution + fused-update sweep"
          " (tools/scaling_r14.py)\n")

    # 1. ADD COLUMN / DROP COLUMN / WIDEN are O(1) metadata commits.
    print("**ADD/DROP/WIDEN COLUMN are flat in table size** (pure"
          " metadata — one JSON commit each; times in ms):\n")
    print("| table files | add ms | widen ms | drop ms |")
    print("|---|---|---|---|")
    for nf in (4, 16, 64):
        t = _mk_table(spark, nf)
        a = _med(lambda: tf.tf_add_column(t, f"c{time.monotonic_ns()}",
                                          "bigint"), 3)
        w = _med(lambda: tf.tf_widen_column(t, "v", "bigint"), 1)
        d = _med(lambda: tf.tf_drop_column(
            t, sorted(c for c in ("v",) if True)[0]), 1)
        print(f"| {nf} | {a*1e3:.1f} | {w*1e3:.1f} | {d*1e3:.1f} |")

    # 2. fused UPDATE: matched-rows-bound, one candidate scan.
    print("\n**UPDATE (fused single scan) stays matched-rows-bound**"
          " (50-row update, r13b shape for comparison):\n")
    print("| table files | update(50 rows) median s | files DV'd |")
    print("|---|---|---|")
    for nf in (4, 16, 64):
        t = _mk_table(spark, nf)
        n = nf * 10_000

        def _one():
            v, dvd, nu = tf.tf_update(
                spark,
                t,
                [("k", ">", n - 51)],
                {"v": F.col("v") + 1},
            )
            _one.dvd = dvd  # type: ignore[attr-defined]

        m = _med(_one, 3)
        print(f"| {nf} | {m:.3f} | {_one.dvd} |")

    # 3. widened scan vs pre-widen scan (promotion is free).
    print("\n**The widened explicit-schema scan costs what the"
          " mergeSchema scan did** (16-file scan+aggregate, median s):\n")
    t = _mk_table(spark, 16)

    def _scan():
        tf.tf_read(spark, t).agg(F.sum("v")).collect()

    pre = _med(_scan, 5)
    tf.tf_widen_column(t, "v", "bigint")
    post = _med(_scan, 5)
    print("| pre-widen | post-widen |")
    print("|---|---|")
    print(f"| {pre:.3f} | {post:.3f} |")

    # 4. banded phash join: candidate volume vs quadratic.
    print("\n**Perceptual-hash banding replaces the quadratic scan**"
          " (sf0.01/sf0.1 documents; candidate pairs the band join"
          " scores vs n(n-1)/2):\n")
    from fluent_bit_filter_math_spark.operators.multimodal import (
        _ascii_assets,
        _phash_batches,
        _PNG_H_MOD,
        _PNG_W_MOD,
    )

    print("| sf | assets | quadratic pairs | banded candidates |")
    print("|---|---|---|---|")
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        assets = _ascii_assets(spark, sf).filter(
            (F.octet_length("payload") % _PNG_H_MOD >= 6)
            & (F.octet_length("payload") % _PNG_W_MOD >= 4)
        )
        hashes = assets.mapInPandas(
            _phash_batches, schema="asset_id long, dhash long"
        ).cache()
        n = hashes.count()
        bands = hashes.select(
            "asset_id",
            F.explode(
                F.array(
                    *(
                        F.struct(
                            F.lit(b).alias("band"),
                            (F.shiftright(F.col("dhash"), 7 * b) % 128)
                            .alias("bval"),
                        )
                        for b in range(8)
                    )
                )
            ).alias("bb"),
        ).select("asset_id", "bb.band", "bb.bval")
        cand = (
            bands.alias("x")
            .join(
                bands.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bval") == F.col("y.bval"))
                & (F.col("x.asset_id") < F.col("y.asset_id")),
            )
            .select("x.asset_id", "y.asset_id")
            .distinct()
            .count()
        )
        hashes.unpersist()
        print(f"| {os.path.basename(sf)} | {n} | {n*(n-1)//2} | {cand} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
