"""Weak-scaling sweep for the stateful-streaming family (VERDICT r11
#6): the TWS block and the stream-stream joins had sf0.1 evidence only.
Replicate sf0.1's events 10x as DISJOINT key-offset copies (10x users,
10x events, per-user structure unchanged — the scaling_r11 fixture
recipe) and time the heaviest streaming queries at sf0.1 and the 10x
fixture, with the state partition count scaled like shuffle partitions
via SPARK_GRAFT_STREAM_PARTS (the sizing rule's streaming twin,
pipeline.stream_parts). Pass criterion: growth <= the 10x data ratio
modulo the measured per-stream floor (~2.8 s planning+addBatch,
SCALING.md r9), at SOME partition setting — the knob is the documented
answer where the default-4 run grows past the ratio.

Usage: python tools/scaling_r12.py [--keep]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1_events"
COPIES = 10
REPS = 2
EID_STRIDE = 100_000   # max event_id 99 999
UID_STRIDE = 1_500     # max user_id 1 499

QUERIES = [
    "stream_tws_idle_close",
    "stream_tws_state_inspect",
    "stream_tws_type_stats",
    "stream_tws_list_seeded",
    "stream_stream_full_outer",
    "stream_kafka_wire_fold",
]

# (sf_dir label, SPARK_GRAFT_STREAM_PARTS) cells to run at the 10x
# fixture; sf0.1 runs at the default (4) only.
TENX_PARTS = (4, 16)


def _gen(spark) -> None:
    from pyspark.sql import functions as F

    from fluent_bit_filter_math_spark.sources import table

    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    ev = table(spark, SRC, "events")
    parts = [
        ev.select(
            (F.col("event_id") + i * EID_STRIDE).alias("event_id"),
            "ts",
            (F.col("user_id") + i * UID_STRIDE).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.write.parquet(os.path.join(DST, "events.parquet"))
    # stream_stream_full_outer / kafka_wire also touch only events; the
    # remaining tables are symlinked so table() resolves them if a
    # query's setup path reads dimensions.
    for f in os.listdir(SRC):
        dst = os.path.join(DST, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f), dst)


def main(argv: list[str]) -> int:
    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark("scaling-r12", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # JIT/Arrow warmup
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    print("generating 10x events fixture ...", flush=True)
    _gen(spark)

    def run_cell(name: str, sf: str, parts: int | None) -> float:
        if parts is None:
            os.environ.pop("SPARK_GRAFT_STREAM_PARTS", None)
        else:
            os.environ["SPARK_GRAFT_STREAM_PARTS"] = str(parts)
        best = None
        try:
            for _ in range(REPS):
                t0 = time.perf_counter()
                qs[name](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        finally:
            os.environ.pop("SPARK_GRAFT_STREAM_PARTS", None)
        return best

    rows = []
    for name in QUERIES:
        base = run_cell(name, SRC, None)
        print(f"{name} @ sf0.1 parts=4: {base:.2f}s", flush=True)
        cells = {}
        for parts in TENX_PARTS:
            t = run_cell(name, DST, parts)
            cells[parts] = t
            print(f"{name} @ 10x parts={parts}: {t:.2f}s", flush=True)
        rows.append((name, base, cells))

    print("\n| query | sf0.1 (parts=4) | 10x parts=4 | 10x parts=16 "
          "| best ratio |")
    print("|---|---|---|---|---|")
    for name, base, cells in rows:
        best = min(cells.values())
        print(
            f"| {name} | {base:.2f} | {cells[TENX_PARTS[0]]:.2f} "
            f"| {cells[TENX_PARTS[1]]:.2f} | {best / base:.1f}x |"
        )
    if "--keep" not in argv:
        shutil.rmtree(DST, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
