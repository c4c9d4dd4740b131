"""sf1 (10x) per-query scaling rows for the r16/r17 optimization
levers (VERDICT r16 #7): (a) the overlap-touched lifecycle walks —
driver-thread action overlap only helps if it survives data growth,
i.e. the overlapped jobs stay independent and the walk's cost keeps
tracking the batch/probe fractions, not corpus size — and (b) the six
repartition-before-heavy-projection queries, whose exchange is argued
work ≫ bytes (it must grow ≤ ~linearly, never superlinearly, or the
pre-spread would be the wrong call at scale).

Reuses scaling_r16's replicated-fixture generator (key-offset copies,
suffixed tokens, stride-preserving moduli — see that docstring for why
naive replication would square the candidate volume).

Pass criteria:
* lifecycle walks — sublinear (cost tracks batch/NPROBE/n_bands
  fractions); the OVERLAP structure itself is scale-invariant (the
  overlapped actions commit to distinct tables at any size).
* repartition-sweep queries — ≤ ~linear (10x + floor): the per-row
  kernel work dominates the one extra exchange at every size.

Usage: python tools/scaling_r17.py [--reps N] [--keep]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_r16 import DST, SF01, _gen  # noqa: E402

# (a) overlap-touched lifecycle walks (r16 #15/#16 + r17 _ranged_pair)
OVERLAP_QUERIES = [
    "stream_dedup_ingest",
    "stream_dedup_ingest_xepoch",
    "dedup_incremental_persisted",
    "dedup_index_maintenance",
    "sim_ann_persisted",
    "sim_ann_maintenance",
    "sim_ann_persisted_pq",
    "sim_ann_retrain",
    "sim_ann_retrain_pq",
]
# (b) repartition-before-heavy-projection sweep (r16 change 11)
REPART_QUERIES = [
    "agg_bootstrap_poisson",
    "dedup_cdc_chunks",
    "dedup_substring_trim",
    "join_spatial_grid",
    "emb_random_projection_jl",
    "sketch_ams_f2",
]


def main(argv: list[str]) -> int:
    reps = 2
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
    keep = "--keep" in argv

    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark(
        "scaling-r17",
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
    for kind, names in (
        ("overlap", OVERLAP_QUERIES),
        ("repart", REPART_QUERIES),
    ):
        for name in names:
            try:
                a = timed(name, SF01)
                b = timed(name, DST)
                rows.append((kind, name, a, b, b / a))
                print(
                    f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f}x |",
                    flush=True,
                )
            except Exception as exc:  # keep sweeping, report at end
                rows.append((kind, name, None, None, None))
                print(f"| {name} | FAILED: {exc!r:.120} |", flush=True)

    print(
        json.dumps(
            {
                "sweep": "r17-sf1",
                "rows": [
                    {
                        "kind": k,
                        "query": n,
                        "sf0.1": a and round(a, 2),
                        "sf1": b and round(b, 2),
                        "ratio": r and round(r, 2),
                    }
                    for k, n, a, b, r in rows
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
