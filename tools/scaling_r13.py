"""r13 scaling evidence: commit-log metadata cost vs table age.

Two measurements over a synthetic table aged to N commits:

1. snapshot-resolution latency WITH the every-10th-commit checkpoints
   vs with every checkpoint file deleted (pure replay) — the
   O(interval) vs O(age) claim behind sources/table_format.py's
   checkpoint design;
2. data-skipping decision latency (tf_pruned_files) at the same ages —
   the driver-side cost of the stats prune is O(live files), not
   O(data).

Driver-side only (the whole point: the 100 TB of data never moves);
rows per commit are tiny because metadata cost is independent of row
count. Usage: python tools/scaling_r13.py [ages...]
"""

from __future__ import annotations

import glob
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    ages = [int(a) for a in argv] or [20, 100, 300]

    from fluent_bit_filter_math_spark.session import get_spark
    from fluent_bit_filter_math_spark.sources import table_format as tf

    spark = get_spark("scaling-r13", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    t = os.path.join(tempfile.mkdtemp(prefix="tf-age-"), "t")
    df = spark.range(0, 64).selectExpr("id k", "id * 3 v").coalesce(1)
    committed = 0

    def resolve_ms(reps: int = 7) -> float:
        head = tf.latest_version(t)
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            tf._resolve(t, head)
            samples.append((time.perf_counter() - t0) * 1e3)
        return statistics.median(samples)

    def prune_ms(reps: int = 7) -> float:
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            tf.tf_pruned_files(t, [("k", ">", 10)])
            samples.append((time.perf_counter() - t0) * 1e3)
        return statistics.median(samples)

    print("age_commits | resolve_ckpt_ms | resolve_replay_ms | prune_ms")
    for age in sorted(ages):
        while committed < age:
            tf.tf_append(df, t)
            committed += 1
        with_ckpt = resolve_ms()
        prune = prune_ms()
        # delete every checkpoint, measure the pure-replay cost, then
        # restore the newest one for the next age step
        cps = glob.glob(os.path.join(t, "_log", "*.checkpoint.json"))
        saved = {p: open(p).read() for p in cps}
        for p in cps:
            os.remove(p)
        replay = resolve_ms()
        for p, body in saved.items():
            with open(p, "w") as f:
                f.write(body)
        print(
            f"{age:>11} | {with_ckpt:>15.2f} | {replay:>17.2f} |"
            f" {prune:>8.2f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
