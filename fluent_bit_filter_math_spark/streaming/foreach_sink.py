"""foreachBatch sink — incremental MERGE of a stream into keyed state.

The one Structured Streaming sink shape the suite didn't exercise yet:
``writeStream.foreachBatch`` handing each micro-batch to arbitrary
BATCH DataFrame code. This is the production pattern for maintaining a
keyed table from a stream on plain parquet (or Delta/Iceberg via their
MERGE): per micro-batch, aggregate the batch, full-outer-join it with
the current state on the key, combine, and atomically swap in the new
state version. The reference's closest analogue is the flush-per-chunk
output cycle (/root/reference/test.sh:43) — here the "flush" is a
keyed upsert instead of an append.

Correctness discipline: every state column is merge-ASSOCIATIVE and
COMMUTATIVE (counts add; "latest" compares the total order
(ts, event_id)), so the final state is independent of how the file
source slices micro-batches or which order they land — the property
that makes the result oracle-checkable while maxFilesPerTrigger=1
genuinely drives multiple cross-key micro-batches through the merge.

Scale shape: state and batch are both keyed by user_id; the merge is
ONE co-partitioned full-outer shuffle per micro-batch (AQE broadcasts
the batch side when it's small), and the version swap is a directory
rename-equivalent (write new, repoint), never an in-place update. On a
lakehouse table the same code is MERGE INTO with file-level pruning.
"""

from __future__ import annotations

import os
import tempfile

from fluent_bit_filter_math_spark.scratch import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.functions import exact_cents
from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

_STATE_COLS = ("user_id", "n_events", "last_event_id", "last_cents")


def _merge_batch(state: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Combine per-key state with one micro-batch's per-key aggregate.

    Counts add; the (ts, event_id) struct picks the later event across
    the two sides — both operations associative + commutative, so any
    batch slicing folds to the same state.
    """
    b = (
        batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max(F.struct("ts", "event_id", "cents")).alias("latest"),
        )
        .select(
            "user_id",
            "n_events",
            F.col("latest.ts").alias("last_ts"),
            F.col("latest.event_id").alias("last_event_id"),
            F.col("latest.cents").alias("last_cents"),
        )
    )
    if state is None:
        return b
    s, bb = state.alias("s"), b.alias("b")
    newer = F.struct(F.col("b.last_ts"), F.col("b.last_event_id")) > F.struct(
        F.col("s.last_ts"), F.col("s.last_event_id")
    )
    pick = lambda c: (  # noqa: E731
        F.when(F.col("s.user_id").isNull() | newer, F.col(f"b.{c}"))
        .otherwise(F.col(f"s.{c}"))
        .alias(c)
    )
    return s.join(
        bb, F.col("s.user_id") == F.col("b.user_id"), "full_outer"
    ).select(
        F.coalesce(F.col("s.user_id"), F.col("b.user_id")).alias("user_id"),
        (
            F.coalesce(F.col("s.n_events"), F.lit(0))
            + F.coalesce(F.col("b.n_events"), F.lit(0))
        ).alias("n_events"),
        pick("last_ts"),
        pick("last_event_id"),
        pick("last_cents"),
    )


@register(
    "stream_foreachbatch_merge",
    oracle="""
    SELECT user_id, n_events, last_event_id, last_cents FROM (
      SELECT user_id,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
               AS n_events,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             event_id AS last_event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS last_cents
      FROM events
    ) WHERE rn = 1
    """,
)
def stream_foreachbatch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = scratch_dir("feb-merge")
    src = os.path.join(base, "src")

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        exact_cents(F.col("value")).alias("cents"),
    )
    # Slice the fixture into 2 files RANGE-partitioned on event time so
    # every micro-batch carries most keys — the merge must genuinely
    # combine across batches, not just union disjoint key sets. (Two
    # batches prove the cross-batch fold; more only multiplies the
    # fixed micro-batch overhead on the bounded fixture.)
    ev.repartitionByRange(2, "ts").write.parquet(src)
    schema = spark.read.parquet(src).schema

    # Two-version state swap: parquet can't be read and overwritten in
    # the same job, so each batch reads version v and writes v+1; the
    # last version is the result. (Delta/Iceberg replace this with one
    # transactional MERGE INTO.)
    versions: list[str] = []

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        state = (
            spark.read.parquet(versions[-1]) if versions else None
        )
        out = os.path.join(base, f"state-v{len(versions)}")
        # State is |keys| rows (150 here); one output file per version
        # keeps the swap cheap. A 100 TB deployment sizes this to the
        # key cardinality instead (partitioned state, pruned merge).
        _merge_batch(state, batch_df).coalesce(1).write.parquet(out)
        versions.append(out)

    # Size the per-batch merge shuffle to the state cardinality, same
    # per-query knob rationale as run_stream_to_memory; restore after.
    from fluent_bit_filter_math_spark.pipeline import stream_parts

    key = "spark.sql.shuffle.partitions"
    old_sp = spark.conf.get(key)
    spark.conf.set(key, str(stream_parts()))
    try:
        (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        spark.conf.set(key, old_sp)
    return spark.read.parquet(versions[-1]).select(*_STATE_COLS)


# ---------------------------------------------------------------------------
# foreachBatch → custom Arrow IPC FORMAT sink — the composition of the
# streaming sink surface with the custom connector
# (sources/arrow_ipc.py): every micro-batch appends its own
# batch-id-prefixed IPC shards (executor-side mapInArrow writer, no
# driver data), and the result is read back through the registered
# ``arrow_ipc`` Python DataSource and aggregated under the oracle
# gate. This is the "stream into an interchange format" shape —
# downstream consumers get self-describing columnar files per batch
# without a lakehouse dependency; batch-id prefixes make retried
# batch writes overwrite their own shards (idempotent re-run), the
# same guarantee the parquet sink gets from its commit log.
# ---------------------------------------------------------------------------
@register(
    "stream_arrow_ipc_sink",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events
    WHERE event_id % 4 = 1
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def stream_arrow_ipc_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.sources.arrow_ipc import (
        ArrowIPCDataSource,
        write_arrow_ipc,
    )

    try:
        spark.dataSource.register(ArrowIPCDataSource)
    except Exception:
        pass

    base = scratch_dir("arrow-sink")
    src = os.path.join(base, "src")
    out = os.path.join(base, "ipc")
    os.makedirs(out)

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_id") % 4 == 1
    ).select("event_id", "event_type", exact_cents(F.col("value")).alias("cents"))
    ev.repartitionByRange(2, "event_id").write.parquet(src)
    schema = spark.read.parquet(src).schema

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_arrow_ipc(
            batch_df.repartition(2), out, prefix=f"b{batch_id:04d}"
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    back = spark.read.format("arrow_ipc").option("path", out).load()
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("event_type")
    )
