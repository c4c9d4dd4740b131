"""Round-12 additions: shared wire-RPC retry (stream half), Borůvka
CC seeding, shared oriented-wedge build for the triangle family.

Reference analogue: fault tolerance on the ingestion path mirrors the
reference's tolerance of malformed input chunks (math.c:343-352 passes
bad records through rather than failing the pipeline)."""

import glob
import os

import pyspark.sql.functions as F
import pytest


def test_kafka_wire_stream_retries_dropped_fetch_connections(spark, tmp_path):
    """ADVICE r11 #1: the STREAM reader's per-micro-batch fetch now
    shares the batch reader's 5-attempt retry loop, so a broker that
    drops the first fetch connections (MiniBroker's fail_first knob)
    no longer fails the micro-batch — the stream still drains every
    produced row."""
    from fluent_bit_filter_math_spark.sources.io import (
        decode_kafka_value,
        encode_kafka_value,
    )
    from fluent_bit_filter_math_spark.sources.kafka_wire import (
        MiniBroker,
        produce,
        register_kafka_wire,
    )

    register_kafka_wire(spark)
    payload = spark.range(24).select(
        F.col("id").alias("event_id"), (F.col("id") * 7).alias("user_id")
    )
    schema_ddl = "event_id long, user_id long"
    broker = MiniBroker(fail_first_fetches=3)
    try:
        produce(
            encode_kafka_value(payload, key_col="event_id"),
            "retry-stream",
            broker.port,
            2,
        )
        stream = (
            spark.readStream.format("kafkawire")
            .option("topic", "retry-stream")
            .option("port", str(broker.port))
            .option("partitions", "2")
            .option("batchrows", "6")
            .load()
        )
        decoded = decode_kafka_value(
            stream.withColumnRenamed("kpart", "partition"),
            spark.createDataFrame([], schema_ddl).schema,
        )
        out_dir = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")

        def _sink(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"b{batch_id:05d}")
            )

        q = (
            decoded.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.read.parquet(os.path.join(out_dir, "b*")).collect()
        assert sorted(r["event_id"] for r in got) == list(range(24))
        assert len(glob.glob(os.path.join(out_dir, "b*"))) >= 2
    finally:
        broker.stop()


def test_triangle_family_shares_sessionwide_edge_build(spark, sf_dir):
    """VERDICT r11 #4: the co-occurrence edge list is built once per
    (session, sf_dir) and localCheckpointed; after the first family
    member runs, every member's compiled plan reads the checkpoint
    (Scan ExistingRDD) instead of re-deriving the lineitem self-join,
    keeping per-query exchanges at the wedge-phase count only."""
    import re

    from fluent_bit_filter_math_spark.operators.graph import (
        _tri_shared,
        graph_clustering_coefficient,
        graph_triangle_count,
        release_tri_und,
    )

    release_tri_und(spark)
    _tri_shared(spark, sf_dir)  # warm the session build once
    for q in (graph_triangle_count, graph_clustering_coefficient):
        plan = plan_of(q(spark, sf_dir))
        assert "Scan ExistingRDD" in plan  # checkpointed edge list
        assert "lineitem" not in plan  # build never re-derived
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_ex <= 10, f"{q.__name__}: {n_ex} exchanges"


def plan_of(df):
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)
