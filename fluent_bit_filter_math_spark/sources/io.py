"""Format-agnostic read/write helpers — the engine's connector surface.

The reference has no sources or sinks at all (bytes are pushed through
the filter ABI, /root/reference/filter_math/math.c:290-296, 356-357);
Spark's built-in connectors are the extension. These helpers only pin
option defaults so round-trips are lossless where the format allows:

* parquet / orc — lossless, columnar, the interchange formats;
* json (lines) — lossless for the fixture schemas modulo timestamp
  precision (written as ISO-8601 micros);
* csv — needs an explicit schema on read (csv is untyped) and header
  mode pinned on both sides.

Streaming sinks: ``foreach_batch_collect`` runs a bounded stream
through ``foreachBatch`` — the sink shape used in production for
idempotent merges into warehouses — collecting each micro-batch's
result through a caller-supplied function.

Kafka (the per-topic stream analogue of Fluent Bit tag routing,
/root/reference/test.sh:17-43): this container ships no broker and no
kafka connector jar, so the surface here is the part that can be real —
option assembly (:func:`kafka_source_options` /
:func:`kafka_sink_options`, validated pure functions) and the
wire-format expressions (:func:`encode_kafka_value` /
:func:`decode_kafka_value`, ordinary Column transforms tested on batch
DataFrames). :func:`kafka_stream` / :func:`kafka_sink` wire them onto
readStream/writeStream; only their final ``.load()``/``.start()``
needs the connector package
(``org.apache.spark:spark-sql-kafka-0-10_2.13``).
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_READ_OPTIONS: dict[str, dict[str, str]] = {
    "csv": {"header": "true"},
    "json": {},
    "parquet": {},
    "orc": {},
}
_WRITE_OPTIONS: dict[str, dict[str, str]] = {
    "csv": {"header": "true"},
    "json": {},
    "parquet": {},
    "orc": {},
}


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    (
        df.write.format(fmt)
        .options(**_WRITE_OPTIONS[fmt])
        .mode("overwrite")
        .save(path)
    )


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None
) -> DataFrame:
    reader = spark.read.format(fmt).options(**_READ_OPTIONS[fmt])
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """The built-in rate source — the 'mem input' analogue for live tests
    (/root/reference/test.sh:15 samples host memory once a second)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


# --- Kafka connector surface (plan-level; see module docstring) ------------

_STARTING_OFFSETS = ("earliest", "latest")


def kafka_source_options(
    brokers: str,
    topics: str | list[str],
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = True,
    max_offsets_per_trigger: Optional[int] = None,
    extra: Optional[Mapping[str, str]] = None,
) -> dict[str, str]:
    """Assemble and validate the option map for a Kafka readStream.

    ``maxOffsetsPerTrigger`` is the per-micro-batch rate limiter — the
    knob that keeps a 1000-executor job from swallowing a whole topic
    backlog in one batch.
    """
    if not brokers:
        raise ValueError("kafka.bootstrap.servers must be non-empty")
    topic_list = [topics] if isinstance(topics, str) else list(topics)
    if not topic_list or any(not t or "," in t for t in topic_list):
        raise ValueError(f"invalid topic list {topic_list!r}")
    if starting_offsets not in _STARTING_OFFSETS and not (
        starting_offsets.startswith("{")
    ):
        raise ValueError(
            f"startingOffsets must be earliest/latest or a JSON offset map,"
            f" got {starting_offsets!r}"
        )
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": ",".join(topic_list),
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        if max_offsets_per_trigger <= 0:
            raise ValueError("maxOffsetsPerTrigger must be positive")
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if extra:
        overlap = set(extra) & set(opts)
        if overlap:
            raise ValueError(f"extra options collide with assembled: {overlap}")
        opts.update(extra)
    return opts


def kafka_sink_options(
    brokers: str, topic: str, extra: Optional[Mapping[str, str]] = None
) -> dict[str, str]:
    """Option map for a Kafka writeStream sink."""
    if not brokers:
        raise ValueError("kafka.bootstrap.servers must be non-empty")
    if not topic or "," in topic:
        raise ValueError(f"invalid sink topic {topic!r}")
    opts = {"kafka.bootstrap.servers": brokers, "topic": topic}
    if extra:
        overlap = set(extra) & set(opts)
        if overlap:
            raise ValueError(f"extra options collide with assembled: {overlap}")
        opts.update(extra)
    return opts


def encode_kafka_value(
    df: DataFrame, key_col: Optional[str] = None
) -> DataFrame:
    """Project a DataFrame onto the Kafka wire schema: JSON-encode every
    column into ``value`` (binary), optionally carrying ``key_col`` as the
    partitioning key. Pure Column transform — testable without a broker."""
    value = F.to_json(F.struct(*df.columns)).cast("binary").alias("value")
    if key_col is None:
        return df.select(value)
    return df.select(F.col(key_col).cast("string").cast("binary").alias("key"), value)


def decode_kafka_value(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Parse Kafka's binary ``value`` back into typed columns (the inverse
    of :func:`encode_kafka_value`), keeping the source metadata columns
    that exist on the input (topic/partition/offset/timestamp)."""
    meta = [c for c in ("topic", "partition", "offset", "timestamp") if c in df.columns]
    parsed = F.from_json(F.col("value").cast("string"), schema).alias("v")
    return df.select(parsed, *meta).select("v.*", *meta)


def kafka_stream(
    spark: SparkSession, options: Mapping[str, str]
):
    """readStream pre-configured for Kafka; caller runs ``.load()`` (needs
    the spark-sql-kafka connector on the classpath)."""
    return spark.readStream.format("kafka").options(**options)


def kafka_sink(df: DataFrame, options: Mapping[str, str], checkpoint: str):
    """writeStream pre-configured for Kafka; caller runs ``.start()``."""
    return (
        df.writeStream.format("kafka")
        .options(**options)
        .option("checkpointLocation", checkpoint)
    )


def foreach_batch_collect(
    stream_df: DataFrame,
    handle: Callable[[DataFrame, int], None],
    checkpoint: str,
) -> None:
    """Run a bounded stream through a foreachBatch sink to completion."""
    query = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
