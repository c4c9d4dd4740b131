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
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

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
