"""Streaming deduplication — ``dropDuplicates`` under a watermark.

SURVEY.md §2.3's "Streaming: dedup" row (no reference analogue — the
reference holds no cross-record state, /root/reference/filter_math/
math.h:46-55). The batch dedup family lives in ``operators.dedup``;
this is the streaming form: exactly-one-row-per-key over an unbounded
stream, with the watermark bounding how long a key's fingerprint stays
in the state store.

The driver query replays the ``events`` fixture as a bounded stream
(availableNow) and emits only the dedup keys, so the result is the
deterministic distinct-key set regardless of which physical row
``dropDuplicates`` retains — which is what lets a DuckDB ``SELECT
DISTINCT`` oracle verify a stateful streaming operator exactly.

Scale: state is hash-partitioned by the dedup key across executors;
each micro-batch shuffles only its own rows to the key's partition.
The watermark evicts fingerprints older than the lateness bound, so
state size is (keys arriving within the watermark window), not (all
keys ever) — the property that keeps this viable on an unbounded
100 TB/day stream.

``dropDuplicatesWithinWatermark`` is the retry-straddling variant:
plain ``dropDuplicates`` keys its state on event time too, so a retry
carrying a *regenerated* timestamp can slip past the fingerprint;
the within-watermark form guarantees dedup for any duplicates whose
event times land within the watermark delay of each other, whatever
their exact values. Its state entry expires one delay after the FIRST
sighting, so the guarantee costs the same bounded state.
"""

from __future__ import annotations

from fluent_bit_filter_math_spark.pipeline import (
    read_events_stream,
    run_stream_to_memory,
)
from fluent_bit_filter_math_spark.registry import register

from pyspark.sql import DataFrame, SparkSession


def dedup_stream(spark: SparkSession, path: str) -> DataFrame:
    stream = read_events_stream(spark, path, drop_nanos=True)
    return (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


@register(
    "stream_dedup_events",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dedup_stream(spark, f"{sf_dir}/events.parquet")
    return run_stream_to_memory(out, "stream_dedup_events")


def dedup_stream_within_watermark(
    spark: SparkSession, path: str, delay: str
) -> DataFrame:
    stream = read_events_stream(spark, path, drop_nanos=True)
    return (
        stream.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


@register(
    "stream_dedup_within_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark delay spans the whole bounded fixture, so every duplicate
    pair is "within the watermark" and each key emits exactly once — which
    is what lets the batch DISTINCT oracle verify this stateful operator
    exactly. (With a short delay the operator legitimately re-emits keys
    whose duplicates arrive further apart than the delay; that behavior is
    pinned by the unit test, not the driver oracle.)"""
    out = dedup_stream_within_watermark(
        spark, f"{sf_dir}/events.parquet", "3650 days"
    )
    return run_stream_to_memory(out, "stream_dedup_within_watermark")
