"""Stream-static joins — enriching a stream against a dimension table.

No reference analogue (single-record scope, math.c:322-353); this is
the standard Spark pattern for attaching slowly-changing dimension
attributes to an event stream. The static side is re-read per
micro-batch by the engine (picking up dimension updates between
batches) and, being small, broadcasts — the stream side never
shuffles: each micro-batch is a narrow map-side hash join, which is
what keeps a 100 TB/day stream enrichable without data movement.

Inner stream-static joins need no watermark (no state is kept — each
batch joins independently), which distinguishes them from
stream-stream joins where both sides buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.pipeline import (
    read_events_stream,
    run_stream_to_memory,
)
from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table


def enrich_stream(
    stream: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Join a streaming DataFrame with a static dimension (broadcast)."""
    return stream.join(F.broadcast(dim), on=on, how=how)


@register(
    "stream_static_join_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def stream_static_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(
        spark, f"{sf_dir}/events.parquet", drop_nanos=True
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    out = enrich_stream(
        events, cust, on=events.user_id == cust.c_custkey
    ).select("event_id", "user_id", "c_mktsegment", "value")
    return run_stream_to_memory(out, "stream_static_join_enrich")
