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


# ---------------------------------------------------------------------------
# stream-stream interval join — click→purchase attribution within 1 h.
#
# Unlike the stream-static case, BOTH sides buffer state: a click must
# wait for purchases that haven't arrived yet and vice versa. What keeps
# this runnable forever on an unbounded stream is the pair of watermarks
# plus the time-interval join condition: Spark derives, per side, how
# long a row can still find a match (here: a click is droppable once the
# purchase-side watermark passes click.ts + 1 h; a purchase once the
# click-side watermark passes purchase.ts), so state is bounded by
# (delay + interval) × arrival rate rather than the stream's history.
# The equi-key (user_id) partitions both state stores the same way — the
# join itself is a co-partitioned hash join per micro-batch, no
# cross-partition traffic beyond the initial key shuffle.
#
# Batch ≡ stream: availableNow replay over the fixture must produce the
# plain SQL interval join — that is exactly what the oracle asserts.
# ---------------------------------------------------------------------------
@register(
    "stream_stream_join_attrib",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.value AS purchase_value
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def stream_stream_join_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{sf_dir}/events.parquet"
    clicks = (
        read_events_stream(spark, path, drop_nanos=True)
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", "1 hour")
        .alias("c")
    )
    purchases = (
        read_events_stream(spark, path, drop_nanos=True)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
        .withWatermark("ts", "1 hour")
        .alias("p")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c.user_id = p.user_id"
            " AND p.ts >= c.ts"
            " AND p.ts <= c.ts + interval 1 hour"
        ),
    ).select(
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.user_id").alias("user_id"),
        F.date_format("c.ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("p.ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("p.value").alias("purchase_value"),
    )
    return run_stream_to_memory(joined, "stream_stream_join_attrib")


# ---------------------------------------------------------------------------
# stream-stream LEFT OUTER interval join — clicks that never converted.
#
# Outer stream-stream joins are a distinct stateful capability from the
# inner form above: a null-padded result for an unmatched click can only
# be emitted once the engine PROVES no purchase can still arrive, i.e.
# when the purchase-side watermark passes click.ts + interval. That
# eviction doesn't happen while data is flowing — with availableNow the
# whole fixture lands in one micro-batch whose watermark is still the
# epoch — it happens in the trailing NO-DATA micro-batch
# (spark.sql.streaming.noDataMicroBatches.enabled, default on), where
# the advanced watermark (max event time − delay) finalizes and flushes
# the unmatched left rows.
#
# Batch ≡ stream therefore holds only for clicks the final watermark
# finalized. Empirically (pinned by the parity test) the engine's left
# state watermark trails max event time by up to 2×(delay + interval):
# the left side's eviction bound is derived from the right-side
# watermark, which is itself delay behind the max event time and then
# reduced by the join interval again — a click at W − 3h is NOT yet
# evicted with delay = interval = 1h. Both sides of the gate therefore
# apply the cutoff W − 4h (2×(delay + interval) minus the delay already
# inside W, plus an hour of margin so strict-vs-non-strict boundary
# semantics can never flip a row at the edge), where W is the ENGINE'S
# reported final eventTime watermark: under the default
# multipleWatermarkPolicy=min it is the smaller of the two sides'
# (max observed event time − delay), millisecond-truncated. Spark reads
# W from the query's lastProgress and post-filters the materialized
# result; the oracle reproduces the same W with LEAST over the two
# sides' max(ts) scalars and the same ms-truncation. On an unbounded
# production stream there is no cutoff; rows simply finalize a bounded
# lag after their event time, which is the same rule with the lag
# spelled out.
# ---------------------------------------------------------------------------
@register(
    "stream_stream_left_outer",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.ts <= (SELECT date_trunc('milliseconds', LEAST(
                     (SELECT max(ts) FROM events
                      WHERE event_type = 'click'),
                     (SELECT max(ts) FROM events
                      WHERE event_type = 'purchase')))
                          - INTERVAL 5 HOUR)
    """,
)
def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{sf_dir}/events.parquet"
    clicks = (
        read_events_stream(spark, path, drop_nanos=True)
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", "1 hour")
        .alias("c")
    )
    purchases = (
        read_events_stream(spark, path, drop_nanos=True)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
        .withWatermark("ts", "1 hour")
        .alias("p")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c.user_id = p.user_id"
            " AND p.ts >= c.ts"
            " AND p.ts <= c.ts + interval 1 hour"
        ),
        "left_outer",
    ).select(
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.user_id").alias("user_id"),
        F.col("c.ts").alias("_click_ts"),
        F.col("p.value").alias("purchase_value"),
    )
    progress: dict = {}
    out = run_stream_to_memory(
        joined, "stream_stream_left_outer", progress_out=progress
    )
    # Finalization cutoff derived from the ENGINE'S reported eventTime
    # watermark (lastProgress), not re-modeled from the data: a click is
    # provably finalized once the left state watermark — the global
    # watermark minus the join interval, minus another (delay +
    # interval) because the left eviction bound chains through the
    # right-side watermark — has passed it; the extra hour is boundary
    # margin so strict-vs-non-strict edge semantics can never flip a
    # row. With delay = interval = 1 h that is W − 4 h. When the
    # no-data micro-batch fully advanced the watermark (W = max(ts) −
    # delay, the normal availableNow completion), this equals the
    # oracle's max(ts) − 5 h scalar subquery; if the engine ever
    # under-advances, the derived cutoff shrinks with it and the gate
    # flags the shortfall instead of silently trusting a constant.
    import datetime

    # The reported watermark is millisecond-truncated (floor) while the
    # raw event times carry microseconds; the oracle applies the same
    # date_trunc('milliseconds') to its max(ts) scalar — truncation
    # commutes with subtracting whole hours, so the two cutoffs are
    # microsecond-identical.
    wm = progress["lastProgress"]["eventTime"]["watermark"]
    cutoff = datetime.datetime.strptime(
        wm, "%Y-%m-%dT%H:%M:%S.%fZ"
    ) - datetime.timedelta(hours=4)
    return (
        out.filter(F.col("_click_ts") <= F.lit(cutoff))
        .withColumn(
            "click_ts", F.date_format("_click_ts", "yyyy-MM-dd HH:mm:ss")
        )
        .select(
            "click_id", "purchase_id", "user_id", "click_ts", "purchase_value"
        )
    )


# ---------------------------------------------------------------------------
# stream-stream FULL OUTER interval join — clicks that never converted
# AND purchases with no preceding click, in one query. Null padding on
# BOTH sides is watermark-driven eviction, so the finalized prefix
# applies the symmetric form of the left-outer rule: a row is kept only
# when every side it carries is ≤ W − 4h (matched rows are emitted
# eagerly; filtering them by the same bound keeps the two engines'
# row sets identical). W is the reported final eventTime watermark —
# min over the two sides under multipleWatermarkPolicy=min — exactly
# as in stream_stream_left_outer above.
# ---------------------------------------------------------------------------
@register(
    "stream_stream_full_outer",
    oracle="""
    WITH cut AS (
      SELECT date_trunc('milliseconds', LEAST(
               (SELECT max(ts) FROM events WHERE event_type = 'click'),
               (SELECT max(ts) FROM events WHERE event_type = 'purchase')))
             - INTERVAL 5 HOUR AS t
    )
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           COALESCE(c.user_id, p.user_id) AS user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE (c.ts IS NULL OR c.ts <= (SELECT t FROM cut))
      AND (p.ts IS NULL OR p.ts <= (SELECT t FROM cut))
    """,
)
def stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{sf_dir}/events.parquet"
    clicks = (
        read_events_stream(spark, path, drop_nanos=True)
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", "1 hour")
        .alias("c")
    )
    purchases = (
        read_events_stream(spark, path, drop_nanos=True)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", "1 hour")
        .alias("p")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c.user_id = p.user_id"
            " AND p.ts >= c.ts"
            " AND p.ts <= c.ts + interval 1 hour"
        ),
        "full_outer",
    ).select(
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.coalesce(F.col("c.user_id"), F.col("p.user_id")).alias("user_id"),
        F.col("c.ts").alias("_c_ts"),
        F.col("p.ts").alias("_p_ts"),
    )
    progress: dict = {}
    out = run_stream_to_memory(
        joined, "stream_stream_full_outer", progress_out=progress
    )
    import datetime

    wm = progress["lastProgress"]["eventTime"]["watermark"]
    # W - 4h: the same eviction-lag bound (+1h boundary margin) the
    # left-outer query derives; the longer of the two sides' chains
    # governs both here.
    cutoff = datetime.datetime.strptime(
        wm, "%Y-%m-%dT%H:%M:%S.%fZ"
    ) - datetime.timedelta(hours=4)
    return (
        out.filter(
            (F.col("_c_ts").isNull() | (F.col("_c_ts") <= F.lit(cutoff)))
            & (F.col("_p_ts").isNull() | (F.col("_p_ts") <= F.lit(cutoff)))
        )
        .withColumn("click_ts", F.date_format("_c_ts", "yyyy-MM-dd HH:mm:ss"))
        .withColumn(
            "purchase_ts", F.date_format("_p_ts", "yyyy-MM-dd HH:mm:ss")
        )
        .select("click_id", "purchase_id", "user_id", "click_ts", "purchase_ts")
    )
