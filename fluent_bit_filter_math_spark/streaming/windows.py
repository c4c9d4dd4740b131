"""Event-time windowed aggregations over the ``events`` table.

The reference never interprets its timestamp (opaque copy-through,
/root/reference/filter_math/math.c:223,239); event-time semantics are
the streaming extension (SURVEY.md §2.3): tumbling, sliding, and
session windows.

Each query here is the *batch* form of the window — the exact same
``F.window`` / ``F.session_window`` expressions run unchanged under
``readStream`` (tests/test_streaming.py pins batch ≡ stream on this
module's specs, plus watermarking and streaming dedup, which have no
batch analogue for the oracle to check).

Scale design: tumbling/sliding windows are plain hash aggregates whose
key is (window, ...) — one shuffle, map-side partial agg, and in
streaming incremental state per window. Session windows shuffle on
user_id and merge sessions per key — Spark's native session_window
state store handles the merge; no Python. Window bounds are emitted as
formatted strings so the driver compares text, not engine-specific
timestamp encodings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

_FMT = "yyyy-MM-dd HH:mm:ss"
_D_FMT = "%Y-%m-%d %H:%M:%S"

# Exact-decimal sum of the 2-dp value column (same idiom as relational._dsum).
_SUM_VALUE = "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# tumbling window — 1 hour.
# ---------------------------------------------------------------------------
@register(
    "win_tumbling_hour",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{_D_FMT}') AS window_start,
           COUNT(*) AS n_events,
           {_SUM_VALUE} AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts)
    """,
)
def win_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr(_SUM_VALUE).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# sliding window — 1 hour window, 30 minute slide (2 windows per event).
# ---------------------------------------------------------------------------
@register(
    "win_sliding_hour_30m",
    oracle=f"""
    SELECT strftime(ws, '{_D_FMT}') AS window_start,
           COUNT(*) AS n_events,
           {_SUM_VALUE} AS sum_value
    FROM (
        SELECT time_bucket(INTERVAL '30 minutes', ts)
                   - unnest([INTERVAL '0 minutes', INTERVAL '30 minutes']) AS ws,
               value
        FROM events
    )
    GROUP BY ws
    """,
)
def win_sliding_hour_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr(_SUM_VALUE).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# session window — 30 minute inactivity gap per user.
# Spark's session end = last event + gap; the oracle reproduces it with the
# classic gaps-and-islands construction.
# ---------------------------------------------------------------------------
@register(
    "win_session_user",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), islands AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '{_D_FMT}') AS session_start,
           strftime(MAX(ts) + INTERVAL '30 minutes', '{_D_FMT}') AS session_end,
           COUNT(*) AS n_events
    FROM islands
    GROUP BY user_id, session_no
    """,
)
def win_session_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", _FMT).alias("session_start"),
            F.date_format("w.end", _FMT).alias("session_end"),
            "n_events",
        )
    )
