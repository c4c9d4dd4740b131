"""Temporal join operators: as-of join and interval/range join.

Neither exists in the reference (single-record scope, math.c:322-353) —
SURVEY.md §2.3 extensions. Spark has no native ASOF JOIN; the scalable
construction used here is the **union + window** form:

    union the two sides tagged left/right, shuffle ONCE on the join key,
    sort by time within each key, and carry the most recent right-side
    row forward with ``last_value(..., ignoreNulls=True)``.

That is one shuffle and one sort — the same cost as a sort-merge join —
versus the naive correlated-subquery form that explodes into a
range-join. It also degrades gracefully under skew (AQE splits hot
keys). DuckDB has native ASOF JOIN, which the oracle uses, pinning our
construction against a reference implementation.

The interval join is an equi-join with a range residual: Catalyst keeps
the equi part as the shuffle key and evaluates the range as a cheap
post-join filter — no O(n·m) blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

_FMT = "yyyy-MM-dd HH:mm:ss"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_vals: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time within the same ``on`` key (union+window form).
    """
    lt = left.withColumnRenamed(left_time, "_t").withColumn(
        "_is_left", F.lit(1)
    )
    rt = right.withColumnRenamed(right_time, "_t").withColumn(
        "_is_left", F.lit(0)
    )
    # Align schemas for the union: left rows carry null right_vals and
    # vice versa.
    for v in right_vals:
        if v not in lt.columns:
            lt = lt.withColumn(v, F.lit(None).cast(rt.schema[v].dataType))
    left_cols = [c for c in lt.columns if c not in rt.columns]
    for c in left_cols:
        rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    u = lt.select(*sorted(lt.columns)).unionByName(
        rt.select(*sorted(lt.columns))
    )
    # Right rows sort before left rows at the same timestamp so an exact
    # tie matches (ASOF's <= semantics).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Carry the latest right ROW as a struct, not each value column
    # independently: per-value last(..., ignorenulls) would skip a matched
    # right row whose value is NULL and silently substitute an older
    # non-NULL one, where ASOF semantics return the matched row's NULL
    # (ADVICE r1). The struct is NULL for left rows and non-NULL for every
    # right row (even one with all-NULL fields), so last() lands on the
    # true most recent right row and the field projection preserves its
    # NULLs.
    right_row = F.when(
        F.col("_is_left") == 0, F.struct(*[F.col(v) for v in right_vals])
    )
    carried = u.select(
        "*",
        F.last(right_row, ignorenulls=True).over(w).alias("_asof"),
    )
    keep = [c for c in left.columns if c != left_time]
    out = carried.filter(F.col("_is_left") == 1).select(
        *[F.col(c) for c in keep],
        F.col("_t").alias(left_time),
        *[F.col(f"_asof.{v}").alias(v) for v in right_vals],
    )
    return out


# ---------------------------------------------------------------------------
# as-of join — each click event picks up the user's most recent error
# event at-or-before it. Oracle: DuckDB's native ASOF LEFT JOIN.
# ---------------------------------------------------------------------------
@register(
    "join_asof_events",
    oracle="""
    SELECT c.event_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           e.value AS last_error_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("last_error_value")
    )
    joined = asof_join(
        clicks,
        errors,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_vals=["last_error_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _FMT).alias("click_ts"),
        "last_error_value",
    )


# ---------------------------------------------------------------------------
# interval/range join — lineitems shipped within 30 days of their order's
# date: equi key (orderkey) + range residual. One shuffle, no blowup.
# ---------------------------------------------------------------------------
@register(
    "join_range_ship_window",
    oracle="""
    SELECT o.o_orderkey,
           COUNT(*) AS n_quick_ships,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey
    """,
)
def join_range_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate >= orders.o_orderdate)
            & (
                li.l_shipdate
                < orders.o_orderdate + F.expr("INTERVAL 30 DAYS")
            ),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_quick_ships"),
            F.expr(
                "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)"
            ).alias("qty"),
        )
    )


# ---------------------------------------------------------------------------
# time-series resample + gap-fill (LOCF) — project each event_type's
# irregular event stream onto a regular hourly grid, carrying the last
# observation forward. The grid is generated with sequence()+explode
# (no driver loop, no fixture dependency: the fixture's fixed Jan-2024
# span is a literal), then the as-of machinery above attaches the
# latest value at-or-before each grid point — so the whole operator is
# the one-shuffle union+window shape, not a range-join blowup. Grid
# points before a series' first event stay NULL (LOCF has nothing to
# carry). DuckDB's native ASOF LEFT JOIN is the oracle.
#
# 100 TB story: grid size is |keys| × |buckets| — independent of event
# volume — and the single shuffle is on the series key, the same key the
# raw data would shuffle on for any per-series analysis.
# ---------------------------------------------------------------------------
_GRID_START = "2024-01-01 00:00:00"
_GRID_END = "2024-01-30 23:00:00"


@register(
    "ts_resample_locf",
    oracle=f"""
    WITH grid AS (
      SELECT t.event_type, g.ts AS grid_ts
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series(
            TIMESTAMP '{_GRID_START}', TIMESTAMP '{_GRID_END}',
            INTERVAL 1 HOUR)) AS ts
      ) g
    )
    SELECT grid.event_type,
           strftime(grid.grid_ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
           e.value AS locf_value
    FROM grid
    ASOF LEFT JOIN events e
      ON grid.event_type = e.event_type AND grid.grid_ts >= e.ts
    """,
)
def ts_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    keys = ev.select("event_type").distinct()
    grid = keys.select(
        "event_type",
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(_GRID_START)),
                F.to_timestamp(F.lit(_GRID_END)),
                F.expr("interval 1 hour"),
            )
        ).alias("grid_ts"),
    )
    events = ev.select("event_type", "ts", F.col("value").alias("locf_value"))
    joined = asof_join(
        grid,
        events,
        on="event_type",
        left_time="grid_ts",
        right_time="ts",
        right_vals=["locf_value"],
    )
    return joined.select(
        "event_type",
        F.date_format("grid_ts", _FMT).alias("hour_ts"),
        "locf_value",
    )


# ---------------------------------------------------------------------------
# SCD2 dimension build — collapse an event stream into type-2
# slowly-changing-dimension intervals: one row per (user, state) run
# with [valid_from, valid_to) validity, valid_to NULL on the open
# (current) row. The classic warehouse op for turning a change log into
# an as-of-joinable dimension.
#
# Two windows, both partitioned by the dimension key (user_id) — state
# scales with users, never globally: lag() marks run starts, lead()
# over the surviving run-start rows closes each interval. At 100 TB
# both windows shuffle once on user_id and reuse the same partitioning
# (one Exchange — pinned in tests). Ties at equal ts break on event_id,
# so the run segmentation is total-ordered and engine-exact.
# Absent from the reference (single-record scope, math.c:290-366).
# ---------------------------------------------------------------------------
@register(
    "scd2_user_state",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, ts, event_id FROM marked
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(LEAD(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ), '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(CASE WHEN LEAD(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
    FROM runs
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = ev.withColumn(
        "prev", F.lag("event_type").over(w)
    ).filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    nxt = F.lead("ts").over(w)
    return runs.select(
        "user_id",
        "event_type",
        F.date_format("ts", _FMT).alias("valid_from"),
        F.date_format(nxt, _FMT).alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )
