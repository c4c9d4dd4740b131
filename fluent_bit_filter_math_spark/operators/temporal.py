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

from fluent_bit_filter_math_spark.functions import (
    duck_hash60,
    exact_cents,
    fixed_round,
)
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


# ---------------------------------------------------------------------------
# Linear-interpolation gap fill — LOCF's smooth sibling: at each hourly
# grid point, value = prev + (next − prev) · (t − t_prev)/(t_next −
# t_prev) between the bracketing observations; LOCF past the last
# observation; NULL before the first.
#
# One pass, no joins: observations (pre-aggregated to one per
# (series, ts) so the bracket is well-defined) and grid points union
# into a single per-series ordered sequence; two mirrored window frames
# (unbounded-preceding / unbounded-following, IGNORE NULLS) recover the
# bracketing observation value+time for every grid row. Observations
# sort BEFORE grid points at equal ts, so an exact-hit grid point takes
# the observation as its "prev" with ratio 0 — exact, not interpolated.
#
# Scale: one shuffle, keyed by series (event_type); state per partition
# is a running last/first, never a buffered join side. At 100 TB the
# same plan runs partitioned by (series, coarse time bucket) with a
# one-row-per-bucket boundary exchange — the structure the two frames
# already have. Interpolation arithmetic stays in whole-stage codegen;
# epoch-microsecond deltas are exact BIGINTs so both engines compute
# the identical double ratio (9-dp rounded like every transcendental
# output in fn_math_suite). Absent from the reference (single-record
# scope, math.c:290-366).
# ---------------------------------------------------------------------------
@register(
    "ts_interpolate_linear",
    oracle=f"""
    WITH obs AS (
      SELECT event_type, ts, max(value) AS value
      FROM events GROUP BY event_type, ts
    ),
    grid AS (
      SELECT t.event_type, g.ts AS ts
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series(
            TIMESTAMP '{_GRID_START}', TIMESTAMP '{_GRID_END}',
            INTERVAL 1 HOUR)) AS ts
      ) g
    ),
    u AS (
      SELECT event_type, ts, value, 1 AS is_obs FROM obs
      UNION ALL
      SELECT event_type, ts, NULL AS value, 0 AS is_obs FROM grid
    ),
    br AS (
      SELECT event_type, ts, is_obs,
             last_value(value IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN is_obs = 1 THEN epoch_us(ts) END
                        IGNORE NULLS) OVER w_prev AS pt,
             first_value(value IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN is_obs = 1 THEN epoch_us(ts) END
                         IGNORE NULLS) OVER w_next AS nt
      FROM u
      WINDOW
        w_prev AS (PARTITION BY event_type ORDER BY ts, is_obs DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY event_type ORDER BY ts, is_obs DESC
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
           (floor(CASE
             WHEN pv IS NULL THEN NULL
             WHEN nv IS NULL OR nt = pt THEN pv
             ELSE pv + (nv - pv) * (CAST(epoch_us(ts) - pt AS DOUBLE)
                                    / CAST(nt - pt AS DOUBLE))
           END * 1000000000.0 + 0.5) / 1000000000.0) AS interp_value
    FROM br
    WHERE is_obs = 0
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    obs = ev.groupBy("event_type", "ts").agg(F.max("value").alias("value"))
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.to_timestamp(F.lit(_GRID_START)),
                    F.to_timestamp(F.lit(_GRID_END)),
                    F.expr("interval 1 hour"),
                )
            ).alias("ts"),
        )
    )
    out = interpolate_on_grid(obs, grid, key="event_type")
    return out.select(
        "event_type",
        F.date_format("ts", _FMT).alias("hour_ts"),
        fixed_round(F.col("interp_value"), 9).alias("interp_value"),
    )


def interpolate_on_grid(
    obs: DataFrame,
    grid: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    val: str = "value",
) -> DataFrame:
    """Linear interpolation of ``obs`` (one row per (key, ts); enforce
    upstream) onto the timestamps of ``grid``; returns (key, ts,
    interp_value). Interior points interpolate between brackets, points
    past the last observation carry it forward (LOCF), points before
    the first are NULL, and exact-hit grid points return the
    observation itself (ratio 0).

    Both brackets ride RUNNING frames (UnboundedPreceding lower
    bound), which Spark's window exec evaluates incrementally in one
    pass. The naive "next" frame — (1 FOLLOWING, UNBOUNDED FOLLOWING)
    — is a shrinking frame Spark recomputes per row: O(rows²) per
    partition, 6.8 → 45 s at sf0.1. Reversing the sort order turns
    "first following, excluding current" into "last preceding,
    excluding current" — same rows, incremental evaluation, one extra
    in-partition sort (no extra shuffle: same partition key).
    """
    # Normalize to TIMESTAMP: callers may hold TIMESTAMP_NTZ (reader-
    # dependent), which unix_micros rejects; interpolation only uses
    # time DIFFERENCES, so the cast's epoch reference is irrelevant.
    obs_t = obs.select(
        F.col(key).alias("k"),
        F.col(ts).cast("timestamp").alias("ts"),
        F.col(val).cast("double").alias("value"),
        F.lit(1).alias("is_obs"),
    )
    grid_t = grid.select(
        F.col(key).alias("k"),
        F.col(ts).cast("timestamp").alias("ts"),
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("is_obs"),
    )
    u = obs_t.unionByName(grid_t)
    w_prev = (
        Window.partitionBy("k")
        .orderBy(F.col("ts").asc(), F.col("is_obs").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Reversed order: at equal ts the grid row (is_obs 0) sorts first,
    # so same-ts observations stay excluded from its "next" bracket —
    # identical tie semantics to the forward (1, UNBOUNDED FOLLOWING)
    # frame, where observations sort before the grid row.
    w_next = (
        Window.partitionBy("k")
        .orderBy(F.col("ts").desc(), F.col("is_obs").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    obs_us = F.when(F.col("is_obs") == 1, F.unix_micros("ts"))
    br = u.select(
        "k",
        "ts",
        "is_obs",
        F.last("value", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_us, ignorenulls=True).over(w_prev).alias("pt"),
        F.last("value", ignorenulls=True).over(w_next).alias("nv"),
        F.last(obs_us, ignorenulls=True).over(w_next).alias("nt"),
    )
    ratio = (F.unix_micros("ts") - F.col("pt")).cast("double") / (
        F.col("nt") - F.col("pt")
    ).cast("double")
    interp = (
        F.when(F.col("pv").isNull(), F.lit(None).cast("double"))
        .when(F.col("nv").isNull() | (F.col("nt") == F.col("pt")), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * ratio)
    )
    return br.filter(F.col("is_obs") == 0).select(
        F.col("k").alias(key), "ts", interp.alias("interp_value")
    )


# ---------------------------------------------------------------------------
# batch sessionization — gaps-and-islands over the event stream: a new
# session starts when a user's inter-event gap exceeds 30 minutes. The
# batch complement of the streaming session window (win_session_user):
# a backfill/reprocessing job sessionizes the full history with TWO
# window passes over ONE user_id partitioning (lag → gap flag, then a
# running sum of flags numbers the sessions), then one keyed aggregate.
# Everything is integer epoch-µs arithmetic — engine-exact, no float in
# any driver-visible column. Scale: one shuffle on user_id shared by
# both windows and the aggregate (the partitioning carries through),
# per-partition state is O(1) per window.
# ---------------------------------------------------------------------------
_SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "sessionize_events",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, us,
             CASE WHEN us - lag(us) OVER w > {_SESSION_GAP_US}
                  OR lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM o
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    numbered AS (
      SELECT user_id, event_id, us,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_seq
      FROM flagged
    )
    SELECT user_id,
           CAST(sess_seq AS BIGINT) AS sess_seq,
           COUNT(*) AS n_events,
           CAST(min(us) AS BIGINT) AS sess_start_us,
           CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_sec
    FROM numbered
    GROUP BY user_id, sess_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # NTZ-safe epoch ordering (the reader may infer ts as TIMESTAMP_NTZ;
    # gaps are shift-invariant, so the cast's epoch reference is moot).
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    o = ev.select("user_id", "event_id", us.alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = o.select(
        "user_id",
        "event_id",
        "us",
        F.when(
            (F.col("us") - F.lag("us").over(w) > _SESSION_GAP_US)
            | F.lag("us").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    numbered = flagged.select(
        "user_id",
        "us",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess_seq"),
    )
    return numbered.groupBy("user_id", "sess_seq").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("sess_start_us"),
        # Integer div on both sides: DuckDB's float '/' + CAST rounds to
        # nearest while Spark's cast truncates — '//' vs 'div' agree.
        F.expr("(max(us) - min(us)) div 1000000").alias("duration_sec"),
    )


# ---------------------------------------------------------------------------
# OHLC downsample — per-hour open/high/low/close candles over the event
# value stream: the canonical time-series compaction (Kline bars /
# monitoring rollups). One hash aggregate, one shuffle; open/close are
# arg-extremes over a scalar epoch-µs·2²⁰+event_id composite (both
# engines spell the identical BIGINT key — DuckDB 1.x arg_* cannot
# order by struct), high/low are plain extremes in exact cents.
# ---------------------------------------------------------------------------
@register(
    "ts_downsample_ohlc",
    oracle="""
    WITH base AS (SELECT min(epoch_us(ts)) AS b FROM events)
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bar_start,
           ARG_MIN(CAST(floor(value * 100.0 + 0.5) AS BIGINT),
                   (epoch_us(ts) - b) * 1048576 + event_id) AS open_cents,
           MAX(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS high_cents,
           MIN(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS low_cents,
           ARG_MAX(CAST(floor(value * 100.0 + 0.5) AS BIGINT),
                   (epoch_us(ts) - b) * 1048576 + event_id) AS close_cents,
           COUNT(*) AS n_ticks
    FROM events, base
    GROUP BY date_trunc('hour', ts)
    """,
)
def ts_downsample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cents = exact_cents(F.col("value"))
    # Rebase µs to the fixture's own min timestamp so the composite
    # fits int64 whatever time range a regenerated fixture uses: a
    # 30-day span ≈ 2.6e12 µs, ×2^20 ≈ 2.7e18 < 2^63; ordering stays
    # lexicographic (ts, event_id). The base is a 1-row aggregate
    # (same pattern as the streaming finalization cutoffs).
    base = ev.agg(
        F.min(F.expr("unix_micros(cast(ts as timestamp))")).alias("b")
    )
    ev = ev.join(F.broadcast(base))
    seq = F.expr(
        "(unix_micros(cast(ts as timestamp)) - b) * 1048576 + event_id"
    )
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("_bar"))
        .agg(
            F.min_by(cents, seq).alias("open_cents"),
            F.max(cents).alias("high_cents"),
            F.min(cents).alias("low_cents"),
            F.max_by(cents, seq).alias("close_cents"),
            F.count("*").alias("n_ticks"),
        )
        .select(
            F.date_format("_bar", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "n_ticks",
        )
    )


# ---------------------------------------------------------------------------
# Funnel analysis — ordered stage conversion (view → click → purchase)
# per user: the product-analytics primitive behind conversion dashboards
# and, in a training-data pipeline, behavior-sequence mining. Each
# stage's timestamp is the MIN event time at-or-after the previous
# stage's timestamp, so out-of-order occurrences (click before any
# view) don't count.
#
# Scale shape: THREE chained window passes over ONE user_id hash
# partitioning — the stage-k column only needs the whole-partition MIN
# of a CASE expression (unbounded frame, no sort), so Spark runs all
# three in a single Exchange followed by narrow window operators; the
# finishing aggregate is a 3-column 1-row reduction unpivoted with
# stack(). Per-user state never materializes anywhere — no collect, no
# per-user arrays — so the shape survives any user cardinality.
# Cross-engine: all arithmetic is exact epoch-µs BIGINT.
# ---------------------------------------------------------------------------
@register(
    "funnel_conversion",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    s1 AS (
      SELECT *,
             MIN(CASE WHEN event_type = 'view' THEN us END)
                 OVER (PARTITION BY user_id) AS v_us
      FROM o
    ),
    s2 AS (
      SELECT *,
             MIN(CASE WHEN event_type = 'click' AND us >= v_us THEN us END)
                 OVER (PARTITION BY user_id) AS c_us
      FROM s1
    ),
    s3 AS (
      SELECT *,
             MIN(CASE WHEN event_type = 'purchase' AND us >= c_us THEN us END)
                 OVER (PARTITION BY user_id) AS p_us
      FROM s2
    ),
    per_user AS (
      SELECT user_id, MAX(v_us) AS v_us, MAX(c_us) AS c_us,
             MAX(p_us) AS p_us
      FROM s3 GROUP BY user_id
    ),
    agg AS (
      SELECT
        CAST(COUNT(v_us) AS BIGINT) AS n_view,
        CAST(COUNT(c_us) AS BIGINT) AS n_click,
        CAST(COUNT(p_us) AS BIGINT) AS n_purchase,
        CAST(COALESCE(SUM(CASE WHEN c_us IS NOT NULL
                               THEN c_us - v_us END), 0) AS BIGINT)
            AS d_click,
        CAST(COALESCE(SUM(CASE WHEN p_us IS NOT NULL
                               THEN p_us - c_us END), 0) AS BIGINT)
            AS d_purchase
      FROM per_user
    )
    SELECT stage, n_users, sum_delay_us FROM (
      SELECT 'view' AS stage, n_view AS n_users,
             CAST(0 AS BIGINT) AS sum_delay_us, 1 AS ord FROM agg
      UNION ALL
      SELECT 'click', n_click, d_click, 2 FROM agg
      UNION ALL
      SELECT 'purchase', n_purchase, d_purchase, 3 FROM agg
    ) ORDER BY ord
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    o = ev.select("user_id", "event_type", us.alias("us"))
    w = Window.partitionBy("user_id")
    s1 = o.withColumn(
        "v_us", F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w)
    )
    s2 = s1.withColumn(
        "c_us",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("us") >= F.col("v_us")),
                F.col("us"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "p_us",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("us") >= F.col("c_us")),
                F.col("us"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("v_us").alias("v_us"),
        F.max("c_us").alias("c_us"),
        F.max("p_us").alias("p_us"),
    )
    agg = per_user.agg(
        F.count("v_us").alias("n_view"),
        F.count("c_us").alias("n_click"),
        F.count("p_us").alias("n_purchase"),
        F.coalesce(
            F.sum(
                F.when(F.col("c_us").isNotNull(), F.col("c_us") - F.col("v_us"))
            ),
            F.lit(0),
        ).alias("d_click"),
        F.coalesce(
            F.sum(
                F.when(F.col("p_us").isNotNull(), F.col("p_us") - F.col("c_us"))
            ),
            F.lit(0),
        ).alias("d_purchase"),
    )
    return agg.selectExpr(
        """stack(3,
              'view', n_view, CAST(0 AS BIGINT),
              'click', n_click, d_click,
              'purchase', n_purchase, d_purchase)
           AS (stage, n_users, sum_delay_us)"""
    )


# ---------------------------------------------------------------------------
# Event-pattern matching — the MATCH_RECOGNIZE shape Spark lacks as
# SQL: find purchases preceded by a view within 30 minutes with NO
# error event between the view and the purchase. Decomposed into
# trailing-window arg-maxima: over each user's event sequence
# (ordered by exact epoch-µs, event_id tie-break), the ROWS
# [unbounded, 1 preceding] frame carries "most recent view so far"
# and "most recent error so far"; the pattern predicate is then a
# per-row filter — one shuffle, one sort, no self-join, no NFA state
# blowup. This is how sequence patterns compile onto vanilla window
# engines at 100 TB: the frame maxima are O(1) running state per
# pattern symbol.
# ---------------------------------------------------------------------------
@register(
    "event_pattern_match",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
    ),
    m AS (
      SELECT *,
             MAX(CASE WHEN event_type = 'view' THEN us END)
                 OVER w AS last_view_us,
             MAX(CASE WHEN event_type = 'error' THEN us END)
                 OVER w AS last_err_us
      FROM o
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id AS purchase_event_id,
           last_view_us AS view_us, us AS purchase_us,
           us - last_view_us AS delay_us
    FROM m
    WHERE event_type = 'purchase'
      AND last_view_us IS NOT NULL
      AND us - last_view_us <= 1800000000
      AND (last_err_us IS NULL OR last_err_us < last_view_us)
    ORDER BY user_id, purchase_event_id
    """,
)
def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    o = ev.select("user_id", "event_id", "event_type", us.alias("us"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = o.select(
        "user_id",
        "event_id",
        "event_type",
        "us",
        F.max(F.when(F.col("event_type") == "view", F.col("us")))
        .over(w)
        .alias("last_view_us"),
        F.max(F.when(F.col("event_type") == "error", F.col("us")))
        .over(w)
        .alias("last_err_us"),
    )
    return (
        m.filter(
            (F.col("event_type") == "purchase")
            & F.col("last_view_us").isNotNull()
            & (F.col("us") - F.col("last_view_us") <= 1800000000)
            & (
                F.col("last_err_us").isNull()
                | (F.col("last_err_us") < F.col("last_view_us"))
            )
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            F.col("last_view_us").alias("view_us"),
            F.col("us").alias("purchase_us"),
            (F.col("us") - F.col("last_view_us")).alias("delay_us"),
        )
        .orderBy("user_id", "purchase_event_id")
    )


# ---------------------------------------------------------------------------
# Bucketized pure-range join — the interval join with NO equi key,
# the shape Spark's SortMergeJoin degrades to a cartesian on (and
# Databricks ships "range join hints" for): flag every purchase that
# falls inside ANY error event's 10-minute incident window, across
# all users. The scalable construction discretizes time into buckets
# of exactly the interval width: an interval overlaps ≤2 buckets, a
# point exactly 1, so exploding intervals to their covered buckets
# turns the range join into an EQUI join on the bucket index with a
# cheap residual filter — candidate volume is bounded by per-bucket
# densities instead of |intervals|·|points|. DISTINCT collapses the
# ≤2-bucket duplication. All arithmetic is integer epoch-µs.
# ---------------------------------------------------------------------------
_RANGE_W_US = 600_000_000  # 10-minute incident window == bucket width


@register(
    "join_range_bucketize",
    oracle=f"""
    WITH err AS (
      SELECT epoch_us(ts) AS es FROM events WHERE event_type = 'error'
    ),
    p AS (
      SELECT event_id, ts, epoch_us(ts) AS ps FROM events
      WHERE event_type = 'purchase'
    ),
    flagged AS (
      SELECT DISTINCT p.event_id, p.ts
      FROM p JOIN err
        ON p.ps >= err.es AND p.ps < err.es + {_RANGE_W_US}
    )
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) AS n_flagged
    FROM flagged GROUP BY 1 ORDER BY 1
    """,
)
def join_range_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    err = ev.filter(F.col("event_type") == "error").select(us.alias("es"))
    # Each interval [es, es+W) covers bucket floor(es/W) and, when it
    # straddles a boundary, floor((es+W-1)/W) — sequence handles both.
    err_b = err.select(
        "es",
        F.explode(
            F.sequence(
                F.floor(F.col("es") / _RANGE_W_US),
                F.floor((F.col("es") + _RANGE_W_US - 1) / _RANGE_W_US),
            )
        ).alias("bkt"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", us.alias("ps")
    )
    p_b = p.withColumn("bkt", F.floor(F.col("ps") / _RANGE_W_US))
    flagged = (
        p_b.join(err_b, "bkt")
        .filter(
            (F.col("ps") >= F.col("es"))
            & (F.col("ps") < F.col("es") + _RANGE_W_US)
        )
        .select("event_id", "ts")
        .distinct()
    )
    return (
        flagged.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            )
        )
        .agg(F.count("*").alias("n_flagged"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Nearest as-of join — the bidirectional complement of
# ``join_asof_events`` (backward-only): each click is matched to its
# temporally CLOSEST error event on either side (tie → the earlier
# one), the semantics sensor-fusion and feature-attribution pipelines
# want when "most recent" is the wrong prior. Neither engine has a
# native nearest ASOF, so both express the SAME construction: one
# union of the two record kinds, one (user_id, time) sort, and two
# mirrored window frames carrying the latest-preceding / earliest-
# following error as a packed (µs·2²⁰ + cents) BIGINT composite (the
# ts_downsample_ohlc rebase idiom — arg-extreme retrieval without
# struct-typed window aggregates). One shuffle on user_id total;
# integer arithmetic end to end.
# ---------------------------------------------------------------------------
@register(
    "join_asof_nearest",
    oracle="""
    WITH base AS (SELECT min(epoch_us(ts)) AS b FROM events),
    obs AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS us,
             event_type = 'error' AS is_err,
             -- clamp into the 2^20 pack field: out-of-range cents must
             -- not bleed into the timestamp bits of the MAX/MIN compare
             GREATEST(CAST(0 AS BIGINT),
                      LEAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT),
                            CAST(1048575 AS BIGINT))) AS cents
      FROM events WHERE event_type IN ('click', 'error')
    ),
    w AS (
      SELECT user_id, event_id, us, is_err, cents, b,
             MAX(CASE WHEN is_err
                 THEN (us - b) * 1048576 + cents END) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS prev_pack,
             MIN(CASE WHEN is_err
                 THEN (us - b) * 1048576 + cents END) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS next_pack
      FROM obs, base
    ),
    picked AS (
      SELECT user_id, event_id, us, b,
             CASE
               WHEN prev_pack IS NULL THEN next_pack
               WHEN next_pack IS NULL THEN prev_pack
               WHEN us - (b + prev_pack // 1048576)
                    <= (b + next_pack // 1048576) - us THEN prev_pack
               ELSE next_pack
             END AS pack
      FROM w WHERE NOT is_err
    )
    SELECT user_id, event_id AS click_event_id,
           CAST(us - (b + pack // 1048576) AS BIGINT) AS delta_us,
           CAST(pack % 1048576 AS BIGINT) AS err_cents
    FROM picked
    WHERE pack IS NOT NULL
    ORDER BY user_id, click_event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    usx = F.unix_micros(F.col("ts").cast("timestamp"))
    base = ev.agg(F.min(usx).alias("b"))
    obs = (
        ev.filter(F.col("event_type").isin("click", "error"))
        .select(
            "user_id",
            "event_id",
            usx.alias("us"),
            (F.col("event_type") == "error").alias("is_err"),
            F.greatest(
                F.lit(0).cast("long"),
                F.least(
                    exact_cents(F.col("value")), F.lit(1048575).cast("long")
                ),
            ).alias("cents"),
        )
        .join(F.broadcast(base))
    )
    pack = F.when(
        F.col("is_err"),
        (F.col("us") - F.col("b")) * 1048576 + F.col("cents"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    w = obs.select(
        "user_id",
        "event_id",
        "us",
        "is_err",
        "b",
        F.max(pack).over(w_prev).alias("prev_pack"),
        F.min(pack).over(w_next).alias("next_pack"),
    )
    prev_us = F.col("b") + F.expr("prev_pack div 1048576")
    next_us = F.col("b") + F.expr("next_pack div 1048576")
    chosen = (
        F.when(F.col("prev_pack").isNull(), F.col("next_pack"))
        .when(F.col("next_pack").isNull(), F.col("prev_pack"))
        .when(
            F.col("us") - prev_us <= next_us - F.col("us"),
            F.col("prev_pack"),
        )
        .otherwise(F.col("next_pack"))
    )
    picked = (
        w.filter(~F.col("is_err"))
        .withColumn("pack", chosen)
        .filter(F.col("pack").isNotNull())
    )
    return picked.select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        (F.col("us") - (F.col("b") + F.expr("pack div 1048576")))
        .cast("long")
        .alias("delta_us"),
        F.expr("pack % 1048576").cast("long").alias("err_cents"),
    ).orderBy("user_id", "click_event_id")


# ---------------------------------------------------------------------------
# Interval union / coverage — merge each supplier's overlapping
# 7-day shipment windows into maximal covered spans and report span
# count + total covered days: the SLA/uptime/availability primitive
# (union of validity intervals), and the interval complement of
# sessionize_events' gap splitting. Same single-shuffle discipline:
# the previous-ends running MAX, the island flag, the island-id
# running sum, and the per-island aggregate all share ONE supplier
# partitioning. All arithmetic is exact epoch-day integers.
# ---------------------------------------------------------------------------
_IU_SPAN_DAYS = 7


@register(
    "interval_union_coverage",
    oracle=f"""
    WITH iv AS (
      SELECT l_suppkey,
             epoch_us(l_shipdate) // 86400000000 AS s,
             epoch_us(l_shipdate) // 86400000000 + {_IU_SPAN_DAYS} AS e,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    flagged AS (
      SELECT l_suppkey, s, e, l_orderkey, l_linenumber,
             CASE WHEN MAX(e) OVER (
                    PARTITION BY l_suppkey
                    ORDER BY s, e, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) >= s THEN 0 ELSE 1 END AS new_island
      FROM iv
    ),
    -- the running sum MUST use the same total order as the flag
    -- window: with only (s, e) the tied rows' frame contents depend
    -- on physical row order — nondeterministic under Spark shuffles
    numbered AS (
      SELECT l_suppkey, s, e,
             SUM(new_island) OVER (
               PARTITION BY l_suppkey
               ORDER BY s, e, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING
             ) AS island
      FROM flagged
    ),
    islands AS (
      SELECT l_suppkey, island,
             MIN(s) AS i_start, MAX(e) AS i_end
      FROM numbered GROUP BY l_suppkey, island
    )
    SELECT l_suppkey,
           COUNT(*) AS n_spans,
           CAST(SUM(i_end - i_start) AS BIGINT) AS covered_days,
           CAST(MIN(i_start) AS BIGINT) AS first_day,
           CAST(MAX(i_end) AS BIGINT) AS last_day
    FROM islands GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    day = F.expr(
        "unix_micros(cast(l_shipdate as timestamp)) div 86400000000"
    )
    iv = li.select(
        "l_suppkey",
        day.alias("s"),
        (day + _IU_SPAN_DAYS).alias("e"),
        "l_orderkey",
        "l_linenumber",
    )
    w_prev = (
        Window.partitionBy("l_suppkey")
        .orderBy("s", "e", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "l_suppkey",
        "s",
        "e",
        "l_orderkey",
        "l_linenumber",
        F.when(F.max("e").over(w_prev) >= F.col("s"), 0)
        .otherwise(1)
        .alias("new_island"),
    )
    # (s, e) repeats across lineitems: the running sum must use the
    # SAME total order as the flag window, or tied rows' island ids
    # depend on physical row order.
    w_run = (
        Window.partitionBy("l_suppkey")
        .orderBy("s", "e", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = flagged.select(
        "l_suppkey",
        "s",
        "e",
        F.sum("new_island").over(w_run).alias("island"),
    )
    islands = numbered.groupBy("l_suppkey", "island").agg(
        F.min("s").alias("i_start"), F.max("e").alias("i_end")
    )
    return (
        islands.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.col("i_end") - F.col("i_start")).alias("covered_days"),
            F.min("i_start").alias("first_day"),
            F.max("i_end").alias("last_day"),
        )
        .orderBy("l_suppkey")
    )


# ---------------------------------------------------------------------------
# EWMA smoothing — exponentially weighted moving average per user, the
# canonical time-series smoother (monitoring, rate estimation,
# RFC 793-style RTT smoothing) the ts_* family lacked. alpha = 1/4,
# truncated at K = 8 lags; un-truncated EWMA is a recursion (y_t
# depends on y_{t-1}) that no engine-portable float evaluation order
# exists for, while the truncated form is a FINITE weighted sum whose
# weights alpha*(1-alpha)^j are exact dyadic rationals: over the
# common denominator 4^K the lag-j weight is the INTEGER
# 3^j * 4^(K-1-j), so numerator and denominator are exact BIGINT
# window sums (cents * weight <= ~1e9, no overflow) and the only
# float op is ONE final division — bit-identical cross-engine.
# Absent lags (the first K-1 rows of each user) drop out of BOTH
# sums, which is exactly the "normalize by present weights" EWMA
# initialization (equivalent to adjust=True in the pandas sense).
#
# Scale: one shuffle on user_id, one 8-lag window pass — the same
# shape as every per-key window here; no state beyond the frame, no
# Python.
# ---------------------------------------------------------------------------
_EWMA_K = 8
_EWMA_W = [3**j * 4 ** (_EWMA_K - 1 - j) for j in range(_EWMA_K)]


def _ewma_sql_terms() -> tuple[str, str]:
    xc = "CAST(floor(value * 100.0 + 0.5) AS BIGINT)"
    over = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    num, den = [], []
    for j, w in enumerate(_EWMA_W):
        lag = xc if j == 0 else f"LAG({xc}, {j}) {over}"
        num.append(f"COALESCE({lag}, 0) * {w}")
        den.append(f"(CASE WHEN {lag} IS NOT NULL THEN {w} ELSE 0 END)")
    return " + ".join(num), " + ".join(den)


_EWMA_NUM, _EWMA_DEN = _ewma_sql_terms()


@register(
    "ts_ewma_fixedpoint",
    oracle=f"""
    SELECT user_id, event_id,
           CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x_cents,
           CAST({_EWMA_NUM} AS BIGINT) AS ewma_num,
           CAST({_EWMA_DEN} AS BIGINT) AS ewma_den,
           CAST({_EWMA_NUM} AS DOUBLE) / ({_EWMA_DEN}) AS ewma_cents
    FROM events
    ORDER BY user_id, event_id
    """,
)
def ts_ewma_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    xc = exact_cents(F.col("value"))
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for j, wt in enumerate(_EWMA_W):
        lag = xc if j == 0 else F.lag(xc, j).over(w)
        num = num + F.coalesce(lag, F.lit(0)) * wt
        den = den + F.when(lag.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
    return ev.select(
        "user_id",
        "event_id",
        xc.alias("x_cents"),
        num.cast("long").alias("ewma_num"),
        den.cast("long").alias("ewma_den"),
        (num.cast("double") / den).alias("ewma_cents"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# GAPS-AND-ISLANDS — consecutive-day activity streaks per user, the
# canonical SQL idiom the temporal family still lacked (login streaks,
# retention "N consecutive days" cohorts, SLA uptime runs). The trick
# is pure integer algebra: over each user's DISTINCT active days
# ordered by day, (day - row_number) is CONSTANT within a run of
# consecutive days and distinct across runs, so one GROUP BY on that
# anchor yields every island without self-joins. Everything is date/
# integer arithmetic — no floats anywhere near the gate.
#
# Scale: one shuffle on user_id for the distinct + window, then the
# island GROUP BY reuses the same user partitioning (no second
# exchange). Per-user state is the day list — bounded by the calendar,
# not the event volume (the distinct collapses 100 TB of events to
# users x days rows map-side first).
# ---------------------------------------------------------------------------
@register(
    "window_login_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ), anchored AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS anchor
      FROM days
    ), islands AS (
      SELECT user_id, anchor, COUNT(*) AS streak_len,
             MIN(d) AS streak_start, MAX(d) AS streak_end
      FROM anchored
      GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
           CAST(MAX(streak_len) AS BIGINT) AS max_streak,
           strftime(MIN(streak_start), '%Y-%m-%d') AS first_day,
           strftime(MAX(streak_end), '%Y-%m-%d') AS last_day
    FROM islands
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def window_login_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    anchored = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("anchor"),
    )
    islands = anchored.groupBy("user_id", "anchor").agg(
        F.count("*").alias("streak_len"),
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_streaks"),
            F.sum("streak_len").cast("long").alias("n_active_days"),
            F.max("streak_len").cast("long").alias("max_streak"),
            F.date_format(F.min("streak_start"), "yyyy-MM-dd").alias(
                "first_day"
            ),
            F.date_format(F.max("streak_end"), "yyyy-MM-dd").alias(
                "last_day"
            ),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# SPATIAL proximity join via GRID bucketING — the 2-D analogue of
# join_range_bucketize above and the canonical way a distributed
# engine answers "all pairs within radius r" without an O(n^2)
# distance join: snap points to an r-sized grid, equi-join each point
# against the 3x3 neighborhood of its cell (cell size == r guarantees
# any pair within r differs by at most one cell per axis), then apply
# the exact distance predicate inside the bucket. Candidate volume is
# sum over cells of |cell| * |3x3 neighborhood| — density-bounded,
# never n^2; the join key is a plain equality, so Spark runs a
# shuffle hash join and AQE handles any hot cell. The 9 offsets come
# from an exploded literal array on the PROBE side only (9x one
# side's rows, nothing on the build side).
#
# Points are synthesized deterministically (hash60 of the event id,
# mod a 10^4 grid) and every coordinate, delta, and distance is exact
# BIGINT arithmetic — no floats in the whole query. Output is a
# per-cell pair summary (count / min / sum of squared distance),
# which pins every candidate and every survivor.
# ---------------------------------------------------------------------------
_SP_G = 10000  # coordinate domain per axis
_SP_R = 50  # radius AND cell size


@register(
    "join_spatial_grid",
    oracle=f"""
    WITH pts AS (
      SELECT event_id,
             {duck_hash60("'x:' || CAST(event_id AS VARCHAR)")} % {_SP_G}
                 AS px,
             {duck_hash60("'y:' || CAST(event_id AS VARCHAR)")} % {_SP_G}
                 AS py
      FROM events
    ), cells AS (
      SELECT event_id, px, py, px // {_SP_R} AS cx, py // {_SP_R} AS cy
      FROM pts
    ), probe AS (
      SELECT c.event_id, c.px, c.py, c.cx + o.ox AS ncx, c.cy + o.oy AS ncy
      FROM cells c
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS ox) o1
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS oy) o2,
      LATERAL (SELECT o1.ox AS ox, o2.oy AS oy) o
    ), pairs AS (
      SELECT a.event_id AS a_id, a.px AS apx, a.py AS apy,
             (a.px - b.px) * (a.px - b.px)
             + (a.py - b.py) * (a.py - b.py) AS dist_sq
      FROM probe a
      JOIN cells b ON a.ncx = b.cx AND a.ncy = b.cy
                  AND a.event_id < b.event_id
      WHERE (a.px - b.px) * (a.px - b.px)
            + (a.py - b.py) * (a.py - b.py) <= {_SP_R * _SP_R}
    )
    SELECT apx // {_SP_R} AS cell_x, apy // {_SP_R} AS cell_y,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(dist_sq) AS BIGINT) AS min_dist_sq,
           CAST(SUM(dist_sq) AS BIGINT) AS sum_dist_sq
    FROM pairs
    GROUP BY cell_x, cell_y
    ORDER BY cell_x, cell_y
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.functions import hash60

    ev = table(spark, sf_dir, "events")
    # Repartition BEFORE the two per-row md5s (guide §2.5 input skew:
    # events.parquet is one row group ⇒ a 1-partition scan, so the
    # coordinate hashes ran single-core), and materialize `cells` ONCE
    # (guide §2.4): it feeds BOTH join sides, and DataFrame subtree
    # duplication otherwise re-scans and re-hashes per side.
    pts = ev.select("event_id").repartition(64, "event_id").select(
        "event_id",
        F.pmod(
            hash60(F.concat(F.lit("x:"), F.col("event_id").cast("string"))),
            F.lit(_SP_G),
        ).alias("px"),
        F.pmod(
            hash60(F.concat(F.lit("y:"), F.col("event_id").cast("string"))),
            F.lit(_SP_G),
        ).alias("py"),
    )
    cells = pts.select(
        "event_id",
        "px",
        "py",
        F.expr(f"px div {_SP_R}").alias("cx"),
        F.expr(f"py div {_SP_R}").alias("cy"),
    ).localCheckpoint(eager=True)
    offs = F.array(*[F.lit(i) for i in (-1, 0, 1)])
    probe = (
        cells.withColumn("ox", F.explode(offs))
        .withColumn("oy", F.explode(offs))
        .select(
            "event_id",
            "px",
            "py",
            (F.col("cx") + F.col("ox")).alias("ncx"),
            (F.col("cy") + F.col("oy")).alias("ncy"),
        )
    )
    a = probe.alias("a")
    b = cells.alias("b")
    dx = F.col("a.px") - F.col("b.px")
    dy = F.col("a.py") - F.col("b.py")
    dist_sq = dx * dx + dy * dy
    pairs = a.join(
        b,
        (F.col("a.ncx") == F.col("b.cx"))
        & (F.col("a.ncy") == F.col("b.cy"))
        & (F.col("a.event_id") < F.col("b.event_id")),
    ).filter(dist_sq <= _SP_R * _SP_R).select(
        F.col("a.px").alias("apx"),
        F.col("a.py").alias("apy"),
        dist_sq.alias("dist_sq"),
    )
    return (
        pairs.groupBy(
            F.expr(f"apx div {_SP_R}").alias("cell_x"),
            F.expr(f"apy div {_SP_R}").alias("cell_y"),
        )
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.min("dist_sq").cast("long").alias("min_dist_sq"),
            F.sum("dist_sq").cast("long").alias("sum_dist_sq"),
        )
        .orderBy("cell_x", "cell_y")
    )


# ---------------------------------------------------------------------------
# RECURSIVE EWMA — the UN-truncated smoother y_t = (3*y_{t-1} + x_t)/4
# as an ordered per-key integer fold, complementing ts_ewma_fixedpoint
# (whose finite window exists only because a float recursion has no
# portable evaluation order). The recursion becomes portable by
# making every step EXACT: x in micro-cents (cents * 1e6), each step
# (3*a + x) >> 2 — integer multiply-add and a power-of-two shift, so
# the fold is a deterministic function of the sequence alone. The
# sequence order is pinned by sorting an array of (epoch_us,
# event_id, x) structs — array_sort on structs is lexicographic in
# both engines. This is the general "ordered fold per key" shape
# (state machines, compound rates, session scoring) that pure
# relational algebra lacks; per-key arrays are bounded by per-user
# activity (~70 rows), not corpus volume.
#
# Scale: ONE shuffle (groupBy user) with map-side partial
# collect_list, then O(k log k) sort + O(k) fold per key inside
# codegen higher-order functions — no Python, no window, no second
# exchange. The same fold at 100 TB would cap per-key history or go
# through the streaming stateful path; the plan shape is unchanged.
# ---------------------------------------------------------------------------
@register(
    "ts_ewma_recursive",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             list_transform(
                 list_sort(list((epoch_us(ts), event_id,
                                 CAST(floor(value * 100.0 + 0.5) AS BIGINT)))),
                 s -> s[3]
             ) AS cs
      FROM events
      GROUP BY user_id
    )
    -- The fold step is '>> 2', NOT '// 4': Spark's shiftright is an
    -- arithmetic (floor) shift and DuckDB's '//' truncates toward
    -- zero, so they diverge for any negative accumulator (-7 >> 2 =
    -- -2 vs -7 // 4 = -1). '>>' floors in BOTH engines. last_cents
    -- reads the sorted cents BEFORE the *1e6 scaling so no division
    -- appears anywhere in this oracle.
    SELECT user_id,
           CAST(len(cs) AS BIGINT) AS n_obs,
           CAST(cs[len(cs)] AS BIGINT) AS last_cents,
           CAST(list_reduce(list_transform(cs, c -> c * 1000000),
                            (a, x) -> (3 * a + x) >> 2) AS BIGINT)
               AS ewma_ucents
    FROM seq
    ORDER BY user_id
    """,
)
def ts_ewma_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    grouped = ev.groupBy("user_id").agg(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
                F.col("event_id").alias("e"),
                exact_cents(F.col("value")).alias("x"),
            )
        ).alias("seq")
    )
    xs = F.transform(
        F.array_sort(F.col("seq")), lambda s: s["x"] * F.lit(1000000)
    )
    fold = F.aggregate(
        F.slice(xs, 2, F.greatest(F.lit(0), F.size(xs) - 1)),
        F.element_at(xs, 1),
        lambda a, x: F.shiftright(a * 3 + x, 2),
    )
    return grouped.select(
        "user_id",
        F.size(xs).cast("long").alias("n_obs"),
        F.expr(
            "element_at(transform(array_sort(seq), s -> s.x), size(seq))"
        ).cast("long").alias("last_cents"),
        fold.cast("long").alias("ewma_ucents"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# TIME-WEIGHTED AVERAGE (TWAP) — the TSDB aggregate (TimescaleDB's
# time_weight, kdb's twap) that a plain AVG gets wrong on irregular
# series: each observation holds (LOCF) until the next one, so its
# weight is its HOLDING TIME, not 1. Per user: value_i holds over
# [t_i, t_{i+1}); twap = Σ cents_i·Δt_i / (t_n − t_0). Every term is
# exact BIGINT (cents × µs ≤ ~2.6e16, well inside int64), the sums
# are integer window/group aggregates, and the only float op is the
# final division — engine-exact by construction. Single-observation
# users have no holding interval and drop in both engines (den = 0).
#
# Scale: one user-key shuffle; lead() and the group sums share the
# partitioning. The integral form is partial-aggregatable: at 100 TB
# each shard contributes Σ cents·Δt for its complete segments.
# ---------------------------------------------------------------------------
@register(
    "ts_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             epoch_us(ts) AS t,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t_next
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(cents * (t_next - t)) AS BIGINT) AS weighted_sum,
           CAST(MAX(t_next) - MIN(t) AS BIGINT) AS span_us,
           CAST(SUM(cents * (t_next - t)) AS DOUBLE)
               / (MAX(t_next) - MIN(t)) AS twap_cents
    FROM seg
    WHERE t_next IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    seg = ev.select(
        "user_id",
        exact_cents(F.col("value")).alias("cents"),
        t.alias("t"),
        F.lead(t).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    num = F.sum(F.col("cents") * (F.col("t_next") - F.col("t")))
    den = F.max("t_next") - F.min("t")
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_segments"),
            num.cast("long").alias("weighted_sum"),
            den.cast("long").alias("span_us"),
            (num.cast("double") / den).alias("twap_cents"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# CUSUM change detection (Page 1954) — the classic sequential drift
# detector: S_t = max(0, S_{t-1} + (x_t − k)), alarm when S_t ≥ h.
# The recursion LOOKS stateful but has a closed window form: with
# P_t the prefix sum of (x − k), S_t = P_t − min_{j≤t} P_j — a
# running sum and a running min over the same frame, both exact
# BIGINT in cents (the identity is exact in integers, so the whole
# detector sits under the bitwise gate; no float ever appears).
# Per user: slack k = 600 cents over the per-event values, threshold
# h = 2000 cents; output the alarm events with their CUSUM value —
# the monitoring primitive for "this user's values drifted high".
#
# Scale: one user-key shuffle, two frames over one sort — identical
# cost to any running-total window; per-key state is the frame, not
# history.
# ---------------------------------------------------------------------------
_CUSUM_K = 600  # cents of slack per observation
_CUSUM_H = 2000  # alarm threshold, cents


@register(
    "ts_cusum_alarms",
    oracle=f"""
    WITH p AS (
      SELECT user_id, event_id, ts,
             SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT) - {_CUSUM_K})
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS pref
      FROM events
    ), s AS (
      SELECT user_id, event_id,
             pref - LEAST(0, MIN(pref)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 AS s_cents
      FROM p
    )
    SELECT user_id, event_id, CAST(s_cents AS BIGINT) AS s_cents
    FROM s
    WHERE s_cents >= {_CUSUM_H}
    ORDER BY user_id, event_id
    """,
)
def ts_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = F.sum(exact_cents(F.col("value")) - F.lit(_CUSUM_K)).over(w)
    p = ev.select("user_id", "event_id", "ts", pref.alias("pref"))
    s_cents = F.col("pref") - F.least(
        F.lit(0).cast("long"), F.min("pref").over(w)
    )
    return (
        p.select(
            "user_id",
            "event_id",
            s_cents.cast("long").alias("s_cents"),
        )
        .filter(F.col("s_cents") >= _CUSUM_H)
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# SEASONAL DECOMPOSITION (classical additive, the moving-average STL
# ancestor): hourly revenue y = trend + seasonal + residual, with
#   trend_t    = centered ±12h moving average of y,
#   seasonal_h = mean detrended value of hour-of-day h,
#   residual   = what's left.
# All three components are exact: y is integer cents per hour, the
# two means are floor((num*1e6)/den) where num*1e6 < 2^53 (so the
# double divide-then-floor is the mathematical floor — a q<=31
# rational is never within an ulp of an integer), and every
# subtraction is BIGINT. Spark `div` truncates toward zero while
# DuckDB `//` floors, so NEITHER integer-division operator appears —
# the shared floor(double) spelling sidesteps the negative-numerator
# divergence entirely (detrended values go negative).
#
# Scale: the windowed table is |hours| rows — calendar-bounded, never
# event-bounded (the window_period_over_period argument); the
# seasonal join is 24 broadcast rows.
# ---------------------------------------------------------------------------
@register(
    "ts_seasonal_decompose",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), tr AS (
      SELECT bucket, hod, y,
             CAST(floor(CAST(SUM(y) OVER w * 1000000 AS DOUBLE)
                        / COUNT(*) OVER w) AS BIGINT) AS trend_fp
      FROM hourly
      WINDOW w AS (ORDER BY bucket
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ), det AS (
      SELECT bucket, hod, y, trend_fp,
             y * 1000000 - trend_fp AS detr_fp
      FROM tr
    ), seas AS (
      SELECT hod,
             CAST(floor(CAST(SUM(detr_fp) AS DOUBLE) / COUNT(*))
                  AS BIGINT) AS seasonal_fp
      FROM det GROUP BY hod
    )
    SELECT strftime(d.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           d.y, d.trend_fp, s.seasonal_fp,
           CAST(d.detr_fp - s.seasonal_fp AS BIGINT) AS resid_fp
    FROM det d JOIN seas s USING (hod)
    ORDER BY d.bucket
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(F.sum(exact_cents(F.col("value"))).cast("long").alias("y"))
    )
    wtr = Window.orderBy("bucket").rowsBetween(-12, 12)
    tr = hourly.select(
        "bucket",
        "hod",
        "y",
        F.floor(
            (F.sum("y").over(wtr) * 1000000).cast("double")
            / F.count("*").over(wtr)
        ).cast("long").alias("trend_fp"),
    )
    det = tr.withColumn(
        "detr_fp", F.col("y") * 1000000 - F.col("trend_fp")
    )
    seas = det.groupBy("hod").agg(
        F.floor(
            F.sum("detr_fp").cast("double") / F.count("*")
        ).cast("long").alias("seasonal_fp")
    )
    return (
        det.join(F.broadcast(seas), "hod")
        .select(
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "y",
            "trend_fp",
            "seasonal_fp",
            (F.col("detr_fp") - F.col("seasonal_fp"))
            .cast("long")
            .alias("resid_fp"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# HOLT double-exponential smoothing — level + TREND, the forecasting
# step up from EWMA (ts_ewma_recursive above), as an ordered per-key
# fold with a COMPOSITE (struct) accumulator:
#   l_t = (x_t + 3·(l + b)) >> 2        (alpha = 1/4)
#   b_t = ((l_t − l) + 3·b) >> 2        (beta  = 1/4)
# Exactness hinges on one operator choice: deltas go NEGATIVE, and
# Spark's `div`/DuckDB's `//` TRUNCATE negative quotients differently
# than a shift — but `>>` is the arithmetic (floor) shift in BOTH
# engines (measured: -7>>2 = -2 = floor, -7//4 = -1 in DuckDB), so
# the whole coupled recursion is exact integer arithmetic. The
# accumulator is a struct {l, b} folded through codegen HOFs in Spark
# and list_reduce over struct elements in DuckDB.
#
# Scale: identical to ts_ewma_recursive — one user shuffle, per-key
# history bounded by user activity, no window, no Python.
# ---------------------------------------------------------------------------
@register(
    "ts_holt_linear_fold",
    # The oracle is a per-user RECURSIVE CTE rather than list_reduce
    # with a struct accumulator: DuckDB 1.0's list_reduce rebinds the
    # accumulator's struct fields PROGRESSIVELY (while computing field
    # 'b', `a.l` already holds the new level — measured, the engine-
    # semantics trap this round's adversarial review caught), whereas
    # Spark's aggregate() evaluates the struct simultaneously. The CTE
    # uses the old-values-only algebra ((a>>2) - l == (a - 4l) >> 2)
    # so every step reads exclusively the previous row.
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT user_id,
             list_transform(
                 list_sort(list((epoch_us(ts), event_id,
                                 CAST(floor(value * 100.0 + 0.5)
                                      AS BIGINT)))),
                 s -> s[3] * 1000000
             ) AS xs
      FROM events GROUP BY user_id
    ), r AS (
      SELECT user_id, len(xs) AS n, 1 AS i, xs[1] AS l,
             CAST(0 AS BIGINT) AS b
      FROM seq
      UNION ALL
      SELECT r.user_id, r.n, r.i + 1,
             (seq.xs[r.i + 1] + 3 * (r.l + r.b)) >> 2,
             (((seq.xs[r.i + 1] - r.l + 3 * r.b) >> 2) + 3 * r.b) >> 2
      FROM r JOIN seq USING (user_id)
      WHERE r.i < r.n
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_obs,
           CAST(l AS BIGINT) AS level_ucents,
           CAST(b AS BIGINT) AS trend_ucents,
           CAST(l + b AS BIGINT) AS forecast_ucents
    FROM r WHERE i = n
    ORDER BY user_id
    """,
)
def ts_holt_linear_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    grouped = ev.groupBy("user_id").agg(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
                F.col("event_id").alias("e"),
                exact_cents(F.col("value")).alias("x"),
            )
        ).alias("seq")
    )
    xs = F.transform(
        F.array_sort(F.col("seq")),
        lambda s: F.struct(
            (s["x"] * F.lit(1000000)).alias("l"),
            F.lit(0).cast("long").alias("b"),
        ),
    )

    def step(a, x):
        new_l = F.shiftright(x["l"] + F.lit(3) * (a["l"] + a["b"]), 2)
        new_b = F.shiftright((new_l - a["l"]) + F.lit(3) * a["b"], 2)
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    st = F.aggregate(
        F.slice(xs, 2, F.greatest(F.lit(0), F.size(xs) - 1)),
        F.element_at(xs, 1),
        step,
    )
    return grouped.select(
        "user_id",
        F.size(xs).cast("long").alias("n_obs"),
        st["l"].cast("long").alias("level_ucents"),
        st["b"].cast("long").alias("trend_ucents"),
        (st["l"] + st["b"]).cast("long").alias("forecast_ucents"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# ROLLING z-BAND OUTLIERS (Bollinger-style) — flag events whose value
# leaves the trailing-window mean ± 2σ band, with the entire test in
# EXACT integers: over the trailing frame keep the power sums
# (n, S1 = Σx, S2 = Σx²); the band test |x − μ| > 2σ cross-multiplies
# to (n·x − S1)² > 4·(n·S2 − S1²) — every quantity BIGINT cents, no
# division, no sqrt, no float anywhere (the usual rolling-stddev float
# pipeline can flap on band-edge points; the integer form cannot).
# Warm-up rows (frame < 5) are not judged, the standard Bollinger
# convention, identical in both engines.
#
# Scale: one user shuffle, one 20-row trailing frame — running-total
# cost. Overflow: the binding term is the SQUARED deviation
# (n·x − S1)² ≈ (n·|x|)², which leaves int64 once |dev| > ~3.04e9,
# i.e. cents beyond ~1.5e8 at n=20 (NOT the ~6e8 the S2 bound alone
# would suggest); DuckDB promotes to HUGEINT while Spark wraps
# silently in non-ANSI mode (r9 ADVICE). The band COMPARISON is
# therefore computed in DECIMAL(38,0) on the Spark side — exact to
# |dev| < 1e19, i.e. cents ≈ 5e17, matching DuckDB's int128 headroom.
# The dev_num/band_num OUTPUT casts stay BIGINT; past ~1.5e8 cents
# band_num's cast fails loudly on the DuckDB side (CAST overflow
# errors, never wraps), so fixtures exceeding the bound surface as a
# gate error rather than a silent flag flip.
# ---------------------------------------------------------------------------
_BB_WIN = 20  # trailing frame length (rows)
_BB_MIN = 5  # minimum frame before judging
_BB_K2 = 4  # k=2 sigmas, squared


@register(
    "ts_zband_outliers",
    oracle=f"""
    WITH w AS (
      SELECT user_id, event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x,
             COUNT(*) OVER fr AS n,
             SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER fr AS s1,
             SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                 * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER fr
                 AS s2
      FROM events
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN {_BB_WIN - 1} PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, x,
           CAST(n AS BIGINT) AS n_window,
           CAST(n * x - s1 AS BIGINT) AS dev_num,
           CAST({_BB_K2} * (n * s2 - s1 * s1) AS BIGINT) AS band_num
    FROM w
    WHERE n >= {_BB_MIN}
      AND (n * x - s1) * (n * x - s1) > {_BB_K2} * (n * s2 - s1 * s1)
    ORDER BY user_id, event_id
    """,
)
def ts_zband_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    x = exact_cents(F.col("value"))
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_BB_WIN - 1), -1)
    )
    w = ev.select(
        "user_id",
        "event_id",
        x.alias("x"),
        F.count("*").over(fr).alias("n"),
        F.sum(x).over(fr).alias("s1"),
        F.sum(x * x).over(fr).alias("s2"),
    )
    dev = F.col("n") * F.col("x") - F.col("s1")
    band = F.lit(_BB_K2) * (
        F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    )
    # The FLAG decision in decimal(38,0): dev² wraps int64 at cents
    # ~1.5e8 (see header comment) while DuckDB promotes to HUGEINT.
    dec = "decimal(38,0)"
    devd = (
        F.col("n").cast(dec) * F.col("x").cast(dec) - F.col("s1").cast(dec)
    )
    bandd = F.lit(_BB_K2).cast(dec) * (
        F.col("n").cast(dec) * F.col("s2").cast(dec)
        - F.col("s1").cast(dec) * F.col("s1").cast(dec)
    )
    return (
        w.filter((F.col("n") >= _BB_MIN) & (devd * devd > bandd))
        .select(
            "user_id",
            "event_id",
            "x",
            F.col("n").cast("long").alias("n_window"),
            dev.cast("long").alias("dev_num"),
            band.cast("long").alias("band_num"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# LAG-1 AUTOCORRELATION per user — the first diagnostic of serial
# dependence in a per-entity time series (Box-Jenkins identification;
# TimescaleDB/kdb ship it as a hyperfunction). Entirely EXACT until
# one final division: over the (ts, event_id)-ordered cents x_1..x_n,
# keep the integer sums n, S = Σx, Q = Σx², C = Σ x_t·x_{t+1}; the
# mean-centered lag-1 coefficient cross-multiplies to
#   r1 = (n²·C − n·S·(2S − x_1 − x_n) + (n−1)·S²) / (n²·Q − n·S²)
# (substitute μ = S/n into Σ(x_t−μ)(x_{t+1}−μ) / Σ(x−μ)² and clear
# denominators). Bounds: n ≤ ~100 per user, |x| ≤ ~5e4 cents →
# n²Q ≤ 1e4·100·2.5e9 = 2.5e15, comfortably BIGINT.
#
# Scale: ONE user-key shuffle; lead() and the aggregates share the
# partitioning, x_1/x_n come from min_by/max_by on the same (ts,
# event_id) order — no second exchange, no per-key array. Users are
# numerous and small (the healthy partition shape); a hot key costs
# one window pass, not a collect.
# ---------------------------------------------------------------------------
@register(
    "ts_autocorr_lag1",
    oracle="""
    WITH o AS (
      SELECT user_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x,
             LEAD(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x_next,
             row_number()
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS nu
      FROM events
    ),
    s AS (
      SELECT user_id,
             COUNT(*) AS n,
             SUM(x) AS sx,
             SUM(x * x) AS q,
             SUM(CASE WHEN x_next IS NOT NULL THEN x * x_next ELSE 0 END)
                 AS c,
             MAX(CASE WHEN rn = 1 THEN x END) AS x_first,
             MAX(CASE WHEN rn = nu THEN x END) AS x_last
      FROM o
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_obs,
           CAST(n * n * c - n * sx * (2 * sx - x_first - x_last)
                + (n - 1) * sx * sx AS BIGINT) AS acf_num,
           CAST(n * n * q - n * sx * sx AS BIGINT) AS acf_den,
           CAST(n * n * c - n * sx * (2 * sx - x_first - x_last)
                + (n - 1) * sx * sx AS DOUBLE)
             / (n * n * q - n * sx * sx) AS acf_lag1
    FROM s
    WHERE n >= 3 AND n * n * q - n * sx * sx > 0
    ORDER BY user_id
    """,
)
def ts_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    x = exact_cents(F.col("value"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        x.alias("x"),
        F.lead(x).over(w).alias("x_next"),
        "ts",
        "event_id",
    )
    key = F.struct("ts", "event_id")
    s = o.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
        F.sum(
            F.when(
                F.col("x_next").isNotNull(), F.col("x") * F.col("x_next")
            ).otherwise(F.lit(0))
        ).alias("c"),
        F.min_by("x", key).alias("x_first"),
        F.max_by("x", key).alias("x_last"),
    )
    n, sx, q, c = F.col("n"), F.col("sx"), F.col("q"), F.col("c")
    num = (
        n * n * c
        - n * sx * (F.lit(2) * sx - F.col("x_first") - F.col("x_last"))
        + (n - 1) * sx * sx
    )
    den = n * n * q - n * sx * sx
    return (
        s.filter((n >= 3) & (den > 0))
        .select(
            "user_id",
            n.cast("long").alias("n_obs"),
            num.cast("long").alias("acf_num"),
            den.cast("long").alias("acf_den"),
            (num.cast("double") / den).alias("acf_lag1"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# MASE — mean absolute scaled error (Hyndman & Koehler, IJF'06), the
# scale-free forecast-accuracy metric: how much better is a
# seasonal-naive forecast (same weekday last week, lag-7 over observed
# days) than the one-step naive baseline (yesterday's value)? The
# engine produces forecasts (ts_holt_linear_fold, ts_ewma_*); this is
# the missing EVAL side a forecasting pipeline reports. mase < 1e6
# (fixed point) ⟺ weekly seasonality carries real signal.
#
# Grain: exact integer daily cents totals per event_type over OBSERVED
# day rows (lag-k of the ordered observed series — the LOCF-adjacent
# convention, documented; calendar alignment belongs to
# dq_missing_dates). Both error sums restrict to rows where the lag-7
# reference exists, so numerator and denominator cover the SAME rows.
# Everything is |BIGINT| sums; the ratio is 1e6-scaled integer
# division. Day count per type is bounded (≤ a few thousand rows), so
# the per-type ordered window runs over the DAILY aggregate, never raw
# events.
# ---------------------------------------------------------------------------
@register(
    "ts_mase_seasonal_naive",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS dd,
             CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, c,
             lag(c, 1) OVER (PARTITION BY event_type ORDER BY dd) AS c1,
             lag(c, 7) OVER (PARTITION BY event_type ORDER BY dd) AS c7
      FROM daily
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(abs(c - c7)) AS BIGINT) AS seasonal_abs_err,
             CAST(SUM(abs(c - c1)) AS BIGINT) AS naive_abs_err
      FROM lagged WHERE c7 IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, n_days, seasonal_abs_err, naive_abs_err,
           CASE WHEN naive_abs_err = 0 THEN NULL
                ELSE seasonal_abs_err * 1000000 // naive_abs_err END
               AS mase_fp
    FROM s
    ORDER BY event_type
    """,
)
def ts_mase_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.functions import exact_cents

    ev = table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 86400000000"
            ).alias("dd"),
            exact_cents(F.col("value")).alias("cents"),
        )
        .groupBy("event_type", "dd")
        .agg(F.sum("cents").cast("long").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("dd")
    lagged = daily.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 7).over(w).alias("c7"),
    )
    s = (
        lagged.filter(F.col("c7").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum(F.abs(F.col("c") - F.col("c7")))
            .cast("long")
            .alias("seasonal_abs_err"),
            F.sum(F.abs(F.col("c") - F.col("c1")))
            .cast("long")
            .alias("naive_abs_err"),
        )
    )
    return s.select(
        "event_type", "n_days", "seasonal_abs_err", "naive_abs_err",
        F.when(F.col("naive_abs_err") == 0, F.lit(None).cast("long"))
        .otherwise(
            F.expr("seasonal_abs_err * 1000000 div naive_abs_err")
        )
        .alias("mase_fp"),
    ).orderBy("event_type")
