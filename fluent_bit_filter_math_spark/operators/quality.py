"""Data-quality audit — the Deequ/expectations-style table profile a
production pipeline runs before promoting a batch.

Absent from the reference (it transforms records, never validates a
table — /root/reference/filter_math/math.c:290-366). One query emits a
long-format (metric, value) audit of the ``orders`` table: row/distinct
counts, per-column null counts, duplicate-key count, value bounds,
exact totals, and the referential-integrity violation count against
``customer``.

Scale design: every table-level metric comes out of ONE hash-aggregate
pass over the fact table (count-distincts expand to the standard
two-phase partial-distinct plan; no extra scans), then a constant-width
``stack`` unpivots the single wide row — driver never sees data. The
FK check is a left-anti join against the dimension keys: broadcastable
dim at any realistic scale, AQE picks the strategy otherwise. Metric
values are exact: counts are integers widened to double, the total goes
through the DECIMAL(38,6) exact-sum idiom, and min/max return stored
doubles — nothing depends on float summation order, so the
driver's bitwise gate holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

_DSUM_PRICE = "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)"


@register(
    "dq_table_audit",
    oracle=f"""
    WITH w AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS row_count,
             CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) AS distinct_orderkey,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS DOUBLE)
                 AS dup_orderkeys,
             CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS distinct_custkey,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) AS null_custkey,
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) AS null_totalprice,
             MIN(o_totalprice) AS min_totalprice,
             MAX(o_totalprice) AS max_totalprice,
             {_DSUM_PRICE} AS sum_totalprice,
             {_DSUM_PRICE} / COUNT(*) AS avg_totalprice
      FROM orders
    ),
    fk AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS v
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_custkey IS NULL
    )
    SELECT 'row_count' AS metric, row_count AS value FROM w
    UNION ALL SELECT 'distinct_orderkey', distinct_orderkey FROM w
    UNION ALL SELECT 'dup_orderkeys', dup_orderkeys FROM w
    UNION ALL SELECT 'distinct_custkey', distinct_custkey FROM w
    UNION ALL SELECT 'null_custkey', null_custkey FROM w
    UNION ALL SELECT 'null_totalprice', null_totalprice FROM w
    UNION ALL SELECT 'min_totalprice', min_totalprice FROM w
    UNION ALL SELECT 'max_totalprice', max_totalprice FROM w
    UNION ALL SELECT 'sum_totalprice', sum_totalprice FROM w
    UNION ALL SELECT 'avg_totalprice', avg_totalprice FROM w
    UNION ALL SELECT 'fk_violations', v FROM fk
    """,
)
def dq_table_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")

    wide = orders.agg(
        F.count("*").cast("double").alias("row_count"),
        F.count_distinct(F.col("o_orderkey"))
        .cast("double")
        .alias("distinct_orderkey"),
        (F.count("*") - F.count_distinct(F.col("o_orderkey")))
        .cast("double")
        .alias("dup_orderkeys"),
        F.count_distinct(F.col("o_custkey"))
        .cast("double")
        .alias("distinct_custkey"),
        F.sum(F.col("o_custkey").isNull().cast("int"))
        .cast("double")
        .alias("null_custkey"),
        F.sum(F.col("o_totalprice").isNull().cast("int"))
        .cast("double")
        .alias("null_totalprice"),
        F.min("o_totalprice").alias("min_totalprice"),
        F.max("o_totalprice").alias("max_totalprice"),
        F.expr(_DSUM_PRICE).alias("sum_totalprice"),
        (F.expr(_DSUM_PRICE) / F.count("*")).alias("avg_totalprice"),
    )
    metrics = wide.selectExpr(
        "stack(10, "
        "'row_count', row_count, "
        "'distinct_orderkey', distinct_orderkey, "
        "'dup_orderkeys', dup_orderkeys, "
        "'distinct_custkey', distinct_custkey, "
        "'null_custkey', null_custkey, "
        "'null_totalprice', null_totalprice, "
        "'min_totalprice', min_totalprice, "
        "'max_totalprice', max_totalprice, "
        "'sum_totalprice', sum_totalprice, "
        "'avg_totalprice', avg_totalprice"
        ") as (metric, value)"
    )
    fk = (
        orders.join(
            customer.select("c_custkey"),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").cast("double").alias("value"))
        .select(F.lit("fk_violations").alias("metric"), "value")
    )
    return metrics.unionAll(fk)


# ---------------------------------------------------------------------------
# volume-anomaly audit — flag days whose event count deviates ±50% from
# the trailing-7-day median: the ingest-monitoring check a production
# pipeline runs before trusting a day's data. The median is the EXACT
# middle order statistic of the 7 trailing integer counts (collect over
# a ROWS frame → sort → element 4) — no interpolation, no engine
# variance; the ±50% thresholds are exact (1.5·int and int/2·... both
# representable). One shuffle to the daily grain, then a single-
# partition ordered frame over ~30 rows (day cardinality, not event
# volume — at 100 TB this stage sees one row per day).
# ---------------------------------------------------------------------------
@register(
    "dq_volume_anomaly_days",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, COUNT(*) AS cnt
      FROM events GROUP BY 1
    ),
    med AS (
      SELECT d, cnt,
             list_sort(list(cnt) OVER (
               ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
             ))[4] AS trail_med,
             ROW_NUMBER() OVER (ORDER BY d) AS rn
      FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           cnt,
           trail_med,
           cnt > 1.5 * trail_med OR 2 * cnt < trail_med AS is_anomaly
    FROM med WHERE rn > 7
    ORDER BY day
    """,
)
def dq_volume_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").alias("cnt")
    )
    w = Window.orderBy("d")
    frame = w.rowsBetween(-7, -1)
    med = (
        daily.withColumn(
            "trail_med",
            F.element_at(F.array_sort(F.collect_list("cnt").over(frame)), 4),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 7)
    )
    return med.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "cnt",
        "trail_med",
        (
            (F.col("cnt") > 1.5 * F.col("trail_med"))
            | (2 * F.col("cnt") < F.col("trail_med"))
        ).alias("is_anomaly"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Distribution drift — PSI (population stability index), the standard
# ingest-monitoring statistic for "did this week's data change shape":
# the value column is histogrammed into fixed buckets for a baseline
# period and the current period, and PSI = Σ (p_cur − p_base) ·
# ln(p_cur / p_base) over buckets (>0.2 conventionally flags drift).
# Two scans collapse into ONE conditional aggregate (CASE on the
# period), bucket shares use add-one smoothing so empty buckets stay
# finite, and the total follows the exact-DECIMAL-sum discipline
# (each 9-dp-rounded term is summed as DECIMAL(20,9) — shuffle-order-
# proof, the text_lm_score idiom). One shuffle on the 10-bucket key,
# one 1-row broadcast back: drift monitoring at 100 TB is exactly one
# word-count-shaped pass.
# ---------------------------------------------------------------------------
_PSI_CUT = "2024-01-15 00:00:00"
_PSI_W = 50.0  # bucket width over value ∈ [0, 500)
_PSI_K = 10


@register(
    "dq_distribution_drift",
    oracle=f"""
    WITH b AS (
      SELECT LEAST(CAST(floor(value / {_PSI_W}) AS BIGINT), {_PSI_K - 1})
                 AS bucket,
             CASE WHEN ts < TIMESTAMP '{_PSI_CUT}' THEN 1 ELSE 0 END
                 AS is_base
      FROM events
    ),
    gobs AS (
      SELECT bucket,
             CAST(SUM(is_base) AS BIGINT) AS n_base,
             CAST(SUM(1 - is_base) AS BIGINT) AS n_curr
      FROM b GROUP BY bucket
    ),
    -- every one of the K buckets contributes a smoothed term, even
    -- when empty in BOTH periods: the add-one denominators (t + K)
    -- assume K terms, so dropping all-empty buckets biases psi_total
    -- whenever t_base != t_curr
    g AS (
      SELECT t.d AS bucket,
             COALESCE(gobs.n_base, 0) AS n_base,
             COALESCE(gobs.n_curr, 0) AS n_curr
      FROM UNNEST(range(0, {_PSI_K})) t(d)
      LEFT JOIN gobs ON gobs.bucket = t.d
    ),
    tot AS (
      SELECT SUM(n_base) AS t_base, SUM(n_curr) AS t_curr FROM g
    ),
    terms AS (
      SELECT bucket, n_base, n_curr,
             floor(
               ((CAST(n_curr + 1 AS DOUBLE) / (t_curr + {_PSI_K}))
                - (CAST(n_base + 1 AS DOUBLE) / (t_base + {_PSI_K})))
               * ln((CAST(n_curr + 1 AS DOUBLE) / (t_curr + {_PSI_K}))
                    / (CAST(n_base + 1 AS DOUBLE) / (t_base + {_PSI_K})))
               * 1000000000.0 + 0.5) / 1000000000.0 AS psi_term
      FROM g, tot
    ),
    total AS (
      SELECT CAST(SUM(CAST(psi_term AS DECIMAL(20,9))) AS DOUBLE)
                 AS psi_total
      FROM terms
    )
    SELECT bucket, n_base, n_curr, psi_term, psi_total
    FROM terms, total
    ORDER BY bucket
    """,
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        F.least(
            F.floor(F.col("value") / _PSI_W).cast("long"),
            F.lit(_PSI_K - 1),
        ).alias("bucket"),
        F.when(
            F.col("ts") < F.lit(_PSI_CUT).cast(ev.schema["ts"].dataType), 1
        )
        .otherwise(0)
        .alias("is_base"),
    )
    gobs = b.groupBy("bucket").agg(
        F.sum("is_base").alias("n_base"),
        F.sum(1 - F.col("is_base")).alias("n_curr"),
    )
    # All K buckets, zero-filled when empty in both periods (see the
    # oracle comment: the smoothing denominators assume K terms).
    grid = spark.range(_PSI_K).select(F.col("id").alias("bucket"))
    g = (
        grid.join(gobs, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_curr", F.lit(0)).alias("n_curr"),
        )
    )
    tot = g.agg(
        F.sum("n_base").alias("t_base"), F.sum("n_curr").alias("t_curr")
    )
    p_base = (F.col("n_base") + 1).cast("double") / (
        F.col("t_base") + _PSI_K
    )
    p_curr = (F.col("n_curr") + 1).cast("double") / (
        F.col("t_curr") + _PSI_K
    )
    term = (
        F.floor(
            (p_curr - p_base) * F.log(p_curr / p_base) * F.lit(1000000000.0)
            + F.lit(0.5)
        )
        / F.lit(1000000000.0)
    )
    terms = g.crossJoin(F.broadcast(tot)).select(
        "bucket", "n_base", "n_curr", term.alias("psi_term")
    )
    total = terms.agg(
        F.sum(F.col("psi_term").cast("decimal(20,9)"))
        .cast("double")
        .alias("psi_total")
    )
    return (
        terms.crossJoin(F.broadcast(total))
        .select("bucket", "n_base", "n_curr", "psi_term", "psi_total")
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Cross-table reconciliation — the two-sided integrity audit
# dq_table_audit's one-way FK check doesn't cover: orders↔lineitem
# agreement in BOTH directions (childless orders, orphan lineitems)
# plus an exact money reconciliation (summed line revenue vs order
# headers) — the daily close every billing/warehouse pipeline runs.
# Two aggregates pre-shrink each side to one row per key before the
# single full-outer co-partitioned join (the merge_upsert shuffle
# shape), so the join carries |keys| rows, never line items. All
# money is exact integer cents.
# ---------------------------------------------------------------------------
@register(
    "dq_reconcile_orders_lineitem",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS o_cents
      FROM orders
    ),
    l AS (
      SELECT l_orderkey,
             COUNT(*) AS n_lines,
             CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS l_cents
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderkey, l.l_orderkey, o.o_cents, l.n_lines, l.l_cents
      FROM o FULL OUTER JOIN l ON o.o_orderkey = l.l_orderkey
    )
    SELECT
      CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS childless_orders,
      CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS orphan_line_keys,
      CAST(SUM(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS matched_orders,
      CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN o_cents ELSE 0 END)
           AS BIGINT) AS header_cents,
      CAST(SUM(CASE WHEN l_orderkey IS NOT NULL THEN l_cents ELSE 0 END)
           AS BIGINT) AS line_cents
    FROM j
    """,
)
def dq_reconcile_orders_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from fluent_bit_filter_math_spark.functions import exact_cents

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", exact_cents(F.col("o_totalprice")).alias("o_cents")
    )
    l = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(exact_cents(F.col("l_extendedprice"))).alias("l_cents"),
        )
    )
    j = o.join(l, o.o_orderkey == l.l_orderkey, "full_outer")
    return j.agg(
        F.sum(
            F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)
        ).alias("childless_orders"),
        F.sum(
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
        ).alias("orphan_line_keys"),
        F.sum(
            F.when(
                F.col("o_orderkey").isNotNull()
                & F.col("l_orderkey").isNotNull(),
                1,
            ).otherwise(0)
        ).alias("matched_orders"),
        F.sum(
            F.when(F.col("o_orderkey").isNotNull(), F.col("o_cents")).otherwise(
                0
            )
        ).alias("header_cents"),
        F.sum(
            F.when(F.col("l_orderkey").isNotNull(), F.col("l_cents")).otherwise(
                0
            )
        ).alias("line_cents"),
    )


# ---------------------------------------------------------------------------
# BENFORD first-digit screen — the classic financial-data anomaly
# check (fraud/fabrication detection, ingest sanity): genuine
# multiplicative amounts follow P(d) = log10(1 + 1/d); a synthetic or
# truncated feed does not. The expected shares are FIXED decimal
# literals (12 dp), not engine log10 calls — log is not correctly
# rounded and would break the bitwise gate; the observed share is one
# division of exact counts, the deviation one subtraction. Output is
# the 9-digit distribution plus a 2%-band flag per digit.
#
# Scale: one map-side digit projection + a 9-group aggregate +
# broadcast of the 1-row total. Nothing here is ever larger than 9
# rows past the scan.
# ---------------------------------------------------------------------------
_BENFORD = {
    1: "0.301029995664",
    2: "0.176091259056",
    3: "0.124938736608",
    4: "0.096910013008",
    5: "0.079181246048",
    6: "0.066946789631",
    7: "0.057991946978",
    8: "0.051152522447",
    9: "0.045757490561",
}
_D_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN CAST({v} AS DOUBLE)" for d, v in _BENFORD.items()
)


@register(
    "dq_benford_anomaly",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
                 AS lead_digit
      FROM orders
    ), counts AS (
      SELECT lead_digit, COUNT(*) AS n_obs FROM digits GROUP BY lead_digit
    ), tot AS (SELECT SUM(n_obs) AS n FROM counts)
    SELECT lead_digit,
           CAST(n_obs AS BIGINT) AS n_obs,
           CAST(n_obs AS DOUBLE) / n AS obs_share,
           CASE lead_digit {_D_BENFORD_CASE} END AS exp_share,
           (abs(CAST(n_obs AS DOUBLE) / n
                - CASE lead_digit {_D_BENFORD_CASE} END) > 0.02)
               AS out_of_band
    FROM counts, tot
    ORDER BY lead_digit
    """,
)
def dq_benford_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
    digits = orders.select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias(
            "lead_digit"
        )
    )
    counts = digits.groupBy("lead_digit").agg(F.count("*").alias("n_obs"))
    tot = counts.agg(F.sum("n_obs").alias("n"))
    exp = F.element_at(
        F.create_map(
            *[
                c
                for d, v in _BENFORD.items()
                for c in (F.lit(d).cast("long"), F.lit(float(v)))
            ]
        ),
        F.col("lead_digit"),
    )
    obs = F.col("n_obs").cast("double") / F.col("n")
    return (
        counts.join(F.broadcast(tot))
        .select(
            "lead_digit",
            F.col("n_obs").cast("long").alias("n_obs"),
            obs.alias("obs_share"),
            exp.alias("exp_share"),
            (F.abs(obs - exp) > 0.02).alias("out_of_band"),
        )
        .orderBy("lead_digit")
    )


# ---------------------------------------------------------------------------
# K-ANONYMITY audit (Sweeney 2002) — the privacy/governance check a
# dataset release runs before sharing: every quasi-identifier
# combination must describe at least k individuals, or its rows are
# re-identifiable. QI here is (nation, market segment, balance sign)
# over customers; the audit reports per-class sizes for the risky
# classes (size < k), plus the dataset's anonymity level (the min
# class size) and how many rows sit in risky classes — the numbers a
# release gate thresholds on. Pure integer counting.
#
# Scale: one hash aggregate on the QI key + a 1-row broadcast-back of
# the global min/violation totals. Class count is bounded by the QI
# domain, not the row count.
# ---------------------------------------------------------------------------
_KANON_K = 10


@register(
    "dq_k_anonymity",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(c_acctbal >= 0 AS BIGINT) AS bal_sign,
             COUNT(*) AS class_size
      FROM customer
      GROUP BY c_nationkey, c_mktsegment, CAST(c_acctbal >= 0 AS BIGINT)
    ), summary AS (
      SELECT MIN(class_size) AS k_anonymity,
             CAST(SUM(CASE WHEN class_size < {_KANON_K}
                           THEN class_size ELSE 0 END) AS BIGINT)
                 AS rows_at_risk,
             CAST(SUM(CASE WHEN class_size < {_KANON_K} THEN 1 ELSE 0 END)
                  AS BIGINT) AS risky_classes
      FROM classes
    )
    SELECT c.c_nationkey, c.c_mktsegment, c.bal_sign,
           CAST(c.class_size AS BIGINT) AS class_size,
           CAST(s.k_anonymity AS BIGINT) AS k_anonymity,
           s.rows_at_risk, s.risky_classes
    FROM classes c, summary s
    WHERE c.class_size < {_KANON_K}
    ORDER BY c.c_nationkey, c.c_mktsegment, c.bal_sign
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    classes = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            (F.col("c_acctbal") >= 0).cast("long").alias("bal_sign"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_sign")
        .agg(F.count("*").alias("class_size"))
    )
    summary = classes.agg(
        F.min("class_size").cast("long").alias("k_anonymity"),
        F.sum(
            F.when(F.col("class_size") < _KANON_K, F.col("class_size"))
            .otherwise(0)
        ).cast("long").alias("rows_at_risk"),
        F.sum(
            F.when(F.col("class_size") < _KANON_K, 1).otherwise(0)
        ).cast("long").alias("risky_classes"),
    )
    return (
        classes.filter(F.col("class_size") < _KANON_K)
        .crossJoin(F.broadcast(summary))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_sign",
            F.col("class_size").cast("long").alias("class_size"),
            "k_anonymity",
            "rows_at_risk",
            "risky_classes",
        )
        .orderBy("c_nationkey", "c_mktsegment", "bal_sign")
    )


# ---------------------------------------------------------------------------
# TWO-SAMPLE KOLMOGOROV-SMIRNOV — the nonparametric drift test
# (complements dq_distribution_drift's binned PSI with the EXACT
# unbinned statistic): D = sup_x |F1(x) - F2(x)|. Over the merged
# value sequence the empirical CDF difference at each point is the
# rational (c1·n2 - c2·n1)/(n1·n2), so D is computed as an INTEGER
# max of |c1·n2 - c2·n1| with one final division — no floats until
# the last op, no binning error. Samples: 'click' vs 'view' event
# values per the shared cents domain; ties are handled by evaluating
# the CDFs after the last row of each distinct value (the standard
# discrete-data convention, identical in both engines).
#
# Scale: one sort-window over the merged samples (two-level-able like
# every rank here), counts as running sums — one shuffle total.
# ---------------------------------------------------------------------------
@register(
    "dq_ks_two_sample",
    oracle="""
    WITH s AS (
      SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             CAST(event_type = 'click' AS BIGINT) AS is_a
      FROM events WHERE event_type IN ('click', 'view')
    ), tot AS (
      SELECT SUM(is_a) AS n1, SUM(1 - is_a) AS n2 FROM s
    ), cdf AS (
      SELECT cents,
             SUM(SUM(is_a)) OVER (ORDER BY cents) AS c1,
             SUM(SUM(1 - is_a)) OVER (ORDER BY cents) AS c2
      FROM s GROUP BY cents
    )
    SELECT CAST(tot.n1 AS BIGINT) AS n1,
           CAST(tot.n2 AS BIGINT) AS n2,
           CAST(MAX(abs(c1 * tot.n2 - c2 * tot.n1)) AS BIGINT) AS d_num,
           CAST(tot.n1 * tot.n2 AS BIGINT) AS d_den,
           CAST(MAX(abs(c1 * tot.n2 - c2 * tot.n1)) AS DOUBLE)
               / (tot.n1 * tot.n2) AS ks_d
    FROM cdf, tot
    GROUP BY tot.n1, tot.n2
    """,
)
def dq_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from fluent_bit_filter_math_spark.functions import exact_cents

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    s = ev.select(
        exact_cents(F.col("value")).alias("cents"),
        (F.col("event_type") == "click").cast("long").alias("is_a"),
    )
    per_val = s.groupBy("cents").agg(
        F.sum("is_a").alias("a"),
        F.sum(F.lit(1) - F.col("is_a")).alias("b"),
    )
    wc = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cdf = per_val.select(
        "cents",
        F.sum("a").over(wc).alias("c1"),
        F.sum("b").over(wc).alias("c2"),
    )
    tot = s.agg(
        F.sum("is_a").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("is_a")).cast("long").alias("n2"),
    )
    j = cdf.crossJoin(F.broadcast(tot))
    dnum = F.max(
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
    )
    return j.groupBy("n1", "n2").agg(
        dnum.cast("long").alias("d_num"),
        (F.col("n1") * F.col("n2")).cast("long").alias("d_den"),
        (dnum.cast("double") / (F.col("n1") * F.col("n2"))).alias("ks_d"),
    )


# ---------------------------------------------------------------------------
# MANN-WHITNEY U — the rank-sum two-sample test (pairs with
# dq_ks_two_sample's CDF-sup statistic: U answers "is one sample
# stochastically larger", KS answers "do the shapes differ"). Ties
# take MIDRANKS, which are half-integers — so everything is computed
# in DOUBLED rank units where they become exact integers: a tied
# group of t values after c predecessors has 2·midrank = 2c + t + 1,
# R1×2 = Σ t1·(2c + t + 1), and U1×2 = R1×2 − n1(n1+1). The common-
# language effect size U1/(n1·n2) is the single final division.
# Identity U1 + U2 = n1·n2 is emitted as the self-check column.
#
# Scale: like KS — per-distinct-value aggregation first (value-domain
# -bounded), one cumulative window over that bounded frame.
# ---------------------------------------------------------------------------
@register(
    "dq_mann_whitney_u",
    oracle="""
    WITH s AS (
      SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             CAST(event_type = 'click' AS BIGINT) AS is_a
      FROM events WHERE event_type IN ('click', 'view')
    ), pv AS (
      SELECT cents, SUM(is_a) AS t1, SUM(1 - is_a) AS t2,
             COUNT(*) AS t
      FROM s GROUP BY cents
    ), cum AS (
      SELECT cents, t1, t2, t,
             COALESCE(SUM(t) OVER (ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS c
      FROM pv
    ), agg AS (
      SELECT CAST(SUM(t1) AS BIGINT) AS n1,
             CAST(SUM(t2) AS BIGINT) AS n2,
             CAST(SUM(t1 * (2 * c + t + 1)) AS BIGINT) AS r1_2x
      FROM cum
    )
    SELECT n1, n2,
           CAST(r1_2x - n1 * (n1 + 1) AS BIGINT) AS u1_2x,
           CAST(2 * n1 * n2 - (r1_2x - n1 * (n1 + 1)) AS BIGINT) AS u2_2x,
           CAST(r1_2x - n1 * (n1 + 1) AS DOUBLE) / (2 * n1 * n2)
               AS effect_size,
           ((r1_2x - n1 * (n1 + 1))
            + (2 * n1 * n2 - (r1_2x - n1 * (n1 + 1)))
            = 2 * n1 * n2) AS identity_ok
    FROM agg
    """,
)
def dq_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from fluent_bit_filter_math_spark.functions import exact_cents

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    s = ev.select(
        exact_cents(F.col("value")).alias("cents"),
        (F.col("event_type") == "click").cast("long").alias("is_a"),
    )
    pv = s.groupBy("cents").agg(
        F.sum("is_a").alias("t1"),
        F.sum(F.lit(1) - F.col("is_a")).alias("t2"),
        F.count("*").alias("t"),
    )
    wc = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = pv.select(
        "t1",
        "t2",
        "t",
        F.coalesce(F.sum("t").over(wc), F.lit(0)).alias("c"),
    )
    agg = cum.agg(
        F.sum("t1").cast("long").alias("n1"),
        F.sum("t2").cast("long").alias("n2"),
        F.sum(
            F.col("t1") * (F.lit(2) * F.col("c") + F.col("t") + 1)
        ).cast("long").alias("r1_2x"),
    )
    u1 = F.col("r1_2x") - F.col("n1") * (F.col("n1") + 1)
    u2 = F.lit(2) * F.col("n1") * F.col("n2") - u1
    return agg.select(
        "n1",
        "n2",
        u1.cast("long").alias("u1_2x"),
        u2.cast("long").alias("u2_2x"),
        (u1.cast("double") / (F.lit(2) * F.col("n1") * F.col("n2")))
        .alias("effect_size"),
        ((u1 + u2) == F.lit(2) * F.col("n1") * F.col("n2")).alias(
            "identity_ok"
        ),
    )


# ---------------------------------------------------------------------------
# CHI-SQUARE independence — the contingency-table test (is event mix
# independent of weekday?), completing the testing trio (KS: shapes,
# U: location, chi2: categorical independence). Per cell the term
# (o·N − r·c)² / (r·c·N) is evaluated in a FIXED float order — the
# difference is exact in BIGINT, squared in DOUBLE (exact IEEE
# squaring of a correctly-rounded conversion, overflow-free at any
# scale), then two divisions — and fixed-pointed to micro-units so
# the cell sum is an order-free INTEGER aggregate. Output: the
# statistic, degrees of freedom, and the per-cell maximum
# contribution (which cell drives the dependence).
#
# Scale: one (type, weekday)-cell aggregate (≤ 35 cells), margins
# broadcast back onto the cells — nothing bigger than the cell table
# past the scan.
# ---------------------------------------------------------------------------
@register(
    "dq_chi_square_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS wd,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ), margins AS (
      SELECT event_type, SUM(o) AS r FROM cells GROUP BY event_type
    ), cols AS (
      SELECT wd, SUM(o) AS c FROM cells GROUP BY wd
    ), tot AS (SELECT SUM(o) AS n FROM cells),
    terms AS (
      SELECT cells.event_type, cells.wd,
             CAST(floor(
                 CAST(cells.o * tot.n - margins.r * cols.c AS DOUBLE)
                 * CAST(cells.o * tot.n - margins.r * cols.c AS DOUBLE)
                 / CAST(margins.r * cols.c AS DOUBLE) / tot.n
                 * 1000000.0 + 0.5) AS BIGINT) AS term_fp
      FROM cells
      JOIN margins USING (event_type)
      JOIN cols USING (wd)
      CROSS JOIN tot
    )
    SELECT CAST(SUM(term_fp) AS BIGINT) AS chi2_fp,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT wd) - 1) AS BIGINT) AS dof,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(MAX(term_fp) AS BIGINT) AS max_cell_fp
    FROM terms
    """,
)
def dq_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("wd")
    ).agg(F.count("*").alias("o"))
    margins = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols = cells.groupBy("wd").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    d = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    term = (
        d * d / (F.col("r") * F.col("c")).cast("double") / F.col("n")
    )
    terms = (
        cells.join(F.broadcast(margins), "event_type")
        .join(F.broadcast(cols), "wd")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "wd",
            F.floor(term * 1000000.0 + F.lit(0.5)).cast("long").alias(
                "term_fp"
            ),
        )
    )
    return terms.agg(
        F.sum("term_fp").cast("long").alias("chi2_fp"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("wd") - 1)
        ).cast("long").alias("dof"),
        F.count("*").cast("long").alias("n_cells"),
        F.max("term_fp").cast("long").alias("max_cell_fp"),
    )


# ---------------------------------------------------------------------------
# TUKEY-FENCE (IQR) OUTLIER AUDIT — the boxplot rule (Tukey, EDA 1977)
# every data-quality stack ships (Deequ/GreatExpectations anomaly
# checks): per event_type, flag values outside
# [q1 − 1.5·IQR, q3 + 1.5·IQR]. Entirely EXACT: quartiles are DISCRETE
# order statistics (rows at ⌈n/4⌉ and ⌈3n/4⌉ under the total (cents,
# event_id) order — selected rows, never interpolation), and the
# fences clear the 1.5 by cross-multiplying with 2:
#   low outlier  ⟺ 2x < 5·q1 − 3·q3
#   high outlier ⟺ 2x > 5·q3 − 3·q1.
# Integer comparisons only; no float anywhere.
#
# Scale: ranks are assigned two-level (bucket on the cents high bits —
# a prefix of the sort key — + exclusive prefix-sum of bucket counts,
# the gini/epoch-shuffle discipline), so no task sorts a whole
# event_type group; the quartile rows broadcast back for one
# fence-count pass.
# ---------------------------------------------------------------------------
@register(
    "dq_iqr_outliers",
    oracle="""
    WITH c AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    r AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY event_type ORDER BY cents, event_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM c
    ),
    q AS (
      SELECT event_type,
             MAX(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS q1,
             MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS q3,
             MAX(n) AS n
      FROM r
      GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(q.n AS BIGINT) AS n_events,
           CAST(q.q1 AS BIGINT) AS q1_cents,
           CAST(q.q3 AS BIGINT) AS q3_cents,
           CAST(SUM(CASE WHEN 2 * c.cents < 5 * q.q1 - 3 * q.q3
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN 2 * c.cents > 5 * q.q3 - 3 * q.q1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(MIN(CASE WHEN 2 * c.cents < 5 * q.q1 - 3 * q.q3
                         THEN c.cents END) AS BIGINT) AS min_low_cents,
           CAST(MAX(CASE WHEN 2 * c.cents > 5 * q.q3 - 3 * q.q1
                         THEN c.cents END) AS BIGINT) AS max_high_cents
    FROM c JOIN q USING (event_type)
    GROUP BY c.event_type, q.n, q.q1, q.q3
    ORDER BY c.event_type
    """,
)
def dq_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from fluent_bit_filter_math_spark.functions import exact_cents

    ev = table(spark, sf_dir, "events")
    cents = exact_cents(F.col("value"))
    keyed = ev.select(
        "event_type",
        cents.alias("cents"),
        "event_id",
        F.shiftright(cents, 6).alias("bucket"),
    )
    bcounts = keyed.groupBy("event_type", "bucket").agg(
        F.count("*").alias("bn")
    )
    wpre = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bcounts.select(
        "event_type",
        "bucket",
        F.coalesce(F.sum("bn").over(wpre), F.lit(0)).alias("offset"),
    )
    wib = Window.partitionBy("event_type", "bucket").orderBy(
        "cents", "event_id"
    )
    totals = keyed.groupBy("event_type").agg(F.count("*").alias("n"))
    r = (
        keyed.join(F.broadcast(offsets), ["event_type", "bucket"])
        .select(
            "event_type",
            "cents",
            (F.col("offset") + F.row_number().over(wib)).alias("rn"),
        )
        .join(F.broadcast(totals), "event_type")
    )
    q = r.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("cents"))
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("cents")
            )
        ).alias("q3"),
        F.max("n").alias("n"),
    )
    c = keyed.select("event_type", "cents")
    low = F.lit(2) * F.col("cents") < F.lit(5) * F.col("q1") - F.lit(3) * F.col("q3")
    high = F.lit(2) * F.col("cents") > F.lit(5) * F.col("q3") - F.lit(3) * F.col("q1")
    return (
        c.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "n", "q1", "q3")
        .agg(
            F.sum(low.cast("long")).alias("n_low"),
            F.sum(high.cast("long")).alias("n_high"),
            F.min(F.when(low, F.col("cents"))).alias("min_low_cents"),
            F.max(F.when(high, F.col("cents"))).alias("max_high_cents"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            F.col("q1").cast("long").alias("q1_cents"),
            F.col("q3").cast("long").alias("q3_cents"),
            F.col("n_low").cast("long").alias("n_low"),
            F.col("n_high").cast("long").alias("n_high"),
            F.col("min_low_cents").cast("long").alias("min_low_cents"),
            F.col("max_high_cents").cast("long").alias("max_high_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# WELCH'S t TEST (squared form) — the unequal-variance two-sample
# location test (Welch, Biometrika 1947), the parametric complement
# to dq_mann_whitney_u: compare 'purchase' vs 'click' values. The
# statistic is emitted as t² = (μ₁−μ₂)² / (s₁²/n₁ + s₂²/n₂), which
# needs no sqrt; with exact integer (n, S = Σx, Q = Σx²) per group
# every intermediate is a single correctly-rounded IEEE op on
# identical operands — bit-identical cross-engine without rounding
# tricks. The Welch–Satterthwaite dof rides along the same way. The
# exact components are in the output, so a reviewer can recompute the
# statistic to full precision.
#
# Scale: ONE partial-aggregatable pass (two filtered aggregates over
# the same scan); no window, no join, no per-group sort.
# ---------------------------------------------------------------------------
_WELCH_A, _WELCH_B = "purchase", "click"


@register(
    "dq_welch_t_squared",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS s,
             SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                 * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS q
      FROM events
      WHERE event_type IN ('{_WELCH_A}', '{_WELCH_B}')
      GROUP BY event_type
    ),
    ab AS (
      SELECT
        MAX(CASE WHEN event_type = '{_WELCH_A}' THEN n END) AS n1,
        MAX(CASE WHEN event_type = '{_WELCH_A}' THEN s END) AS s1,
        MAX(CASE WHEN event_type = '{_WELCH_A}' THEN q END) AS q1,
        MAX(CASE WHEN event_type = '{_WELCH_B}' THEN n END) AS n2,
        MAX(CASE WHEN event_type = '{_WELCH_B}' THEN s END) AS s2,
        MAX(CASE WHEN event_type = '{_WELCH_B}' THEN q END) AS q2
      FROM g
    ),
    c AS (
      SELECT *,
             (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
               / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                  * (CAST(n1 AS DOUBLE) - 1.0)) AS se1,
             (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
              - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
               / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  * (CAST(n2 AS DOUBLE) - 1.0)) AS se2,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS dmean
      FROM ab
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(s1 AS BIGINT) AS s1_cents,
           CAST(q1 AS BIGINT) AS q1_cents2,
           CAST(n2 AS BIGINT) AS n2, CAST(s2 AS BIGINT) AS s2_cents,
           CAST(q2 AS BIGINT) AS q2_cents2,
           (dmean * dmean) / (se1 + se2) AS t_squared,
           ((se1 + se2) * (se1 + se2))
             / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)
                + se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)) AS welch_dof
    FROM c
    """,
)
def dq_welch_t_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.functions import exact_cents

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_WELCH_A, _WELCH_B)
    )
    x = exact_cents(F.col("value"))
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("s"),
        F.sum(x * x).alias("q"),
    )

    def pick(col: str, t: str):
        return F.max(F.when(F.col("event_type") == t, F.col(col)))

    ab = g.agg(
        pick("n", _WELCH_A).alias("n1"),
        pick("s", _WELCH_A).alias("s1"),
        pick("q", _WELCH_A).alias("q1"),
        pick("n", _WELCH_B).alias("n2"),
        pick("s", _WELCH_B).alias("s2"),
        pick("q", _WELCH_B).alias("q2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    se1 = (d("n1") * d("q1") - d("s1") * d("s1")) / (
        d("n1") * d("n1") * (d("n1") - F.lit(1.0))
    )
    se2 = (d("n2") * d("q2") - d("s2") * d("s2")) / (
        d("n2") * d("n2") * (d("n2") - F.lit(1.0))
    )
    dmean = d("s1") / d("n1") - d("s2") / d("n2")
    c = ab.select(
        "*", se1.alias("se1"), se2.alias("se2"), dmean.alias("dmean")
    )
    return c.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("s1").cast("long").alias("s1_cents"),
        F.col("q1").cast("long").alias("q1_cents2"),
        F.col("n2").cast("long").alias("n2"),
        F.col("s2").cast("long").alias("s2_cents"),
        F.col("q2").cast("long").alias("q2_cents2"),
        (
            (F.col("dmean") * F.col("dmean"))
            / (F.col("se1") + F.col("se2"))
        ).alias("t_squared"),
        (
            (F.col("se1") + F.col("se2")) * (F.col("se1") + F.col("se2"))
            / (
                F.col("se1") * F.col("se1") / (d("n1") - F.lit(1.0))
                + F.col("se2") * F.col("se2") / (d("n2") - F.lit(1.0))
            )
        ).alias("welch_dof"),
    )


# ---------------------------------------------------------------------------
# CRAMÉR'S V — effect-size normalization of the chi-square statistic
# (Cramér 1946), the standard "is this association actually LARGE?"
# companion to dq_chi_square_independence: V = sqrt(χ²/(n·min(r−1,c−1)))
# ∈ [0,1], comparable across tables of any shape. Audited pair here is
# corpus COMPOSITION — documents' source × lang contingency — the
# check a training-data pipeline runs to detect language mix drifting
# per source before a mixture-weighted sample (sample_domain_mixture).
#
# Determinism: cell/margin/total counts are exact integers; each χ²
# term is rounded to 1e-6 fixed point through the shared
# floor(x·1e6 + 0.5) helper (the dq_chi_square_independence
# discipline), so χ²_fp is an exact BIGINT; V is then one
# identical-operand IEEE chain (two divisions + sqrt, both
# correctly-rounded everywhere) on exact integers.
#
# Scale: one (source, lang) hash aggregate (cells ≪ rows), margins are
# re-aggregates of the cell table, and the broadcast-joined term pass
# never touches the fact table again — the chi-square shape exactly.
# ---------------------------------------------------------------------------
@register(
    "dq_cramers_v",
    oracle="""
    WITH cells AS (
      SELECT source, lang, COUNT(*) AS o FROM documents GROUP BY 1, 2
    ), margins AS (
      SELECT source, SUM(o) AS r FROM cells GROUP BY source
    ), cols AS (
      SELECT lang, SUM(o) AS c FROM cells GROUP BY lang
    ), tot AS (SELECT SUM(o) AS n FROM cells),
    terms AS (
      SELECT CAST(floor(
                 CAST(cells.o * tot.n - margins.r * cols.c AS DOUBLE)
                 * CAST(cells.o * tot.n - margins.r * cols.c AS DOUBLE)
                 / CAST(margins.r * cols.c AS DOUBLE) / tot.n
                 * 1000000.0 + 0.5) AS BIGINT) AS term_fp
      FROM cells
      JOIN margins USING (source)
      JOIN cols USING (lang)
      CROSS JOIN tot
    ),
    agg AS (
      SELECT CAST(SUM(term_fp) AS BIGINT) AS chi2_fp FROM terms
    ),
    shape AS (
      SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS r_cats,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS c_cats,
             CAST(SUM(o) AS BIGINT) AS n
      FROM cells
    )
    SELECT chi2_fp, n, r_cats, c_cats,
           sqrt(CAST(chi2_fp AS DOUBLE) / 1000000.0 / n
                / least(r_cats - 1, c_cats - 1)) AS cramers_v
    FROM agg CROSS JOIN shape
    """,
)
def dq_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # Materialize the contingency table once: margins, cols, tot, the
    # term pass, and the shape aggregate all read it (five consumers —
    # left lazy each re-derives the documents scan+agg; r11 audit).
    cells = (
        docs.groupBy("source", "lang")
        .agg(F.count("*").alias("o"))
        .localCheckpoint(eager=True)
    )
    margins = cells.groupBy("source").agg(F.sum("o").alias("r"))
    cols = cells.groupBy("lang").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    d = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    term = d * d / (F.col("r") * F.col("c")).cast("double") / F.col("n")
    terms = (
        cells.join(F.broadcast(margins), "source")
        .join(F.broadcast(cols), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(term * 1000000.0 + F.lit(0.5)).cast("long").alias(
                "term_fp"
            )
        )
    )
    agg = terms.agg(F.sum("term_fp").cast("long").alias("chi2_fp"))
    shape = cells.agg(
        F.countDistinct("source").cast("long").alias("r_cats"),
        F.countDistinct("lang").cast("long").alias("c_cats"),
        F.sum("o").cast("long").alias("n"),
    )
    return agg.crossJoin(F.broadcast(shape)).select(
        "chi2_fp",
        "n",
        "r_cats",
        "c_cats",
        F.sqrt(
            F.col("chi2_fp").cast("double")
            / F.lit(1000000.0)
            / F.col("n")
            / F.least(F.col("r_cats") - 1, F.col("c_cats") - 1)
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# SPEARMAN RANK TREND — per event_type rank correlation between value
# and event time (Spearman 1904), the robust monotone-trend test a
# quality pipeline runs where Pearson (udaf_group_ols' slope) would be
# dragged by outliers. Tie-aware: each row gets its group's DOUBLED
# centered average rank u = 2·rows_before + tie_count − n (an exact
# integer; doubling clears the (cnt+1)/2 halves, centering by (n+1)
# makes Σu = 0 exactly), and
#   ρ = Σuv / (√Σu² · √Σv²)
# — numerator/moments are exact BIGINTs, the final expression is an
# identical-operand IEEE chain. |u| ≤ n bounds every moment by n³, so
# int64 holds to n ≈ 2.09e6 rows per group (gate SFs are ≪; beyond
# that the sums move to DECIMAL(38,0), the ts_zband discipline).
#
# Scale: ranks are assigned TWO-LEVEL (bucket on a key prefix +
# exclusive prefix-sum of bucket counts — the dq_iqr/epoch-shuffle
# discipline), with both window passes running over the DISTINCT-value
# table, never a whole sorted group; the per-value u maps join back
# broadcast-style and one hash aggregate emits the moments.
# ---------------------------------------------------------------------------
@register(
    "dq_spearman_trend",
    oracle="""
    WITH r AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS xv,
             epoch_us(ts) AS yv
      FROM events
    ),
    n AS (SELECT event_type, COUNT(*) AS n FROM r GROUP BY 1),
    u AS (
      SELECT event_type,
             2 * (RANK() OVER (PARTITION BY event_type ORDER BY xv) - 1)
               + COUNT(*) OVER (PARTITION BY event_type, xv) AS dx,
             2 * (RANK() OVER (PARTITION BY event_type ORDER BY yv) - 1)
               + COUNT(*) OVER (PARTITION BY event_type, yv) AS dy
      FROM r
    ),
    s AS (
      SELECT u.event_type,
             CAST(MAX(n.n) AS BIGINT) AS n_events,
             CAST(SUM((dx - n.n) * (dy - n.n)) AS BIGINT) AS suv,
             CAST(SUM((dx - n.n) * (dx - n.n)) AS BIGINT) AS su2,
             CAST(SUM((dy - n.n) * (dy - n.n)) AS BIGINT) AS sv2
      FROM u JOIN n USING (event_type)
      GROUP BY u.event_type
    )
    SELECT event_type, n_events, suv, su2, sv2,
           CASE WHEN su2 = 0 OR sv2 = 0 THEN 0.0
                ELSE CAST(suv AS DOUBLE)
                     / sqrt(CAST(su2 AS DOUBLE))
                     / sqrt(CAST(sv2 AS DOUBLE)) END AS spearman_rho
    FROM s
    ORDER BY event_type
    """,
)
def dq_spearman_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from fluent_bit_filter_math_spark.functions import exact_cents

    ev = table(spark, sf_dir, "events")
    rows = ev.select(
        "event_type",
        exact_cents(F.col("value")).alias("xv"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("yv"),
    )
    totals = rows.groupBy("event_type").agg(F.count("*").alias("n"))

    def _dranks(col: str, shift: int) -> DataFrame:
        """(event_type, <col>, dr) — dr = 2·rows_before + tie_count,
        assigned two-level over the distinct-value table."""
        vals = (
            rows.groupBy("event_type", col)
            .agg(F.count("*").alias("cnt"))
            .withColumn("bucket", F.shiftright(F.col(col), shift))
        )
        bcounts = vals.groupBy("event_type", "bucket").agg(
            F.sum("cnt").alias("bn")
        )
        wpre = (
            Window.partitionBy("event_type")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = bcounts.select(
            "event_type",
            "bucket",
            F.coalesce(F.sum("bn").over(wpre), F.lit(0)).alias("offset"),
        )
        wib = (
            Window.partitionBy("event_type", "bucket")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            vals.join(F.broadcast(offsets), ["event_type", "bucket"])
            .select(
                "event_type",
                col,
                (
                    2
                    * (
                        F.col("offset")
                        + F.coalesce(F.sum("cnt").over(wib), F.lit(0))
                    )
                    + F.col("cnt")
                ).alias(f"dr_{col}"),
            )
        )

    joined = (
        rows.join(_dranks("xv", 6), ["event_type", "xv"])
        .join(_dranks("yv", 32), ["event_type", "yv"])
        .join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            (F.col("dr_xv") - F.col("n")).alias("ux"),
            (F.col("dr_yv") - F.col("n")).alias("uy"),
            "n",
        )
    )
    s = joined.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"),
        F.sum(F.col("ux") * F.col("uy")).cast("long").alias("suv"),
        F.sum(F.col("ux") * F.col("ux")).cast("long").alias("su2"),
        F.sum(F.col("uy") * F.col("uy")).cast("long").alias("sv2"),
    )
    rho = F.when(
        (F.col("su2") == 0) | (F.col("sv2") == 0), F.lit(0.0)
    ).otherwise(
        F.col("suv").cast("double")
        / F.sqrt(F.col("su2").cast("double"))
        / F.sqrt(F.col("sv2").cast("double"))
    )
    return s.select(
        "event_type", "n_events", "suv", "su2", "sv2",
        rho.alias("spearman_rho"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# DISTINCT ℓ-DIVERSITY — the release-gate check k-anonymity alone
# cannot give (Machanavajjhala et al., ICDE'06): a QI class can be
# large (k-anonymous) yet have every member share one sensitive value,
# so membership still discloses it (the homogeneity attack). Audited
# here with dq_k_anonymity's QI pair (nation, market segment) and the
# account-balance $2000 band as the sensitive attribute: per class,
# ℓ = COUNT(DISTINCT band); classes below ℓ_min are emitted alongside
# the global minimum and rows-at-risk totals.
#
# Determinism: the band is integer cents div 200000 (both engines
# truncate toward zero, exercised on negative balances); everything
# else is exact counting.
#
# Scale: one (QI, band) hash aggregate, one QI re-aggregate, one 1-row
# broadcast-back — the k-anonymity shape with a distinct layer, all
# partial-aggregatable, class count bounded by the QI domain.
# ---------------------------------------------------------------------------
_LDIV_MIN = 5


@register(
    "dq_l_diversity",
    oracle=f"""
    WITH bands AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) // 200000
                 AS band,
             COUNT(*) AS n
      FROM customer
      GROUP BY 1, 2, 3
    ),
    classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(SUM(n) AS BIGINT) AS class_size,
             CAST(COUNT(*) AS BIGINT) AS l_distinct
      FROM bands GROUP BY 1, 2
    ),
    summary AS (
      SELECT CAST(MIN(l_distinct) AS BIGINT) AS l_diversity,
             CAST(SUM(CASE WHEN l_distinct < {_LDIV_MIN} THEN 1 ELSE 0 END)
                  AS BIGINT) AS risky_classes,
             CAST(SUM(CASE WHEN l_distinct < {_LDIV_MIN}
                           THEN class_size ELSE 0 END) AS BIGINT)
                 AS rows_at_risk
      FROM classes
    )
    SELECT c.c_nationkey, c.c_mktsegment, c.class_size, c.l_distinct,
           s.l_diversity, s.risky_classes, s.rows_at_risk
    FROM classes c, summary s
    WHERE c.l_distinct < {_LDIV_MIN}
    ORDER BY c.c_nationkey, c.c_mktsegment
    """,
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.functions import exact_cents

    cust = table(spark, sf_dir, "customer")
    bands = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "cast(floor(c_acctbal * 100.0 + 0.5) as bigint) div 200000"
        ).alias("band"),
    ).groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count("*").alias("n")
    )
    classes = bands.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").cast("long").alias("class_size"),
        F.count("*").cast("long").alias("l_distinct"),
    )
    summary = classes.agg(
        F.min("l_distinct").cast("long").alias("l_diversity"),
        F.sum((F.col("l_distinct") < _LDIV_MIN).cast("long"))
        .cast("long")
        .alias("risky_classes"),
        F.sum(
            F.when(F.col("l_distinct") < _LDIV_MIN, F.col("class_size"))
            .otherwise(0)
        )
        .cast("long")
        .alias("rows_at_risk"),
    )
    return (
        classes.filter(F.col("l_distinct") < _LDIV_MIN)
        .crossJoin(F.broadcast(summary))
        .select(
            "c_nationkey", "c_mktsegment", "class_size", "l_distinct",
            "l_diversity", "risky_classes", "rows_at_risk",
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# CALENDAR-GAP AUDIT — missing ingest days per order priority: the
# completeness check a daily-partitioned warehouse runs before trusting
# any trailing-window metric (dq_volume_anomaly_days assumes the days
# EXIST; this finds the ones that don't). Expected domain is the
# per-group [min_day, max_day] integer span; observed is the distinct
# day set; also reported: the LONGEST consecutive missing run (the
# outage, not just its total).
#
# Determinism: days are exact integer epoch-µs div 86.4e9; counting
# only. Scale: one (group, day) aggregate, one group aggregate, and a
# lag window over OBSERVED-day rows (≤ span-sized, never raw orders);
# no day-domain explode is materialized — expected/missing come from
# span arithmetic, so a 10-year × million-group audit stays
# aggregate-sized.
# ---------------------------------------------------------------------------
@register(
    "dq_missing_dates",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority AS grp,
             epoch_us(o_orderdate) // 86400000000 AS dd
      FROM orders GROUP BY 1, 2
    ),
    gaps AS (
      SELECT grp, dd,
             dd - lag(dd) OVER (PARTITION BY grp ORDER BY dd) - 1 AS gap
      FROM d
    )
    SELECT grp AS o_orderpriority,
           CAST(MIN(dd) AS BIGINT) AS min_day,
           CAST(MAX(dd) AS BIGINT) AS max_day,
           CAST(MAX(dd) - MIN(dd) + 1 AS BIGINT) AS expected_days,
           CAST(COUNT(*) AS BIGINT) AS observed_days,
           CAST(MAX(dd) - MIN(dd) + 1 - COUNT(*) AS BIGINT)
               AS missing_days,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS longest_gap_days
    FROM gaps
    GROUP BY grp
    ORDER BY grp
    """,
)
def dq_missing_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    d = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("dd"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("dd")
    gaps = d.select(
        "grp", "dd", (F.col("dd") - F.lag("dd").over(w) - 1).alias("gap")
    )
    return (
        gaps.groupBy("grp")
        .agg(
            F.min("dd").cast("long").alias("min_day"),
            F.max("dd").cast("long").alias("max_day"),
            (F.max("dd") - F.min("dd") + 1).cast("long").alias(
                "expected_days"
            ),
            F.count("*").cast("long").alias("observed_days"),
            (F.max("dd") - F.min("dd") + 1 - F.count("*"))
            .cast("long")
            .alias("missing_days"),
            F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias(
                "longest_gap_days"
            ),
        )
        .select(
            F.col("grp").alias("o_orderpriority"),
            "min_day", "max_day", "expected_days", "observed_days",
            "missing_days", "longest_gap_days",
        )
        .orderBy("o_orderpriority")
    )
