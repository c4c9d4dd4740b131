"""Sketch-based approximate/exact summary operators.

Absent from the reference (no cross-record state — math.h:46-55 holds
only config); these are the fixed-size-summary extensions every
large-scale pipeline leans on when exact per-key state stops fitting:

* ``sketch_cms_heavy_hitters`` — a Count-Min sketch (Cormode &
  Muthukrishnan, J. Algorithms 2005): D hash rows × W counters ingest
  the stream in ONE map-side-combined aggregate whose output is D·W
  rows **regardless of key cardinality** — the whole point at 100 TB,
  where a per-key exact count is its own giant shuffle but the sketch
  is a constant-size object you can broadcast, merge across days, or
  ship to a dashboard. Estimates (min over rows) upper-bound true
  counts; the query surfaces the heavy hitters with both numbers so
  the overestimate is itself oracle-checked. Because the hash is the
  engine-portable md5-based ``hash60``, the ENTIRE sketch — counters,
  estimates, over-counts — is deterministic and replicated exactly by
  the DuckDB oracle: no error-contract weakening needed.

* ``sketch_bitmap_distinct`` — exact COUNT(DISTINCT) via Spark's
  bitmap aggregates (``bitmap_bucket_number`` / ``bitmap_bit_position``
  / ``bitmap_construct_agg`` / ``bitmap_count``): keys become set bits
  in per-(group, bucket) fixed-width bitmaps, so the shuffle carries
  one ≤4 KB bitmap per 32768-key bucket instead of one row per
  distinct key — the roaring-bitmap distinct shape engines (Druid,
  ClickHouse, Databricks) use when count-distinct shuffles dominate.
  Two-level: construct per bucket, then SUM the per-bucket exact
  cardinalities. Output is exact, so the oracle is plain
  COUNT(DISTINCT).

Scale notes: the CMS probe side joins the D·W-row sketch BROADCAST —
never a shuffle of the stream; the only stream-sized aggregate is the
per-key exact count the query needs anyway to certify the estimate
(a production deployment would skip it and keep only the sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.functions import duck_hash60, hash60
from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

CMS_W = 64  # counters per hash row
CMS_D = 3  # independent hash rows
CMS_FRAC = 50  # heavy hitter = count ≥ N / CMS_FRAC


def _cms_pos(d: F.Column, key: F.Column) -> F.Column:
    """Row-d counter index of a key: hash60('d:key') mod W."""
    return F.pmod(
        hash60(F.concat(d.cast("string"), F.lit(":"), key.cast("string"))),
        F.lit(CMS_W),
    )


def _duck_cms_pos(d_expr: str, key_expr: str) -> str:
    h = duck_hash60(
        f"CAST({d_expr} AS VARCHAR) || ':' || CAST({key_expr} AS VARCHAR)"
    )
    return f"({h} % {CMS_W})"


@register(
    "sketch_cms_heavy_hitters",
    oracle=f"""
    WITH ev AS (SELECT user_id FROM events),
    n AS (SELECT COUNT(*) AS total FROM ev),
    fan AS (
      SELECT user_id, d FROM ev, UNNEST([0, 1, 2]) t(d)
    ),
    sketch AS (
      SELECT d, {_duck_cms_pos('d', 'user_id')} AS pos,
             CAST(COUNT(*) AS BIGINT) AS counter
      FROM fan GROUP BY 1, 2
    ),
    exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM ev GROUP BY 1
    ),
    probe AS (
      SELECT e.user_id, e.true_count, s.counter
      FROM exact e, UNNEST([0, 1, 2]) t(d)
      JOIN sketch s
        ON s.d = t.d AND s.pos = {_duck_cms_pos('t.d', 'e.user_id')}
    ),
    est AS (
      SELECT user_id,
             MAX(true_count) AS true_count,
             MIN(counter) AS cms_estimate
      FROM probe GROUP BY user_id
    )
    SELECT user_id, true_count, cms_estimate,
           cms_estimate - true_count AS overcount
    FROM est, n
    WHERE cms_estimate >= total // {CMS_FRAC}
    ORDER BY user_id
    """,
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id")
    total = ev.agg(F.count("*").alias("total"))

    # One-pass sketch ingest: fan each record out to its D counter
    # cells map-side; the aggregate's map-side combine means the
    # shuffle carries ≤ D·W partial rows per input partition.
    d_arr = F.array(*[F.lit(i) for i in range(CMS_D)])
    sketch = (
        ev.select("user_id", F.explode(d_arr).alias("d"))
        .select("d", _cms_pos(F.col("d"), F.col("user_id")).alias("pos"))
        .groupBy("d", "pos")
        .agg(F.count("*").alias("counter"))
    )

    exact = ev.groupBy("user_id").agg(F.count("*").alias("true_count"))
    probe = (
        exact.select("user_id", "true_count", F.explode(d_arr).alias("d"))
        .withColumn("pos", _cms_pos(F.col("d"), F.col("user_id")))
        .join(F.broadcast(sketch), ["d", "pos"])
    )
    est = probe.groupBy("user_id").agg(
        F.max("true_count").alias("true_count"),
        F.min("counter").alias("cms_estimate"),
    )
    return (
        est.crossJoin(F.broadcast(total))
        .filter(
            F.col("cms_estimate") >= F.floor(F.col("total") / CMS_FRAC)
        )
        .select(
            "user_id",
            "true_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("true_count")).alias("overcount"),
        )
        .orderBy("user_id")
    )


@register(
    "sketch_bitmap_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def sketch_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    # Level 1: one ≤4 KB bitmap per (group, 32768-key bucket); the
    # construct aggregate combines map-side, so the shuffle moves
    # bitmaps, not keys.
    buckets = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bucket")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        ),
        F.count("*").alias("n_events"),
    )
    # Level 2: per-bucket popcounts sum to the exact distinct count.
    return (
        buckets.groupBy("event_type")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).alias("n_users"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Streaming CMS — the same Count-Min sketch maintained INCREMENTALLY
# across micro-batches: the counter matrix is streaming aggregation
# state (complete mode — the output table IS the current sketch), so
# every trigger updates D·W counters and the sketch is queryable at
# any moment without reprocessing history. This is the production
# shape for "heavy hitters over a live stream" — state size is fixed
# at D·W rows whatever the key cardinality or stream length, the
# property that makes the sketch the streaming-state answer where an
# exact per-key count would grow without bound. After the bounded
# availableNow replay the final counters must equal the batch-built
# sketch exactly — the oracle rebuilds them from the same records.
# ---------------------------------------------------------------------------
@register(
    "stream_cms_sketch",
    oracle=f"""
    WITH fan AS (
      SELECT user_id, d FROM events, UNNEST([0, 1, 2]) t(d)
    )
    SELECT d, {_duck_cms_pos('d', 'user_id')} AS pos,
           CAST(COUNT(*) AS BIGINT) AS counter
    FROM fan GROUP BY 1, 2
    ORDER BY d, pos
    """,
)
def stream_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.pipeline import (
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(
        spark, f"{sf_dir}/events.parquet", drop_nanos=True
    )
    d_arr = F.array(*[F.lit(i) for i in range(CMS_D)])
    counters = (
        stream.select(F.col("user_id"), F.explode(d_arr).alias("d"))
        .select("d", _cms_pos(F.col("d"), F.col("user_id")).alias("pos"))
        .groupBy("d", "pos")
        .agg(F.count("*").alias("counter"))
    )
    out = run_stream_to_memory(
        counters,
        "stream_cms_sketch",
        output_mode="complete",
        shuffle_partitions=4,
    )
    return out.orderBy("d", "pos")


# ---------------------------------------------------------------------------
# Mergeable HLL sketches — the property that makes sketches the
# distributed answer: build Apache DataSketches HLL sketches on two
# DISJOINT halves of the stream (think: two days, two clusters, two
# regions), hll_union them, and the estimate must equal the single
# sketch built over everything — register-wise max is lossless at
# equal lgK, so partial sketches roll up across any partitioning /
# time hierarchy without re-reading data. That algebraic-merge
# contract (merged ≡ direct, bit-for-bit at fixed input) plus the
# usual error contract vs the exact count are the oracle-checkable
# observables (the agg_approx_distinct discipline — estimates
# themselves are engine-specific).
# ---------------------------------------------------------------------------
@register(
    "sketch_hll_mergeable",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS merge_lossless,
           TRUE AS approx_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    h1 = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("s1"))
    )
    h2 = (
        ev.filter(F.col("event_id") % 2 == 1)
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("s2"))
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_d"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    # Full outer: a group whose events all share one event_id parity
    # exists in only one half — its merge partner is the EMPTY sketch,
    # i.e. the present side alone (an inner join would silently drop
    # the group while the oracle still emits it).
    merged = h1.join(h2, "event_type", "full_outer").select(
        "event_type",
        F.hll_sketch_estimate(
            F.when(
                F.col("s1").isNotNull() & F.col("s2").isNotNull(),
                F.hll_union("s1", "s2"),
            )
            .when(F.col("s1").isNotNull(), F.col("s1"))
            .otherwise(F.col("s2"))
        ).alias("est_m"),
    )
    j = direct.join(merged, "event_type")
    rel_err = F.abs(F.col("est_m") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return j.select(
        "event_type",
        "exact_users",
        (F.col("est_m") == F.col("est_d")).alias("merge_lossless"),
        (rel_err <= 0.15).alias("approx_ok"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters — the deterministic counter-based sketch
# (Misra & Gries 1982; "space-saving" is its cousin) the CMS above
# complements: k counters per partition, decrement-on-overflow, with
# the guarantee that any item of global frequency ≥ n/K survives in at
# least one partition's sketch (pigeonhole: Σf_p ≥ Σn_p/K forces
# f_p ≥ n_p/K somewhere, and MG with K counters keeps every item of
# local frequency > n_p/(K+1)).
#
# Two-stage shape — the one that matters at 100 TB:
#   1. per-partition MG(K) summaries (applyInPandas over
#      spark_partition_id groups): K counters each, WHATEVER the key
#      cardinality — the candidate union is ≤ K·partitions rows;
#   2. exact verification: the tiny candidate set broadcast-semi-joins
#      back, one exact count over candidates only, filter K·n ≥ total.
# The emitted set is therefore EXACTLY the items with frequency
# ≥ total/K — partition-layout-independent (stage 1 only needs to be
# a superset, which the guarantee provides for any partitioning), so
# a plain GROUP BY / HAVING oracle verifies a genuinely probabilistic-
# looking pipeline bitwise. A production run keeps stage 1 only and
# accepts the ε = n_p/(K+1) undercount; the exact pass here is what
# makes the operator oracle-gated.
# ---------------------------------------------------------------------------
_MG_K = 30  # counters per partition == the 1/K heavy-hitter threshold


def _mg_kernel(pdf):
    import pandas as pd

    counters: dict[str, int] = {}
    # Weighted MG: fold each distinct word's in-partition count in one
    # step; on overflow subtract the minimum counter from all (the
    # batched form of k decrements), dropping zeros.
    for w, c in pdf["word"].value_counts().items():
        counters[w] = counters.get(w, 0) + int(c)
        if len(counters) > _MG_K:
            m = min(counters.values())
            counters = {k: v - m for k, v in counters.items() if v > m}
    return pd.DataFrame({"word": list(counters.keys())})


@register(
    "sketch_heavy_hitters_mg",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    c AS (SELECT word, COUNT(*) AS n FROM w GROUP BY word),
    t AS (SELECT SUM(n) AS tot FROM c)
    SELECT word, CAST(n AS BIGINT) AS n
    FROM c, t
    WHERE n * {_MG_K} >= tot
    """,
)
def sketch_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
    )
    summaries = (
        words.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .applyInPandas(
            lambda _key, pdf: _mg_kernel(pdf), schema="word string"
        )
    )
    candidates = summaries.select("word").distinct()
    exact = (
        words.join(F.broadcast(candidates), "word", "left_semi")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    total = words.count()
    return exact.filter(F.col("n") * _MG_K >= F.lit(total))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — Bar-Yossef et al. 2002,
# the third distinct-count regime next to the exact bitmap and the
# DataSketches HLL above: keep only the K smallest hash values ever
# seen per group; the Kth smallest h_K estimates the cardinality as
# (K−1)·M/h_K (hashes uniform on [0, M)). The sketch is K integers
# whatever the cardinality, merges by "union then re-take K smallest"
# (an order statistic — associative, commutative, idempotent, so
# cross-day/cross-cluster rollups are lossless by construction), and —
# uniquely among the estimating sketches — is fully DETERMINISTIC
# given the hash: built on a 56-bit slice of the portable md5 hash, the DuckDB
# oracle reproduces every kept hash, the Kth value, and the integer
# estimate bit-for-bit. No error-contract weakening, no banding: the
# estimator itself is under the bitwise gate, alongside an exact
# count and the |est − exact| ≤ 30% acceptance bound the HLL query
# established as house style.
#
# Scale: one hash projection (map-side), one DISTINCT on (group,
# hash) — cardinality-bounded, never row-bounded — then a K-row
# window per group; the shuffled payload is min(K, distinct) rows per
# group. Exact count rides along only to certify the estimate.
# ---------------------------------------------------------------------------
_KMV_K = 64
# 56-bit hash domain (14 md5 hex chars): (K−1)·M = 63·2^56 ≈ 4.5e18
# stays inside int64, so the estimator is EXACT integer arithmetic in
# both engines — the 60-bit domain would overflow the product.
_KMV_M = 1 << 56


@register(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14)
                  AS BIGINT) AS hv
      FROM events
    ),
    ranked AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv)
                 AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_distinct
      FROM h
    ),
    kth AS (
      SELECT event_type, n_distinct, hv AS h_k
      FROM ranked
      WHERE rn = LEAST({_KMV_K}, n_distinct)
    )
    SELECT event_type,
           CAST(n_distinct AS BIGINT) AS exact_users,
           CAST(CASE WHEN n_distinct < {_KMV_K} THEN n_distinct
                ELSE ({_KMV_K} - 1) * {_KMV_M} // h_k END AS BIGINT)
               AS kmv_estimate,
           CAST(abs(CASE WHEN n_distinct < {_KMV_K} THEN n_distinct
                     ELSE ({_KMV_K} - 1) * {_KMV_M} // h_k END
                    - n_distinct) * 100 <= 30 * n_distinct
                AS BOOLEAN) AS approx_ok
    FROM kth
    ORDER BY event_type
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from fluent_bit_filter_math_spark.sources import table

    h = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 14),
                16, 10,
            ).cast("long").alias("hv"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("hv")
    wn = Window.partitionBy("event_type")
    ranked = h.select(
        "event_type",
        "hv",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n_distinct"),
    )
    kth = ranked.filter(
        F.col("rn") == F.least(F.lit(_KMV_K), F.col("n_distinct"))
    )
    est = F.when(
        F.col("n_distinct") < _KMV_K, F.col("n_distinct")
    ).otherwise(
        F.expr(f"({_KMV_K} - 1) * {_KMV_M} div hv")
    )
    return kth.select(
        "event_type",
        F.col("n_distinct").cast("long").alias("exact_users"),
        est.cast("long").alias("kmv_estimate"),
        (
            F.abs(est - F.col("n_distinct")) * 100
            <= F.col("n_distinct") * 30
        ).alias("approx_ok"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# THETA-sketch set algebra (Dasgupta, Lang, Rhodes & Thaler, "Theta-
# Sketch Framework", 2016 — the Apache DataSketches union/intersect/
# a-not-b model). KMV above answers "how many distinct"; the theta
# framework answers SET-EXPRESSION cardinalities from the sketches
# alone: with per-set samples S = {k smallest hashes} and per-set
# thresholds theta (the k-th smallest, M when the set is smaller than
# k), any union/intersection/difference is estimated by clipping every
# participating sample to th = min(theta_i) and counting:
# est = |clipped sample of the expression| * M / th. The reference has
# no sketches at all (math.c folds raw numerics); this is the
# mergeable-summary algebra a 100 TB overlap/attribution report runs
# instead of a full distinct join.
#
# Determinism: same 56-bit md5 domain as KMV (exact BIGINT
# arithmetic, count*M stays < 2^63); sketch build is orderBy+limit —
# Spark compiles it to TakeOrderedAndProject (per-partition top-k,
# merge of k-row heads; no full sort, no full shuffle) which is the
# scale path; every downstream step touches only <= k-row inputs, all
# broadcast. approx_ok bounds are loose 3-sigma envelopes (RSE ~
# 1/sqrt(k-1) ~ 12.6% for the union; wider for intersection/
# difference whose error scales with 1/overlap-fraction) — and both
# engines compute the identical booleans regardless.
# ---------------------------------------------------------------------------
_TH_K = 64
_TH_M = 1 << 56


@register(
    "sketch_theta_set_ops",
    oracle=f"""
    WITH ha AS (
      SELECT DISTINCT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                           1, 14) AS BIGINT) AS hv
      FROM events WHERE event_type = 'click'
    ), hb AS (
      SELECT DISTINCT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                           1, 14) AS BIGINT) AS hv
      FROM events WHERE event_type = 'purchase'
    ),
    sa AS (SELECT hv FROM ha ORDER BY hv LIMIT {_TH_K}),
    sb AS (SELECT hv FROM hb ORDER BY hv LIMIT {_TH_K}),
    ta AS (SELECT CASE WHEN COUNT(*) = {_TH_K} THEN MAX(hv)
                       ELSE {_TH_M} END AS th_a FROM sa),
    tb AS (SELECT CASE WHEN COUNT(*) = {_TH_K} THEN MAX(hv)
                       ELSE {_TH_M} END AS th_b FROM sb),
    th AS (SELECT LEAST(th_a, th_b) AS th FROM ta, tb),
    cu AS (SELECT COUNT(*) AS n FROM
             (SELECT hv FROM sa UNION SELECT hv FROM sb) s, th
           WHERE s.hv < th.th),
    ci AS (SELECT COUNT(*) AS n FROM sa, th
           WHERE sa.hv < th.th AND sa.hv IN (SELECT hv FROM sb)),
    cd AS (SELECT COUNT(*) AS n FROM sa, th
           WHERE sa.hv < th.th AND sa.hv NOT IN (SELECT hv FROM sb)),
    ea AS (SELECT COUNT(DISTINCT user_id) AS n FROM events
           WHERE event_type IN ('click', 'purchase')),
    ei AS (SELECT COUNT(*) AS n FROM
             (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
             a
           WHERE a.user_id IN (SELECT user_id FROM events
                               WHERE event_type = 'purchase')),
    ed AS (SELECT COUNT(*) AS n FROM
             (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
             a
           WHERE a.user_id NOT IN (SELECT user_id FROM events
                                   WHERE event_type = 'purchase'))
    SELECT CAST(cu.n * {_TH_M} // th.th AS BIGINT) AS est_union,
           CAST(ea.n AS BIGINT) AS exact_union,
           CAST(ci.n * {_TH_M} // th.th AS BIGINT) AS est_inter,
           CAST(ei.n AS BIGINT) AS exact_inter,
           CAST(cd.n * {_TH_M} // th.th AS BIGINT) AS est_diff,
           CAST(ed.n AS BIGINT) AS exact_diff,
           (abs(cu.n * {_TH_M} // th.th - ea.n) * 100 <= 40 * ea.n)
               AS union_ok,
           (abs(ci.n * {_TH_M} // th.th - ei.n) * 100 <= 60 * ei.n)
               AS inter_ok
    FROM cu, ci, cd, ea, ei, ed, th
    """,
)
def sketch_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")

    def hset(etype: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .select(
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 14
                    ),
                    16, 10,
                ).cast("long").alias("hv")
            )
            .distinct()
        )

    # Sketch build: TakeOrderedAndProject per set (per-partition top-k,
    # k-row merge). The sketches ARE the driver-sized summary — the
    # set algebra below runs on the collected <=k-row payloads, which
    # is exactly how a DataSketches-style coordinator merges partials
    # (and what collapsed this plan from 23 shuffles to the 2 sketch
    # builds + 3 exact-count aggregates).
    sa = {r["hv"] for r in hset("click").orderBy("hv").limit(_TH_K).collect()}
    sb = {
        r["hv"]
        for r in hset("purchase").orderBy("hv").limit(_TH_K).collect()
    }
    th_a = max(sa) if len(sa) >= _TH_K else _TH_M
    th_b = max(sb) if len(sb) >= _TH_K else _TH_M
    th = min(th_a, th_b)
    cu = sum(1 for h in sa | sb if h < th)
    ci = sum(1 for h in sa & sb if h < th)
    cd = sum(1 for h in sa - sb if h < th)
    est = lambda n: n * _TH_M // th

    ua = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    ub = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    ea = ua.union(ub).distinct().agg(F.count("*").alias("ea"))
    ei = ua.join(ub, "user_id", "left_semi").agg(F.count("*").alias("ei"))
    ed = ua.join(ub, "user_id", "left_anti").agg(F.count("*").alias("ed"))

    return (
        ea.crossJoin(ei)
        .crossJoin(ed)
        .select(
            F.lit(est(cu)).cast("long").alias("est_union"),
            F.col("ea").cast("long").alias("exact_union"),
            F.lit(est(ci)).cast("long").alias("est_inter"),
            F.col("ei").cast("long").alias("exact_inter"),
            F.lit(est(cd)).cast("long").alias("est_diff"),
            F.col("ed").cast("long").alias("exact_diff"),
            (F.abs(F.lit(est(cu)) - F.col("ea")) * 100 <= 40 * F.col("ea"))
            .alias("union_ok"),
            (F.abs(F.lit(est(ci)) - F.col("ei")) * 100 <= 60 * F.col("ei"))
            .alias("inter_ok"),
        )
    )


# ---------------------------------------------------------------------------
# AMS F₂ SKETCH — the Alon-Matias-Szegedy second-frequency-moment
# estimator (STOC'96, the result that started streaming sketches): R
# independent ±1 hash projections; each replica keeps the single
# counter Z_r = Σ_v f_v·sign_r(v), and E[Z_r²] = F₂ = Σ_v f_v². The
# query ingests events ONCE with R = 17 sign-sums in one map-side-
# combined aggregate (per-row work, constant 17-counter state — the
# mergeable-sketch shape), takes the MEDIAN of the squared replicas
# (odd R → an exact order statistic, no averaging), and certifies it
# against the exact F₂ over user_id frequencies. sign_r comes from the
# portable md5 hash60, so the oracle replays the sketch itself —
# counters, median, error — bit-for-bit (the CMS/KMV discipline).
#
# Scale: the sketch side never shuffles rows — 17 BIGINTs per
# partition merge associatively (this is what you'd broadcast/merge
# across 100 TB shards); the exact side is one count-per-key aggregate
# kept only to certify the estimate under the gate.
# ---------------------------------------------------------------------------
_AMS_R = 17


def _ams_sign_sql(r: int) -> str:
    h = duck_hash60(f"'ams{r}:' || CAST(user_id AS VARCHAR)")
    return f"SUM(1 - 2 * ({h} % 2))"


@register(
    "sketch_ams_f2",
    oracle=f"""
    WITH z AS (
      SELECT {", ".join(f"{_ams_sign_sql(r)} AS z{r}" for r in range(_AMS_R))},
             COUNT(*) AS n
      FROM events
    ),
    est AS (
      SELECT n,
             list_sort([{", ".join(f"z{r} * z{r}" for r in range(_AMS_R))}])
               AS sq
      FROM z
    ),
    exact AS (
      SELECT SUM(f * f) AS f2
      FROM (SELECT COUNT(*) AS f FROM events GROUP BY user_id)
    )
    SELECT CAST(e.n AS BIGINT) AS n_rows,
           CAST(x.f2 AS BIGINT) AS f2_exact,
           CAST(e.sq[{(_AMS_R + 1) // 2}] AS BIGINT) AS f2_est_median,
           CAST(e.sq[{(_AMS_R + 1) // 2}] - x.f2 AS DOUBLE) / x.f2
               AS rel_err
    FROM est e CROSS JOIN exact x
    """,
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")

    def sign(r: int):
        h = hash60(
            F.concat(F.lit(f"ams{r}:"), F.col("user_id").cast("string"))
        )
        return F.lit(1) - F.lit(2) * F.pmod(h, F.lit(2))

    # Repartition before the 17-hash-per-row sketch update (guide §2.5:
    # the 1-row-group events scan is ONE partition, so all _AMS_R·|ev|
    # md5s of the partial aggregate ran single-core; the shuffle moves
    # only the user_id column and the 17 partial sums merge to one row).
    z = (
        ev.select("user_id")
        .repartition(spark.sparkContext.defaultParallelism, "user_id")
        .agg(
            *[F.sum(sign(r)).alias(f"z{r}") for r in range(_AMS_R)],
            F.count("*").alias("n"),
        )
    )
    sq = F.sort_array(
        F.array(*[F.col(f"z{r}") * F.col(f"z{r}") for r in range(_AMS_R)])
    )
    est = z.select("n", F.element_at(sq, (_AMS_R + 1) // 2).alias("med"))
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("f"))
        .agg(F.sum(F.col("f") * F.col("f")).alias("f2"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("f2").cast("long").alias("f2_exact"),
        F.col("med").cast("long").alias("f2_est_median"),
        ((F.col("med") - F.col("f2")).cast("double") / F.col("f2")).alias(
            "rel_err"
        ),
    )


# ---------------------------------------------------------------------------
# LOG-BUCKET QUANTILE SKETCH — the DDSketch idea (Masson et al.,
# VLDB'19) at γ = 2: bucket every positive value by its binary
# magnitude (bucket = ⌊log₂ x⌋ + 1 = length(bin(x)), an EXACT integer
# via the shared bin() — no float log anywhere), keep one count per
# (group, bucket), and answer any quantile with guaranteed ≤2×
# relative error from the ~40-bucket histogram. This is the quantile
# summary that actually ships at 100 TB: the state is tiny, exactly
# mergeable (counts add), and insert is O(1) map-side — where exact
# rank selection (agg_median_disc) costs a full shuffle+rank pass.
# The query emits, per event_type and q ∈ {0.50, 0.95, 0.99}, the
# covering bucket (first with 2·cumcount ≥ 2⌈q·n⌉ — integer rank
# math) and its [2^(b−1), 2^b − 1] bounds; the ≤2× guarantee is
# structural, and every number is an exact integer.
#
# Scale: one map-side-combined (type, bucket) aggregate over the
# scan; the quantile walk runs on ≤~40 rows per type.
# ---------------------------------------------------------------------------
_DD_QS = (50, 95, 99)  # percentiles ×100 (integer rank arithmetic)


@register(
    "sketch_dd_quantiles",
    oracle=f"""
    WITH pos AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
      WHERE CAST(floor(value * 100.0 + 0.5) AS BIGINT) >= 1
    ),
    h AS (
      SELECT event_type, length(bin(cents)) AS bucket,
             COUNT(*) AS cnt
      FROM pos GROUP BY event_type, bucket
    ),
    c AS (
      SELECT event_type, bucket, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket)
                 AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM h
    ),
    q AS (
      SELECT c.*, qq.q,
             (qq.q * n + 99) // 100 AS target_rank
      FROM c CROSS JOIN (SELECT unnest([{", ".join(str(q) for q in _DD_QS)}]) AS q) qq
    )
    SELECT event_type,
           CAST(q AS BIGINT) AS pct,
           CAST(MIN(CASE WHEN cum >= target_rank THEN bucket END)
                AS BIGINT) AS bucket,
           CAST(2 ** (MIN(CASE WHEN cum >= target_rank THEN bucket END)
                      - 1) AS BIGINT) AS lo_cents,
           CAST(2 ** MIN(CASE WHEN cum >= target_rank THEN bucket END)
                - 1 AS BIGINT) AS hi_cents,
           CAST(MAX(n) AS BIGINT) AS n_pos
    FROM q
    GROUP BY event_type, q
    ORDER BY event_type, pct
    """,
)
def sketch_dd_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from fluent_bit_filter_math_spark.functions import exact_cents

    ev = table(spark, sf_dir, "events")
    cents = exact_cents(F.col("value"))
    pos = ev.select("event_type", cents.alias("cents")).filter(
        F.col("cents") >= 1
    )
    h = pos.select(
        "event_type", F.length(F.bin(F.col("cents"))).alias("bucket")
    ).groupBy("event_type", "bucket").agg(F.count("*").alias("cnt"))
    wc = Window.partitionBy("event_type").orderBy("bucket")
    wn = Window.partitionBy("event_type")
    c = h.select(
        "event_type",
        "bucket",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in _DD_QS])).alias("q")
    q = c.select("*", qs).withColumn(
        "target_rank", F.expr("(q * n + 99) div 100")
    )
    hit = F.when(F.col("cum") >= F.col("target_rank"), F.col("bucket"))
    return (
        q.groupBy("event_type", "q")
        .agg(
            F.min(hit).alias("b"),
            F.max("n").alias("n"),
        )
        .select(
            "event_type",
            F.col("q").cast("long").alias("pct"),
            F.col("b").cast("long").alias("bucket"),
            # SQL shiftleft takes a column bit count; the PySpark
            # wrapper insists on a literal int — go through expr.
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(b AS INT) - 1)"
                " AS BIGINT)"
            ).alias("lo_cents"),
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) - 1"
                " AS BIGINT)"
            ).alias("hi_cents"),
            F.col("n").cast("long").alias("n_pos"),
        )
        .orderBy("event_type", "pct")
    )
