"""Deterministic sampling operators over the ``events`` table.

Absent from the reference (it filters and folds, never samples —
/root/reference/filter_math/math.c:290-366); these are training-data
pipeline extensions: class rebalancing by stratified downsampling, and
a fixed-size per-stratum uniform sample.

Randomness is the design decision here. ``df.sample()`` draws from a
per-partition RNG — irreproducible across retries, repartitions, and
engines — which disqualifies it for pipelines that must be re-runnable
(and for this repo's DuckDB oracle). Both operators instead derive the
sampling decision from a content hash (:func:`hash60`, md5-based): a
row is in or out of the sample as a pure function of its key, so
re-running the pipeline, recovering a failed stage, or rescaling the
cluster cannot change the output. This is the industry-standard
"hash-mod sampling" used for train/test splits.

Scale design: the stratified filter is a narrow whole-stage-codegen
projection (zero shuffles — the filter reaches the scan); the
per-stratum top-k is one window over the stratum key, i.e. a single
shuffle partitioned by class — at 100 TB the per-class row_number never
materializes more than k rows per class beyond the shuffle itself, and
a two-phase per-partition pre-rank would cut even that if k stays
small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.functions import duck_hash60, hash60
from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

# Per-class keep rates in permille: keep every purchase/signup (the rare
# positives), half the clicks, a tenth of views and errors — the classic
# rebalance of an event log toward conversion-prediction training data.
SAMPLE_RATES = {
    "click": 500,
    "error": 100,
    "purchase": 1000,
    "signup": 1000,
    "view": 100,
}

_SAMPLE_KEY = "sample:"  # salt so the split is independent of other hash uses


def stratified_keep(event_id, event_type) -> F.Column:
    """True iff the row is in the sample: hash-mod-1000 under the
    per-class rate. Pure function of (event_id, event_type)."""
    bucket = F.pmod(
        hash60(F.concat(F.lit(_SAMPLE_KEY), event_id.cast("string"))),
        F.lit(1000),
    )
    rate = F.element_at(
        F.create_map(
            *[
                c
                for k, v in sorted(SAMPLE_RATES.items())
                for c in (F.lit(k), F.lit(v))
            ]
        ),
        event_type,
    )
    return bucket < rate


@register(
    "sample_stratified",
    oracle=f"""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE {duck_hash60(f"'{_SAMPLE_KEY}' || CAST(event_id AS VARCHAR)")} % 1000
          < CASE event_type
              {' '.join(f"WHEN '{k}' THEN {v}" for k, v in sorted(SAMPLE_RATES.items()))}
            END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.filter(
        stratified_keep(F.col("event_id"), F.col("event_type"))
    ).select("event_id", "user_id", "event_type", "value")


# ---------------------------------------------------------------------------
# fixed-size per-stratum sample — the k lowest-hash rows of each class.
# Equivalent to a uniform random k-sample per stratum (the hash imposes
# a random-but-fixed total order), with none of reservoir sampling's
# sequential state: it is one window, fully parallel, and deterministic.
# ---------------------------------------------------------------------------
SAMPLE_K = 20


@register(
    "sample_per_stratum_topk",
    oracle=f"""
    SELECT event_id, event_type,
           CAST(rn AS BIGINT) AS sample_rank
    FROM (
      SELECT event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY {duck_hash60(f"'{_SAMPLE_KEY}' || CAST(event_id AS VARCHAR)")},
                        event_id
             ) AS rn
      FROM events
    )
    WHERE rn <= {SAMPLE_K}
    """,
)
def sample_per_stratum_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    h = hash60(F.concat(F.lit(_SAMPLE_KEY), F.col("event_id").cast("string")))
    w = Window.partitionBy("event_type").orderBy(h.asc(), F.col("event_id").asc())
    return (
        ev.select(
            "event_id",
            "event_type",
            F.row_number().over(w).cast("long").alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= SAMPLE_K)
    )


# ---------------------------------------------------------------------------
# Train/val/test split assignment — the canonical corpus partition,
# same hash-mod discipline: the split is a pure function of doc_id, so
# retries, repartitions, and engine swaps can never move a document
# across splits (the property that prevents test-set leakage when a
# pipeline is re-run incrementally). Narrow projection, zero shuffle;
# at 100 TB this is the expression you `partitionBy("split")` on when
# writing the shards.
# ---------------------------------------------------------------------------
SPLIT_KEY = "split:"
TRAIN_PERMILLE = 800  # <800 train, <900 val, else test
VAL_PERMILLE = 900


@register(
    "sample_split_assign",
    oracle=f"""
    SELECT doc_id,
           CAST({duck_hash60(f"'{SPLIT_KEY}' || CAST(doc_id AS VARCHAR)")}
                % 1000 AS BIGINT) AS bucket,
           CASE
             WHEN {duck_hash60(f"'{SPLIT_KEY}' || CAST(doc_id AS VARCHAR)")}
                  % 1000 < {TRAIN_PERMILLE} THEN 'train'
             WHEN {duck_hash60(f"'{SPLIT_KEY}' || CAST(doc_id AS VARCHAR)")}
                  % 1000 < {VAL_PERMILLE} THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bucket = F.pmod(
        hash60(F.concat(F.lit(SPLIT_KEY), F.col("doc_id").cast("string"))),
        F.lit(1000),
    )
    b = docs.select("doc_id", bucket.alias("bucket"))
    return b.select(
        "doc_id",
        "bucket",
        F.when(F.col("bucket") < TRAIN_PERMILLE, "train")
        .when(F.col("bucket") < VAL_PERMILLE, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Domain-mixture resampling — downsample each domain so the surviving
# corpus matches a declared target mixture (the "domain weights" step of
# every pretraining data recipe). The largest feasible corpus under the
# target shares is n_target = min_s(n_s / share_s); each domain then
# keeps rate_s = share_s * n_target / n_s of its documents (rate 1.0
# for the binding domain), selected by the same hash-mod discipline as
# the other samplers, so the draw is reproducible and engine-agnostic.
#
# Scale: per-domain counts are one tiny hash aggregate (#domains rows);
# the rate table derives from it with two scalar reductions and is
# broadcast back — the corpus itself sees only a broadcast join and a
# stateless hash filter, zero corpus-sized shuffles. The fixture's
# target weights favour src0-src9 2:1 over src10-src19.
# ---------------------------------------------------------------------------
def _mixture_rates(counts, weight_col):
    """shares → corpus cap → per-domain keep rates, shared by both
    mixture samplers (fixed-weight and temperature). `counts` has
    (domain, n_s); `weight_col` is the domain weight Column. The
    scalar reductions run as unpartitioned windows over the
    per-domain AGGREGATE (#domains rows, never corpus rows)."""
    from pyspark.sql import Window

    everything = Window.partitionBy()
    shares = counts.select(
        "domain",
        "n_s",
        (
            weight_col.cast("double")
            / F.sum(weight_col).over(everything).cast("double")
        ).alias("share"),
    )
    return shares.select(
        "domain",
        (
            F.col("share")
            * F.min(F.col("n_s") / F.col("share")).over(everything)
            / F.col("n_s")
        ).alias("mix_rate"),
    )


MIX_KEY = "mix:"
MIX_SCALE = 1_000_000
_D_MIX_W = (
    "CASE WHEN CAST(substr(source, 4) AS INT) < 10"
    " THEN CAST(2.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END"
)


@register(
    "sample_domain_mixture",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_s, {_D_MIX_W} AS w
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(w) AS sum_w FROM counts),
    shares AS (SELECT source, n_s, w / sum_w AS share FROM counts, tot),
    cap AS (SELECT MIN(n_s / share) AS n_target FROM shares),
    rates AS (
      SELECT source, share * n_target / n_s AS mix_rate FROM shares, cap
    )
    SELECT d.doc_id, d.source, r.mix_rate
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE {duck_hash60(f"'{MIX_KEY}' || CAST(doc_id AS VARCHAR)")}
          % {MIX_SCALE} < r.mix_rate * {MIX_SCALE}
    """,
)
def sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    weight = F.when(
        F.substring(F.col("domain"), 4, 10).cast("int") < 10, F.lit(2.0)
    ).otherwise(F.lit(1.0))
    counts = docs.groupBy(F.col("source").alias("domain")).agg(
        F.count("*").alias("n_s")
    ).select("domain", "n_s", weight.alias("w"))
    # exact 2.0/1.0 weights sum associatively; no fixed point needed
    rates = _mixture_rates(counts, F.col("w"))
    keep = F.pmod(
        hash60(F.concat(F.lit(MIX_KEY), F.col("doc_id").cast("string"))),
        F.lit(MIX_SCALE),
    )
    return (
        docs.join(
            F.broadcast(rates), docs["source"] == rates["domain"]
        )
        .filter(keep < F.col("mix_rate") * MIX_SCALE)
        .select("doc_id", "source", "mix_rate")
    )


# ---------------------------------------------------------------------------
# weighted Bernoulli sampling — inclusion probability proportional to a
# weight column (n_chars: longer documents are likelier kept — the
# size-biased sampling a token-budgeted subcorpus wants). Fully
# deterministic and engine-exact: the only float is the inclusion
# probability p = TARGET·w/Σw, identical two-operand IEEE arithmetic in
# both engines; the keep decision compares an integer hash bucket to
# floor(p·2³⁰) — no RNG, reproducible under re-runs and repartitioning
# (the same leak-proof property as sample_split_assign). Σw comes from
# one tiny aggregate broadcast back; the corpus side is a stateless
# filter — zero shuffles at any scale.
# ---------------------------------------------------------------------------
_W_KEY = "wsample:"
_W_TARGET = 100.0  # expected sample size
_W_BUCKETS = 1_073_741_824.0  # 2^30


@register(
    "sample_weighted_bernoulli",
    oracle=f"""
    WITH tot AS (SELECT SUM(n_chars) AS tc FROM documents)
    SELECT doc_id, n_chars
    FROM documents, tot
    WHERE {duck_hash60(f"'{_W_KEY}' || CAST(doc_id AS VARCHAR)")} % 1073741824
          < floor({_W_TARGET} * n_chars / tc * {_W_BUCKETS})
    """,
)
def sample_weighted_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tot = docs.agg(F.sum("n_chars").alias("tc"))
    bucket = F.pmod(
        hash60(F.concat(F.lit(_W_KEY), F.col("doc_id").cast("string"))),
        F.lit(1073741824),
    )
    thresh = F.floor(
        F.lit(_W_TARGET) * F.col("n_chars") / F.col("tc") * F.lit(_W_BUCKETS)
    )
    return (
        docs.join(F.broadcast(tot))
        .filter(bucket < thresh)
        .select("doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# TEMPERATURE-based domain resampling — the other canonical mixture
# shape (multilingual/CC-domain pretraining: sample domain s with
# probability ∝ n_s^τ, τ<1 flattening the head so low-resource
# domains up-weight; XLM-R's τ=0.3, mT5's τ=0.3-0.7). Unlike
# sample_domain_mixture's hand-pinned target weights, the weights
# here are DERIVED from the data. The fixture's `source` column is
# deliberately uniform (25 docs per src at sf0.01 — rates would all
# be 1.0 and the query vacuous), so the domain key is the document's
# LEADING TOKEN, which is Zipf-skewed (26 vs 5 docs across its 30
# values) — the stand-in for the language/domain field a real corpus
# buckets by. Weights are w_s = n_s^τ with τ = 0.5, i.e.
# sqrt(n_s) — chosen deliberately because IEEE-754 sqrt is correctly
# rounded and therefore bit-identical across engines, while pow(x,
# 0.3) is libm-dependent and would break the bitwise gate. The
# weights are summed in FIXED POINT (floor(sqrt·10⁶) as BIGINT):
# sqrt weights are irrational, so a plain double Σw is
# reduction-order-dependent and diverged across engines in the last
# ulp (observed 0.5 vs 0.4999999999999999); integer sums are
# associative, and every double op after them is a fixed two-operand
# chain. Keeps are
# the same hash-mod discipline as every sampler here: deterministic,
# stateless, replay/repartition-proof.
#
# Scale: identical to sample_domain_mixture — one #domains-row
# aggregate, two scalar reductions over it, a broadcast-back rate
# table, and a stateless corpus filter. Zero corpus-sized shuffles.
# ---------------------------------------------------------------------------
_TMP_KEY = "tmix:"


@register(
    "sample_temperature_mixture",
    oracle=f"""
    WITH doms AS (
      SELECT doc_id, split_part(text, ' ', 1) AS domain FROM documents
    ),
    counts AS (
      SELECT domain, COUNT(*) AS n_s,
             CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS w_fp
      FROM doms GROUP BY domain
    ),
    tot AS (SELECT SUM(w_fp) AS sum_fp FROM counts),
    shares AS (SELECT domain, n_s,
                      CAST(w_fp AS DOUBLE) / CAST(sum_fp AS DOUBLE)
                          AS share
               FROM counts, tot),
    cap AS (SELECT MIN(n_s / share) AS n_target FROM shares),
    rates AS (
      SELECT domain, n_s, share,
             share * n_target / n_s AS mix_rate FROM shares, cap
    )
    SELECT d.doc_id, d.domain, r.mix_rate
    FROM doms d JOIN rates r ON d.domain = r.domain
    WHERE {duck_hash60(f"'{_TMP_KEY}' || CAST(doc_id AS VARCHAR)")}
          % {MIX_SCALE} < r.mix_rate * {MIX_SCALE}
    """,
)
def sample_temperature_mixture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("domain"),
    )
    counts = docs.groupBy("domain").agg(F.count("*").alias("n_s")).select(
        "domain",
        "n_s",
        F.floor(F.sqrt(F.col("n_s").cast("double")) * 1000000.0)
        .cast("long")
        .alias("w_fp"),
    )
    rates = _mixture_rates(counts, F.col("w_fp"))
    keep = F.pmod(
        hash60(F.concat(F.lit(_TMP_KEY), F.col("doc_id").cast("string"))),
        F.lit(MIX_SCALE),
    )
    return (
        docs.join(F.broadcast(rates), "domain")
        .filter(keep < F.col("mix_rate") * MIX_SCALE)
        .select("doc_id", "domain", "mix_rate")
    )


# ---------------------------------------------------------------------------
# PRIORITY sampling (Duffield, Lund & Thorup, JACM 2007) — weighted
# sampling WITHOUT replacement with an unbiased subset-sum estimator,
# the scheme production samplers (e.g. flow telemetry, weighted corpus
# subsampling) use when each stratum must keep exactly k items but
# heavy items must be kept with near-certainty. Per item: priority
# q_i = w_i / u_i with u_i uniform(0,1]; keep the k largest
# priorities; with tau = the (k+1)-th priority, each kept item's
# Horvitz-Thompson weight is max(w_i, tau) and their sum unbiasedly
# estimates the stratum's total weight. Absent from the reference
# (math.c has no sampling); canonical for training-data pipelines
# that cap per-domain document budgets by quality weight.
#
# Determinism: u_i is the 60-bit md5 hash (hash60) — stateless,
# replay- and repartition-proof like every sampler in this module. We
# order by key = u_i/w_i ASCENDING (== priority descending): one
# IEEE long->double conversion and one division, both correctly
# rounded, so the sort key is bit-identical cross-engine; ties break
# on event_id. tau is derived from the (k+1)-th KEY as 2^60/key (a
# power-of-two literal, exact in double), and the HT estimate is
# summed in FIXED POINT (floor(ht*1e6+0.5) BIGINT) because a double
# sum over k items is reduction-order-dependent.
#
# Scale: local top-(K+1) pruning per (stratum, source partition)
# collapses the corpus to <= (K+1)*P candidate rows BEFORE the only
# per-stratum rank (no task ever sorts a whole stratum), the exact
# total is a partial-combinable aggregate, and the HT window runs on
# K rows per stratum. Result is partition-count-independent; the
# estimator certifies the sample against the exact stratum total.
# ---------------------------------------------------------------------------
_PRI_K = 64
_PRI_M = float(1 << 60)  # hash domain as an EXACT double (power of two)


@register(
    "sample_priority_topk",
    oracle=f"""
    WITH base AS (
      SELECT event_type, event_id,
             GREATEST(1, CAST(floor(value * 100.0 + 0.5) AS BIGINT) + 1)
                 AS w,
             {duck_hash60("CAST(event_id AS VARCHAR)")} AS hv
      FROM events
    ), keyed AS (
      SELECT event_type, event_id, w,
             CAST(hv AS DOUBLE) / w AS skey
      FROM base
    ), ranked AS (
      SELECT event_type, event_id, w, skey,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY skey, event_id) AS rn,
             CAST(SUM(w) OVER (PARTITION BY event_type) AS BIGINT)
                 AS exact_total_w
      FROM keyed
    ), r2 AS (
      SELECT *,
             MAX(CASE WHEN rn = {_PRI_K + 1} THEN skey END)
                 OVER (PARTITION BY event_type) AS key_k1
      FROM ranked
    ), sel AS (
      SELECT event_type, event_id, w, rn, exact_total_w,
             CASE WHEN key_k1 IS NULL THEN CAST(w AS DOUBLE)
                  ELSE GREATEST(CAST(w AS DOUBLE), {_PRI_M} / key_k1)
             END AS ht
      FROM r2 WHERE rn <= {_PRI_K}
    ), fp AS (
      SELECT event_type, CAST(rn AS BIGINT) AS rn, event_id, w,
             CAST(floor(ht * 1000000.0 + 0.5) AS BIGINT) AS ht_fp,
             exact_total_w,
             CAST(SUM(CAST(floor(ht * 1000000.0 + 0.5) AS BIGINT))
                  OVER (PARTITION BY event_type) AS BIGINT) AS est_total_fp
      FROM sel
    )
    SELECT event_type, rn, event_id, w, ht_fp, exact_total_w, est_total_fp,
           (abs(est_total_fp - exact_total_w * 1000000) * 100
            <= 40 * exact_total_w * 1000000) AS approx_ok
    FROM fp
    ORDER BY event_type, rn
    """,
)
def sample_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
            + F.lit(1),
        ).alias("w"),
        hash60(F.col("event_id").cast("string")).alias("hv"),
    )
    keyed = base.select(
        "event_type",
        "event_id",
        "w",
        (F.col("hv").cast("double") / F.col("w")).alias("skey"),
    )
    # Scale shape: a straight per-stratum rank would sort a whole
    # stratum in ONE task. Instead prune to each (stratum, source
    # partition)'s local top-(K+1) first — the global top-(K+1) is
    # always a subset of the union of local top-(K+1)s, so the final
    # stratum rank runs over <= (K+1)*P rows and the result is
    # partition-count-independent (the determinism contract).
    wloc = Window.partitionBy(
        "event_type", F.spark_partition_id()
    ).orderBy("skey", "event_id")
    cand = (
        keyed.withColumn("rn_loc", F.row_number().over(wloc))
        .filter(F.col("rn_loc") <= _PRI_K + 1)
        .drop("rn_loc")
    )
    wstr = Window.partitionBy("event_type").orderBy("skey", "event_id")
    ranked = cand.withColumn("rn", F.row_number().over(wstr))
    key_k1 = ranked.filter(F.col("rn") == _PRI_K + 1).select(
        "event_type", F.col("skey").alias("key_k1")
    )
    # the exact stratum total is a plain partial-combinable aggregate,
    # never a full-partition window
    totals = keyed.groupBy("event_type").agg(
        F.sum("w").cast("long").alias("exact_total_w")
    )
    sel = (
        ranked.filter(F.col("rn") <= _PRI_K)
        .join(F.broadcast(key_k1), "event_type", "left")
        .join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "event_id",
            "w",
            "rn",
            "exact_total_w",
            F.when(
                F.col("key_k1").isNull(), F.col("w").cast("double")
            )
            .otherwise(
                F.greatest(
                    F.col("w").cast("double"),
                    F.lit(_PRI_M) / F.col("key_k1"),
                )
            )
            .alias("ht"),
        )
    )
    ht_fp = F.floor(F.col("ht") * 1000000.0 + F.lit(0.5)).cast("long")
    wgrp = Window.partitionBy("event_type")
    fp = sel.select(
        "event_type",
        F.col("rn").cast("long").alias("rn"),
        "event_id",
        "w",
        ht_fp.alias("ht_fp"),
        "exact_total_w",
    ).withColumn(
        "est_total_fp", F.sum("ht_fp").over(wgrp).cast("long")
    )
    return fp.select(
        "event_type",
        "rn",
        "event_id",
        "w",
        "ht_fp",
        "exact_total_w",
        "est_total_fp",
        (
            F.abs(F.col("est_total_fp") - F.col("exact_total_w") * 1000000)
            * 100
            <= F.lit(40) * F.col("exact_total_w") * 1000000
        ).alias("approx_ok"),
    ).orderBy("event_type", "rn")



# ---------------------------------------------------------------------------
# K-CENTER CORESET — greedy farthest-point selection (Gonzalez 1985,
# the 2-approximation to metric k-center), the diversity-driven data
# SELECTION primitive (coreset construction, active-learning seed
# sets, "prune to the most spread-out exemplars"): start from a seed,
# repeatedly pick the point FARTHEST from everything selected so far,
# tracking each point's distance-to-selected-set with one least()
# update per round. The emitted coverage-radius sequence is the
# algorithm's own certificate (non-increasing; radius_r bounds the
# k-center cost from both sides within 2x).
#
# Determinism: dist^2 = <v,v> - 2<v,c> + <c,c> with every inner
# product a sequential fold — the same evaluation order as DuckDB's
# list_inner_product, so the doubles are bit-identical — then
# fixed-pointed to nano-units; argmax ties break on vec_id; min in
# the fp domain commutes with floor. The oracle unrolls all rounds.
#
# Scale: each round is ONE corpus pass (a 64-lit broadcast center +
# least() update) + a TakeOrdered(1) — the selected row (the coreset
# itself, driver-sized BY DEFINITION) is the only thing collected,
# the pagerank-loop discipline. O(k) passes total; at 100 TB you'd
# batch centers per pass (pick top-m spread candidates per round) —
# same plan shape.
# ---------------------------------------------------------------------------
_KC_K = 6
_KC_SCALE = 1_000_000_000


def _d_kc_round(i: int) -> str:
    prev_c = f"c{i - 1}"
    prev_m = f"m{i - 1}"
    return f"""
    m{i} AS (
      SELECT m.vec_id, m.v,
             LEAST(m.dfp, CAST(floor(
                 (list_inner_product(m.v, m.v)
                  - 2 * list_inner_product(m.v, c.v)
                  + list_inner_product(c.v, c.v)) * {_KC_SCALE}.0 + 0.5)
                 AS BIGINT)) AS dfp
      FROM {prev_m} m, {prev_c} c
    ),
    c{i} AS (
      SELECT vec_id, v, dfp FROM m{i} ORDER BY dfp DESC, vec_id LIMIT 1
    )"""


def _kc_oracle() -> str:
    rounds = ",".join(_d_kc_round(i) for i in range(2, _KC_K + 1))
    finals = "\n    UNION ALL\n".join(
        f"    SELECT {i} AS sel_round, vec_id, dfp AS radius_fp FROM c{i}"
        for i in range(2, _KC_K + 1)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    c1 AS (SELECT vec_id, v, CAST(0 AS BIGINT) AS dfp FROM e
           WHERE vec_id = 0),
    m1 AS (
      SELECT e.vec_id, e.v,
             CAST(floor((list_inner_product(e.v, e.v)
                         - 2 * list_inner_product(e.v, c.v)
                         + list_inner_product(c.v, c.v))
                        * {_KC_SCALE}.0 + 0.5) AS BIGINT) AS dfp
      FROM e, c1 c
    ),
    {rounds}
    SELECT * FROM (
    SELECT 1 AS sel_round, vec_id, CAST(0 AS BIGINT) AS radius_fp FROM c1
    UNION ALL
{finals}
    ) ORDER BY sel_round
    """


@register("sample_kcenter_coreset", oracle=_kc_oracle())
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.functions import dot

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
    )

    def dist_fp(center_vec: list[float]):
        c = F.array(*[F.lit(float(x)) for x in center_vec])
        d = (
            dot(F.col("v"), F.col("v"))
            - F.lit(2.0) * dot(F.col("v"), c)
            + dot(c, c)
        )
        return F.floor(d * float(_KC_SCALE) + F.lit(0.5)).cast("long")

    from fluent_bit_filter_math_spark.ckpt import release_local_checkpoint

    seed = emb.filter(F.col("vec_id") == 0).select("vec_id", "v").collect()[0]
    out_rows = [(1, seed["vec_id"], 0)]
    # per-round eager checkpoint (the pagerank_converged lineage rule;
    # guide §5 localCheckpoint): the lazy unroll re-evaluated round r's
    # whole least()-chain — r dot-products against 64-element literal
    # arrays per row, and a freshly codegen'd r-deep expression tree —
    # on every argmax pass (O(K²·n·d) compute + K recompilations).
    # Materializing each round's (vec_id, v, dfp) keeps every round's
    # job one NEW distance per row (O(K·n·d) total); blocks are
    # released as soon as the next round lands.
    cur = emb.select(
        "vec_id", "v", dist_fp(seed["v"]).alias("dfp")
    ).localCheckpoint(eager=True)
    for r in range(2, _KC_K + 1):
        far = cur.orderBy(F.desc("dfp"), F.asc("vec_id")).limit(1).collect()[0]
        out_rows.append((r, far["vec_id"], far["dfp"]))
        if r == _KC_K:
            break  # no further argmax reads this state
        nxt = cur.select(
            "vec_id",
            "v",
            F.least(F.col("dfp"), dist_fp(far["v"])).alias("dfp"),
        ).localCheckpoint(eager=True)
        release_local_checkpoint(cur)
        cur = nxt
    release_local_checkpoint(cur)
    return spark.createDataFrame(
        out_rows, "sel_round int, vec_id long, radius_fp long"
    ).orderBy("sel_round")


# ---------------------------------------------------------------------------
# EPOCH SHUFFLE — the deterministic per-epoch permutation a training
# data loader needs: epoch e orders the corpus by hash(e, doc_id), so
# every epoch sees a different but perfectly REPRODUCIBLE order
# (restart-safe, worker-count-independent — properties a random
# shuffle buffer does not have). Emitted as (epoch, doc_id, rank);
# the hash tie-break on doc_id makes the permutation total.
#
# Scale: the rank is computed the TWO-LEVEL way (the
# pipeline_pack_sequences discipline), never as one global window:
# the top 8 bits of the hash range-bucket each epoch into 256 shards,
# an exclusive prefix over the tiny (epoch, bucket) count frame gives
# each shard its global offset, and ranks are offset + within-shard
# row_number. Because the bucket is a PREFIX of the sort key, the
# result is bit-identical to the global row_number the oracle
# computes — but no single task ever sees more than one shard.
# ---------------------------------------------------------------------------
_EPOCHS = 2
_SHUF_BUCKET_SHIFT = 52  # 60-bit hash -> top 8 bits = 256 range buckets


@register(
    "sample_epoch_shuffle",
    oracle=f"""
    SELECT e.epoch, d.doc_id,
           CAST(row_number() OVER (
               PARTITION BY e.epoch
               ORDER BY {duck_hash60("CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)")},
                        d.doc_id
           ) AS BIGINT) AS shuffle_rank
    FROM documents d
    CROSS JOIN (SELECT unnest(range({_EPOCHS})) AS epoch) e
    ORDER BY epoch, shuffle_rank
    """,
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").select("doc_id")
    epochs = docs.withColumn(
        "epoch", F.explode(F.array(*[F.lit(e) for e in range(_EPOCHS)]))
    )
    hv = hash60(
        F.concat(
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    keyed = epochs.select(
        F.col("epoch").cast("long").alias("epoch"),
        "doc_id",
        hv.alias("hv"),
        F.shiftright(hv, _SHUF_BUCKET_SHIFT).alias("bucket"),
    )
    # level 1: per-(epoch, bucket) counts -> exclusive prefix offsets
    # over a <=256-row frame per epoch
    counts = keyed.groupBy("epoch", "bucket").agg(
        F.count("*").alias("n")
    )
    wpre = (
        Window.partitionBy("epoch")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "epoch",
        "bucket",
        F.coalesce(F.sum("n").over(wpre), F.lit(0)).alias("offset"),
    )
    # level 2: within-shard rank + broadcast offset = global rank
    # (bucket is the hash's top bits, i.e. a prefix of the sort key)
    win = Window.partitionBy("epoch", "bucket").orderBy("hv", "doc_id")
    return (
        keyed.join(F.broadcast(offsets), ["epoch", "bucket"])
        .select(
            "epoch",
            "doc_id",
            (F.col("offset") + F.row_number().over(win))
            .cast("long")
            .alias("shuffle_rank"),
        )
        .orderBy("epoch", "shuffle_rank")
    )
