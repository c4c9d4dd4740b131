"""Full-text retrieval over the ``documents`` table — BM25 ranking.

Absent from the reference (no cross-record state, no text handling —
/root/reference/filter_math/math.c:161-164, 322-353); this is the
training-data-pipeline extension that turns the corpus into a search
index: score every document against a fixed keyword query with Okapi
BM25 and return the top-k, the building block behind retrieval-based
data curation (e.g. selecting pretraining documents relevant to a
benchmark domain) and RAG-style corpus probes.

Scale design: term frequencies and document length are PER-DOCUMENT
projections (native ``F.filter``/``F.size`` over the token array — no
explode, no shuffle); the corpus statistics BM25 needs (N, avgdl, per-
term document frequencies) reduce to ONE aggregate row that broadcasts
back via crossJoin — the same 1-row-stats discipline as
``text_doc_freq``. The final top-k is ``orderBy().limit(k)``, which
Spark executes as TakeOrderedAndProject: each partition keeps its local
k, only k·partitions rows ever move. Nothing here materializes an
inverted index because the query set is fixed and small; at 100 TB with
a large query workload you would build the posting-list form
(``text_doc_freq``'s explode+agg shape) once and share it.

Cross-engine determinism: ln() differs in the last ulp between libm and
the JVM, so each term's idf is rounded at 9 dp (the ``text_lm_score``
discipline). All remaining arithmetic is identical-operand IEEE ops:
tf/dl are exact integers, avgdl is one double division of exact
integers, and the per-term scores sum in a FIXED textual order (term1 +
term2 + term3 — never a float aggregation whose order the shuffle could
change). The final score is re-rounded at 9 dp for the driver hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.functions import tokens
from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

# Fixed keyword query — mid-frequency fixture terms so tf varies.
BM25_TERMS = ("spark", "hash", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10

_NINE = 1000000000.0


def _idf(n: F.Column, df: F.Column) -> F.Column:
    """BM25+ idf, ln((N - df + 0.5)/(df + 0.5) + 1), rounded at 9 dp."""
    raw = F.log(
        (n.cast("double") - df.cast("double") + F.lit(0.5))
        / (df.cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    return F.floor(raw * F.lit(_NINE) + F.lit(0.5)) / F.lit(_NINE)


def _term_score(tf: F.Column, dl: F.Column, avgdl: F.Column, idf: F.Column):
    """One term's BM25 contribution; 0.0 when the term is absent."""
    frac = (tf.cast("double") * F.lit(BM25_K1 + 1.0)) / (
        tf.cast("double")
        + F.lit(BM25_K1)
        * (
            F.lit(1.0)
            - F.lit(BM25_B)
            + F.lit(BM25_B) * dl.cast("double") / avgdl
        )
    )
    return F.when(tf > 0, idf * frac).otherwise(F.lit(0.0))


# Shared oracle CTE chain (base → stats → idf → scored): text_bm25_topk
# consumes it directly; the RRF/NDCG evaluators below reuse the same
# scored frame so the ranking under test is bit-identical everywhere.
_BM25_ORACLE_CTES = f"""
    base AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS dl,
             len(list_filter(string_split(text, ' '), x -> x = 'spark'))
                 AS tf0,
             len(list_filter(string_split(text, ' '), x -> x = 'hash'))
                 AS tf1,
             len(list_filter(string_split(text, ' '), x -> x = 'window'))
                 AS tf2
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
      FROM base
    ),
    idf AS (
      SELECT n, avgdl,
             floor(ln((CAST(n AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
                      / (CAST(df0 AS DOUBLE) + 0.5) + 1.0)
                   * {_NINE} + 0.5) / {_NINE} AS idf0,
             floor(ln((CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
                      / (CAST(df1 AS DOUBLE) + 0.5) + 1.0)
                   * {_NINE} + 0.5) / {_NINE} AS idf1,
             floor(ln((CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
                      / (CAST(df2 AS DOUBLE) + 0.5) + 1.0)
                   * {_NINE} + 0.5) / {_NINE} AS idf2
      FROM stats
    ),
    scored AS (
      SELECT b.doc_id, b.dl,
             b.tf0 + b.tf1 + b.tf2 AS tf_total,
             CAST((CASE WHEN b.tf0 > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN b.tf1 > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN b.tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_matched,
             (CASE WHEN b.tf0 > 0 THEN i.idf0 *
                ((CAST(b.tf0 AS DOUBLE) * {BM25_K1 + 1.0})
                 / (CAST(b.tf0 AS DOUBLE) + {BM25_K1}
                    * (1.0 - {BM25_B}
                       + {BM25_B} * CAST(b.dl AS DOUBLE) / i.avgdl)))
              ELSE 0.0 END)
             + (CASE WHEN b.tf1 > 0 THEN i.idf1 *
                ((CAST(b.tf1 AS DOUBLE) * {BM25_K1 + 1.0})
                 / (CAST(b.tf1 AS DOUBLE) + {BM25_K1}
                    * (1.0 - {BM25_B}
                       + {BM25_B} * CAST(b.dl AS DOUBLE) / i.avgdl)))
              ELSE 0.0 END)
             + (CASE WHEN b.tf2 > 0 THEN i.idf2 *
                ((CAST(b.tf2 AS DOUBLE) * {BM25_K1 + 1.0})
                 / (CAST(b.tf2 AS DOUBLE) + {BM25_K1}
                    * (1.0 - {BM25_B}
                       + {BM25_B} * CAST(b.dl AS DOUBLE) / i.avgdl)))
              ELSE 0.0 END) AS raw
      FROM base b CROSS JOIN idf i
    )
"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, dl, tf_total, n_matched, raw) — the Spark twin of the
    ``scored`` CTE above; the expression tree is the original
    text_bm25_topk one, unchanged, so every consumer ranks on
    bit-identical scores."""
    docs = table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))

    # NB: the lambda must take exactly ONE parameter — F.filter treats a
    # two-parameter lambda as (element, index), so a `term=term` default
    # would bind the array index, not the term.
    def _eq(term: str):
        return lambda x: x == term

    base = docs.select(
        "doc_id",
        F.size(t).cast("long").alias("dl"),
        *[
            F.size(F.filter(t, _eq(term))).cast("long").alias(f"tf{i}")
            for i, term in enumerate(BM25_TERMS)
        ],
    )
    stats = base.agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    return base.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "dl",
        (F.col("tf0") + F.col("tf1") + F.col("tf2")).alias("tf_total"),
        sum(
            (F.col(f"tf{i}") > 0).cast("long") for i in range(len(BM25_TERMS))
        ).alias("n_matched"),
        # Fixed textual summation order: term0 + term1 + term2.
        (
            _term_score(
                F.col("tf0"),
                F.col("dl"),
                F.col("avgdl"),
                _idf(F.col("n"), F.col("df0")),
            )
            + _term_score(
                F.col("tf1"),
                F.col("dl"),
                F.col("avgdl"),
                _idf(F.col("n"), F.col("df1")),
            )
            + _term_score(
                F.col("tf2"),
                F.col("dl"),
                F.col("avgdl"),
                _idf(F.col("n"), F.col("df2")),
            )
        ).alias("raw"),
    )


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS dl,
             len(list_filter(string_split(text, ' '), x -> x = 'spark'))
                 AS tf0,
             len(list_filter(string_split(text, ' '), x -> x = 'hash'))
                 AS tf1,
             len(list_filter(string_split(text, ' '), x -> x = 'window'))
                 AS tf2
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
      FROM base
    ),
    idf AS (
      SELECT n, avgdl,
             floor(ln((CAST(n AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
                      / (CAST(df0 AS DOUBLE) + 0.5) + 1.0)
                   * {_NINE} + 0.5) / {_NINE} AS idf0,
             floor(ln((CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
                      / (CAST(df1 AS DOUBLE) + 0.5) + 1.0)
                   * {_NINE} + 0.5) / {_NINE} AS idf1,
             floor(ln((CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
                      / (CAST(df2 AS DOUBLE) + 0.5) + 1.0)
                   * {_NINE} + 0.5) / {_NINE} AS idf2
      FROM stats
    ),
    scored AS (
      SELECT b.doc_id,
             CAST((CASE WHEN b.tf0 > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN b.tf1 > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN b.tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_matched,
             (CASE WHEN b.tf0 > 0 THEN i.idf0 *
                ((CAST(b.tf0 AS DOUBLE) * {BM25_K1 + 1.0})
                 / (CAST(b.tf0 AS DOUBLE) + {BM25_K1}
                    * (1.0 - {BM25_B}
                       + {BM25_B} * CAST(b.dl AS DOUBLE) / i.avgdl)))
              ELSE 0.0 END)
             + (CASE WHEN b.tf1 > 0 THEN i.idf1 *
                ((CAST(b.tf1 AS DOUBLE) * {BM25_K1 + 1.0})
                 / (CAST(b.tf1 AS DOUBLE) + {BM25_K1}
                    * (1.0 - {BM25_B}
                       + {BM25_B} * CAST(b.dl AS DOUBLE) / i.avgdl)))
              ELSE 0.0 END)
             + (CASE WHEN b.tf2 > 0 THEN i.idf2 *
                ((CAST(b.tf2 AS DOUBLE) * {BM25_K1 + 1.0})
                 / (CAST(b.tf2 AS DOUBLE) + {BM25_K1}
                    * (1.0 - {BM25_B}
                       + {BM25_B} * CAST(b.dl AS DOUBLE) / i.avgdl)))
              ELSE 0.0 END) AS raw
      FROM base b CROSS JOIN idf i
    )
    SELECT doc_id, n_matched,
           floor(raw * {_NINE} + 0.5) / {_NINE} AS bm25_score
    FROM scored
    ORDER BY raw DESC, doc_id
    LIMIT {BM25_TOPK}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scored(spark, sf_dir)
    return (
        scored.orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(BM25_TOPK)
        .select(
            "doc_id",
            "n_matched",
            (F.floor(F.col("raw") * F.lit(_NINE) + F.lit(0.5)) / F.lit(_NINE))
            .alias("bm25_score"),
        )
    )


# ---------------------------------------------------------------------------
# RECIPROCAL RANK FUSION — combine two rankers' top-K pools with
# RRF(d) = Σ_r 1/(C + rank_r(d)) (Cormack/Clarke/Buettcher SIGIR'09,
# C = 60), the standard hybrid-retrieval merge (lexical + semantic in
# every RAG stack; Elasticsearch/OpenSearch expose exactly this).
# Ranker A = the BM25 scorer above; ranker B = query-likelihood
# tf_total/dl (a deliberately different lexical signal). Ranks are
# assigned WITHIN each top-K pool (rank windows, the production RRF
# form) — never over the corpus, so no global sort exists anywhere:
# each pool is a TakeOrderedAndProject (per-partition local top-K,
# K·partitions rows move), and the rank window runs on K = 20 rows.
# Documents absent from a pool contribute 0 — the rank-window
# convention. All arithmetic is exact: ranks are integers and
# 1/(60+r) is a single correctly-rounded IEEE division, summed in a
# fixed two-term order.
#
# Scale: two corpus scans (one per ranker — they share `base`, Spark
# dedupes the subtree), two local top-Ks, a 20×20 outer join on the
# driver-size pools. 100 TB changes nothing but the scan time.
# ---------------------------------------------------------------------------
RRF_C = 60
RRF_POOL = 20


@register(
    "retrieval_rrf_fusion",
    oracle=f"""
    WITH {_BM25_ORACLE_CTES},
    pool_a AS (
      SELECT doc_id, row_number() OVER (ORDER BY raw DESC, doc_id) AS ra
      FROM (SELECT doc_id, raw FROM scored
            ORDER BY raw DESC, doc_id LIMIT {RRF_POOL})
    ),
    pool_b AS (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY CAST(tf_total AS DOUBLE) / dl DESC, doc_id
             ) AS rb
      FROM (SELECT doc_id, tf_total, dl FROM scored
            ORDER BY CAST(tf_total AS DOUBLE) / dl DESC, doc_id
            LIMIT {RRF_POOL})
    ),
    fused AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             a.ra AS rank_bm25,
             b.rb AS rank_ql,
             COALESCE(1.0 / ({RRF_C} + a.ra), 0.0)
               + COALESCE(1.0 / ({RRF_C} + b.rb), 0.0) AS rrf_score
      FROM pool_a a FULL OUTER JOIN pool_b b USING (doc_id)
    )
    SELECT doc_id, rank_bm25, rank_ql, rrf_score
    FROM fused
    ORDER BY rrf_score DESC, doc_id
    LIMIT {BM25_TOPK}
    """,
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scored(spark, sf_dir)
    ql = (F.col("tf_total").cast("double") / F.col("dl")).alias("ql")
    pool_a = (
        scored.select("doc_id", "raw")
        .orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(RRF_POOL)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("raw"), F.asc("doc_id")))
            .alias("ra"),
        )
    )
    pool_b = (
        scored.select("doc_id", ql)
        .orderBy(F.desc("ql"), F.asc("doc_id"))
        .limit(RRF_POOL)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("ql"), F.asc("doc_id")))
            .alias("rb"),
        )
    )
    fused = pool_a.join(pool_b, "doc_id", "full_outer").select(
        "doc_id",
        F.col("ra").alias("rank_bm25"),
        F.col("rb").alias("rank_ql"),
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(RRF_C) + F.col("ra")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_C) + F.col("rb")), F.lit(0.0)
            )
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(
        BM25_TOPK
    )


# ---------------------------------------------------------------------------
# NDCG@k RANKING EVALUATION — the standard graded-relevance retrieval
# metric (Järvelin & Kekäläinen TOIS'02): DCG@k = Σ_i gain_i/log2(i+1)
# over the system's top-k, normalized by the ideal ordering's IDCG@k.
# Gains here are the NATURAL graded labels n_matched ∈ {0..3} (how
# many query terms the document contains), so the metric is fully
# deterministic with no side relevance file. Portability: log2 is NOT
# correctly-rounded libm, so the discounts 1/log2(i+1) for i = 1..k
# are PRECOMPUTED as integer literals scaled by 1e15 (identical
# constants in both engines); DCG_scaled = Σ gain_i·D_i is then an
# exact BIGINT (≤ 3·k·1e15 ≈ 3e16) and ndcg is one IEEE division of
# two exact integers.
#
# Scale: two local top-ks (system = BM25 order, ideal = gain order) —
# TakeOrderedAndProject both; the discount join is element_at on a
# k-literal array. One corpus scan feeds both pools.
# ---------------------------------------------------------------------------
NDCG_K = 10
# round(1e15 / log2(i+1)) for rank i = 1..NDCG_K — exact int literals.
_NDCG_D = tuple(
    int(round(1e15 / __import__("math").log2(i + 1)))
    for i in range(1, NDCG_K + 1)
)


@register(
    "retrieval_ndcg_eval",
    oracle=f"""
    WITH {_BM25_ORACLE_CTES},
    disc AS (SELECT {list(_NDCG_D)} AS d),
    sys AS (
      SELECT n_matched,
             row_number() OVER (ORDER BY raw DESC, doc_id) AS rn
      FROM (SELECT doc_id, n_matched, raw FROM scored
            ORDER BY raw DESC, doc_id LIMIT {NDCG_K})
    ),
    ideal AS (
      SELECT n_matched,
             row_number() OVER (ORDER BY n_matched DESC, doc_id) AS rn
      FROM (SELECT doc_id, n_matched FROM scored
            ORDER BY n_matched DESC, doc_id LIMIT {NDCG_K})
    ),
    dcg AS (
      SELECT CAST(SUM(s.n_matched * d.d[s.rn]) AS BIGINT) AS dcg_scaled
      FROM sys s CROSS JOIN disc d
    ),
    idcg AS (
      SELECT CAST(SUM(i.n_matched * d.d[i.rn]) AS BIGINT) AS idcg_scaled
      FROM ideal i CROSS JOIN disc d
    )
    SELECT CAST({NDCG_K} AS BIGINT) AS k,
           dcg.dcg_scaled,
           idcg.idcg_scaled,
           CAST(dcg.dcg_scaled AS DOUBLE) / idcg.idcg_scaled AS ndcg
    FROM dcg CROSS JOIN idcg
    """,
)
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scored(spark, sf_dir)
    disc = F.array(*[F.lit(d) for d in _NDCG_D])

    def _pool_dcg(order_cols, alias: str) -> DataFrame:
        pool = (
            scored.select("doc_id", "n_matched", "raw")
            .orderBy(*order_cols)
            .limit(NDCG_K)
            .select(
                "n_matched",
                F.row_number().over(Window.orderBy(*order_cols)).alias("rn"),
            )
        )
        return pool.agg(
            F.sum(F.col("n_matched") * F.element_at(disc, F.col("rn")))
            .cast("long")
            .alias(alias)
        )

    dcg = _pool_dcg([F.desc("raw"), F.asc("doc_id")], "dcg_scaled")
    idcg = _pool_dcg([F.desc("n_matched"), F.asc("doc_id")], "idcg_scaled")
    return dcg.crossJoin(idcg).select(
        F.lit(NDCG_K).cast("long").alias("k"),
        "dcg_scaled",
        "idcg_scaled",
        (F.col("dcg_scaled").cast("double") / F.col("idcg_scaled")).alias(
            "ndcg"
        ),
    )


# ---------------------------------------------------------------------------
# PRECISION/RECALL@k + AP + MRR — the set-retrieval eval battery that
# complements retrieval_ndcg_eval's graded metric (Manning et al., IIR
# ch.8): walk the BM25 top-PR_K ranking against a BINARY relevance
# label and emit, per cutoff k: hits, P@k, R@k, the running
# average-precision numerator, and the (constant) reciprocal rank of
# the first relevant result. Labels are derived, not hand-curated:
# relevant ⟺ 5·tf_total ≥ dl — "query-term-dense" documents, a signal
# BM25's length normalization correlates with only partially, so the
# curve actually discriminates (P@20 ≈ 0.25 at sf0.01, base rate
# ≈ 3.4%).
#
# Determinism: EVERYTHING here is BIGINT — P@k and R@k are emitted as
# 1e12-scaled integer-division fixed point, the AP numerator
# accumulates those exact integers, and MRR is 1e12 div first_rel_k.
# No float ever leaves the ranking stage (whose scores are the shared
# bit-pinned _bm25_scored tree).
#
# Scale: one corpus scan (the shared scored frame), a 1-row rel_total
# broadcast, one TakeOrderedAndProject top-PR_K, and windows that only
# ever see PR_K rows.
# ---------------------------------------------------------------------------
PR_K = 20
_PR_S = 1_000_000_000_000  # 1e12 fixed-point scale


@register(
    "retrieval_pr_at_k",
    oracle=f"""
    WITH {_BM25_ORACLE_CTES},
    lab AS (
      SELECT doc_id, raw,
             CASE WHEN 5 * tf_total >= dl THEN 1 ELSE 0 END AS rel
      FROM scored
    ),
    tot AS (
      SELECT CAST(GREATEST(SUM(rel), 1) AS BIGINT) AS rel_total FROM lab
    ),
    top AS (
      SELECT doc_id, rel,
             row_number() OVER (ORDER BY raw DESC, doc_id) AS k
      FROM (SELECT * FROM lab ORDER BY raw DESC, doc_id LIMIT {PR_K})
    ),
    cur AS (
      SELECT doc_id, rel, k,
             CAST(SUM(rel) OVER (ORDER BY k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS hits
      FROM top
    ),
    pk AS (
      SELECT doc_id, rel, k, hits,
             hits * {_PR_S} // k AS p_at_k_fp
      FROM cur
    )
    SELECT CAST(k AS BIGINT) AS k,
           doc_id,
           CAST(rel AS BIGINT) AS rel,
           hits,
           p_at_k_fp,
           hits * {_PR_S} // tot.rel_total AS r_at_k_fp,
           CAST(SUM(rel * p_at_k_fp) OVER (ORDER BY k
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS ap_num_fp,
           COALESCE({_PR_S} // MIN(CASE WHEN rel = 1 THEN k END) OVER (),
                    0) AS rr_fp
    FROM pk CROSS JOIN tot
    ORDER BY k
    """,
)
def retrieval_pr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    lab = _bm25_scored(spark, sf_dir).select(
        "doc_id",
        "raw",
        F.when(5 * F.col("tf_total") >= F.col("dl"), 1)
        .otherwise(0)
        .alias("rel"),
    )
    tot = lab.agg(
        F.greatest(F.sum("rel"), F.lit(1)).cast("long").alias("rel_total")
    )
    wk = Window.orderBy(F.desc("raw"), F.asc("doc_id"))
    top = (
        lab.orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(PR_K)
        .select("doc_id", "rel", F.row_number().over(wk).alias("k"))
    )
    wcum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    cur = top.select(
        "doc_id", "rel", "k",
        F.sum("rel").over(wcum).cast("long").alias("hits"),
    )
    pk = cur.select(
        "doc_id", "rel", "k", "hits",
        F.expr(f"hits * {_PR_S} div k").alias("p_at_k_fp"),
    )
    wall = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        pk.crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("long").alias("k"),
            "doc_id",
            F.col("rel").cast("long").alias("rel"),
            "hits",
            "p_at_k_fp",
            F.expr(f"hits * {_PR_S} div rel_total").alias("r_at_k_fp"),
            F.sum(F.col("rel") * F.col("p_at_k_fp"))
            .over(wcum)
            .cast("long")
            .alias("ap_num_fp"),
            F.coalesce(
                F.expr(
                    f"{_PR_S} div min(CASE WHEN rel = 1 THEN k END)"
                    " OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING"
                    " AND UNBOUNDED FOLLOWING)"
                ),
                F.lit(0).cast("long"),
            ).alias("rr_fp"),
        )
        .orderBy("k")
    )
