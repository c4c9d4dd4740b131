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

from pyspark.sql import DataFrame, SparkSession
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
    scored = base.crossJoin(F.broadcast(stats)).select(
        "doc_id",
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
