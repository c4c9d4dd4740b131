"""Text-analysis operators over the ``documents`` table.

Absent from the reference (values other than numbers are ignored,
/root/reference/filter_math/math.c:161-164); these are the
training-data-pipeline extensions (SURVEY.md §2.3): token statistics,
quality scoring, language-ID heuristic, BPE-ish regex token counting,
document fingerprinting, document frequency (tf-idf building block) and
n-gram extraction.

Scale design: every query is a narrow projection or a single hash
aggregate over terms. No Python touches the hot path — tokenization,
hashing, and all ratios are native Column expressions in whole-stage
codegen. The explode-based queries (doc_freq, bigrams) shuffle once on
the term — at 100 TB that is the canonical word-count shape Spark's
map-side partial aggregation already minimizes.

Cross-engine determinism: ratios are double divisions of exact integer
counts, and composite scores are identical expression trees in both
engines — neither engine reassociates float arithmetic, so the driver's
bitwise hash compare holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.functions import (
    STOPWORDS,
    duck_hash60,
    hash60,
    tokens,
)
from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

# DuckDB spellings of the shared token expressions.
_D_TOKENS = "string_split(text, ' ')"
_D_NTOK = f"len({_D_TOKENS})"
_D_STOP = (
    f"len(list_filter({_D_TOKENS}, t -> t IN ('the', 'a')))"
)
_D_UNIQ = f"len(list_distinct({_D_TOKENS}))"
_D_SUMLEN = f"list_aggregate(list_transform({_D_TOKENS}, t -> length(t)), 'sum')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents")


def _stats_cols(df: DataFrame) -> DataFrame:
    """Shared token-statistic columns (computed once, reused by queries)."""
    t = tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return df.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_unique"),
        F.aggregate(
            F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        )
        .cast("long")
        .alias("sum_len"),
        F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stop"),
    )


# ---------------------------------------------------------------------------
# token statistics — counts + ratios per document.
# ---------------------------------------------------------------------------
@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST({_D_NTOK} AS BIGINT) AS n_tokens,
           CAST({_D_UNIQ} AS BIGINT) AS n_unique,
           CAST({_D_SUMLEN} AS DOUBLE) / {_D_NTOK} AS avg_token_len,
           CAST({_D_STOP} AS DOUBLE) / {_D_NTOK} AS stopword_ratio
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _stats_cols(_docs(spark, sf_dir))
    return s.select(
        "doc_id",
        "n_tokens",
        "n_unique",
        (F.col("sum_len").cast("double") / F.col("n_tokens")).alias(
            "avg_token_len"
        ),
        (F.col("n_stop").cast("double") / F.col("n_tokens")).alias(
            "stopword_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# quality score — composite of length, lexical diversity, stopword load.
# Identical expression tree in both engines (floats are not reassociated).
# ---------------------------------------------------------------------------
_D_QUALITY = (
    f"0.3 * least(1.0, CAST({_D_NTOK} AS DOUBLE) / 100.0)"
    f" + 0.3 * (1.0 - CAST({_D_STOP} AS DOUBLE) / {_D_NTOK})"
    f" + 0.4 * (CAST({_D_UNIQ} AS DOUBLE) / {_D_NTOK})"
)


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id, n_chars, ({_D_QUALITY}) AS quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    s = _stats_cols(df).alias("s")
    quality = (
        F.lit(0.3)
        * F.least(F.lit(1.0), F.col("n_tokens").cast("double") / F.lit(100.0))
        + F.lit(0.3)
        * (
            F.lit(1.0)
            - F.col("n_stop").cast("double") / F.col("n_tokens")
        )
        + F.lit(0.4) * (F.col("n_unique").cast("double") / F.col("n_tokens"))
    )
    return (
        s.join(df.select("doc_id", "n_chars"), "doc_id")
        .select("doc_id", "n_chars", quality.alias("quality"))
    )


# ---------------------------------------------------------------------------
# language-ID heuristic — function-word ratio + mean token length bands.
# (The fixture's `lang` column is uncorrelated with its synthetic text, so
# the heuristic's output is its own ground truth, pinned by the oracle.)
# ---------------------------------------------------------------------------
@register(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN CAST({_D_STOP} AS DOUBLE) / {_D_NTOK} >= 0.04 THEN 'en'
                WHEN CAST({_D_SUMLEN} AS DOUBLE) / {_D_NTOK} >= 5.0 THEN 'long'
                ELSE 'unk' END AS lang_pred
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _stats_cols(_docs(spark, sf_dir))
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    avg_len = F.col("sum_len").cast("double") / F.col("n_tokens")
    return s.select(
        "doc_id",
        F.when(stop_ratio >= 0.04, F.lit("en"))
        .when(avg_len >= 5.0, F.lit("long"))
        .otherwise(F.lit("unk"))
        .alias("lang_pred"),
    )


# ---------------------------------------------------------------------------
# BPE-ish regex token counting — words / numbers / punctuation as units.
# ---------------------------------------------------------------------------
_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@register(
    "text_token_count_regex",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS BIGINT)
               AS n_units
    FROM documents
    """,
)
def text_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    return df.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_TOKEN_RE), 0))
        .cast("long")
        .alias("n_units"),
    )


# ---------------------------------------------------------------------------
# document fingerprinting — order-insensitive bag fingerprint (md5 of the
# sorted distinct token set) + a 60-bit content hash of the raw text.
# ---------------------------------------------------------------------------
@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(list_aggregate(list_sort(list_distinct({_D_TOKENS})),
                              'string_agg', ' ')) AS bag_fp,
           {duck_hash60('text')} AS content_hash
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    return df.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(t)))).alias(
            "bag_fp"
        ),
        hash60(F.col("text")).alias("content_hash"),
    )


# ---------------------------------------------------------------------------
# document frequency + idf — the tf-idf building block. One shuffle on the
# term (word-count shape: map-side partial agg, then final agg).
# idf is rounded to 9 dp: Java's Math.log and libm's log may differ in the
# last ulp, and the driver compares doubles bitwise.
# ---------------------------------------------------------------------------
@register(
    "text_doc_freq",
    oracle=f"""
    WITH n AS (SELECT count(*) AS total FROM documents)
    SELECT term,
           COUNT(*) AS df,
           round(ln((CAST(total AS DOUBLE) + 1.0)
                    / (CAST(COUNT(*) AS DOUBLE) + 1.0)), 9) AS idf
    FROM (SELECT doc_id, unnest(list_distinct({_D_TOKENS})) AS term
          FROM documents), n
    GROUP BY term, total
    """,
)
def text_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The corpus size enters as a broadcast 1-row aggregate cross-joined
    # onto the per-term counts — ONE plan, no separate driver-side count()
    # job re-scanning the table per build (VERDICT r1 anti-pattern #3).
    df = _docs(spark, sf_dir)
    total = df.agg(F.count("*").cast("double").alias("_total"))
    exploded = df.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("term"),
    )
    counts = exploded.groupBy("term").agg(F.count("*").alias("df"))
    return counts.crossJoin(F.broadcast(total)).select(
        "term",
        "df",
        F.round(
            F.log(
                (F.col("_total") + F.lit(1.0))
                / (F.col("df").cast("double") + F.lit(1.0))
            ),
            9,
        ).alias("idf"),
    )


# ---------------------------------------------------------------------------
# tf-idf top terms — the full weighting composed from the doc_freq
# building block: term frequency per (doc, term), idf from distinct doc
# counts, top-3 terms per document by tf·idf. Three word-count-shaped
# shuffles (doc+term, term, doc) with map-side partials throughout; the
# idf side is |vocabulary| rows and broadcasts. Ranking happens on the
# 9-dp-rounded score (the same cross-engine rounding as text_doc_freq)
# with a term tiebreak, so ranks are deterministic; scores stay internal
# (integer/string-only output for the driver's bitwise hash).
# ---------------------------------------------------------------------------
@register(
    "text_tfidf_topterms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_D_TOKENS}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    n AS (SELECT COUNT(*) AS total FROM documents),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf * ln((CAST(total AS DOUBLE) + 1.0)
                           / (CAST(df AS DOUBLE) + 1.0)), 9) AS tfidf
      FROM tf JOIN df ON tf.term = df.term, n
    )
    SELECT doc_id, term, rank FROM (
      SELECT doc_id, term,
             CAST(ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY tfidf DESC, term
             ) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    df = _docs(spark, sf_dir)
    tok = df.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    total = df.agg(F.count("*").cast("double").alias("_total"))
    dfreq = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("_total") + F.lit(1.0))
                    / (F.col("df").cast("double") + F.lit(1.0))
                ),
                9,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.select(
            "doc_id",
            "term",
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


# ---------------------------------------------------------------------------
# word bigrams — top-20 by frequency. element_at is 1-based in both engines.
# ---------------------------------------------------------------------------
@register(
    "text_bigrams",
    oracle=f"""
    SELECT bigram, COUNT(*) AS n
    FROM (
        SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS bigram
        FROM (SELECT string_split(text, ' ') AS t FROM documents)
    )
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    # Materialize the token array before the lambda touches it — inlined,
    # every element_at re-evaluates split(text) (no CSE in lambda bodies).
    toks = df.select(tokens(F.col("text")).alias("t"))
    t = F.col("t")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(t, i), F.element_at(t, i + 1)
        ),
    )
    return (
        toks.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )
