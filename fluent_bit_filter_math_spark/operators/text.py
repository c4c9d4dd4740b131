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
    fixed_round,
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
           (floor(ln((CAST(total AS DOUBLE) + 1.0)
                     / (CAST(COUNT(*) AS DOUBLE) + 1.0))
                  * 1000000000.0 + 0.5) / 1000000000.0) AS idf
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
        fixed_round(
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
             (floor(tf * ln((CAST(total AS DOUBLE) + 1.0)
                            / (CAST(df AS DOUBLE) + 1.0))
                    * 1000000000.0 + 0.5) / 1000000000.0) AS tfidf
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
            fixed_round(
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
    # size >= 2 guard: sequence(1, 0) DESCENDS ([1, 0]) on a 1-token
    # document and element_at(t, 0) throws — DuckDB's range(1, len) is
    # exclusive-upper so only the Spark side needs it (r11 audit).
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        toks.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# repetition filter — Gopher-style repetitiousness signals (Rae et al.
# 2021, "Scaling Language Models", Table A1) adapted to this corpus's
# single-line documents: instead of duplicate lines/paragraphs, the
# word-n-gram family — characters covered by the most frequent unigram,
# by the most frequent bigram, and by all bigrams occurring ≥ 2 times
# (occurrence overlaps ignored, as in the paper). A document is kept
# when all three fractions sit below thresholds chosen on this corpus's
# distribution so both outcomes occur (Gopher's own 0.2/0.18 family).
#
# Shape: ONE explode of tagged (n, gram) structs → one (doc_id, n, gram)
# hash aggregate → one per-doc aggregate — the word-count shape twice,
# both partial-aggregatable, then a broadcast-sized join back to the
# per-doc char count. No Python, no window, one shuffle key that is
# (doc, gram) — cardinality bounded by corpus token count, skew-free.
# ---------------------------------------------------------------------------
_REP_T_UNI = 0.12
_REP_T_BIG = 0.10
_REP_T_DUP = 0.18


@register(
    "text_repetition_filter",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, length(text) AS nchar, {_D_TOKENS} AS t FROM documents
    ),
    g AS (
      SELECT doc_id, 1 AS n, unnest(t) AS gram FROM tok
      UNION ALL
      SELECT doc_id, 2 AS n,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS gram
      FROM tok
    ),
    c AS (
      SELECT doc_id, n, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, n, gram
    ),
    a AS (
      SELECT doc_id,
             MAX(CASE WHEN n = 1 THEN cnt * length(gram) END) AS uni_cover,
             MAX(CASE WHEN n = 2 THEN cnt * length(gram) END) AS big_cover,
             SUM(CASE WHEN n = 2 AND cnt >= 2 THEN cnt * length(gram)
                      ELSE 0 END) AS dup_cover
      FROM c GROUP BY doc_id
    )
    SELECT tok.doc_id,
           CAST(COALESCE(uni_cover, 0) AS DOUBLE) / nchar AS top_unigram_frac,
           CAST(COALESCE(big_cover, 0) AS DOUBLE) / nchar AS top_bigram_frac,
           CAST(COALESCE(dup_cover, 0) AS DOUBLE) / nchar AS dup_bigram_frac,
           CAST(CAST(COALESCE(uni_cover, 0) AS DOUBLE) / nchar <= {_REP_T_UNI}
            AND CAST(COALESCE(big_cover, 0) AS DOUBLE) / nchar <= {_REP_T_BIG}
            AND CAST(COALESCE(dup_cover, 0) AS DOUBLE) / nchar <= {_REP_T_DUP}
            AS INT) AS keep
    FROM tok LEFT JOIN a ON tok.doc_id = a.doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # Token array materialized before the gram lambdas touch it (no CSE
    # inside lambda bodies — same trap as the shingle pipeline).
    toks = docs.select(
        "doc_id",
        F.length("text").alias("nchar"),
        tokens(F.col("text")).alias("t"),
    )
    t = F.col("t")
    unigrams = F.transform(
        t, lambda x: F.struct(F.lit(1).alias("n"), x.alias("gram"))
    )
    bigram_arr = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.struct(
            F.lit(2).alias("n"),
            F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ).alias("gram"),
        ),
    )
    bigrams = F.when(F.size(t) >= 2, bigram_arr).otherwise(
        F.array().cast("array<struct<n:int,gram:string>>")
    )
    g = toks.select(
        "doc_id", F.explode(F.concat(unigrams, bigrams)).alias("g")
    ).select("doc_id", "g.n", "g.gram")
    cnt = F.col("count")
    cover = cnt * F.length("gram")
    a = (
        g.groupBy("doc_id", "n", "gram")
        .count()
        .groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("n") == 1, cover)).alias("uni_cover"),
            F.max(F.when(F.col("n") == 2, cover)).alias("big_cover"),
            F.sum(
                F.when((F.col("n") == 2) & (cnt >= 2), cover).otherwise(0)
            ).alias("dup_cover"),
        )
    )
    nchar = F.col("nchar")
    uni = F.coalesce("uni_cover", F.lit(0)).cast("double") / nchar
    big = F.coalesce("big_cover", F.lit(0)).cast("double") / nchar
    dup = F.coalesce("dup_cover", F.lit(0)).cast("double") / nchar
    return (
        toks.select("doc_id", "nchar")
        .join(a, "doc_id", "left")
        .select(
            "doc_id",
            uni.alias("top_unigram_frac"),
            big.alias("top_bigram_frac"),
            dup.alias("dup_bigram_frac"),
            (
                (uni <= _REP_T_UNI)
                & (big <= _REP_T_BIG)
                & (dup <= _REP_T_DUP)
            )
            .cast("int")
            .alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction — regex scrub of emails/phones with per-doc hit counts,
# the standard pre-training privacy pass. The fixture corpus contains no
# PII-shaped strings, so the query first formats one deterministic
# log-style line per document from fixture values (doc_id, source, a
# derived phone suffix, a text prefix) and then redacts it — the same
# honest-fake pattern as the multimodal decode: synthesis is
# reproducible SQL in both engines, and the redaction plumbing
# (replace-all + count) is the real production expression.
#
# Pattern dialect intersection: Java regex (Spark) and RE2 (DuckDB)
# agree on character classes, bounded repetition and \b; no
# backreferences or lookaround. DuckDB's regexp_replace needs the
# explicit 'g' flag to match Spark's replace-all default.
# Scale: pure narrow projection, whole-stage codegen, zero shuffles.
# ---------------------------------------------------------------------------
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\b555-\d{4}\b"


@register(
    "text_pii_redact",
    oracle=f"""
    WITH lines AS (
      SELECT doc_id,
             'doc ' || doc_id || ' from user' || doc_id || '@' || source ||
             '.example.com' ||
             CASE WHEN doc_id % 3 = 0
                  THEN ' cc admin' || doc_id || '@corp.example.org' ELSE '' END
             || ' tel 555-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
             || ': ' || substr(text, 1, 80) AS line
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(line, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(line, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(line, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones
    FROM lines
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    line = F.concat(
        F.lit("doc "),
        F.col("doc_id").cast("string"),
        F.lit(" from user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".example.com"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" cc admin"),
                F.col("doc_id").cast("string"),
                F.lit("@corp.example.org"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" tel 555-"),
        F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        F.lit(": "),
        F.substring("text", 1, 80),
    )
    lines = docs.select("doc_id", line.alias("line"))
    return lines.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("line", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
        F.regexp_count("line", F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("line", F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# Bigram language-model scoring — the CCNet/Gopher-style perplexity
# quality signal: train an add-one-smoothed bigram LM on the corpus
# itself, then score every document's token stream under it. Documents
# whose average log-probability is far below the corpus norm are
# boilerplate/gibberish candidates; the threshold decision is left to
# the consumer (sum + count are the deliverables, like text_doc_freq).
#
# Scale: two word-count-shaped aggregates (bigram and prefix counts,
# both map-side partial), one vocabulary scalar via a broadcast 1-row
# aggregate (no separate driver job — the text_doc_freq discipline),
# and a re-join of the bigram stream to the LM — all shuffles key on
# the bigram/prefix, the canonical distributed-LM-training shape. At
# 100 TB the LM tables are themselves large; the joins hash-partition
# on the n-gram, so no side ever needs to fit anywhere.
#
# Determinism: ln() differs in the last ulp between libm and the JVM,
# so each bigram's log-probability is rounded at 9 dp and summed
# EXACTLY as DECIMAL(20,9) (the _dsum discipline); the double division
# for avg uses identical operands in both engines.
# Absent from the reference (no cross-record state, math.c:322-353).
# ---------------------------------------------------------------------------
@register(
    "text_lm_score",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_D_TOKENS} AS t FROM documents),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                                   i -> {{'w1': t[i], 'w2': t[i+1]}}),
                    recursive := true)
      FROM tok
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT u) AS v
          FROM (SELECT unnest(t) AS u FROM tok)),
    lp AS (
      SELECT b.doc_id,
             CAST(floor(ln(CAST(c12.c12 + 1 AS DOUBLE) / (c1.c1 + v.v))
                        * 1000000000.0 + 0.5) / 1000000000.0
                  AS DECIMAL(20,9)) AS lp
      FROM big b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(lp) AS DOUBLE) AS sum_logprob
      FROM lp GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(agg.n_bigrams, 0) AS n_bigrams,
           COALESCE(agg.sum_logprob, 0.0) AS sum_logprob,
           CASE WHEN agg.n_bigrams IS NULL THEN NULL
                ELSE agg.sum_logprob / agg.n_bigrams END AS avg_logprob
    FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(
            F.element_at(F.col("t"), i).alias("w1"),
            F.element_at(F.col("t"), i + 1).alias("w2"),
        ),
    )
    big = (
        toks.filter(F.size("t") >= 2)
        .select("doc_id", F.explode(pairs).alias("bg"))
        .select("doc_id", "bg.w1", "bg.w2")
    )
    c12 = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = big.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        toks.select(F.explode("t").alias("u"))
        .agg(F.count_distinct("u").alias("v"))
    )
    lp = (
        big.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            fixed_round(
                F.log(
                    (F.col("c12") + 1).cast("double")
                    / (F.col("c1") + F.col("v"))
                ),
                9,
            )
            .cast("decimal(20,9)")
            .alias("lp"),
        )
    )
    agg = lp.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("lp").cast("double").alias("sum_logprob"),
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        F.coalesce("sum_logprob", F.lit(0.0)).alias("sum_logprob"),
        (F.col("sum_logprob") / F.col("n_bigrams")).alias("avg_logprob"),
    )


# ---------------------------------------------------------------------------
# document chunking — fixed-size overlapping windows, the standard LLM
# context-prep transform (RAG indexing / long-doc pretraining): stride
# 400 chars with 100 chars of overlap (chunk = 500). Native explode of
# a start-offset sequence into substring slices — no Python, no
# shuffle; the explode streams row-by-row into the projection, so at
# 100 TB the expansion is pipeline-parallel with the scan and output
# volume is input × (1 + overlap/stride), never materialized per doc.
# Empty docs yield one empty chunk (greatest(n,1)) so no document
# silently disappears from the corpus. Character (not byte) semantics
# on both engines: length()/substr() count codepoints in Spark and
# DuckDB alike.
# ---------------------------------------------------------------------------
_CHUNK_LEN, _CHUNK_STRIDE = 500, 400


@register(
    "text_chunk_documents",
    oracle=f"""
    SELECT doc_id,
           CAST(start // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(start AS BIGINT) AS chunk_start,
           CAST(length(chunk_text) AS BIGINT) AS chunk_chars,
           md5(chunk_text) AS chunk_fp
    FROM (
      SELECT doc_id,
             unnest(range(0, greatest(length(text), 1),
                          {_CHUNK_STRIDE})) AS start,
             text
      FROM documents
    ), LATERAL (SELECT substr(text, start + 1, {_CHUNK_LEN})
                AS chunk_text)
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text"), F.lit(1)) - 1,
        F.lit(_CHUNK_STRIDE),
    )
    chunk = F.expr(f"substring(text, start + 1, {_CHUNK_LEN})")
    return (
        docs.select("doc_id", "text", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / _CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_chars"),
            F.md5(chunk).alias("chunk_fp"),
        )
    )


# ---------------------------------------------------------------------------
# Hashing-trick vectorizer — the fixed-width bag-of-words featurizer
# (sklearn's HashingVectorizer / Vowpal Wabbit's core idea): tokens
# hash into D buckets, so the feature space is CONSTANT-width with no
# vocabulary to build, broadcast, or keep consistent across training
# runs — the property that matters when the corpus (and vocabulary)
# is 100 TB and growing. One explode + one (doc, bucket) hash
# aggregate, map-side combinable; collisions are part of the contract
# (same portable hash60 both engines, so the oracle reproduces every
# collision exactly). Output: the sparse (doc, bucket, tf) triples +
# per-doc L1 mass — the COO layout a trainer ingests.
# ---------------------------------------------------------------------------
_HV_D = 128  # feature buckets


@register(
    "text_hashing_vectorizer",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t
      FROM documents WHERE doc_id % 5 = 0
    ),
    b AS (
      SELECT doc_id,
             ({duck_hash60("'hv:' || t")}) % {_HV_D} AS bucket
      FROM tok WHERE t <> ''
    ),
    coo AS (
      SELECT doc_id, bucket, COUNT(*) AS tf
      FROM b GROUP BY doc_id, bucket
    )
    SELECT doc_id, bucket, tf,
           CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS doc_l1
    FROM coo
    ORDER BY doc_id, bucket
    """,
)
def text_hashing_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    ).filter(F.col("t") != "")
    b = tok.select(
        "doc_id",
        F.pmod(
            hash60(F.concat(F.lit("hv:"), F.col("t"))), F.lit(_HV_D)
        ).alias("bucket"),
    )
    coo = b.groupBy("doc_id", "bucket").agg(F.count("*").alias("tf"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id")
    return coo.select(
        "doc_id",
        "bucket",
        "tf",
        F.sum("tf").over(w).alias("doc_l1"),
    ).orderBy("doc_id", "bucket")


# ---------------------------------------------------------------------------
# BPE TOKENIZER TRAINING as a distributed job — the missing piece
# between this module's token statistics and an actual trainable
# vocabulary: learn the first _BPE_ROUNDS byte-pair merge rules from
# the corpus, exactly the greedy algorithm of Sennrich et al. (ACL
# 2016) that GPT/Llama tokenizers build on.
#
# The classical formulation trains on the WORD-FREQUENCY TABLE, not
# the corpus — and that is also what makes it scale: one corpus scan
# collapses 100 TB of text into |vocab| rows (word, freq), and every
# merge round after that touches only the vocabulary (pair explode →
# weighted count → 1-row argmax broadcast → map-side token rewrite).
# No round rescans the corpus; cost per round is O(vocab · word_len).
#
# Token-sequence encoding (the part that makes a STRING carry exact
# token-tuple semantics): tokens are joined with a DOUBLE chr(31)
# separator and the string is padded with one double-separator at
# each end —  ␟␟t₁␟␟t₂␟␟…␟␟tₙ␟␟.  A merge of pair (a,b) is then
#   replace(toks, ␟a␟␟b␟ → ␟ab␟)
# i.e. the pattern consumes only the INNER separator of each
# boundary. Two properties follow, both load-bearing:
#  * boundary anchoring — a naive single-separator replace(a␟b→ab)
#    can match ACROSS token boundaries (pair (a,s) on tokens
#    [f,a,st] matches the "s" prefix of "st" and corrupts the
#    vocabulary; measured on the real fixture at merge round 13).
#    With the margins the char after b must be a separator, so a
#    token-prefix can never false-match.
#  * exact run semantics — on a run [a,a,a,a] each match leaves the
#    OUTER separator for its neighbour, so left-to-right
#    non-overlapping replace merges tokens (0,1) and (2,3) exactly
#    like reference BPE, not [aa,a,a].
# tests/test_extensions.py pins this string encoding against a pure
# token-tuple reference implementation for 15 rounds on the real
# fixture vocabulary — well past the round-13 divergence the naive
# encoding exhibits.
#
# The argmax is (count DESC, pair ASC): bitwise-deterministic, so
# all _BPE_ROUNDS rounds — each depending on the previous round's
# winner — replay exactly on both engines; the oracle unrolls the
# loop as CTE rounds with the identical replace.
# ---------------------------------------------------------------------------
_BPE_ROUNDS = 5
# chr(31)/char(31): the unit-separator control char, absent from the
# ASCII corpus by construction.
_D_SEP = "chr(31)"
_D_SEP2 = "(chr(31) || chr(31))"
_S_SEP = "char(31)"
_S_SEP2 = "(char(31) || char(31))"


# the default (whitespace) pre-tokenizer's word-frequency CTE; the
# byte-level variant swaps in the GPT-2-style regex one below
_BPE_WF_SQL = """
    wf AS (
      SELECT word, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word
    )"""


def _bpe_oracle(wf_sql: str = _BPE_WF_SQL) -> str:
    ctes = [wf_sql + f""",
    t0 AS (
      SELECT word, freq,
             {_D_SEP2} || array_to_string(
               list_transform(range(1, strlen(word) + 1), i -> word[i]),
               {_D_SEP2}) || {_D_SEP2} AS toks
      FROM wf
    )"""]
    for r in range(1, _BPE_ROUNDS + 1):
        p = r - 1
        ctes.append(f"""
    p{r} AS (
      SELECT parts[i] AS a, parts[i + 1] AS b, SUM(freq) AS cnt
      FROM (SELECT freq,
                   list_filter(string_split(toks, {_D_SEP2}),
                               x -> x <> '') AS parts
            FROM t{p}) s,
           LATERAL (SELECT unnest(range(1, len(parts))) AS i) ix
      GROUP BY 1, 2
    ),
    b{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
    t{r} AS (
      SELECT word, freq,
             replace(toks,
                     (SELECT {_D_SEP} || a || {_D_SEP2} || b || {_D_SEP}
                      FROM b{r}),
                     (SELECT {_D_SEP} || a || b || {_D_SEP} FROM b{r}))
                 AS toks
      FROM t{p}
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT {r} AS round, a AS merge_left, b AS merge_right,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return (
        "WITH " + ",".join(ctes)
        + f"\n    SELECT CAST(round AS BIGINT) AS round, merge_left,"
          f" merge_right, pair_count FROM ({unions}) ORDER BY round"
    )


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Run the merge loop ONCE for both queries: returns
    (per-round winner DataFrames, final (word, freq, toks) table).

    Cache discipline: exactly TWO things are cached — the round-0
    vocabulary (the product of the one corpus scan; everything after
    it must never rescan the corpus) and each round's 1-row winner
    (read by both the next round's rewrite and the final union). The
    per-round rewritten vocabularies are deliberately NOT cached:
    they are narrow string expressions over |vocab| rows whose
    recomputation from cached toks0 costs microseconds, while eager
    materialize-and-unpersist per round was measured 4.7× slower
    (extra job per round + loss of Spark's plan-equality cache reuse
    across bench reps, which keeps the cached footprint CONSTANT —
    re-invocations map to the same CacheManager entries rather than
    accumulating copies).
    """
    docs = _docs(spark, sf_dir)
    wf = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    return _bpe_merge_loop(wf)


def _bpe_merge_loop(wf: DataFrame):
    """The chr(31)-separator merge loop over ANY (word, freq)
    pre-token table — shared by the whitespace trainer above and the
    byte-level (GPT-2-style) trainer below."""
    toks = wf.select(
        "word",
        "freq",
        F.expr(
            f"{_S_SEP2} || array_join(transform(sequence(1, length(word)),"
            f" i -> substring(word, i, 1)), {_S_SEP2}) || {_S_SEP2}"
        ).alias("toks"),
    ).cache()  # the corpus-scan product; every round reads from here
    merges = []
    for r in range(1, _BPE_ROUNDS + 1):
        pairs = (
            toks.select(
                "freq",
                F.expr(
                    f"filter(split(toks, {_S_SEP2}), x -> x <> '')"
                ).alias("parts"),
            )
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "CASE WHEN size(parts) < 2 THEN array() "
                        "ELSE transform(sequence(1, size(parts) - 1),"
                        " i -> struct(parts[i - 1] AS a, parts[i] AS b))"
                        " END"
                    )
                ).alias("pr"),
            )
            .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(
            F.desc("cnt"), "a", "b"
        ).limit(1).withColumn("round", F.lit(r).cast("long")).cache()
        merges.append(best)
        toks = toks.crossJoin(
            F.broadcast(best.select(
                F.col("a").alias("_ba"), F.col("b").alias("_bb")
            ))
        ).select(
            "word",
            "freq",
            F.expr(
                f"replace(toks,"
                f" {_S_SEP} || _ba || {_S_SEP2} || _bb || {_S_SEP},"
                f" {_S_SEP} || _ba || _bb || {_S_SEP})"
            ).alias("toks"),
        )
    return merges, toks


@register("text_bpe_train_merges", oracle=_bpe_oracle())
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _bpe_train(spark, sf_dir)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out.select(
        "round",
        F.col("a").alias("merge_left"),
        F.col("b").alias("merge_right"),
        F.col("cnt").cast("long").alias("pair_count"),
    ).orderBy("round")


# ---------------------------------------------------------------------------
# BPE ENCODE — the consumer half of text_bpe_train_merges: apply the
# learned merge rules to tokenize the corpus and report per-document
# token statistics (the compression a tokenizer buys is THE metric a
# data pipeline tracks per release — tokens, not characters, are what
# training costs). The final (word → token-sequence) table is |vocab|
# rows and broadcasts into one map-side pass over the corpus: encode
# never shuffles document data, only the per-doc aggregate does.
# ---------------------------------------------------------------------------
def _bpe_encode_oracle() -> str:
    # reuse the training CTE chain; t{_BPE_ROUNDS} is the trained vocab
    base = _bpe_oracle()
    head = base[: base.rindex("\n    SELECT")]
    return head + f"""
    , dw AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    )
    SELECT dw.doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(len(list_filter(string_split(t.toks, {_D_SEP2}),
                                    x -> x <> ''))) AS BIGINT)
               AS n_tokens,
           CAST(SUM(strlen(dw.word)) AS BIGINT) AS n_chars
    FROM dw JOIN t{_BPE_ROUNDS} t ON t.word = dw.word
    WHERE dw.word <> ''
    GROUP BY dw.doc_id
    """


@register("text_bpe_encode", oracle=_bpe_encode_oracle())
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, final_toks = _bpe_train(spark, sf_dir)
    vocab = final_toks.select(
        "word",
        F.expr(
            f"size(filter(split(toks, {_S_SEP2}), x -> x <> ''))"
        ).alias("n_tok"),
    )
    dw = (
        _docs(spark, sf_dir)
        .select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    return (
        dw.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# BYTE-LEVEL BPE (GPT-2 style, Radford et al. 2019 §2.2): before any
# merge learning, text is PRE-TOKENIZED by a regex whose signature
# feature is that a single leading space ATTACHES to the following
# token (" word" and "word" are different pre-tokens, which is why
# GPT-2 vocabularies are full of Ġ-prefixed entries), and the base
# alphabet is the 256 BYTES — no OOV is possible because every byte is
# a token (the "byte fallback"). Merges then operate on byte symbols
# inside each pre-token, never across pre-token boundaries.
#
# Cross-engine honesty: the verbatim GPT-2 pattern needs \p{L} classes
# and a negative lookahead ((?!\S)), which RE2 (DuckDB) does not
# support — so this implements the GPT-2-STYLE simplification below,
# IDENTICAL in both engines (plain ASCII classes, leftmost-first
# alternation in both Java regex and RE2): letters / digits / other
# punctuation runs, each with one optional leading space, else a space
# run. Divergence from GPT-2, documented: a run of 2+ spaces becomes a
# standalone space token (GPT-2's lookahead would donate its last
# space to the next word). On the ASCII-guarded corpus (the multimodal
# guard: every char one byte) byte symbols ARE the chars, so the
# bytes->printable remap GPT-2 applies for display purposes is the
# identity here and the chr(31) merge discipline applies unchanged.
# ---------------------------------------------------------------------------
_BPE_BYTE_REGEX = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"
_BPE_BYTE_GUARD_SQL = "strlen(text) > 0 AND length(text) = strlen(text)"
_BPE_BYTE_WF_SQL = f"""
    wf AS (
      SELECT word, COUNT(*) AS freq
      FROM (SELECT unnest(regexp_extract_all(text,
                ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +')) AS word
            FROM documents WHERE {_BPE_BYTE_GUARD_SQL})
      WHERE word <> '' GROUP BY word
    )"""


def _bpe_byte_pretokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, word) — one row per GPT-2-style pre-token occurrence,
    ASCII-guarded so byte symbols are exactly the chars both engines
    index."""
    docs = _docs(spark, sf_dir).filter(
        (F.octet_length("text") > 0)
        & (F.length("text") == F.octet_length("text"))
    )
    return docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(text, '{_BPE_BYTE_REGEX}', 0)")
        ).alias("word"),
    ).filter(F.col("word") != "")


def _bpe_byte_train(spark: SparkSession, sf_dir: str):
    wf = (
        _bpe_byte_pretokens(spark, sf_dir)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    return _bpe_merge_loop(wf)


def _bpe_byte_encode_oracle() -> str:
    base = _bpe_oracle(_BPE_BYTE_WF_SQL)
    head = base[: base.rindex("\n    SELECT")]
    return head + f"""
    , dw AS (
      SELECT doc_id, unnest(regexp_extract_all(text,
               ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +')) AS word
      FROM documents WHERE {_BPE_BYTE_GUARD_SQL}
    )
    SELECT dw.doc_id,
           COUNT(*) AS n_pretokens,
           CAST(SUM(len(list_filter(string_split(t.toks, {_D_SEP2}),
                                    x -> x <> ''))) AS BIGINT)
               AS n_tokens,
           CAST(SUM(strlen(dw.word)) AS BIGINT) AS n_bytes
    FROM dw JOIN t{_BPE_ROUNDS} t ON t.word = dw.word
    WHERE dw.word <> ''
    GROUP BY dw.doc_id
    """


@register("text_bpe_byte_encode", oracle=_bpe_byte_encode_oracle())
def text_bpe_byte_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE end-to-end: GPT-2-style regex pre-tokenization
    (leading space attaches to the word — the Ġ convention), byte
    alphabet with no OOV, the shared chr(31) merge loop for
    _BPE_ROUNDS rounds, then the per-document token accounting that a
    tokenizer release is judged by. The trained vocab is |pretokens|
    rows and BROADCASTS into one map-side pass over the corpus — the
    encode never shuffles document data, only the per-doc aggregate
    does (the text_bpe_encode scale shape).
    Reference analogue: none; Radford et al. 2019 §2.2 + the
    Sennrich/Gage merge loop of text_bpe_train_merges."""
    _, final_toks = _bpe_byte_train(spark, sf_dir)
    vocab = final_toks.select(
        "word",
        F.expr(
            f"size(filter(split(toks, {_S_SEP2}), x -> x <> ''))"
        ).alias("n_tok"),
    )
    dw = _bpe_byte_pretokens(spark, sf_dir)
    return (
        dw.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_pretokens"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum(F.octet_length("word")).cast("long").alias("n_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher quality rules — the published document-level heuristics from
# Rae et al. 2021 ("Scaling Language Models: ... Gopher", §A1.1 /
# Table A1), as used by MassiveWeb and most open-data pipelines since:
#   1. 50 <= word count <= 100,000
#   2. 3 <= mean word length <= 10
#   3. symbol-to-word ratio ('#' or '...') < 0.1
#   4. < 90% of lines start with a bullet ('-' or '*')
#   5. < 30% of lines end with an ellipsis ('...')
#   6. > 80% of words contain at least one alphabetic character
#   7. at least 2 hits from a small function-word list
# Absent from the reference (numbers-only filter, math.c:161-164); this
# is the canonical pre-training corpus filter.
#
# Scale: one narrow projection, zero shuffles, all-native Column
# expressions in whole-stage codegen — at 100 TB this is a pure
# map-side scan whose cost is the parquet read itself. Every ratio is
# ONE double division of exact integer counts (IEEE correctly rounded,
# so the rule booleans are bitwise-identical cross-engine).
# ---------------------------------------------------------------------------
_GOPHER_STOP = ("the", "be", "to", "of", "and", "that", "have", "with")
_D_GSTOP_IN = ", ".join(f"'{w}'" for w in _GOPHER_STOP)


@register(
    "text_gopher_rules",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             string_split(text, chr(10)) AS lns,
             len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_symbols
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             list_aggregate(list_transform(toks, t -> length(t)), 'sum')
                 AS sum_len,
             len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                 AS alpha_words,
             len(list_filter(toks, t -> t IN ({_D_GSTOP_IN}))) AS n_stop,
             len(lns) AS n_lines,
             len(list_filter(lns, l -> regexp_matches(l, '^[-*]')))
                 AS bullet_lines,
             len(list_filter(lns, l -> regexp_matches(l, '\\.\\.\\.$')))
                 AS ellipsis_lines,
             n_symbols
      FROM s
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(sum_len AS DOUBLE) / n_words AS mean_word_len,
           CAST(alpha_words AS DOUBLE) / n_words AS alpha_ratio,
           CAST(n_symbols AS DOUBLE) / n_words AS symbol_ratio,
           CAST(n_stop AS BIGINT) AS n_gopher_stop,
           (n_words BETWEEN 50 AND 100000
            AND CAST(sum_len AS DOUBLE) / n_words >= 3.0
            AND CAST(sum_len AS DOUBLE) / n_words <= 10.0
            AND CAST(n_symbols AS DOUBLE) / n_words < 0.1
            AND CAST(bullet_lines AS DOUBLE) / n_lines < 0.9
            AND CAST(ellipsis_lines AS DOUBLE) / n_lines < 0.3
            AND CAST(alpha_words AS DOUBLE) / n_words > 0.8
            AND n_stop >= 2) AS keep
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _gopher_frame(_docs(spark, sf_dir))


def _gopher_frame(df: DataFrame) -> DataFrame:
    """The Gopher rule projection over any (doc_id, text) frame —
    shared by the batch query and its streaming twin (stateless, so
    batch ≡ stream is exact)."""
    t = tokens(F.col("text"))
    lns = F.split(F.col("text"), "\n")
    gstop = F.array(*[F.lit(w) for w in _GOPHER_STOP])
    m = df.select(
        "doc_id",
        F.size(t).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        ).cast("long").alias("sum_len"),
        F.size(F.filter(t, lambda x: x.rlike("[a-z]")))
        .cast("long")
        .alias("alpha_words"),
        F.size(F.filter(t, lambda x: F.array_contains(gstop, x)))
        .cast("long")
        .alias("n_stop"),
        F.size(lns).cast("long").alias("n_lines"),
        F.size(F.filter(lns, lambda l: l.rlike("^[-*]")))
        .cast("long")
        .alias("bullet_lines"),
        F.size(F.filter(lns, lambda l: l.rlike(r"\.\.\.$")))
        .cast("long")
        .alias("ellipsis_lines"),
        F.regexp_count(F.col("text"), F.lit(r"#|\.\.\."))
        .cast("long")
        .alias("n_symbols"),
    )
    mean_len = F.col("sum_len").cast("double") / F.col("n_words")
    alpha_ratio = F.col("alpha_words").cast("double") / F.col("n_words")
    symbol_ratio = F.col("n_symbols").cast("double") / F.col("n_words")
    keep = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100000)
        & (mean_len >= 3.0)
        & (mean_len <= 10.0)
        & (symbol_ratio < 0.1)
        & (F.col("bullet_lines").cast("double") / F.col("n_lines") < 0.9)
        & (F.col("ellipsis_lines").cast("double") / F.col("n_lines") < 0.3)
        & (alpha_ratio > 0.8)
        & (F.col("n_stop") >= 2)
    )
    return m.select(
        "doc_id",
        "n_words",
        mean_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        symbol_ratio.alias("symbol_ratio"),
        F.col("n_stop").alias("n_gopher_stop"),
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# STREAMING curation — the same Gopher rules applied IN-FLIGHT over a
# bounded document stream, emitting only the kept documents. This is
# how a production ingest actually runs the filter (curate on arrival,
# not in a nightly batch); the projection is stateless, so batch and
# stream are provably identical and the oracle is the batch SQL with
# the keep predicate applied. availableNow replay, memory sink, no
# watermark or state — pure pipeline parallelism at any volume.
# ---------------------------------------------------------------------------
@register(
    "stream_gopher_filter",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             string_split(text, chr(10)) AS lns,
             len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_symbols
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             list_aggregate(list_transform(toks, t -> length(t)), 'sum')
                 AS sum_len,
             len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                 AS alpha_words,
             len(list_filter(toks, t -> t IN ({_D_GSTOP_IN}))) AS n_stop,
             len(lns) AS n_lines,
             len(list_filter(lns, l -> regexp_matches(l, '^[-*]')))
                 AS bullet_lines,
             len(list_filter(lns, l -> regexp_matches(l, '\\.\\.\\.$')))
                 AS ellipsis_lines,
             n_symbols
      FROM s
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_stop AS BIGINT) AS n_gopher_stop
    FROM m
    WHERE n_words BETWEEN 50 AND 100000
      AND CAST(sum_len AS DOUBLE) / n_words >= 3.0
      AND CAST(sum_len AS DOUBLE) / n_words <= 10.0
      AND CAST(n_symbols AS DOUBLE) / n_words < 0.1
      AND CAST(bullet_lines AS DOUBLE) / n_lines < 0.9
      AND CAST(ellipsis_lines AS DOUBLE) / n_lines < 0.3
      AND CAST(alpha_words AS DOUBLE) / n_words > 0.8
      AND n_stop >= 2
    """,
)
def stream_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.pipeline import (
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, f"{sf_dir}/documents.parquet")
    kept = (
        _gopher_frame(stream)
        .filter(F.col("keep"))
        .select("doc_id", "n_words", "n_gopher_stop")
    )
    return run_stream_to_memory(kept, "stream_gopher_filter")


# ---------------------------------------------------------------------------
# RAKE KEYWORD EXTRACTION — Rapid Automatic Keyword Extraction (Rose et
# al., "Text Mining: Applications and Theory", 2010): split each
# document into candidate phrases at stopword boundaries, then score
# every content word by degree/frequency, where freq(w) = number of
# occurrences and degree(w) = Σ over w's occurrences of its phrase's
# length (a word that keeps company in long phrases scores high). The
# stopword set is fixed and includes two high-frequency fixture tokens
# so phrases genuinely split. Phrase segmentation is the gaps-and-
# islands identity run_id = pos − dense-rank-of-kept-positions: both
# engines compute it with one per-document window over token
# positions. freq/degree are exact integers; score is one IEEE
# division; the report is the top-15 words by (score, freq, word).
#
# Scale: one explode (corpus token volume), per-DOC windows (small,
# numerous partitions — never a corpus-wide sort), two hash
# aggregates, and a global top-15 via TakeOrderedAndProject.
# ---------------------------------------------------------------------------
RAKE_STOPWORDS = ("the", "a", "and", "of", "join", "scan")
RAKE_TOPK = 15


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, u['p'] AS p, u['w'] AS w
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk) + 1),
                                     i -> {{'p': i, 'w': tk[i]}})) AS u
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
      )
    ),
    kept AS (
      SELECT doc_id, w,
             p - row_number() OVER (PARTITION BY doc_id ORDER BY p)
                 AS run
      FROM pos
      WHERE w NOT IN {RAKE_STOPWORDS!r} AND w <> ''
    ),
    phrase AS (
      SELECT doc_id, run, COUNT(*) AS plen
      FROM kept GROUP BY doc_id, run
    ),
    stats AS (
      SELECT k.w,
             COUNT(*) AS freq,
             SUM(ph.plen) AS degree
      FROM kept k JOIN phrase ph USING (doc_id, run)
      GROUP BY k.w
    )
    SELECT w AS word,
           CAST(freq AS BIGINT) AS freq,
           CAST(degree AS BIGINT) AS degree,
           CAST(degree AS DOUBLE) / freq AS rake_score
    FROM stats
    ORDER BY rake_score DESC, freq DESC, word
    LIMIT {RAKE_TOPK}
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("p0", "w")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "w")
    kept = pos.filter(
        (~F.col("w").isin(*RAKE_STOPWORDS)) & (F.col("w") != "")
    ).select(
        "doc_id",
        "w",
        (
            F.col("p")
            - F.row_number().over(
                Window.partitionBy("doc_id").orderBy("p")
            )
        ).alias("run"),
    )
    phrase = kept.groupBy("doc_id", "run").agg(F.count("*").alias("plen"))
    stats = (
        kept.join(phrase, ["doc_id", "run"])
        .groupBy("w")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("degree"))
    )
    score = F.col("degree").cast("double") / F.col("freq")
    return (
        stats.select(
            F.col("w").alias("word"),
            F.col("freq").cast("long").alias("freq"),
            F.col("degree").cast("long").alias("degree"),
            score.alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), F.desc("freq"), F.asc("word"))
        .limit(RAKE_TOPK)
    )


# ---------------------------------------------------------------------------
# FLESCH READING EASE — the classic readability score (Flesch 1948)
# every text-quality stack reports next to Gopher rules:
#   206.835 − 1.015·(words/sentences) − 84.6·(syllables/word).
# Fixture documents are single-line with no sentence punctuation, so
# each document IS one sentence (the same corpus adaptation
# text_repetition_filter documents for Gopher's line rules).
# Syllables use the standard dictionary-free heuristic: count vowel
# GROUPS ([aeiouy]+ runs), subtract one silent trailing 'e' (kept for
# '-le' endings: "table" = 2), floor at 1 per word.
#
# Determinism: word/syllable counts are exact integers; the score is
# one fixed-order IEEE chain (literal·division products, two
# subtracts) on exact ints — identical in both engines — then pinned
# through the shared floor(x·1e6 + 0.5) fixed point. The difficulty
# band is an integer comparison on the fixed-point score.
#
# Scale: pure map-side — per-document higher-order functions
# (transform/aggregate over the token array, JVM codegen, no explode,
# no shuffle except the final presentation sort).
# ---------------------------------------------------------------------------
_D_SYL = (
    "list_aggregate(list_transform(string_split(text, ' '), "
    "w -> GREATEST(1, CAST(len(regexp_extract_all(w, '[aeiouy]+')) "
    "AS BIGINT) - CASE WHEN length(w) > 2 AND w LIKE '%e' "
    "AND w NOT LIKE '%le' THEN 1 ELSE 0 END)), 'sum')"
)


@register(
    "text_flesch_readability",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST({_D_SYL} AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_syllables,
           CAST(floor((206.835
                       - 1.015 * (CAST(n_words AS DOUBLE) / 1.0)
                       - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
                      * 1000000.0 + 0.5) AS BIGINT) AS flesch_fp,
           CASE
             WHEN floor((206.835 - 1.015 * (CAST(n_words AS DOUBLE) / 1.0)
                         - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
                        * 1000000.0 + 0.5) >= 70000000 THEN 'easy'
             WHEN floor((206.835 - 1.015 * (CAST(n_words AS DOUBLE) / 1.0)
                         - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
                        * 1000000.0 + 0.5) >= 30000000 THEN 'standard'
             WHEN floor((206.835 - 1.015 * (CAST(n_words AS DOUBLE) / 1.0)
                         - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
                        * 1000000.0 + 0.5) >= 0 THEN 'difficult'
             ELSE 'very_confusing'
           END AS band
    FROM m
    ORDER BY doc_id
    """,
)
def text_flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    t = tokens(F.col("text"))

    def _syl(w):
        vg = F.regexp_count(w, F.lit("[aeiouy]+")).cast("long")
        silent = (
            F.when(
                (F.length(w) > 2)
                & w.endswith("e")
                & ~w.endswith("le"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )
        return F.greatest(F.lit(1).cast("long"), vg - silent)

    m = df.select(
        "doc_id",
        F.size(t).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(t, _syl),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words").cast("double") / F.lit(1.0))
        - F.lit(84.6)
        * (F.col("n_syllables").cast("double") / F.col("n_words"))
    )
    fp = F.floor(flesch * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        m.select(
            "doc_id",
            "n_words",
            "n_syllables",
            fp.alias("flesch_fp"),
            F.when(fp >= 70000000, "easy")
            .when(fp >= 30000000, "standard")
            .when(fp >= 0, "difficult")
            .otherwise("very_confusing")
            .alias("band"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# PMI COLLOCATIONS — pointwise-mutual-information-ranked bigrams
# (Church & Hanks, CL'90), the canonical collocation extractor next to
# RAKE's degree scoring: PMI(x,y) = log(N·c(xy)/(c(x)·c(y))). log is
# monotone, so the RANKING never needs it — the lift N·c(xy)/(c(x)c(y))
# is ordered as an exact 1e6-scaled integer quotient instead
# (c_xy·N·1e6 div c_x·c_y — int64-safe while c_xy·N < 9.2e12; the
# 270k-token sf0.1 corpus sits 4 orders below, and a 100 TB corpus
# shards this per domain before ranking). Bigrams below MIN_COUNT are
# pruned before any join — the standard sparsity cut that also kills
# the hapax-pair PMI pathology.
#
# Scale: one explode for bigram counts, one for unigram counts, both
# partial-aggregatable; the unigram table is vocabulary-sized and
# broadcast onto the pruned bigram table twice (w1, w2); top-k is
# TakeOrderedAndProject.
# ---------------------------------------------------------------------------
PMI_MIN_COUNT = 5
PMI_TOPK = 25


@register(
    "text_pmi_collocations",
    oracle=f"""
    WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
    n AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS n FROM tok),
    uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w
    ),
    big AS (
      SELECT u['w1'] AS w1, u['w2'] AS w2, CAST(COUNT(*) AS BIGINT) AS c_xy
      FROM (
        SELECT unnest(list_transform(range(1, len(t)),
                      i -> {{'w1': t[i], 'w2': t[i + 1]}})) AS u
        FROM tok
      )
      GROUP BY 1, 2
      HAVING COUNT(*) >= {PMI_MIN_COUNT}
    )
    SELECT big.w1, big.w2, big.c_xy,
           u1.c AS c_x, u2.c AS c_y,
           CAST(big.c_xy * n.n * 1000000 // (u1.c * u2.c) AS BIGINT)
               AS lift_fp
    FROM big
    JOIN uni u1 ON u1.w = big.w1
    JOIN uni u2 ON u2.w = big.w2
    CROSS JOIN n
    ORDER BY lift_fp DESC, w1, w2
    LIMIT {PMI_TOPK}
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(tokens(F.col("text")).alias("t"))
    n = toks.agg(F.sum(F.size("t")).cast("long").alias("n"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    t = F.col("t")
    # size >= 2 guard (r11 audit): sequence(1, 0) descends on a 1-token
    # document and element_at(t, 0) throws; DuckDB's range is
    # exclusive-upper so only the Spark side can crash.
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("w1"),
                F.element_at(t, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = (
        toks.select(F.explode(pairs).alias("u"))
        .select(F.col("u.w1").alias("w1"), F.col("u.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c_xy"))
        .filter(F.col("c_xy") >= PMI_MIN_COUNT)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    return (
        big.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1", "w2", "c_xy", "c_x", "c_y",
            F.expr("c_xy * n * 1000000 div (c_x * c_y)").alias("lift_fp"),
        )
        .orderBy(F.desc("lift_fp"), F.asc("w1"), F.asc("w2"))
        .limit(PMI_TOPK)
    )


# ---------------------------------------------------------------------------
# HEAPS'-LAW VOCABULARY GROWTH — the V(n) curve (Heaps 1978; Herdan):
# distinct vocabulary size as a function of tokens ingested, THE
# corpus-health diagnostic next to token counts — a crawl whose curve
# goes flat is re-crawling itself (templates/dup content); one that
# stays near-linear is unfiltered noise. Types here are word BIGRAMS
# (n-gram Heaps): the fixture's unigram vocabulary saturates inside
# the first decile (31 types), while the bigram vocabulary keeps
# growing through the stream — the same reason production curves are
# usually reported over n-grams. Emitted per decile of the bigram
# stream (doc_id, position order): tokens seen, NEW types first
# appearing in that decile, cumulative vocabulary, and the cumulative
# type-token ratio as 1e6 fixed point. No logs anywhere — the curve
# itself is exact integers, and downstream fitting of the Heaps
# exponent happens on the emitted points.
#
# Determinism: global token positions are a pure function of
# (doc_id, position); first-occurrence = MIN(gpos) per type; decile
# membership is ceil(10·fp/n) = (10·fp + n − 1) div n (the lorenz
# idiom); everything BIGINT until nothing.
#
# Scale: positions are assigned TWO-LEVEL (doc_id-bucket counts +
# exclusive prefix over the bucket table, broadcast back — the
# iqr/pack_sequences discipline; no global token sort); firsts is one
# hash aggregate over the exploded stream; the decile table is ≤10
# rows before its window. The oracle uses a plain global row_number —
# same values, DuckDB-sized data.
# ---------------------------------------------------------------------------
@register(
    "text_heaps_vocab_growth",
    oracle="""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, u['p'] AS p,
             t[u['p']] || ' ' || t[u['p'] + 1] AS w
      FROM (
        SELECT doc_id, t,
               unnest(list_transform(range(1, len(t)),
                                     i -> {'p': i})) AS u
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      )
    ),
    g AS (
      SELECT w, row_number() OVER (ORDER BY doc_id, p) AS gpos FROM tok
    ),
    n AS (SELECT COUNT(*) AS n FROM g),
    firsts AS (SELECT w, MIN(gpos) AS fp FROM g GROUP BY w),
    d AS (
      SELECT (10 * fp + n.n - 1) // n.n AS decile, n.n AS n
      FROM firsts CROSS JOIN n
    ),
    per AS (
      SELECT decile, MAX(n) AS n, COUNT(*) AS new_types
      FROM d GROUP BY decile
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST((decile * n) // 10 AS BIGINT) AS tokens_seen,
           CAST(new_types AS BIGINT) AS new_types,
           CAST(SUM(new_types) OVER w AS BIGINT) AS vocab_cum,
           CAST(CAST(SUM(new_types) OVER w AS BIGINT) * 1000000
                // ((decile * n) // 10) AS BIGINT) AS ttr_fp
    FROM per
    WINDOW w AS (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY decile
    """,
)
def text_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    # Token array materialized BEFORE the pair lambda touches it — no
    # CSE inside lambda bodies, so inlined every element_at re-splits
    # the text (the shingle-pipeline trap; cost measured 6.1 s → the
    # split-once form at sf0.1).
    tarr = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    t = F.col("t")
    # Positioned bigram stream, with the size >= 2 guard (sequence
    # descends for 1-token docs — the r11 audit bug class).
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                i.alias("p"),
                F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1)
                ).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<p:int,w:string>>"))
    toks = tarr.select("doc_id", F.explode(pairs).alias("u")).select(
        "doc_id", F.col("u.p").alias("p"), F.col("u.w").alias("w")
    )
    counts = toks.groupBy("doc_id").agg(F.count("*").alias("cnt"))
    bcounts = counts.select(
        F.shiftright("doc_id", 8).alias("bucket"), "doc_id", "cnt"
    )
    bsum = bcounts.groupBy("bucket").agg(F.sum("cnt").alias("bn"))
    wb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    boff = bsum.select(
        "bucket", F.coalesce(F.sum("bn").over(wb), F.lit(0)).alias("boff")
    )
    wd = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bcounts.join(F.broadcast(boff), "bucket")
        .select(
            "doc_id",
            (
                F.col("boff")
                + F.coalesce(F.sum("cnt").over(wd), F.lit(0))
            ).alias("off"),
        )
    )
    # No broadcast hint on offsets (r12 audit): it is one row per DOC
    # — |docs|-cardinality, which outgrows the broadcast budget at
    # corpus scale. The bucket table above stays broadcast (|docs|/256
    # rows); this join lets Catalyst/AQE pick (it broadcasts at
    # fixture scale anyway, shuffles when |docs| demands it).
    g = toks.join(offsets, "doc_id").select(
        "w", (F.col("off") + F.col("p")).alias("gpos")
    )
    n_tab = counts.agg(F.sum("cnt").alias("n"))
    firsts = g.groupBy("w").agg(F.min("gpos").alias("fp"))
    d = firsts.crossJoin(F.broadcast(n_tab)).select(
        F.expr("(10 * fp + n - 1) div n").alias("decile"), "n"
    )
    per = d.groupBy("decile").agg(
        F.max("n").alias("n"), F.count("*").alias("new_types")
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per.select(
            F.col("decile").cast("long").alias("decile"),
            F.expr("(decile * n) div 10").cast("long").alias(
                "tokens_seen"
            ),
            F.col("new_types").cast("long").alias("new_types"),
            F.sum("new_types").over(wcum).cast("long").alias("vocab_cum"),
        )
        .select(
            "decile",
            "tokens_seen",
            "new_types",
            "vocab_cum",
            F.expr("vocab_cum * 1000000 div tokens_seen")
            .cast("long")
            .alias("ttr_fp"),
        )
        .orderBy("decile")
    )

# ---------------------------------------------------------------------------
# QUALITY-CLASSIFIER TRAIN + SCORE (VERDICT r14 #5) — the missing
# LLM-curation stage: a fastText-style LINEAR classifier over the
# hashing-vectorizer feature space, trained distributed and scored
# map-side. The learner is a batch PERCEPTRON, chosen deliberately:
# every quantity is an INTEGER (tf counts, ±1 labels, weight sums), so
# training rounds are exact in any aggregation order and the DuckDB
# oracle replays them bitwise (the emb_pca_power_iteration discipline,
# with no fixed-point scaling even needed).
#
#   round 1: w0 = 0 → every margin is 0 → every doc misclassified →
#            w1[b] = Σ_d y_d·tf_db (one aggregate);
#   round r: margin_d = Σ_b w[b]·tf_db (broadcast-w join, map-side
#            partial agg); misclassified = y·margin ≤ 0;
#            w += Σ_mis y_d·tf_db.
#
# Scale shape: the corpus feature matrix (doc, bucket, tf) is built
# ONCE (one explode + one aggregate, materialized like the shingle
# index); each round touches it twice with a ≤_HV_D-row broadcast
# weight vector — the corpus is never reshuffled, and the scoring pass
# a production pipeline runs (margin under the final w) is exactly the
# last round's map-side join. The training labels are a cheap held
# rule (n_words ≥ threshold — the Gopher length gate), the standard
# bootstrap for quality classifiers trained to imitate a rule set.
# Absent from the reference (single-record scope, math.c:322-353).
# ---------------------------------------------------------------------------
_QC_SALT = "qc:"
_QC_ROUNDS = 3
_QC_MIN_WORDS = 50


def _qc_oracle() -> str:
    h = duck_hash60(f"'{_QC_SALT}' || t")
    sql = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    coo AS (
      SELECT doc_id, ({h}) % {_HV_D} AS bucket, COUNT(*) AS tf
      FROM tok WHERE t <> '' GROUP BY 1, 2
    ),
    lab AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text, ' ')) >= {_QC_MIN_WORDS}
                  THEN 1 ELSE -1 END AS y
      FROM documents
    ),
    w1 AS (
      SELECT bucket, SUM(y * tf) AS w
      FROM coo JOIN lab USING (doc_id) GROUP BY bucket
    )"""
    prev = "w1"
    for r in range(2, _QC_ROUNDS + 1):
        sql += f""",
    m{r} AS (
      SELECT coo.doc_id, SUM({prev}.w * coo.tf) AS margin
      FROM coo JOIN {prev} USING (bucket) GROUP BY coo.doc_id
    ),
    up{r} AS (
      SELECT bucket, SUM(y * tf) AS dw
      FROM coo
      JOIN lab USING (doc_id)
      JOIN m{r} USING (doc_id)
      WHERE y * m{r}.margin <= 0
      GROUP BY bucket
    ),
    w{r} AS (
      SELECT COALESCE({prev}.bucket, up{r}.bucket) AS bucket,
             COALESCE({prev}.w, 0) + COALESCE(up{r}.dw, 0) AS w
      FROM {prev} FULL JOIN up{r} ON {prev}.bucket = up{r}.bucket
    )"""
        prev = f"w{r}"
    sql += f""",
    mf AS (
      SELECT coo.doc_id, SUM({prev}.w * coo.tf) AS margin
      FROM coo JOIN {prev} USING (bucket) GROUP BY coo.doc_id
    )
    SELECT lab.doc_id,
           CAST(lab.y AS INT) AS label,
           CAST(COALESCE(mf.margin, 0) AS BIGINT) AS margin,
           CAST(CASE WHEN COALESCE(mf.margin, 0) > 0 THEN 1 ELSE -1 END
                AS INT) AS pred,
           CAST(CASE WHEN (CASE WHEN COALESCE(mf.margin, 0) > 0
                           THEN 1 ELSE -1 END) = lab.y
                THEN 1 ELSE 0 END AS INT) AS correct
    FROM lab LEFT JOIN mf ON mf.doc_id = lab.doc_id
    ORDER BY lab.doc_id
    """
    return sql


@register("text_quality_classifier", oracle=_qc_oracle())
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    ).filter(F.col("t") != "")
    coo = (
        tok.select(
            "doc_id",
            F.pmod(
                hash60(F.concat(F.lit(_QC_SALT), F.col("t"))),
                F.lit(_HV_D),
            ).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
        # 2·rounds consumers: materialize once (the shingle-index
        # rule) so every round reuses the matrix instead of
        # re-exploding the corpus
        .localCheckpoint(eager=True)
    )
    lab = docs.select(
        "doc_id",
        F.when(
            F.size(tokens(F.col("text"))) >= _QC_MIN_WORDS, F.lit(1)
        )
        .otherwise(F.lit(-1))
        .alias("y"),
    )
    # round 1: zero weights → all misclassified → one aggregate
    w = (
        coo.join(lab, "doc_id")
        .groupBy("bucket")
        .agg(F.sum(F.col("y") * F.col("tf")).alias("w"))
    )

    def margins(wf: DataFrame) -> DataFrame:
        return (
            coo.join(F.broadcast(wf), "bucket")
            .groupBy("doc_id")
            .agg(F.sum(F.col("w") * F.col("tf")).alias("margin"))
        )

    for _ in range(2, _QC_ROUNDS + 1):
        w = w.localCheckpoint(eager=True)  # ≤ _HV_D rows per round
        m = margins(w)
        mis = (
            lab.join(m, "doc_id", "left")
            .filter(
                F.col("y") * F.coalesce("margin", F.lit(0)) <= 0
            )
            .select("doc_id", "y")
        )
        dw = (
            coo.join(mis, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("tf")).alias("dw"))
        )
        # USING-column full join: Spark emits ONE coalesced `bucket`
        w = w.join(dw, "bucket", "full").select(
            "bucket",
            (
                F.coalesce("w", F.lit(0)) + F.coalesce("dw", F.lit(0))
            ).alias("w"),
        )
    w = w.localCheckpoint(eager=True)
    mf = margins(w)
    margin = F.coalesce("margin", F.lit(0))
    pred = F.when(margin > 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        lab.join(mf, "doc_id", "left")
        .select(
            "doc_id",
            F.col("y").cast("int").alias("label"),
            margin.cast("long").alias("margin"),
            pred.cast("int").alias("pred"),
            F.when(pred == F.col("y"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("correct"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# CLASSIFIER LIFECYCLE: convergence-stopped training + held-out eval
# (VERDICT r15 #6). text_quality_classifier runs a FIXED 3 rounds; here
# training EARLY-STOPS on the integer stop rule the data pins: after
# each update round, ONE scalar (the misclassified count under the new
# weights) reaches the driver, and the loop stops at the first round
# that fails to improve it — keeping the previous (best-so-far)
# weights. On non-separable hashed features the perceptron oscillates
# rather than converging to zero, so no-improvement IS the convergence
# event (the graph_pagerank_converged discipline: an integer scalar per
# round, never a float tolerance). The stopping round is a pure
# function of the data: the DuckDB oracle unrolls all _QCE_MAX_ROUNDS
# rounds, rebuilds the per-round count sequence, and selects the SAME
# stop round closed-form — training replays bitwise because every
# quantity is an integer (aggregation-order-proof).
#
# Evaluation is leak-proof: weights train on sample_split_assign's
# 'train' grid cells (hash-mod buckets < 800) and the confusion matrix
# is computed ONLY on 'test' cells (>= 900) — doc_ids the trainer never
# saw, by the same hash both engines share. Output: one row of exact
# integer counts (tp/fp/fn/tn) plus precision/recall/F1 derived from
# those ints with identical two-operand IEEE arithmetic in both
# engines. Scale shape unchanged: the (doc, bucket, tf) matrix is
# built once; each round is two broadcast-weight passes over it; eval
# adds one map-side pass over the test rows.
# ---------------------------------------------------------------------------
_QCE_MAX_ROUNDS = 6


def _qce_oracle() -> str:
    from fluent_bit_filter_math_spark.operators.sampling import (
        SPLIT_KEY,
        TRAIN_PERMILLE,
        VAL_PERMILLE,
    )

    h = duck_hash60(f"'{_QC_SALT}' || t")
    sh = duck_hash60(f"'{SPLIT_KEY}' || CAST(doc_id AS VARCHAR)")
    R = _QCE_MAX_ROUNDS
    sql = f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    coo AS MATERIALIZED (
      SELECT doc_id, ({h}) % {_HV_D} AS bucket, COUNT(*) AS tf
      FROM tok WHERE t <> '' GROUP BY 1, 2
    ),
    lab AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN len(string_split(text, ' ')) >= {_QC_MIN_WORDS}
                  THEN 1 ELSE -1 END AS y,
             ({sh}) % 1000 AS cell
      FROM documents
    ),
    tr AS MATERIALIZED (SELECT doc_id, y FROM lab WHERE cell < {TRAIN_PERMILLE}),
    te AS MATERIALIZED (SELECT doc_id, y FROM lab WHERE cell >= {VAL_PERMILLE}),
    w1 AS MATERIALIZED (
      SELECT bucket, SUM(y * tf) AS w
      FROM coo JOIN tr USING (doc_id) GROUP BY bucket
    )"""
    prev = "w1"
    for r in range(2, R + 1):
        sql += f""",
    m{r} AS MATERIALIZED (
      SELECT coo.doc_id, SUM({prev}.w * coo.tf) AS margin
      FROM coo JOIN {prev} USING (bucket) GROUP BY coo.doc_id
    ),
    up{r} AS MATERIALIZED (
      SELECT bucket, SUM(y * tf) AS dw
      FROM coo
      JOIN tr USING (doc_id)
      JOIN m{r} USING (doc_id)
      WHERE y * m{r}.margin <= 0
      GROUP BY bucket
    ),
    w{r} AS MATERIALIZED (
      SELECT COALESCE({prev}.bucket, up{r}.bucket) AS bucket,
             COALESCE({prev}.w, 0) + COALESCE(up{r}.dw, 0) AS w
      FROM {prev} FULL JOIN up{r} ON {prev}.bucket = up{r}.bucket
    )"""
        prev = f"w{r}"
    # per-round misclassified counts c_r = |{train docs: y·margin(w_r)
    # <= 0}| (docs with no shared bucket have margin 0 → misclassified)
    sql += f""",
    m{R + 1} AS MATERIALIZED (
      SELECT coo.doc_id, SUM(w{R}.w * coo.tf) AS margin
      FROM coo JOIN w{R} USING (bucket) GROUP BY coo.doc_id
    )"""
    for r in range(1, R + 1):
        sql += f""",
    c{r} AS MATERIALIZED (
      SELECT COUNT(*) AS n FROM tr
      LEFT JOIN m{r + 1} USING (doc_id)
      WHERE y * COALESCE(m{r + 1}.margin, 0) <= 0
    )"""
    counts_union = " UNION ALL ".join(
        f"SELECT {r} AS r, (SELECT n FROM c{r}) AS n"
        for r in range(1, R + 1)
    )
    allw_union = " UNION ALL ".join(
        f"SELECT {r} AS r, bucket, w FROM w{r}" for r in range(1, R + 1)
    )
    sql += f""",
    counts AS MATERIALIZED ({counts_union}),
    stopr AS (
      -- first round that fails to improve on its predecessor keeps
      -- the predecessor; a monotone run keeps the last round
      SELECT CAST(COALESCE(MIN(a.r) - 1, {R}) AS BIGINT) AS ru
      FROM counts a JOIN counts b ON b.r = a.r - 1
      WHERE a.n >= b.n
    ),
    allw AS MATERIALIZED ({allw_union}),
    fw AS MATERIALIZED (
      SELECT bucket, w FROM allw WHERE r = (SELECT ru FROM stopr)
    ),
    mt AS (
      SELECT coo.doc_id, SUM(fw.w * coo.tf) AS margin
      FROM coo JOIN fw USING (bucket)
      JOIN te USING (doc_id) GROUP BY coo.doc_id
    ),
    ev AS (
      SELECT te.y,
             CASE WHEN COALESCE(mt.margin, 0) > 0 THEN 1 ELSE -1 END
               AS pred
      FROM te LEFT JOIN mt USING (doc_id)
    ),
    conf AS (
      SELECT
        CAST(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN y = -1 AND pred = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN y = 1 AND pred = -1 THEN 1 ELSE 0 END)
             AS BIGINT) AS fn,
        CAST(SUM(CASE WHEN y = -1 AND pred = -1 THEN 1 ELSE 0 END)
             AS BIGINT) AS tn
      FROM ev
    )
    SELECT (SELECT ru FROM stopr) AS rounds_used,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tr) AS n_train,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM te) AS n_test,
           tp, fp, fn, tn,
           CASE WHEN tp + fp = 0 THEN 0.0
                ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
           CASE WHEN tp + fn = 0 THEN 0.0
                ELSE CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
           CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                ELSE CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn)
                END AS f1
    FROM conf
    """
    return sql


@register("text_classifier_eval", oracle=_qce_oracle())
def text_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.operators.sampling import (
        SPLIT_KEY,
        TRAIN_PERMILLE,
        VAL_PERMILLE,
    )

    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    ).filter(F.col("t") != "")
    coo = (
        tok.select(
            "doc_id",
            F.pmod(
                hash60(F.concat(F.lit(_QC_SALT), F.col("t"))),
                F.lit(_HV_D),
            ).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    cell = F.pmod(
        hash60(
            F.concat(F.lit(SPLIT_KEY), F.col("doc_id").cast("string"))
        ),
        F.lit(1000),
    )
    lab = docs.select(
        "doc_id",
        F.when(
            F.size(tokens(F.col("text"))) >= _QC_MIN_WORDS, F.lit(1)
        )
        .otherwise(F.lit(-1))
        .alias("y"),
        cell.alias("cell"),
    )
    tr = lab.filter(F.col("cell") < TRAIN_PERMILLE).select(
        "doc_id", "y"
    ).localCheckpoint(eager=True)
    te = lab.filter(F.col("cell") >= VAL_PERMILLE).select("doc_id", "y")

    def margins(wf: DataFrame) -> DataFrame:
        return (
            coo.join(F.broadcast(wf), "bucket")
            .groupBy("doc_id")
            .agg(F.sum(F.col("w") * F.col("tf")).alias("margin"))
        )

    def n_mis(wf: DataFrame) -> int:
        # the per-round stop scalar: ONE bounded integer to the driver
        return (
            tr.join(margins(wf), "doc_id", "left")
            .filter(
                F.col("y") * F.coalesce("margin", F.lit(0)) <= 0
            )
            .count()
        )

    w = (
        coo.join(tr, "doc_id")
        .groupBy("bucket")
        .agg(F.sum(F.col("y") * F.col("tf")).alias("w"))
        .localCheckpoint(eager=True)
    )
    best_mis = n_mis(w)
    rounds_used = 1
    for r in range(2, _QCE_MAX_ROUNDS + 1):
        m = margins(w)
        mis = (
            tr.join(m, "doc_id", "left")
            .filter(
                F.col("y") * F.coalesce("margin", F.lit(0)) <= 0
            )
            .select("doc_id", "y")
        )
        dw = (
            coo.join(mis, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("tf")).alias("dw"))
        )
        w_new = (
            w.join(dw, "bucket", "full")
            .select(
                "bucket",
                (
                    F.coalesce("w", F.lit(0))
                    + F.coalesce("dw", F.lit(0))
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
        new_mis = n_mis(w_new)
        if new_mis >= best_mis:
            break  # no improvement: keep the best-so-far weights
        w, best_mis, rounds_used = w_new, new_mis, r

    mt = (
        coo.join(F.broadcast(w), "bucket")
        .join(te.select("doc_id"), "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("tf")).alias("margin"))
    )
    pred = F.when(
        F.coalesce("margin", F.lit(0)) > 0, F.lit(1)
    ).otherwise(F.lit(-1))
    ev = te.join(mt, "doc_id", "left").select(
        "y", pred.alias("pred")
    )
    conf = ev.agg(
        F.sum(((F.col("y") == 1) & (F.col("pred") == 1)).cast("int"))
        .cast("long")
        .alias("tp"),
        F.sum(((F.col("y") == -1) & (F.col("pred") == 1)).cast("int"))
        .cast("long")
        .alias("fp"),
        F.sum(((F.col("y") == 1) & (F.col("pred") == -1)).cast("int"))
        .cast("long")
        .alias("fn"),
        F.sum(((F.col("y") == -1) & (F.col("pred") == -1)).cast("int"))
        .cast("long")
        .alias("tn"),
    )
    n_train = tr.count()
    n_test = te.count()
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    prec = F.when(tp + fp == 0, F.lit(0.0)).otherwise(
        tp.cast("double") / (tp + fp)
    )
    rec = F.when(tp + fn == 0, F.lit(0.0)).otherwise(
        tp.cast("double") / (tp + fn)
    )
    f1 = F.when(2 * tp + fp + fn == 0, F.lit(0.0)).otherwise(
        (2 * tp).cast("double") / (2 * tp + fp + fn)
    )
    return conf.select(
        F.lit(rounds_used).cast("long").alias("rounds_used"),
        F.lit(n_train).cast("long").alias("n_train"),
        F.lit(n_test).cast("long").alias("n_test"),
        "tp",
        "fp",
        "fn",
        "tn",
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
    )
