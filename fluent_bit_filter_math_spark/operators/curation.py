"""End-to-end corpus curation — the composed training-data pipeline.

Absent from the reference (single-record scope); this is the query a
data-curation team actually ships: one pass that tags every document
with each gate's verdict and the final keep decision —

* ``is_canonical`` — the document is its near-dup cluster's
  representative (minimum doc_id of the connected component over
  LSH-verified Jaccard pairs; :func:`operators.dedup.dedup_cluster_cc`);
* ``rep_keep``     — passes the Gopher-style repetition filter
  (:func:`operators.text.text_repetition_filter`);
* ``quality_ok``   — composite quality score clears ``QUALITY_MIN``
  (:func:`operators.text.text_quality_score`'s expression; floats are
  identical expression trees in both engines, so the threshold compare
  is deterministic);
* ``curated``      — all of the above.

Per-gate flags (not a filtered subset) are the deliberate output shape:
downstream consumers diff gate effects and audit rejections without
re-running the pipeline.

Scale: the three branches are each the already-audited shapes (CC edge
contraction over pairs only; two word-count aggregates; a narrow
projection), joined back on doc_id — at 100 TB the joins are
co-partitioned one-row-per-doc sides, dwarfed by the branch inputs
themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.operators.dedup import (
    _CC_PAIRS,
    cluster_map,
)
from fluent_bit_filter_math_spark.operators.text import (
    _D_QUALITY,
    _D_TOKENS,
    _REP_T_BIG,
    _REP_T_DUP,
    _REP_T_UNI,
    text_quality_score,
    text_repetition_filter,
)
from fluent_bit_filter_math_spark.registry import register

QUALITY_MIN = 0.62


@register(
    "pipeline_curate_corpus",
    oracle=f"""
    WITH RECURSIVE {_CC_PAIRS},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM jacp
      UNION
      SELECT doc_b, doc_a FROM jacp
    ),
    reach(src, dst) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    ),
    comp AS (
      SELECT d.doc_id,
             LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_id
      FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
      GROUP BY d.doc_id
    ),
    rtok AS (
      SELECT doc_id, length(text) AS nchar, {_D_TOKENS} AS t FROM documents
    ),
    rg AS (
      SELECT doc_id, 1 AS n, unnest(t) AS gram FROM rtok
      UNION ALL
      SELECT doc_id, 2 AS n,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS gram
      FROM rtok
    ),
    rc AS (
      SELECT doc_id, n, gram, COUNT(*) AS cnt FROM rg GROUP BY doc_id, n, gram
    ),
    ra AS (
      SELECT doc_id,
             MAX(CASE WHEN n = 1 THEN cnt * length(gram) END) AS uni_cover,
             MAX(CASE WHEN n = 2 THEN cnt * length(gram) END) AS big_cover,
             SUM(CASE WHEN n = 2 AND cnt >= 2 THEN cnt * length(gram)
                      ELSE 0 END) AS dup_cover
      FROM rc GROUP BY doc_id
    ),
    rep AS (
      SELECT rtok.doc_id,
             CAST(CAST(COALESCE(uni_cover, 0) AS DOUBLE) / nchar
                      <= {_REP_T_UNI}
              AND CAST(COALESCE(big_cover, 0) AS DOUBLE) / nchar
                      <= {_REP_T_BIG}
              AND CAST(COALESCE(dup_cover, 0) AS DOUBLE) / nchar
                      <= {_REP_T_DUP} AS INT) AS rep_keep
      FROM rtok LEFT JOIN ra ON rtok.doc_id = ra.doc_id
    ),
    qual AS (
      SELECT doc_id,
             CAST(({_D_QUALITY}) >= {QUALITY_MIN} AS INT) AS quality_ok
      FROM documents
    )
    SELECT d.doc_id,
           CAST(comp.cluster_id = d.doc_id AS INT) AS is_canonical,
           rep.rep_keep,
           qual.quality_ok,
           CAST(comp.cluster_id = d.doc_id AS INT) * rep.rep_keep
               * qual.quality_ok AS curated
    FROM documents d
    JOIN comp ON comp.doc_id = d.doc_id
    JOIN rep  ON rep.doc_id = d.doc_id
    JOIN qual ON qual.doc_id = d.doc_id
    """,
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = cluster_map(spark, sf_dir).select(
        "doc_id",
        (F.col("cluster_id") == F.col("doc_id")).cast("int").alias(
            "is_canonical"
        ),
    )
    rep = text_repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rep_keep")
    )
    qual = text_quality_score(spark, sf_dir).select(
        "doc_id",
        (F.col("quality") >= QUALITY_MIN).cast("int").alias("quality_ok"),
    )
    return (
        cc.join(rep, "doc_id")
        .join(qual, "doc_id")
        .select(
            "doc_id",
            "is_canonical",
            "rep_keep",
            "quality_ok",
            (
                F.col("is_canonical") * F.col("rep_keep") * F.col("quality_ok")
            ).alias("curated"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing — concat-and-chunk, the standard pretraining batch
# layout: documents are laid end-to-end in doc_id order into one global
# token stream, which is cut into fixed-length training sequences of
# SEQ_LEN tokens; a document may straddle a cut. The deliverable per
# document is its absolute stream offset and the sequence range it
# lands in — exactly what a writer needs to emit packed shards.
#
# The global exclusive prefix sum is the scale hazard: a bare
# ``Window.orderBy(doc_id)`` with no partitionBy collapses the corpus
# into ONE task. This is the two-level distributed prefix sum instead:
#   1. range-bucket documents on doc_id (bucket order == stream order);
#   2. per-bucket token totals → exclusive cumsum over the tiny
#      (n_buckets-row) frame — the only global window, never larger
#      than corpus_size / PACK_BUCKET_W rows;
#   3. broadcast-join the bucket offsets back; within-bucket running
#      sums stay partitioned on the bucket.
# Plan pinned in tests/test_round2.py: no single-partition window ever
# touches a per-document row. Absent from the reference (single-record
# scope, math.c:322-353).
# ---------------------------------------------------------------------------
SEQ_LEN = 2048
PACK_BUCKET_W = 256  # documents per prefix-sum bucket

@register(
    "pipeline_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len({_D_TOKENS}) AS n_tok FROM documents
    ),
    pos AS (
      SELECT doc_id, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS start_pos
      FROM t
    )
    SELECT doc_id, n_tok, start_pos,
           start_pos // {SEQ_LEN} AS seq_first,
           (start_pos + n_tok - 1) // {SEQ_LEN}
               - start_pos // {SEQ_LEN} + 1 AS n_seqs
    FROM pos
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from fluent_bit_filter_math_spark.functions import tokens
    from fluent_bit_filter_math_spark.sources import table

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tok")
    )
    b = docs.withColumn("bkt", F.floor(F.col("doc_id") / PACK_BUCKET_W))

    # Within-bucket inclusive running sum (partitioned — stays parallel).
    w_in = Window.partitionBy("bkt").orderBy("doc_id")
    local = b.withColumn(
        "local_end", F.sum("n_tok").over(w_in)
    )

    # Bucket totals → exclusive cumsum on the n_buckets-row frame. The
    # unpartitioned window is deliberate and safe: its input is one row
    # per bucket, not per document.
    w_b = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        b.groupBy("bkt")
        .agg(F.sum("n_tok").alias("tot"))
        .select(
            "bkt", F.coalesce(F.sum("tot").over(w_b), F.lit(0)).alias("off")
        )
    )

    pos = local.join(F.broadcast(offs), "bkt").select(
        "doc_id",
        "n_tok",
        (F.col("off") + F.col("local_end") - F.col("n_tok")).alias(
            "start_pos"
        ),
    )
    seq_first = F.floor(F.col("start_pos") / SEQ_LEN)
    seq_last = F.floor((F.col("start_pos") + F.col("n_tok") - 1) / SEQ_LEN)
    return pos.select(
        "doc_id",
        "n_tok",
        "start_pos",
        seq_first.alias("seq_first"),
        (seq_last - seq_first + F.lit(1)).alias("n_seqs"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination — the GPT-3/PaLM-style n-gram overlap check:
# a training document is contaminated if it shares any word 8-gram with
# the held-out evaluation set. The evaluation slice is deterministic
# (doc_id % DECONTAM_BENCH_MOD == 0 — the fixture stand-in for "the
# benchmark suite"); output is one row per contaminated training doc
# with its hit count and contamination ratio, the audit table a
# decontamination pass ships.
#
# Scale: benchmark suites are tiny next to a 100 TB corpus, so the
# distinct benchmark-gram set is THE broadcast side — the corpus'
# exploded grams stream past it map-side and only surviving hits reach
# the one shuffle (hash agg on doc_id, partial-aggregated). The corpus
# side is never collected, deduplicated globally, or self-joined.
# Short docs guard sequence() the same way _shingles does (Spark
# sequence() counts DOWN when stop < start).
# Absent from the reference (single-record scope, math.c:322-353).
# ---------------------------------------------------------------------------
DECONTAM_N = 8  # word n-gram length (the published decontam default)
DECONTAM_BENCH_MOD = 5  # doc_id % 5 == 0 → the held-out "benchmark" slice

_D_DGRAMS = (
    f"list_distinct(list_transform(range(1, len(w) - {DECONTAM_N - 2}),"
    f" i -> array_to_string(w[i:i+{DECONTAM_N - 1}], ' ')))"
)


def _doc_ngrams(t: F.Column) -> F.Column:
    """Distinct word-``DECONTAM_N``-grams of a materialized token array."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (DECONTAM_N - 1)),
        lambda i: F.array_join(F.slice(t, i, DECONTAM_N), " "),
    )
    return F.when(
        F.size(t) >= DECONTAM_N, F.array_distinct(grams)
    ).otherwise(F.array().cast("array<string>"))


@register(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {_D_TOKENS} AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, {_D_DGRAMS} AS gs FROM words
    ),
    bench AS (
      SELECT DISTINCT unnest(gs) AS g FROM grams
      WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
    ),
    train AS (
      SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams, unnest(gs) AS g
      FROM grams WHERE doc_id % {DECONTAM_BENCH_MOD} <> 0
    )
    SELECT t.doc_id,
           COUNT(*) AS n_hit_grams,
           t.n_grams,
           CAST(COUNT(*) AS DOUBLE) / t.n_grams AS contam_ratio
    FROM train t JOIN bench b ON t.g = b.g
    GROUP BY t.doc_id, t.n_grams
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.functions import tokens
    from fluent_bit_filter_math_spark.sources import table

    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    grams = toks.select(
        "doc_id", _doc_ngrams(F.col("toks")).alias("gs")
    )
    bench = (
        grams.filter(F.col("doc_id") % DECONTAM_BENCH_MOD == 0)
        .select(F.explode("gs").alias("g"))
        .distinct()
    )
    train = grams.filter(F.col("doc_id") % DECONTAM_BENCH_MOD != 0).select(
        "doc_id", F.size("gs").cast("long").alias("n_grams"),
        F.explode("gs").alias("g"),
    )
    hits = (
        train.join(F.broadcast(bench), "g")
        .groupBy("doc_id", "n_grams")
        .agg(F.count("*").alias("n_hit_grams"))
    )
    return hits.select(
        "doc_id",
        "n_hit_grams",
        "n_grams",
        (F.col("n_hit_grams").cast("double") / F.col("n_grams")).alias(
            "contam_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# dataset card — the release-artifact statistics block every published
# training corpus ships (rows, size, language/source composition,
# length distribution), computed in ONE scan: a single aggregate
# produces every scalar, then a zero-shuffle stack() unpivots to the
# long (metric, value) layout. Composition metrics (per-lang/source
# counts) ride the same scan via conditional sums rather than separate
# groupBys — at 100 TB the card costs one pass, not one pass per
# metric. All metrics are integer-exact (counts / char totals), so the
# gate is bitwise trivially.
# ---------------------------------------------------------------------------
@register(
    "pipeline_dataset_card",
    oracle="""
    WITH s AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             COUNT(DISTINCT lang) AS n_langs,
             COUNT(DISTINCT source) AS n_sources,
             CAST(MIN(n_chars) AS BIGINT) AS min_chars,
             CAST(MAX(n_chars) AS BIGINT) AS max_chars,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_en,
             CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_long
      FROM documents
    )
    SELECT metric, value FROM (
      SELECT 'n_docs' AS metric, n_docs AS value FROM s
      UNION ALL SELECT 'total_chars', total_chars FROM s
      UNION ALL SELECT 'n_langs', n_langs FROM s
      UNION ALL SELECT 'n_sources', n_sources FROM s
      UNION ALL SELECT 'min_chars', min_chars FROM s
      UNION ALL SELECT 'max_chars', max_chars FROM s
      UNION ALL SELECT 'n_docs_en', n_docs_en FROM s
      UNION ALL SELECT 'n_docs_long', n_docs_long FROM s
    )
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.sources import table

    docs = table(spark, sf_dir, "documents")
    s = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_docs_en"),
        F.sum(F.when(F.col("n_chars") >= 200, 1).otherwise(0)).alias(
            "n_docs_long"
        ),
    )
    return s.select(
        F.expr(
            "stack(8,"
            " 'n_docs', n_docs, 'total_chars', total_chars,"
            " 'n_langs', CAST(n_langs AS BIGINT),"
            " 'n_sources', CAST(n_sources AS BIGINT),"
            " 'min_chars', min_chars, 'max_chars', max_chars,"
            " 'n_docs_en', n_docs_en, 'n_docs_long', n_docs_long"
            ") AS (metric, value)"
        )
    )


# ---------------------------------------------------------------------------
# Release composition by (split × source) — the table every dataset
# release publishes next to its card: document and character counts
# per (train/val/test, source-domain) cell, with each cell's share of
# its split. Reuses sample_split_assign's leak-proof hash assignment
# verbatim (same SPLIT_KEY grid — a doc's split can never differ
# between the assignment query and the release report) and
# pipeline_dataset_card's exact integer counting. One hash aggregate
# + a per-split 1-level broadcast-back for the shares; shares are
# single double divisions of exact integers.
# ---------------------------------------------------------------------------
from fluent_bit_filter_math_spark.functions import duck_hash60 as _dh60

_SPLIT_H = _dh60("'split:' || CAST(doc_id AS VARCHAR)")


@register(
    "pipeline_split_composition",
    oracle=f"""
    WITH assigned AS (
      SELECT CASE
               WHEN {_SPLIT_H} % 1000 < 800 THEN 'train'
               WHEN {_SPLIT_H} % 1000 < 900 THEN 'val'
               ELSE 'test'
             END AS split,
             source, n_chars
      FROM documents
    ),
    cells AS (
      SELECT split, source,
             COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM assigned GROUP BY split, source
    ),
    totals AS (
      SELECT split, CAST(SUM(n_docs) AS BIGINT) AS split_docs
      FROM cells GROUP BY split
    )
    SELECT c.split, c.source, c.n_docs, c.n_chars,
           CAST(c.n_docs AS DOUBLE) / t.split_docs AS share_of_split
    FROM cells c JOIN totals t ON c.split = t.split
    ORDER BY c.split, c.source
    """,
)
def pipeline_split_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.functions import hash60
    from fluent_bit_filter_math_spark.operators.sampling import (
        SPLIT_KEY,
        TRAIN_PERMILLE,
        VAL_PERMILLE,
    )

    from fluent_bit_filter_math_spark.sources import table

    docs = table(spark, sf_dir, "documents")
    bucket = F.pmod(
        hash60(F.concat(F.lit(SPLIT_KEY), F.col("doc_id").cast("string"))),
        F.lit(1000),
    )
    split = (
        F.when(bucket < TRAIN_PERMILLE, "train")
        .when(bucket < VAL_PERMILLE, "val")
        .otherwise("test")
    )
    cells = (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
    totals = cells.groupBy("split").agg(
        F.sum("n_docs").alias("split_docs")
    )
    return (
        cells.join(F.broadcast(totals), "split")
        .select(
            "split",
            "source",
            "n_docs",
            "n_chars",
            (F.col("n_docs").cast("double") / F.col("split_docs")).alias(
                "share_of_split"
            ),
        )
        .orderBy("split", "source")
    )


# ---------------------------------------------------------------------------
# END-TO-END CURATION SELECT — the late-r9 operators composed into the
# pipeline shape a pre-training data team actually ships: published
# quality rules → exact dedup → per-domain weighted budget cap.
#   1. Gopher rules (text.py::_gopher_frame — Rae'21) gate documents;
#   2. exact dedup keeps the smallest doc_id per md5(text);
#   3. each source's survivors are capped at a budget of 8 by PRIORITY
#      sampling (Duffield'07, the sampling.py machinery inline):
#      weight = n_chars, key = hash/weight, smallest keys win — so
#      long documents are kept with near-certainty and the cap is
#      still an unbiased weighted sample.
# Every stage reuses the registered operators' exact expressions, so
# the composition is pinned by the same arithmetic the stage queries
# already prove; the oracle replays all three stages in one SQL.
#
# Scale: stage 1 is map-side; stage 2 shuffles on the text hash
# (dedup_exact's shape); stage 3 is the local-top-k-pruned stratum
# rank (sample_priority_topk's shape). No stage widens the data —
# each strictly shrinks it, the property that makes curation
# pipelines cheap to chain.
# ---------------------------------------------------------------------------
_CUR_BUDGET = 8


@register(
    "pipeline_curate_select",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, text, source, n_chars,
             string_split(text, ' ') AS toks,
             string_split(text, chr(10)) AS lns,
             len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_symbols
      FROM documents
    ), m AS (
      SELECT doc_id, text, source, n_chars,
             len(toks) AS n_words,
             list_aggregate(list_transform(toks, t -> length(t)), 'sum')
                 AS sum_len,
             len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                 AS alpha_words,
             len(list_filter(toks,
                 t -> t IN ('the','be','to','of','and','that','have','with')))
                 AS n_stop,
             len(lns) AS n_lines,
             len(list_filter(lns, l -> regexp_matches(l, '^[-*]')))
                 AS bullet_lines,
             len(list_filter(lns, l -> regexp_matches(l, '\\.\\.\\.$')))
                 AS ellipsis_lines,
             n_symbols
      FROM g
    ), kept AS (
      SELECT doc_id, text, source, n_chars, n_words
      FROM m
      WHERE n_words BETWEEN 50 AND 100000
        AND CAST(sum_len AS DOUBLE) / n_words >= 3.0
        AND CAST(sum_len AS DOUBLE) / n_words <= 10.0
        AND CAST(n_symbols AS DOUBLE) / n_words < 0.1
        AND CAST(bullet_lines AS DOUBLE) / n_lines < 0.9
        AND CAST(ellipsis_lines AS DOUBLE) / n_lines < 0.3
        AND CAST(alpha_words AS DOUBLE) / n_words > 0.8
        AND n_stop >= 2
    ), deduped AS (
      SELECT doc_id, source, n_chars, n_words FROM (
        SELECT doc_id, source, n_chars, n_words,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS dup_rn
        FROM kept
      ) WHERE dup_rn = 1
    ), keyed AS (
      SELECT doc_id, source, n_chars, n_words,
             CAST({{h}} AS DOUBLE) / n_chars AS skey
      FROM deduped
    ), ranked AS (
      SELECT source, doc_id, n_chars, n_words,
             row_number() OVER (PARTITION BY source
                                ORDER BY skey, doc_id) AS rn
      FROM keyed
    )
    SELECT source, CAST(rn AS BIGINT) AS rn, doc_id, n_chars,
           CAST(n_words AS BIGINT) AS n_words
    FROM ranked
    WHERE rn <= {_CUR_BUDGET}
    ORDER BY source, rn
    """.replace(
        "{h}",
        "CAST('0x' || substr(md5('cur:' || CAST(doc_id AS VARCHAR)), 1, 15)"
        " AS BIGINT)",
    ),
)
def pipeline_curate_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from fluent_bit_filter_math_spark.functions import hash60
    from fluent_bit_filter_math_spark.operators.text import _gopher_frame
    from fluent_bit_filter_math_spark.sources import table

    docs = table(spark, sf_dir, "documents")
    rules = _gopher_frame(docs).select("doc_id", "n_words", "keep")
    kept = (
        docs.join(rules, "doc_id")
        .filter(F.col("keep"))
        .select("doc_id", "text", "source", "n_chars", "n_words")
    )
    wdup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        kept.withColumn("dup_rn", F.row_number().over(wdup))
        .filter(F.col("dup_rn") == 1)
        .drop("dup_rn", "text")
    )
    skey = (
        hash60(
            F.concat(F.lit("cur:"), F.col("doc_id").cast("string"))
        ).cast("double")
        / F.col("n_chars")
    )
    keyed = deduped.withColumn("skey", skey)
    wrank = Window.partitionBy("source").orderBy("skey", "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") <= _CUR_BUDGET)
        .select(
            "source",
            F.col("rn").cast("long").alias("rn"),
            "doc_id",
            "n_chars",
            F.col("n_words").cast("long").alias("n_words"),
        )
        .orderBy("source", "rn")
    )


# ---------------------------------------------------------------------------
# CURATION WITH THE TRAINED CLASSIFIER GATE (VERDICT r14 #5, second
# half): pipeline_curate_select's three stages plus the
# text_quality_classifier verdict as a FOURTH gate between the rule
# filter and dedup — the shape production curation takes once a
# trained model replaces/augments hand rules (rules prefilter, model
# scores, dedup and budget close). The classifier's final weight
# vector scores map-side (broadcast ≤128-row join); everything else
# reuses the registered stages' exact expressions, so the composition
# is pinned by the same arithmetic the stage queries already prove.
# pipeline_curate_select itself is left untouched (its anchor and
# oracle stay valid); this query pins the composition.
# ---------------------------------------------------------------------------


def _curate_classified_oracle() -> str:
    from fluent_bit_filter_math_spark.operators.text import _qc_oracle

    base = f"""
    WITH g AS (
      SELECT doc_id, text, source, n_chars,
             string_split(text, ' ') AS toks,
             string_split(text, chr(10)) AS lns,
             len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_symbols
      FROM documents
    ), m AS (
      SELECT doc_id, text, source, n_chars,
             len(toks) AS n_words,
             list_aggregate(list_transform(toks, t -> length(t)), 'sum')
                 AS sum_len,
             len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                 AS alpha_words,
             len(list_filter(toks,
                 t -> t IN ('the','be','to','of','and','that','have','with')))
                 AS n_stop,
             len(lns) AS n_lines,
             len(list_filter(lns, l -> regexp_matches(l, '^[-*]')))
                 AS bullet_lines,
             len(list_filter(lns, l -> regexp_matches(l, '\\.\\.\\.$')))
                 AS ellipsis_lines,
             n_symbols
      FROM g
    ), qc AS (
      SELECT doc_id, pred FROM ({_qc_oracle()})
    ), kept AS (
      SELECT m.doc_id, text, source, n_chars, n_words
      FROM m JOIN qc ON qc.doc_id = m.doc_id AND qc.pred = 1
      WHERE n_words BETWEEN 50 AND 100000
        AND CAST(sum_len AS DOUBLE) / n_words >= 3.0
        AND CAST(sum_len AS DOUBLE) / n_words <= 10.0
        AND CAST(n_symbols AS DOUBLE) / n_words < 0.1
        AND CAST(bullet_lines AS DOUBLE) / n_lines < 0.9
        AND CAST(ellipsis_lines AS DOUBLE) / n_lines < 0.3
        AND CAST(alpha_words AS DOUBLE) / n_words > 0.8
        AND n_stop >= 2
    ), deduped AS (
      SELECT doc_id, source, n_chars, n_words FROM (
        SELECT doc_id, source, n_chars, n_words,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS dup_rn
        FROM kept
      ) WHERE dup_rn = 1
    ), keyed AS (
      SELECT doc_id, source, n_chars, n_words,
             CAST({{h}} AS DOUBLE) / n_chars AS skey
      FROM deduped
    ), ranked AS (
      SELECT source, doc_id, n_chars, n_words,
             row_number() OVER (PARTITION BY source
                                ORDER BY skey, doc_id) AS rn
      FROM keyed
    )
    SELECT source, CAST(rn AS BIGINT) AS rn, doc_id, n_chars,
           CAST(n_words AS BIGINT) AS n_words
    FROM ranked
    WHERE rn <= {_CUR_BUDGET}
    ORDER BY source, rn
    """
    return base.replace(
        "{h}",
        "CAST('0x' || substr(md5('cur:' || CAST(doc_id AS VARCHAR)), 1, 15)"
        " AS BIGINT)",
    )


@register("pipeline_curate_classified", oracle=_curate_classified_oracle())
def pipeline_curate_classified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from fluent_bit_filter_math_spark.functions import hash60
    from fluent_bit_filter_math_spark.operators.text import (
        _gopher_frame,
        text_quality_classifier,
    )
    from fluent_bit_filter_math_spark.sources import table

    docs = table(spark, sf_dir, "documents")
    rules = _gopher_frame(docs).select("doc_id", "n_words", "keep")
    model_ok = (
        text_quality_classifier(spark, sf_dir)
        .filter(F.col("pred") == 1)
        .select("doc_id")
    )
    kept = (
        docs.join(rules, "doc_id")
        .filter(F.col("keep"))
        .join(model_ok, "doc_id")  # gate 4: the trained model's verdict
        .select("doc_id", "text", "source", "n_chars", "n_words")
    )
    wdup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        kept.withColumn("dup_rn", F.row_number().over(wdup))
        .filter(F.col("dup_rn") == 1)
        .drop("dup_rn", "text")
    )
    skey = (
        hash60(
            F.concat(F.lit("cur:"), F.col("doc_id").cast("string"))
        ).cast("double")
        / F.col("n_chars")
    )
    keyed = deduped.withColumn("skey", skey)
    wrank = Window.partitionBy("source").orderBy("skey", "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") <= _CUR_BUDGET)
        .select(
            "source",
            F.col("rn").cast("long").alias("rn"),
            "doc_id",
            "n_chars",
            F.col("n_words").cast("long").alias("n_words"),
        )
        .orderBy("source", "rn")
    )
