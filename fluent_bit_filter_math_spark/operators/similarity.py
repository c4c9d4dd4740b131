"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

SURVEY.md §2.3 extension: brute-force cosine top-k as the exactness
baseline, range search, and an LSH-bucketed ANN variant as the scale
path.

Scale design:

* The query set is always the *small* side — broadcast it, so the big
  side streams through a single narrow stage: no shuffle of the 100 TB
  corpus, each executor scores its partitions locally. Top-k then
  reduces via partial TakeOrdered per partition.
* ``sim_ann_bucketed`` cuts the brute-force cost by partitioning the
  corpus into 2^b sign-hash buckets (axis-aligned random-hyperplane
  LSH). Each query probes exactly its own bucket: the scored fraction
  drops to ~1/2^b. The bucket id is a native expression, so at scale
  the corpus can be *written bucketed* (partitionBy(bucket)) and the
  probe becomes partition pruning — no scan of the other buckets.
* All cosine math is the sequential-fold double expression from
  ``functions`` (JVM codegen, no UDF, no Python).

Outputs are integer-only (ids + ranks); cosine scores stay internal so
the driver's bitwise hash never compares engine-specific float
formatting. Rank order is still pinned by the floats — distinct random
vectors' cosines differ by far more than the ≤1-ulp engine divergence
(verified: min adjacent-cosine gap at sf0.01 is ~1e-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.concurrency import overlap
from fluent_bit_filter_math_spark.functions import cosine, dot, norm
from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

N_QUERIES = 5  # vec_id < 5 is the probe set
TOP_K = 5
RANGE_THRESHOLD = 0.33
BUCKET_BITS = 4  # sign bits of dims 1..4 → 16 buckets

_D_COS = "list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "embeddings")


def _scored(spark: SparkSession, sf_dir: str, n_queries: int) -> DataFrame:
    """query × corpus cosine scores (queries broadcast, self-pairs out).

    Norms are projected once per VECTOR before the pair join —
    dot/(qn·cn) is cosine()'s exact IEEE expression, so scores are
    bit-identical while the per-pair work drops from 3 array folds to 1
    (guide §2.3); every corpus row joins every query row, so the
    precompute always pays (unlike the selective bucket join in
    sim_ann_bucketed, where most corpus rows match nothing and a
    pre-join norm would do MORE fold work — measured +28%, reverted).
    Measured-and-rejected here: repartitioning the one-row-group corpus
    scan before the pair join (the change-11 rule) — topk/range were
    flat but the added exchange more than doubled the composed
    sim_recall_audit (solo min 1.40 → 2.95 s; without it 1.28 s)."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        norm(F.col("embedding")).alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        norm(F.col("embedding")).alias("cn"),
    )
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )


# ---------------------------------------------------------------------------
# brute-force top-k — the exactness baseline.
# ---------------------------------------------------------------------------
@register(
    "sim_topk_bruteforce",
    oracle=f"""
    SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_D_COS} DESC, c.vec_id
               ) AS BIGINT) AS rank
        FROM embeddings q, embeddings c
        WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    ) WHERE rank <= {TOP_K}
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored(spark, sf_dir, N_QUERIES)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# range search — all neighbors above a similarity threshold.
# ---------------------------------------------------------------------------
@register(
    "sim_range_search",
    oracle=f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM embeddings q, embeddings c
    WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
      AND {_D_COS} >= {RANGE_THRESHOLD}
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _scored(spark, sf_dir, N_QUERIES)
        .filter(F.col("cos") >= RANGE_THRESHOLD)
        .select("query_id", "neighbor_id")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN — axis-aligned sign buckets; query probes its bucket.
# ---------------------------------------------------------------------------
def _bucket_expr(col: str) -> F.Column:
    bits = [
        F.when(F.element_at(F.col(col), i + 1) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        for i in range(BUCKET_BITS)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


_D_BUCKET = " + ".join(
    f"(CASE WHEN {{side}}.embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(BUCKET_BITS)
)


_ANN_ORACLE = f"""
    SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_D_COS} DESC, c.vec_id
               ) AS BIGINT) AS rank
        FROM embeddings q, embeddings c
        WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
          AND ({_D_BUCKET.format(side='q')}) = ({_D_BUCKET.format(side='c')})
    ) WHERE rank <= {TOP_K}
    """


# ---------------------------------------------------------------------------
# LSH-bucket + GEMM ANN — the composed scale path: the sign-bucket LSH
# shrinks each query's candidate set to its own bucket, then ONE float64
# GEMM per bucket scores query-rows against the bucket matrix (BLAS)
# inside applyInPandas — executor-side, no driver collect, no broadcast.
# Semantically identical to sim_ann_bucketed (same oracle); physically it
# replaces the per-pair 64-term fold expression with a per-bucket matrix
# product, the shape that wins when queries are many: at Q queries per
# bucket the expression form costs Q·n·d interpreted ops per bucket, the
# GEMM one BLAS call. At 100 TB the corpus is written
# partitionBy(bucket), so the groupBy below becomes a scan of
# pre-clustered partitions — no shuffle.
# Per-task memory is O(|bucket|·d); buckets too hot for one task get more
# sign bits (BUCKET_BITS is the knob) — same recall/size trade as any
# LSH probe. BLAS reassociation noise (~1e-13) cannot reorder ranks: the
# fixture's min adjacent-cosine gap is ~1e-6 (module docstring).
# ---------------------------------------------------------------------------
@register("sim_ann_gemm", oracle=_ANN_ORACLE)
def sim_ann_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = _emb(spark, sf_dir).select(
        "vec_id", "embedding", _bucket_expr("embedding").alias("bucket")
    )

    def topk_per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        qmask = ids < N_QUERIES
        if not qmask.any():
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "rank": []}
            ).astype("int64")
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        # An all-zero vector would yield 0/0 → NaN cosines and an
        # undefined lexsort order silently diverging from the oracle;
        # leave it at norm 1 (cosine 0 against everything) instead.
        mat /= np.where(nrm == 0.0, 1.0, nrm)
        cos = mat[qmask] @ mat.T  # Q×|bucket| scores in one BLAS call
        out = []
        for row, qid in zip(cos, ids[qmask]):
            cand = ids != qid
            # Order by cosine desc, neighbor_id asc (deterministic ties).
            order = np.lexsort((ids[cand], -row[cand]))[:TOP_K]
            nbr = ids[cand][order]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(len(nbr), qid),
                        "neighbor_id": nbr,
                        "rank": np.arange(1, len(nbr) + 1),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return emb.groupBy("bucket").applyInPandas(
        topk_per_bucket, schema="query_id long, neighbor_id long, rank long"
    )


@register("sim_ann_bucketed", oracle=_ANN_ORACLE)
def sim_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(
        "vec_id", "embedding", _bucket_expr("embedding").alias("bucket")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qb"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("bucket").alias("cb"),
    )
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("qb") == F.col("cb"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qe"), F.col("ce")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# IVF ANN — inverted-file index, the other standard ANN scale path and
# the complement of the sign-bucket LSH above: cells adapt to the DATA
# (nearest of K sampled centroids) instead of to fixed hyperplanes, so
# cell populations stay balanced even when the corpus is far from
# isotropic, and recall is tuned per-query via NPROBE (probe the n
# nearest cells) rather than globally via bucket bits.
#
# Centroid choice is deterministic (K lowest salted-hash vec_ids — a
# reproducible uniform sample, same idiom as operators/sampling.py), so
# the DuckDB oracle rebuilds the identical index. Assignment is a
# broadcast of K centroids against the streaming corpus with a
# map-side-combinable max_by — the corpus is never shuffled to be
# indexed. The probe joins queries to ONLY their NPROBE cells; at 100 TB
# the corpus is written partitionBy(cell) and the probe is partition
# pruning, scanning NPROBE/K of the data. Cosine ranking reuses the
# codegen fold expression; ties are broken by neighbor_id (adjacent
# cosine gaps ~1e-6 >> 1-ulp engine divergence, module docstring).
# ---------------------------------------------------------------------------
IVF_K = 8
IVF_NPROBE = 2
_IVF_SALT = "ivf:"


@register(
    "sim_ann_ivf",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding FROM embeddings
      ORDER BY {{h}}, vec_id LIMIT {IVF_K}
    ),
    assign AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT v.vec_id, v.embedding, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(
                     v.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                     c.cid
               ) AS rn
        FROM embeddings v, cent c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, cid AS cell FROM (
        SELECT q.vec_id AS query_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                     q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                     c.cid
               ) AS rn
        FROM embeddings q, cent c WHERE q.vec_id < {N_QUERIES}
      ) WHERE rn <= {IVF_NPROBE}
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY p.query_id
               ORDER BY list_cosine_similarity(
                   q.embedding::DOUBLE[], a.embedding::DOUBLE[]) DESC,
                   a.vec_id
             ) AS BIGINT) AS rank
      FROM probes p
      JOIN assign a ON p.cell = a.cell
      JOIN embeddings q ON q.vec_id = p.query_id
      WHERE a.vec_id <> p.query_id
    ) WHERE rank <= {TOP_K}
    """.format(
        h="CAST('0x' || substr(md5('" + _IVF_SALT + "' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)"
    ),
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.functions import hash60

    emb = _emb(spark, sf_dir)
    h = hash60(F.concat(F.lit(_IVF_SALT), F.col("vec_id").cast("string")))
    cent = (
        emb.orderBy(h.asc(), F.col("vec_id").asc())
        .limit(IVF_K)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cemb"),
            norm(F.col("embedding")).alias("cn"),
        )
    )
    # Assignment: broadcast the K centroids; max_by is partially
    # aggregatable, so the corpus-side shuffle carries one row per vector.
    # The corpus side does K sequential-fold dots per row over a one-
    # row-group local scan — repartition first (work ≫ bytes, change-11
    # rule); norms are projected once per vector/centroid, so
    # dot/(en·cn) is cosine() bit-for-bit at a third of the fold work.
    crossed = (
        emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select("vec_id", "embedding", norm(F.col("embedding")).alias("en"))
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "cid",
            (dot(F.col("embedding"), F.col("cemb")) / (F.col("en") * F.col("cn"))).alias("cos"),
        )
    )
    assign = crossed.groupBy("vec_id").agg(
        F.max_by(
            F.col("cid"), F.struct(F.col("cos"), (-F.col("cid")).alias("nc"))
        ).alias("cell"),
        F.first("embedding").alias("ce"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        norm(F.col("embedding")).alias("qn"),
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("cid"))
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qe",
            "qn",
            "cid",
            (dot(F.col("qe"), F.col("cemb")) / (F.col("qn") * F.col("cn"))).alias("qcos"),
        )
        .select(
            "query_id", "qe", "qn", F.col("cid").alias("cell"),
            F.row_number().over(wp).alias("prn"),
        )
        .filter(F.col("prn") <= IVF_NPROBE)
        .drop("prn")
    )
    scored = (
        F.broadcast(probes)
        .join(assign.withColumn("cen", norm(F.col("ce"))), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cen"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# Embedding compression — symmetric int8 quantization, the storage/IO
# lever for a 100 TB embedding store: per-vector max-abs scale, 4×
# smaller payloads, and the reconstruction-error audit a pipeline runs
# before switching retrieval to the quantized copy. Everything is a
# native array expression (zero UDF, one narrow stage, no shuffle);
# per-vector scalars (checksums + max error) are the output, so the
# driver's bitwise compare never sees engine-specific list formatting.
# The intermediate arrays are materialized behind Project boundaries —
# lambdas get no common-subexpression elimination, so inlining `scale`
# or `q` would re-reduce the whole array per element.
# Absent from the reference (single-record arithmetic only,
# math.c:100-132).
# ---------------------------------------------------------------------------
@register(
    "emb_quantize_int8",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             CAST(list_aggregate(list_transform(embedding, x -> abs(x)),
                                 'max') AS DOUBLE) AS scale
      FROM embeddings
    ),
    qz AS (
      SELECT vec_id, embedding, scale,
             -- sden: an all-zero vector has scale 0; dividing by it
             -- would make q NULL/NaN with engine-specific floor/cast
             -- behavior. Clamping the DENOMINATOR only (scale itself
             -- stays 0 in the output) maps zero vectors to q = all-0
             -- identically on both engines.
             GREATEST(scale, 1e-300) AS sden,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) / GREATEST(scale, 1e-300)
                               * 127.0 + 0.5)
                         AS BIGINT)) AS q
      FROM s
    )
    SELECT vec_id, scale,
           CAST(list_aggregate(q, 'sum') AS BIGINT) AS q_sum,
           CAST(list_aggregate(list_transform(q, x -> abs(x)), 'sum')
                AS BIGINT) AS q_l1,
           CAST(list_aggregate(list_transform(q, (x, i) -> x * i), 'sum')
                AS BIGINT) AS q_posweight,
           list_aggregate(
             list_transform(range(1, len(q) + 1),
               i -> abs(CAST(embedding[i] AS DOUBLE)
                        - q[i] * scale / 127.0)),
             'max') AS max_abs_err
    FROM qz
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    s = emb.select(
        "vec_id",
        "embedding",
        F.array_max(F.transform(F.col("embedding"), F.abs))
        .cast("double")
        .alias("scale"),
    )
    # Clamp only the division's denominator (see oracle comment): a
    # zero vector quantizes to all-zero q instead of NULL/NaN codes.
    sden = F.greatest(F.col("scale"), F.lit(1e-300))
    qz = s.select(
        "vec_id",
        "embedding",
        "scale",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") / sden * 127.0 + 0.5),
        ).alias("q"),
    )
    zero = F.lit(0).cast("long")
    # DuckDB's lambda index is 1-based; Spark's is 0-based → i + 1.
    posweight = F.transform(F.col("q"), lambda x, i: x * (i + 1))
    err = F.zip_with(
        F.col("embedding"),
        F.col("q"),
        lambda x, qv: F.abs(
            x.cast("double") - qv * F.col("scale") / 127.0
        ),
    )
    return qz.select(
        "vec_id",
        "scale",
        F.aggregate(F.col("q"), zero, lambda a, x: a + x).alias("q_sum"),
        F.aggregate(F.col("q"), zero, lambda a, x: a + F.abs(x)).alias(
            "q_l1"
        ),
        F.aggregate(posweight, zero, lambda a, x: a + x).alias(
            "q_posweight"
        ),
        F.array_max(err).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# K-means clustering (Lloyd's algorithm, KM_ITERS unrolled rounds) — the
# coarse-clustering step SemDeDup-style curation and IVF index builds
# run over an embedding corpus. Seeds are the first KM_K vectors
# (deterministic); each round assigns every vector to its nearest
# centroid (squared L2, ties to the lower cluster id) and recomputes
# centroids as member means.
#
# Two determinism decisions make the iteration engine-exact:
# * assignment distances are the sequential-fold double expression
#   (same order as DuckDB's list fold), and the argmin is a sort of
#   (distance, cluster) structs — ties can never diverge;
# * centroid means accumulate in FIXED POINT — floor(x·10^6) summed as
#   BIGINT (associative, order-free) then divided back out — so the
#   shuffle's reduction order cannot perturb the next round's floats.
#   At production scale you would keep plain double sums and accept
#   run-to-run last-ulp drift; the fixed-point trick is what makes the
#   *cross-engine bitwise* gate meaningful for an iterative algorithm.
#
# Scale: assignment is ZERO-shuffle — the K×dim centroid table rides
# along as one broadcast row and the argmin is a narrow expression, so
# the corpus streams through map-side. Only the update step shuffles,
# on (cluster, dim) with map-side partial sums — K·dim cells total,
# independent of corpus size. Per-round cost is one scan + one tiny
# shuffle; MLlib's KMeans runs the same loop with a driver-side
# centroid collect, which this stays free of.
# Absent from the reference (single-record scope, math.c:322-353).
# ---------------------------------------------------------------------------
KM_K = 8
KM_ITERS = 2  # assignment rounds (one centroid update in between)
KM_DIM = 64
_KM_FP = 1_000_000

_D_KM_DIST = (
    f"list_aggregate(list_transform(range(1, {KM_DIM + 1}),"
    " i -> (e.v[i] - {c}.c[i]) * (e.v[i] - {c}.c[i])), 'sum')"
)


def _km_sqdist(v: F.Column, c: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(
            v, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def _km_assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment, map-side: centroids arrive as ONE
    broadcast row holding a (cluster, centroid)-struct array; the argmin
    is a sort of (dist, cluster) structs — no shuffle, no groupBy."""
    cent_row = cents.agg(
        F.array_sort(F.collect_list(F.struct("cluster", "c"))).alias("cents")
    )
    scored = F.transform(
        F.col("cents"),
        lambda cc: F.struct(
            _km_sqdist(F.col("v"), cc["c"]).alias("d"),
            cc["cluster"].alias("cluster"),
        ),
    )
    return emb.crossJoin(F.broadcast(cent_row)).select(
        "vec_id",
        "v",
        F.element_at(F.array_sort(scored), 1)["cluster"].alias("cluster"),
    )


def _km_update(assigned: DataFrame) -> DataFrame:
    """Fixed-point member means → next round's (cluster, c) table."""
    comp = assigned.select(
        "cluster", F.posexplode("v").alias("pos", "x")
    ).select(
        "cluster",
        "pos",
        F.floor(F.col("x").cast("double") * _KM_FP).cast("long").alias("fx"),
    )
    agg = comp.groupBy("cluster", "pos").agg(
        F.sum("fx").alias("s"), F.count("*").alias("n")
    )
    percomp = agg.select(
        "cluster",
        "pos",
        (F.col("s").cast("double") / F.col("n") / _KM_FP).alias("comp"),
    )
    return percomp.groupBy("cluster").agg(
        F.array_sort(F.collect_list(F.struct("pos", "comp"))).alias("pc")
    ).select(
        "cluster", F.transform("pc", lambda p: p["comp"]).alias("c")
    )


@register(
    "emb_kmeans",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    c0 AS (
      SELECT vec_id AS cluster, embedding::DOUBLE[] AS c
      FROM embeddings WHERE vec_id < {KM_K}
    ),
    s1 AS (
      SELECT e.vec_id, c0.cluster,
             {_D_KM_DIST.format(c='c0')} AS d
      FROM emb e, c0
    ),
    a1 AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster)
                   AS rn
        FROM s1
      ) WHERE rn = 1
    ),
    f1 AS (
      SELECT a1.cluster, i,
             CAST(floor(e.v[i] * {_KM_FP}) AS BIGINT) AS fx
      FROM a1 JOIN emb e USING (vec_id), UNNEST(range(1, {KM_DIM + 1})) t(i)
    ),
    c1 AS (
      SELECT cluster, list(comp ORDER BY i) AS c FROM (
        SELECT cluster, i,
               CAST(SUM(fx) AS DOUBLE) / COUNT(*) / {_KM_FP} AS comp
        FROM f1 GROUP BY cluster, i
      ) GROUP BY cluster
    ),
    s2 AS (
      SELECT e.vec_id, c1.cluster,
             {_D_KM_DIST.format(c='c1')} AS d
      FROM emb e, c1
    ),
    a2 AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster)
                   AS rn
        FROM s2
      ) WHERE rn = 1
    )
    SELECT vec_id, cluster FROM a2
    """,
)
def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        F.col("embedding").alias("v"),
    )
    cents = _emb(spark, sf_dir).filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cluster"),
        F.transform("embedding", lambda x: x.cast("double")).alias("c"),
    )
    assigned = _km_assign(emb, cents)
    for _ in range(KM_ITERS - 1):
        cents = _km_update(assigned)
        assigned = _km_assign(emb, cents)
    return assigned.select("vec_id", "cluster")


# ---------------------------------------------------------------------------
# per-label vector centroid accumulation — the feature-store "long
# format": (label, dimension) → exact fixed-point element sum + count,
# i.e. the map-side partial every distributed centroid update (k-means'
# _km_update above, class prototypes, mean-pooling) reduces to. Exposing
# it as a query makes the accumulation itself oracle-checkable: floats
# are scaled to micro-unit BIGINTs BEFORE summing (floor(x·10⁶ + 0.5) —
# float→double widening is exact, so both engines fix identical
# integers), and integer sums are shuffle-order-proof. posexplode is the
# row-multiplying layout change (rows × 64 dims); the aggregate that
# follows combines map-side, so the shuffle carries one row per
# (label, dim) partial — at 100 TB the explode never materializes, it
# streams straight into the hash aggregate.
# ---------------------------------------------------------------------------
@register(
    "emb_centroid_by_label",
    # DuckDB zips the two parallel unnests positionally (same idiom as
    # udtf_tokenize_docs' oracle), giving (dim, element) pairs.
    oracle="""
    WITH ex AS (
      SELECT label,
             unnest(range(0, len(embedding))) AS dim,
             unnest(embedding) AS e
      FROM embeddings
    )
    SELECT label, dim,
           COUNT(*) AS n_vecs,
           CAST(SUM(CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5)
                         AS BIGINT)) AS BIGINT) AS sum_micro
    FROM ex
    GROUP BY label, dim
    """,
)
def emb_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "e"))
        .withColumn("dim", F.col("dim").cast("long"))
        .groupBy("label", "dim")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(
                F.floor(F.col("e").cast("double") * 1000000 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("sum_micro"),
        )
    )


# ---------------------------------------------------------------------------
# PQ ANN — product quantization (Jégou et al., "Product Quantization
# for Nearest Neighbor Search", TPAMI 2011), the memory-compressed ANN
# scale path that complements the LSH (sign-bucket) and IVF (cell
# probe) indexes above: the 64-dim vector is split into PQ_M=4
# subvectors, each quantized to one of PQ_K=16 codebook entries, so a
# 256-byte float vector becomes a 4-byte code — at 100 TB THE
# difference between an index that fits executor memory and one that
# doesn't. Distances to a query are approximated against the DECODED
# codes (ADC — mathematically identical to the classic per-query
# lookup table, expressed here as a fixed-order fold so both engines
# compute bit-equal doubles), a candidate pool of PQ_CAND is cut per
# query, and the exact cosine re-rank runs only on that pool.
#
# Scale shape: the codebook is ONE broadcast row (PQ_M sorted
# struct-arrays); encoding is a map-side projection (argmin over 16
# entries per subspace — no shuffle, the corpus is encoded in place);
# the ADC scoring crossJoins the 5-row broadcast query set; the only
# shuffles are the two per-query top-k windows. Codebook entries are
# the first PQ_K vectors' subvectors (deterministic seeds, the
# emb_kmeans c0 idiom) so the DuckDB oracle rebuilds the identical
# index; argmin/rank ties break by code/neighbor id.
# ---------------------------------------------------------------------------
PQ_M = 4
PQ_SUB = 16  # dims per subspace (PQ_M · PQ_SUB = 64)
PQ_K = 16  # codebook entries per subspace
PQ_CAND = 50  # ADC candidate pool per query


def _pq_duck_sq(a_expr: str, off: int, c_expr: str) -> str:
    """DuckDB sequential-fold sq-distance of a 16-dim subvector."""
    return (
        f"list_aggregate(list_transform(range(1, {PQ_SUB + 1}), "
        f"i -> ({a_expr}[{off} + i] - {c_expr}[i]) "
        f"* ({a_expr}[{off} + i] - {c_expr}[i])), 'sum')"
    )


def _pq_oracle() -> str:
    code_cols = ", ".join(
        f"MAX(CASE WHEN m = {m} THEN code END) AS code{m}"
        for m in range(PQ_M)
    )
    adc = " + ".join(
        f"{_pq_duck_sq('q.v', m * PQ_SUB, f'd{m}.sub')}" for m in range(PQ_M)
    )
    dec_joins = " ".join(
        f"JOIN cb d{m} ON d{m}.m = {m} AND d{m}.code = c.code{m}"
        for m in range(PQ_M)
    )
    # Per-subspace distance with the offset as a column (cb.m).
    enc_dist = (
        f"list_aggregate(list_transform(range(1, {PQ_SUB + 1}), "
        f"i -> (e.v[cb.m * {PQ_SUB} + i] - cb.sub[i]) "
        f"* (e.v[cb.m * {PQ_SUB} + i] - cb.sub[i])), 'sum')"
    )
    return f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    cb AS (
      SELECT m, vec_id AS code,
             v[m * {PQ_SUB} + 1 : (m + 1) * {PQ_SUB}] AS sub
      FROM emb, UNNEST(range(0, {PQ_M})) t(m)
      WHERE vec_id < {PQ_K}
    ),
    enc_long AS (
      SELECT e.vec_id, cb.m, cb.code,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.m
                                ORDER BY {enc_dist}, cb.code) AS rn
      FROM emb e CROSS JOIN cb
    ),
    codes AS (
      SELECT vec_id, {code_cols} FROM enc_long WHERE rn = 1 GROUP BY vec_id
    ),
    enc AS (
      SELECT e.vec_id, e.v, codes.* EXCLUDE (vec_id)
      FROM emb e JOIN codes USING (vec_id)
    ),
    adc AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             c.v AS cv, q.v AS qv,
             {adc} AS adc_d
      FROM emb q
      JOIN enc c ON q.vec_id <> c.vec_id
      {dec_joins}
      WHERE q.vec_id < {N_QUERIES}
    ),
    pool AS (
      SELECT query_id, neighbor_id, qv, cv FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adc_d, neighbor_id) AS rn
        FROM adc
      ) WHERE rn <= {PQ_CAND}
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id
             ) AS BIGINT) AS rank
      FROM pool
    ) WHERE rank <= {TOP_K}
    """


def _pq_sub(col: F.Column, m: int) -> F.Column:
    return F.slice(col, m * PQ_SUB + 1, PQ_SUB)


def _pq_codebook_row(emb: DataFrame) -> DataFrame:
    """Codebook as ONE broadcast row: PQ_M code-sorted struct arrays."""
    seeds = emb.filter(F.col("vec_id") < PQ_K)
    return seeds.agg(
        *[
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("vec_id").alias("code"),
                        F.transform(
                            _pq_sub(F.col("embedding"), m),
                            lambda x: x.cast("double"),
                        ).alias("sub"),
                    )
                )
            ).alias(f"cb{m}")
            for m in range(PQ_M)
        ]
    )


def _pq_encode(enc: DataFrame) -> DataFrame:
    """Add code0..codeM columns: map-side argmin per subspace (no
    shuffle). Input must carry `embedding` and the cb columns. The
    lambda must take exactly ONE parameter (a second would be bound to
    the array index by F.transform), so the subvector is captured via
    a factory."""

    def _scorer(s: F.Column):
        return lambda e: F.struct(
            _km_sqdist(s, e["sub"]).alias("d"), e["code"].alias("code")
        )

    for m in range(PQ_M):
        scored = F.transform(
            F.col(f"cb{m}"), _scorer(_pq_sub(F.col("embedding"), m))
        )
        enc = enc.withColumn(
            f"code{m}", F.element_at(F.array_sort(scored), 1)["code"]
        )
    return enc


def _pq_adc(qe: str = "qe") -> F.Column:
    """Fixed-subspace-order ADC distance against the decoded codes."""
    adc_d = None
    for m in range(PQ_M):
        dec = F.element_at(
            F.col(f"cb{m}"), (F.col(f"code{m}") + 1).cast("int")
        )["sub"]
        d_m = _km_sqdist(_pq_sub(F.col(qe), m), dec)
        adc_d = d_m if adc_d is None else adc_d + d_m
    return adc_d


@register("sim_ann_pq", oracle=_pq_oracle())
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    cb_row = _pq_codebook_row(emb)
    # The per-vector encode (PQ_M·PQ_K subspace sqdists + argmin sorts)
    # runs on a one-row-group local scan — repartition first so the
    # heavy projection is core-parallel (change-11 rule: work ≫ bytes).
    enc = _pq_encode(
        emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .crossJoin(F.broadcast(cb_row))
    )

    # ADC against the broadcast query set: distance to the DECODED code,
    # summed in fixed subspace order (engine-exact).
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = enc.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    )
    adc_d = _pq_adc("qe")
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "qe",
        F.col("embedding").alias("ce"),
        adc_d.alias("adc_d"),
    )
    w_pool = Window.partitionBy("query_id").orderBy("adc_d", "neighbor_id")
    pool = scored.withColumn("rn", F.row_number().over(w_pool)).filter(
        F.col("rn") <= PQ_CAND
    )

    # Exact cosine re-rank on the candidate pool only.
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc(cosine(F.col("qe"), F.col("ce"))), F.asc("neighbor_id")
    )
    return (
        pool.select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w_rank).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# Exact covariance / Gram accumulation — the X^T X shape under every
# distributed PCA, linear probe, whitening, or ridge solve: one pass
# over the corpus accumulates n, Σx_i, and Σx_i·x_j for every
# dimension pair (i ≤ j) of the leading PCA_DIMS dims. The pair
# explosion streams straight into a map-side-combined hash aggregate
# (the emb_centroid_by_label discipline squared), so the shuffle
# carries one row per (i, j) partial — D(D+1)/2 rows per partition —
# never per-vector data. All sums are exact micro-unit BIGINTs
# (|x|≤1 ⇒ products ≤ 1e12, corpus sums ≪ 2^63), so the accumulated
# moments are engine- and order-exact; the derived covariance is one
# identical double expression on both engines.
# ---------------------------------------------------------------------------
PCA_DIMS = 16

def _pair_expansion():
    """(xs, pair_structs) for the leading-PCA_DIMS upper-triangle pair
    moments: per-row nested-transform expansion — map-side, no
    self-join. Shared by emb_covariance_exact and
    emb_pca_power_iteration so the quantization and indexing can never
    diverge between the covariance and scatter pipelines."""
    xs = F.transform(
        F.slice("embedding", 1, PCA_DIMS),
        lambda e: F.floor(e.cast("double") * 1000000 + F.lit(0.5)).cast(
            "long"
        ),
    )
    idx = F.sequence(F.lit(0), F.lit(PCA_DIMS - 1))
    pair_structs = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.sequence(i, F.lit(PCA_DIMS - 1)),
                lambda j: F.struct(
                    i.cast("long").alias("i"),
                    j.cast("long").alias("j"),
                    F.element_at(F.col("_xs"), (i + 1).cast("int")).alias(
                        "xi"
                    ),
                    F.element_at(F.col("_xs"), (j + 1).cast("int")).alias(
                        "xj"
                    ),
                ),
            ),
        )
    )
    return xs, pair_structs



@register(
    "emb_covariance_exact",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id,
             unnest(range(0, {PCA_DIMS})) AS dim,
             unnest(embedding[1:{PCA_DIMS}]) AS e
      FROM embeddings
    ),
    m AS (
      SELECT vec_id, dim,
             CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
      FROM ex
    ),
    pairs AS (
      SELECT a.vec_id, a.dim AS i, b.dim AS j, a.x AS xi, b.x AS xj
      FROM m a JOIN m b ON a.vec_id = b.vec_id AND a.dim <= b.dim
    )
    SELECT i, j,
           COUNT(*) AS n,
           CAST(SUM(xi) AS BIGINT) AS sum_xi,
           CAST(SUM(xj) AS BIGINT) AS sum_xj,
           CAST(SUM(xi * xj) AS BIGINT) AS sum_xixj,
           (CAST(SUM(xi * xj) AS DOUBLE) / COUNT(*))
             - (CAST(SUM(xi) AS DOUBLE) / COUNT(*))
               * (CAST(SUM(xj) AS DOUBLE) / COUNT(*)) AS cov_micro2
    FROM pairs
    GROUP BY i, j
    ORDER BY i, j
    """,
)
def emb_covariance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # Per-row pair expansion as a NESTED array transform — no self-join,
    # no shuffle of per-vector data: each row emits its D(D+1)/2
    # (i, j, xi, xj) structs map-side and they stream straight into the
    # partial aggregate.
    xs, pair_structs = _pair_expansion()
    pairs = (
        emb.select(xs.alias("_xs"))
        .select(F.explode(pair_structs).alias("p"))
        .select("p.i", "p.j", "p.xi", "p.xj")
    )
    g = pairs.groupBy("i", "j").agg(
        F.count("*").alias("n"),
        F.sum("xi").alias("sum_xi"),
        F.sum("xj").alias("sum_xj"),
        F.sum(F.col("xi") * F.col("xj")).alias("sum_xixj"),
    )
    cov = (F.col("sum_xixj").cast("double") / F.col("n")) - (
        F.col("sum_xi").cast("double") / F.col("n")
    ) * (F.col("sum_xj").cast("double") / F.col("n"))
    return g.select(
        "i", "j", "n", "sum_xi", "sum_xj", "sum_xixj",
        cov.alias("cov_micro2"),
    ).orderBy("i", "j")


# ---------------------------------------------------------------------------
# Dominant eigenvector by power iteration — distributed PCA's top
# component, built ON the exact covariance accumulation above: ONE
# corpus pass produces the D×D scatter matrix, then PCA_ITERS unrolled
# matvec+normalize rounds run on the tiny matrix (256 rows — broadcast
# joins, no corpus access ever again). This is the canonical split of
# large-scale linear algebra on Spark: data-sized work once,
# iteration on a summary.
#
# Engine-exactness through an iterative float algorithm (the hard
# part): the scatter entries are formed in DECIMAL(38,0) (n·Σxixj −
# Σxi·Σxj overflows int64) and scaled to BIGINTs via a single
# double-floor; each matvec is then an EXACT integer sum; each
# normalization squares into DECIMAL(38,0), takes one double sqrt,
# and re-quantizes the vector to 1e6 fixed point with the portable
# floor(x+0.5). Every float op is an identical single expression on
# identical operands in both engines, and every accumulation is
# integer/DECIMAL — shuffle-order-proof, so three rounds stay
# bit-identical end to end.
# ---------------------------------------------------------------------------
PCA_ITERS = 3
_PCA_FP = 1000000


def _pca_oracle() -> str:
    head = f"""
    WITH ex AS (
      SELECT vec_id,
             unnest(range(0, {PCA_DIMS})) AS dim,
             unnest(embedding[1:{PCA_DIMS}]) AS e
      FROM embeddings
    ),
    mo AS (
      SELECT vec_id, dim,
             CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
      FROM ex
    ),
    g AS (
      SELECT a.dim AS i, b.dim AS j,
             COUNT(*) AS n,
             CAST(SUM(a.x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(b.x) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(a.x * b.x) AS DECIMAL(38,0)) AS sxy
      FROM mo a JOIN mo b ON a.vec_id = b.vec_id
      GROUP BY 1, 2
    ),
    m AS (
      SELECT i, j,
             CAST(floor(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy
                             AS DOUBLE) / 1e12) AS BIGINT) AS mij
      FROM g
    ),
    v0 AS (
      SELECT CAST(t.d AS BIGINT) AS i, CAST({_PCA_FP} AS BIGINT) AS v
      FROM UNNEST(range(0, {PCA_DIMS})) t(d)
    )"""
    steps = []
    prev = "v0"
    for k in range(1, PCA_ITERS + 1):
        steps.append(f"""
    w{k} AS (
      SELECT m.i, CAST(SUM(m.mij * {prev}.v) AS BIGINT) AS w
      FROM m JOIN {prev} ON m.j = {prev}.i
      GROUP BY m.i
    ),
    s{k} AS (
      SELECT sqrt(CAST(SUM(CAST(w AS DECIMAL(38,0))
                           * CAST(w AS DECIMAL(38,0))) AS DOUBLE)) AS nrm
      FROM w{k}
    ),
    v{k} AS (
      SELECT i,
             CAST(floor(CAST(w AS DOUBLE) / s{k}.nrm * {_PCA_FP} + 0.5)
                  AS BIGINT) AS v
      FROM w{k}, s{k}
    )""")
        prev = f"v{k}"
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT v{PCA_ITERS}.i AS dim, v{PCA_ITERS}.v AS eigvec_fp,
           floor(s{PCA_ITERS}.nrm / {_PCA_FP} * 1000000000.0 + 0.5)
             / 1000000000.0 AS eigval_scaled
    FROM v{PCA_ITERS}, s{PCA_ITERS}
    ORDER BY dim
    """
    )


@register("emb_pca_power_iteration", oracle=_pca_oracle())
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DecimalType

    emb = _emb(spark, sf_dir)
    # Upper-triangle moments via the same map-side nested-transform
    # pair expansion as emb_covariance_exact (no per-vector self-join);
    # the full matrix is recovered by mirroring the tiny aggregate.
    xs, pair_structs = _pair_expansion()
    dec = DecimalType(38, 0)
    g_up = (
        emb.select(xs.alias("_xs"))
        .select(F.explode(pair_structs).alias("p"))
        .select("p.i", "p.j", "p.xi", "p.xj")
        .groupBy("i", "j")
        .agg(
            F.count("*").alias("n"),
            F.sum("xi").cast(dec).alias("sx"),
            F.sum("xj").cast(dec).alias("sy"),
            F.sum(F.col("xi") * F.col("xj")).cast(dec).alias("sxy"),
        )
    )
    g = g_up.unionByName(
        g_up.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"),
            F.col("i").alias("j"),
            "n",
            F.col("sy").alias("sx"),
            F.col("sx").alias("sy"),
            "sxy",
        )
    )
    m = g.select(
        "i",
        "j",
        F.floor(
            (
                F.col("n").cast(dec) * F.col("sxy")
                - F.col("sx") * F.col("sy")
            ).cast("double")
            / F.lit(1e12)
        )
        .cast("long")
        .alias("mij"),
        # Materialize the D×D scatter ONCE: every unrolled matvec
        # references m, and each round's w feeds two consumers (the
        # norm and the next v) — left lazy, the corpus pair-explode
        # re-derives per reference and the plan compiled 75 exchanges
        # (r11 audit; the graph_hits lineage rule). m is 256 rows —
        # exactly the "iterate on a summary" split this query's
        # docstring promises.
    ).localCheckpoint(eager=True)
    v = spark.range(PCA_DIMS).select(
        F.col("id").alias("i"), F.lit(_PCA_FP).cast("long").alias("v")
    )
    nrm_col = None
    for _ in range(PCA_ITERS):
        w = (
            m.join(
                F.broadcast(v.select(F.col("i").alias("j"), "v")), "j"
            )
            .groupBy("i")
            .agg(F.sum(F.col("mij") * F.col("v")).alias("w"))
            .localCheckpoint(eager=True)
        )
        s = w.agg(
            F.sqrt(
                F.sum(F.col("w").cast(dec) * F.col("w").cast(dec)).cast(
                    "double"
                )
            ).alias("nrm")
        )
        v = w.crossJoin(F.broadcast(s)).select(
            "i",
            F.floor(
                F.col("w").cast("double") / F.col("nrm") * _PCA_FP
                + F.lit(0.5)
            )
            .cast("long")
            .alias("v"),
        )
        nrm_col = s
    return (
        v.crossJoin(F.broadcast(nrm_col))
        .select(
            F.col("i").alias("dim"),
            F.col("v").alias("eigvec_fp"),
            (
                F.floor(
                    F.col("nrm") / _PCA_FP * F.lit(1000000000.0) + F.lit(0.5)
                )
                / F.lit(1000000000.0)
            ).alias("eigval_scaled"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# ANN recall audit — the evaluation harness every approximate index
# needs before it replaces the exact path: per query point, what
# fraction of the TRUE top-k (brute force) does the LSH-bucketed
# index return? Reuses the two registered builders verbatim — the
# audit IS a join of their outputs (left semi per rank pair → count /
# k), so it stays correct as either implementation evolves. At 100 TB
# this runs on a sampled query set; the exact side is the expensive
# leg and bounds the audit cost, not the index.
# ---------------------------------------------------------------------------
@register(
    "sim_recall_audit",
    oracle=f"""
    WITH exact_tk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id ORDER BY {_D_COS} DESC, c.vec_id
               ) AS rank
        FROM embeddings q, embeddings c
        WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
      ) WHERE rank <= {TOP_K}
    ),
    approx_tk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id ORDER BY {_D_COS} DESC, c.vec_id
               ) AS rank
        FROM embeddings q, embeddings c
        WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
          AND ({_D_BUCKET.format(side='q')}) = ({_D_BUCKET.format(side='c')})
      ) WHERE rank <= {TOP_K}
    )
    SELECT e.query_id,
           COUNT(*) AS k_exact,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS recall_at_k
    FROM exact_tk e
    LEFT JOIN approx_tk a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    ORDER BY e.query_id
    """,
)
def sim_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = sim_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    approx = sim_ann_bucketed(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("a_neighbor")
    )
    j = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.a_neighbor),
        "left",
    ).select(exact.query_id, "neighbor_id", "a_neighbor")
    return (
        j.groupBy("query_id")
        .agg(
            F.count("*").alias("k_exact"),
            F.sum(
                F.when(F.col("a_neighbor").isNotNull(), 1).otherwise(0)
            ).alias("n_hit"),
            (
                F.sum(
                    F.when(F.col("a_neighbor").isNotNull(), 1).otherwise(0)
                ).cast("double")
                / F.count("*")
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# IVF-PQ — the composed production ANN index (FAISS's IVFPQ): IVF
# cells bound WHICH vectors a query inspects (NPROBE cells instead of
# the corpus), PQ codes bound WHAT is stored and scanned per vector
# (4 bytes instead of 256). The query path is: probe the NPROBE
# nearest cells → ADC-rank the probed cells' codes → exact-rerank the
# PQ_CAND pool. Both sub-indexes reuse the registered builders'
# construction verbatim (salted-hash IVF seeds; _pq_codebook_row /
# _pq_encode / _pq_adc), so this query pins their COMPOSITION, the
# thing a production deployment actually runs. All broadcast joins;
# the corpus is touched once to assign + encode.
# ---------------------------------------------------------------------------
def _ivfpq_oracle() -> str:
    h = (
        "CAST('0x' || substr(md5('"
        + _IVF_SALT
        + "' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)"
    )
    code_cols = ", ".join(
        f"MAX(CASE WHEN m = {m} THEN code END) AS code{m}"
        for m in range(PQ_M)
    )
    adc = " + ".join(
        f"{_pq_duck_sq('qv.v', m * PQ_SUB, f'd{m}.sub')}"
        for m in range(PQ_M)
    )
    dec_joins = " ".join(
        f"JOIN cb d{m} ON d{m}.m = {m} AND d{m}.code = c.code{m}"
        for m in range(PQ_M)
    )
    enc_dist = (
        f"list_aggregate(list_transform(range(1, {PQ_SUB + 1}), "
        f"i -> (e.v[cb.m * {PQ_SUB} + i] - cb.sub[i]) "
        f"* (e.v[cb.m * {PQ_SUB} + i] - cb.sub[i])), 'sum')"
    )
    return f"""
    WITH emb AS (
      SELECT vec_id, embedding, embedding::DOUBLE[] AS v FROM embeddings
    ),
    cent AS (
      SELECT vec_id AS cid, embedding FROM embeddings
      ORDER BY {h}, vec_id LIMIT {IVF_K}
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cid AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(
                     v.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                     c.cid
               ) AS rn
        FROM embeddings v, cent c
      ) WHERE rn = 1
    ),
    cb AS (
      SELECT m, vec_id AS code,
             v[m * {PQ_SUB} + 1 : (m + 1) * {PQ_SUB}] AS sub
      FROM emb, UNNEST(range(0, {PQ_M})) t(m)
      WHERE vec_id < {PQ_K}
    ),
    enc_long AS (
      SELECT e.vec_id, cb.m, cb.code,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.m
                                ORDER BY {enc_dist}, cb.code) AS rn
      FROM emb e CROSS JOIN cb
    ),
    codes AS (
      SELECT vec_id, {code_cols} FROM enc_long WHERE rn = 1 GROUP BY vec_id
    ),
    probes AS (
      SELECT query_id, cid AS cell FROM (
        SELECT q.vec_id AS query_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                     q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                     c.cid
               ) AS rn
        FROM embeddings q, cent c WHERE q.vec_id < {N_QUERIES}
      ) WHERE rn <= {IVF_NPROBE}
    ),
    adc AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             {adc} AS adc_d
      FROM probes p
      JOIN assign a ON a.cell = p.cell
      JOIN codes c ON c.vec_id = a.vec_id
      JOIN emb qv ON qv.vec_id = p.query_id
      {dec_joins}
      WHERE c.vec_id <> p.query_id
    ),
    pool AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adc_d, neighbor_id) AS rn
        FROM adc
      ) WHERE rn <= {PQ_CAND}
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT pool.query_id, pool.neighbor_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY pool.query_id
               ORDER BY list_cosine_similarity(
                   qe.embedding::DOUBLE[], ce.embedding::DOUBLE[]) DESC,
                   pool.neighbor_id
             ) AS BIGINT) AS rank
      FROM pool
      JOIN embeddings qe ON qe.vec_id = pool.query_id
      JOIN embeddings ce ON ce.vec_id = pool.neighbor_id
    ) WHERE rank <= {TOP_K}
    """


@register("sim_ann_ivfpq", oracle=_ivfpq_oracle())
def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.functions import hash60

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    h = hash60(F.concat(F.lit(_IVF_SALT), F.col("vec_id").cast("string")))
    cent = (
        emb.orderBy(h.asc(), F.col("vec_id").asc())
        .limit(IVF_K)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cemb"),
            norm(F.col("embedding")).alias("cn"),
        )
    )
    # Parallelize the one-row-group scan feeding the K-way assignment and
    # project per-vector norms once: dot/(en·cn) is cosine() bit-for-bit
    # at a third of the per-pair fold work (change-11 + guide §2.3).
    crossed = (
        emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select("vec_id", "embedding", norm(F.col("embedding")).alias("en"))
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "cid",
            (dot(F.col("embedding"), F.col("cemb")) / (F.col("en") * F.col("cn"))).alias("cos"),
        )
    )
    assign = crossed.groupBy("vec_id").agg(
        F.max_by(
            F.col("cid"), F.struct(F.col("cos"), (-F.col("cid")).alias("nc"))
        ).alias("cell"),
        F.first("embedding").alias("embedding"),
    )
    cb_row = _pq_codebook_row(emb)
    # The assignment's tiny post-shuffle output AQE-coalesces to one
    # partition; re-spread it so the PQ encode runs core-parallel (the
    # change-7 discipline — explicit repartition is exempt from AQE
    # coalescing).
    enc = _pq_encode(
        assign.repartition(
            spark.sparkContext.defaultParallelism, "vec_id"
        ).crossJoin(F.broadcast(cb_row))
    )

    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        norm(F.col("embedding")).alias("qn"),
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("cid"))
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qe",
            "qn",
            "cid",
            (dot(F.col("qe"), F.col("cemb")) / (F.col("qn") * F.col("cn"))).alias("qcos"),
        )
        .select(
            "query_id",
            "qe",
            "qn",
            F.col("cid").alias("cell"),
            F.row_number().over(wp).alias("prn"),
        )
        .filter(F.col("prn") <= IVF_NPROBE)
        .drop("prn")
    )
    cand = (
        F.broadcast(probes)
        .join(enc, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("adc_d", _pq_adc("qe"))
    )
    w_pool = Window.partitionBy("query_id").orderBy("adc_d", "vec_id")
    pool = cand.withColumn("rn", F.row_number().over(w_pool)).filter(
        F.col("rn") <= PQ_CAND
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc(cosine(F.col("qe"), F.col("embedding"))), F.asc("vec_id")
    )
    return (
        pool.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.row_number().over(w_rank).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# Late-interaction scoring — ColBERT-style MaxSim (Khattab & Zaharia,
# SIGIR 2020): a query is a SET of token vectors, a document a SET of
# token vectors, and the relevance score is Σ_q max_t cos(q, t) — each
# query token picks its best-matching document token. This is the
# retrieval model multi-vector training pipelines score with, and it
# composes from primitives the single-vector family above cannot: a
# per-(doc, query-token) MAX before the per-doc SUM.
#
# Corpus mapping: each ``label`` group is one "document" whose member
# embeddings are its token vectors; the query token set is the
# deterministic slice vec_id % 125 == 0 (4 tokens at sf0.01, growing
# with the corpus).
#
# Engine-exactness: elements are quantized to micro-unit BIGINTs first
# (the emb_centroids idiom), so dot products and norms are exact
# integer sums in any order; the only float step is
# dot / (sqrt(nq)·sqrt(nt)) — division and sqrt are IEEE
# correctly-rounded single expressions, identical in Spark and DuckDB
# — immediately re-quantized to a fixed-point BIGINT, after which MAX
# and SUM are order-free integer folds. Zero-norm vectors score 0 (r8
# ADVICE lesson).
#
# Scale: the query token set is the small side — ONE broadcast row set
# against the streaming corpus; per-(label, query-token) MAX and the
# per-label SUM are both partial-aggregatable hash aggregates keyed by
# label (+ token), so the corpus shuffles once on label at bounded
# width. No pairwise doc×doc term anywhere.
# ---------------------------------------------------------------------------
_MAXSIM_QMOD = 125  # vec_id % QMOD == 0 → query token
_MAXSIM_FP = 1_000_000


@register(
    "sim_maxsim_late_interaction",
    oracle=f"""
    WITH x AS (
      SELECT vec_id, label,
             list_transform(embedding,
                 e -> CAST(floor(CAST(e AS DOUBLE) * {_MAXSIM_FP} + 0.5)
                      AS BIGINT)) AS xv
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, label, xv,
             list_aggregate(list_transform(xv, v -> v * v), 'sum') AS nrm
      FROM x
    ),
    q AS (
      SELECT vec_id AS qid, xv AS qv, nrm AS qn FROM n
      WHERE vec_id % {_MAXSIM_QMOD} = 0
    ),
    best AS (
      SELECT t.label, q.qid,
             MAX(CASE WHEN q.qn = 0 OR t.nrm = 0 THEN 0
                 ELSE CAST(floor(
                     CAST(list_aggregate(
                         list_transform(range(1, len(q.qv) + 1),
                                        i -> q.qv[i] * t.xv[i]),
                         'sum') AS DOUBLE)
                     / (sqrt(CAST(q.qn AS DOUBLE))
                        * sqrt(CAST(t.nrm AS DOUBLE)))
                     * {_MAXSIM_FP} + 0.5) AS BIGINT) END) AS best_fp
      FROM n t, q
      GROUP BY t.label, q.qid
    )
    SELECT label,
           CAST((SELECT COUNT(*) FROM embeddings e
                 WHERE e.label = best.label) AS BIGINT) AS n_tokens,
           CAST(SUM(best_fp) AS BIGINT) AS maxsim_fp
    FROM best
    GROUP BY label
    ORDER BY maxsim_fp DESC, label
    """,
)
def sim_maxsim_late_interaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = _emb(spark, sf_dir)
    fp = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda e: F.floor(
                e.cast("double") * _MAXSIM_FP + F.lit(0.5)
            ).cast("long"),
        ).alias("xv"),
    ).withColumn(
        "nrm",
        F.aggregate(
            F.transform("xv", lambda v: v * v),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        ),
    )
    q = fp.filter(F.col("vec_id") % _MAXSIM_QMOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("xv").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "xv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    cos_fp = F.when(
        (F.col("qn") == 0) | (F.col("nrm") == 0), F.lit(0).cast("long")
    ).otherwise(
        F.floor(
            dot.cast("double")
            / (F.sqrt(F.col("qn").cast("double"))
               * F.sqrt(F.col("nrm").cast("double")))
            * _MAXSIM_FP
            + F.lit(0.5)
        ).cast("long")
    )
    best = (
        fp.join(F.broadcast(q))
        .select("label", "qid", cos_fp.alias("cos_fp"))
        .groupBy("label", "qid")
        .agg(F.max("cos_fp").alias("best_fp"))
    )
    n_tok = emb.groupBy("label").agg(F.count("*").alias("n_tokens"))
    return (
        best.groupBy("label")
        .agg(F.sum("best_fp").alias("maxsim_fp"))
        .join(n_tok, "label")
        .select("label", "n_tokens", "maxsim_fp")
        .orderBy(F.desc("maxsim_fp"), "label")
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation eval — the dimension-budget question MRL
# (Kusupati et al., NeurIPS 2022) training answers empirically: how
# much retrieval quality survives truncating stored embeddings to a
# prefix of their dimensions? The query scores recall@k of
# TRUNCATED-to-16-dim cosine top-k against the full-64-dim top-k per
# probe — the eval a pipeline runs before committing to a cheaper
# index. Composes the registered brute-force ranking with a sliced
# vector; same determinism argument as the rest of the family (rank
# order pinned by the corpus's ≥1e-6 adjacent-cosine gaps, output is
# integer ids/counts only).
#
# Scale: identical to sim_topk_bruteforce — probes broadcast, corpus
# streams through one narrow stage per ranking, TakeOrdered top-k;
# the truncated ranking reads the SAME column sliced, so a columnar
# store only materializes the prefix dims (the storage saving the
# eval is costing out).
# ---------------------------------------------------------------------------
_MRL_DIM = 16


@register(
    "emb_matryoshka_recall",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < {N_QUERIES}
    ),
    c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
    fr AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY list_cosine_similarity(qe::DOUBLE[], ce::DOUBLE[])
                        DESC, neighbor_id) AS rn
      FROM q, c WHERE query_id <> neighbor_id
    ),
    tr AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY list_cosine_similarity(
                          qe[1:{_MRL_DIM}]::DOUBLE[],
                          ce[1:{_MRL_DIM}]::DOUBLE[]) DESC,
                        neighbor_id) AS rn
      FROM q, c WHERE query_id <> neighbor_id
    )
    SELECT fr.query_id,
           CAST({TOP_K} AS BIGINT) AS k,
           CAST(COUNT(tr.neighbor_id) AS BIGINT) AS n_hits
    FROM fr
    LEFT JOIN tr ON tr.query_id = fr.query_id
                AND tr.neighbor_id = fr.neighbor_id
                AND tr.rn <= {TOP_K}
    WHERE fr.rn <= {TOP_K}
    GROUP BY fr.query_id
    """,
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.functions import cosine

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("neighbor_id"))
    w_full = Window.partitionBy("query_id").orderBy(
        F.desc("cos_full"), F.asc("neighbor_id")
    )
    w_trunc = Window.partitionBy("query_id").orderBy(
        F.desc("cos_trunc"), F.asc("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qe"), F.col("ce")).alias("cos_full"),
        cosine(
            F.slice("qe", 1, _MRL_DIM), F.slice("ce", 1, _MRL_DIM)
        ).alias("cos_trunc"),
    ).select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w_full).alias("rn_full"),
        F.row_number().over(w_trunc).alias("rn_trunc"),
    )
    full_k = scored.filter(F.col("rn_full") <= TOP_K).select(
        "query_id", "neighbor_id"
    )
    trunc_k = scored.filter(F.col("rn_trunc") <= TOP_K).select(
        "query_id", F.col("neighbor_id").alias("t_neighbor")
    )
    return (
        full_k.join(
            trunc_k,
            (full_k.query_id == trunc_k.query_id)
            & (full_k.neighbor_id == trunc_k.t_neighbor),
            "left",
        )
        .groupBy(full_k.query_id)
        .agg(
            F.lit(TOP_K).cast("long").alias("k"),
            F.count("t_neighbor").alias("n_hits"),
        )
    )


# ---------------------------------------------------------------------------
# MIPS via the asymmetric augmentation (Bachrach et al., RecSys 2014;
# Shrivastava & Li, NeurIPS 2014) — maximum-INNER-PRODUCT search, the
# retrieval order recommendation and unnormalized-embedding systems
# need, reduced to the cosine machinery every ANN index here already
# has. Corpus vectors get one extra dimension sqrt(M^2 - |c|^2) (M =
# max corpus norm), queries get a literal 0: the augmented cosine is
# then ip/(|q|*M), monotone in the inner product, so ANY
# cosine/L2 index (the bucketed/IVF/PQ paths above) serves MIPS
# unchanged. The query ranks every pair BOTH ways — directly by inner
# product and through the actually-augmented vectors — and emits the
# per-pair rank agreement as the audit.
#
# Scale: the augmentation is one corpus-pass scalar aggregate (max
# |c|^2 — order-independent, broadcast back as one row) plus a
# map-side array concat; scoring inherits _scored's
# broadcast-queries/stream-corpus shape, no corpus shuffle. Output is
# integer-only (ids, ranks, agreement) — rank order is pinned by
# floats whose adjacent gaps (~1e-6) dwarf engine divergence, per the
# module-header measurement.
# ---------------------------------------------------------------------------
_D_IP = "list_inner_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"
_D_SSQ_C = "list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])"


@register(
    "sim_mips_transform",
    oracle=f"""
    WITH m AS (
      SELECT MAX(list_inner_product(embedding::DOUBLE[],
                                    embedding::DOUBLE[])) AS m2
      FROM embeddings
    ), pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_D_IP} AS ip,
             list_cosine_similarity(
                 list_concat(q.embedding::DOUBLE[], [0.0]),
                 list_concat(c.embedding::DOUBLE[],
                             [sqrt(greatest(0.0, m.m2 - {_D_SSQ_C}))])
             ) AS cos_aug
      FROM embeddings q, embeddings c, m
      WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    ), r AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ip DESC, neighbor_id) AS rank_ip,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_aug DESC, neighbor_id)
                 AS rank_mips
      FROM pairs
    )
    SELECT query_id, neighbor_id,
           CAST(rank_ip AS BIGINT) AS rank_ip,
           CAST(rank_mips AS BIGINT) AS rank_mips,
           rank_ip = rank_mips AS agree
    FROM r
    WHERE rank_ip <= {TOP_K}
    ORDER BY query_id, rank_ip
    """,
)
def sim_mips_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.functions import dot

    emb = _emb(spark, sf_dir)
    ssq = dot(F.col("embedding"), F.col("embedding"))
    m = emb.agg(F.max(ssq).alias("m2"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.crossJoin(F.broadcast(m)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.concat(
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
            F.array(
                F.sqrt(
                    F.greatest(
                        F.lit(0.0),
                        F.col("m2")
                        - dot(F.col("embedding"), F.col("embedding")),
                    )
                )
            ),
        ).alias("ce_aug"),
    )
    pairs = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            dot(F.col("qe"), F.col("ce")).alias("ip"),
            cosine(
                F.concat(
                    F.transform(F.col("qe"), lambda x: x.cast("double")),
                    F.array(F.lit(0.0)),
                ),
                F.col("ce_aug"),
            ).alias("cos_aug"),
        )
    )
    w_ip = Window.partitionBy("query_id").orderBy(
        F.desc("ip"), F.asc("neighbor_id")
    )
    w_mips = Window.partitionBy("query_id").orderBy(
        F.desc("cos_aug"), F.asc("neighbor_id")
    )
    return (
        pairs.select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w_ip).cast("long").alias("rank_ip"),
            F.row_number().over(w_mips).cast("long").alias("rank_mips"),
        )
        .filter(F.col("rank_ip") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank_ip",
            "rank_mips",
            (F.col("rank_ip") == F.col("rank_mips")).alias("agree"),
        )
        .orderBy("query_id", "rank_ip")
    )


# ---------------------------------------------------------------------------
# JOHNSON-LINDENSTRAUSS RANDOM PROJECTION AUDIT — compress the
# embedding space with a ±1 projection (Achlioptas JCSS'03: Rademacher
# entries satisfy the JL lemma with the same guarantees as Gaussian)
# and CERTIFY the distance distortion pair-by-pair, the check a
# pipeline runs before swapping full vectors for sketches in dedup/ANN
# prefilters. Everything is EXACT: vectors are first int8-quantized
# (the emb_quantize_int8 scheme, floor(x/s·127 + 0.5) — two correctly
# rounded IEEE ops), the 16×64 sign matrix is PRECOMPUTED from the
# portable md5 hash and inlined as ±1 literals in both plans (data-
# independent, so no per-row hashing), and projections/distances are
# integer sums: y_r = Σ_d S[r][d]·q_d, D² = Σ(q_a−q_b)²,
# P² = Σ_r(y_a−y_b)². E[P²] = k·D², so the reported ratio
# P²/(k·D²) concentrates near 1 — one final IEEE division.
#
# Scale: the projection is map-side (k integer dots per row, constants
# broadcast in the plan itself); the audit pairs adjacent vec_ids via
# an equi-join on vec_id div 2 — no all-pairs anywhere. At 100 TB the
# same projection feeds the LSH/dedup prefilters; the audit runs on
# any deterministic pair sample.
# ---------------------------------------------------------------------------
_JL_K = 16
_JL_DIMS = 64  # fixture embedding width (TESTDATA.md)


def _jl_signs() -> tuple[tuple[int, ...], ...]:
    import hashlib

    def sgn(r: int, d: int) -> int:
        h = int(hashlib.md5(f"jl{r}:{d}".encode()).hexdigest()[:15], 16)
        return 1 - 2 * (h % 2)

    return tuple(
        tuple(sgn(r, d) for d in range(_JL_DIMS)) for r in range(_JL_K)
    )


_JL_S = _jl_signs()

_JL_Q_SQL = """
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE)
                               / GREATEST(CAST(list_aggregate(
                                     list_transform(embedding,
                                                    v -> abs(v)),
                                     'max') AS DOUBLE), 1e-300)
                               * 127.0 + 0.5) AS BIGINT)) AS q
      FROM embeddings
"""

_JL_Y_SQL = ", ".join(
    "list_aggregate(list_transform(range(1, {n} + 1), i -> q[i] * ([{s}])[i]), 'sum')".format(
        n=_JL_DIMS, s=", ".join(str(v) for v in row)
    )
    for row in _JL_S
)


@register(
    "emb_random_projection_jl",
    oracle=f"""
    WITH qz AS (
{_JL_Q_SQL}
    ),
    proj AS (
      SELECT vec_id, q, [{_JL_Y_SQL}] AS y
      FROM qz
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_aggregate(list_transform(range(1, {_JL_DIMS} + 1),
               i -> (a.q[i] - b.q[i]) * (a.q[i] - b.q[i])), 'sum') AS d2_q,
             list_aggregate(list_transform(range(1, {_JL_K} + 1),
               i -> (a.y[i] - b.y[i]) * (a.y[i] - b.y[i])), 'sum')
                 AS d2_proj
      FROM proj a JOIN proj b
        ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0
    )
    SELECT vec_a, vec_b,
           CAST(d2_q AS BIGINT) AS d2_q,
           CAST(d2_proj AS BIGINT) AS d2_proj,
           CAST(d2_proj AS DOUBLE) / ({_JL_K} * d2_q) AS distortion
    FROM pairs
    WHERE d2_q > 0
    ORDER BY vec_a
    """,
)
def emb_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    scale = F.array_max(F.transform(F.col("embedding"), F.abs)).cast(
        "double"
    )
    sden = F.greatest(scale, F.lit(1e-300))
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") / sden * 127.0 + 0.5),
    )
    zero = F.lit(0).cast("long")
    ys = [
        F.aggregate(
            F.zip_with(
                F.col("q"),
                F.array(*[F.lit(v) for v in _JL_S[r]]),
                lambda a, b: a * b,
            ),
            zero,
            lambda acc, x: acc + x,
        )
        for r in range(_JL_K)
    ]
    # Repartition before the 16 per-row projection folds (guide §2.5:
    # the 1-row-group embeddings scan is ONE partition, so the K·D
    # lambda arithmetic ran single-core) and materialize proj ONCE —
    # it feeds both pair sides, and subtree duplication otherwise
    # re-projects the whole corpus per side.
    proj = (
        emb.select("vec_id", "embedding")
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select("vec_id", q.alias("q"))
        .select("vec_id", "q", F.array(*ys).alias("y"))
        .localCheckpoint(eager=True)
    )
    a = proj.select(
        F.col("vec_id").alias("vec_a"),
        F.col("q").alias("qa"),
        F.col("y").alias("ya"),
    ).filter(F.col("vec_a") % 2 == 0)
    b = proj.select(
        F.col("vec_id").alias("vec_b"),
        F.col("q").alias("qb"),
        F.col("y").alias("yb"),
    )
    sq = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda x, y: (x - y) * (x - y)),
        zero,
        lambda acc, x: acc + x,
    )
    pairs = a.join(b, F.col("vec_b") == F.col("vec_a") + 1).select(
        "vec_a",
        "vec_b",
        sq(F.col("qa"), F.col("qb")).alias("d2_q"),
        sq(F.col("ya"), F.col("yb")).alias("d2_proj"),
    )
    return (
        pairs.filter(F.col("d2_q") > 0)
        .select(
            "vec_a",
            "vec_b",
            F.col("d2_q").cast("long").alias("d2_q"),
            F.col("d2_proj").cast("long").alias("d2_proj"),
            (
                F.col("d2_proj").cast("double")
                / (F.lit(_JL_K) * F.col("d2_q"))
            ).alias("distortion"),
        )
        .orderBy("vec_a")
    )


# ---------------------------------------------------------------------------
# SILHOUETTE SCORE — clustering-quality evaluation (Rousseeuw, JCAM
# 1987) in its centroid ("simplified") form, the variant every
# large-scale eval uses because the exact form is an all-pairs
# distance sum: per vector, a = dist to OWN label centroid, b = min
# dist to any OTHER centroid, s = (b − a)/max(a, b) ∈ [−1, 1]; the
# per-label mean diagnoses which clusters are coherent vs smeared —
# here over the fixtures' ground-truth labels, i.e. "how separable is
# this embedding space labelwise", the check run before trusting
# label-blocked SemDeDup pruning.
#
# Determinism: vectors and centroids are 1e6 fixed-point BIGINTs
# (centroid = sum div n, the emb_centroid_by_label quantization), so
# squared distances are EXACT integers; sqrt is correctly-rounded IEEE
# in both engines, the s expression is an identical-operand chain, and
# per-vector s pins through floor(s·1e9 + 0.5) BEFORE the label mean —
# integer sums only across rows (never order-dependent float
# accumulation).
#
# Scale: centroids are one posexplode aggregate (k·D rows) collected
# to k broadcast rows; scoring is a map-side crossJoin against those k
# centroid arrays (k ≪ corpus — the IVF/kmeans broadcast discipline);
# one final k-group aggregate. No vector-vector pair is ever formed.
# ---------------------------------------------------------------------------
_SIL_S = 1_000_000_000


@register(
    "emb_silhouette",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               e -> CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5)
                         AS BIGINT)) AS xq
      FROM embeddings
    ),
    ex AS (
      SELECT label,
             unnest(range(0, len(embedding))) AS dim,
             unnest(embedding) AS e
      FROM embeddings
    ),
    cm AS (
      SELECT label, dim, COUNT(*) AS n,
             SUM(CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5)
                      AS BIGINT)) AS s
      FROM ex GROUP BY 1, 2
    ),
    cents AS (
      SELECT label AS clabel,
             list(CAST(s // n AS BIGINT) ORDER BY dim) AS carr
      FROM cm GROUP BY label
    ),
    d AS (
      SELECT q.vec_id, q.label, c.clabel,
             CAST(list_aggregate(list_transform(
                    range(1, len(q.xq) + 1),
                    i -> (q.xq[i] - c.carr[i]) * (q.xq[i] - c.carr[i])),
                  'sum') AS BIGINT) AS d2
      FROM q CROSS JOIN cents c
    ),
    ab AS (
      SELECT vec_id, label,
             MAX(CASE WHEN clabel = label THEN d2 END) AS a2,
             MIN(CASE WHEN clabel <> label THEN d2 END) AS b2
      FROM d GROUP BY 1, 2
    ),
    s AS (
      SELECT label,
             CAST(floor(
               CASE WHEN GREATEST(sqrt(CAST(a2 AS DOUBLE)),
                                  sqrt(CAST(b2 AS DOUBLE))) = 0.0 THEN 0.0
                    ELSE (sqrt(CAST(b2 AS DOUBLE))
                          - sqrt(CAST(a2 AS DOUBLE)))
                         / GREATEST(sqrt(CAST(a2 AS DOUBLE)),
                                    sqrt(CAST(b2 AS DOUBLE))) END
               * {_SIL_S} + 0.5) AS BIGINT) AS s_fp
      FROM ab
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(s_fp) AS BIGINT) AS sum_s_fp,
           CAST(SUM(s_fp) // COUNT(*) AS BIGINT) AS mean_s_fp
    FROM s GROUP BY label ORDER BY label
    """,
)
def emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    micro = lambda e: F.floor(  # noqa: E731
        e.cast("double") * 1000000 + F.lit(0.5)
    ).cast("long")
    q = emb.select(
        "vec_id", "label", F.transform("embedding", micro).alias("xq")
    )
    cm = (
        emb.select("label", F.posexplode("embedding").alias("dim", "e"))
        .groupBy("label", "dim")
        .agg(F.count("*").alias("n"), F.sum(micro(F.col("e"))).alias("s"))
    )
    cents = (
        cm.select(
            F.col("label").alias("clabel"),
            F.struct("dim", F.expr("s div n").alias("c")).alias("dc"),
        )
        .groupBy("clabel")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("dc")), lambda x: x["c"]
            ).alias("carr")
        )
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("xq"), F.col("carr"), lambda x, c: (x - c) * (x - c)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    d = q.crossJoin(F.broadcast(cents)).select(
        "vec_id", "label", "clabel", d2.alias("d2")
    )
    ab = d.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("d2"))).alias(
            "a2"
        ),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d2"))).alias(
            "b2"
        ),
    )
    sa = F.sqrt(F.col("a2").cast("double"))
    sb = F.sqrt(F.col("b2").cast("double"))
    sil = F.when(F.greatest(sa, sb) == 0.0, F.lit(0.0)).otherwise(
        (sb - sa) / F.greatest(sa, sb)
    )
    s = ab.select(
        "label",
        F.floor(sil * F.lit(_SIL_S) + F.lit(0.5)).cast("long").alias("s_fp"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.sum("s_fp").cast("long").alias("sum_s_fp"),
            F.expr("sum(s_fp) div count(*)").cast("long").alias("mean_s_fp"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# MMR DIVERSIFICATION — maximal marginal relevance re-ranking
# (Carbonell & Goldstein, SIGIR'98), the standard "relevant but not
# redundant" greedy selector behind RAG context assembly and
# diversity-aware sample curation: from the MMR_POOL nearest vectors
# to a query, pick MMR_K greedily, each round maximizing
#   score = min_dist²_to_selected − dist²_to_query     (λ = 1/2 form)
# — relevance pulls toward the query, the min-distance term pushes
# away from everything already chosen. The query is the label-0
# centroid (deterministic, the emb_kmeans c0 idiom).
#
# Determinism: everything is exact micro-unit integer distance
# algebra (the emb_silhouette quantization); ties break (score DESC,
# vec_id). Greedy selection is inherently sequential — each round's
# winner is ONE row collected to the driver and broadcast back, the
# documented text_bpe_train_merges 1-row-argmax discipline (rounds
# are unrolled to MMR_K, exactly how a production re-ranker bounds
# its context budget).
#
# Scale: the pool cut is TakeOrderedAndProject over map-side
# distances to a broadcast query; every greedy round scores
# |pool| ≤ MMR_POOL rows against ≤ MMR_K broadcast selections — the
# corpus is touched ONCE.
# ---------------------------------------------------------------------------
MMR_POOL = 50
MMR_K = 8


def _mmr_duck_d2(a: str, b: str) -> str:
    return (
        f"CAST(list_aggregate(list_transform(range(1, len({a}) + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), 'sum') AS BIGINT)"
    )


def _mmr_oracle() -> str:
    base = f"""
    q AS (
      SELECT vec_id,
             list_transform(embedding,
               e -> CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5)
                         AS BIGINT)) AS xq
      FROM embeddings
    ),
    cent AS (
      SELECT list(CAST(s // n AS BIGINT) ORDER BY dim) AS carr
      FROM (
        SELECT dim, COUNT(*) AS n,
               SUM(CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT)) AS s
        FROM (
          SELECT unnest(range(0, len(embedding))) AS dim,
                 unnest(embedding) AS e
          FROM embeddings WHERE label = 0
        ) GROUP BY dim
      )
    ),
    pool AS MATERIALIZED (
      SELECT q.vec_id, q.xq,
             {_mmr_duck_d2("q.xq", "cent.carr")} AS dq
      FROM q CROSS JOIN cent
      ORDER BY dq, vec_id LIMIT {MMR_POOL}
    ),
    sel1 AS MATERIALIZED (
      SELECT 1 AS rank, vec_id, xq, dq, CAST(NULL AS BIGINT) AS score
      FROM pool ORDER BY dq, vec_id LIMIT 1
    )"""
    steps = []
    for r in range(2, MMR_K + 1):
        prev_union = " UNION ALL ".join(
            f"SELECT vec_id, xq FROM sel{i}" for i in range(1, r)
        )
        steps.append(f"""
    sel{r} AS MATERIALIZED (
      SELECT {r} AS rank, c.vec_id, c.xq, c.dq,
             CAST(MIN({_mmr_duck_d2("c.xq", "s.xq")}) - c.dq AS BIGINT)
                 AS score
      FROM pool c CROSS JOIN ({prev_union}) s
      WHERE c.vec_id NOT IN (SELECT vec_id FROM ({prev_union}))
      GROUP BY c.vec_id, c.xq, c.dq
      ORDER BY score DESC, c.vec_id LIMIT 1
    )""")
    sel_union = " UNION ALL ".join(
        f"SELECT rank, vec_id, dq, score FROM sel{i}"
        for i in range(1, MMR_K + 1)
    )
    return (
        "WITH " + base + "," + ",".join(steps)
        + f"""
    SELECT CAST(rank AS BIGINT) AS rank, vec_id,
           dq AS dist_q, score AS mmr_score
    FROM ({sel_union}) ORDER BY rank
    """
    )


@register("sim_mmr_diversify", oracle=_mmr_oracle())
def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    micro = lambda e: F.floor(  # noqa: E731
        e.cast("double") * 1000000 + F.lit(0.5)
    ).cast("long")
    q = emb.select(
        "vec_id", F.transform("embedding", micro).alias("xq")
    )
    cent = (
        emb.filter(F.col("label") == 0)
        .select(F.posexplode("embedding").alias("dim", "e"))
        .groupBy("dim")
        .agg(F.count("*").alias("n"), F.sum(micro(F.col("e"))).alias("s"))
        .select(F.struct("dim", F.expr("s div n").alias("c")).alias("dc"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list("dc")), lambda x: x["c"]
            ).alias("carr")
        )
    )

    def _d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, c: (x - c) * (x - c)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # ONE cluster job: the TakeOrderedAndProject pool cut — the corpus
    # is touched exactly once. The greedy selection itself runs over a
    # frame bounded by the MMR_POOL contract (≤ 50 rows of short
    # integer arrays), so it is a driver-side scalar computation in
    # the same class as the watermark cutoffs and BPE argmax rows:
    # collecting the pool ONCE and looping in Python replaces the old
    # per-round Spark job (broadcast join + shuffle + limit-1 collect,
    # MMR_K − 1 = 7 scheduler round-trips over a 50-row frame; guide
    # §5 — the driver should do no DATA work, but this is not data
    # work, it is the argmax over an already-reduced bounded pool).
    # Python ints are exact, so every score is bit-identical to the
    # old per-round aggregate.
    pool_rows = (
        q.crossJoin(F.broadcast(cent))
        .select("vec_id", "xq", _d2(F.col("xq"), F.col("carr")).alias("dq"))
        .orderBy("dq", "vec_id")
        .limit(MMR_POOL)
        .collect()
    )
    pool_py = [(r.vec_id, list(r.xq), r.dq) for r in pool_rows]

    def _pd2(a: list, b: list) -> int:
        return sum((x - c) * (x - c) for x, c in zip(a, b))

    first = min(pool_py, key=lambda t: (t[2], t[0]))
    selected = [(1, first[0], first[1], first[2], None)]
    chosen = {first[0]}
    for r in range(2, MMR_K + 1):
        best = None
        for vid, xq, dq in pool_py:
            if vid in chosen:
                continue
            score = min(
                _pd2(xq, sxq) for _, _, sxq, _, _ in selected
            ) - dq
            # (score DESC, vec_id ASC) tie-break, exactly the old
            # orderBy(desc(score), asc(vec_id)).limit(1)
            if best is None or (-score, vid) < (-best[3], best[0]):
                best = (vid, xq, dq, score)
        selected.append((r, best[0], best[1], best[2], best[3]))
        chosen.add(best[0])
    return spark.createDataFrame(
        [(r, vid, dq, score) for r, vid, _, dq, score in selected],
        "rank long, vec_id long, dist_q long, mmr_score long",
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# PERSISTED IVF index in the commit-log table format (VERDICT r13 #2):
# the index STOPS being a per-query rebuild. Centroids and postings
# live as two table-format tables; an incremental vector batch is
# assigned against the PERSISTED centroids and appended to the
# postings table (one commit, cost ∝ batch, the dedup_incremental
# discipline); the probe reads ONLY the index tables — the embeddings
# table is scanned once per BUILD BATCH, never per query and never
# for the corpus at probe time (pinned structurally: the probe path
# below touches tf_read/tf_scan frames exclusively).
#
# The postings land range-partitioned on the cell id, so every add
# action carries a tight per-file [cell_min, cell_max] — tf_scan's
# in-log data skipping then turns a cell probe into file pruning
# (pinned in-query: each probed cell's scan keeps < the live file
# count), which is exactly the partitionBy(cell)+partition-pruning
# read a 100 TB deployment runs; NPROBE/K of the postings are read.
# Centroid choice is deterministic (K lowest salted-hash vec_ids OF
# THE INITIAL BATCH — frozen at index creation, the real IVF
# lifecycle: later batches adopt the existing cells), so the DuckDB
# oracle rebuilds the identical index from the raw table.
# ---------------------------------------------------------------------------
_ANNP_SALT = "annp:"

# Shared by sim_ann_persisted and stream_ann_ingest: the streaming
# ingest assigns each micro-batch against the SAME persisted centroids,
# so the final index content — and therefore the probe result — is
# identical to the batch-built index regardless of how the increment
# was split into epochs.
_ANNP_ORACLE = f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding FROM embeddings
      WHERE vec_id % 4 <> 0
      ORDER BY CAST('0x' || substr(md5('{_ANNP_SALT}' ||
               CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT), vec_id
      LIMIT {IVF_K}
    ),
    assign AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT v.vec_id, v.embedding, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(
                     v.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                     c.cid
               ) AS rn
        FROM embeddings v, cent c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, cid AS cell FROM (
        SELECT q.vec_id AS query_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                     q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                     c.cid
               ) AS rn
        FROM embeddings q, cent c WHERE q.vec_id < {N_QUERIES}
      ) WHERE rn <= {IVF_NPROBE}
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY p.query_id
               ORDER BY list_cosine_similarity(
                   q.embedding::DOUBLE[], a.embedding::DOUBLE[]) DESC,
                   a.vec_id
             ) AS BIGINT) AS rank
      FROM probes p
      JOIN assign a ON p.cell = a.cell
      JOIN embeddings q ON q.vec_id = p.query_id
      WHERE a.vec_id <> p.query_id
    ) WHERE rank <= {TOP_K}
    """


def _annp_probe(
    spark: SparkSession, cent_path: str, post_path: str
) -> DataFrame:
    """The persisted-IVF probe: index tables only (centroids +
    postings), per-probed-cell scans riding the in-log file pruning.
    Shared by sim_ann_persisted and stream_ann_ingest."""
    from fluent_bit_filter_math_spark.sources.table_format import tf_read

    pcent = tf_read(spark, cent_path)
    queries = (
        tf_read(spark, post_path)
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
        )
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("qcos"), F.asc("cid")
    )
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(pcent))
        .select(
            "query_id",
            "qe",
            "cid",
            cosine(F.col("qe"), F.col("cemb")).alias("qcos"),
        )
        .select(
            "query_id", "qe", F.col("cid").alias("cell"),
            F.row_number().over(wp).alias("prn"),
        )
        .filter(F.col("prn") <= IVF_NPROBE)
        .drop("prn")
        # two consumers (the cell collect and the broadcast probe join)
        # — materialize the ≤ N_QUERIES×NPROBE routing frame once (r16)
        .localCheckpoint(eager=True)
    )
    # the probed cells: ≤ N_QUERIES × NPROBE driver-side scalars
    cells = sorted(
        r["cell"] for r in probes.select("cell").distinct().collect()
    )
    cand = _probe_cell_scans(spark, post_path, cells)
    scored = (
        F.broadcast(probes)
        .join(cand, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= TOP_K)
    )


@register("sim_ann_persisted", oracle=_ANNP_ORACLE)
def sim_ann_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from fluent_bit_filter_math_spark.functions import hash60
    from fluent_bit_filter_math_spark.scratch import scratch_dir
    from fluent_bit_filter_math_spark.sources.table_format import (
        latest_version,
        tf_append,
        tf_history,
        tf_pruned_files,
        tf_read,
    )

    emb = _emb(spark, sf_dir)
    base = scratch_dir("ann-persisted")
    cent_path = os.path.join(base, "centroids")
    post_path = os.path.join(base, "postings")

    # ---- index CREATION from the initial batch (vec_id % 4 != 0) ----
    initial = emb.filter(F.col("vec_id") % 4 != 0)
    h = hash60(
        F.concat(F.lit(_ANNP_SALT), F.col("vec_id").cast("string"))
    )
    cent = (
        initial.orderBy(h.asc(), F.col("vec_id").asc())
        .limit(IVF_K)
        .select(F.col("vec_id").alias("cid"),
                F.col("embedding").alias("cemb"))
    )
    tf_append(cent.coalesce(1), cent_path)

    pcent = tf_read(spark, cent_path)  # the PERSISTED centroids
    # ---- INCREMENTAL maintenance: one batch, one commit, cost ∝ batch
    # (both assignments depend only on pcent — checkpoints overlap,
    # commits stay ordered: _ranged_pair)
    increment = emb.filter(F.col("vec_id") % 4 == 0)
    r_init, r_inc = _ranged_pair(
        _assign_cells(initial, pcent), _assign_cells(increment, pcent)
    )
    tf_append(r_init, post_path)
    tf_append(r_inc, post_path)
    head = tf_history(post_path)[0]
    if head["n_removed"] != 0 or head["n_added"] > IVF_K:
        raise RuntimeError(
            "incremental index append not batch-bounded: "
            f"{head['n_added']} added, {head['n_removed']} removed"
        )

    # ---- PROBE: index tables only (centroids + postings), via the
    # shared helper; the table-shape pins stay here
    n_live = len(tf_pruned_files(post_path, [])[0])
    if latest_version(post_path) != 1 or n_live < 2:
        raise RuntimeError("postings table shape unexpected")
    return _annp_probe(spark, cent_path, post_path)


# ---------------------------------------------------------------------------
# INDEX-TABLE MAINTENANCE on the persisted IVF index (VERDICT r15 #4,
# the ANN twin of dedup_index_maintenance): ingest → compact the
# postings sort-clustered on `cell` (the probe key) → vacuum the
# pre-compact generations → checkpoint → probe again. Pins, in-query:
# every centroid cell still file-prunes on the compacted layout
# (kept < total via in-log stats), vacuum physically reclaimed files,
# and the post-maintenance probe is row-identical to the pre-compact
# probe (compaction is pure layout).
# ---------------------------------------------------------------------------


@register("sim_ann_maintenance", oracle=_ANNP_ORACLE)
def sim_ann_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from fluent_bit_filter_math_spark.functions import hash60
    from fluent_bit_filter_math_spark.scratch import scratch_dir
    from fluent_bit_filter_math_spark.sources.table_format import (
        latest_version,
        tf_append,
        tf_compact,
        tf_pruned_counts,
        tf_read,
        tf_vacuum,
    )

    emb = _emb(spark, sf_dir)
    base = scratch_dir("ann-maint")
    cent_path = os.path.join(base, "centroids")
    post_path = os.path.join(base, "postings")

    # creation + incremental maintenance (the sim_ann_persisted walk)
    initial = emb.filter(F.col("vec_id") % 4 != 0)
    h = hash60(
        F.concat(F.lit(_ANNP_SALT), F.col("vec_id").cast("string"))
    )
    cent = (
        initial.orderBy(h.asc(), F.col("vec_id").asc())
        .limit(IVF_K)
        .select(F.col("vec_id").alias("cid"),
                F.col("embedding").alias("cemb"))
    )
    tf_append(cent.coalesce(1), cent_path)
    pcent = tf_read(spark, cent_path)
    increment = emb.filter(F.col("vec_id") % 4 == 0)
    r_init, r_inc = _ranged_pair(
        _assign_cells(initial, pcent), _assign_cells(increment, pcent)
    )
    tf_append(r_init, post_path)
    tf_append(r_inc, post_path)

    before = _annp_probe(spark, cent_path, post_path).localCheckpoint(
        eager=True
    )

    # compact the postings clustered on the probe key; vacuum both
    # tables down to the compacted generation (two distinct tables —
    # independent unlink walks, overlapped per guide §2.6)
    tf_compact(
        spark, post_path, cluster_by=("cell",), n_files=IVF_K
    )
    removed = sum(
        len(r)
        for r in overlap(
            lambda: tf_vacuum(post_path, latest_version(post_path)),
            lambda: tf_vacuum(cent_path, latest_version(cent_path)),
        )
    )
    if removed == 0:
        raise RuntimeError(
            "vacuum after postings compaction reclaimed nothing"
        )

    # pruning survives the rewrite for EVERY cell — one metadata
    # resolve for the whole cell set (r17)
    cids = sorted(r["cid"] for r in pcent.select("cid").collect())
    counts, total = tf_pruned_counts(post_path, "cell", cids)
    for cid, n_kept in counts.items():
        if total > 1 and n_kept >= total:
            raise RuntimeError(
                f"cell {cid} probe does not file-prune after "
                f"compaction ({n_kept}/{total} files kept)"
            )

    after = _annp_probe(spark, cent_path, post_path).localCheckpoint(
        eager=True
    )
    # both symmetric-difference counts read only checkpointed frames —
    # independent actions, overlapped
    if any(
        n != 0
        for n in overlap(
            lambda: before.exceptAll(after).count(),
            lambda: after.exceptAll(before).count(),
        )
    ):
        raise RuntimeError(
            "ANN probe output changed across compact+vacuum"
        )
    # the pin was `before`'s last reader; the returned `after` is its
    # own eager checkpoint — free the superseded snapshot's blocks
    from fluent_bit_filter_math_spark.ckpt import (
        release_local_checkpoint,
    )

    release_local_checkpoint(before)
    return after


# ---------------------------------------------------------------------------
# PERSISTED IVF+PQ (the composed FAISS-style index, persisted): the
# r14 persisted-IVF tables grow the PQ layer — THREE commit-log
# tables: centroids (frozen at creation from the initial batch),
# codebooks (PQ_M × PQ_K subspace entries, trained once on the seed
# sample), and postings carrying (cell, vec_id, code0..3, embedding).
# The probe is TWO-PASS, which is the point of PQ at scale:
#   pass 1 — ADC over the probed cells reading ONLY the code columns
#     (Catalyst prunes the 64-float embedding out of the parquet scan;
#     the per-cell file pruning rides the in-log stats exactly like
#     sim_ann_persisted) → PQ_CAND pool per query;
#   pass 2 — fetch the POOL MEMBERS' true vectors by id from the same
#     pruned cells (a pushed IN filter over ≤ N_QUERIES·PQ_CAND ids —
#     driver-bounded by constants, the random-access-by-id a vector
#     store serves) and re-rank with exact cosine.
# Incremental maintenance assigns+encodes a new batch against the
# PERSISTED centroids/codebooks and appends one commit (cost ∝ batch,
# pinned ≤ IVF_K files, 0 removed).
# ---------------------------------------------------------------------------


def _probe_cell_scans(
    spark: SparkSession,
    post_path: str,
    cells: list,
    columns: list[str] | None = None,
    col: str = "cell",
    version: int | None = None,
) -> DataFrame:
    """Union of per-probed-cell snapshot scans riding the in-log stats
    file pruning. Pruning is asserted in AGGREGATE: at least one probed
    cell must keep fewer files than it inspected (the partitionBy(cell)
    layout's whole point at scale). When NO cell prunes — e.g. a tiny
    scale factor's repartitionByRange collapsed a commit's postings
    into one file so every cell lives in every file — the probe
    degrades to the (still row-correct) unpruned scans with a logged
    warning instead of aborting (ADVICE r14 #4): tf_scan applies the
    cell predicate as a real Spark filter either way, so skipping is a
    performance lever, never a correctness gate."""
    import warnings

    from fluent_bit_filter_math_spark.sources.table_format import (
        tf_pruned_counts,
        tf_scan_any,
    )

    # one metadata resolve for the whole probed set (r17; the per-cell
    # tf_pruned_files loop replayed the snapshot log once per value)
    counts, total = tf_pruned_counts(
        post_path, col, cells, version=version
    )
    any_pruned = any(n < total for n in counts.values())
    if not any_pruned:
        warnings.warn(
            f"ANN probe over {post_path}: no probed cell pruned any "
            "file via in-log stats — postings likely collapsed into "
            "one file; falling back to full (row-filtered) scans",
            stacklevel=2,
        )
    # ONE scan over the union of surviving files with a pushed IN
    # predicate (r16): row-identical to the old per-cell scan union —
    # stats/bloom skipping has no false negatives, so a file pruned
    # for a cell holds no rows of that cell — while a file serving
    # several probed cells is read once, not once per cell, and the
    # plan stays one scan node instead of |cells|.
    s = tf_scan_any(spark, post_path, col, cells, version=version)
    if columns is not None:
        s = s.select(*columns)
    return s


def _assign_cells(batch: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest persisted centroid per vector — broadcast K rows against
    the streaming batch, map-side-combinable max_by. Norms are projected
    once per vector/centroid before the cross join: dot/(en·cn) is
    cosine()'s exact IEEE expression, so assignments are bit-identical
    at a third of the per-pair fold work (guide §2.3). Partitioning is
    deliberately untouched — the output feeds _ranged_once, whose
    range-sampled file layout must stay stable.

    Measured-and-rejected (r17, twice): (a) a MAP-ONLY rewrite — collect
    the K centroids and fold them into one greatest() expression over
    per-centroid structs, removing the groupBy exchange entirely (plan
    verified 4 Exchange → 0, plans/r17/assign_cells_{before,after}.txt)
    — was 1.6-2x SLOWER per forced assignment at sf0.1 (0.66 s → 1.05 s
    solo; every lifecycle walk 20-60% worse) even with the norm
    projected once and the batch pre-spread across cores: the giant
    interpreted greatest-over-structs expression costs more per row
    than the exchange it saves. (b) replacing max_by with max(struct)
    to coax a hash aggregate: identical runtime (0.49 vs 0.48 solo
    min), identical output. The crossJoin+max_by shape stays."""
    return (
        batch.select(
            "vec_id", "embedding", norm(F.col("embedding")).alias("_en")
        )
        .crossJoin(
            F.broadcast(
                cents.select(
                    "cid", "cemb", norm(F.col("cemb")).alias("_cn")
                )
            )
        )
        .select(
            "vec_id",
            "embedding",
            "cid",
            (dot(F.col("embedding"), F.col("cemb")) / (F.col("_en") * F.col("_cn"))).alias("cos"),
        )
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.col("cid"),
                F.struct(F.col("cos"), (-F.col("cid")).alias("nc")),
            ).alias("cell"),
            F.first("embedding").alias("embedding"),
        )
        .select("cell", "vec_id", "embedding")
    )


def _ranged_pair(
    a: DataFrame, b: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Materialize two INDEPENDENT assign/encode frames concurrently
    (guide §2.6 — both depend only on the already-persisted centroids/
    codebooks, never on each other), returning their range-partitioned
    forms in call order. Only the eager checkpoints overlap; the caller
    still commits the two appends strictly in order, so same-table log
    versions — and the batch-bounded head pins — stay deterministic."""
    ra, rb = overlap(lambda: _ranged_once(a), lambda: _ranged_once(b))
    return ra, rb


def _ranged_once(df: DataFrame) -> DataFrame:
    """Materialize an assign/encode frame ONCE before its range-
    partitioned postings append: repartitionByRange's range-sampling
    pass otherwise recomputes the whole child (K-way cosine assignment,
    PQ encoding) a second time before the exchange (guide §2.4 — remove
    redundant passes; r16). Callers pass batch-/index-bounded frames,
    so the checkpoint is bounded too; the sampler sees identical data,
    so the produced file layout (and its in-log pruning stats) is
    unchanged."""
    return df.localCheckpoint(eager=True).repartitionByRange(
        IVF_K, "cell"
    )


def _annp_pq_oracle() -> str:
    h = (
        "CAST('0x' || substr(md5('"
        + _ANNP_SALT
        + "' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)"
    )
    code_cols = ", ".join(
        f"MAX(CASE WHEN m = {m} THEN code END) AS code{m}"
        for m in range(PQ_M)
    )
    adc = " + ".join(
        f"{_pq_duck_sq('qv.v', m * PQ_SUB, f'd{m}.sub')}"
        for m in range(PQ_M)
    )
    dec_joins = " ".join(
        f"JOIN cb d{m} ON d{m}.m = {m} AND d{m}.code = c.code{m}"
        for m in range(PQ_M)
    )
    enc_dist = (
        f"list_aggregate(list_transform(range(1, {PQ_SUB + 1}), "
        f"i -> (e.v[cb.m * {PQ_SUB} + i] - cb.sub[i]) "
        f"* (e.v[cb.m * {PQ_SUB} + i] - cb.sub[i])), 'sum')"
    )
    return f"""
    WITH emb AS (
      SELECT vec_id, embedding, embedding::DOUBLE[] AS v FROM embeddings
    ),
    cent AS (
      SELECT vec_id AS cid, embedding FROM embeddings
      WHERE vec_id % 4 <> 0
      ORDER BY {h}, vec_id LIMIT {IVF_K}
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cid AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(
                     v.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                     c.cid
               ) AS rn
        FROM embeddings v, cent c
      ) WHERE rn = 1
    ),
    cb AS (
      SELECT m, vec_id AS code,
             v[m * {PQ_SUB} + 1 : (m + 1) * {PQ_SUB}] AS sub
      FROM emb, UNNEST(range(0, {PQ_M})) t(m)
      WHERE vec_id < {PQ_K}
    ),
    enc_long AS (
      SELECT e.vec_id, cb.m, cb.code,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.m
                                ORDER BY {enc_dist}, cb.code) AS rn
      FROM emb e CROSS JOIN cb
    ),
    codes AS (
      SELECT vec_id, {code_cols} FROM enc_long WHERE rn = 1 GROUP BY vec_id
    ),
    probes AS (
      SELECT query_id, cid AS cell FROM (
        SELECT q.vec_id AS query_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                     q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                     c.cid
               ) AS rn
        FROM embeddings q, cent c WHERE q.vec_id < {N_QUERIES}
      ) WHERE rn <= {IVF_NPROBE}
    ),
    adc AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             {adc} AS adc_d
      FROM probes p
      JOIN assign a ON a.cell = p.cell
      JOIN codes c ON c.vec_id = a.vec_id
      JOIN emb qv ON qv.vec_id = p.query_id
      {dec_joins}
      WHERE c.vec_id <> p.query_id
    ),
    pool AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adc_d, neighbor_id) AS rn
        FROM adc
      ) WHERE rn <= {PQ_CAND}
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT pool.query_id, pool.neighbor_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY pool.query_id
               ORDER BY list_cosine_similarity(
                   qe.embedding::DOUBLE[], ce.embedding::DOUBLE[]) DESC,
                   pool.neighbor_id
             ) AS BIGINT) AS rank
      FROM pool
      JOIN embeddings qe ON qe.vec_id = pool.query_id
      JOIN embeddings ce ON ce.vec_id = pool.neighbor_id
    ) WHERE rank <= {TOP_K}
    """


@register("sim_ann_persisted_pq", oracle=_annp_pq_oracle())
def sim_ann_persisted_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from fluent_bit_filter_math_spark.functions import hash60
    from fluent_bit_filter_math_spark.scratch import scratch_dir
    from fluent_bit_filter_math_spark.sources.table_format import (
        tf_append,
        tf_history,
        tf_read,
    )

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    base = scratch_dir("ann-persisted-pq")
    cent_path = os.path.join(base, "centroids")
    cb_path = os.path.join(base, "codebooks")
    post_path = os.path.join(base, "postings")

    # ---- creation: centroids (initial batch) + codebooks (seed rows)
    initial = emb.filter(F.col("vec_id") % 4 != 0)
    h = hash60(
        F.concat(F.lit(_ANNP_SALT), F.col("vec_id").cast("string"))
    )
    cent = (
        initial.orderBy(h.asc(), F.col("vec_id").asc())
        .limit(IVF_K)
        .select(F.col("vec_id").alias("cid"),
                F.col("embedding").alias("cemb"))
    )
    tf_append(cent.coalesce(1), cent_path)
    seeds = emb.filter(F.col("vec_id") < PQ_K)
    cb_long = None
    for m in range(PQ_M):
        part = seeds.select(
            F.lit(m).alias("m"),
            F.col("vec_id").alias("code"),
            F.transform(
                _pq_sub(F.col("embedding"), m),
                lambda x: x.cast("double"),
            ).alias("sub"),
        )
        cb_long = part if cb_long is None else cb_long.unionAll(part)
    tf_append(cb_long.coalesce(1), cb_path)

    # the PERSISTED index state everything below runs from
    pcent = tf_read(spark, cent_path)
    pcb = tf_read(spark, cb_path)
    cb_row = pcb.agg(
        *[
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("m") == m,
                        F.struct(
                            F.col("code").alias("code"),
                            F.col("sub").alias("sub"),
                        ),
                    )
                )
            ).alias(f"cb{m}")
            for m in range(PQ_M)
        ]
    )

    def _enc(batch: DataFrame) -> DataFrame:
        enc = _pq_encode(
            _assign_cells(batch, pcent).crossJoin(F.broadcast(cb_row))
        )
        return enc.select(
            "cell",
            "vec_id",
            *(f"code{m}" for m in range(PQ_M)),
            "embedding",
        )

    # ---- incremental maintenance: one batch, one commit, cost ∝ batch
    # (both encodes read only the persisted centroids/codebooks —
    # checkpoints overlap, commits stay ordered: _ranged_pair)
    r_init, r_inc = _ranged_pair(
        _enc(initial), _enc(emb.filter(F.col("vec_id") % 4 == 0))
    )
    tf_append(r_init, post_path)
    tf_append(r_inc, post_path)
    head = tf_history(post_path)[0]
    if head["n_removed"] != 0 or head["n_added"] > IVF_K:
        raise RuntimeError(
            "incremental index append not batch-bounded: "
            f"{head['n_added']} added, {head['n_removed']} removed"
        )

    # ---- probe pass 0: route queries to NPROBE cells (index tables only)
    queries = (
        tf_read(spark, post_path)
        .filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qe"))
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("qcos"), F.asc("cid")
    )
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(pcent))
        .select(
            "query_id",
            "qe",
            "cid",
            cosine(F.col("qe"), F.col("cemb")).alias("qcos"),
        )
        .select(
            "query_id", "qe", F.col("cid").alias("cell"),
            F.row_number().over(wp).alias("prn"),
        )
        .filter(F.col("prn") <= IVF_NPROBE)
        .drop("prn")
        # two consumers (cell collect + the ADC candidate join) — one
        # evaluation of the bounded routing frame (r16)
        .localCheckpoint(eager=True)
    )
    cells = sorted(
        r["cell"] for r in probes.select("cell").distinct().collect()
    )

    def _cells_scan(columns: list[str]) -> DataFrame:
        return _probe_cell_scans(spark, post_path, cells, columns)

    # ---- pass 1: ADC over CODE COLUMNS ONLY (embedding pruned out)
    code_cols = ["cell", "vec_id"] + [f"code{m}" for m in range(PQ_M)]
    cand = (
        F.broadcast(probes)
        .join(_cells_scan(code_cols), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .crossJoin(F.broadcast(cb_row))
        .withColumn("adc_d", _pq_adc("qe"))
    )
    w_pool = Window.partitionBy("query_id").orderBy("adc_d", "vec_id")
    pool = (
        cand.withColumn("rn", F.row_number().over(w_pool))
        .filter(F.col("rn") <= PQ_CAND)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    pool_rows = pool.collect()  # ≤ N_QUERIES · PQ_CAND: constant-bounded
    ids = sorted({r["neighbor_id"] for r in pool_rows})

    # ---- pass 2: fetch the pool's TRUE vectors by id (pushed IN
    # filter over the same pruned cells), exact-cosine re-rank
    fetch = (
        _cells_scan(["vec_id", "embedding"])
        .filter(F.col("vec_id").isin(ids))
        .withColumnRenamed("embedding", "ce")
    )
    pool_df = spark.createDataFrame(
        [(r["query_id"], r["neighbor_id"]) for r in pool_rows],
        "query_id long, neighbor_id long",
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc(cosine(F.col("qe"), F.col("ce"))), F.asc("neighbor_id")
    )
    return (
        F.broadcast(pool_df)
        .join(
            fetch, F.col("neighbor_id") == F.col("vec_id")
        )
        .join(
            F.broadcast(queries.select("query_id", "qe")), "query_id"
        )
        .select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w_rank).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= TOP_K)
    )

# ---------------------------------------------------------------------------
# RETRAIN + DRIFT for the persisted IVF index (VERDICT r14 #3):
# sim_ann_persisted freezes centroids at creation, so under
# distribution shift recall decays silently. Two additions:
#
# * sim_ann_drift — the MONITOR: per-cell occupancy of the postings at
#   creation vs now, with an integer cross-multiplication share test
#   (2·n_now·total_created > 3·n_created·total_now ⇔ the cell's share
#   grew by >1.5×) — no floats, so the flag is engine-exact. One
#   groupBy over the index table per side; the raw corpus is never
#   touched.
# * sim_ann_retrain — the FIX, as commits: new centroids are re-seeded
#   FROM THE POSTINGS TABLE (the corpus table is never rescanned),
#   every posting is re-assigned, and both tables publish as overwrite
#   commits. Probes go through a one-row MANIFEST table pinning the
#   (centroids version, postings version) pair, and the retrain's last
#   act is one atomic manifest overwrite — a concurrent probe resolves
#   the manifest once and reads EITHER the old pair or the new pair,
#   never a half-built mix (and the old pair stays time-travelable
#   until vacuumed, so in-flight probes complete). The output is the
#   before/after recall comparison against brute-force truth
#   (hits_old/hits_new per query, integer-exact).
# ---------------------------------------------------------------------------
_ANNR_SALT = "annr:"


def _annr_build(spark: SparkSession, sf_dir: str, tag: str):
    """Create the persisted IVF index (initial batch + one incremental
    append) — the sim_ann_persisted trajectory, shared by the drift
    monitor and the retrain query. Returns (cent_path, post_path,
    base_dir)."""
    import os

    from fluent_bit_filter_math_spark.functions import hash60
    from fluent_bit_filter_math_spark.scratch import scratch_dir
    from fluent_bit_filter_math_spark.sources.table_format import (
        tf_append,
        tf_read,
    )

    emb = _emb(spark, sf_dir)
    base = scratch_dir(tag)
    cent_path = os.path.join(base, "centroids")
    post_path = os.path.join(base, "postings")
    initial = emb.filter(F.col("vec_id") % 4 != 0)
    h = hash60(
        F.concat(F.lit(_ANNP_SALT), F.col("vec_id").cast("string"))
    )
    cent = (
        initial.orderBy(h.asc(), F.col("vec_id").asc())
        .limit(IVF_K)
        .select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
        )
    )
    tf_append(cent.coalesce(1), cent_path)
    pcent = tf_read(spark, cent_path)
    increment = emb.filter(F.col("vec_id") % 4 == 0)
    r_init, r_inc = _ranged_pair(
        _assign_cells(initial, pcent), _assign_cells(increment, pcent)
    )
    tf_append(r_init, post_path)
    tf_append(r_inc, post_path)
    return cent_path, post_path, base


def _annr_h(salt: str) -> str:
    return (
        "CAST('0x' || substr(md5('"
        + salt
        + "' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)"
    )


@register(
    "sim_ann_drift",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding FROM embeddings
      WHERE vec_id % 4 <> 0
      ORDER BY {_annr_h(_ANNP_SALT)}, vec_id LIMIT {IVF_K}
    ),
    a0 AS (
      SELECT cell, COUNT(*) AS n_created FROM (
        SELECT v.vec_id, cid AS cell FROM (
          SELECT v.vec_id, c.cid,
                 ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_cosine_similarity(
                       v.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                       c.cid
                 ) AS rn
          FROM embeddings v, cent c WHERE v.vec_id % 4 <> 0
        ) v WHERE rn = 1
      ) GROUP BY cell
    ),
    a1 AS (
      SELECT cell, COUNT(*) AS n_now FROM (
        SELECT v.vec_id, cid AS cell FROM (
          SELECT v.vec_id, c.cid,
                 ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_cosine_similarity(
                       v.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                       c.cid
                 ) AS rn
          FROM embeddings v, cent c
        ) v WHERE rn = 1
      ) GROUP BY cell
    ),
    tot AS (SELECT (SELECT SUM(n_created) FROM a0) AS t0,
                   (SELECT SUM(n_now) FROM a1) AS t1)
    SELECT a1.cell,
           CAST(COALESCE(a0.n_created, 0) AS BIGINT) AS n_created,
           CAST(a1.n_now AS BIGINT) AS n_now,
           CAST(CASE WHEN 2 * a1.n_now * tot.t0
                          > 3 * COALESCE(a0.n_created, 0) * tot.t1
                THEN 1 ELSE 0 END AS INT) AS grew
    FROM a1 LEFT JOIN a0 ON a0.cell = a1.cell, tot
    ORDER BY a1.cell
    """,
)
def sim_ann_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_bit_filter_math_spark.sources.table_format import tf_read

    _, post_path, _ = _annr_build(spark, sf_dir, "ann-drift")
    occ0 = (
        tf_read(spark, post_path, 0)
        .groupBy("cell")
        .agg(F.count("*").alias("n_created"))
    )
    occ1 = (
        tf_read(spark, post_path)
        .groupBy("cell")
        .agg(F.count("*").alias("n_now"))
    )
    # two independent one-row totals — overlapped (guide §2.6)
    t0, t1 = overlap(
        lambda: occ0.agg(F.sum("n_created")).collect()[0][0],
        lambda: occ1.agg(F.sum("n_now")).collect()[0][0],
    )
    return (
        occ1.join(occ0, "cell", "left")
        .select(
            "cell",
            F.coalesce("n_created", F.lit(0)).alias("n_created"),
            F.col("n_now"),
            (
                2 * F.col("n_now") * F.lit(int(t0))
                > 3
                * F.coalesce("n_created", F.lit(0))
                * F.lit(int(t1))
            )
            .cast("int")
            .alias("grew"),
        )
        .orderBy("cell")
    )


def _annr_oracle() -> str:
    def assign(cent: str) -> str:
        return f"""
      SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cid AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(
                     v.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                     c.cid
               ) AS rn
        FROM embeddings v, {cent} c
      ) WHERE rn = 1"""

    def probes(cent: str) -> str:
        return f"""
      SELECT query_id, cid AS cell FROM (
        SELECT q.vec_id AS query_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                     q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                     c.cid
               ) AS rn
        FROM embeddings q, {cent} c WHERE q.vec_id < {N_QUERIES}
      ) WHERE rn <= {IVF_NPROBE}"""

    def res(probes_t: str, assign_t: str) -> str:
        return f"""
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY p.query_id
                 ORDER BY list_cosine_similarity(
                     q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                     a.vec_id
               ) AS rank
        FROM {probes_t} p
        JOIN {assign_t} a ON a.cell = p.cell
        JOIN embeddings e ON e.vec_id = a.vec_id
        JOIN embeddings q ON q.vec_id = p.query_id
        WHERE a.vec_id <> p.query_id
      ) WHERE rank <= {TOP_K}"""

    return f"""
    WITH cent_old AS (
      SELECT vec_id AS cid, embedding FROM embeddings
      WHERE vec_id % 4 <> 0
      ORDER BY {_annr_h(_ANNP_SALT)}, vec_id LIMIT {IVF_K}
    ),
    cent_new AS (
      SELECT vec_id AS cid, embedding FROM embeddings
      ORDER BY {_annr_h(_ANNR_SALT)}, vec_id LIMIT {IVF_K}
    ),
    assign_old AS ({assign("cent_old")}),
    assign_new AS ({assign("cent_new")}),
    probes_old AS ({probes("cent_old")}),
    probes_new AS ({probes("cent_new")}),
    res_old AS ({res("probes_old", "assign_old")}),
    res_new AS ({res("probes_new", "assign_new")}),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id ORDER BY {_D_COS} DESC, c.vec_id
               ) AS rank
        FROM embeddings q, embeddings c
        WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
      ) WHERE rank <= {TOP_K}
    )
    SELECT t.query_id,
           CAST(SUM(CASE WHEN ro.neighbor_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS hits_old,
           CAST(SUM(CASE WHEN rn2.neighbor_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS hits_new
    FROM truth t
    LEFT JOIN res_old ro
      ON ro.query_id = t.query_id AND ro.neighbor_id = t.neighbor_id
    LEFT JOIN res_new rn2
      ON rn2.query_id = t.query_id AND rn2.neighbor_id = t.neighbor_id
    GROUP BY t.query_id ORDER BY t.query_id
    """


@register("sim_ann_retrain", oracle=_annr_oracle())
def sim_ann_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from fluent_bit_filter_math_spark.functions import hash60
    from fluent_bit_filter_math_spark.sources.table_format import (
        latest_version,
        tf_append,
        tf_overwrite,
        tf_read,
    )

    cent_path, post_path, base = _annr_build(
        spark, sf_dir, "ann-retrain"
    )
    man_path = os.path.join(base, "manifest")
    tf_append(
        spark.createDataFrame(
            [(latest_version(cent_path), latest_version(post_path))],
            "cent_v long, post_v long",
        ),
        man_path,
    )
    m0 = latest_version(man_path)

    def probe(man_version: int) -> DataFrame:
        """Resolve the manifest ONCE, then read the pinned pair — the
        atomic-swap contract a concurrent prober gets."""
        man = tf_read(spark, man_path, man_version).collect()[0]
        pcent = tf_read(spark, cent_path, int(man["cent_v"]))
        posts = tf_read(spark, post_path, int(man["post_v"]))
        queries = posts.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
        )
        wp = Window.partitionBy("query_id").orderBy(
            F.desc("qcos"), F.asc("cid")
        )
        prb = (
            F.broadcast(queries)
            .crossJoin(F.broadcast(pcent))
            .select(
                "query_id",
                "qe",
                "cid",
                cosine(F.col("qe"), F.col("cemb")).alias("qcos"),
            )
            .select(
                "query_id",
                "qe",
                F.col("cid").alias("cell"),
                F.row_number().over(wp).alias("prn"),
            )
            .filter(F.col("prn") <= IVF_NPROBE)
            .drop("prn")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), F.asc("neighbor_id")
        )
        return (
            F.broadcast(prb)
            .join(posts, "cell")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                cosine(F.col("qe"), F.col("embedding")).alias("cos"),
            )
            .select(
                "query_id",
                "neighbor_id",
                F.row_number().over(w).alias("rank"),
            )
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id")
        )

    res_old = probe(m0)

    # ---- RETRAIN, from the postings only (never the raw corpus) ----
    posts = tf_read(spark, post_path)  # pre-retrain snapshot
    hn = hash60(
        F.concat(F.lit(_ANNR_SALT), F.col("vec_id").cast("string"))
    )
    new_cent = (
        posts.orderBy(hn.asc(), F.col("vec_id").asc())
        .limit(IVF_K)
        .select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
        )
    )
    cv1 = tf_overwrite(new_cent.coalesce(1), cent_path)
    pcent_new = tf_read(spark, cent_path, cv1)
    pv1 = tf_overwrite(
        _ranged_once(
            _assign_cells(posts.select("vec_id", "embedding"), pcent_new)
        ),
        post_path,
    )
    # the swap: ONE manifest commit publishes the new pair atomically
    tf_overwrite(
        spark.createDataFrame(
            [(cv1, pv1)], "cent_v long, post_v long"
        ),
        man_path,
    )
    if latest_version(man_path) != m0 + 1:
        raise RuntimeError("retrain must bump the manifest exactly once")

    res_new = probe(m0 + 1)

    # ---- before/after recall vs brute-force truth (postings-sourced)
    q = posts.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = posts.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
    )
    wt = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    truth = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qe"), F.col("ce")).alias("cos"),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.row_number().over(wt).alias("rank"),
        )
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    # res_old/res_new are ≤ N_QUERIES·TOP_K rows (25): broadcast them
    # so the truth side joins without the SortMergeJoin exchanges the
    # planner picks off its post-window size estimate (guide §3.1),
    # and the window's query_id partitioning carries into the groupBy.
    return (
        truth.join(
            F.broadcast(res_old.withColumn("h_old", F.lit(1))),
            ["query_id", "neighbor_id"],
            "left",
        )
        .join(
            F.broadcast(res_new.withColumn("h_new", F.lit(1))),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce("h_old", F.lit(0)))
            .cast("long")
            .alias("hits_old"),
            F.sum(F.coalesce("h_new", F.lit(0)))
            .cast("long")
            .alias("hits_new"),
        )
        .orderBy("query_id")
    )

# ---------------------------------------------------------------------------
# PQ CODEBOOK RETRAIN (VERDICT r15 #7), composing with sim_ann_retrain:
# that query retrains IVF centroids only — the persisted IVF-PQ index
# keeps its creation-time codebooks forever, so ADC quantization error
# drifts as the data does. Here the CODEBOOKS retrain from the
# postings' stored vectors (the corpus table is never rescanned):
# re-pick PQ_K codebook seeds from the postings under a retrain salt,
# RENUMBER codes 0..PQ_K-1 (the positional contract _pq_adc's decode
# indexing requires), re-encode every posting map-side against the new
# broadcast codebook row, and publish codebooks + postings + the
# one-row manifest in ONE atomic swap (the sim_ann_retrain rule: a
# concurrent probe resolves the manifest once and sees the old pair or
# the new pair, never new codes under old codebooks). Cells and
# centroids are untouched — this is the codebook half of the index
# lifecycle, orthogonal to the centroid half.
#
# Gated output: per-query ADC-vs-exact AGREEMENT@K before vs after —
# |ADC top-K ∩ exact-cosine top-K| within the probed cells, integer-
# exact in both engines (the 'does the compressed ranking still agree
# with the exact one' number a codebook retrain exists to improve).
# ---------------------------------------------------------------------------
_ANNRPQ_SALT = "annrpq:"


def _annr_pq_oracle() -> str:
    from fluent_bit_filter_math_spark.functions import duck_hash60

    h = (
        "CAST('0x' || substr(md5('"
        + _ANNP_SALT
        + "' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)"
    )
    hr = duck_hash60(
        f"'{_ANNRPQ_SALT}' || CAST(vec_id AS VARCHAR)"
    )
    enc_dist = (
        f"list_aggregate(list_transform(range(1, {PQ_SUB + 1}), "
        f"i -> (e.v[cb.m * {PQ_SUB} + i] - cb.sub[i]) "
        f"* (e.v[cb.m * {PQ_SUB} + i] - cb.sub[i])), 'sum')"
    )

    def codes_cte(cb: str) -> str:
        code_cols = ", ".join(
            f"MAX(CASE WHEN m = {m} THEN code END) AS code{m}"
            for m in range(PQ_M)
        )
        return f"""(
      SELECT vec_id, {code_cols} FROM (
        SELECT e.vec_id, cb.m, cb.code,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.m
                                  ORDER BY {enc_dist}, cb.code) AS rn
        FROM emb e CROSS JOIN {cb} cb
      ) WHERE rn = 1 GROUP BY vec_id
    )"""

    def adc_cte(cb: str, codes: str) -> str:
        adc = " + ".join(
            f"{_pq_duck_sq('qv.v', m * PQ_SUB, f'd{m}.sub')}"
            for m in range(PQ_M)
        )
        dec_joins = " ".join(
            f"JOIN {cb} d{m} ON d{m}.m = {m} AND d{m}.code = c.code{m}"
            for m in range(PQ_M)
        )
        return f"""(
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY p.query_id
                 ORDER BY {adc}, c.vec_id) AS rn
        FROM probes p
        JOIN assign a ON a.cell = p.cell
        JOIN {codes} c ON c.vec_id = a.vec_id
        JOIN emb qv ON qv.vec_id = p.query_id
        {dec_joins}
        WHERE c.vec_id <> p.query_id
      ) WHERE rn <= {TOP_K}
    )"""

    return f"""
    WITH emb AS MATERIALIZED (
      SELECT vec_id, embedding, embedding::DOUBLE[] AS v FROM embeddings
    ),
    cent AS MATERIALIZED (
      SELECT vec_id AS cid, embedding FROM embeddings
      WHERE vec_id % 4 <> 0
      ORDER BY {h}, vec_id LIMIT {IVF_K}
    ),
    assign AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cid AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(
                     v.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                     c.cid
               ) AS rn
        FROM embeddings v, cent c
      ) WHERE rn = 1
    ),
    cb0 AS MATERIALIZED (
      SELECT m, vec_id AS code,
             v[m * {PQ_SUB} + 1 : (m + 1) * {PQ_SUB}] AS sub
      FROM emb, UNNEST(range(0, {PQ_M})) t(m)
      WHERE vec_id < {PQ_K}
    ),
    nseed AS MATERIALIZED (
      SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY {hr}, vec_id) - 1
               AS code
      FROM emb QUALIFY code < {PQ_K}
    ),
    cb1 AS MATERIALIZED (
      SELECT m, code, v[m * {PQ_SUB} + 1 : (m + 1) * {PQ_SUB}] AS sub
      FROM nseed, UNNEST(range(0, {PQ_M})) t(m)
    ),
    codes0 AS MATERIALIZED {codes_cte("cb0")},
    codes1 AS MATERIALIZED {codes_cte("cb1")},
    probes AS MATERIALIZED (
      SELECT query_id, cid AS cell FROM (
        SELECT q.vec_id AS query_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                     q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                     c.cid
               ) AS rn
        FROM embeddings q, cent c WHERE q.vec_id < {N_QUERIES}
      ) WHERE rn <= {IVF_NPROBE}
    ),
    res0 AS MATERIALIZED {adc_cte("cb0", "codes0")},
    res1 AS MATERIALIZED {adc_cte("cb1", "codes1")},
    truth AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY p.query_id
                 ORDER BY list_cosine_similarity(
                     qv.v, e2.v) DESC, a.vec_id) AS rn
        FROM probes p
        JOIN assign a ON a.cell = p.cell
        JOIN emb e2 ON e2.vec_id = a.vec_id
        JOIN emb qv ON qv.vec_id = p.query_id
        WHERE a.vec_id <> p.query_id
      ) WHERE rn <= {TOP_K}
    )
    SELECT t.query_id,
           CAST(SUM(CASE WHEN r0.neighbor_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS hits_old,
           CAST(SUM(CASE WHEN r1.neighbor_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS hits_new
    FROM truth t
    LEFT JOIN res0 r0
      ON r0.query_id = t.query_id AND r0.neighbor_id = t.neighbor_id
    LEFT JOIN res1 r1
      ON r1.query_id = t.query_id AND r1.neighbor_id = t.neighbor_id
    GROUP BY t.query_id ORDER BY t.query_id
    """


@register("sim_ann_retrain_pq", oracle=_annr_pq_oracle())
def sim_ann_retrain_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from fluent_bit_filter_math_spark.functions import hash60
    from fluent_bit_filter_math_spark.scratch import scratch_dir
    from fluent_bit_filter_math_spark.sources.table_format import (
        latest_version,
        tf_append,
        tf_overwrite,
        tf_read,
    )

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    base = scratch_dir("ann-retrain-pq")
    cent_path = os.path.join(base, "centroids")
    cb_path = os.path.join(base, "codebooks")
    post_path = os.path.join(base, "postings")
    man_path = os.path.join(base, "manifest")

    # ---- creation: centroids + v0 codebooks (seed rows, code=vec_id)
    initial = emb.filter(F.col("vec_id") % 4 != 0)
    h = hash60(
        F.concat(F.lit(_ANNP_SALT), F.col("vec_id").cast("string"))
    )
    cent = (
        initial.orderBy(h.asc(), F.col("vec_id").asc())
        .limit(IVF_K)
        .select(F.col("vec_id").alias("cid"),
                F.col("embedding").alias("cemb"))
    )
    seeds = emb.filter(F.col("vec_id") < PQ_K)
    cb_long = None
    for m in range(PQ_M):
        part = seeds.select(
            F.lit(m).alias("m"),
            F.col("vec_id").alias("code"),
            F.transform(
                _pq_sub(F.col("embedding"), m),
                lambda x: x.cast("double"),
            ).alias("sub"),
        )
        cb_long = part if cb_long is None else cb_long.unionAll(part)
    # centroids and v0 codebooks land on two DISTINCT tables from two
    # independent frames — overlapped (guide §2.6)
    _, cb_v0 = overlap(
        lambda: tf_append(cent.coalesce(1), cent_path),
        lambda: tf_overwrite(cb_long.coalesce(1), cb_path),
    )
    pcent = tf_read(spark, cent_path)

    def _cb_row(version: int):
        pcb = tf_read(spark, cb_path, version)
        return pcb.agg(
            *[
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("m") == m,
                            F.struct(
                                F.col("code").alias("code"),
                                F.col("sub").alias("sub"),
                            ),
                        )
                    )
                ).alias(f"cb{m}")
                for m in range(PQ_M)
            ]
        )

    enc0 = _pq_encode(
        _assign_cells(emb, pcent).crossJoin(
            F.broadcast(_cb_row(cb_v0))
        )
    )
    post_v0 = tf_overwrite(
        _ranged_once(
            enc0.select(
                "cell",
                "vec_id",
                *(f"code{m}" for m in range(PQ_M)),
                "embedding",
            )
        ),
        post_path,
    )
    tf_append(
        spark.createDataFrame(
            [(cb_v0, post_v0)], "cb_v long, post_v long"
        ),
        man_path,
    )
    m0 = latest_version(man_path)

    # the probe routing is centroid-only — identical before/after
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("qcos"), F.asc("cid")
    )
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(pcent))
        .select(
            "query_id",
            "qe",
            "cid",
            cosine(F.col("qe"), F.col("cemb")).alias("qcos"),
        )
        .select(
            "query_id", "qe", F.col("cid").alias("cell"),
            F.row_number().over(wp).alias("prn"),
        )
        .filter(F.col("prn") <= IVF_NPROBE)
        .drop("prn")
        # consumed by 2 agreement passes × 2 rankings each (r16):
        # materialize the bounded routing frame once
        .localCheckpoint(eager=True)
    )

    def agreement(man_version: int) -> DataFrame:
        """|ADC top-K ∩ exact top-K| per query against the manifest-
        pinned (codebooks, postings) pair — resolved ONCE, the
        atomic-swap read contract."""
        man = tf_read(spark, man_path, man_version).collect()[0]
        posts = tf_read(spark, post_path, int(man["post_v"]))
        cbr = _cb_row(int(man["cb_v"]))
        cand = (
            F.broadcast(probes)
            .join(posts, "cell")
            .filter(F.col("vec_id") != F.col("query_id"))
            # the ADC ranking and the exact ranking both consume the
            # same bounded candidate pool — one postings join, not two
            # (r16)
            .localCheckpoint(eager=True)
        )
        w_adc = Window.partitionBy("query_id").orderBy(
            "adc_d", "vec_id"
        )
        res = (
            cand.crossJoin(F.broadcast(cbr))
            .withColumn("adc_d", _pq_adc("qe"))
            .withColumn("rn", F.row_number().over(w_adc))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", F.col("vec_id").alias("neighbor_id"))
        )
        w_ex = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), F.asc("vec_id")
        )
        truth = (
            cand.withColumn(
                "cos", cosine(F.col("qe"), F.col("embedding"))
            )
            .withColumn("rn", F.row_number().over(w_ex))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", F.col("vec_id").alias("neighbor_id"))
        )
        return (
            truth.join(
                res.withColumn("hit", F.lit(1)),
                ["query_id", "neighbor_id"],
                "left",
            )
            .groupBy("query_id")
            .agg(
                F.sum(F.coalesce("hit", F.lit(0)))
                .cast("long")
                .alias("hits")
            )
        )

    def _retrain() -> None:
        # ---- RETRAIN: new codebooks from the POSTINGS' stored
        # vectors, codes renumbered 0..PQ_K-1 (the positional decode
        # contract). Internally strictly sequential: codebooks →
        # re-encode → postings → the one-manifest atomic swap. ----
        posts_pre = tf_read(spark, post_path)
        hr = hash60(
            F.concat(
                F.lit(_ANNRPQ_SALT), F.col("vec_id").cast("string")
            )
        )
        # distributed TakeOrdered first (never a global-window pass
        # over the postings), then the renumbering window runs on
        # PQ_K rows
        w_seed = Window.orderBy("hseed", "vec_id")
        nseed = (
            posts_pre.select("vec_id", "embedding", hr.alias("hseed"))
            .orderBy("hseed", "vec_id")
            .limit(PQ_K)
            .withColumn("code", F.row_number().over(w_seed) - 1)
        )
        cb_new = None
        for m in range(PQ_M):
            part = nseed.select(
                F.lit(m).alias("m"),
                "code",
                F.transform(
                    _pq_sub(F.col("embedding"), m),
                    lambda x: x.cast("double"),
                ).alias("sub"),
            )
            cb_new = part if cb_new is None else cb_new.unionAll(part)
        cb_v1 = tf_overwrite(cb_new.coalesce(1), cb_path)
        reenc = _pq_encode(
            posts_pre.select("cell", "vec_id", "embedding").crossJoin(
                F.broadcast(_cb_row(cb_v1))
            )
        )
        post_v1 = tf_overwrite(
            _ranged_once(
                reenc.select(
                    "cell",
                    "vec_id",
                    *(f"code{m}" for m in range(PQ_M)),
                    "embedding",
                )
            ),
            post_path,
        )
        # the swap: ONE manifest commit publishes the new pair
        # atomically
        tf_overwrite(
            spark.createDataFrame(
                [(cb_v1, post_v1)], "cb_v long, post_v long"
            ),
            man_path,
        )

    # the pre-retrain agreement pass reads ONLY the m0-pinned pair
    # (tf_read resolves its file list at call time and nothing here
    # vacuums), so it overlaps with the retrain's writes (guide §2.6);
    # the manifest-bump pin runs after both settle
    h_old, _ = overlap(
        lambda: agreement(m0).localCheckpoint(eager=True),
        _retrain,
    )
    if latest_version(man_path) != m0 + 1:
        raise RuntimeError(
            "PQ retrain must bump the manifest exactly once"
        )

    h_new = agreement(m0 + 1)
    return (
        h_old.withColumnRenamed("hits", "hits_old")
        .join(
            h_new.withColumnRenamed("hits", "hits_new"), "query_id"
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# STREAMING INGEST into the persisted ANN index (VERDICT r14 #7): the
# table-format streaming sink chained into index maintenance. Vector
# micro-batches are assigned against the PERSISTED centroids inside
# foreachBatch and appended EXACTLY-ONCE (batch-id txn — the
# stream_cdf_apply_merge discipline), so a replayed epoch is a
# version-preserving no-op instead of duplicate postings. Because
# every epoch assigns against the same frozen centroids, the final
# index content — and therefore the probe — is IDENTICAL to the
# batch-built index: the oracle is sim_ann_persisted's, verbatim.
# Replay idempotence is pinned in-query (re-running the last epoch
# must not move the postings head).
# ---------------------------------------------------------------------------


@register("stream_ann_ingest", oracle=_ANNP_ORACLE)
def stream_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from fluent_bit_filter_math_spark.functions import hash60
    from fluent_bit_filter_math_spark.scratch import scratch_dir
    from fluent_bit_filter_math_spark.sources.table_format import (
        latest_version,
        tf_append,
        tf_append_batch,
        tf_read,
    )

    emb = _emb(spark, sf_dir)
    base = scratch_dir("stream-ann-ingest")
    cent_path = os.path.join(base, "centroids")
    post_path = os.path.join(base, "postings")

    # ---- index creation (batch): centroids + initial postings ----
    initial = emb.filter(F.col("vec_id") % 4 != 0)
    h = hash60(
        F.concat(F.lit(_ANNP_SALT), F.col("vec_id").cast("string"))
    )
    cent = (
        initial.orderBy(h.asc(), F.col("vec_id").asc())
        .limit(IVF_K)
        .select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
        )
    )
    tf_append(cent.coalesce(1), cent_path)
    pcent = tf_read(spark, cent_path)
    tf_append(
        _ranged_once(_assign_cells(initial, pcent)),
        post_path,
    )

    # ---- the increment arrives as a STREAM: 3 source files → 3
    # micro-batch epochs, each one idempotent commit ----
    increment = emb.filter(F.col("vec_id") % 4 == 0)
    src = os.path.join(base, "src")
    increment.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    epoch_ids: list[int] = []

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        tf_append_batch(
            _ranged_once(_assign_cells(batch_df, pcent)),
            post_path,
            batch_id,
        )
        epoch_ids.append(int(batch_id))

    (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    if not epoch_ids:
        raise RuntimeError("the ingest stream produced no epochs")

    # ---- replay-idempotence pin: Spark re-runs a failed epoch with
    # the SAME id; the txn guard must no-op it (the frame below is
    # never even evaluated — the id short-circuits first) ----
    head = latest_version(post_path)
    replay = _assign_cells(increment, pcent).repartitionByRange(
        IVF_K, "cell"
    )
    if tf_append_batch(replay, post_path, epoch_ids[-1]) is not None:
        raise RuntimeError("replayed epoch appended twice")
    if latest_version(post_path) != head:
        raise RuntimeError("replay moved the postings head")

    # ---- probe: identical to the batch-built index's, by design ----
    return _annp_probe(spark, cent_path, post_path)
