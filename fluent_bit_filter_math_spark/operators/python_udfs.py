"""Python UDF / UDAF / UDTF surface — the extension points the reference
lacks entirely (its operator set is a closed enum,
/root/reference/filter_math/math.h:27-40 — SURVEY.md §2.3's "UDF / UDAF /
UDTF surface" row).

Design stance (SURVEY.md §7.1): Python functions are the SLOW PATH. Every
hot-path operator in this engine compiles to native Column expressions;
these queries exist to prove the full extension surface works end-to-end
with the oracle gate, using the shapes a production pipeline would pick
when Python is genuinely unavoidable:

* scalar — `pandas_udf` (Arrow-batched, vectorized; ~10-100× the
  throughput of a row-at-a-time `@udf`);
* aggregation — `applyInPandas` over a grouped DataFrame: one Arrow
  batch per group, partial-agg-less but state-free (the 100 TB story is
  the group count, not the group size: groups here are event types);
* two-sided aggregation — `cogroup().applyInPandas`: both inputs
  co-partitioned in ONE shuffle, the kernel sees both sides whole per
  key (fuzzy reconciliation, custom alignment);
* raw-batch map — `mapInArrow`: pyarrow RecordBatches straight through,
  no pandas conversion — the lowest-overhead Python path;
* table function — `@udtf` with a lateral join (Spark 4 Python UDTF),
  one emitted row per token.

Float discipline: every Python-side aggregate is integer-exact (cents /
counts), so Arrow round-trips and pandas accumulation order can never
diverge from the DuckDB oracle.
"""

from __future__ import annotations

from typing import Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from fluent_bit_filter_math_spark.functions import exact_cents
from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table


# NOTE: the pandas_udf / udtf decorators are applied lazily inside the
# query builders, never at module level — executors re-import this module
# to unpickle the kernels, and the decorators' schema parsing requires a
# live session (driver-only).


# ---------------------------------------------------------------------------
# scalar pandas UDF — vectorized character/word stats per document.
# ---------------------------------------------------------------------------
def _char_count(text: pd.Series) -> pd.Series:
    return text.str.len().astype("int64")


@register(
    "udf_scalar_doc_stats",
    oracle="""
    SELECT doc_id, length(text) AS n_chars
    FROM documents
    WHERE doc_id % 10 = 0
    """,
)
def udf_scalar_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    char_count = pandas_udf(_char_count, "long")
    return docs.select("doc_id", char_count("text").alias("n_chars"))


# ---------------------------------------------------------------------------
# grouped-map UDAF — per-event-type totals via applyInPandas. Integer
# cents (the fixture's value has 2 dp) keep the Python-side sum exact.
# ---------------------------------------------------------------------------
def _type_totals(pdf: pd.DataFrame) -> pd.DataFrame:
    # `cents` arrives pre-fixed JVM-side via exact_cents (floor(x*100
    # + 0.5)): pandas `.round()` is half-to-even, and BOTH engines'
    # native round(DOUBLE) are rendering-dependent and mutually
    # divergent — the kernel only ever sums exact integers.
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_events": [len(pdf)],
            "total_cents": [int(pdf["cents"].sum())],
        }
    )


@register(
    "udaf_event_type_cents",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events
    GROUP BY event_type
    """,
)
def udaf_event_type_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", exact_cents(F.col("value")).alias("cents")
    )
    return ev.groupBy("event_type").applyInPandas(
        _type_totals, schema="event_type string, n_events long, total_cents long"
    )


# ---------------------------------------------------------------------------
# grouped-map UDAF #2 — per-event-type least-squares trend (cents vs
# seconds since the fixture epoch) via applyInPandas: the shape a
# production pipeline uses when the per-group kernel is genuinely
# imperative (scipy fit, changepoint, custom loss). Determinism
# discipline: x (whole seconds) and y (cents) are exact int64 JVM-side,
# the kernel accumulates Python arbitrary-precision integer sums (no
# float accumulation order), and only the final slope/intercept are
# computed in doubles — the identical two-operand IEEE expressions the
# DuckDB oracle spells out over its own exact HUGEINT sums.
# ---------------------------------------------------------------------------
_EPOCH_2024 = 1_704_067_200  # 2024-01-01 00:00:00 UTC, fixture min day


def _group_ols(pdf: pd.DataFrame) -> pd.DataFrame:
    xs = [int(v) for v in pdf["x"]]
    ys = [int(v) for v in pdf["cents"]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    num = float(n * sxy - sx * sy)
    den = float(n * sxx - sx * sx)
    if den == 0.0:
        # Degenerate group (single point or constant x): the fit is
        # undefined. Emit NULL, matching the oracle's NULLIF(den, 0)
        # division — a crash here would fail the whole Spark job.
        slope = None
        intercept = None
    else:
        slope = num / den
        intercept = (float(sy) - slope * float(sx)) / float(n)
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_events": [n],
            "slope_cents_per_s": [slope],
            "intercept_cents": [intercept],
        }
    )


@register(
    "udaf_group_ols",
    # DuckDB sums BIGINT into HUGEINT (exact 128-bit); the closed-form
    # slope/intercept mirror the kernel's final double expressions
    # operand-for-operand.
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             epoch_us(ts) // 1000000 - {_EPOCH_2024} AS x,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    sums AS (
      SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(cents) AS sy,
             SUM(x * x) AS sxx, SUM(x * cents) AS sxy
      FROM pts GROUP BY event_type
    )
    SELECT event_type,
           n AS n_events,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0)
             AS slope_cents_per_s,
           (CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept_cents
    FROM sums
    """,
)
def udaf_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NTZ → TIMESTAMP is exact under the UTC session pin (catalog.py);
    # whole seconds via integer floor-div of epoch micros — the same
    # exact BIGINT on both engines (DuckDB: epoch_us(ts) // 1000000).
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        (
            F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
            - F.lit(_EPOCH_2024)
        ).alias("x"),
        exact_cents(F.col("value")).alias("cents"),
    )
    return ev.groupBy("event_type").applyInPandas(
        _group_ols,
        schema=(
            "event_type string, n_events long,"
            " slope_cents_per_s double, intercept_cents double"
        ),
    )


# ---------------------------------------------------------------------------
# Python UDTF — tokenizer emitting (pos, token) rows via lateral join.
# ---------------------------------------------------------------------------
class _TokenizeUDTF:
    def eval(self, text: str):
        if text:
            for i, tok in enumerate(text.split(" ")):
                yield i, tok


@register(
    "udtf_tokenize_docs",
    # DuckDB zips parallel unnests in one SELECT: positions ∥ tokens.
    oracle="""
    SELECT doc_id,
           unnest(range(0, len(string_split(text, ' ')))) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id % 50 = 0
    """,
)
def udtf_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register(
        "fbm_tokenize",
        # Arrow-optimized UDTF (Spark 4): emitted rows cross the Python
        # boundary as Arrow batches instead of pickled rows — same
        # ~10-100x transfer win as pandas_udf vs row-at-a-time udf.
        udtf(
            _TokenizeUDTF,
            returnType="pos: bigint, token: string",
            useArrow=True,
        ),
    )
    table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM udtf_docs d, LATERAL fbm_tokenize(d.text) t
        """
    )


# ---------------------------------------------------------------------------
# co-grouped-map UDAF — groupBy().cogroup().applyInPandas: the two-sided
# Python extension point (fuzzy as-of matching, per-key reconciliation,
# custom interval alignment). The kernel reconciles each user's event
# activity against the order history of the same-id customer: both
# sides arrive as per-key pandas frames in ONE call. Scale story: the
# cogroup is a single co-partitioned shuffle of both inputs on the key
# — the same physical shape as a shuffle join, but the per-key kernel
# sees both sides whole. Integer-exact outputs (counts / cents) keep
# the Arrow round-trip bitwise.
# ---------------------------------------------------------------------------
def _reconcile(key: Tuple, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
    # each side arrives PRE-AGGREGATED to at most one (n, cents) row
    # per key (guide §2.3 — aggregate before you shuffle: the cogroup
    # previously shipped every event/order row through the shuffle and
    # the Arrow boundary just so this kernel could count+sum). The
    # kernel reconciles the partial sums — integer-exact, so the
    # output is bit-identical to the row-shipping version.
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [int(ev["n"].sum()) if len(ev) else 0],
            "n_orders": [int(od["n"].sum()) if len(od) else 0],
            "event_cents": [int(ev["cents"].sum()) if len(ev) else 0],
            "order_cents": [int(od["cents"].sum()) if len(od) else 0],
        }
    )


@register(
    "udaf_cogroup_reconcile",
    oracle="""
    WITH e AS (
      SELECT user_id, COUNT(*) AS n_events,
             CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                 AS event_cents
      FROM events GROUP BY user_id
    ),
    o AS (
      SELECT o_custkey AS user_id, COUNT(*) AS n_orders,
             CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                 AS order_cents
      FROM orders WHERE o_custkey < 150 GROUP BY o_custkey
    )
    SELECT COALESCE(e.user_id, o.user_id) AS user_id,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(event_cents, 0) AS event_cents,
           COALESCE(order_cents, 0) AS order_cents
    FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
    """,
)
def udaf_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", exact_cents(F.col("value")).alias("cents")
    )
    od = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 150)
        .select(
            F.col("o_custkey").alias("user_id"),
            exact_cents(F.col("o_totalprice")).alias("cents"),
        )
    )
    # aggregate BEFORE the cogroup shuffle (guide §2.3): built-in
    # count/sum do partial map-side aggregation, so one (n, cents) row
    # per key crosses the exchange and the Arrow boundary instead of
    # every event/order row; both aggregations hash-partition on
    # user_id, so the cogroup reuses their partitioning
    # pin the cogroup stage's parallelism (guide §2): the kernel's cost
    # is PER GROUP (one Python call + pandas frame per user), not per
    # byte, but AQE coalescing sizes partitions by bytes — the
    # pre-aggregated frames are ~50 KB, under the 1 MB minPartitionSize
    # floor, so AQE folded the stage into ONE partition and all |users|
    # kernel calls ran serially (measured: 1500 groups in 1 partition,
    # ~4.7 s; 32-way, sub-second). A plain post-agg repartition by the
    # same key+count is pruned as redundant at physical planning, so
    # the shape is TWO-LEVEL: a scan-partition-local partial aggregate
    # (map-side, one row per (pid, user)), then an explicit
    # repartition(n, user_id) — child partitioning differs, so the
    # exchange survives, and REPARTITION_BY_NUM origin is exempt from
    # AQE coalescing — then the final merge aggregate and both cogroup
    # sides reuse that partitioning with no further exchange. Integer
    # partial sums merge exactly (bit-identical output). Scale: every
    # exchange still carries one-row-per-user partials, and the Python
    # stage's partition count tracks the session shuffle setting.
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def _per_user(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(
                F.spark_partition_id().alias("__pid"), "user_id"
            )
            .agg(F.count("*").alias("pn"), F.sum("cents").alias("pc"))
            .repartition(n_shuffle, "user_id")
            .groupBy("user_id")
            .agg(F.sum("pn").alias("n"), F.sum("pc").alias("cents"))
        )

    return (
        _per_user(ev).groupBy("user_id")
        .cogroup(_per_user(od).groupBy("user_id"))
        .applyInPandas(
            _reconcile,
            schema=(
                "user_id long, n_events long, n_orders long,"
                " event_cents long, order_cents long"
            ),
        )
    )


# ---------------------------------------------------------------------------
# mapInArrow — the lowest-overhead Python extension point: batches
# arrive as raw pyarrow RecordBatches (no pandas conversion at all).
# The kernel computes exact fixed-point vector norms: each float32
# element widens to float64 (exact), scales to micro-unit int64 via
# floor(x·10⁶ + 0.5) (the repo's portable rounding idiom), and the
# sum of squares stays in int64 — nothing order- or engine-dependent
# ever crosses the boundary. Oracle: the same integer pipeline spelled
# as DuckDB list lambdas.
# ---------------------------------------------------------------------------
def _arrow_norms(batches):
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        vec_ids = batch.column("vec_id")
        embs = batch.column("embedding")
        out = []
        for i in range(batch.num_rows):
            x = np.asarray(embs[i].as_py(), dtype=np.float64)
            q = np.floor(x * 1_000_000 + 0.5).astype(np.int64)
            out.append(int(np.dot(q, q)))
        yield pa.RecordBatch.from_arrays(
            [vec_ids, pa.array(out, type=pa.int64())],
            names=["vec_id", "sq_norm_micro2"],
        )


@register(
    "emb_norm_arrow",
    oracle="""
    SELECT vec_id,
           CAST(list_aggregate(
             list_transform(
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                           AS BIGINT)),
               y -> y * y),
             'sum') AS BIGINT) AS sq_norm_micro2
    FROM embeddings
    """,
)
def emb_norm_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(
        _arrow_norms, schema="vec_id long, sq_norm_micro2 long"
    )


# ---------------------------------------------------------------------------
# pandas UDAF inside a WINDOW frame — the WindowInPandas operator, the
# one Python evaluation surface the UDF suite hadn't exercised: a
# GROUPED_AGG pandas_udf evaluated per sliding frame (trailing 10
# observations per user). The kernel sums exact integer cents and
# divides once, so the double result is the same single IEEE division
# DuckDB's AVG(BIGINT) performs on the identical exact sum — engine-
# bit-identical with no rounding discipline needed. Scale note: every
# frame ships to Python as an Arrow batch — ~frame×rows values across
# the boundary, the priciest window-evaluation mode Spark has; the
# native frame AVG is the production form, and this query exists to
# prove the API path end-to-end (the python_udfs.py charter), not to
# recommend it. Because the cost is O(rows × frame) Python transfer by
# design, the input is additionally sliced to one user_id residue
# class (user_id % 5 = 0, same predicate both engines) — the API proof
# needs every frame shape, not every row; the slice keeps the bench
# entry ~1 s instead of 5+ s at sf0.1 (r7 VERDICT #6).
# ---------------------------------------------------------------------------
_WPD_W = 10


@register(
    "udaf_window_pandas",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'click' AND user_id % 5 = 0
    )
    SELECT user_id, event_id,
           CAST(SUM(cents) OVER w AS BIGINT) AS frame_sum_cents,
           CAST(SUM(cents) OVER w AS DOUBLE) / COUNT(*) OVER w
               AS frame_mean_cents
    FROM o
    WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN {_WPD_W - 1} PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def udaf_window_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    @pandas_udf("long")
    def frame_sum(cents: pd.Series) -> int:
        return int(cents.sum())

    @pandas_udf("double")
    def frame_mean(cents: pd.Series) -> float:
        # exact integer sum, ONE double division — mirrors AVG(BIGINT)
        return float(int(cents.sum())) / len(cents)

    ev = table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "click") & (F.col("user_id") % 5 == 0)
    )
    o = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        exact_cents(F.col("value")).alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-(_WPD_W - 1), 0)
    )
    return o.select(
        "user_id",
        "event_id",
        frame_sum(F.col("cents")).over(w).alias("frame_sum_cents"),
        frame_mean(F.col("cents")).over(w).alias("frame_mean_cents"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# POLYMORPHIC Python UDTF — the Spark 4 `analyze()` protocol, where
# the table function's OUTPUT SCHEMA is computed at plan time from
# its arguments (the DataFrame-era answer to Hive's fixed-schema
# UDTFs): `fbm_fields(text, k)` splits the first k tokens into
# columns c1..ck, and k different call sites get k different schemas
# from ONE registered function. analyze() receives constant-foldable
# arguments with their values; a non-constant k is rejected at plan
# time (enforced in the unit test), which is exactly the
# static-schema guarantee Catalyst needs to keep the lateral join
# fully optimizable. eval stays Arrow-batched.
# ---------------------------------------------------------------------------
_FIELDS_K = 3


class _SplitFieldsUDTF:
    @staticmethod
    def analyze(text, k):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if k.value is None:
            raise Exception("k must be a constant literal")
        schema = StructType()
        for i in range(int(k.value)):
            schema = schema.add(f"c{i + 1}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, k: int):
        toks = (text or "").split(" ")
        yield tuple(
            toks[i] if i < len(toks) else None for i in range(int(k))
        )


@register(
    "udtf_analyze_polymorphic",
    oracle=f"""
    SELECT doc_id,
           string_split(text, ' ')[1] AS c1,
           string_split(text, ' ')[2] AS c2,
           string_split(text, ' ')[3] AS c3
    FROM documents
    WHERE doc_id % 25 = 0
    """,
)
def udtf_analyze_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("fbm_fields", udtf(_SplitFieldsUDTF, useArrow=True))
    table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 25 == 0
    ).createOrReplaceTempView("udtf_poly_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, t.c1, t.c2, t.c3
        FROM udtf_poly_docs d, LATERAL fbm_fields(d.text, {_FIELDS_K}) t
        """
    )
