"""Multimodal-column operators: opaque ``binary`` payloads + typed metadata.

SURVEY.md §2.3 extension. The container has no image/audio codecs, so
the *decode* kernels are stubs (`NotImplementedError` behind
``SPARK_GRAFT_REAL_DECODE``) with a deterministic fake in their place —
but everything Spark-side is real and tested: the binary column, the
Arrow-batched ``mapInPandas`` plumbing, the output schemas, and the
frame-sampling explode.

The fixture set has no binary table, so payloads are derived in-plan
from ``documents.text`` via ``encode(text, 'utf-8')`` — an honest
binary column as far as Spark's type system, Arrow transfer, and the
Pandas UDFs are concerned.

Scale design: decode is embarrassingly parallel — ``mapInPandas``
streams Arrow batches through the Python worker with no shuffle and no
driver involvement; partition count alone controls parallelism. The
deterministic fake keeps the full pipeline oracle-checkable: the
"decoded" metadata is pure arithmetic on byte length, which DuckDB
reproduces, so the driver hash-verifies the plumbing end to end (a
unique property you lose the moment a real codec enters — then you
fall back to schema + row-count checks).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

REAL_DECODE = os.environ.get("SPARK_GRAFT_REAL_DECODE", "") == "1"

_FAKE_W, _FAKE_H, _FAKE_FR = 640, 480, 30  # fake-decode modulus constants


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents recast as a multimodal asset table: id + binary payload."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.col("source").alias("container"),
    )


# ---------------------------------------------------------------------------
# metadata extraction — native expressions over the binary column.
# ---------------------------------------------------------------------------
@register(
    "mm_metadata",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash,
           source AS container
    FROM documents
    """,
)
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _assets(spark, sf_dir)
    return a.select(
        "asset_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_hash"),
        "container",
    )


# ---------------------------------------------------------------------------
# decode — Arrow-batched mapInPandas; stubbed kernel, real plumbing.
# ---------------------------------------------------------------------------
_DECODE_SCHEMA = (
    "asset_id long, width long, height long, n_frames long"
)


def _decode_kernel(payload: bytes) -> tuple[int, int, int]:
    """Per-asset decode. Real codecs are unavailable in this container."""
    if REAL_DECODE:
        raise NotImplementedError(
            "real image/audio decode requires codec libraries not present "
            "in this environment; unset SPARK_GRAFT_REAL_DECODE"
        )
    n = len(payload)
    return n % _FAKE_W, n % _FAKE_H, n % _FAKE_FR + 1


def _decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        decoded = pdf["payload"].map(_decode_kernel)
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "width": decoded.map(lambda t: t[0]),
                "height": decoded.map(lambda t: t[1]),
                "n_frames": decoded.map(lambda t: t[2]),
            }
        )


@register(
    "mm_decode",
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(strlen(text) % {_FAKE_W} AS BIGINT) AS width,
           CAST(strlen(text) % {_FAKE_H} AS BIGINT) AS height,
           CAST(strlen(text) % {_FAKE_FR} + 1 AS BIGINT) AS n_frames
    FROM documents
    """,
)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _assets(spark, sf_dir).mapInPandas(
        _decode_batches, schema=_DECODE_SCHEMA
    )


# ---------------------------------------------------------------------------
# frame sampling — decode (stub) then explode every k-th frame index with a
# deterministic per-frame fingerprint. Native explode; no Python row loop.
# ---------------------------------------------------------------------------
_FRAME_STEP = 7


@register(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(unnest(range(0, strlen(text) % {_FAKE_FR} + 1, {_FRAME_STEP}))
                AS BIGINT) AS frame_idx,
           md5(doc_id || ':' ||
               unnest(range(0, strlen(text) % {_FAKE_FR} + 1, {_FRAME_STEP})))
               AS frame_fp
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = mm_decode(spark, sf_dir)
    idx = F.explode(
        F.sequence(
            F.lit(0), F.col("n_frames") - 1, F.lit(_FRAME_STEP)
        )
    ).alias("frame_idx")
    return decoded.select("asset_id", idx).select(
        "asset_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.md5(
            F.concat_ws(":", F.col("asset_id"), F.col("frame_idx"))
        ).alias("frame_fp"),
    )
