"""Multimodal-column operators: opaque ``binary`` payloads + typed metadata.

SURVEY.md §2.3 extension. The decode kernels parse REAL container
formats with the stdlib alone: ``mm_decode`` synthesizes and parses
YUV4MPEG2 (Y4M) — the standard uncompressed video container —
``mm_wav_decode`` does the same for RIFF/WAVE PCM, and
``mm_png_decode`` decodes a genuinely COMPRESSED format: PNG, whose
DEFLATE layer ships with Python (``zlib``), including CRC-validated
chunk walking and full five-filter scanline reconstruction. Only
codecs needing external libraries (jpeg/h264/mp3) remain out of
scope; they would slot into the identical Arrow-batched
``mapInPandas`` shape with a different per-payload kernel.

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

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

# Y4M synthesis moduli: small dims keep the per-asset payload a few KB
# (frame = 3·w·h bytes under C444) while exercising every header field.
_Y4M_W_MOD, _Y4M_H_MOD, _Y4M_FR_MOD = 16, 12, 10


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents recast as a multimodal asset table: id + binary payload."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.col("source").alias("container"),
    )


# The sample-level kernels (PNG pixel plane, WAV PCM samples) index the
# PAYLOAD by byte while their oracles index ``text`` by character, so
# the two sides only provably agree when every character is one byte
# and the payload is non-empty (empty text would make the oracle's
# ``i % n`` divide by zero and the kernel fall back to a zero byte the
# oracle never sees). This guard — applied identically in the Spark
# plan and the oracle SQL (``strlen(text) > 0 AND length(text) =
# strlen(text)``; DuckDB strlen counts bytes, length counts chars) —
# turns that fixture-shaped assumption into an enforced contract.
# Header-only kernels (dims/frame counts from the byte LENGTH alone)
# stay on the unguarded ``_assets``: strlen == octet_length always.
_ASCII_GUARD_SQL = "strlen(text) > 0 AND length(text) = strlen(text)"


def _ascii_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.filter(
            (F.octet_length("text") > 0)
            & (F.length("text") == F.octet_length("text"))
        )
        .select(
            F.col("doc_id").alias("asset_id"),
            F.encode("text", "utf-8").alias("payload"),
            F.col("source").alias("container"),
        )
        # The fixture's documents land in ONE parquet file => one scan
        # partition => every mapInPandas codec kernel downstream ran
        # SERIAL (measured: the whole 420-JPEG query was 32x its codec
        # time). Codec work is embarrassingly parallel, so spread the
        # assets across the executor width. The width SCALES with the
        # session (defaultParallelism = total executor cores) and never
        # shrinks a scan that is already wider (a hardcoded 32 would
        # CAP parallelism at 1000 executors and force a full payload
        # shuffle downward — ADVICE r12); when the scan is already at
        # or above executor width, no repartition happens at all.
        .transform(_widen_to_executors)
    )


def _widen_to_executors(df: DataFrame) -> DataFrame:
    spark = df.sparkSession
    width = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= width:
        return df
    return df.repartition(width)


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
# REAL video-container decode — YUV4MPEG2 (Y4M), the standard
# uncompressed video interchange format: an ASCII parameter header
# ("YUV4MPEG2 W.. H.. F.. C444\n") followed by n_frames × ("FRAME\n" +
# raw planes). Needs no codec library, so the ingest kernel synthesizes
# a valid multi-frame Y4M stream per asset (dims/frame-count are
# arithmetic on the payload length, plane bytes are the payload cycled)
# and the decode kernel REALLY PARSES the container: magic + parameter
# tokens, per-frame marker validation, plane-length accounting, exact
# EOF. Corrupt payloads raise. Same honesty boundary as mm_wav_decode:
# only compressed codecs remain out of scope.
#
# Determinism: every synthesized parameter is arithmetic on the byte
# length, so the oracle reproduces the parsed output and the whole
# encode → binary → parse loop sits under the value-hash gate.
# ---------------------------------------------------------------------------
_DECODE_SCHEMA = (
    "asset_id long, width long, height long, n_frames long"
)


def _y4m_build(payload: bytes) -> bytes:
    n = len(payload)
    w = 4 + n % _Y4M_W_MOD
    h = 4 + n % _Y4M_H_MOD
    n_frames = n % _Y4M_FR_MOD + 1
    frame_len = 3 * w * h  # C444: full-resolution Y, U, V planes
    src = payload if payload else b"\x00"
    planes = (src * (frame_len // len(src) + 1))[:frame_len]
    header = f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C444\n".encode("ascii")
    return header + (b"FRAME\n" + planes) * n_frames


def _y4m_parse(payload: bytes) -> tuple[int, int, int]:
    """Real Y4M parse: magic + parameter tokens + frame accounting."""
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("no Y4M header line")
    tokens = payload[:nl].split(b" ")
    if tokens[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    params = {t[:1]: t[1:] for t in tokens[1:] if t}
    if b"W" not in params or b"H" not in params:
        raise ValueError("Y4M header missing W or H parameter")
    w, h = int(params[b"W"]), int(params[b"H"])
    if w <= 0 or h <= 0:
        raise ValueError("non-positive frame dimensions")
    colorspace = params.get(b"C", b"420")
    if colorspace == b"444":
        frame_len = 3 * w * h
    elif colorspace == b"420":
        if w % 2 or h % 2:
            raise ValueError("C420 requires even dimensions")
        frame_len = w * h * 3 // 2
    else:
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    pos, n_frames = nl + 1, 0
    while pos < len(payload):
        if payload[pos : pos + 6] != b"FRAME\n":
            raise ValueError("bad frame marker")
        pos += 6 + frame_len
        if pos > len(payload):
            raise ValueError("truncated frame planes")
        n_frames += 1
    return w, h, n_frames


def _decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        parsed = [_y4m_parse(_y4m_build(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "width": [p[0] for p in parsed],
                "height": [p[1] for p in parsed],
                "n_frames": [p[2] for p in parsed],
            }
        )


@register(
    "mm_decode",
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(4 + strlen(text) % {_Y4M_W_MOD} AS BIGINT) AS width,
           CAST(4 + strlen(text) % {_Y4M_H_MOD} AS BIGINT) AS height,
           CAST(strlen(text) % {_Y4M_FR_MOD} + 1 AS BIGINT) AS n_frames
    FROM documents
    """,
)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _assets(spark, sf_dir).mapInPandas(
        _decode_batches, schema=_DECODE_SCHEMA
    )


# ---------------------------------------------------------------------------
# frame sampling — Y4M decode, then explode every k-th frame index with a
# deterministic per-frame fingerprint. Native explode; no Python row loop.
# ---------------------------------------------------------------------------
_FRAME_STEP = 7


@register(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(unnest(range(0, strlen(text) % {_Y4M_FR_MOD} + 1, {_FRAME_STEP}))
                AS BIGINT) AS frame_idx,
           md5(doc_id || ':' ||
               unnest(range(0, strlen(text) % {_Y4M_FR_MOD} + 1, {_FRAME_STEP})))
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


# ---------------------------------------------------------------------------
# REAL container decode — uncompressed PCM WAV needs no codec library,
# so this path upgrades the decode story from "env-gated stub" to a
# genuine format parser: an ingest kernel synthesizes valid RIFF/WAVE
# files (44-byte canonical header + PCM16 frames derived from the
# document bytes), and the decode kernel REALLY PARSES the container —
# validates the RIFF/WAVE/fmt/data magics with struct.unpack, reads
# channel count / sample rate / block align from the header, and
# derives frame count from the data-chunk length. Corrupt payloads
# raise. Only COMPRESSED codecs (jpeg/h264/mp3) remain env-stubbed
# above — that boundary is now exactly "needs external codec", not
# "needs Python".
#
# Determinism: every synthesized header field is arithmetic on
# (doc_id, n_chars), so the oracle reproduces the parsed output and the
# whole encode → binary → parse loop sits under the value-hash gate.
# Both kernels are Arrow-batched mapInPandas — no shuffle, no driver.
# ---------------------------------------------------------------------------
def _wav_build(doc_id: int, text: bytes) -> bytes:
    import struct

    n_channels = 1 + doc_id % 2
    sample_rate = 8000 + (doc_id % 3) * 4000
    bits = 16
    block_align = n_channels * bits // 8
    # PCM16 frames derived from the text bytes (cycled per channel).
    n_frames = len(text)
    data = b"".join(
        struct.pack(
            "<" + "h" * n_channels,
            *[(text[i] - 128) * 256] * n_channels,
        )
        for i in range(n_frames)
    )
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
        b"data", len(data),
    )
    return hdr + data


def _wav_parse(payload: bytes) -> tuple[int, int, int, int]:
    """Real RIFF/WAVE parse: magic validation + header field extraction."""
    import struct

    (riff, _sz, wave, fmt, fmt_len, codec, n_channels, sample_rate,
     _byte_rate, block_align, bits, data_tag, data_len) = struct.unpack(
        "<4sI4s4sIHHIIHH4sI", payload[:44]
    )
    if riff != b"RIFF" or wave != b"WAVE" or fmt != b"fmt " or data_tag != b"data":
        raise ValueError("not a canonical PCM WAV container")
    if codec != 1 or bits != 16 or fmt_len != 16:
        raise ValueError("unsupported WAV encoding")
    if data_len != len(payload) - 44 or data_len % block_align:
        raise ValueError("truncated or misaligned data chunk")
    n_frames = data_len // block_align
    duration_us = n_frames * 1_000_000 // sample_rate
    return n_channels, sample_rate, n_frames, duration_us


def _wav_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [
            _wav_build(int(i), t)
            for i, t in zip(pdf["asset_id"], pdf["payload"])
        ]
        parsed = [_wav_parse(p) for p in payloads]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "n_channels": [p[0] for p in parsed],
                "sample_rate": [p[1] for p in parsed],
                "n_frames": [p[2] for p in parsed],
                "duration_us": [p[3] for p in parsed],
            }
        )


@register(
    "mm_wav_decode",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
           CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
           CAST(strlen(text) AS BIGINT) AS n_frames,
           CAST(strlen(text) AS BIGINT) * 1000000
             // (8000 + (doc_id % 3) * 4000) AS duration_us
    FROM documents
    """,
)
def mm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _assets(spark, sf_dir).mapInPandas(
        _wav_roundtrip_batches,
        schema=(
            "asset_id long, n_channels long, sample_rate long,"
            " n_frames long, duration_us long"
        ),
    )


# ---------------------------------------------------------------------------
# Audio feature extraction — per-asset signal ENERGY from the decoded
# PCM stream: the first real DSP feature over the WAV kernel (the
# decode queries above stop at container metadata; this one touches
# every sample). The mapInPandas kernel re-synthesizes the RIFF/WAVE
# container, validates it with the same parser, and accumulates the
# exact integer sum of squared int16 samples via numpy — per-asset
# work is O(samples), Arrow-batched, no shuffle before the final
# aggregate-free projection. The corpus text is ASCII, so the oracle
# reproduces every sample value ((byte − 128)·256, replicated per
# channel) from code points alone — the whole decode→feature path
# sits under the bitwise gate.
# ---------------------------------------------------------------------------
def _wav_energy_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out_ns, out_sq = [], []
        for i, t in zip(pdf["asset_id"], pdf["payload"]):
            payload = _wav_build(int(i), t)
            _wav_parse(payload)  # validate before touching samples
            arr = np.frombuffer(payload[44:], dtype="<i2").astype(np.int64)
            out_ns.append(len(arr))
            out_sq.append(int((arr * arr).sum()))
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "n_samples": out_ns,
                "sum_sq": out_sq,
            }
        )


@register(
    "mm_wav_energy",
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(strlen(text) * (1 + doc_id % 2) AS BIGINT) AS n_samples,
           CAST((1 + doc_id % 2) * COALESCE(list_aggregate(
               list_transform(range(1, strlen(text) + 1),
                   i -> CAST((ord(text[i]) - 128) * 256 AS BIGINT)
                        * CAST((ord(text[i]) - 128) * 256 AS BIGINT)),
               'sum'), 0) AS BIGINT) AS sum_sq
    FROM documents
    WHERE {_ASCII_GUARD_SQL}
    """,
)
def mm_wav_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ascii_assets(spark, sf_dir).mapInPandas(
        _wav_energy_batches,
        schema="asset_id long, n_samples long, sum_sq long",
    )


# ---------------------------------------------------------------------------
# REAL compressed-image decode — PNG on stdlib zlib (r7 VERDICT #4).
# This retires the "compressed codecs out of scope" boundary for the
# one format whose compression layer (DEFLATE) ships with Python: the
# ingest kernel synthesizes a spec-valid 8-bit grayscale PNG per asset
# — signature, IHDR, zlib-compressed IDAT, IEND, every chunk CRC32'd —
# and the decode kernel is a genuine PNG reader: signature check,
# chunk walk with CRC validation, multi-IDAT inflate, and full
# scanline UN-FILTERING (all five PNG filter types; the encoder
# cycles filter y % 5 per row so None/Sub/Up/Average/Paeth are all
# exercised on every image taller than 4 rows — the fixture minimum
# is h ≥ 2 + 44 % 12 = 10). Corrupt containers raise (bad magic, CRC
# mismatch, truncated IDAT). jpeg/h264/mp3 remain out of scope: their
# codecs need external libraries this environment doesn't ship.
#
# Determinism: dims are arithmetic on the byte length and the raw
# pixel plane is the payload cycled, so the oracle reproduces the
# decoded pixel checksums from code points alone — the entire
# filter → deflate → inflate → un-filter loop sits under the bitwise
# value-hash gate (a wrong Paeth predictor or CRC slip changes
# pix_sum/pix_checksum and fails the driver compare).
#
# Scale: identical shape to the Y4M/WAV kernels — Arrow-batched
# mapInPandas, O(pixels) per asset, no shuffle, no driver; partition
# count alone controls parallelism at 100 TB.
# ---------------------------------------------------------------------------
_PNG_W_MOD, _PNG_H_MOD = 16, 12


def _png_paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def _png_build(payload: bytes) -> bytes:
    """Encode a spec-valid grayscale PNG whose raw pixels are the
    payload bytes cycled row-major over a (w × h) plane; row y is
    written with filter type y % 5."""
    import struct
    import zlib

    import numpy as np

    n = len(payload)
    w = 4 + n % _PNG_W_MOD
    h = 2 + n % _PNG_H_MOD
    src = payload if payload else b"\x00"
    plane = (src * (w * h // len(src) + 1))[: w * h]
    # Encode-side filters read RAW neighbours (left/up/upper-left are
    # the unfiltered pixels), so every filter type — Paeth included —
    # vectorizes row-wise; uint8 arithmetic wraps mod 256 for free.
    raw = np.frombuffer(plane, dtype=np.uint8).reshape(h, w)
    left = np.zeros_like(raw)
    left[:, 1:] = raw[:, :-1]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    ul = np.zeros_like(raw)
    ul[1:, 1:] = raw[:-1, :-1]
    a, b, c = (m.astype(np.int16) for m in (left, up, ul))
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    paeth = np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
    )
    filtered = np.empty((h, w + 1), dtype=np.uint8)
    for f, pred in ((0, 0), (1, left), (2, up), (4, paeth)):
        filtered[f::5, 0] = f
        filtered[f::5, 1:] = raw[f::5] - pred[f::5] if f else raw[f::5]
    filtered[3::5, 0] = 3
    filtered[3::5, 1:] = raw[3::5] - (
        (left[3::5].astype(np.uint16) + up[3::5]) // 2
    ).astype(np.uint8)
    out = filtered.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def _png_decode_plane(payload: bytes):
    """Real PNG decode shared by every PNG kernel: signature,
    CRC-checked chunk walk, multi-IDAT inflate, five-filter scanline
    un-filtering. Returns (w, h, reconstructed (h, w) uint8 plane)."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat, ended = 8, None, bytearray(), False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated chunk data")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + data) != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            ended = True
        pos += 12 + length
    if ihdr is None or not ended:
        raise ValueError("missing IHDR or IEND")
    w, h, depth, color, comp, filt, interlace = ihdr
    if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
        raise ValueError("unsupported PNG variant")
    import numpy as np

    stream = zlib.decompress(bytes(idat))
    if len(stream) != h * (w + 1):
        raise ValueError("IDAT length does not match dimensions")
    rows = np.frombuffer(stream, dtype=np.uint8).reshape(h, w + 1)
    plane = np.empty((h, w), dtype=np.uint8)
    prior = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:]
        if f > 4:
            raise ValueError(f"bad filter type {f}")
        # Filters None/Up are elementwise; Sub's left-recursion
        # recon[x] = line[x] + recon[x-1] telescopes to a running sum,
        # so all three vectorize (uint8 wraps mod 256). Average/Paeth
        # depend on the RECONSTRUCTED left byte and stay a scalar
        # loop — but only 2 rows in 5 pay it.
        if f == 0:
            recon = line.copy()
        elif f == 1:
            recon = np.cumsum(line, dtype=np.uint64).astype(np.uint8)
        elif f == 2:
            recon = line + prior
        else:
            li, pi = line.tolist(), prior.tolist()
            rec = [0] * w
            left = 0
            for x in range(w):
                up = pi[x]
                if f == 3:
                    v = li[x] + (left + up) // 2
                else:
                    v = li[x] + _png_paeth(left, up, pi[x - 1] if x else 0)
                left = rec[x] = v & 0xFF
            recon = np.array(rec, dtype=np.uint8)
        plane[y] = recon
        prior = recon
    return w, h, plane


def _png_parse(payload: bytes) -> tuple[int, int, int, int, int]:
    """(w, h, n_pixels, pix_sum, pix_checksum) over the decoded plane."""
    import numpy as np

    w, h, plane = _png_decode_plane(payload)
    flat = plane.reshape(-1).astype(np.int64)
    return (
        w,
        h,
        w * h,
        int(flat.sum()),
        int(((np.arange(w * h, dtype=np.int64) + 1) * flat).sum()),
    )


def _png_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        parsed = [_png_parse(_png_build(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "width": [p[0] for p in parsed],
                "height": [p[1] for p in parsed],
                "n_pixels": [p[2] for p in parsed],
                "pix_sum": [p[3] for p in parsed],
                "pix_checksum": [p[4] for p in parsed],
            }
        )


@register(
    "mm_png_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, strlen(text) AS n,
             4 + strlen(text) % {_PNG_W_MOD} AS w,
             2 + strlen(text) % {_PNG_H_MOD} AS h
      FROM documents
      WHERE {_ASCII_GUARD_SQL}
    )
    SELECT doc_id AS asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(list_aggregate(list_transform(range(0, w * h),
               i -> CAST(ord(text[i % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_sum,
           CAST(list_aggregate(list_transform(range(0, w * h),
               i -> (i + 1) * CAST(ord(text[i % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_checksum
    FROM d
    """,
)
def mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ascii_assets(spark, sf_dir).mapInPandas(
        _png_roundtrip_batches,
        schema=(
            "asset_id long, width long, height long, n_pixels long,"
            " pix_sum long, pix_checksum long"
        ),
    )


# ---------------------------------------------------------------------------
# Feature extraction ON COMPRESSED INPUT — a 4-bin pixel histogram
# computed from the fully decoded PNG (signature → CRC walk → inflate
# → un-filter → pixels), the step a vision-data pipeline runs right
# after decode (exposure/contrast screens, dedup pre-features). Bins
# are 32-wide over the ASCII band [0,128) that the synthesized
# grayscale plane occupies; counts are exact integers, so the whole
# deflate → inflate → unfilter → histogram path sits under the
# bitwise gate (the oracle recomputes the bins from the cycled text
# code points). Same Arrow-batched mapInPandas shape as every decode
# kernel: no shuffle, no driver, O(pixels) per asset.
# ---------------------------------------------------------------------------
def _png_histogram_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for i, p in zip(pdf["asset_id"], pdf["payload"]):
            w, h, plane = _png_decode_plane(_png_build(p))
            bins = np.bincount(
                np.minimum(plane.reshape(-1) // 32, 3), minlength=4
            )
            rows.append((int(i), w * h, *(int(b) for b in bins)))
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id", "n_pixels", "bin0", "bin1", "bin2", "bin3",
            ],
        )


@register(
    "mm_png_histogram",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, strlen(text) AS n,
             4 + strlen(text) % {_PNG_W_MOD} AS w,
             2 + strlen(text) % {_PNG_H_MOD} AS h
      FROM documents
      WHERE {_ASCII_GUARD_SQL}
    ),
    px AS (
      SELECT doc_id, w * h AS n_pixels,
             list_transform(range(0, w * h),
                 i -> ord(text[i % n + 1]) // 32) AS bin_ids
      FROM d
    )
    SELECT doc_id AS asset_id,
           CAST(n_pixels AS BIGINT) AS n_pixels,
           CAST(len(list_filter(bin_ids, x -> x = 0)) AS BIGINT) AS bin0,
           CAST(len(list_filter(bin_ids, x -> x = 1)) AS BIGINT) AS bin1,
           CAST(len(list_filter(bin_ids, x -> x = 2)) AS BIGINT) AS bin2,
           CAST(len(list_filter(bin_ids, x -> x >= 3)) AS BIGINT) AS bin3
    FROM px
    """,
)
def mm_png_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ascii_assets(spark, sf_dir).mapInPandas(
        _png_histogram_batches,
        schema=(
            "asset_id long, n_pixels long, bin0 long, bin1 long,"
            " bin2 long, bin3 long"
        ),
    )


# ---------------------------------------------------------------------------
# REAL audio codec decode — ITU-T G.711 μ-law, the standard telephony
# companding codec, and the second COMPRESSED format (after PNG) whose
# decode needs no external library: expansion is pure integer
# arithmetic. Each payload byte is a μ-law codeword; the kernel
# expands it with the canonical decoder — complement, split into
# sign / 3-bit exponent / 4-bit mantissa, magnitude
# ((2·man + 33) << exp) − 33 (13-bit + sign linear PCM) — fully
# numpy-vectorized, then computes per-asset signal energy and range.
# Every step is exact integer math, so the oracle reproduces the
# decoder from the text code points and the whole expand→feature path
# sits under the bitwise gate. ASCII guard as for the other
# sample-level kernels (byte vs character indexing).
#
# Scale: identical mapInPandas shape to the WAV/PNG kernels — Arrow
# batches, O(samples) per asset, no shuffle, no driver.
# ---------------------------------------------------------------------------
def _ulaw_decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for i, p in zip(pdf["asset_id"], pdf["payload"]):
            code = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
            u = 255 - code  # one's complement of the codeword
            exp = (u >> 4) & 0x07
            man = u & 0x0F
            mag = ((2 * man + 33) << exp) - 33
            pcm = np.where(u & 0x80, -mag, mag)
            rows.append(
                (
                    int(i),
                    len(pcm),
                    int((pcm * pcm).sum()),
                    int(pcm.min()),
                    int(pcm.max()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=["asset_id", "n_samples", "sum_sq", "min_pcm", "max_pcm"],
        )


@register(
    "mm_ulaw_energy",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             unnest(list_transform(range(1, strlen(text) + 1),
                 i -> 255 - ord(text[i]))) AS u
      FROM documents
      WHERE {_ASCII_GUARD_SQL}
    ),
    p AS (
      SELECT doc_id,
             CASE WHEN u >= 128 THEN -(((2 * (u % 16) + 33)
                      << ((u // 16) % 8)) - 33)
                  ELSE ((2 * (u % 16) + 33) << ((u // 16) % 8)) - 33
             END AS pcm
      FROM s
    )
    SELECT doc_id AS asset_id,
           COUNT(*) AS n_samples,
           CAST(SUM(pcm * pcm) AS BIGINT) AS sum_sq,
           CAST(MIN(pcm) AS BIGINT) AS min_pcm,
           CAST(MAX(pcm) AS BIGINT) AS max_pcm
    FROM p
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def mm_ulaw_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _ascii_assets(spark, sf_dir)
        .mapInPandas(
            _ulaw_decode_batches,
            schema=(
                "asset_id long, n_samples long, sum_sq long,"
                " min_pcm long, max_pcm long"
            ),
        )
    )


# ---------------------------------------------------------------------------
# REAL audio codec #3 — IMA/DVI ADPCM (the public IMA Digital Audio
# spec; WAV format tag 0x0011), the first PREDICTIVE codec in the
# family: 16-bit PCM compresses 4:1 into 4-bit nibbles through an
# adaptive step-size quantizer whose state (predictor + step index)
# the decoder reconstructs by mirroring the encoder exactly. Both
# halves are implemented from scratch, including the WAV-IMA BLOCK
# layout real files use: each block restarts with a 4-byte header
# (int16 LE predictor — which IS the block's first output sample —
# uint8 step index, reserved 0) followed by nibble data packed LOW
# nibble first; the mono container carries fmt(0x0011, cbSize=2,
# samplesPerBlock), a fact chunk with the true sample count (the
# final block may be padded), and the data blocks.
#
# Bitwise-gate strategy (the JPEG block-constant precedent): constant
# fixtures are LOSSLESS through the whole path — every diff is 0, so
# nibble 0 at step index 0 reconstructs diffq = 7>>3 = 0 and the
# decoder re-emits the constant exactly — which pins the container
# walk, block headers, nibble order, fact-count crop, and feature
# math under the SQL gate. The codec's ADAPTIVE behavior is pinned by
# the hypothesis/unit suite instead (tests/test_round13c.py): the
# decoder must equal the ENCODER'S OWN internal reconstruction on
# random signals (the defining ADPCM invariant), full-scale square
# waves walk the index clamps, and a hand vector pins the quantizer
# bit order.
# ---------------------------------------------------------------------------
_ADPCM_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
)
_ADPCM_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)
_ADPCM_BLOCK_ALIGN = 20  # 4-byte header + 16 nibble bytes
_ADPCM_SPB = (_ADPCM_BLOCK_ALIGN - 4) * 2 + 1  # samples per block


def _adpcm_quantize(diff: int, step: int) -> tuple[int, int]:
    """(nibble magnitude bits, reconstructed |diff|) for one sample —
    the IMA quantizer and its exact mirror, shared by encoder and
    tests."""
    delta = 0
    diffq = step >> 3
    if diff >= step:
        delta = 4
        diff -= step
        diffq += step
    if diff >= step >> 1:
        delta |= 2
        diff -= step >> 1
        diffq += step >> 1
    if diff >= step >> 2:
        delta |= 1
        diffq += step >> 2
    return delta, diffq


def _adpcm_encode(pcm) -> tuple[bytes, list[int]]:
    """Encode int16 samples to WAV-IMA blocks; returns (block bytes,
    the encoder's own reconstruction) — the reconstruction is what the
    decoder MUST reproduce bit-exactly (the ADPCM invariant the test
    suite pins)."""
    import struct

    out = bytearray()
    recon: list[int] = []
    index = 0
    n = len(pcm)
    pos = 0
    while pos < n:
        predictor = int(pcm[pos])
        out += struct.pack("<hBB", predictor, index, 0)
        recon.append(predictor)
        pos += 1
        nibbles: list[int] = []
        for _ in range(_ADPCM_SPB - 1):
            if pos < n:
                sample = int(pcm[pos])
                pos += 1
            else:
                # pad the final block by holding the predictor; the
                # decoder crops at the fact count so pads never surface
                sample = predictor
            step = _ADPCM_STEPS[index]
            diff = sample - predictor
            sign = 8 if diff < 0 else 0
            delta, diffq = _adpcm_quantize(abs(diff), step)
            predictor += -diffq if sign else diffq
            predictor = max(-32768, min(32767, predictor))
            index = max(0, min(88, index + _ADPCM_INDEX[delta]))
            nibbles.append(sign | delta)
            if len(recon) < n:
                recon.append(predictor)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))  # LOW nibble first (IMA/WAV)
    return bytes(out), recon


def _adpcm_wav_build(pcm) -> bytes:
    """A spec-shaped mono WAV-IMA file: RIFF header, fmt chunk with
    format tag 0x0011 + cbSize=2 + samplesPerBlock, the fact chunk
    (mandatory for compressed WAV) carrying the TRUE sample count, and
    the block-aligned data chunk."""
    import struct

    data, _ = _adpcm_encode(pcm)
    rate = 8000
    n_blocks = len(data) // _ADPCM_BLOCK_ALIGN
    avg_bps = rate * _ADPCM_BLOCK_ALIGN // _ADPCM_SPB
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011, 1, rate, avg_bps, _ADPCM_BLOCK_ALIGN, 4, 2, _ADPCM_SPB,
    )
    fact = struct.pack("<I", len(pcm))
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    del n_blocks
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _adpcm_wav_decode(buf: bytes):
    """Strict WAV-IMA decoder: validates RIFF/WAVE magic, walks the
    chunk list, requires mono format 0x0011 with a coherent
    samplesPerBlock, requires the fact chunk, checks the data chunk is
    whole blocks with in-range step indexes, decodes every block by
    mirroring the encoder's state machine, and crops to the fact
    count. Returns an int64 numpy array of PCM samples."""
    import struct

    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    if struct.unpack("<I", buf[4:8])[0] != len(buf) - 8:
        raise ValueError("RIFF size mismatch")
    pos = 12
    fmt = fact_n = data = None
    while pos < len(buf):
        if pos + 8 > len(buf):
            raise ValueError("truncated chunk header")
        cid = buf[pos : pos + 4]
        sz = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + sz]
        if len(body) != sz:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact":
            fact_n = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None or fact_n is None:
        raise ValueError("missing fmt/fact/data chunk")
    tag, nch, _, _, align, bits, cb, spb = struct.unpack(
        "<HHIIHHHH", fmt[:20]
    )
    if tag != 0x0011 or nch != 1 or bits != 4 or cb < 2:
        raise ValueError("not mono IMA ADPCM (format 0x0011)")
    if spb != (align - 4) * 2 + 1:
        raise ValueError("samplesPerBlock inconsistent with blockAlign")
    if len(data) % align:
        raise ValueError("data chunk is not whole blocks")
    if fact_n > (len(data) // align) * spb:
        raise ValueError("fact sample count exceeds block capacity")
    out: list[int] = []
    for base in range(0, len(data), align):
        predictor, index, _ = struct.unpack(
            "<hBB", data[base : base + 4]
        )
        if index > 88:
            raise ValueError(f"step index {index} out of range")
        out.append(predictor)
        for b in data[base + 4 : base + align]:
            for nibble in (b & 0x0F, b >> 4):  # low nibble first
                step = _ADPCM_STEPS[index]
                diffq = step >> 3
                if nibble & 4:
                    diffq += step
                if nibble & 2:
                    diffq += step >> 1
                if nibble & 1:
                    diffq += step >> 2
                predictor += -diffq if nibble & 8 else diffq
                predictor = max(-32768, min(32767, predictor))
                index = max(
                    0, min(88, index + _ADPCM_INDEX[nibble & 7])
                )
                out.append(predictor)
    return np.asarray(out[:fact_n], dtype=np.int64)


def _adpcm_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for i, p in zip(pdf["asset_id"], pdf["payload"]):
            v = (p[0] - 64) * 129
            n = 5 + len(p) % 400
            pcm = np.full(n, v, dtype=np.int16)
            wav = _adpcm_wav_build(pcm)
            back = _adpcm_wav_decode(wav)
            rows.append(
                (
                    int(i),
                    len(back),
                    int(back.sum()),
                    int((back * back).sum()),
                    int(back.min()),
                    int(back.max()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id", "n_samples", "pcm_sum", "sum_sq",
                "min_pcm", "max_pcm",
            ],
        )


@register(
    "mm_adpcm_roundtrip",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             (ord(text[1]) - 64) * 129 AS v,
             5 + strlen(text) % 400 AS n
      FROM documents
      WHERE {_ASCII_GUARD_SQL}
    )
    SELECT doc_id AS asset_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(n * v AS BIGINT) AS pcm_sum,
           CAST(n * v * v AS BIGINT) AS sum_sq,
           CAST(v AS BIGINT) AS min_pcm,
           CAST(v AS BIGINT) AS max_pcm
    FROM d
    ORDER BY doc_id
    """,
)
def mm_adpcm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMA ADPCM encode → WAV-IMA container → strict decode → features
    under the bitwise gate (constant planes are lossless through the
    adaptive quantizer — see the section comment); random-signal
    fidelity is pinned by the encoder-reconstruction ≡ decoder
    invariant in tests/test_round13c.py. Same Arrow-batched
    mapInPandas shape as every codec kernel: no shuffle, no driver,
    O(samples) per asset, parallel across executor width."""
    return _ascii_assets(spark, sf_dir).mapInPandas(
        _adpcm_roundtrip_batches,
        schema=(
            "asset_id long, n_samples long, pcm_sum long,"
            " sum_sq long, min_pcm long, max_pcm long"
        ),
    )


# ---------------------------------------------------------------------------
# REAL JPEG container METADATA parse — the honest boundary for a codec
# whose entropy decode needs external libraries: a production ingest
# pipeline still needs dimensions / density / component count BEFORE
# any pixel work (routing, resize planning, corrupt-file quarantine),
# and all of that lives in the marker-segment layer, which is pure
# stdlib. The ingest kernel synthesizes a spec-shaped JFIF container
# per asset — SOI, APP0/JFIF (version, density units, x/y density),
# DQT stub, SOF0 (baseline DCT: precision, height, width, component
# descriptors), EOI — and the decode kernel REALLY WALKS the marker
# stream: 0xFF marker framing, big-endian segment lengths, JFIF
# identifier check, SOF0 field extraction, truncation and bad-marker
# errors. Entropy-coded scan data is deliberately absent (and
# documented so): that is exactly the jpeg/h264/mp3 boundary the
# module header declares.
#
# Determinism: every synthesized field is arithmetic on (doc_id, byte
# length), so the oracle reproduces the parsed metadata and the whole
# build → walk → extract loop sits under the bitwise gate.
# ---------------------------------------------------------------------------
def _jpeg_build(doc_id: int, payload: bytes) -> bytes:
    import struct

    n = len(payload)
    xdens = 72 + doc_id % 5
    ydens = 72 + n % 7
    w = 16 + n % 240
    h = 16 + doc_id % 200
    ncomp = 1 + (doc_id + n) % 2 * 2  # 1 (grayscale) or 3 (YCbCr)
    app0 = struct.pack(
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 2, 1, xdens, ydens, 0, 0
    )
    dqt = struct.pack(">HB", 2 + 1 + 64, 0) + bytes(
        (payload[i % n] if n else 0) & 0x7F or 1 for i in range(64)
    )
    sof0 = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for c in range(ncomp):
        sof0 += struct.pack(">BBB", c + 1, 0x11 if c else 0x22, 0)
    return (
        b"\xff\xd8"  # SOI
        + b"\xff\xe0" + app0
        + b"\xff\xdb" + dqt
        + b"\xff\xc0" + sof0
        + b"\xff\xd9"  # EOI
    )


def _jpeg_parse_metadata(payload: bytes):
    """Marker-segment walk: SOI, length-framed segments, EOI. Returns
    (jfif_major, jfif_minor, xdens, ydens, width, height, n_comp)."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos, jfif, sof = 2, None, None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker framing at byte {pos}")
        if pos + 2 > len(payload):
            raise ValueError("truncated marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            if pos + 2 != len(payload):
                raise ValueError("trailing bytes after EOI")
            break
        if pos + 4 > len(payload):
            raise ValueError("truncated segment header")
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated segment body")
        if marker == 0xE0:
            if seg[:5] != b"JFIF\x00":
                raise ValueError("APP0 without JFIF identifier")
            major, minor, _units, xd, yd = struct.unpack(">BBBHH", seg[5:12])
            jfif = (major, minor, xd, yd)
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("unsupported SOF0 precision")
            if len(seg) != 6 + 3 * ncomp:
                raise ValueError("SOF0 component table size mismatch")
            sof = (w, h, ncomp)
        pos += 2 + seg_len
    else:
        raise ValueError("missing EOI")
    if jfif is None or sof is None:
        raise ValueError("missing APP0/JFIF or SOF0 segment")
    return (*jfif[:2], *jfif[2:], *sof)


def _jpeg_metadata_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for i, p in zip(pdf["asset_id"], pdf["payload"]):
            meta = _jpeg_parse_metadata(_jpeg_build(int(i), p))
            rows.append((int(i), *meta))
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id", "jfif_major", "jfif_minor", "xdens", "ydens",
                "width", "height", "n_comp",
            ],
        )


@register(
    "mm_jpeg_metadata",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(1 AS BIGINT) AS jfif_major,
           CAST(2 AS BIGINT) AS jfif_minor,
           CAST(72 + doc_id % 5 AS BIGINT) AS xdens,
           CAST(72 + strlen(text) % 7 AS BIGINT) AS ydens,
           CAST(16 + strlen(text) % 240 AS BIGINT) AS width,
           CAST(16 + doc_id % 200 AS BIGINT) AS height,
           CAST(1 + (doc_id + strlen(text)) % 2 * 2 AS BIGINT) AS n_comp
    FROM documents
    ORDER BY doc_id
    """,
)
def mm_jpeg_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _assets(spark, sf_dir)
        .mapInPandas(
            _jpeg_metadata_batches,
            schema=(
                "asset_id long, jfif_major long, jfif_minor long,"
                " xdens long, ydens long, width long, height long,"
                " n_comp long"
            ),
        )
    )


# ---------------------------------------------------------------------------
# SECOND real compressed-image codec — GIF, whose compression layer
# (LZW) needs no library at all: both the variable-width-code
# compressor and the decompressor are implemented here against the
# GIF89a specification (appendix F): codes start at min-code-size+1
# bits, CLEAR resets the dictionary, the table tops out at 4095 and
# the encoder emits CLEAR to restart, bit packing is LSB-first across
# 255-byte sub-blocks. Width synchronization follows the spec's
# asymmetric rule: the ENCODER widens after assigning code 2^w, the
# DECODER one code earlier (after assigning 2^w - 1) because its
# table additions lag the encoder's by exactly one code — the classic
# GIF off-by-one, pinned by tests that roundtrip across both width
# boundaries and a full-table CLEAR, plus the canonical public 1x1
# image-block conformance vector (0x44 0x01 at mcs 2 → pixel 0).
#
# The ingest kernel synthesizes a spec-valid GIF89a per asset —
# header, logical screen descriptor, 256-entry grayscale global color
# table, image descriptor, LZW-compressed sub-blocked image data,
# trailer — and the decode kernel REALLY parses it: signature, LSD
# unpack, GCT load, descriptor/LSD consistency, sub-block walk, LZW
# decode with out-of-range-code detection, pixel-count check, and
# palette mapping. Corrupt containers raise.
#
# Determinism: dims are arithmetic on byte length, the pixel plane is
# the payload cycled, and the grayscale palette maps index -> itself,
# so the oracle reproduces the decoded pixel checksums from code
# points — the whole compress → container → parse → decompress loop
# sits under the bitwise value-hash gate. Scale: same Arrow-batched
# mapInPandas shape as every codec kernel; no shuffle, no driver.
# ---------------------------------------------------------------------------
_GIF_W_MOD, _GIF_H_MOD = 11, 7


def _gif_lzw_encode(mcs: int, data: bytes) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = mcs + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    w = b""
    # Width sync mirrors giflib's encoder: the next_code >= 2^width
    # check runs after EVERY emission — including the final phrase
    # emission that assigns no table entry — so the EOI (and any
    # trailing code) goes out at the width the read-counting decoder
    # expects (see _gif_lzw_decode; the hypothesis roundtrip property
    # caught the assignment-tied variant mis-framing EOI).
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code <= 4095:
            table[wc] = next_code
            next_code += 1
        else:
            emit(clear, width)
            width = mcs + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
        if next_code >= (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(mcs: int, data: bytes, max_out: int) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    pos = acc = nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    width = mcs + 1
    table = {i: bytes([i]) for i in range(clear)}
    next_code = eoi + 1
    # Width sync counts CODES READ (giflib's RunningCode), NOT table
    # assignments: the encoder's final phrase emission assigns no
    # entry, so an assignment-counted decoder bumps one code early
    # right before EOI and mis-frames it (found by the hypothesis
    # roundtrip property, shrunk to a 12-symbol mcs=2 stream whose
    # last data code lands exactly on 2^width assignments).
    rc = eoi + 1
    out = bytearray()
    prev = None
    while True:
        code = read(width)
        if code == clear:
            width = mcs + 1
            table = {i: bytes([i]) for i in range(clear)}
            next_code = eoi + 1
            rc = eoi + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        rc += 1
        if rc > (1 << width) and width < 12:
            width += 1
        if prev is None:
            if code not in table:
                raise ValueError("first code after clear not a literal")
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"LZW code {code} out of range")
            if next_code <= 4095:
                table[next_code] = prev + entry[:1]
                next_code += 1
        out += entry
        if len(out) > max_out:
            raise ValueError("LZW output exceeds pixel count")
        prev = entry


def _gif_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _gif_build(payload: bytes) -> bytes:
    import struct

    n = len(payload)
    w = 5 + n % _GIF_W_MOD
    h = 3 + n % _GIF_H_MOD
    src = payload if payload else b"\x00"
    plane = (src * (w * h // len(src) + 1))[: w * h]
    # packed LSD byte: GCT present, 8-bit color resolution, 256-entry GCT
    lsd = struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    gct = bytes(v for i in range(256) for v in (i, i, i))
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    data = bytes([8]) + _gif_subblocks(_gif_lzw_encode(8, plane))
    return b"GIF89a" + lsd + gct + desc + data + b"\x3b"


def _gif_decode_plane(payload: bytes):
    """Real GIF decode: signature, LSD, GCT, descriptor walk, sub-block
    reassembly, LZW decompression, palette mapping. Returns (w, h,
    palette-mapped pixel bytes)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    if len(payload) < 13:
        raise ValueError("truncated logical screen descriptor")
    w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    if not packed & 0x80:
        raise ValueError("missing global color table")
    gct_len = 3 * (2 << (packed & 0x07))
    pos = 13
    gct = payload[pos : pos + gct_len]
    if len(gct) != gct_len:
        raise ValueError("truncated global color table")
    pos += gct_len
    pixels = None
    while True:
        if pos >= len(payload):
            raise ValueError("missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated extension")
                sz = payload[pos]
                pos += 1 + sz
                if sz == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x}")
        iw_l, iw_t, iw, ih, ipacked = struct.unpack(
            "<HHHHB", payload[pos : pos + 9]
        )
        pos += 9
        if (iw_l, iw_t, iw, ih) != (0, 0, w, h) or ipacked & 0xC0:
            raise ValueError("image descriptor disagrees with screen")
        mcs = payload[pos]
        pos += 1
        stream = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated image data")
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            stream += payload[pos : pos + sz]
            if len(stream) < sz:
                raise ValueError("truncated sub-block")
            pos += sz
        idx = _gif_lzw_decode(mcs, bytes(stream), w * h)
        if len(idx) != w * h:
            raise ValueError("decoded pixel count disagrees with dims")
        # palette map (grayscale identity here, but a REAL lookup)
        pixels = bytes(gct[3 * i] for i in idx)
    if pixels is None:
        raise ValueError("no image block before trailer")
    return w, h, pixels


def _gif_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for aid, p in zip(pdf["asset_id"], pdf["payload"]):
            w, h, pix = _gif_decode_plane(_gif_build(p))
            flat = np.frombuffer(pix, dtype=np.uint8).astype(np.int64)
            rows.append(
                (
                    aid,
                    w,
                    h,
                    w * h,
                    int(flat.sum()),
                    int(((np.arange(w * h, dtype=np.int64) + 1) * flat).sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id",
                "width",
                "height",
                "n_pixels",
                "pix_sum",
                "pix_checksum",
            ],
        )


@register(
    "mm_gif_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, strlen(text) AS n,
             5 + strlen(text) % {_GIF_W_MOD} AS w,
             3 + strlen(text) % {_GIF_H_MOD} AS h
      FROM documents
      WHERE {_ASCII_GUARD_SQL}
    )
    SELECT doc_id AS asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(list_aggregate(list_transform(range(0, w * h),
               i -> CAST(ord(text[i % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_sum,
           CAST(list_aggregate(list_transform(range(0, w * h),
               i -> (i + 1) * CAST(ord(text[i % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_checksum
    FROM d
    """,
)
def mm_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ascii_assets(spark, sf_dir).mapInPandas(
        _gif_roundtrip_batches,
        schema=(
            "asset_id long, width long, height long, n_pixels long,"
            " pix_sum long, pix_checksum long"
        ),
    )


# ---------------------------------------------------------------------------
# REAL BMP CODEC — Windows BITMAPINFOHEADER, 8-bit paletted, BI_RGB.
# The format's actual quirks are the test surface: pixel rows are
# stored BOTTOM-UP (positive biHeight), every row is padded to a
# 4-byte stride, and the 256-entry BGRA palette sits between the
# 54-byte header block and the pixel array (bfOffBits must be honored,
# not assumed). The encoder synthesizes a spec-valid file whose
# logical top-down plane is the document's bytes cycled row-major
# (the PNG/GIF discipline, different dims so the shapes differ); the
# decoder walks BITMAPFILEHEADER → BITMAPINFOHEADER → palette →
# padded bottom-up rows and reconstructs the top-down plane, failing
# loudly on any malformed field. Features (dims, exact pixel sum,
# position-weighted checksum) sit under the bitwise gate; the oracle
# recomputes them from the cycled text code points — padding or row
# order mistakes shift every checksum term and cannot cancel.
#
# Scale: mapInPandas, Arrow-batched, embarrassingly parallel — no
# shuffle, no driver involvement, O(pixels) per asset.
# ---------------------------------------------------------------------------
_BMP_W_MOD, _BMP_H_MOD = 13, 9


def _bmp_build(payload: bytes) -> bytes:
    import struct

    n = len(payload)
    w = 5 + n % _BMP_W_MOD
    h = 3 + n % _BMP_H_MOD
    src = payload if payload else b"\x00"
    plane = (src * (w * h // len(src) + 1))[: w * h]
    stride = (w + 3) & ~3
    palette = b"".join(
        struct.pack("<BBBB", g, g, g, 0) for g in range(256)
    )
    off_bits = 14 + 40 + len(palette)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage order
        row = plane[y * w : (y + 1) * w]
        rows.append(row + b"\x00" * (stride - w))
    pixels = b"".join(rows)
    file_size = off_bits + len(pixels)
    hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, off_bits)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pixels), 2835, 2835, 256, 0
    )
    return hdr + info + palette + pixels


def _bmp_parse(payload: bytes) -> tuple[int, int, int, int, int]:
    """(w, h, n_pixels, pix_sum, pix_checksum) from a real BMP walk."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    file_size, _, _, off_bits = struct.unpack("<IHHI", payload[2:14])
    if file_size != len(payload):
        raise ValueError("BMP size field mismatch")
    (
        hsz, w, h, planes, bpp, comp, img_size, _, _, n_colors, _,
    ) = struct.unpack("<IiiHHIIiiII", payload[14:54])
    if hsz != 40 or planes != 1 or bpp != 8 or comp != 0:
        raise ValueError("unsupported BMP variant")
    if h <= 0 or w <= 0:
        raise ValueError("top-down or degenerate BMP not produced here")
    n_colors = n_colors or 256
    if off_bits != 14 + 40 + 4 * n_colors:
        raise ValueError("unexpected pixel-array offset")
    palette = payload[54:off_bits]
    for g in range(n_colors):
        b, gr, r, a = palette[4 * g : 4 * g + 4]
        if not (b == gr == r == g and a == 0):
            raise ValueError("non-grayscale palette entry")
    stride = (w + 3) & ~3
    if img_size != stride * h or off_bits + img_size != len(payload):
        raise ValueError("pixel array size mismatch")
    data = np.frombuffer(payload, dtype=np.uint8, count=img_size,
                         offset=off_bits).reshape(h, stride)
    plane = data[::-1, :w]  # bottom-up rows -> top-down plane
    flat = plane.reshape(-1).astype(np.int64)
    return (
        w,
        h,
        w * h,
        int(flat.sum()),
        int(((np.arange(w * h, dtype=np.int64) + 1) * flat).sum()),
    )


def _bmp_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        parsed = [_bmp_parse(_bmp_build(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "width": [p[0] for p in parsed],
                "height": [p[1] for p in parsed],
                "n_pixels": [p[2] for p in parsed],
                "pix_sum": [p[3] for p in parsed],
                "pix_checksum": [p[4] for p in parsed],
            }
        )


@register(
    "mm_bmp_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, strlen(text) AS n,
             5 + strlen(text) % {_BMP_W_MOD} AS w,
             3 + strlen(text) % {_BMP_H_MOD} AS h
      FROM documents
      WHERE {_ASCII_GUARD_SQL}
    )
    SELECT doc_id AS asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(list_aggregate(list_transform(range(0, w * h),
               i -> CAST(ord(text[i % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_sum,
           CAST(list_aggregate(list_transform(range(0, w * h),
               i -> (i + 1) * CAST(ord(text[i % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_checksum
    FROM d
    """,
)
def mm_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ascii_assets(spark, sf_dir).mapInPandas(
        _bmp_roundtrip_batches,
        schema=(
            "asset_id long, width long, height long, n_pixels long,"
            " pix_sum long, pix_checksum long"
        ),
    )


# ---------------------------------------------------------------------------
# REAL BASELINE JPEG CODEC (grayscale) — the entropy-coded layer that
# r9-r11 documented as out of scope is PURE MATH (ITU-T T.81): canonical
# Huffman coding, zigzag run-length, dequantization, and the 8x8 type-II
# DCT — all stdlib+numpy, the same from-scratch discipline as the GIF
# LZW codec above. The encoder synthesizes a spec-valid JFIF file
# (SOI/APP0/DQT/SOF0/DHT x2/SOS/entropy-coded segment with 0xFF00 byte
# stuffing/EOI) and the decoder walks the real format: marker parse,
# CANONICAL Huffman reconstruction from the DHT BITS/VALS lists (the
# tables are file-defined, so the decoder must build them — ours are
# flat 4-bit DC / 8-bit AC tables, legal by Kraft and simpler than
# Annex K's, exactly because DHT exists), DC prediction, EOB/ZRL AC
# run-lengths, amplitude "extend" (ones'-complement negatives),
# dequant, inverse zigzag, IDCT, level shift, clamp.
#
# Exactness discipline: JPEG is lossy, so the ORACLE-GATED fixture
# planes are BLOCK-CONSTANT (each 8x8 block one byte of the document,
# cycled) — a constant block's DCT is a lone DC coefficient 8*(v-128),
# exact in IEEE doubles, so encode->decode is bit-exact and the
# closed-form SQL can pin every pixel. Arbitrary planes run the same
# code path and are pinned by a hypothesis roundtrip bound instead
# (quant=1 coefficient rounding => per-pixel error <= 3).
#
# Restart markers (DRI + byte-aligned RST0..7 with predictor resets,
# T.81 B.2.4.4/E.1.4) are implemented on this path — encode via
# _jpeg_encode(restart_interval=), decode honors any DRI in the stream
# (mm_jpeg_dri_decode pins the machinery). Out of scope, documented:
# progressive scans; chroma subsampling lives in the 4:4:4/4:2:0
# variants below.
# ---------------------------------------------------------------------------
_JPEG_BW_MOD = 4  # blocks wide: 2 + n % 4
_JPEG_BH_MOD = 3  # blocks high: 1 + n % 3


def _jpeg_zigzag() -> list:
    """The T.81 zigzag scan order as (row, col) pairs, generated by the
    diagonal walk (no table to mistype)."""
    order = []
    r = c = 0
    up = True
    for _ in range(64):
        order.append((r, c))
        if up:
            if c == 7:
                r += 1
                up = False
            elif r == 0:
                c += 1
                up = False
            else:
                r -= 1
                c += 1
        else:
            if r == 7:
                c += 1
                up = True
            elif c == 0:
                r += 1
                up = True
            else:
                r += 1
                c -= 1
    return order


def _jpeg_dct_c():
    import numpy as np

    x = np.arange(8)
    u = x.reshape(-1, 1)
    c = np.cos((2 * x + 1) * u * np.pi / 16)
    c[0] *= np.sqrt(1 / 8)
    c[1:] *= np.sqrt(2 / 8)
    return c  # orthonormal: pixels = C.T @ coefs @ C


# flat canonical Huffman tables (legal by Kraft: 12/2^4 <= 1, 162/2^8 <= 1).
# Symbol-range soundness with quant=1 (r12 self-audit): the largest
# possible |AC| coefficient is the (4,4) basis, whose 64 weights are all
# exactly 0.125, against the extreme level-shifted plane (+127/-128 by
# basis sign) = 0.125*(32*127 + 32*128) = 1020 < 1023 -> AC size <= 10
# always; |DC| <= 1024 and |DC diff| <= 2040 < 2047 -> DC size <= 11.
# Both bounds are pinned by test_round12.TestJpegCodec's extreme-plane
# test, so no input can fall outside the table alphabets.
_JPEG_DC_BITS = [0, 0, 0, 12] + [0] * 12
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0] * 7 + [162] + [0] * 8
_JPEG_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _jpeg_decode_table(codes: dict) -> dict:
    """Invert an encoder table to {(length, code): symbol}; when every
    code shares one length, tag it for the fixed-width fast path."""
    t = {lc: sym for sym, lc in codes.items()}
    lengths = {ln for ln, _ in t}
    if len(lengths) == 1:
        t["_only_len"] = next(iter(lengths))
    return t


def _jpeg_canonical(bits, vals) -> dict:
    """DHT BITS/VALS -> {symbol: (length, code)} (T.81 Annex C)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out


class _JpegBitWriter:
    """MSB-first bit accumulator with T.81 byte stuffing (an emitted
    0xFF is followed by 0x00 inside the entropy-coded segment); the
    final partial byte pads with 1-bits."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        # whole-field accumulate + byte drain (not bit-by-bit: the
        # entropy loop is the codec's hot path; measured ~2x)
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)

    def restart(self, idx: int) -> None:
        """Byte-align (1-bit padding, stuffed if it lands on 0xFF) and
        emit RSTm — marker bytes are written RAW, never stuffed
        (T.81 B.2.1: markers are the one legal 0xFFxx inside a scan)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (idx & 7)])


class _JpegBitReader:
    """MSB-first reader over an entropy-coded segment, un-stuffing
    0xFF00 and stopping at any other 0xFFxx (a marker)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _load(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("dangling 0xFF")
            if self.data[self.pos] == 0x00:
                self.pos += 1  # stuffed
            else:
                raise ValueError("marker inside scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        return self.bits(1)

    def bits(self, n: int) -> int:
        # whole-field extract (chunked byte loads, not bit-by-bit)
        while self.nbits < n:
            self._load()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self, idx: int) -> None:
        """Consume an expected RSTm at a restart boundary: drop the
        current byte's padding bits (at most 7 — loads are one byte at
        a time), then require the byte-aligned 0xFFD0+m with the right
        modulo-8 sequence number."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated at restart boundary")
        m = self.data[self.pos + 1]
        if self.data[self.pos] != 0xFF or not 0xD0 <= m <= 0xD7:
            raise ValueError("expected RSTn at restart boundary")
        if m - 0xD0 != (idx & 7):
            raise ValueError(
                f"restart marker out of sequence: got {m - 0xD0}, "
                f"expected {idx & 7}"
            )
        self.pos += 2

    def huff(self, table: dict) -> int:
        # table: {(length, code): symbol}. Fast path: a table whose
        # codes are all ONE length (our flat DC/AC tables) decodes as
        # a single fixed-width read — the degenerate case of the LUT
        # every production decoder builds; multi-length tables take
        # the general canonical walk.
        only = table.get("_only_len")
        if only is not None:
            sym = table.get((only, self.bits(only)))
            if sym is None:
                raise ValueError("invalid Huffman code")
            return sym
        length = 0
        code = 0
        while length < 17:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _jpeg_size(v: int) -> int:
    return int(v).bit_length() if v else 0


def _jpeg_encode(plane, restart_interval: int = 0) -> bytes:
    """Grayscale baseline JFIF bytes for a uint8 numpy plane whose dims
    are multiples of 8 (edge padding is the standard extension). With
    *restart_interval* > 0, a DRI segment is emitted and the scan is
    split every that-many MCUs by byte-aligned RST0..7 markers with DC
    predictor resets (T.81 B.2.4.4 / E.1.4) — the error-resilience +
    parallel-decode hooks every camera JPEG carries."""
    import struct

    import numpy as np

    h, w = plane.shape
    if h % 8 or w % 8:
        raise ValueError("plane dims must be multiples of 8")
    c = _jpeg_dct_c()
    zz = _jpeg_zigzag()
    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _JpegBitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.restart(rst)
                rst += 1
                prev_dc = 0  # predictors reset at every restart
            mcu += 1
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coefs = c @ (block.astype(np.float64) - 128.0) @ c.T
            q = np.rint(coefs).astype(np.int64)  # quant table = ones
            seq = [int(q[r, cc]) for r, cc in zz]
            diff = seq[0] - prev_dc
            prev_dc = seq[0]
            s = _jpeg_size(abs(diff))
            ln, code = dc_codes[s]
            bw.put(code, ln)
            if s:
                amp = diff if diff > 0 else diff + (1 << s) - 1
                bw.put(amp, s)
            run = 0
            for v in seq[1:]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_codes[0xF0]
                    bw.put(code, ln)
                    run -= 16
                s = _jpeg_size(abs(v))
                ln, code = ac_codes[(run << 4) | s]
                bw.put(code, ln)
                amp = v if v > 0 else v + (1 << s) - 1
                bw.put(amp, s)
                run = 0
            if run:
                ln, code = ac_codes[0x00]
                bw.put(code, ln)
    ecs = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    sof0 = seg(
        0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    dht_dc = seg(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    dht_ac = seg(0xC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    sos = seg(0xDA, b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00")
    return (
        b"\xff\xd8" + app0 + dqt + sof0 + dht_dc + dht_ac + dri + sos
        + ecs + b"\xff\xd9"
    )


def _jpeg_decode(data: bytes):
    """Real baseline JPEG decode (grayscale scan): marker walk, DQT,
    SOF0, canonical-Huffman DHT reconstruction, entropy decode with DC
    prediction + EOB/ZRL + extend, dequant, inverse zigzag, IDCT,
    level shift, clamp. Returns (w, h, numpy uint8 plane)."""
    import struct

    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: no SOI")
    pos = 2
    qt = None
    dims = None
    huff: dict = {}
    restart_interval = 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated marker stream")
        if data[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = data[pos + 1]
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            if body[0] & 0xF0:
                raise ValueError("16-bit quant tables unsupported")
            qt = np.frombuffer(body[1:65], dtype=np.uint8).astype(np.int64)
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError("only 8-bit grayscale baseline")
            if body[7] != 0x11:
                raise ValueError("subsampled scans unsupported")
            dims = (w, h)
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                codes = _jpeg_canonical(bits, vals)
                huff[(tc_th >> 4, tc_th & 15)] = _jpeg_decode_table(
                    codes
                )
                off += 17 + nvals
        elif marker == 0xDD:
            if len(body) != 2:
                raise ValueError("malformed DRI segment")
            restart_interval = int.from_bytes(body, "big")
        elif marker == 0xDA:
            if dims is None or qt is None:
                raise ValueError("SOS before SOF0/DQT")
            if body[0] != 1:
                raise ValueError("only 1-component scans")
            td, ta = body[2] >> 4, body[2] & 15
            break
        # APPn / COM / others: skipped
    w, h = dims
    if w % 8 or h % 8:
        raise ValueError("dims must be multiples of 8 (no edge crop)")
    dc_tab = huff.get((0, td))
    ac_tab = huff.get((1, ta))
    if dc_tab is None or ac_tab is None:
        raise ValueError("scan references undefined Huffman table")
    c = _jpeg_dct_c()
    zz = _jpeg_zigzag()
    rd = _JpegBitReader(data, pos)
    plane = np.zeros((h, w), dtype=np.uint8)
    prev_dc = 0

    def extend(v: int, s: int) -> int:
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    mcu = 0
    rst = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                rd.restart(rst)
                rst += 1
                prev_dc = 0
            mcu += 1
            seq = [0] * 64
            s = rd.huff(dc_tab)
            diff = extend(rd.bits(s), s) if s else 0
            prev_dc += diff
            seq[0] = prev_dc
            k = 1
            while k < 64:
                rs = rd.huff(ac_tab)
                if rs == 0x00:
                    break
                if rs == 0xF0:
                    k += 16
                    continue
                k += rs >> 4
                s = rs & 15
                if k > 63:
                    raise ValueError("AC run past block end")
                seq[k] = extend(rd.bits(s), s)
                k += 1
            coefs = np.zeros((8, 8), dtype=np.float64)
            for i, (r, cc) in enumerate(zz):
                coefs[r, cc] = seq[i] * qt[i]
            block = c.T @ coefs @ c + 128.0
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.rint(block), 0, 255
            ).astype(np.uint8)
    # drain padding bits, then require EOI
    tail = data[rd.pos :]
    if not tail.startswith(b"\xff\xd9"):
        raise ValueError("missing EOI after scan")
    return w, h, plane


def _jpeg_gray_plane_file(payload: bytes):
    """Block-constant plane from the document bytes (block bi's value =
    payload[bi % n]) — the exactness-pinned fixture (see header).
    (Named distinctly from the metadata twin's `_jpeg_build(doc_id,
    payload)` above — the r12 name collision briefly shadowed it.)"""
    import numpy as np

    n = len(payload)
    src = payload if payload else b"\x00"
    wb = 2 + n % _JPEG_BW_MOD
    hb = 1 + n % _JPEG_BH_MOD
    vals = np.frombuffer(
        (src * (wb * hb // len(src) + 1))[: wb * hb], dtype=np.uint8
    ).reshape(hb, wb)
    plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    return _jpeg_encode(plane)


def _jpeg_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for aid, p in zip(pdf["asset_id"], pdf["payload"]):
            w, h, plane = _jpeg_decode(_jpeg_gray_plane_file(p))
            flat = plane.reshape(-1).astype(np.int64)
            rows.append(
                (
                    aid,
                    w,
                    h,
                    (w // 8) * (h // 8),
                    int(flat.sum()),
                    int(((np.arange(w * h, dtype=np.int64) + 1) * flat).sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id",
                "width",
                "height",
                "n_blocks",
                "pix_sum",
                "pix_checksum",
            ],
        )


@register(
    "mm_jpeg_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, strlen(text) AS n,
             2 + strlen(text) % {_JPEG_BW_MOD} AS wb,
             1 + strlen(text) % {_JPEG_BH_MOD} AS hb
      FROM documents
      WHERE {_ASCII_GUARD_SQL}
    )
    SELECT doc_id AS asset_id,
           CAST(8 * wb AS BIGINT) AS width,
           CAST(8 * hb AS BIGINT) AS height,
           CAST(wb * hb AS BIGINT) AS n_blocks,
           CAST(64 * list_aggregate(list_transform(range(0, wb * hb),
               bi -> CAST(ord(text[bi % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_sum,
           CAST(list_aggregate(list_transform(range(0, 64 * wb * hb),
               i -> (i + 1) * CAST(ord(text[
                   (((i // (8 * wb)) // 8) * wb
                    + ((i % (8 * wb)) // 8)) % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_checksum
    FROM d
    """,
)
def mm_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG entropy layer end-to-end under the oracle gate:
    every ASCII document becomes a spec-valid grayscale JFIF whose
    8x8 blocks hold the document's bytes; the from-scratch decoder
    (canonical Huffman, DC prediction, EOB/ZRL, extend, dequant, IDCT)
    must reproduce every pixel exactly, pinned by the closed-form SQL.
    Reference analogue: opaque-payload pass-through (math.c:343-352)
    upgraded to full container+codec parsing. Scale: Arrow-batched
    mapInPandas, no shuffle, no driver."""
    return _ascii_assets(spark, sf_dir).mapInPandas(
        _jpeg_roundtrip_batches,
        schema=(
            "asset_id long, width long, height long, n_blocks long,"
            " pix_sum long, pix_checksum long"
        ),
    )


# ---------------------------------------------------------------------------
# PROGRESSIVE JPEG (SOF2, spectral selection — T.81 Annex G): the
# image transmits as MULTIPLE SCANS over one persistent coefficient
# array — first all DC coefficients (a recognizable 1/64-resolution
# preview), then AC bands (Ss..Se) that sharpen it. The AC band scans
# use progressive-specific entropy coding (G.1.2.2): the RRRRSSSS
# alphabet is baseline's EXCEPT that SSSS=0 with RRRR<15 is EOBn — an
# END-OF-BAND RUN of 2^RRRR + (RRRR extra bits) consecutive blocks
# whose remaining band is all zero, carried ACROSS blocks (the state
# baseline never has). Successive approximation (Ah/Al bit planes) is
# the documented remaining extension; spectral selection alone is a
# legal, widely-emitted progressive subset (Ah=Al=0 scans).
#
# Exactness: the entropy layer is lossless, so progressive decode of a
# progressive encode must reproduce EXACTLY the pixels of the baseline
# roundtrip of the same plane — pinned by hypothesis on random planes;
# the oracle-gated query uses the block-constant fixture closed form
# (where the AC scans are pure EOB-run streams, exercising exactly the
# cross-block state machine).
# ---------------------------------------------------------------------------
_JPEG_PROG_BANDS = ((1, 5), (6, 63))  # libjpeg's default-ish split

# The progressive AC alphabet = baseline's 162 symbols + EOB1..EOB14
# (0x10..0xE0 — SSSS=0, RRRR<15), still one flat 8-bit-code table:
# 176/2^8 ≤ 1 keeps it Kraft-legal, and every file carries its own
# DHT so the two table families never mix.
_JPEG_PAC_BITS = [0] * 7 + [176] + [0] * 8
_JPEG_PAC_VALS = (
    [0x00, 0xF0]
    + [r << 4 for r in range(1, 15)]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)


def _jpeg_coef_blocks(plane):
    """Quantized zigzag coefficient sequences for every 8x8 block
    (quant table = ones), raster order — the shared front half of the
    baseline and progressive encoders."""
    import numpy as np

    h, w = plane.shape
    c = _jpeg_dct_c()
    zz = _jpeg_zigzag()
    out = []
    for by in range(h // 8):
        for bx in range(w // 8):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            q = np.rint(
                c @ (block.astype(np.float64) - 128.0) @ c.T
            ).astype(np.int64)
            out.append([int(q[r, cc]) for r, cc in zz])
    return out


def _jpeg_encode_progressive(plane, bands=_JPEG_PROG_BANDS) -> bytes:
    """Grayscale PROGRESSIVE (SOF2) JFIF: one DC scan then one AC scan
    per (Ss, Se) band in *bands*, spectral selection only (Ah=Al=0)."""
    import struct

    import numpy as np  # noqa: F401  (parity with the baseline encoder)

    h, w = plane.shape
    if h % 8 or w % 8:
        raise ValueError("plane dims must be multiples of 8")
    blocks = _jpeg_coef_blocks(plane)
    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_PAC_BITS, _JPEG_PAC_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos_header(ss: int, se: int) -> bytes:
        return seg(0xDA, b"\x01" + bytes([1, 0x00]) + bytes([ss, se, 0]))

    # scan 1 — DC coefficients (identical coding to baseline DC)
    bw = _JpegBitWriter()
    prev_dc = 0
    for seq in blocks:
        diff = seq[0] - prev_dc
        prev_dc = seq[0]
        s = _jpeg_size(abs(diff))
        ln, code = dc_codes[s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    scans = [sos_header(0, 0) + bw.flush()]

    # AC band scans — G.1.2.2 with the cross-block EOB run
    for ss, se in bands:
        bw = _JpegBitWriter()
        eobrun = 0

        def flush_eobrun():
            # EOBn codes runs in [2^r, 2^(r+1)-1] via r extra bits, so
            # one code covers any run ≤ 32767 (r ≤ 14) — the 0x7FFF cap
            # below keeps eobrun inside that envelope.
            nonlocal eobrun
            if not eobrun:
                return
            r = eobrun.bit_length() - 1
            ln, code = ac_codes[r << 4]
            bw.put(code, ln)
            if r:
                bw.put(eobrun - (1 << r), r)
            eobrun = 0

        for seq in blocks:
            band = seq[ss : se + 1]
            # index of the last nonzero in the band, or -1
            last = max(
                (i for i, v in enumerate(band) if v), default=-1
            )
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:  # spec max EOB run
                    flush_eobrun()
                continue
            flush_eobrun()
            run = 0
            for v in band[: last + 1]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_codes[0xF0]  # ZRL
                    bw.put(code, ln)
                    run -= 16
                s = _jpeg_size(abs(v))
                ln, code = ac_codes[(run << 4) | s]
                bw.put(code, ln)
                bw.put(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last < len(band) - 1:
                eobrun += 1  # trailing zeros: this block starts a run
        flush_eobrun()
        scans.append(sos_header(ss, se) + bw.flush())

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    sof2 = seg(
        0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    dht_dc = seg(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    dht_ac = seg(0xC4, b"\x10" + bytes(_JPEG_PAC_BITS) + bytes(_JPEG_PAC_VALS))
    return (
        b"\xff\xd8" + app0 + dqt + sof2 + dht_dc + dht_ac
        + b"".join(scans) + b"\xff\xd9"
    )


# --- successive approximation (T.81 G.1.2.1-G.1.2.3) ------------------
# The second progressive axis: coefficients transmit HIGH BITS FIRST
# (point transform Al), then refinement scans (Ah = Al+1 -> Al) send
# one correction bit per already-nonzero coefficient and introduce
# newly-significant ones as ±2^Al. DC refinement is one raw bit per
# block; AC refinement is the famously fiddly correction-bit walk
# (libjpeg's encode/decode_mcu_AC_refine, re-derived from the spec):
# the zero-history run length R counts ONLY zero-history positions,
# correction bits for history coefficients buffer up and flush after
# each emitted Huffman code (and after EOBn for the run's blocks).


def _jpeg_encode_progressive_sa(plane) -> bytes:
    """Grayscale SOF2 with BOTH progressive axes: 4 scans — DC high
    bits (Al=1), DC refinement, AC band 1-63 high bits (Al=1), AC
    refinement (Ah=1 -> Al=0). Decodes to exactly the baseline
    coefficients (the refinement restores every low bit)."""
    import struct

    h, w = plane.shape
    if h % 8 or w % 8:
        raise ValueError("plane dims must be multiples of 8")
    blocks = _jpeg_coef_blocks(plane)
    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_PAC_BITS, _JPEG_PAC_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos_header(ss: int, se: int, ah: int, al: int) -> bytes:
        return seg(
            0xDA,
            b"\x01" + bytes([1, 0x00]) + bytes([ss, se, (ah << 4) | al]),
        )

    scans = []
    # scan 1 — DC high bits: code (DC >> 1), ARITHMETIC shift (the DC
    # point transform is on the two's-complement value, G.1.2.1)
    bw = _JpegBitWriter()
    prev_dc = 0
    for seq in blocks:
        v = seq[0] >> 1
        diff = v - prev_dc
        prev_dc = v
        s = _jpeg_size(abs(diff))
        ln, code = dc_codes[s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    scans.append(sos_header(0, 0, 0, 1) + bw.flush())
    # scan 2 — DC refinement: ONE raw bit per block (the dropped LSB)
    bw = _JpegBitWriter()
    for seq in blocks:
        bw.put(seq[0] & 1, 1)
    scans.append(sos_header(0, 0, 1, 0) + bw.flush())
    # scan 3 — AC 1..63 high bits: MAGNITUDE shift t = sign·(|c|>>1),
    # coded exactly like a spectral-selection scan over t
    bw = _JpegBitWriter()
    eobrun = 0

    def flush_eobrun_plain():
        nonlocal eobrun
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        ln, code = ac_codes[r << 4]
        bw.put(code, ln)
        if r:
            bw.put(eobrun - (1 << r), r)
        eobrun = 0

    for seq in blocks:
        band = [
            (1 if v > 0 else -1) * (abs(v) >> 1) for v in seq[1:64]
        ]
        last = max((i for i, v in enumerate(band) if v), default=-1)
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eobrun_plain()
            continue
        flush_eobrun_plain()
        run = 0
        for v in band[: last + 1]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                bw.put(code, ln)
                run -= 16
            s = _jpeg_size(abs(v))
            ln, code = ac_codes[(run << 4) | s]
            bw.put(code, ln)
            bw.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 62:
            eobrun += 1
    flush_eobrun_plain()
    scans.append(sos_header(1, 63, 0, 1) + bw.flush())
    # scan 4 — AC refinement (G.1.2.3): newly-significant coefficients
    # appear as (R<<4)|1 + sign bit, history coefficients contribute
    # buffered correction bits, EOB runs carry their blocks' bits
    bw = _JpegBitWriter()
    eobrun = 0
    run_bits: list[int] = []

    def flush_eobrun_refine():
        nonlocal eobrun
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        ln, code = ac_codes[r << 4]
        bw.put(code, ln)
        if r:
            bw.put(eobrun - (1 << r), r)
        for b in run_bits:
            bw.put(b, 1)
        run_bits.clear()
        eobrun = 0

    for seq in blocks:
        absv = [abs(v) for v in seq[1:64]]  # Al=0: already the target
        eob_i = max((i for i, a in enumerate(absv) if a == 1), default=-1)
        if eob_i < 0:
            # no newly-significant coefficient: the whole band joins
            # the EOB run; its history corrections ride the run buffer
            run_bits.extend(a & 1 for a in absv if a > 1)
            eobrun += 1
            if eobrun == 0x7FFF or len(run_bits) > 930:
                flush_eobrun_refine()  # libjpeg's MAX_CORR_BITS guard
            continue
        flush_eobrun_refine()
        r = 0
        pending: list[int] = []
        for i, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            if a > 1:
                if i < eob_i:
                    pending.append(a & 1)
                else:
                    # history past the last new coefficient: rides the
                    # EOB-run buffer (the decoder reads it there)
                    run_bits.append(a & 1)
                continue
            while r > 15:
                ln, code = ac_codes[0xF0]
                bw.put(code, ln)
                for b in pending:
                    bw.put(b, 1)
                pending.clear()
                r -= 16
            ln, code = ac_codes[(r << 4) | 1]
            bw.put(code, ln)
            bw.put(1 if seq[1 + i] > 0 else 0, 1)  # sign of ±2^Al
            for b in pending:
                bw.put(b, 1)
            pending.clear()
            r = 0
        if r > 0 or run_bits:
            # trailing zero-history positions after the last new
            # coefficient: this block ends in an EOB run
            eobrun += 1
        # (pending is empty here: every history coefficient after
        # eob_i went to run_bits, every one before it flushed)
    flush_eobrun_refine()
    scans.append(sos_header(1, 63, 1, 0) + bw.flush())

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    sof2 = seg(
        0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    dht_dc = seg(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    dht_ac = seg(0xC4, b"\x10" + bytes(_JPEG_PAC_BITS) + bytes(_JPEG_PAC_VALS))
    return (
        b"\xff\xd8" + app0 + dqt + sof2 + dht_dc + dht_ac
        + b"".join(scans) + b"\xff\xd9"
    )


def _jpeg_decode_progressive(data: bytes):
    """Decode a spectral-selection progressive (SOF2) grayscale JPEG:
    a persistent per-block coefficient array accumulates across scans
    (DC scan + AC band scans with cross-block EOB runs), then one
    dequant + IDCT pass renders the final plane. Returns (w, h,
    uint8 plane)."""
    import struct

    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: no SOI")
    pos = 2
    qt = None
    dims = None
    huff: dict = {}
    coefs: list | None = None
    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated marker stream")
        if data[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI: all scans consumed
            break
        if pos + 4 > len(data):
            raise ValueError("truncated marker stream")
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            if not body or body[0] & 0xF0:
                raise ValueError("16-bit quant tables unsupported")
            qt = np.frombuffer(body[1:65], dtype=np.uint8).astype(np.int64)
        elif marker == 0xC2:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError("only 8-bit grayscale progressive")
            if body[7] != 0x11:
                raise ValueError("subsampled scans unsupported")
            dims = (w, h)
            if w % 8 or h % 8:
                raise ValueError("dims must be multiples of 8")
            coefs = [[0] * 64 for _ in range((h // 8) * (w // 8))]
        elif marker == 0xC0:
            raise ValueError("baseline SOF in progressive decoder")
        elif marker in (0xC1, 0xC3):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xDD:
            raise ValueError(
                "restart intervals unsupported on the progressive path"
            )
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                huff[(tc_th >> 4, tc_th & 15)] = _jpeg_decode_table(
                    _jpeg_canonical(bits, vals)
                )
                off += 17 + nvals
        elif marker == 0xDA:
            if dims is None or qt is None or coefs is None:
                raise ValueError("SOS before SOF2/DQT")
            if body[0] != 1:
                raise ValueError("only 1-component scans")
            td, ta = body[2] >> 4, body[2] & 15
            ss, se, ahl = body[3], body[4], body[5]
            ah, al = ahl >> 4, ahl & 15
            if ah and ah != al + 1:
                raise ValueError(
                    "refinement scans must step Ah = Al + 1 (G.1.1.1.1)"
                )
            if ss > se or se > 63:
                raise ValueError("bad spectral band")
            rd = _JpegBitReader(data, pos)
            if ah == 0:
                pos = _jpeg_prog_scan(
                    rd, coefs, huff, td, ta, ss, se, al
                )
            else:
                pos = _jpeg_prog_refine(rd, coefs, huff, ta, ss, se, al)
    if coefs is None:
        raise ValueError("EOI before SOF2")
    w, h = dims
    c = _jpeg_dct_c()
    zz = _jpeg_zigzag()
    plane = np.zeros((h, w), dtype=np.uint8)
    wb = w // 8
    for bi, seq in enumerate(coefs):
        grid = np.zeros((8, 8), dtype=np.float64)
        for i, (r, cc) in enumerate(zz):
            grid[r, cc] = seq[i] * qt[i]
        block = c.T @ grid @ c + 128.0
        by, bx = divmod(bi, wb)
        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
            np.rint(block), 0, 255
        ).astype(np.uint8)
    return w, h, plane


def _jpeg_prog_scan(
    rd, coefs, huff, td, ta, ss: int, se: int, al: int = 0
) -> int:
    """Entropy-decode ONE first-pass scan (Ah=0) into the persistent
    coefficient array; *al* is the successive-approximation point
    transform (decoded values land as value·2^Al). Returns the stream
    position after the scan's entropy data."""

    def extend(v: int, s: int) -> int:
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    if ss == 0:
        if se != 0:
            raise ValueError("DC scan must have Se = 0 (G.1.1.1.1)")
        dc_tab = huff.get((0, td))
        if dc_tab is None:
            raise ValueError("scan references undefined DC table")
        prev_dc = 0
        for seq in coefs:
            s = rd.huff(dc_tab)
            prev_dc += extend(rd.bits(s), s) if s else 0
            seq[0] = prev_dc << al
        return rd.pos
    ac_tab = huff.get((1, ta))
    if ac_tab is None:
        raise ValueError("scan references undefined AC table")
    eobrun = 0
    for seq in coefs:
        if eobrun:
            eobrun -= 1  # this block's band is entirely zero
            continue
        k = ss
        while k <= se:
            rs = rd.huff(ac_tab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                # EOBn: run of 2^r + r extra bits, INCLUDING this block
                eobrun = (1 << r) + (rd.bits(r) if r else 0) - 1
                break
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            v = extend(rd.bits(s), s)
            seq[k] = v << al if v >= 0 else -((-v) << al)
            k += 1
    if eobrun:
        raise ValueError("EOB run past the last block of the scan")
    return rd.pos


def _jpeg_prog_refine(rd, coefs, huff, ta, ss: int, se: int, al: int) -> int:
    """Entropy-decode ONE refinement scan (Ah = Al+1 → Al, T.81
    G.1.2.3). DC refinement is one raw bit per block; AC refinement
    walks the band reading a correction bit at every already-nonzero
    position passed, placing newly-significant coefficients as ±2^Al
    when a zero-history run expires, with EOB runs carrying the
    correction bits of whole all-zero-new blocks."""
    p1 = 1 << al
    if ss == 0:
        for seq in coefs:
            seq[0] |= rd.bit() << al
        return rd.pos
    ac_tab = huff.get((1, ta))
    if ac_tab is None:
        raise ValueError("scan references undefined AC table")

    def correct(seq, k):
        # one correction bit for a history coefficient: set its 2^Al
        # magnitude bit if the wire says so and it isn't already set
        if rd.bit() and (abs(seq[k]) & p1) == 0:
            seq[k] += p1 if seq[k] >= 0 else -p1

    eobrun = 0
    for seq in coefs:
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = rd.huff(ac_tab)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) + (rd.bits(r) if r else 0)
                        break
                    sval = 0  # ZRL: pass 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError(
                            "refinement magnitudes must be 1 (G.1.2.3)"
                        )
                    sval = p1 if rd.bit() else -p1
                while k <= se:
                    if seq[k] != 0:
                        correct(seq, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if sval and k <= se:
                    seq[k] = sval
                k += 1
        if eobrun:
            # this block (from k) and the run's remaining blocks: only
            # correction bits for history coefficients
            while k <= se:
                if seq[k] != 0:
                    correct(seq, k)
                k += 1
            eobrun -= 1
    if eobrun:
        raise ValueError("EOB run past the last block of the scan")
    return rd.pos


def _jpeg_progressive_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for aid, p in zip(pdf["asset_id"], pdf["payload"]):
            n = len(p)
            src = p if p else b"\x00"
            wb = 2 + n % _JPEG_BW_MOD
            hb = 1 + n % _JPEG_BH_MOD
            vals = np.frombuffer(
                (src * (wb * hb // len(src) + 1))[: wb * hb],
                dtype=np.uint8,
            ).reshape(hb, wb)
            plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
            data = _jpeg_encode_progressive(plane)
            n_scans = data.count(b"\xff\xda")  # SOS cannot occur in ECS
            w, h, out = _jpeg_decode_progressive(data)
            flat = out.reshape(-1).astype(np.int64)
            rows.append(
                (
                    aid,
                    w,
                    h,
                    n_scans,
                    int(flat.sum()),
                    int(
                        (
                            (np.arange(w * h, dtype=np.int64) + 1) * flat
                        ).sum()
                    ),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id",
                "width",
                "height",
                "n_scans",
                "pix_sum",
                "pix_checksum",
            ],
        )


@register(
    "mm_jpeg_progressive_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, strlen(text) AS n,
             2 + strlen(text) % {_JPEG_BW_MOD} AS wb,
             1 + strlen(text) % {_JPEG_BH_MOD} AS hb
      FROM documents
      WHERE {_ASCII_GUARD_SQL}
    )
    SELECT doc_id AS asset_id,
           CAST(8 * wb AS BIGINT) AS width,
           CAST(8 * hb AS BIGINT) AS height,
           CAST({1 + len(_JPEG_PROG_BANDS)} AS BIGINT) AS n_scans,
           CAST(64 * list_aggregate(list_transform(range(0, wb * hb),
               bi -> CAST(ord(text[bi % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_sum,
           CAST(list_aggregate(list_transform(range(0, 64 * wb * hb),
               i -> (i + 1) * CAST(ord(text[
                   (((i // (8 * wb)) // 8) * wb
                    + ((i % (8 * wb)) // 8)) % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_checksum
    FROM d
    """,
)
def mm_jpeg_progressive_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE (SOF2, spectral selection) JPEG under the oracle
    gate: the block-constant fixtures encode as THREE SCANS (DC, then
    AC bands 1-5 and 6-63 — counted from the wire's SOS markers and
    pinned against the closed form), and because every AC coefficient
    of a constant block is zero, the band scans are PURE EOB-RUN
    streams — the cross-block state machine baseline JPEG doesn't
    have, exercised on every asset. The decoder accumulates a
    persistent coefficient array across scans and must reproduce every
    pixel exactly. Progressive decode ≡ baseline decode on random
    planes is pinned by hypothesis (the entropy layer is lossless).
    Reference analogue: none; T.81 Annex G (G.1.2.2 EOBn coding)."""
    return _ascii_assets(spark, sf_dir).mapInPandas(
        _jpeg_progressive_roundtrip_batches,
        schema=(
            "asset_id long, width long, height long, n_scans long,"
            " pix_sum long, pix_checksum long"
        ),
    )


def _jpeg_sa_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for aid, p in zip(pdf["asset_id"], pdf["payload"]):
            n = len(p)
            src = p if p else b"\x00"
            wb = 2 + n % _JPEG_BW_MOD
            hb = 1 + n % _JPEG_BH_MOD
            vals = np.frombuffer(
                (src * (wb * hb // len(src) + 1))[: wb * hb],
                dtype=np.uint8,
            ).reshape(hb, wb)
            plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
            data = _jpeg_encode_progressive_sa(plane)
            n_scans = data.count(b"\xff\xda")
            w, h, out = _jpeg_decode_progressive(data)
            flat = out.reshape(-1).astype(np.int64)
            rows.append(
                (
                    aid,
                    w,
                    h,
                    n_scans,
                    int(flat.sum()),
                    int(
                        (
                            (np.arange(w * h, dtype=np.int64) + 1) * flat
                        ).sum()
                    ),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id",
                "width",
                "height",
                "n_scans",
                "pix_sum",
                "pix_checksum",
            ],
        )


@register(
    "mm_jpeg_sa_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, strlen(text) AS n,
             2 + strlen(text) % {_JPEG_BW_MOD} AS wb,
             1 + strlen(text) % {_JPEG_BH_MOD} AS hb
      FROM documents
      WHERE {_ASCII_GUARD_SQL}
    )
    SELECT doc_id AS asset_id,
           CAST(8 * wb AS BIGINT) AS width,
           CAST(8 * hb AS BIGINT) AS height,
           CAST(4 AS BIGINT) AS n_scans,
           CAST(64 * list_aggregate(list_transform(range(0, wb * hb),
               bi -> CAST(ord(text[bi % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_sum,
           CAST(list_aggregate(list_transform(range(0, 64 * wb * hb),
               i -> (i + 1) * CAST(ord(text[
                   (((i // (8 * wb)) // 8) * wb
                    + ((i % (8 * wb)) // 8)) % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_checksum
    FROM d
    """,
)
def mm_jpeg_sa_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUCCESSIVE APPROXIMATION progressive JPEG under the oracle
    gate: the block-constant fixtures encode as FOUR SCANS — DC high
    bits (point transform Al=1, arithmetic shift), a DC refinement
    scan (one raw LSB per block), AC 1-63 high bits (magnitude shift),
    and the AC refinement scan (G.1.2.3) — so every pixel's DC value
    is reassembled from TWO bit planes across scans, and the AC scans
    exercise both EOB-run state machines. The correction-bit walk for
    history coefficients is pinned by hypothesis on random planes
    (SA decode ≡ baseline decode exactly — 30 cases per run; the
    entropy layer is lossless end-to-end).
    Reference analogue: none; T.81 G.1.2.1-G.1.2.3."""
    return _ascii_assets(spark, sf_dir).mapInPandas(
        _jpeg_sa_roundtrip_batches,
        schema=(
            "asset_id long, width long, height long, n_scans long,"
            " pix_sum long, pix_checksum long"
        ),
    )


_JPEG_DRI_INTERVAL = 2  # MCUs per restart interval in the DRI fixture


def _jpeg_dri_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for aid, p in zip(pdf["asset_id"], pdf["payload"]):
            n = len(p)
            src = p if p else b"\x00"
            wb = 2 + n % _JPEG_BW_MOD
            hb = 1 + n % _JPEG_BH_MOD
            vals = np.frombuffer(
                (src * (wb * hb // len(src) + 1))[: wb * hb],
                dtype=np.uint8,
            ).reshape(hb, wb)
            plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
            data = _jpeg_encode(
                plane, restart_interval=_JPEG_DRI_INTERVAL
            )
            n_rst = data.count(b"\xff\xd0") + sum(
                data.count(bytes([0xFF, 0xD0 + i])) for i in range(1, 8)
            )
            w, h, out = _jpeg_decode(data)
            flat = out.reshape(-1).astype(np.int64)
            rows.append(
                (
                    aid,
                    w,
                    h,
                    n_rst,
                    int(flat.sum()),
                    int(
                        (
                            (np.arange(w * h, dtype=np.int64) + 1) * flat
                        ).sum()
                    ),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id",
                "width",
                "height",
                "n_restarts",
                "pix_sum",
                "pix_checksum",
            ],
        )


@register(
    "mm_jpeg_dri_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, strlen(text) AS n,
             2 + strlen(text) % {_JPEG_BW_MOD} AS wb,
             1 + strlen(text) % {_JPEG_BH_MOD} AS hb
      FROM documents
      WHERE {_ASCII_GUARD_SQL}
    )
    SELECT doc_id AS asset_id,
           CAST(8 * wb AS BIGINT) AS width,
           CAST(8 * hb AS BIGINT) AS height,
           CAST((wb * hb - 1) // {_JPEG_DRI_INTERVAL} AS BIGINT)
             AS n_restarts,
           CAST(64 * list_aggregate(list_transform(range(0, wb * hb),
               bi -> CAST(ord(text[bi % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_sum,
           CAST(list_aggregate(list_transform(range(0, 64 * wb * hb),
               i -> (i + 1) * CAST(ord(text[
                   (((i // (8 * wb)) // 8) * wb
                    + ((i % (8 * wb)) // 8)) % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS pix_checksum
    FROM d
    """,
)
def mm_jpeg_dri_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restart-marker (DRI/RSTn) machinery under the oracle gate: the
    same block-constant fixtures as mm_jpeg_decode, but encoded with a
    2-MCU restart interval — byte-aligned RST0..7 split the scan, DC
    predictors reset at every boundary, and the decoder must resync
    (sequence-checked) to reproduce every pixel. The n_restarts column
    pins that restarts were genuinely emitted: (blocks-1) // interval,
    counted from the wire bytes, must match the closed form. Restart
    markers are also WHY parallel decode of one big JPEG is possible —
    each restart segment is independently decodable, the 100 TB note.
    Reference analogue: none; T.81 B.2.4.4/E.1.4."""
    return _ascii_assets(spark, sf_dir).mapInPandas(
        _jpeg_dri_roundtrip_batches,
        schema=(
            "asset_id long, width long, height long, n_restarts long,"
            " pix_sum long, pix_checksum long"
        ),
    )


# ---------------------------------------------------------------------------
# COLOR (3-component YCbCr 4:4:4) extension of the baseline codec: the
# SOF0/SOS carry three components (ids 1..3, sampling 0x11), the scan
# interleaves one MCU = Y block, Cb block, Cr block with a DC PREDICTOR
# PER COMPONENT (T.81 F.1.1.5.1 — the bug surface this exists to pin),
# and the JFIF color transform (T.871) maps RGB <-> YCbCr around the
# DCT. Exactness discipline: the oracle fixture is GRAY-valued RGB
# (R=G=B=v), for which Y=v, Cb=Cr=128 exactly after rounding — so the
# full color path (3x entropy streams, interleaved predictors, color
# convert) round-trips bit-exact under the SQL gate; chromatic planes
# are pinned by the hypothesis bound instead (color-matrix rounding
# adds +/-2). Remaining extension, documented: subsampled (4:2:0)
# MCUs — 4 Y blocks + Cb + Cr with chroma upsampling.
# ---------------------------------------------------------------------------
def _jpeg_rgb_to_ycbcr(rgb):
    import numpy as np

    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return [
        np.clip(np.rint(c), 0, 255).astype(np.uint8) for c in (y, cb, cr)
    ]


def _jpeg_ycbcr_to_rgb(y, cb, cr):
    import numpy as np

    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136286 * cbf - 0.714136286 * crf
    b = yf + 1.772 * cbf
    import numpy as np

    out = np.stack(
        [np.clip(np.rint(c), 0, 255).astype(np.uint8) for c in (r, g, b)],
        axis=-1,
    )
    return out


def _jpeg_encode_color(rgb) -> bytes:
    """Baseline JFIF for an (H, W, 3) uint8 RGB array (dims multiples
    of 8): YCbCr 4:4:4, interleaved MCUs, per-component DC
    predictors."""
    import struct

    import numpy as np

    h, w, _ = rgb.shape
    if h % 8 or w % 8:
        raise ValueError("plane dims must be multiples of 8")
    planes = _jpeg_rgb_to_ycbcr(rgb)
    c = _jpeg_dct_c()
    zz = _jpeg_zigzag()
    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _JpegBitWriter()
    prev = [0, 0, 0]

    def _block(plane, by, bx, comp):
        block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
        q = np.rint(c @ (block.astype(np.float64) - 128.0) @ c.T).astype(
            np.int64
        )
        seq = [int(q[r, cc]) for r, cc in zz]
        diff = seq[0] - prev[comp]
        prev[comp] = seq[0]
        s = _jpeg_size(abs(diff))
        ln, code = dc_codes[s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        for v in seq[1:]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                bw.put(code, ln)
                run -= 16
            s = _jpeg_size(abs(v))
            ln, code = ac_codes[(run << 4) | s]
            bw.put(code, ln)
            bw.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            ln, code = ac_codes[0x00]
            bw.put(code, ln)

    for by in range(h // 8):
        for bx in range(w // 8):
            for comp in range(3):  # the MCU interleave
                _block(planes[comp], by, bx, comp)
    ecs = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(3))
    sof0 = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + comps)
    dht_dc = seg(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    dht_ac = seg(0xC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    scomps = b"".join(bytes([i + 1, 0x00]) for i in range(3))
    sos = seg(0xDA, b"\x03" + scomps + b"\x00\x3f\x00")
    return (
        b"\xff\xd8" + app0 + dqt + sof0 + dht_dc + dht_ac + sos + ecs
        + b"\xff\xd9"
    )


def _jpeg_decode_color(data: bytes):
    """Decode a 3-component 4:4:4 baseline JPEG; returns (w, h, rgb
    uint8 array). Shares the marker/Huffman machinery with the
    grayscale decoder; the scan loop adds the MCU interleave and
    per-component predictors."""
    import struct

    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: no SOI")
    pos = 2
    qt = None
    dims = None
    ncomp = None
    huff: dict = {}
    scan_tabs = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated marker stream")
        if data[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = data[pos + 1]
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            if not body or body[0] & 0xF0:
                raise ValueError("16-bit quant tables unsupported")
            qt = np.frombuffer(body[1:65], dtype=np.uint8).astype(np.int64)
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp not in (1, 3):
                raise ValueError("only 8-bit 1- or 3-component baseline")
            for i in range(ncomp):
                if body[6 + 3 * i + 1] != 0x11:
                    raise ValueError("subsampled scans unsupported")
            dims = (w, h)
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xDD:
            raise ValueError(
                "restart intervals unsupported on the 4:4:4 path "
                "(the grayscale decoder implements DRI)"
            )
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                huff[(tc_th >> 4, tc_th & 15)] = _jpeg_decode_table(
                    _jpeg_canonical(bits, vals)
                )
                off += 17 + nvals
        elif marker == 0xDA:
            if dims is None or qt is None:
                raise ValueError("SOS before SOF0/DQT")
            ns = body[0]
            if ns != ncomp:
                raise ValueError("scan component count != frame")
            scan_tabs = [
                (body[2 + 2 * i] >> 4, body[2 + 2 * i] & 15)
                for i in range(ns)
            ]
            break
        elif marker == 0xD9:
            raise ValueError("EOI before SOS")
    w, h = dims
    if w % 8 or h % 8:
        raise ValueError("dims must be multiples of 8")
    c = _jpeg_dct_c()
    zz = _jpeg_zigzag()
    rd = _JpegBitReader(data, pos)
    planes = [np.zeros((h, w), dtype=np.uint8) for _ in range(ncomp)]
    prev = [0] * ncomp

    def extend(v: int, s: int) -> int:
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    for by in range(h // 8):
        for bx in range(w // 8):
            for comp in range(ncomp):
                dc_tab = huff[(0, scan_tabs[comp][0])]
                ac_tab = huff[(1, scan_tabs[comp][1])]
                seq = [0] * 64
                s = rd.huff(dc_tab)
                prev[comp] += extend(rd.bits(s), s) if s else 0
                seq[0] = prev[comp]
                k = 1
                while k < 64:
                    rs = rd.huff(ac_tab)
                    if rs == 0x00:
                        break
                    if rs == 0xF0:
                        k += 16
                        continue
                    k += rs >> 4
                    s = rs & 15
                    if k > 63:
                        raise ValueError("AC run past block end")
                    seq[k] = extend(rd.bits(s), s)
                    k += 1
                coefs = np.zeros((8, 8))
                for i, (r, cc) in enumerate(zz):
                    coefs[r, cc] = seq[i] * qt[i]
                block = c.T @ coefs @ c + 128.0
                planes[comp][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    np.clip(np.rint(block), 0, 255).astype(np.uint8)
                )
    if not data[rd.pos :].startswith(b"\xff\xd9"):
        raise ValueError("missing EOI after scan")
    if ncomp == 1:
        return w, h, planes[0]
    return w, h, _jpeg_ycbcr_to_rgb(*planes)


_JPEG_C_BW_MOD = 3  # blocks wide: 1 + n % 3
_JPEG_C_BH_MOD = 4  # blocks high: 1 + n % 4


def _jpeg_color_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for aid, p in zip(pdf["asset_id"], pdf["payload"]):
            n = len(p)
            src = p if p else b"\x00"
            wb = 1 + n % _JPEG_C_BW_MOD
            hb = 1 + n % _JPEG_C_BH_MOD
            vals = np.frombuffer(
                (src * (wb * hb // len(src) + 1))[: wb * hb], dtype=np.uint8
            ).reshape(hb, wb)
            gray = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
            rgb = np.repeat(gray[:, :, None], 3, axis=2)
            w, h, out = _jpeg_decode_color(_jpeg_encode_color(rgb))
            flat = out.reshape(-1).astype(np.int64)  # RGB-interleaved
            rows.append(
                (
                    aid,
                    w,
                    h,
                    int(out[..., 0].astype(np.int64).sum()),
                    int(out[..., 1].astype(np.int64).sum()),
                    int(out[..., 2].astype(np.int64).sum()),
                    int(
                        (
                            (np.arange(3 * w * h, dtype=np.int64) + 1) * flat
                        ).sum()
                    ),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id",
                "width",
                "height",
                "r_sum",
                "g_sum",
                "b_sum",
                "rgb_checksum",
            ],
        )


@register(
    "mm_jpeg_color_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, strlen(text) AS n,
             1 + strlen(text) % {_JPEG_C_BW_MOD} AS wb,
             1 + strlen(text) % {_JPEG_C_BH_MOD} AS hb
      FROM documents
      WHERE {_ASCII_GUARD_SQL}
    ),
    sums AS (
      SELECT doc_id, wb, hb, n, text,
             64 * list_aggregate(list_transform(range(0, wb * hb),
                 bi -> CAST(ord(text[bi % n + 1]) AS BIGINT)),
                 'sum') AS chan_sum
      FROM d
    )
    SELECT doc_id AS asset_id,
           CAST(8 * wb AS BIGINT) AS width,
           CAST(8 * hb AS BIGINT) AS height,
           CAST(chan_sum AS BIGINT) AS r_sum,
           CAST(chan_sum AS BIGINT) AS g_sum,
           CAST(chan_sum AS BIGINT) AS b_sum,
           -- gray pixels: all 3 channels = v(p), so the interleaved
           -- checksum collapses to sum_p v(p) * (9p + 6)
           CAST(list_aggregate(list_transform(range(0, 64 * wb * hb),
               p -> (9 * p + 6) * CAST(ord(text[
                   (((p // (8 * wb)) // 8) * wb
                    + ((p % (8 * wb)) // 8)) % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS rgb_checksum
    FROM sums
    """,
)
def mm_jpeg_color_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COLOR baseline-JPEG path under the oracle gate: gray-valued
    RGB block-constant planes (exact through T.871 color convert +
    3-stream MCU interleave + per-component DC prediction); any
    predictor crossing, channel mix-up, or interleave slip breaks the
    bitwise hash. See the codec header for the exactness argument."""
    return _ascii_assets(spark, sf_dir).mapInPandas(
        _jpeg_color_roundtrip_batches,
        schema=(
            "asset_id long, width long, height long, r_sum long,"
            " g_sum long, b_sum long, rgb_checksum long"
        ),
    )


# ---------------------------------------------------------------------------
# 4:2:0 CHROMA-SUBSAMPLED extension — the MCU shape virtually every
# camera/web JPEG uses: luma sampled 2x2 (factors 0x22), chroma 1x1,
# so one MCU = FOUR Y blocks (a 16x16 luma tile, raster order) + one
# Cb + one Cr block covering the same tile at half resolution. The
# encoder downsamples chroma by 2x2 box averaging; the decoder
# upsamples by pixel replication (nearest) — both ends of the real
# pipeline, plus the 6-block-per-MCU interleave and PARTIAL MCUs (any
# image size: SOF records true dims, the encoder edge-replicates to
# the 16-multiple grid, the decoder crops back — T.81 A.2.4).
# Exactness: gray 16x16-TILE-constant planes give
# Y = v (every sample), Cb = Cr = 128 (averaging a constant is the
# constant) — bit-exact through subsample -> DCT -> entropy ->
# upsample -> color convert, so the SQL gate pins the whole MCU
# machinery; chromatic content is hypothesis-bounded (box-average
# loss is content-dependent, so the bound is on GRAY random planes
# where only rounding remains).
# ---------------------------------------------------------------------------
def _jpeg_encode_420(rgb) -> bytes:
    """Baseline JFIF, YCbCr 4:2:0 (luma 0x22, chroma 0x11). Any dims:
    the SOF records the TRUE size; planes pad to the 16-multiple MCU
    grid by edge replication (what libjpeg does — replication keeps
    the boundary DCT blocks smooth, and the decoder crops back)."""
    import struct

    import numpy as np

    h, w, _ = rgb.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    if (ph, pw) != (h, w):
        rgb = np.pad(
            rgb, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
        )
    y, cb, cr = _jpeg_rgb_to_ycbcr(rgb)
    # 2x2 box-average chroma downsample (the standard decimation)
    def down(p):
        f = p.astype(np.float64)
        q = (f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2]
             + f[1::2, 1::2]) / 4.0
        return np.clip(np.rint(q), 0, 255).astype(np.uint8)

    cbs, crs = down(cb), down(cr)
    c = _jpeg_dct_c()
    zz = _jpeg_zigzag()
    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _JpegBitWriter()
    prev = [0, 0, 0]

    def put_block(plane, by, bx, comp):
        block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
        q = np.rint(c @ (block.astype(np.float64) - 128.0) @ c.T).astype(
            np.int64
        )
        seq = [int(q[r, cc]) for r, cc in zz]
        diff = seq[0] - prev[comp]
        prev[comp] = seq[0]
        s = _jpeg_size(abs(diff))
        ln, code = dc_codes[s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        for v in seq[1:]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                bw.put(code, ln)
                run -= 16
            s = _jpeg_size(abs(v))
            ln, code = ac_codes[(run << 4) | s]
            bw.put(code, ln)
            bw.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            ln, code = ac_codes[0x00]
            bw.put(code, ln)

    for my in range(ph // 16):
        for mx in range(pw // 16):
            # the 4:2:0 MCU: 4 luma blocks raster order, then Cb, Cr
            for dy in range(2):
                for dx in range(2):
                    put_block(y, 2 * my + dy, 2 * mx + dx, 0)
            put_block(cbs, my, mx, 1)
            put_block(crs, my, mx, 2)
    ecs = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    comps = bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    sof0 = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + comps)
    dht_dc = seg(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    dht_ac = seg(0xC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    scomps = b"".join(bytes([i + 1, 0x00]) for i in range(3))
    sos = seg(0xDA, b"\x03" + scomps + b"\x00\x3f\x00")
    return (
        b"\xff\xd8" + app0 + dqt + sof0 + dht_dc + dht_ac + sos + ecs
        + b"\xff\xd9"
    )


def _jpeg_decode_420(data: bytes):
    """Decode a 4:2:0 baseline JPEG (luma 0x22 + chroma 0x11); returns
    (w, h, rgb). Nearest-neighbour chroma upsampling; dims that are not
    16-multiples decode the full MCU grid then CROP to the SOF size
    (the partial-MCU rule, T.81 A.2.4). Malformed streams raise
    ValueError (same guard contract as the grayscale decoder)."""
    import struct

    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: no SOI")
    pos = 2
    qt = None
    dims = None
    samp = None
    huff: dict = {}
    scan_tabs = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated marker stream")
        if data[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = data[pos + 1]
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            if not body or body[0] & 0xF0:
                raise ValueError("16-bit quant tables unsupported")
            qt = np.frombuffer(body[1:65], dtype=np.uint8).astype(np.int64)
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 3:
                raise ValueError("4:2:0 decoder: 3 components required")
            samp = [body[6 + 3 * i + 1] for i in range(3)]
            if samp != [0x22, 0x11, 0x11]:
                raise ValueError("not a 4:2:0 scan")
            dims = (w, h)
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xDD:
            raise ValueError(
                "restart intervals unsupported on the 4:2:0 path "
                "(the grayscale decoder implements DRI)"
            )
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                huff[(tc_th >> 4, tc_th & 15)] = _jpeg_decode_table(
                    _jpeg_canonical(bits, vals)
                )
                off += 17 + nvals
        elif marker == 0xDA:
            if dims is None or qt is None:
                raise ValueError("SOS before SOF0/DQT")
            if body[0] != 3:
                raise ValueError("scan component count != frame")
            scan_tabs = [
                (body[2 + 2 * i] >> 4, body[2 + 2 * i] & 15)
                for i in range(body[0])
            ]
            break
        elif marker == 0xD9:
            raise ValueError("EOI before SOS")
    w, h = dims
    if w < 1 or h < 1:
        raise ValueError("empty frame")
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    c = _jpeg_dct_c()
    zz = _jpeg_zigzag()
    rd = _JpegBitReader(data, pos)
    y = np.zeros((ph, pw), dtype=np.uint8)
    cbs = np.zeros((ph // 2, pw // 2), dtype=np.uint8)
    crs = np.zeros((ph // 2, pw // 2), dtype=np.uint8)
    prev = [0, 0, 0]

    def extend(v: int, s: int) -> int:
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def get_block(comp):
        dc_tab = huff[(0, scan_tabs[comp][0])]
        ac_tab = huff[(1, scan_tabs[comp][1])]
        seq = [0] * 64
        s = rd.huff(dc_tab)
        prev[comp] += extend(rd.bits(s), s) if s else 0
        seq[0] = prev[comp]
        k = 1
        while k < 64:
            rs = rd.huff(ac_tab)
            if rs == 0x00:
                break
            if rs == 0xF0:
                k += 16
                continue
            k += rs >> 4
            s = rs & 15
            if k > 63:
                raise ValueError("AC run past block end")
            seq[k] = extend(rd.bits(s), s)
            k += 1
        coefs = np.zeros((8, 8))
        for i, (r, cc) in enumerate(zz):
            coefs[r, cc] = seq[i] * qt[i]
        return np.clip(np.rint(c.T @ coefs @ c + 128.0), 0, 255).astype(
            np.uint8
        )

    for my in range(ph // 16):
        for mx in range(pw // 16):
            for dy in range(2):
                for dx in range(2):
                    by, bx = 2 * my + dy, 2 * mx + dx
                    y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = get_block(0)
            cbs[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = get_block(1)
            crs[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = get_block(2)
    if not data[rd.pos :].startswith(b"\xff\xd9"):
        raise ValueError("missing EOI after scan")
    cb = np.repeat(np.repeat(cbs, 2, axis=0), 2, axis=1)
    cr = np.repeat(np.repeat(crs, 2, axis=0), 2, axis=1)
    rgb = _jpeg_ycbcr_to_rgb(y, cb, cr)
    return w, h, rgb[:h, :w]  # crop the partial-MCU padding


_JPEG_S_TW_MOD = 2  # tiles wide: 1 + n % 2 (tile = 16x16)
_JPEG_S_TH_MOD = 3  # tiles high: 1 + n % 3
_JPEG_S_DX_MOD = 9  # right-edge crop: n % 9 columns (partial MCU)
_JPEG_S_DY_MOD = 13  # bottom-edge crop: n % 13 rows (partial MCU)


def _jpeg_420_roundtrip_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for aid, p in zip(pdf["asset_id"], pdf["payload"]):
            n = len(p)
            src = p if p else b"\x00"
            tw = 1 + n % _JPEG_S_TW_MOD
            th = 1 + n % _JPEG_S_TH_MOD
            vals = np.frombuffer(
                (src * (tw * th // len(src) + 1))[: tw * th], dtype=np.uint8
            ).reshape(th, tw)
            gray = np.kron(vals, np.ones((16, 16), dtype=np.uint8))
            # crop to NON-16-multiple dims: the encoder pads the grid
            # back by edge replication (same tile value, so blocks stay
            # constant and the lossy path stays bit-exact) and the
            # decoder must crop to the SOF size — partial-MCU pinning
            gray = gray[: 16 * th - n % _JPEG_S_DY_MOD,
                        : 16 * tw - n % _JPEG_S_DX_MOD]
            rgb = np.repeat(gray[:, :, None], 3, axis=2)
            w, h, out = _jpeg_decode_420(_jpeg_encode_420(rgb))
            if (h, w) != gray.shape:
                raise ValueError("decode returned uncropped dims")
            flat = out.reshape(-1).astype(np.int64)
            rows.append(
                (
                    aid,
                    w,
                    h,
                    (-(-w // 16)) * (-(-h // 16)),
                    int(out[..., 0].astype(np.int64).sum()),
                    int(
                        (
                            (np.arange(3 * w * h, dtype=np.int64) + 1) * flat
                        ).sum()
                    ),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id", "width", "height", "n_mcus", "y_sum",
                "rgb_checksum",
            ],
        )


@register(
    "mm_jpeg_420_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, strlen(text) AS n,
             1 + strlen(text) % {_JPEG_S_TW_MOD} AS tw,
             1 + strlen(text) % {_JPEG_S_TH_MOD} AS th,
             16 * (1 + strlen(text) % {_JPEG_S_TW_MOD})
               - strlen(text) % {_JPEG_S_DX_MOD} AS w,
             16 * (1 + strlen(text) % {_JPEG_S_TH_MOD})
               - strlen(text) % {_JPEG_S_DY_MOD} AS h
      FROM documents
      WHERE {_ASCII_GUARD_SQL}
    )
    SELECT doc_id AS asset_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(tw * th AS BIGINT) AS n_mcus,
           CAST(list_aggregate(list_transform(range(0, w * h),
               p -> CAST(ord(text[
                   (((p // w) // 16) * tw + ((p % w) // 16)) % n + 1])
                 AS BIGINT)),
               'sum') AS BIGINT) AS y_sum,
           CAST(list_aggregate(list_transform(range(0, 3 * w * h),
               q -> (q + 1) * CAST(ord(text[
                   ((((q // 3) // w) // 16) * tw
                    + (((q // 3) % w) // 16)) % n + 1]) AS BIGINT)),
               'sum') AS BIGINT) AS rgb_checksum
    FROM d
    """,
)
def mm_jpeg_420_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 4:2:0 SUBSAMPLED baseline-JPEG path under the oracle gate,
    now with PARTIAL MCUs: gray 16x16-tile-constant planes are CROPPED
    to non-16-multiple dims (n%9 columns, n%13 rows off the edges), so
    the encoder must pad the MCU grid by edge replication (which keeps
    every block constant — the lossy path stays bit-exact) and the
    decoder must crop back to the SOF size. Chroma box-downsample ->
    6-block MCU interleave -> entropy -> nearest upsample -> color
    convert all pinned by the closed-form SQL (a luma-block raster
    slip, predictor mix-up, or off-by-one crop breaks the hash)."""
    return _ascii_assets(spark, sf_dir).mapInPandas(
        _jpeg_420_roundtrip_batches,
        schema=(
            "asset_id long, width long, height long, n_mcus long,"
            " y_sum long, rgb_checksum long"
        ),
    )


# ---------------------------------------------------------------------------
# PERCEPTUAL-HASH near-dup detection (VERDICT r13 #4) — MinHash-LSH's
# multimodal twin: dHash over the DECODED pixel plane (the real PNG
# path: encode → CRC chunk walk → inflate → un-filter → pixels), then
# a band-bucketed Hamming join instead of the quadratic all-pairs
# scan.
#
# dHash (the published difference-hash recipe): area-mean downsample
# the plane to an 8×8 grid (integer means — exact in both engines),
# then one bit per horizontally-adjacent cell pair (cell > right
# neighbour), 8 rows × 7 comparisons = 56 bits. Integer end to end,
# so the full-value-hash oracle gate applies.
#
# Near-dup ground truth is constructed, not hoped for: every asset
# ships with a PERTURBED TWIN (every 37th payload byte replaced —
# the re-encoded-thumbnail stand-in), whose plane differs in a few
# pixels and whose dHash lands within a few bits.
#
# EXACT recall by pigeonhole: 56 bits split into 8 bands of 7; a pair
# at Hamming distance ≤ 7 cannot differ in all 8 bands, so it
# collides on at least one band bucket — the banded join finds every
# qualifying pair, then the exact bit_count(xor) filter is the truth
# (candidates are a superset; the verify is JVM-side codegen). At
# 100 TB the band join is the scale path: candidate volume is
# Σ_bucket |bucket|², governed by band width — the same recall/cost
# dial as MinHash-LSH's (bands, rows) — while the quadratic scan the
# oracle runs is O(n²) and exists only as the sf0.01 truth.
#
# Dims guard: the 8×8 grid needs w ≥ 8 and h ≥ 8 (no empty area
# blocks), i.e. payload length % 16 ≥ 4 and % 12 ≥ 6 — applied
# identically in the oracle.
# ---------------------------------------------------------------------------
_PHASH_STEP = 37  # twin perturbation stride (bytes)
_PHASH_MAXH = 7   # Hamming threshold; = bands - 1 → pigeonhole-exact


def _dhash_plane(plane) -> int:
    """56-bit dHash of an (h, w) uint8 plane: integer area means on an
    8×8 grid, row-wise gradient bits."""
    import numpy as np

    h, w = plane.shape
    p = plane.astype(np.int64)
    cells = [[0] * 8 for _ in range(8)]
    for r in range(8):
        y0, y1 = r * h // 8, (r + 1) * h // 8
        for c in range(8):
            x0, x1 = c * w // 8, (c + 1) * w // 8
            blk = p[y0:y1, x0:x1]
            cells[r][c] = int(blk.sum()) // blk.size
    out = 0
    for r in range(8):
        for c in range(7):
            if cells[r][c] > cells[r][c + 1]:
                out |= 1 << (r * 7 + c)
    return out


def _phash_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, hashes = [], []
        for i, payload in zip(pdf["asset_id"], pdf["payload"]):
            b = bytes(payload)
            tw = bytearray(b)
            tw[::_PHASH_STEP] = b"x" * len(tw[::_PHASH_STEP])
            for v, data in ((0, b), (1, bytes(tw))):
                _, _, plane = _png_decode_plane(_png_build(data))
                ids.append(int(i) * 2 + v)
                hashes.append(_dhash_plane(plane))
        yield pd.DataFrame({"asset_id": ids, "dhash": hashes})


def _phash_duck_pix(v: str, ii: str) -> str:
    """DuckDB pixel expression: variant *v*'s plane value at in-block
    offset *ii* (block geometry columns y0/x0/bw in scope)."""
    j = f"(((y0 + ({ii}) // bw) * w + x0 + ({ii}) % bw) % n)"
    return (
        f"CASE WHEN {v} = 1 AND {j} % {_PHASH_STEP} = 0 THEN 120 "
        f"ELSE ord(text[{j} + 1]) END"
    )


@register(
    "mm_phash_dedup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, strlen(text) AS n,
             4 + strlen(text) % {_PNG_W_MOD} AS w,
             2 + strlen(text) % {_PNG_H_MOD} AS h
      FROM documents
      WHERE {_ASCII_GUARD_SQL}
        AND strlen(text) % {_PNG_H_MOD} >= 6
        AND strlen(text) % {_PNG_W_MOD} >= 4
    ),
    a AS (
      SELECT doc_id * 2 + v AS aid, v, text, n, w, h
      FROM d, (VALUES (0), (1)) t(v)
    ),
    cells AS (
      SELECT aid, rc // 8 AS r, rc % 8 AS c,
             list_aggregate(list_transform(range(0, bs),
                 ii -> {_phash_duck_pix('v', 'ii')}), 'sum') // bs AS m
      FROM a,
           LATERAL (SELECT unnest(range(0, 64)) AS rc) u,
           LATERAL (SELECT (rc // 8 * h) // 8 AS y0,
                           ((rc // 8 + 1) * h) // 8 AS y1,
                           (rc % 8 * w) // 8 AS x0,
                           ((rc % 8 + 1) * w) // 8 AS x1) g,
           LATERAL (SELECT x1 - x0 AS bw,
                           (y1 - y0) * (x1 - x0) AS bs) s
    ),
    hashes AS (
      SELECT l.aid,
             CAST(SUM(CASE WHEN l.m > r2.m
                           THEN 1::BIGINT << (l.r * 7 + l.c)
                           ELSE 0 END) AS BIGINT) AS dhash
      FROM cells l
      JOIN cells r2 ON l.aid = r2.aid AND l.r = r2.r AND r2.c = l.c + 1
      WHERE l.c < 7
      GROUP BY l.aid
    )
    SELECT p.aid AS a, q.aid AS b,
           CAST(bit_count(xor(p.dhash, q.dhash)) AS BIGINT) AS hamming
    FROM hashes p JOIN hashes q ON p.aid < q.aid
    WHERE bit_count(xor(p.dhash, q.dhash)) <= {_PHASH_MAXH}
    ORDER BY a, b
    """,
)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = _ascii_assets(spark, sf_dir).filter(
        (F.octet_length("payload") % _PNG_H_MOD >= 6)
        & (F.octet_length("payload") % _PNG_W_MOD >= 4)
    )
    hashes = assets.mapInPandas(
        _phash_batches, schema="asset_id long, dhash long"
    )
    # 8 bands × 7 bits: the LSH bucketing whose collision is exact for
    # Hamming ≤ 7 (pigeonhole); candidates dedup through distinct()
    bands = hashes.select(
        "asset_id",
        "dhash",
        F.explode(
            F.array(
                *(
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright(F.col("dhash"), 7 * b)
                            % F.lit(128)
                        ).alias("bval"),
                    )
                    for b in range(8)
                )
            )
        ).alias("bb"),
    ).select(
        "asset_id", "dhash", F.col("bb.band").alias("band"),
        F.col("bb.bval").alias("bval"),
    )
    x = bands.select(
        F.col("asset_id").alias("a"),
        F.col("dhash").alias("ha"),
        "band",
        "bval",
    )
    y = bands.select(
        F.col("asset_id").alias("b"),
        F.col("dhash").alias("hb"),
        "band",
        "bval",
    )
    cand = (
        x.join(y, ["band", "bval"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(
                F.col("ha").bitwiseXOR(F.col("hb"))
            ).cast("long"),
        )
        .filter(F.col("hamming") <= _PHASH_MAXH)
        .select("a", "b", "hamming")
        .orderBy("a", "b")
    )
