"""Avro Object Container File connector — the binary encoding AND the
container implemented from scratch (Apache Avro 1.11 spec), because the
sandbox has no spark-avro jar: the point is the same as the Kafka wire
twin (sources/kafka_wire.py) — the FORMAT is engine logic and fully
testable; only the vendor artifact is environmental.

Spec surface implemented (all of it exercised by the round-trip):
* primitives — ``long``/``int`` as ZIGZAG VARINTS (the encoding's
  signature quirk: (n << 1) ^ (n >> 63), little-endian 7-bit groups,
  high bit = continuation), ``double`` as 8-byte IEEE LE, ``string``
  as varint byte-length + UTF-8;
* records — fields concatenated in schema order, no tags;
* the CONTAINER — magic ``Obj\\x01``, a metadata map (avro.schema JSON
  + avro.codec) encoded as the spec's block-form map, a random 16-byte
  sync marker, then data blocks of (row count varint, byte size
  varint, payload, sync) — the sync marker after EVERY block is what
  makes OCF splittable, and the reader verifies each one;
* ``deflate`` codec — raw DEFLATE (zlib wbits=-15, no zlib header —
  a real-world interop trap) and ``null`` passthrough.

Writer: executor-side ``foreachPartition`` — each task writes one
shard OCF; nothing but paths touches the driver. Reader: a Python
DataSource with one InputPartition per shard.

Limits, honestly: no schema-resolution/evolution (reader schema ==
writer schema; the table-format module shows the evolution discipline),
no snappy (not in the stdlib), and like every Python DataSource, no
filter pushdown into the source — at scale you convert to parquet for
queryable storage (the arrow_ipc note).
"""

from __future__ import annotations

import glob
import io
import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from fluent_bit_filter_math_spark.registry import register

_MAGIC = b"Obj\x01"

# the fixture schema this connector ships (field order is the wire
# format — records carry no tags)
_FIELDS = (
    ("event_id", "long"),
    ("user_id", "long"),
    ("event_type", "string"),
    ("cents", "long"),
)
_SCHEMA_JSON = json.dumps(
    {
        "type": "record",
        "name": "Event",
        "fields": [{"name": n, "type": t} for n, t in _FIELDS],
    }
)


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    z = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")
    return (z >> 1) ^ -(z & 1), pos


def _enc_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return _zigzag_encode(len(b)) + b


def _enc_row(row) -> bytes:
    out = bytearray()
    for name, typ in _FIELDS:
        v = row[name]
        if typ == "long":
            out += _zigzag_encode(int(v))
        elif typ == "double":
            out += struct.pack("<d", float(v))
        else:
            out += _enc_string(str(v))
    return bytes(out)


def _dec_row(buf: bytes, pos: int) -> tuple[tuple, int]:
    vals = []
    for _, typ in _FIELDS:
        if typ == "long":
            v, pos = _zigzag_decode(buf, pos)
        elif typ == "double":
            (v,) = struct.unpack_from("<d", buf, pos)
            pos += 8
        else:
            n, pos = _zigzag_decode(buf, pos)
            if n < 0 or pos + n > len(buf):
                raise ValueError("bad string length")
            v = buf[pos : pos + n].decode("utf-8")
            pos += n
        vals.append(v)
    return tuple(vals), pos


def _enc_meta_map(meta: dict) -> bytes:
    # spec block-form map: one block of N entries, then the 0 terminator
    out = bytearray(_zigzag_encode(len(meta)))
    for k, v in meta.items():
        out += _enc_string(k)
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)
    return bytes(out)


def _dec_meta_map(buf: bytes, pos: int) -> tuple[dict, int]:
    meta = {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            return meta, pos
        if n < 0:  # negative block count: size follows (spec)
            _, pos = _zigzag_decode(buf, pos)
            n = -n
        for _ in range(n):
            klen, pos = _zigzag_decode(buf, pos)
            k = buf[pos : pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = _zigzag_decode(buf, pos)
            meta[k] = buf[pos : pos + vlen]
            pos += vlen


def write_ocf_shard(
    path: str, rows: list, codec: str = "deflate", rows_per_block: int = 1000
) -> None:
    """One spec-valid OCF file from already-encoded row dicts."""
    import hashlib

    # deterministic per path (re-runnable writes produce identical
    # bytes — task-retry friendly); the marker only needs to be
    # consistent within one file, the reader learns it from the header
    sync = hashlib.md5(path.encode()).digest()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(
            _enc_meta_map(
                {
                    "avro.schema": _SCHEMA_JSON.encode(),
                    "avro.codec": codec.encode(),
                }
            )
        )
        f.write(sync)
        for lo in range(0, len(rows), rows_per_block):
            chunk = rows[lo : lo + rows_per_block]
            payload = b"".join(_enc_row(r) for r in chunk)
            if codec == "deflate":
                payload = zlib.compress(payload, 6)[2:-4]  # raw: strip
                # zlib header+adler — the OCF deflate interop rule
            f.write(_zigzag_encode(len(chunk)))
            f.write(_zigzag_encode(len(payload)))
            f.write(payload)
            f.write(sync)


def read_ocf_file(path: str):
    """Yield decoded row tuples from one OCF file, verifying magic,
    metadata, codec, and EVERY block's sync marker."""
    buf = open(path, "rb").read()
    if buf[:4] != _MAGIC:
        raise ValueError("not an Avro OCF: bad magic")
    meta, pos = _dec_meta_map(buf, 4)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode())
    names = [f["name"] for f in schema["fields"]]
    if names != [n for n, _ in _FIELDS]:
        raise ValueError("reader schema != writer schema")
    sync = buf[pos : pos + 16]
    pos += 16
    while pos < len(buf):
        count, pos = _zigzag_decode(buf, pos)
        size, pos = _zigzag_decode(buf, pos)
        payload = buf[pos : pos + size]
        if len(payload) != size:
            raise ValueError("truncated block")
        pos += size
        if buf[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        p = 0
        for _ in range(count):
            row, p = _dec_row(payload, p)
            yield row
        if p != len(payload):
            raise ValueError("block decoded to wrong byte count")


class _OcfShard(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AvroOCFReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro_ocf requires option 'path'")

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.path, "*.avro")))
        if not files:
            raise FileNotFoundError(f"no .avro shards under {self.path}")
        return [_OcfShard(f) for f in files]

    def read(self, partition: _OcfShard):
        yield from read_ocf_file(partition.path)


class AvroOCFDataSource(DataSource):
    """``spark.read.format("avro_ocf").option("path", dir)``"""

    @classmethod
    def name(cls) -> str:
        return "avro_ocf"

    def schema(self):
        return "event_id long, user_id long, event_type string, cents long"

    def reader(self, schema):
        return AvroOCFReader(self.options)


def register_avro_ocf(spark: SparkSession) -> None:
    spark.dataSource.register(AvroOCFDataSource)


def write_ocf(df: DataFrame, out_dir: str, codec: str = "deflate") -> None:
    """Executor-side sharded OCF write: each partition streams its rows
    into one container file (foreachPartition — no data to the
    driver)."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(rows) -> None:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        chunk = [r.asDict() for r in rows]
        if not chunk:
            return
        write_ocf_shard(
            os.path.join(out_dir, f"part-{pid:05d}.avro"), chunk, codec
        )

    df.foreachPartition(_write)


@register(
    "io_avro_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS cents_sum,
           CAST(SUM(event_id) AS BIGINT) AS id_sum,
           CAST(SUM(user_id) AS BIGINT) AS uid_sum
    FROM events
    WHERE event_id % 6 = 3
    GROUP BY event_type ORDER BY event_type
    """,
)
def io_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-invisible Avro OCF round-trip under the oracle gate: an
    events subset is encoded to deflate OCF shards by the executors,
    read back through the from-scratch container reader (zigzag
    varints, block+sync walk, raw-DEFLATE), and aggregated — the SQL
    sees only the original table, so any codec bug breaks the hash.
    Reference analogue: input plugins beyond `mem` (test.sh:15)."""
    import pyspark.sql.functions as F

    from fluent_bit_filter_math_spark.functions import exact_cents
    from fluent_bit_filter_math_spark.scratch import scratch_dir
    from fluent_bit_filter_math_spark.sources import table

    register_avro_ocf(spark)
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 6 == 3)
        .select(
            "event_id",
            "user_id",
            "event_type",
            exact_cents(F.col("value")).alias("cents"),
        )
        .repartition(4)
    )
    out = os.path.join(scratch_dir("avro-ocf"), "shards")
    write_ocf(ev, out, codec="deflate")
    back = spark.read.format("avro_ocf").option("path", out).load()
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("cents_sum"),
            F.sum("event_id").cast("long").alias("id_sum"),
            F.sum("user_id").cast("long").alias("uid_sum"),
        )
        .orderBy("event_type")
    )
