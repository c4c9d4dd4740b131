"""Round 13c: the from-scratch Snappy codec (sources/snappy_codec.py),
its Avro OCF integration (snappy block + big-endian CRC32 framing), and
multi-non-null union ENCODING (the type-witness branch selector that
closes the last documented Avro encode gap).
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import reader_rows
from fluent_bit_filter_math_spark.sources import snappy_codec
from fluent_bit_filter_math_spark.sources.avro_ocf import (
    _enc_any,
    _enc_string,
    _zigzag_encode,
    read_ocf_file,
    write_ocf_shard,
)


class TestSnappyFormat:
    """Wire-format vectors hand-decoded from format_description.txt."""

    def test_literal_vector(self):
        # preamble 5, literal tag (len-1)<<2, payload
        assert snappy_codec.decompress(b"\x05\x10abcde") == b"abcde"

    def test_overlapping_copy_vector(self):
        # 'a' then a 1-byte-offset copy of len 9 at offset 1 — the
        # LZ77 run-extension: output must be 'a'*10
        assert snappy_codec.decompress(b"\x0a\x00a\x15\x01") == b"a" * 10

    def test_two_byte_offset_copy_vector(self):
        # literal 'ab', copy len 2 offset 2 (tag (2-1)<<2|2 = 0x06)
        assert (
            snappy_codec.decompress(b"\x04\x04ab\x06\x02\x00") == b"abab"
        )

    def test_four_byte_offset_copy_accepted(self):
        # same copy in the rare 4-byte-offset form (tag |3)
        assert (
            snappy_codec.decompress(b"\x04\x04ab\x07\x02\x00\x00\x00")
            == b"abab"
        )

    def test_empty_input(self):
        assert snappy_codec.decompress(snappy_codec.compress(b"")) == b""

    @pytest.mark.parametrize(
        "bad,why",
        [
            (b"", "no preamble"),
            (b"\x05\x10abcd", "truncated literal"),
            (b"\x03\x00a\x15\x01", "overruns declared length"),
            (b"\x05\x10abcdeX", "trailing element truncated"),
            (b"\x02\x00a\x05\x00", "zero copy offset"),
            (b"\x04\x00a\x05\x09", "offset before stream start"),
            (b"\x06\x10abcde", "decodes short of declared length"),
        ],
    )
    def test_strictness(self, bad, why):
        with pytest.raises(ValueError):
            snappy_codec.decompress(bad)

    def test_compresses_repetitive_data(self):
        data = b"the quick brown fox jumps over the lazy dog " * 2000
        z = snappy_codec.compress(data)
        assert len(z) < len(data) // 4
        assert snappy_codec.decompress(z) == data

    def test_incompressible_data_bounded_expansion(self):
        data = os.urandom(100_000)
        z = snappy_codec.compress(data)
        # all-literal worst case: preamble + ~3 bytes per 64 KiB chunk
        assert len(z) <= len(data) + 16
        assert snappy_codec.decompress(z) == data

    def test_cross_block_independence(self):
        # >64 KiB: matches never cross the 64 KiB block boundary, and
        # the roundtrip must survive the block seam
        data = (b"abcdefgh" * 10_000)[: (1 << 16) + 1234]
        assert snappy_codec.decompress(snappy_codec.compress(data)) == data

    @settings(max_examples=60, deadline=None)
    @given(
        st.binary(max_size=3000)
        | st.from_regex(rb"(ab|cde|fg hij)+", fullmatch=True).map(
            lambda b: b[:5000]
        )
    )
    def test_roundtrip_property(self, data):
        assert snappy_codec.decompress(snappy_codec.compress(data)) == data

    def test_deterministic(self):
        data = b"determinism matters for task retries " * 500
        assert snappy_codec.compress(data) == snappy_codec.compress(data)


class TestAvroSnappyCodec:
    SCHEMA = json.dumps(
        {
            "type": "record",
            "name": "R",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "s", "type": "string"},
            ],
        }
    )

    def _rows(self, n=2000):
        return [{"k": i, "s": f"row-{i % 7}"} for i in range(n)]

    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "t.avro")
        write_ocf_shard(p, self._rows(), codec="snappy", schema_json=self.SCHEMA)
        assert list(read_ocf_file(p)) == [(i, f"row-{i % 7}") for i in range(2000)]

    def test_crc_is_big_endian_of_uncompressed(self, tmp_path):
        # frame one block by hand and read it back: payload must be
        # snappy(data) + CRC32(data) big-endian — flipping to the
        # little-endian CRC must fail
        p = str(tmp_path / "t.avro")
        write_ocf_shard(
            p, self._rows(50), codec="snappy", schema_json=self.SCHEMA
        )
        buf = bytearray(open(p, "rb").read())
        # locate the block payload: header ends at sync start; easier:
        # corrupt the last 4 bytes before the trailing sync (the CRC)
        buf[-17] ^= 0x01
        open(p, "wb").write(bytes(buf))
        with pytest.raises(ValueError, match="CRC|corrupt|sync"):
            list(read_ocf_file(p))

    def test_corrupt_compressed_body_raises(self, tmp_path):
        p = str(tmp_path / "t.avro")
        write_ocf_shard(
            p, self._rows(500), codec="snappy", schema_json=self.SCHEMA
        )
        buf = bytearray(open(p, "rb").read())
        buf[len(buf) // 2] ^= 0xFF
        open(p, "wb").write(bytes(buf))
        with pytest.raises(ValueError):
            list(read_ocf_file(p))

    def test_unknown_codec_rejected(self, tmp_path):
        p = str(tmp_path / "t.avro")
        with pytest.raises(ValueError, match="unsupported codec"):
            write_ocf_shard(
                p, self._rows(1), codec="zstd", schema_json=self.SCHEMA
            )

    def test_schema_resolution_composes_with_snappy(self, tmp_path):
        # reader schema adds a defaulted field over a snappy file —
        # resolution and the codec are orthogonal layers
        p = str(tmp_path / "t.avro")
        write_ocf_shard(
            p, self._rows(10), codec="snappy", schema_json=self.SCHEMA
        )
        reader = {
            "type": "record",
            "name": "R",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "s", "type": "string"},
                {"name": "extra", "type": "long", "default": -1},
            ],
        }
        rows = list(read_ocf_file(p, reader_schema=reader))
        assert rows[0] == (0, "row-0", -1)


class TestMultiBranchUnionEncode:
    U = ["null", "long", "string"]

    def test_branch_selection_vectors(self):
        assert _enc_any(self.U, None) == _zigzag_encode(0)
        assert _enc_any(self.U, 5) == _zigzag_encode(1) + _zigzag_encode(5)
        assert _enc_any(self.U, "x") == _zigzag_encode(2) + _enc_string("x")

    def test_bool_never_rides_int(self):
        u = ["long", "boolean"]
        assert _enc_any(u, True) == _zigzag_encode(1) + b"\x01"
        assert _enc_any(u, 3) == _zigzag_encode(0) + _zigzag_encode(3)

    def test_first_accepting_branch_wins(self):
        # both branches accept an int — union order decides
        u = ["long", "int"]
        assert _enc_any(u, 7) == _zigzag_encode(0) + _zigzag_encode(7)

    def test_no_branch_raises(self):
        with pytest.raises(ValueError, match="no union branch"):
            _enc_any(self.U, 1.5)
        with pytest.raises(ValueError, match="no union branch"):
            _enc_any(["long", "string"], None)

    def test_enum_and_fixed_witnesses(self):
        enum = {"type": "enum", "name": "E", "symbols": ["A", "B"]}
        fixed = {"type": "fixed", "name": "F", "size": 2}
        u = [enum, "string"]
        # a symbol matches the enum branch first; a non-symbol string
        # falls through to the string branch
        assert _enc_any(u, "B") == _zigzag_encode(0) + _zigzag_encode(1)
        assert _enc_any(u, "zz") == _zigzag_encode(1) + _enc_string("zz")
        u2 = [fixed, "bytes"]
        assert _enc_any(u2, b"ab") == _zigzag_encode(0) + b"ab"
        assert _enc_any(u2, b"abc") == _zigzag_encode(1) + _zigzag_encode(
            3
        ) + b"abc"

    def test_record_vs_map_witness(self):
        rec = {
            "type": "record",
            "name": "P",
            "fields": [{"name": "x", "type": "long"}],
        }
        u = [rec, {"type": "map", "values": "long"}]
        # covers the record's fields → record branch
        assert _enc_any(u, {"x": 1}).startswith(_zigzag_encode(0))
        # missing the record field → map branch
        assert _enc_any(u, {"y": 1}).startswith(_zigzag_encode(1))

    def test_logical_type_witnesses(self):
        u = [
            {"type": "int", "logicalType": "date"},
            {"type": "long", "logicalType": "timestamp-micros"},
            {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": 9,
                "scale": 2,
            },
            "string",
        ]
        assert _enc_any(u, datetime.date(1970, 1, 2)) == _zigzag_encode(
            0
        ) + _zigzag_encode(1)
        assert _enc_any(
            u, datetime.datetime(1970, 1, 1, 0, 0, 1)
        ) == _zigzag_encode(1) + _zigzag_encode(1_000_000)
        assert _enc_any(u, decimal.Decimal("1.00")).startswith(
            _zigzag_encode(2)
        )
        assert _enc_any(u, "s") == _zigzag_encode(3) + _enc_string("s")

    def test_container_roundtrip_three_branches(self, tmp_path):
        schema = {
            "type": "record",
            "name": "R",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "mix", "type": ["null", "long", "string"]},
            ],
        }
        rows = [
            {
                "k": i,
                "mix": (None, i, f"s{i}")[i % 3],
            }
            for i in range(300)
        ]
        p = str(tmp_path / "u.avro")
        write_ocf_shard(
            p, rows, codec="snappy", schema_json=json.dumps(schema)
        )
        back = list(read_ocf_file(p))
        assert back == [(i, (None, i, f"s{i}")[i % 3]) for i in range(300)]


import pyspark.sql.functions as F

from fluent_bit_filter_math_spark.sources.table_format import (
    ConcurrentOverwrite,
    TableFormatCdfStreamReader,
    _log_path,
    _resolve,
    latest_version,
    tf_append,
    tf_changes,
    tf_delete,
    tf_overwrite,
    tf_read,
    tf_restore,
    tf_vacuum,
    write_checkpoint,
)


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )


def _data_files(t):
    out = []
    for root, _, files in os.walk(t):
        if "_log" in root or "_dv" in root:
            continue
        out.extend(f for f in files if f.endswith(".parquet"))
    return sorted(out)


class TestTfRestore:
    def test_restore_undoes_overwrite_sharing_files(self, spark, tmp_path):
        t = str(tmp_path / "r1")
        tf_append(_mk(spark, 0, 100).coalesce(1), t)          # v0
        tf_append(_mk(spark, 100, 200).coalesce(1), t)        # v1
        tf_overwrite(_mk(spark, 0, 10).coalesce(1), t)        # v2
        before = _data_files(t)
        v = tf_restore(t, 1)                                  # v3
        assert v == 3
        # metadata-only: not one data file was written
        assert _data_files(t) == before
        assert tf_read(spark, t).count() == 200
        # all interim versions stay time-travelable
        assert tf_read(spark, t, version=2).count() == 10
        assert tf_read(spark, t, version=1).count() == 200

    def test_restore_detaches_and_reattaches_dv(self, spark, tmp_path):
        t = str(tmp_path / "r2")
        tf_append(_mk(spark, 0, 100).coalesce(1), t)          # v0
        tf_delete(spark, t, [("k", ">=", 80)])                # v1
        assert tf_read(spark, t).count() == 80
        tf_restore(t, 0)                                      # v2: undelete
        assert tf_read(spark, t).count() == 100
        tf_restore(t, 1)                                      # v3: re-delete
        assert tf_read(spark, t).count() == 80
        got = {dv is not None for _, _, dv in _resolve(t, 3)[0]}
        assert got == {True}

    def test_restore_to_head_is_noop(self, spark, tmp_path):
        t = str(tmp_path / "r3")
        tf_append(_mk(spark, 0, 10).coalesce(1), t)
        head = latest_version(t)
        assert tf_restore(t, head) == head
        assert latest_version(t) == head

    def test_restore_validates_version(self, spark, tmp_path):
        t = str(tmp_path / "r4")
        tf_append(_mk(spark, 0, 10).coalesce(1), t)
        with pytest.raises(ValueError, match="outside"):
            tf_restore(t, 5)
        with pytest.raises(ValueError, match="outside"):
            tf_restore(t, -1)
        with pytest.raises(FileNotFoundError):
            tf_restore(str(tmp_path / "absent"), 0)

    def test_restore_to_vacuumed_version_raises_before_publish(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "r5")
        tf_append(_mk(spark, 0, 100).coalesce(1), t)          # v0
        tf_overwrite(_mk(spark, 0, 10).coalesce(1), t)        # v1
        tf_vacuum(t, keep_from_version=1)
        head = latest_version(t)
        with pytest.raises(ValueError, match="vacuumed"):
            tf_restore(t, 0)
        assert latest_version(t) == head  # nothing was published

    def test_concurrent_commit_raises(self, spark, tmp_path, monkeypatch):
        """An interloper landing between the restore's head read and
        its publish takes the slot — the restore must raise, because
        its diff was computed against a live set that just changed."""
        import fluent_bit_filter_math_spark.sources.table_format as tfm

        t = str(tmp_path / "r6")
        tf_append(_mk(spark, 0, 100).coalesce(1), t)          # v0
        tf_overwrite(_mk(spark, 0, 10).coalesce(1), t)        # v1
        head = latest_version(t)
        # the interloper's commit exists by publish time, but the
        # restore's head read predates it (stale by one)
        with open(_log_path(t, head + 1), "x") as f:
            f.write(
                '{"version": %d, "action": "append", "add": [], '
                '"remove": [], "schema": ""}' % (head + 1)
            )
        monkeypatch.setattr(tfm, "latest_version", lambda p: head)
        with pytest.raises(ConcurrentOverwrite):
            tf_restore(t, 0)

    def test_mixed_generation_restore_keeps_per_file_schema(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "r7")
        tf_append(_mk(spark, 0, 50).coalesce(1), t)           # v0: (k, v)
        wide = _mk(spark, 50, 100).withColumn("extra", F.lit(7))
        tf_append(wide.coalesce(1), t)                        # v1: evolved
        tf_overwrite(_mk(spark, 0, 5).coalesce(1), t)         # v2
        v = tf_restore(t, 1)                                  # v3
        _, _, evolved = _resolve(t, v)
        assert evolved  # both writer schemas survived the restore
        df = tf_read(spark, t)
        assert df.count() == 100
        # old-generation rows NULL-fill the evolved column
        assert (
            df.filter(F.col("extra").isNull()).count() == 50
        )

    def test_cdf_of_restore_dead_and_revived(self, spark, tmp_path):
        t = str(tmp_path / "r8")
        tf_append(_mk(spark, 0, 100).coalesce(1), t)          # v0
        tf_delete(spark, t, [("k", ">=", 90)])                # v1
        tf_restore(t, 0)                                      # v2: revive 10
        tf_restore(t, 1)                                      # v3: re-hide 10
        ch = tf_changes(spark, t, 2, 3)
        by = {
            (r["_commit_version"], r["_change_type"]): r["n"]
            for r in ch.groupBy("_commit_version", "_change_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert by == {(2, "insert"): 10, (3, "delete"): 10}

    def test_cdf_stream_reader_restore_parity(self, spark, tmp_path):
        """The changefeed STREAM over a restore-bearing log emits the
        same (version, kind, key) set as batch tf_changes."""
        t = str(tmp_path / "r9")
        tf_append(_mk(spark, 0, 60).coalesce(1), t)           # v0
        tf_delete(spark, t, [("k", "<", 10)])                 # v1
        tf_overwrite(_mk(spark, 1000, 1020).coalesce(1), t)   # v2
        tf_restore(t, 1)                                      # v3
        r = TableFormatCdfStreamReader({"path": t})
        rows = []
        for p in r.partitions({"version": 2}, {"version": 3}):
            rows.extend(reader_rows(r, p))
        got = {(v, ct, vals[0]) for *vals, ct, v in rows}
        want = {
            (r["_commit_version"], r["_change_type"], r["k"])
            for r in tf_changes(spark, t, 3, 3).collect()
        }
        assert got == want
        # the restore re-adds the original file WITH its DV: keys 0-9
        # must not be re-inserted
        assert (3, "insert", 5) not in got
        assert (3, "insert", 15) in got
        assert (3, "delete", 1005) in got

    def test_restore_checkpoint_equivalence(self, spark, tmp_path):
        """Resolution through the post-restore checkpoint equals raw
        replay (checkpoints are pure accelerators)."""
        import glob as _glob

        t = str(tmp_path / "r10")
        tf_append(_mk(spark, 0, 100).coalesce(1), t)
        tf_delete(spark, t, [("k", ">=", 50)])
        tf_overwrite(_mk(spark, 0, 5).coalesce(1), t)
        v = tf_restore(t, 1)
        with_ckpt = sorted(
            (rel, dv) for rel, _, dv in _resolve(t, v)[0]
        )
        for p in _glob.glob(os.path.join(t, "_log", "*.checkpoint.json")):
            os.remove(p)
        assert (
            sorted((rel, dv) for rel, _, dv in _resolve(t, v)[0])
            == with_ckpt
        )

    def test_plain_stream_source_refuses_restore(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            TableFormatStreamReader,
        )

        t = str(tmp_path / "r11")
        tf_append(_mk(spark, 0, 10).coalesce(1), t)
        tf_overwrite(_mk(spark, 0, 5).coalesce(1), t)
        tf_restore(t, 0)
        r = TableFormatStreamReader({"path": t})
        with pytest.raises(ValueError):
            r.partitions({"version": -1}, {"version": 2})


class TestTfUpdate:
    def _table(self, spark, tmp_path, name):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_update,
        )

        t = str(tmp_path / name)
        tf_append(_mk(spark, 0, 100).coalesce(1), t)
        tf_append(_mk(spark, 100, 200).coalesce(1), t)
        return t

    def test_update_hides_and_replaces_in_one_commit(
        self, spark, tmp_path
    ):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_update,
        )

        t = self._table(spark, tmp_path, "u1")
        v, dvd, n = tf_update(
            spark, t, [("k", ">=", 150)], {"v": F.col("v") + 1000}
        )
        assert (v, dvd, n) == (2, 1, 50)
        df = tf_read(spark, t)
        assert df.count() == 200  # row count conserved
        assert df.filter(F.col("k") >= 150).agg(
            F.min("v")
        ).collect()[0][0] == 150 * 3 + 1000
        # untouched rows unchanged; time travel sees the old values
        assert (
            tf_read(spark, t, version=1)
            .filter(F.col("k") == 150)
            .collect()[0]["v"]
            == 450
        )

    def test_update_chases_rows_into_new_files(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_update,
        )

        t = self._table(spark, tmp_path, "u2")
        tf_update(spark, t, [("k", ">=", 190)], {"v": F.col("v") + 1})
        v, dvd, n = tf_update(
            spark, t, [("k", ">=", 180)], {"v": F.col("v") + 1}
        )
        # second update touches the original file (180..189) AND the
        # first update's new file (190..199, already bumped once)
        assert dvd == 2 and n == 20
        vals = {
            r["k"]: r["v"]
            for r in tf_read(spark, t)
            .filter(F.col("k") >= 180)
            .collect()
        }
        assert vals[185] == 185 * 3 + 1
        assert vals[195] == 195 * 3 + 2

    def test_zero_match_is_noop(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_update,
        )

        t = self._table(spark, tmp_path, "u3")
        head = latest_version(t)
        assert tf_update(
            spark, t, [("k", ">", 10_000)], {"v": F.lit(0)}
        ) == (head, 0, 0)
        assert latest_version(t) == head

    def test_unknown_set_column_raises(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_update,
        )

        t = self._table(spark, tmp_path, "u4")
        with pytest.raises(ValueError, match="unknown column"):
            tf_update(spark, t, [("k", ">=", 0)], {"nope": F.lit(1)})

    def test_update_skips_already_deleted_rows(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_update,
        )

        t = self._table(spark, tmp_path, "u5")
        tf_delete(spark, t, [("k", ">=", 190)])
        v, dvd, n = tf_update(
            spark, t, [("k", ">=", 180)], {"v": F.lit(-1)}
        )
        assert n == 10  # 180..189 only: deleted rows never update
        df = tf_read(spark, t)
        assert df.count() == 190
        assert df.filter(F.col("v") == -1).count() == 10

    def test_concurrent_commit_raises(self, spark, tmp_path, monkeypatch):
        import fluent_bit_filter_math_spark.sources.table_format as tfm
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_update,
        )

        t = self._table(spark, tmp_path, "u6")
        head = latest_version(t)
        with open(_log_path(t, head + 1), "x") as f:
            f.write(
                '{"version": %d, "action": "append", "add": [], '
                '"remove": [], "schema": ""}' % (head + 1)
            )
        monkeypatch.setattr(tfm, "latest_version", lambda p: head)
        with pytest.raises(ConcurrentOverwrite):
            tf_update(spark, t, [("k", ">=", 0)], {"v": F.lit(0)})

    def test_cdf_emits_pre_and_postimage(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            TableFormatCdfStreamReader,
            tf_update,
        )

        t = self._table(spark, tmp_path, "u7")
        v, _, _ = tf_update(
            spark, t, [("k", ">=", 195)], {"v": F.col("v") * 10}
        )
        ch = tf_changes(spark, t, v, v)
        by = {}
        for r in ch.collect():
            by.setdefault(r["_change_type"], {})[r["k"]] = r["v"]
        assert set(by) == {"update_preimage", "update_postimage"}
        assert by["update_preimage"][195] == 585
        assert by["update_postimage"][195] == 5850
        # the changefeed STREAM emits the same set
        r = TableFormatCdfStreamReader({"path": t})
        rows = []
        for p in r.partitions({"version": v - 1}, {"version": v}):
            rows.extend(reader_rows(r, p))
        got = {(ct, vals[0], vals[1]) for *vals, ct, _v in rows}
        want = {
            (r2["_change_type"], r2["k"], r2["v"]) for r2 in ch.collect()
        }
        assert got == want

    def test_restore_past_update(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_update,
        )

        t = self._table(spark, tmp_path, "u8")
        pre = latest_version(t)
        tf_update(spark, t, [("k", ">=", 100)], {"v": F.lit(-5)})
        v = tf_restore(t, pre)
        df = tf_read(spark, t, version=v)
        assert df.count() == 200
        assert df.filter(F.col("v") == -5).count() == 0


import struct

import numpy as np

from fluent_bit_filter_math_spark.operators.multimodal import (
    _ADPCM_SPB,
    _ADPCM_STEPS,
    _adpcm_encode,
    _adpcm_wav_build,
    _adpcm_wav_decode,
)


class TestAdpcm:
    """IMA/DVI ADPCM: the decoder must reproduce the ENCODER'S OWN
    reconstruction bit-exactly (the defining invariant of a
    backward-adaptive codec — both sides run the same state machine),
    plus container strictness and quantizer bit-order vectors."""

    def test_hand_vector_quantizer_bit_order(self):
        # encode [0, 100]: diff 100 at step 7 → delta bits 4|2|1,
        # diffq = 0+7+3+1 = 11, index 0→8
        data, recon = _adpcm_encode(np.array([0, 100], dtype=np.int16))
        assert data[:4] == struct.pack("<hBB", 0, 0, 0)
        assert data[4] & 0x0F == 7  # low nibble first
        assert recon[:2] == [0, 11]

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1,
            max_size=700,
        )
    )
    def test_decoder_equals_encoder_reconstruction(self, samples):
        pcm = np.array(samples, dtype=np.int16)
        _, recon = _adpcm_encode(pcm)
        back = _adpcm_wav_decode(_adpcm_wav_build(pcm))
        assert list(back) == recon[: len(pcm)]

    def test_constant_signal_is_lossless(self):
        for v in (-32768, -4128, 0, 1, 7998, 32767):
            pcm = np.full(123, v, dtype=np.int16)
            back = _adpcm_wav_decode(_adpcm_wav_build(pcm))
            assert (back == v).all()

    def test_full_scale_square_walks_index_clamps(self):
        sq = np.array(([32767] * 40 + [-32768] * 40) * 8, dtype=np.int16)
        _, recon = _adpcm_encode(sq)
        back = _adpcm_wav_decode(_adpcm_wav_build(sq))
        assert list(back) == recon[: len(sq)]
        # the step table's top step must actually be reached
        assert max(abs(int(x)) for x in back) > _ADPCM_STEPS[40]

    def test_block_boundary_state_carries(self):
        # a ramp long enough to span 3 blocks: each block header
        # restarts the predictor but CARRIES the step index
        pcm = np.arange(0, 3 * _ADPCM_SPB * 7, 7, dtype=np.int16)[
            : 3 * _ADPCM_SPB
        ]
        data, recon = _adpcm_encode(pcm)
        hdr2_index = data[20 + 2]  # second block's stored index
        assert hdr2_index > 0  # the carried index, not a reset
        back = _adpcm_wav_decode(_adpcm_wav_build(pcm))
        assert list(back) == recon[: len(pcm)]

    @pytest.mark.parametrize(
        "mutate,why",
        [
            (lambda b: b"XIFF" + b[4:], "bad magic"),
            (lambda b: b[:-1], "truncated data"),
            (
                lambda b: b.replace(b"fact", b"fakt", 1),
                "missing fact chunk",
            ),
            (
                lambda b: b.replace(
                    struct.pack("<H", 0x0011), struct.pack("<H", 1), 1
                ),
                "wrong format tag",
            ),
        ],
    )
    def test_container_strictness(self, mutate, why):
        wav = _adpcm_wav_build(np.full(50, 100, dtype=np.int16))
        with pytest.raises(ValueError):
            _adpcm_wav_decode(mutate(wav))

    def test_out_of_range_index_rejected(self):
        wav = bytearray(_adpcm_wav_build(np.full(50, 7, dtype=np.int16)))
        # the first block header's index byte sits 4+2 bytes into data;
        # find the data chunk and poison it
        at = wav.find(b"data") + 8 + 2
        wav[at] = 99
        with pytest.raises(ValueError, match="step index"):
            _adpcm_wav_decode(bytes(wav))


class TestCheckConstraints:
    def _t(self, spark, tmp_path, name):
        t = str(tmp_path / name)
        tf_append(_mk(spark, 0, 100).coalesce(1), t)
        return t

    def test_append_enforced(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            ConstraintViolation,
            tf_set_constraint,
        )

        t = self._t(spark, tmp_path, "c1")
        tf_set_constraint(spark, t, "k_small", "k < 1000")
        tf_append(_mk(spark, 100, 200).coalesce(1), t)  # valid
        head = latest_version(t)
        with pytest.raises(ConstraintViolation, match="k_small"):
            tf_append(_mk(spark, 990, 1010).coalesce(1), t)
        assert latest_version(t) == head  # nothing published
        assert tf_read(spark, t).count() == 200

    def test_null_passes_sql_standard(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_set_constraint,
        )

        t = self._t(spark, tmp_path, "c2")
        tf_set_constraint(spark, t, "v_pos", "v >= 0")
        nullable = spark.range(0, 5).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 2 == 0, F.col("id")).alias("v"),
        )
        tf_append(nullable.coalesce(1), t)  # NULL v rows must pass
        assert tf_read(spark, t).count() == 105

    def test_add_validates_existing_data(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            ConstraintViolation,
            tf_set_constraint,
        )

        t = self._t(spark, tmp_path, "c3")
        with pytest.raises(ConstraintViolation, match="existing data"):
            tf_set_constraint(spark, t, "k_tiny", "k < 50")

    def test_update_and_overwrite_enforced(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            ConstraintViolation,
            tf_set_constraint,
            tf_update,
        )

        t = self._t(spark, tmp_path, "c4")
        tf_set_constraint(spark, t, "v_pos", "v >= 0")
        with pytest.raises(ConstraintViolation):
            tf_update(spark, t, [("k", ">=", 90)], {"v": F.lit(-1)})
        with pytest.raises(ConstraintViolation):
            tf_overwrite(
                spark.range(0, 3)
                .select(F.col("id").alias("k"), F.lit(-9).alias("v"))
                .coalesce(1),
                t,
            )
        assert tf_read(spark, t).count() == 100  # both writes rejected

    def test_drop_then_readd(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            ConstraintViolation,
            tf_constraints,
            tf_drop_constraint,
            tf_set_constraint,
        )

        t = self._t(spark, tmp_path, "c5")
        tf_set_constraint(spark, t, "k_small", "k < 1000")
        assert tf_constraints(t) == {"k_small": "k < 1000"}
        with pytest.raises(ValueError, match="already exists"):
            tf_set_constraint(spark, t, "k_small", "k < 500")
        tf_drop_constraint(t, "k_small")
        assert tf_constraints(t) == {}
        with pytest.raises(ValueError, match="no constraint"):
            tf_drop_constraint(t, "k_small")
        tf_append(_mk(spark, 5000, 5010).coalesce(1), t)  # now legal
        with pytest.raises(ConstraintViolation):
            tf_set_constraint(spark, t, "k_small", "k < 1000")

    def test_constraint_commits_do_not_break_streaming(
        self, spark, tmp_path
    ):
        from fluent_bit_filter_math_spark.sources.table_format import (
            TableFormatStreamReader,
            tf_set_constraint,
        )

        t = self._t(spark, tmp_path, "c6")
        tf_set_constraint(spark, t, "k_pos", "k >= 0")   # v1: metadata
        tf_append(_mk(spark, 100, 150).coalesce(1), t)   # v2
        r = TableFormatStreamReader({"path": t})
        rows = []
        for p in r.partitions({"version": -1}, {"version": 2}):
            rows.extend(reader_rows(r, p))
        assert len(rows) == 150  # the metadata commit emitted nothing

    def test_time_travel_and_cdf_unperturbed(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_set_constraint,
        )

        t = self._t(spark, tmp_path, "c7")
        v = tf_set_constraint(spark, t, "k_pos", "k >= 0")
        assert tf_read(spark, t, version=v).count() == 100
        assert tf_changes(spark, t, v, v).count() == 0

    def test_concurrent_add_raises(self, spark, tmp_path, monkeypatch):
        import fluent_bit_filter_math_spark.sources.table_format as tfm
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_set_constraint,
        )

        t = self._t(spark, tmp_path, "c8")
        head = latest_version(t)
        with open(_log_path(t, head + 1), "x") as f:
            f.write(
                '{"version": %d, "action": "append", "add": [], '
                '"remove": [], "schema": ""}' % (head + 1)
            )
        monkeypatch.setattr(tfm, "latest_version", lambda p: head)
        with pytest.raises(ConcurrentOverwrite):
            tf_set_constraint(spark, t, "k_pos", "k >= 0")


class TestColumnMapping:
    def _t(self, spark, tmp_path, name):
        t = str(tmp_path / name)
        tf_append(_mk(spark, 0, 100).coalesce(1), t)
        return t

    def test_rename_is_metadata_only_and_read_translates(
        self, spark, tmp_path
    ):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_rename_column,
        )

        t = self._t(spark, tmp_path, "m1")
        files_before = sorted(
            f
            for _, _, fs in os.walk(t)
            for f in fs
            if f.endswith(".parquet")
        )
        v = tf_rename_column(t, "v", "val")
        files_after = sorted(
            f
            for _, _, fs in os.walk(t)
            for f in fs
            if f.endswith(".parquet")
        )
        assert files_before == files_after
        df = tf_read(spark, t)
        assert df.columns == ["k", "val"]
        assert df.filter(F.col("val") == 30).count() == 1
        # time travel shows the old name
        assert tf_read(spark, t, version=v - 1).columns == ["k", "v"]

    def test_append_after_rename_shares_physical_lineage(
        self, spark, tmp_path
    ):
        from fluent_bit_filter_math_spark.sources.table_format import (
            _resolve,
            tf_rename_column,
        )

        t = self._t(spark, tmp_path, "m2")
        tf_rename_column(t, "v", "val")
        tf_append(
            spark.range(100, 200)
            .select(F.col("id").alias("k"), (F.col("id") * 3).alias("val"))
            .coalesce(1),
            t,
        )
        df = tf_read(spark, t)
        assert df.count() == 200 and df.columns == ["k", "val"]
        # one schema generation: the scan stays mergeSchema-free
        _, _, evolved = _resolve(t, latest_version(t))
        assert not evolved

    def test_rename_chain_and_rename_back(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_column_mapping,
            tf_rename_column,
        )

        t = self._t(spark, tmp_path, "m3")
        tf_rename_column(t, "v", "val")
        tf_rename_column(t, "val", "amount")
        assert tf_column_mapping(t) == {"amount": "v"}
        tf_rename_column(t, "amount", "v")  # back to the birth name
        assert tf_column_mapping(t) == {}
        assert tf_read(spark, t).columns == ["k", "v"]

    def test_rename_validation(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_rename_column,
        )

        t = self._t(spark, tmp_path, "m4")
        with pytest.raises(ValueError, match="no column"):
            tf_rename_column(t, "nope", "x")
        with pytest.raises(ValueError, match="already exists"):
            tf_rename_column(t, "v", "k")

    def test_retired_physical_name_not_reusable(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_rename_column,
        )

        t = self._t(spark, tmp_path, "m5")
        tf_rename_column(t, "v", "val")
        # a NEW column named like the retired physical "v" would fork
        # the physical lineage — refused
        widened = spark.range(200, 210).select(
            F.col("id").alias("k"),
            (F.col("id") * 3).alias("val"),
            F.lit(1).alias("v"),
        )
        with pytest.raises(ValueError, match="retired physical"):
            tf_append(widened.coalesce(1), t)

    def test_skipping_delete_update_through_logical_names(
        self, spark, tmp_path
    ):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_pruned_files,
            tf_rename_column,
            tf_scan,
            tf_update,
        )

        t = str(tmp_path / "m6")
        for lo in (0, 100, 200, 300):
            tf_append(_mk(spark, lo, lo + 100).coalesce(1), t)
        tf_rename_column(t, "k", "key")
        kept, total = tf_pruned_files(t, [("key", ">", 350)])
        assert (len(kept), total) == (1, 4)
        assert tf_scan(spark, t, [("key", ">", 350)]).count() == 49
        v, dvd, _, skipped = tf_delete(spark, t, [("key", ">=", 390)])
        assert dvd == 1 and skipped == 3
        assert tf_read(spark, t).count() == 390
        _, dvd2, n2 = tf_update(
            spark, t, [("key", ">=", 380)], {"v": F.col("v") + 1}
        )
        assert n2 == 10  # 380..389; deleted rows skipped
        got = {
            r["key"]: r["v"]
            for r in tf_read(spark, t)
            .filter(F.col("key") >= 380)
            .collect()
        }
        assert got[385] == 385 * 3 + 1

    def test_merge_and_cdf_through_logical_names(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_merge,
            tf_rename_column,
        )

        t = self._t(spark, tmp_path, "m7")
        tf_rename_column(t, "k", "key")
        ch = spark.createDataFrame(
            [(5, 999, False), (200, 600, False), (7, 0, True)],
            "key long, v long, _delete boolean",
        )
        tf_merge(spark, t, ch, key_col="key")
        df = tf_read(spark, t)
        assert df.count() == 100  # -1 delete +1 insert
        vals = {r["key"]: r["v"] for r in df.collect()}
        assert vals[5] == 999 and vals[200] == 600 and 7 not in vals
        # CDF through the head surfaces the CURRENT logical names;
        # a range ending before the rename keeps that version's own
        chg = tf_changes(spark, t, 0)
        assert chg.columns[:2] == ["key", "v"]
        assert tf_changes(spark, t, 0, 0).columns[:2] == ["k", "v"]

    def test_constraint_blocks_rename(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_drop_constraint,
            tf_rename_column,
            tf_set_constraint,
        )

        t = self._t(spark, tmp_path, "m8")
        tf_set_constraint(spark, t, "v_pos", "v >= 0")
        with pytest.raises(ValueError, match="drop it"):
            tf_rename_column(t, "v", "val")
        tf_drop_constraint(t, "v_pos")
        tf_rename_column(t, "v", "val")  # now legal
        assert tf_read(spark, t).columns == ["k", "val"]

    def test_streaming_schema_shows_logical_names(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            TableFormatDataSource,
            TableFormatStreamReader,
            tf_rename_column,
        )

        t = self._t(spark, tmp_path, "m9")
        tf_rename_column(t, "v", "val")          # v1: metadata
        tf_append(
            spark.range(100, 130)
            .select(F.col("id").alias("k"), (F.col("id") * 3).alias("val"))
            .coalesce(1),
            t,
        )                                        # v2
        ds = TableFormatDataSource({"path": t})
        assert ds.schema() == "struct<k:bigint,val:bigint>"
        r = TableFormatStreamReader({"path": t})
        rows = []
        for p in r.partitions({"version": -1}, {"version": 2}):
            rows.extend(reader_rows(r, p))
        assert len(rows) == 130  # the rename version emitted nothing

    def test_zorder_compact_through_logical_names(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_compact,
            tf_rename_column,
        )

        t = self._t(spark, tmp_path, "m10")
        tf_rename_column(t, "k", "key")
        v = tf_compact(spark, t, zorder_by=("key", "v"), n_files=2)
        df = tf_read(spark, t, version=v)
        assert df.count() == 100 and df.columns == ["key", "v"]

    def test_restore_keeps_current_mapping(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_rename_column,
        )

        t = self._t(spark, tmp_path, "m11")
        pre = latest_version(t)
        tf_overwrite(_mk(spark, 0, 10).coalesce(1), t)
        tf_rename_column(t, "v", "val")
        v = tf_restore(t, pre)
        # data reverts; the mapping (a guard-like metadata chain) stays
        df = tf_read(spark, t, version=v)
        assert df.count() == 100 and df.columns == ["k", "val"]


class TestTfHistory:
    def test_history_reflects_every_action_newest_first(
        self, spark, tmp_path
    ):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_drop_constraint,
            tf_history,
            tf_rename_column,
            tf_set_constraint,
            tf_update,
        )

        t = str(tmp_path / "h1")
        tf_append(_mk(spark, 0, 100).coalesce(1), t)          # v0
        tf_set_constraint(spark, t, "k_pos", "k >= 0")        # v1
        tf_update(spark, t, [("k", ">=", 90)], {"v": F.lit(0)})  # v2
        tf_drop_constraint(t, "k_pos")                        # v3
        tf_rename_column(t, "v", "val")                       # v4
        tf_overwrite(
            _mk(spark, 0, 10)
            .withColumnRenamed("v", "val")  # post-rename logical name
            .coalesce(1),
            t,
        )                                                     # v5
        tf_restore(t, 2)                                      # v6
        h = tf_history(t)
        assert [r["version"] for r in h] == [6, 5, 4, 3, 2, 1, 0]
        by = {r["version"]: r for r in h}
        assert by[0]["action"] == "append" and by[0]["n_added"] == 1
        assert by[1]["constraints_set"] == ["k_pos"]
        assert by[2]["action"] == "update" and by[2]["n_dv"] == 1
        assert by[3]["constraints_dropped"] == ["k_pos"]
        assert by[4]["mapping"] == {"val": "v"}
        assert by[5]["action"] == "overwrite" and by[5]["n_removed"] == 2
        assert by[6]["action"] == "restore"
        assert by[6]["restored_version"] == 2

    def test_history_missing_table_raises(self, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_history,
        )

        with pytest.raises(FileNotFoundError):
            tf_history(str(tmp_path / "absent"))


class TestKafkaWireCompression:
    def _broker_rt(self, spark, compression):
        from fluent_bit_filter_math_spark.sources.kafka_wire import (
            MiniBroker,
            produce,
            register_kafka_wire,
        )

        register_kafka_wire(spark)
        broker = MiniBroker()
        df = spark.createDataFrame(
            [(str(i).encode(), f'{{"n": {i}, "pad": "xyxyxyxyxy"}}'
              .encode()) for i in range(200)],
            "key binary, value binary",
        ).coalesce(2)
        produce(df, "t", broker.port, 2, compression=compression)
        return broker

    def test_compressed_roundtrip_and_wire_shrinks(self, spark):
        broker = self._broker_rt(spark, "snappy")
        try:
            raw = (
                spark.read.format("kafkawire")
                .option("topic", "t")
                .option("port", str(broker.port))
                .option("partitions", "2")
                .option("compression", "snappy")
                .load()
            )
            rows = raw.collect()
            assert len(rows) == 200
            assert broker.produced_wire < broker.produced_raw
            assert broker.fetched_wire < broker.fetched_raw
        finally:
            broker.stop()

    def test_compressed_produce_plain_fetch_interop(self, spark):
        # storage is decoded: a legacy consumer reads a snappy
        # producer's records unchanged
        broker = self._broker_rt(spark, "snappy")
        try:
            raw = (
                spark.read.format("kafkawire")
                .option("topic", "t")
                .option("port", str(broker.port))
                .option("partitions", "2")
                .load()
            )
            assert raw.count() == 200
        finally:
            broker.stop()

    def test_v2_uncompressed_form(self, spark):
        broker = self._broker_rt(spark, "none")
        try:
            assert broker.produced_wire == broker.produced_raw
            raw = (
                spark.read.format("kafkawire")
                .option("topic", "t")
                .option("port", str(broker.port))
                .option("partitions", "2")
                .load()
            )
            assert raw.count() == 200
        finally:
            broker.stop()

    def test_idempotent_replay_under_compression(self, spark):
        from fluent_bit_filter_math_spark.sources.kafka_wire import (
            MiniBroker,
            produce,
        )

        broker = MiniBroker()
        try:
            df = spark.createDataFrame(
                [(b"1", b"a"), (b"3", b"b")], "key binary, value binary"
            ).coalesce(1)
            produce(df, "t", broker.port, 2, compression="snappy")
            produce(df, "t", broker.port, 2, compression="snappy")
            total = sum(len(v) for v in broker.logs.values())
            assert total == 2  # the replay deduped, compressed or not
        finally:
            broker.stop()

    def test_section_crc_guard(self):
        from fluent_bit_filter_math_spark.sources.kafka_wire import (
            _COMP_SNAPPY,
            _open_section,
            _seal_section,
        )

        raw = b"some record bytes " * 20
        wire = _seal_section(raw, _COMP_SNAPPY)
        assert _open_section(wire, _COMP_SNAPPY) == raw
        bad = bytearray(wire)
        bad[-1] ^= 1  # flip a CRC bit
        with pytest.raises(ValueError, match="CRC"):
            _open_section(bytes(bad), _COMP_SNAPPY)
        with pytest.raises(ValueError):
            _open_section(wire[:3], _COMP_SNAPPY)

    def test_malformed_batch_dropped_not_appended(self, spark):
        import socket
        import struct as st

        from fluent_bit_filter_math_spark.sources.kafka_wire import (
            _COMP_SNAPPY,
            _OP_PRODUCE2,
            _rpc,
            _seal_section,
            MiniBroker,
        )

        broker = MiniBroker()
        try:
            # claim 3 records but seal only 1 — count/section mismatch
            sec = _seal_section(
                st.pack(">i", 1) + b"k" + st.pack(">i", 1) + b"v",
                _COMP_SNAPPY,
            )
            body = (
                bytes([_OP_PRODUCE2])
                + st.pack(">H", 1) + b"t"
                + bytes([_COMP_SNAPPY])
                + st.pack(">qii", 0, 0, 3)
                + sec
            )
            ack = _rpc(broker.port, body)
            assert st.unpack(">q", ack)[0] == -1
            assert broker.logs.get(("t", 0), []) == []
        finally:
            broker.stop()


class TestDmlTrajectoryModel:
    """Model-based pin of the WHOLE DML surface: a seeded random
    sequence of append / DV-delete / update / restore / compact ops
    runs against the real table AND a naive in-memory dict model;
    after every op the snapshot must equal the model, and at the end
    three random historical versions must equal the model's remembered
    snapshots. Interactions no single-feature test covers (delete→
    restore→update→compact chains) fall out of the randomization."""

    def _run(self, spark, tmp_path, seed):
        import random

        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_compact,
            tf_update,
        )

        rng = random.Random(seed)
        t = str(tmp_path / f"model{seed}")
        model: dict[int, int] = {}
        # keyed by the table's ACTUAL version — a restore to an
        # equivalent state is a version-preserving no-op, so "one op =
        # one version" does not hold
        history: dict[int, dict[int, int]] = {}
        next_key = 0

        def snap():
            return {
                r["k"]: r["v"] for r in tf_read(spark, t).collect()
            }

        def do_append():
            nonlocal next_key
            n = rng.randint(5, 40)
            lo = next_key
            next_key += n
            df = spark.range(lo, lo + n).select(
                F.col("id").alias("k"), (F.col("id") * 7).alias("v")
            )
            tf_append(df.coalesce(1), t)
            model.update({k: k * 7 for k in range(lo, lo + n)})

        def do_delete():
            if not model:
                return do_append()
            cut = rng.choice(sorted(model))
            tf_delete(spark, t, [("k", ">=", cut)])
            for k in [k for k in model if k >= cut]:
                del model[k]

        def do_update():
            if not model:
                return do_append()
            cut = rng.choice(sorted(model))
            delta = rng.randint(1, 1000)
            tf_update(
                spark, t, [("k", "<=", cut)], {"v": F.col("v") + delta}
            )
            for k in [k for k in model if k <= cut]:
                model[k] += delta

        def do_restore():
            if len(history) < 2:
                return do_append()
            v = rng.choice(sorted(history))
            tf_restore(t, v)
            model.clear()
            model.update(history[v])

        def do_compact():
            if not history:
                return do_append()
            tf_compact(spark, t, n_files=rng.randint(1, 3))

        do_append()  # v0
        history[latest_version(t)] = dict(model)
        assert snap() == model
        ops = [do_append, do_delete, do_update, do_restore, do_compact]
        for _ in range(8):
            rng.choice(ops)()
            history[latest_version(t)] = dict(model)
            assert snap() == model, f"seed {seed} diverged"
        # time travel: three random recorded versions must equal the
        # model's remembered snapshots (restores/compacts included)
        for v in rng.sample(sorted(history), 3):
            got = {
                r["k"]: r["v"]
                for r in tf_read(spark, t, version=v).collect()
            }
            assert got == history[v], f"seed {seed} time travel v{v}"

    @pytest.mark.parametrize("seed", [11, 23, 47])
    def test_trajectory(self, spark, tmp_path, seed):
        self._run(spark, tmp_path, seed)


# ---------------------------------------------------------------------------
# Whole-type-system Avro roundtrip property: random SCHEMAS (not just
# random values) over the full implemented surface — primitives,
# logical types, multi-branch unions, arrays, maps, enums, fixed,
# nested records — encoded and decoded through every codec. Each
# single-feature test pins its corner; this pins the COMPOSITIONS
# (a nullable array of records holding enum+fixed fields inside a
# snappy block) no hand-written case enumerates.
# ---------------------------------------------------------------------------
_avro_names = iter(range(10**9))


def _scalar_schemas():
    return st.sampled_from(
        [
            "long",
            "int",
            "double",
            "float",
            "boolean",
            "string",
            "bytes",
            {"type": "int", "logicalType": "date"},
            {"type": "long", "logicalType": "timestamp-micros"},
        ]
    )


def _named_schema(kind):
    n = f"N{next(_avro_names)}"
    if kind == "enum":
        return {"type": "enum", "name": n, "symbols": ["A", "B", "C"]}
    return {"type": "fixed", "name": n, "size": 3}


def _schema_strategy(depth=2):
    base = _scalar_schemas() | st.sampled_from(["enum", "fixed"]).map(
        _named_schema
    )
    if depth == 0:
        return base
    sub = _schema_strategy(depth - 1)
    return (
        base
        | st.builds(lambda s: {"type": "array", "items": s}, sub)
        | st.builds(lambda s: {"type": "map", "values": s}, sub)
        | st.builds(lambda s: ["null", s], base)
        | st.builds(
            lambda a, b: {
                "type": "record",
                "name": f"R{next(_avro_names)}",
                "fields": [
                    {"name": "a", "type": a},
                    {"name": "b", "type": b},
                ],
            },
            sub,
            base,
        )
    )


def _value_for(schema, rng):
    from fluent_bit_filter_math_spark.sources.avro_ocf import _base_type

    if isinstance(schema, list):  # union: pick any branch's value
        return _value_for(rng.choice(schema), rng)
    base = _base_type(schema)
    lt = (
        schema.get("logicalType") if isinstance(schema, dict) else None
    )
    if lt == "date":
        return datetime.date(2020, 1, 1) + datetime.timedelta(
            days=rng.randrange(1000)
        )
    if lt == "timestamp-micros":
        return datetime.datetime(2021, 3, 4) + datetime.timedelta(
            microseconds=rng.randrange(10**9)
        )
    if base == "null":
        return None
    if base == "boolean":
        return rng.random() < 0.5
    if base == "int":
        return rng.randrange(-(2**30), 2**30)
    if base == "long":
        return rng.randrange(-(2**40), 2**40)
    if base in ("float", "double"):
        # float32-exact values so the float branch roundtrips bitwise
        return float(rng.randrange(-(2**20), 2**20)) / 4.0
    if base == "string":
        return "".join(rng.choice("abcá漢 xyz") for _ in range(rng.randrange(8)))
    if base == "bytes":
        return bytes(rng.randrange(256) for _ in range(rng.randrange(8)))
    if base == "enum":
        return rng.choice(schema["symbols"])
    if base == "fixed":
        return bytes(rng.randrange(256) for _ in range(schema["size"]))
    if base == "array":
        return [
            _value_for(schema["items"], rng)
            for _ in range(rng.randrange(4))
        ]
    if base == "map":
        return {
            f"k{i}": _value_for(schema["values"], rng)
            for i in range(rng.randrange(4))
        }
    if base == "record":
        return {
            f["name"]: _value_for(f["type"], rng) for f in schema["fields"]
        }
    raise AssertionError(schema)


def _normalize(schema, v):
    """What the decoder hands back for an encoded *v* (tuples for
    records, lists for arrays)."""
    from fluent_bit_filter_math_spark.sources.avro_ocf import _base_type

    if isinstance(schema, list):
        # decode returns the branch value; match on the branch the
        # encoder's type witness picks (first accepting)
        from fluent_bit_filter_math_spark.sources.avro_ocf import (
            _branch_accepts,
        )

        for b in schema:
            if _branch_accepts(b, v):
                return _normalize(b, v)
        raise AssertionError((schema, v))
    base = _base_type(schema)
    if base == "record":
        return tuple(
            _normalize(f["type"], v[f["name"]]) for f in schema["fields"]
        )
    if base == "array":
        return [_normalize(schema["items"], x) for x in v]
    if base == "map":
        return {k: _normalize(schema["values"], x) for k, x in v.items()}
    if base == "fixed" or base == "bytes":
        return bytes(v)
    return v


class TestAvroSchemaFuzz:
    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(_schema_strategy(), min_size=1, max_size=4),
        st.integers(0, 2**32 - 1),
        st.sampled_from(["null", "deflate", "snappy"]),
    )
    def test_random_schema_roundtrip(self, field_types, seed, codec):
        import random
        import tempfile

        rng = random.Random(seed)
        schema = {
            "type": "record",
            "name": "Root",
            "fields": [
                {"name": f"f{i}", "type": t}
                for i, t in enumerate(field_types)
            ],
        }
        rows = [
            {
                f"f{i}": _value_for(t, rng)
                for i, t in enumerate(field_types)
            }
            for _ in range(rng.randrange(1, 12))
        ]
        want = [
            tuple(
                _normalize(t, row[f"f{i}"])
                for i, t in enumerate(field_types)
            )
            for row in rows
        ]
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "f.avro")
            write_ocf_shard(
                p, rows, codec=codec, schema_json=json.dumps(schema)
            )
            got = [tuple(r) for r in read_ocf_file(p)]
        assert got == want
