"""Round-13 additions: data skipping + retry-with-rebase in the
commit-log table format, the monotonic stream-reader offset, and the
incremental batch-id cache.

Reference analogue: none directly (the reference filter has no
storage, /root/reference/test.sh:42 lands records on stdout); this is
the productionized-sink north star VERDICT r12 ranked first."""

import json
import os

import pyspark.sql.functions as F
import pytest

from fluent_bit_filter_math_spark.sources.table_format import (
    CommitConflict,
    ConcurrentOverwrite,
    _commit_with_rebase,
    _file_survives,
    _stage,
    committed_batch_ids,
    latest_version,
    tf_append,
    tf_append_batch,
    tf_overwrite,
    tf_pruned_files,
    tf_read,
    tf_scan,
)


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )


def _stale_latest_version(monkeypatch, stale_value, for_calls):
    """Make the writer's view of the log head stale for its first
    *for_calls* looks — the deterministic twin of 'another writer
    published between my read and my open(log, "x")'."""
    import fluent_bit_filter_math_spark.sources.table_format as tfmod

    real = tfmod.latest_version
    state = {"n": 0}

    def stale(path):
        state["n"] += 1
        if state["n"] <= for_calls:
            return stale_value
        return real(path)

    monkeypatch.setattr(tfmod, "latest_version", stale)


def test_two_racing_appends_both_land(spark, tmp_path, monkeypatch):
    """Two writers stage against the same head; writer B wins the slot
    A targets, A's blind append hits the FileExistsError path, rebases
    automatically, and BOTH commits land with all rows visible."""
    t = str(tmp_path / "t")
    tf_append(_mk(spark, 0, 10), t)  # version 0: common base
    base = latest_version(t)
    add_a, schema = _stage(_mk(spark, 10, 20), t)
    add_b, _ = _stage(_mk(spark, 20, 30), t)
    vb = _commit_with_rebase(t, add_b, [], schema, "append", base, 5)
    # A still sees the pre-B head on its first look: its first publish
    # targets B's version and must CONFLICT, then rebase over it.
    _stale_latest_version(monkeypatch, base, for_calls=1)
    va = _commit_with_rebase(t, add_a, [], schema, "append", base, 5)
    assert vb == base + 1 and va == base + 2
    assert tf_read(spark, t).count() == 30
    assert (
        tf_read(spark, t).agg(F.sum("k")).collect()[0][0]
        == sum(range(30))
    )


def test_append_rebase_is_bounded(spark, tmp_path, monkeypatch):
    """max_retries=0 still surfaces CommitConflict for a blind append
    whose view of the head never catches up."""
    t = str(tmp_path / "t")
    tf_append(_mk(spark, 0, 5), t)
    tf_append(_mk(spark, 10, 15), t)
    add, schema = _stage(_mk(spark, 5, 10), t)
    # permanently stale view: every look targets the occupied slot 1
    _stale_latest_version(monkeypatch, 0, for_calls=10**9)
    with pytest.raises(CommitConflict):
        _commit_with_rebase(t, add, [], schema, "append", 0, 0)


def test_concurrent_overwrite_still_raises(spark, tmp_path):
    """An overwrite whose read snapshot went stale must raise, even
    when its target version slot is still free (the
    append-landed-between-read-and-publish window)."""
    t = str(tmp_path / "t")
    tf_append(_mk(spark, 0, 10), t)
    base = latest_version(t)
    add, schema = _stage(_mk(spark, 100, 105), t)
    # interloper: a concurrent append changes the live set
    tf_append(_mk(spark, 10, 20), t)
    with pytest.raises(ConcurrentOverwrite):
        _commit_with_rebase(t, add, ["gone.parquet"], schema,
                            "overwrite", base, 5)
    # and the public API against a racing writer raises the same way:
    # simulate by publishing into the slot tf_overwrite will claim
    with pytest.raises(ConcurrentOverwrite):
        _commit_with_rebase(
            t, add, [], schema, "overwrite", base, 5
        )
    # a clean (non-racing) overwrite still works
    v = tf_overwrite(_mk(spark, 50, 55), t)
    assert v == latest_version(t)
    assert tf_read(spark, t).count() == 5


def test_stats_land_in_add_actions(spark, tmp_path):
    t = str(tmp_path / "t")
    tf_append(_mk(spark, 5, 50).coalesce(1), t)
    with open(os.path.join(t, "_log", "00000000.json")) as f:
        commit = json.load(f)
    (entry,) = commit["add"]
    assert entry["stats"]["k"] == {"min": 5, "max": 49, "nulls": 0}
    assert entry["stats"]["v"]["max"] == 147


def test_skipping_prunes_disjoint_ranges(spark, tmp_path):
    """Four range-clustered commits; a half-range predicate hands
    Spark only the surviving files, and the scan is still exact."""
    t = str(tmp_path / "t")
    for lo in (0, 100, 200, 300):
        tf_append(_mk(spark, lo, lo + 100).coalesce(1), t)
    kept, total = tf_pruned_files(t, [("k", ">", 199)])
    assert total == 4 and len(kept) == 2
    df = tf_scan(spark, t, [("k", ">", 199)])
    assert df.count() == 200
    assert df.agg(F.min("k"), F.max("k")).collect()[0] == (200, 399)
    # equality point-lookup prunes to ONE file
    kept1, _ = tf_pruned_files(t, [("k", "=", 137)])
    assert len(kept1) == 1
    assert tf_scan(spark, t, [("k", "=", 137)]).count() == 1
    # empty survivor set short-circuits to an empty frame, right schema
    none = tf_scan(spark, t, [("k", ">", 10_000)])
    assert none.count() == 0 and none.columns == ["k", "v"]


def test_skipping_is_conservative_not_wrong():
    """Missing stats, unknown columns, and cross-type literals all
    KEEP the file — skipping may be ineffective, never incorrect."""
    assert _file_survives({}, [("k", "=", 7)])
    assert _file_survives({"k": {}}, [("k", ">", 7)])
    assert _file_survives({"k": {"min": "a", "max": "z"}}, [("k", "=", 7)])
    assert _file_survives({"k": {"min": 0, "max": 10}}, [("other", "=", 99)])
    st = {"k": {"min": 10, "max": 20}}
    assert not _file_survives(st, [("k", "<", 10)])
    assert _file_survives(st, [("k", "<=", 10)])
    assert not _file_survives(st, [("k", ">", 20)])
    assert _file_survives(st, [("k", ">=", 20)])
    assert not _file_survives(st, [("k", "=", 9)])
    # conjunction: any refuted term kills the file
    assert not _file_survives(st, [("k", ">=", 0), ("k", "<", 5)])


def test_pre_r13_string_add_actions_still_readable(spark, tmp_path):
    """Forward compat: logs whose add actions are bare path strings
    (pre-stats format) read, stream, and vacuum unchanged."""
    t = str(tmp_path / "t")
    tf_append(_mk(spark, 0, 10).coalesce(1), t)
    log = os.path.join(t, "_log", "00000000.json")
    with open(log) as f:
        commit = json.load(f)
    commit["add"] = [e["path"] for e in commit["add"]]  # strip stats
    os.remove(log)
    with open(log, "w") as f:
        json.dump(commit, f)
    assert tf_read(spark, t).count() == 10
    # stats-less files survive every predicate (conservative), and the
    # residual Spark filter still makes the answer exact
    kept, total = tf_pruned_files(t, [("k", ">", 1_000)])
    assert (len(kept), total) == (1, 1)
    assert tf_scan(spark, t, [("k", ">", 5)]).count() == 4


def test_committed_batch_ids_incremental_cache(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _mk(spark, 0, 4)
    assert tf_append_batch(df, t, 0) == 0
    assert tf_append_batch(df, t, 0) is None  # replay no-op
    assert committed_batch_ids(t) == {0}
    assert tf_append_batch(df, t, 1) == 1
    assert committed_batch_ids(t) == {0, 1}
    # returned set is a copy: mutating it must not poison the cache
    committed_batch_ids(t).add(99)
    assert committed_batch_ids(t) == {0, 1}


def test_stream_reader_offset_monotonic_after_restart():
    """ADVICE r12: a fresh reader instance that learns the committed
    end via commit()/partitions() never hands back an earlier
    latestOffset, regardless of callback order."""
    from fluent_bit_filter_math_spark.sources.table_format import (
        TableFormatStreamReader,
    )

    class _Opts(dict):
        pass

    r = TableFormatStreamReader(_Opts(path="/nonexistent-tf"))
    r.initialOffset()
    # recovery path: engine replays the checkpointed batch end FIRST
    r.commit({"version": 7})
    # with an empty log (head = -1), latestOffset must not regress
    assert r.latestOffset()["version"] >= 7


# ---------------------------------------------------------------------------
# Avro schema resolution (spec vectors, Avro 1.11 §Schema Resolution)
# ---------------------------------------------------------------------------


def _rec(*fields):
    return {
        "type": "record",
        "name": "R",
        "fields": [dict(f) for f in fields],
    }


def test_avro_resolution_spec_vectors(tmp_path):
    from fluent_bit_filter_math_spark.sources.avro_ocf import (
        read_ocf_file,
        resolve_schemas,
        write_ocf_shard,
    )

    writer = _rec(
        {"name": "a", "type": "int"},
        {"name": "old_name", "type": "string"},
        {"name": "gone", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "s", "type": "string"},
    )
    reader = _rec(
        {"name": "a", "type": "long"},              # int -> long
        {"name": "new_name", "type": "string",
         "aliases": ["old_name"]},                   # alias match
        {"name": "f", "type": "double"},             # float -> double
        {"name": "s", "type": "bytes"},              # string -> bytes
        {"name": "extra", "type": "long", "default": 42},
        # bytes default: JSON string code points ARE the bytes (latin-1)
        {"name": "tag", "type": "bytes", "default": "\u00ff\u0000a"},
    )
    path = str(tmp_path / "v.avro")
    rows = [
        {"a": -7, "old_name": "héllo", "gone": 1.5, "f": 0.25,
         "s": "xyz"},
        {"a": 2**31 - 1, "old_name": "", "gone": -0.0, "f": 1e10,
         "s": "ß"},
    ]
    write_ocf_shard(path, rows, codec="deflate",
                    schema_json=json.dumps(writer))
    out = list(read_ocf_file(path, reader))
    import struct as _struct

    def f32(x):
        return _struct.unpack("<f", _struct.pack("<f", x))[0]

    assert out[0] == (-7, "héllo", 0.25, b"xyz", 42, b"\xff\x00a")
    assert out[1] == (
        2**31 - 1, "", f32(1e10), "ß".encode(), 42, b"\xff\x00a"
    )
    # identity resolution: no reader schema reads writer order verbatim
    ident = list(read_ocf_file(path))
    assert ident[0] == (-7, "héllo", 1.5, 0.25, "xyz")
    # missing field without default: spec says error
    with pytest.raises(ValueError, match="no default"):
        resolve_schemas(writer, _rec({"name": "nope", "type": "long"}))
    # illegal narrowing: long writer -> int reader
    with pytest.raises(ValueError, match="does not resolve"):
        resolve_schemas(
            _rec({"name": "a", "type": "long"}),
            _rec({"name": "a", "type": "int"}),
        )


def test_avro_mixed_generation_scan(spark, tmp_path):
    """One directory, two writer generations, one resolved scan."""
    from fluent_bit_filter_math_spark.sources.avro_ocf import (
        register_avro_ocf,
        write_ocf,
    )

    register_avro_ocf(spark)
    gen1 = json.dumps(_rec({"name": "k", "type": "int"}))
    gen2 = json.dumps(
        _rec({"name": "k", "type": "long"},
             {"name": "w", "type": "long"})
    )
    reader = json.dumps(
        _rec({"name": "k", "type": "long"},
             {"name": "w", "type": "long", "default": -5})
    )
    out = str(tmp_path / "shards")
    df1 = spark.range(0, 4).selectExpr("cast(id as int) k").coalesce(1)
    df2 = spark.range(4, 8).selectExpr("id k", "id * 10 w").coalesce(1)
    write_ocf(df1, out, schema_json=gen1, prefix="g1-")
    write_ocf(df2, out, schema_json=gen2, prefix="g2-")
    back = (
        spark.read.format("avro_ocf")
        .option("path", out)
        .option("readerschema", reader)
        .load()
    )
    got = {(r.k, r.w) for r in back.collect()}
    assert got == {(i, -5) for i in range(4)} | {
        (i, i * 10) for i in range(4, 8)
    }
    assert back.schema.simpleString() == "struct<k:bigint,w:bigint>"


# ---------------------------------------------------------------------------
# JPEG round-13 extensions: DRI/RSTn restart markers (gray path),
# partial MCUs on 4:2:0, and the malformed-stream guard parity the
# color/420 decoders were missing (ADVICE r12).
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


class TestJpegDri:
    @settings(max_examples=20, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        wb=st.integers(1, 4),
        hb=st.integers(1, 3),
        interval=st.integers(1, 5),
    )
    def test_dri_decode_equals_plain_decode_exactly(
        self, seed, wb, hb, interval
    ):
        """The entropy layer is lossless: a restart-split scan must
        decode to the IDENTICAL plane the unsplit scan decodes to —
        any predictor-reset or resync slip shows up as a pixel diff."""
        import numpy as np

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        rng = np.random.default_rng(seed)
        p = rng.integers(0, 256, size=(8 * hb, 8 * wb), dtype=np.uint8)
        _, _, plain = mm._jpeg_decode(mm._jpeg_encode(p))
        _, _, split = mm._jpeg_decode(
            mm._jpeg_encode(p, restart_interval=interval)
        )
        assert (plain == split).all()

    def test_restart_stream_contains_rst_markers(self):
        from fluent_bit_filter_math_spark.operators import multimodal as mm
        import numpy as np

        p = np.arange(64 * 6, dtype=np.uint8).reshape(16, 24) % 256
        data = mm._jpeg_encode(p, restart_interval=2)
        # 6 MCUs, interval 2 -> restarts after MCU 2 and 4: RST0, RST1
        assert b"\xff\xd0" in data and b"\xff\xd1" in data
        assert b"\xff\xdd" in data  # the DRI segment itself

    def test_out_of_sequence_restart_rejected(self):
        import numpy as np
        import pytest as _pytest

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        p = np.zeros((16, 24), dtype=np.uint8)
        data = bytearray(mm._jpeg_encode(p, restart_interval=2))
        i = data.index(b"\xff\xd0")
        data[i + 1] = 0xD5  # wrong sequence number
        with _pytest.raises(ValueError, match="out of sequence"):
            mm._jpeg_decode(bytes(data))


class TestJpeg420PartialMcu:
    @settings(max_examples=25, deadline=None)
    @given(
        payload=st.binary(min_size=1, max_size=24),
        dx=st.integers(0, 15),
        dy=st.integers(0, 15),
    )
    def test_cropped_tile_constant_exact(self, payload, dx, dy):
        """Tile-constant planes cropped to arbitrary dims stay
        bit-exact: edge replication re-extends the same tile value, so
        every padded block is constant; the decoder must hand back
        exactly the SOF-sized crop."""
        import numpy as np

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        n = len(payload)
        tw = 1 + n % mm._JPEG_S_TW_MOD
        th = 1 + n % mm._JPEG_S_TH_MOD
        vals = np.frombuffer(
            (payload * (tw * th // n + 1))[: tw * th], dtype=np.uint8
        ).reshape(th, tw)
        gray = np.kron(vals, np.ones((16, 16), dtype=np.uint8))
        gray = gray[: max(1, 16 * th - dy), : max(1, 16 * tw - dx)]
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
        w, h, out = mm._jpeg_decode_420(mm._jpeg_encode_420(rgb))
        assert (h, w) == gray.shape
        assert (out == rgb).all()

    @settings(max_examples=10, deadline=None)
    @given(seed=st.integers(0, 2**32 - 1))
    def test_gray_random_partial_bounded(self, seed):
        import numpy as np

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        rng = np.random.default_rng(seed)
        hh = int(rng.integers(1, 40))
        ww = int(rng.integers(1, 40))
        g = rng.integers(0, 256, size=(hh, ww), dtype=np.uint8)
        p = np.repeat(g[:, :, None], 3, axis=2)
        w, h, out = mm._jpeg_decode_420(mm._jpeg_encode_420(p))
        assert (h, w) == (hh, ww)
        assert np.abs(out.astype(int) - p.astype(int)).max() <= 3


class TestJpegGuardParity:
    """ADVICE r12: the color/420 decoders must fail malformed streams
    with the gray path's clean ValueError contract, never a raw
    TypeError/IndexError."""

    def _color_file(self):
        import numpy as np

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        rgb = np.zeros((16, 16, 3), dtype=np.uint8)
        return mm._jpeg_encode_color(rgb), mm._jpeg_encode_420(rgb)

    def test_truncated_marker_stream(self):
        import pytest as _pytest

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        color, sub = self._color_file()
        with _pytest.raises(ValueError):
            mm._jpeg_decode_color(color[:7])
        with _pytest.raises(ValueError):
            mm._jpeg_decode_420(sub[:7])

    def test_sos_before_sof_or_dqt(self):
        import pytest as _pytest

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        color, sub = self._color_file()

        def drop_seg(data, marker):
            i = data.index(bytes([0xFF, marker]))
            ln = int.from_bytes(data[i + 2 : i + 4], "big")
            return data[:i] + data[i + 2 + ln :]

        with _pytest.raises(ValueError, match="SOS before"):
            mm._jpeg_decode_color(drop_seg(color, 0xC0))
        with _pytest.raises(ValueError, match="SOS before"):
            mm._jpeg_decode_420(drop_seg(sub, 0xDB))

    def test_dri_and_non_baseline_sof_rejected(self):
        import pytest as _pytest

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        color, sub = self._color_file()
        dri = b"\xff\xdd\x00\x04\x00\x02"
        with _pytest.raises(ValueError, match="restart"):
            mm._jpeg_decode_color(color[:2] + dri + color[2:])
        with _pytest.raises(ValueError, match="restart"):
            mm._jpeg_decode_420(sub[:2] + dri + sub[2:])

        def swap_sof(data, to):
            i = data.index(b"\xff\xc0")
            return data[:i + 1] + bytes([to]) + data[i + 2 :]

        with _pytest.raises(ValueError, match="non-baseline"):
            mm._jpeg_decode_color(swap_sof(color, 0xC2))
        with _pytest.raises(ValueError, match="non-baseline"):
            mm._jpeg_decode_420(swap_sof(sub, 0xC2))


# ---------------------------------------------------------------------------
# Byte-level BPE pre-tokenization (GPT-2 style)
# ---------------------------------------------------------------------------
class TestBpeBytePretokenizer:
    @settings(max_examples=60, deadline=None)
    @given(
        s=st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=60,
        )
    )
    def test_partition_property(self, s):
        """Every ASCII char lands in exactly ONE pre-token, in order —
        the regex alternation is a partition of the input (python re is
        the third implementation against Spark's Java regex and
        DuckDB's RE2; leftmost-first semantics agree across all
        three)."""
        import re

        from fluent_bit_filter_math_spark.operators.text import (
            _BPE_BYTE_REGEX,
        )

        toks = re.findall(_BPE_BYTE_REGEX, s)
        assert "".join(toks) == s
        assert all(toks)

    def test_leading_space_attaches(self):
        import re

        from fluent_bit_filter_math_spark.operators.text import (
            _BPE_BYTE_REGEX,
        )

        f = lambda s: re.findall(_BPE_BYTE_REGEX, s)
        # the Ġ convention: one space attaches to the following run
        assert f("the cat") == ["the", " cat"]
        assert f("a1 2b!") == ["a", "1", " 2", "b", "!"]
        # documented divergence from GPT-2: 2+ spaces stay standalone
        assert f("a  b") == ["a", "  ", "b"]
        assert f(" !? x") == [" !?", " x"]


def test_skipping_nan_literal_never_prunes():
    """Spark orders NaN above every double; Python NaN comparisons are
    all-False — without the guard a NaN literal would prune EVERY
    file."""
    assert _file_survives(
        {"k": {"min": 0.0, "max": 1.0}}, [("k", ">", float("nan"))]
    )


# ---------------------------------------------------------------------------
# Log checkpoints (Delta's _last_checkpoint recipe)
# ---------------------------------------------------------------------------
class TestLogCheckpoints:
    def test_checkpoint_written_every_n_commits(self, spark, tmp_path):
        import glob

        from fluent_bit_filter_math_spark.sources import table_format as tf

        t = str(tmp_path / "t")
        for i in range(tf._CKPT_EVERY + 2):
            tf.tf_append(_mk(spark, i * 10, i * 10 + 10).coalesce(1), t)
        cps = glob.glob(os.path.join(t, "_log", "*.checkpoint.json"))
        assert len(cps) == 1
        got = tf.latest_checkpoint(t, tf.latest_version(t))
        assert got is not None and got[0] == tf._CKPT_EVERY - 1
        # full correctness through the checkpointed replay path
        df = tf.tf_read(spark, t)
        assert df.count() == (tf._CKPT_EVERY + 2) * 10
        # time travel BELOW the checkpoint still replays from zero
        assert tf.tf_read(spark, t, version=2).count() == 30

    def test_checkpoints_are_pure_accelerators(self, spark, tmp_path):
        """Deleting every checkpoint only makes reads slower, never
        wrong — and replay-from-checkpoint equals replay-from-zero
        bit-for-bit, including stats-based skipping and overwrites."""
        import glob

        from fluent_bit_filter_math_spark.sources import table_format as tf

        t = str(tmp_path / "t")
        for i in range(tf._CKPT_EVERY):
            tf.tf_append(_mk(spark, i * 100, i * 100 + 100).coalesce(1), t)
        tf.tf_overwrite(_mk(spark, 0, 50), t)
        with_ckpt = sorted(
            r.k for r in tf.tf_read(spark, t).collect()
        )
        kept_c, total_c = tf.tf_pruned_files(t, [("k", ">", 10)])
        for p in glob.glob(os.path.join(t, "_log", "*.checkpoint.json")):
            os.remove(p)
        without = sorted(r.k for r in tf.tf_read(spark, t).collect())
        kept_n, total_n = tf.tf_pruned_files(t, [("k", ">", 10)])
        assert with_ckpt == without == list(range(50))
        assert (sorted(kept_c), total_c) == (sorted(kept_n), total_n)

    def test_write_checkpoint_idempotent(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources import table_format as tf

        t = str(tmp_path / "t")
        tf.tf_append(_mk(spark, 0, 10), t)
        v1 = tf.write_checkpoint(t)
        v2 = tf.write_checkpoint(t)  # second write: first wins, no error
        assert v1 == v2 == tf.latest_version(t)
        assert tf.tf_read(spark, t).count() == 10


# ---------------------------------------------------------------------------
# MERGE INTO through the log (stats-pruned rewrite)
# ---------------------------------------------------------------------------
class TestTfMerge:
    def _table(self, spark, tmp_path):
        t = str(tmp_path / "t")
        for lo in (0, 100, 200, 300):
            tf_append(_mk(spark, lo, lo + 100).coalesce(1), t)
        return t

    def _changes(self, spark, rows):
        return spark.createDataFrame(
            rows, "k long, v long, _delete boolean"
        )

    def test_merge_rewrites_only_overlapping_files(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_merge,
        )

        t = self._table(spark, tmp_path)
        # updates + deletes + inserts all confined to the last file's
        # key range (and beyond): exactly 1 of 4 files rewritten
        ch = self._changes(
            spark,
            [(350, 9999, False), (399, 0, True), (450, 4500, False)],
        )
        v, rewritten, untouched = tf_merge(spark, t, ch, "k")
        assert (rewritten, untouched) == (1, 3)
        snap = {r.k: r.v for r in tf_read(spark, t, version=v).collect()}
        assert len(snap) == 400  # 400 - 1 delete + 1 insert
        assert snap[350] == 9999 and snap[450] == 4500
        assert 399 not in snap
        assert snap[10] == 30  # untouched file intact
        # time travel to the pre-merge snapshot still works
        assert tf_read(spark, t, version=v - 1).count() == 400

    def test_merge_empty_batch_is_noop(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            latest_version,
            tf_merge,
        )

        t = self._table(spark, tmp_path)
        head = latest_version(t)
        v, rewritten, untouched = tf_merge(
            spark, t, self._changes(spark, []), "k"
        )
        assert (v, rewritten, untouched) == (head, 0, 4)

    def test_merge_conflict_raises(self, spark, tmp_path, monkeypatch):
        from fluent_bit_filter_math_spark.sources.table_format import (
            latest_version,
            tf_merge,
        )

        t = self._table(spark, tmp_path)
        # another writer already landed, but the merge's FIRST look at
        # the head (its snapshot read) still sees the old version —
        # the deterministic twin of a commit racing into the window
        # between the merge's read and its publish
        head0 = latest_version(t)
        tf_append(_mk(spark, 400, 410), t)
        _stale_latest_version(monkeypatch, head0, 1)
        with pytest.raises(ConcurrentOverwrite):
            tf_merge(spark, t, self._changes(
                spark, [(5, 1, False)]), "k")

    def test_merge_full_range_touches_everything(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_merge,
        )

        t = self._table(spark, tmp_path)
        ch = self._changes(spark, [(0, -1, False), (399, -1, False)])
        _, rewritten, untouched = tf_merge(spark, t, ch, "k")
        assert (rewritten, untouched) == (4, 0)


def test_zorder_compact_preserves_values_and_time_travel(spark, tmp_path):
    """Z-ordered compaction is value-invisible, its add actions carry
    narrow rectangles of BOTH dimensions, and time travel across the
    compact boundary still resolves the pre-compact snapshot."""
    import pyspark.sql.functions as F

    from fluent_bit_filter_math_spark.sources import table_format as tf

    t = str(tmp_path / "t")
    df = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("a"), F.col("id").alias("b")
    )
    for r in range(2):
        tf.tf_append(df.filter(F.col("b") % 2 == r), t)
    v = tf.tf_compact(spark, t, zorder_by=("a", "b"), n_files=8)
    snap = tf.tf_read(spark, t)
    assert snap.count() == 1024
    assert snap.agg(F.sum("b")).collect()[0][0] == 1024 * 1023 // 2
    # pre-compact time travel intact
    assert tf.tf_read(spark, t, version=v - 1).count() == 1024
    # either-dimension skipping works on the compacted stats
    kept_a, total = tf.tf_pruned_files(t, [("a", "<=", 3)])
    kept_b, _ = tf.tf_pruned_files(t, [("b", "<=", 100)])
    assert total == 8 and len(kept_a) < 8 and len(kept_b) < 8
    # and scans stay exact
    assert tf.tf_scan(spark, t, [("a", "<=", 3)]).count() == 128
    assert tf.tf_scan(spark, t, [("b", "<=", 100)]).count() == 101


class TestJpegProgressive:
    """SOF2 spectral-selection progressive (T.81 Annex G): the entropy
    layer is lossless, so progressive decode must equal BASELINE
    decode of the same plane exactly — quant and IDCT are shared."""

    @settings(max_examples=25, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        wb=st.integers(1, 5),
        hb=st.integers(1, 3),
    )
    def test_progressive_equals_baseline_decode(self, seed, wb, hb):
        import numpy as np

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        rng = np.random.default_rng(seed)
        p = rng.integers(0, 256, size=(8 * hb, 8 * wb), dtype=np.uint8)
        _, _, base = mm._jpeg_decode(mm._jpeg_encode(p))
        w, h, prog = mm._jpeg_decode_progressive(
            mm._jpeg_encode_progressive(p)
        )
        assert (w, h) == (8 * wb, 8 * hb)
        assert (base == prog).all()

    def test_eob_run_spans_many_blocks(self):
        """A flat plane makes every AC band scan ONE long EOB run —
        the cross-block state the baseline decoder never has."""
        import numpy as np

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        p = np.full((24, 8 * 40), 5, dtype=np.uint8)  # 120 blocks
        data = mm._jpeg_encode_progressive(p)
        assert data.count(b"\xff\xda") == 3  # DC + two AC band scans
        _, _, out = mm._jpeg_decode_progressive(data)
        assert (out == p).all()

    def test_band_structure_is_respected(self):
        """Custom band splits roundtrip too (scan count follows)."""
        import numpy as np

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        rng = np.random.default_rng(3)
        p = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        data = mm._jpeg_encode_progressive(
            p, bands=((1, 2), (3, 20), (21, 63))
        )
        assert data.count(b"\xff\xda") == 4
        _, _, base = mm._jpeg_decode(mm._jpeg_encode(p))
        _, _, prog = mm._jpeg_decode_progressive(data)
        assert (base == prog).all()

    def test_malformed_rejection(self):
        import numpy as np
        import pytest as _pytest

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        p = np.zeros((8, 8), dtype=np.uint8)
        good = mm._jpeg_encode_progressive(p)
        # the baseline decoder refuses SOF2 and vice versa
        with _pytest.raises(ValueError, match="non-baseline"):
            mm._jpeg_decode(good)
        with _pytest.raises(ValueError, match="progressive"):
            mm._jpeg_decode_progressive(mm._jpeg_encode(p))
        with _pytest.raises(ValueError):
            mm._jpeg_decode_progressive(good[:9])
        # an illegal successive-approximation step (Ah != Al+1) is
        # rejected, never silently misdecoded
        i = good.rindex(b"\xff\xda")
        bad = bytearray(good)
        bad[i + 2 + 2 + 5] = 0x30  # Ah=3, Al=0 on the last SOS
        with _pytest.raises(ValueError, match="Ah = Al"):
            mm._jpeg_decode_progressive(bytes(bad))


class TestJpegSuccessiveApproximation:
    """Both progressive axes (T.81 G.1.2.1-G.1.2.3): high bits first
    (point transform Al=1), then refinement scans restore every low
    bit — decode must equal BASELINE decode exactly."""

    @settings(max_examples=30, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        wb=st.integers(1, 5),
        hb=st.integers(1, 3),
    )
    def test_sa_equals_baseline_decode(self, seed, wb, hb):
        import numpy as np

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        rng = np.random.default_rng(seed)
        p = rng.integers(0, 256, size=(8 * hb, 8 * wb), dtype=np.uint8)
        _, _, base = mm._jpeg_decode(mm._jpeg_encode(p))
        w, h, sa = mm._jpeg_decode_progressive(
            mm._jpeg_encode_progressive_sa(p)
        )
        assert (w, h) == (8 * wb, 8 * hb)
        assert (base == sa).all()

    def test_sa_scan_script(self):
        import numpy as np

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        p = np.arange(256, dtype=np.uint8).reshape(16, 16)
        data = mm._jpeg_encode_progressive_sa(p)
        # 4 scans: DC(Al=1), DC refine, AC(1-63, Al=1), AC refine
        assert data.count(b"\xff\xda") == 4
        assert data.count(b"\xff\xc2") == 1  # SOF2, not SOF0

    def test_refinement_size_must_be_one(self):
        import numpy as np
        import pytest as _pytest

        from fluent_bit_filter_math_spark.operators import multimodal as mm

        rng = np.random.default_rng(5)
        p = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
        data = mm._jpeg_encode_progressive_sa(p)
        # corrupting the AC-refine scan's entropy bits must fail
        # loudly (bad Huffman code / size > 1 / run past band), never
        # return silently-wrong pixels with an exception-free decode
        # of garbage trailing state -- flip bytes until one bites
        tripped = False
        for off in range(3, 40):
            bad = bytearray(data)
            i = len(bad) - off
            if bad[i] in (0xFF, 0x00) or bad[i - 1] == 0xFF:
                continue
            bad[i] ^= 0x5A
            try:
                mm._jpeg_decode_progressive(bytes(bad))
            except ValueError:
                tripped = True
                break
        assert tripped


def test_avro_logical_type_vectors(tmp_path):
    """Spec vectors for the logical layer: date days, timestamp
    millis/micros epoch arithmetic (integer, never float), decimal
    bytes as minimal big-endian two's complement (incl. negatives and
    the 0x80 sign-room edge), and base-type matching under
    resolution (reader logical annotation wins)."""
    import datetime
    import decimal

    from fluent_bit_filter_math_spark.sources.avro_ocf import (
        _dec_logical,
        _enc_logical,
        read_ocf_file,
        write_ocf_shard,
    )

    d = {"type": "int", "logicalType": "date"}
    assert _enc_logical(d, datetime.date(1970, 1, 1)) == 0
    assert _enc_logical(d, datetime.date(1969, 12, 31)) == -1
    assert _dec_logical(d, 19723) == datetime.date(2024, 1, 1)

    tus = {"type": "long", "logicalType": "timestamp-micros"}
    tms = {"type": "long", "logicalType": "timestamp-millis"}
    t = datetime.datetime(2024, 1, 1, 12, 30, 15, 123456)
    us = _enc_logical(tus, t)
    assert _dec_logical(tus, us) == t
    assert _enc_logical(tms, t) == us // 1000
    # tz-aware input normalizes to UTC then goes naive
    aware = t.replace(tzinfo=datetime.timezone.utc)
    assert _enc_logical(tus, aware) == us

    dec = {"type": "bytes", "logicalType": "decimal",
           "precision": 12, "scale": 2}
    assert _enc_logical(dec, 1) == b"\x01"
    assert _enc_logical(dec, -1) == b"\xff"
    # 128 needs a second byte for the sign bit (the 0x80 edge)
    assert _enc_logical(dec, 128) == b"\x00\x80"
    assert _enc_logical(dec, decimal.Decimal("19.99")) == b"\x07\xcf"
    assert _dec_logical(dec, b"\x07\xcf") == decimal.Decimal("19.99")
    assert _dec_logical(dec, b"\xff") == decimal.Decimal("-0.01")

    # file-level roundtrip: writer ships raw ints, reader gets rich
    # values; resolution matches base types so a logical-annotated
    # reader reads a plain-typed writer (annotation wins)
    writer = _rec({"name": "k", "type": "int"})
    reader = _rec({"name": "k", "type": d})
    path = str(tmp_path / "lt.avro")
    write_ocf_shard(path, [{"k": 19723}], codec="null",
                    schema_json=json.dumps(writer))
    assert list(read_ocf_file(path, reader)) == [
        (datetime.date(2024, 1, 1),)
    ]


def test_avro_union_resolution_cases(tmp_path):
    """Union evolution per spec: a field becoming nullable (writer T ->
    reader [null, T]), promotion INSIDE a nullable union, and the
    decode-time-only error when a null value meets a non-null reader."""
    from fluent_bit_filter_math_spark.sources.avro_ocf import (
        read_ocf_file,
        write_ocf_shard,
    )

    # (a) writer long -> reader ["null", "long"]: became nullable
    wa = _rec({"name": "k", "type": "long"})
    ra = _rec({"name": "k", "type": ["null", "long"]})
    pa = str(tmp_path / "a.avro")
    write_ocf_shard(pa, [{"k": 7}], codec="null",
                    schema_json=json.dumps(wa))
    assert list(read_ocf_file(pa, ra)) == [(7,)]

    # (b) promotion inside the union: ["null","int"] -> ["null","long"]
    wb = _rec({"name": "k", "type": ["null", "int"]})
    rb = _rec({"name": "k", "type": ["null", "long"]})
    pb = str(tmp_path / "b.avro")
    write_ocf_shard(pb, [{"k": 5}, {"k": None}, {"k": -9}],
                    codec="null", schema_json=json.dumps(wb))
    assert list(read_ocf_file(pb, rb)) == [(5,), (None,), (-9,)]

    # (c) writer ["null","long"] -> reader "long": fine until a NULL
    # value actually arrives (the spec's decode-time union rule)
    rc = _rec({"name": "k", "type": "long"})
    pc = str(tmp_path / "c.avro")
    write_ocf_shard(pc, [{"k": 3}], codec="null",
                    schema_json=json.dumps(wb))
    assert list(read_ocf_file(pc, rc)) == [(3,)]
    pd_ = str(tmp_path / "d.avro")
    write_ocf_shard(pd_, [{"k": None}], codec="null",
                    schema_json=json.dumps(wb))
    with pytest.raises(ValueError, match="does not resolve"):
        list(read_ocf_file(pd_, rc))

    # nullable logical type: ["null", {int date}] roundtrips None+date
    import datetime

    wd = _rec({"name": "d", "type": ["null",
               {"type": "int", "logicalType": "date"}]})
    pe = str(tmp_path / "e.avro")
    write_ocf_shard(pe, [{"d": datetime.date(2024, 3, 1)}, {"d": None}],
                    codec="null", schema_json=json.dumps(wd))
    assert list(read_ocf_file(pe, wd)) == [
        (datetime.date(2024, 3, 1),), (None,)
    ]


def test_avro_array_block_form(tmp_path):
    """Arrays: multi-block and negative-count (size-hinted) block
    encodings both decode; nullable arrays and arrays of nullable
    items compose with unions; item promotion resolves recursively."""
    from fluent_bit_filter_math_spark.sources.avro_ocf import (
        _make_field_decoder,
        _zigzag_encode,
        read_ocf_file,
        write_ocf_shard,
    )

    arr_int = {"type": "array", "items": "int"}
    arr_long = {"type": "array", "items": "long"}
    # hand-built wire: two blocks [1,2] + size-hinted block [3], 0 end
    wire = (
        _zigzag_encode(2) + _zigzag_encode(1) + _zigzag_encode(2)
        + _zigzag_encode(-1) + _zigzag_encode(1) + _zigzag_encode(3)
        + _zigzag_encode(0)
    )
    dec = _make_field_decoder(arr_int, arr_long)  # item promotion
    vals, pos = dec(wire, 0)
    assert vals == [1, 2, 3] and pos == len(wire)

    # file roundtrip: nullable array + array of nullable items
    w = _rec(
        {"name": "a", "type": ["null", arr_int]},
        {"name": "b", "type": {"type": "array",
                               "items": ["null", "string"]}},
    )
    path = str(tmp_path / "arr.avro")
    write_ocf_shard(
        path,
        [
            {"a": [1, -2, 3], "b": ["x", None, "y"]},
            {"a": None, "b": []},
        ],
        codec="deflate",
        schema_json=json.dumps(w),
    )
    assert list(read_ocf_file(path)) == [
        ([1, -2, 3], ["x", None, "y"]),
        (None, []),
    ]
    # array vs scalar reader: loud resolve-time error
    with pytest.raises(ValueError, match="does not resolve"):
        _make_field_decoder(arr_int, "long")


def test_avro_complex_type_vectors(tmp_path):
    """Spec vectors for the r13 complex-type closure: MAP block form
    (string keys, same negative-count hint as arrays), ENUM symbol
    resolution (name match + reader ``default`` fallback, decode-time
    error only when an unmapped symbol is used), FIXED size contract,
    and NESTED RECORD resolution recursing the full field machinery
    (defaults + promotions at depth)."""
    from fluent_bit_filter_math_spark.sources.avro_ocf import (
        _dec_row_resolved,
        _enc_any,
        _make_field_decoder,
        _zigzag_encode,
        read_ocf_file,
        resolve_schemas,
        write_ocf_shard,
    )

    # --- map: block form, deterministic sorted-key encode ---
    mt = {"type": "map", "values": "long"}
    assert _enc_any(mt, {}) == b"\x00"
    b = _enc_any(mt, {"b": 2, "a": -1})
    assert b == _enc_any(mt, {"a": -1, "b": 2})  # sorted => stable
    dec = _make_field_decoder(mt, mt)
    assert dec(b, 0) == ({"a": -1, "b": 2}, len(b))
    # negative block count carries a byte-size skip hint (spec)
    body = _enc_any("string", "k") + _zigzag_encode(7)
    hinted = (_zigzag_encode(-1) + _zigzag_encode(len(body)) + body
              + _zigzag_encode(0))
    assert dec(hinted, 0)[0] == {"k": 7}

    # --- enum: symbol resolution ---
    et = {"type": "enum", "name": "E",
          "symbols": ["click", "view", "error"]}
    dec = _make_field_decoder(et, et)
    assert dec(_enc_any(et, "view"), 0)[0] == "view"
    # writer symbol absent from reader -> reader default
    r_def = {"type": "enum", "name": "E",
             "symbols": ["click", "other"], "default": "other"}
    dec = _make_field_decoder(et, r_def)
    assert dec(_enc_any(et, "error"), 0)[0] == "other"
    assert dec(_enc_any(et, "click"), 0)[0] == "click"
    # no default: errors at DECODE time, and only when used
    r_nodef = {"type": "enum", "name": "E", "symbols": ["click"]}
    dec = _make_field_decoder(et, r_nodef)
    assert dec(_enc_any(et, "click"), 0)[0] == "click"
    with pytest.raises(ValueError, match="no default"):
        dec(_enc_any(et, "view"), 0)
    # named-type rule: name mismatch fails unless aliased
    with pytest.raises(ValueError, match="alias"):
        _make_field_decoder(
            et, {"type": "enum", "name": "F", "symbols": ["click"]})
    dec = _make_field_decoder(
        et, {"type": "enum", "name": "F", "aliases": ["E"],
             "symbols": ["click", "view", "error"]})
    assert dec(_enc_any(et, "error"), 0)[0] == "error"

    # --- fixed: raw bytes, exact size both directions ---
    ft = {"type": "fixed", "name": "Tag", "size": 4}
    raw = b"\x00\x01\xfe\xff"
    assert _enc_any(ft, raw) == raw
    dec = _make_field_decoder(ft, ft)
    assert dec(raw, 0) == (raw, 4)
    with pytest.raises(ValueError, match="4 bytes"):
        _enc_any(ft, b"abc")
    with pytest.raises(ValueError, match="size mismatch"):
        _make_field_decoder(
            ft, {"type": "fixed", "name": "Tag", "size": 8})
    with pytest.raises(ValueError, match="truncated"):
        dec(b"\x00\x01", 0)

    # --- nested record: resolution recurses (promotion + default) ---
    w_inner = {"type": "record", "name": "U",
               "fields": [{"name": "uid", "type": "int"}]}
    r_inner = {"type": "record", "name": "U", "fields": [
        {"name": "uid", "type": "long"},
        {"name": "seg", "type": "string", "default": "none"}]}
    wrec = _rec({"name": "id", "type": "long"},
                {"name": "who", "type": w_inner})
    rrec = _rec({"name": "id", "type": "long"},
                {"name": "who", "type": r_inner})
    buf = _enc_any(wrec, {"id": 7, "who": {"uid": 42}})
    steps, template = resolve_schemas(wrec, rrec)
    row, p = _dec_row_resolved(buf, 0, steps, template)
    assert row == (7, (42, "none")) and p == len(buf)

    # --- whole-file roundtrip: all four types in one container ---
    w = _rec(
        {"name": "id", "type": "long"},
        {"name": "attrs", "type": mt},
        {"name": "seg", "type": et},
        {"name": "tag", "type": ft},
        {"name": "who", "type": {
            "type": "record", "name": "W",
            "fields": [{"name": "uid", "type": "long"}]}},
    )
    path = str(tmp_path / "cplx.avro")
    write_ocf_shard(
        path,
        [{"id": 1, "attrs": {"x": 9}, "seg": "error", "tag": raw,
          "who": {"uid": 5}},
         {"id": 2, "attrs": {}, "seg": "click", "tag": b"\x00" * 4,
          "who": {"uid": -6}}],
        codec="deflate",
        schema_json=json.dumps(w),
    )
    assert list(read_ocf_file(path)) == [
        (1, {"x": 9}, "error", raw, (5,)),
        (2, {}, "click", b"\x00" * 4, (-6,)),
    ]
    # cross-kind resolution errors are loud
    with pytest.raises(ValueError, match="does not resolve"):
        _make_field_decoder(mt, "long")
    with pytest.raises(ValueError, match="does not resolve"):
        _make_field_decoder("string", ft)


def test_avro_named_type_references(tmp_path):
    """Spec §Names: a non-primitive string type refers to the named
    record/enum/fixed defined earlier — reuse shares the definition
    object, recursion (a record referencing itself) decodes through
    the memoized lazily-bound decoders, the inliner is idempotent on
    already-shared structures, and Spark column mapping rejects
    recursive types loudly while mapping plain reuse."""
    from fluent_bit_filter_math_spark.sources.avro_ocf import (
        _avro_to_spark_type,
        _dec_row_resolved,
        _enc_any,
        inline_named_types,
        read_ocf_file,
        resolve_schemas,
        write_ocf_shard,
    )

    def fresh(d):
        return json.loads(json.dumps(d))

    # reuse: two fields of one named record, a reused enum
    t = inline_named_types(fresh({
        "type": "record", "name": "Trip", "fields": [
            {"name": "src", "type": {
                "type": "record", "name": "Point",
                "fields": [{"name": "x", "type": "long"},
                           {"name": "y", "type": "long"}]}},
            {"name": "dst", "type": "Point"},
            {"name": "a", "type": {"type": "enum", "name": "Eh",
                                   "symbols": ["p", "q"]}},
            {"name": "b", "type": "Eh"},
        ]}))
    assert t["fields"][1]["type"] is t["fields"][0]["type"]
    assert inline_named_types(t) is t  # idempotent on shared structure
    buf = _enc_any(t, {"src": {"x": 1, "y": 2},
                       "dst": {"x": -3, "y": 4}, "a": "p", "b": "q"})
    steps, template = resolve_schemas(t, t)
    row, p = _dec_row_resolved(buf, 0, steps, template)
    assert row == ((1, 2), (-3, 4), "p", "q") and p == len(buf)
    assert _avro_to_spark_type(t) == (
        "struct<src:struct<x:long,y:long>,"
        "dst:struct<x:long,y:long>,a:string,b:string>"
    )

    # recursion: a linked list decodes; Spark mapping refuses it
    node = inline_named_types(fresh({
        "type": "record", "name": "Node", "fields": [
            {"name": "v", "type": "long"},
            {"name": "next", "type": ["null", "Node"]}]}))
    assert node["fields"][1]["type"][1] is node
    buf = _enc_any(
        node, {"v": 1, "next": {"v": 2, "next": {"v": 3, "next": None}}}
    )
    steps, template = resolve_schemas(node, node)
    row, p = _dec_row_resolved(buf, 0, steps, template)
    assert row == (1, (2, (3, None))) and p == len(buf)
    with pytest.raises(ValueError, match="recursive"):
        _avro_to_spark_type(node)

    # whole-file roundtrip with a reference-bearing schema JSON
    sj = json.dumps({
        "type": "record", "name": "T", "fields": [
            {"name": "p", "type": {"type": "record", "name": "P",
                "fields": [{"name": "x", "type": "long"}]}},
            {"name": "q", "type": "P"}]})
    path = str(tmp_path / "refs.avro")
    write_ocf_shard(path, [{"p": {"x": 5}, "q": {"x": -6}}],
                    codec="deflate", schema_json=sj)
    assert list(read_ocf_file(path)) == [((5,), (-6,))]

    # unknown reference / duplicate textual definition raise
    with pytest.raises(ValueError, match="unknown type reference"):
        inline_named_types(fresh({
            "type": "record", "name": "R",
            "fields": [{"name": "a", "type": "Nope"}]}))
    with pytest.raises(ValueError, match="defined twice"):
        inline_named_types(fresh({
            "type": "record", "name": "R", "fields": [
                {"name": "a", "type": {"type": "enum", "name": "E2",
                                       "symbols": ["x"]}},
                {"name": "b", "type": {"type": "enum", "name": "E2",
                                       "symbols": ["y"]}}]}))
