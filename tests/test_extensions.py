"""Edge-case invariants for the extension operators (the oracle gate
covers the happy path at sf0.01; these pin the boundaries it can't)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _shingles,
)
from fluent_bit_filter_math_spark.operators.temporal import asof_join


def test_shingles_short_docs_are_empty(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "a b c d")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.sh
        for r in df.select(
            "doc_id", _shingles(F.split("text", " ")).alias("sh")
        ).collect()
    }
    assert rows[1] == []
    assert rows[2] == []
    assert rows[3] == ["a b c", "b c d"]


def test_asof_join_no_match_carries_null(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 5, 200)], "user_id long, ts long, event_id long"
    )
    right = spark.createDataFrame(
        [(1, 8, 7.5)], "user_id long, ts long, v double"
    )
    out = {
        r.user_id: r.v
        for r in asof_join(left, right, "user_id", "ts", "ts", ["v"]).collect()
    }
    assert out == {1: 7.5, 2: None}


def test_asof_join_tie_matches(spark):
    # Equal timestamps match: <= semantics, like DuckDB's ASOF JOIN.
    left = spark.createDataFrame([(1, 10, 1)], "user_id long, ts long, e long")
    right = spark.createDataFrame(
        [(1, 10, 9.9)], "user_id long, ts long, v double"
    )
    out = asof_join(left, right, "user_id", "ts", "ts", ["v"]).collect()
    assert out[0].v == 9.9


def test_asof_join_picks_latest_not_any(spark):
    left = spark.createDataFrame([(1, 10, 1)], "user_id long, ts long, e long")
    right = spark.createDataFrame(
        [(1, 3, 1.0), (1, 7, 2.0), (1, 11, 3.0)],
        "user_id long, ts long, v double",
    )
    out = asof_join(left, right, "user_id", "ts", "ts", ["v"]).collect()
    assert out[0].v == 2.0  # latest at-or-before ts=10, not 3.0 (future)


def test_y4m_roundtrip_parses_synthesized_container():
    from fluent_bit_filter_math_spark.operators.multimodal import (
        _y4m_build,
        _y4m_parse,
    )

    for payload in (b"", b"x", b"hello world" * 50, bytes(range(256))):
        n = len(payload)
        assert _y4m_parse(_y4m_build(payload)) == (
            4 + n % 16,
            4 + n % 12,
            n % 10 + 1,
        )


def test_y4m_parse_rejects_corrupt_containers():
    from fluent_bit_filter_math_spark.operators.multimodal import (
        _y4m_build,
        _y4m_parse,
    )

    with pytest.raises(ValueError):
        _y4m_parse(b"JUNK\nFRAME\n")  # bad magic
    with pytest.raises(ValueError):
        _y4m_parse(_y4m_build(b"abc")[:-1])  # truncated planes
    with pytest.raises(ValueError):
        # odd dims are illegal under 4:2:0 subsampling
        _y4m_parse(b"YUV4MPEG2 W3 H3 F30:1 C420\nFRAME\n" + b"\x00" * 14)


def test_jaccard_threshold_in_safe_gap():
    # The fixture's pair Jaccards cluster near 0.98 (planted near-dups)
    # and below 0.07 (noise); the threshold must sit inside that gap so
    # float noise can never flip a pair across it.
    assert 0.1 < JACCARD_THRESHOLD < 0.9


def test_interpolate_on_grid_edges(spark):
    """Pin all four bracket regimes of the interpolation kernel on a
    handcrafted series: NULL before the first observation, exact value
    at an exact-hit grid point, linear value between brackets, LOCF
    after the last observation."""
    from fluent_bit_filter_math_spark.operators.temporal import (
        interpolate_on_grid,
    )

    obs = spark.createDataFrame(
        [("a", "2024-01-01 01:00:00", 10.0),
         ("a", "2024-01-01 03:00:00", 30.0),
         ("b", "2024-01-01 02:30:00", 5.0)],
        "k string, ts string, value double",
    ).select("k", F.to_timestamp("ts").alias("ts"), "value")
    grid = spark.createDataFrame(
        [(k, f"2024-01-01 0{h}:00:00") for k in ("a", "b") for h in range(5)],
        "k string, ts string",
    ).select("k", F.to_timestamp("ts").alias("ts"))
    out = {
        (r.k, r.ts.strftime("%H:%M")): r.interp_value
        for r in interpolate_on_grid(obs, grid, key="k").collect()
    }
    assert out[("a", "00:00")] is None          # before first obs
    assert out[("a", "01:00")] == 10.0          # exact hit
    assert out[("a", "02:00")] == 20.0          # midpoint interpolation
    assert out[("a", "03:00")] == 30.0          # exact hit on last obs
    assert out[("a", "04:00")] == 30.0          # LOCF past last obs
    assert out[("b", "01:00")] is None          # before first obs
    assert out[("b", "03:00")] == 5.0           # LOCF (single observation)


def test_png_roundtrip_recovers_exact_pixels():
    from fluent_bit_filter_math_spark.operators.multimodal import (
        _PNG_H_MOD,
        _PNG_W_MOD,
        _png_build,
        _png_parse,
    )

    for payload in (b"", b"x", b"hello world" * 50, bytes(range(256))):
        n = len(payload)
        w, h = 4 + n % _PNG_W_MOD, 2 + n % _PNG_H_MOD
        src = payload if payload else b"\x00"
        plane = (src * (w * h // len(src) + 1))[: w * h]
        expect = (
            w,
            h,
            w * h,
            sum(plane),
            sum((i + 1) * b for i, b in enumerate(plane)),
        )
        # h ≥ 2 exercises filters None+Sub at least; the fixture docs
        # (n ≥ 44) always hit all five.
        assert _png_parse(_png_build(payload)) == expect


def test_png_parse_rejects_corrupt_containers():
    from fluent_bit_filter_math_spark.operators.multimodal import (
        _png_build,
        _png_parse,
    )

    blob = _png_build(b"some document text " * 4)
    with pytest.raises(ValueError):
        _png_parse(b"NOTAPNG" + blob[7:])  # bad signature
    with pytest.raises(ValueError):
        _png_parse(blob[:-4])  # truncated IEND CRC
    corrupt = bytearray(blob)
    corrupt[40] ^= 0xFF  # flip an IDAT byte → CRC mismatch
    with pytest.raises(ValueError):
        _png_parse(bytes(corrupt))


def test_bpe_string_encoding_matches_token_tuple_reference():
    """The chr(31)-string merge (double-separator boundary-anchored
    replace) must reproduce reference token-tuple BPE (Sennrich ACL
    2016) merge-for-merge. 15 rounds on the real fixture vocabulary —
    well past round 13, where the naive single-separator encoding
    measurably diverges (pair (a,s) matching the 's' prefix of token
    'st' in 'fast')."""
    import collections

    import duckdb

    words = collections.Counter()
    for (t,) in duckdb.sql(
        "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall():
        for w in t.split(" "):
            if w:
                words[w] += 1

    SEP = "\x1f"
    SEP2 = SEP + SEP

    # reference: token tuples, merge leftmost-nonoverlapping
    ref_toks = {w: tuple(w) for w in words}
    # engine encoding: double-sep padded string, replace()-based merge
    str_toks = {w: SEP2 + SEP2.join(w) + SEP2 for w in words}

    for rnd in range(1, 16):
        # reference pair count + argmax
        pc = collections.Counter()
        for w, cnt in words.items():
            ts = ref_toks[w]
            for a, b in zip(ts, ts[1:]):
                pc[(a, b)] += cnt
        (ra, rb), rcnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]

        # string-encoding pair count + argmax (mirrors the SQL exactly)
        sc = collections.Counter()
        for w, cnt in words.items():
            parts = [x for x in str_toks[w].split(SEP2) if x != ""]
            for a, b in zip(parts, parts[1:]):
                sc[(a, b)] += cnt
        (sa, sb), scnt = sorted(
            sc.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]

        assert (ra, rb, rcnt) == (sa, sb, scnt), f"round {rnd} winner"

        # apply the merge both ways
        for w in words:
            ts = ref_toks[w]
            out = []
            i = 0
            while i < len(ts):
                if i + 1 < len(ts) and ts[i] == ra and ts[i + 1] == rb:
                    out.append(ra + rb)
                    i += 2
                else:
                    out.append(ts[i])
                    i += 1
            ref_toks[w] = tuple(out)
            str_toks[w] = str_toks[w].replace(
                SEP + ra + SEP2 + rb + SEP, SEP + ra + rb + SEP
            )
            got = tuple(
                x for x in str_toks[w].split(SEP2) if x != ""
            )
            assert got == ref_toks[w], (
                f"round {rnd} tokenization of {w!r}: {got} != {ref_toks[w]}"
            )
