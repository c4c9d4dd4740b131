"""Property-based invariants (SURVEY.md §5.2 item 5).

* Pure-Python spec properties run under hypothesis (cheap, thousands of
  cases): operation prefix resolution, strtod truncation, validation.
* The fold-semantics equivalence runs 200 seeded-random cases through
  ONE Spark job against a pure-Python reference implementation of the
  reference's fold (math.c:167-195 semantics) — one collect() instead
  of one per example, keeping the property suite fast.
"""

from __future__ import annotations

import json
import math
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fluent_bit_filter_math_spark.compile import apply_spec
from fluent_bit_filter_math_spark.spec import (
    ConstOperand,
    FieldOperand,
    MathSpec,
    Operation,
    SpecError,
    parse_constant,
)

# ---------------------------------------------------------------------------
# hypothesis: spec-layer properties (no Spark).
# ---------------------------------------------------------------------------

_OP_NAMES = {
    "sum": Operation.SUM,
    "sub": Operation.SUB,
    "mul": Operation.MUL,
    "div": Operation.DIV,
}


@given(
    st.sampled_from(sorted(_OP_NAMES)),
    st.text(alphabet=st.characters(codec="ascii"), max_size=10),
)
def test_operation_resolution_is_prefix_only(prefix, suffix):
    # Anything starting with a known 3-char prefix resolves to that op,
    # regardless of suffix (math.c:54-66's strncasecmp(..., 3)).
    assert Operation.resolve(prefix + suffix) is _OP_NAMES[prefix]


@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_constant_truncates_toward_zero_or_rejects(x):
    text = repr(x)
    truncated = int(x) if abs(x) < 2**63 else None
    if truncated == 0:
        with pytest.raises(SpecError):
            parse_constant(text)
    elif truncated is not None:
        assert parse_constant(text).value == truncated


@given(st.integers(min_value=-(2**31), max_value=2**31))
def test_const_operand_rejects_only_zero(v):
    if v == 0:
        with pytest.raises(SpecError):
            ConstOperand(v)
    else:
        assert ConstOperand(v).value == v


@given(st.lists(st.sampled_from(["f1", "f2", 3, -2]), max_size=1))
def test_specs_require_two_operands(ops):
    with pytest.raises(SpecError):
        MathSpec.build("sum", ops, "out")


# ---------------------------------------------------------------------------
# Spark: fold semantics vs a pure-Python reference, 200 cases, one job.
# ---------------------------------------------------------------------------

_FIELDS = ["value", "other", "missing_one", "text_field"]


def _py_fold(op: Operation, operands, record: dict) -> float | None:
    """Reference semantics: seed with first operand, left-fold the rest
    (math.c:186-190); field eval coerces missing/non-numeric to 0.0
    (math.c:146-165); division by zero in 'null' mode yields None."""

    def val(o):
        if isinstance(o, ConstOperand):
            return float(o.value)
        v = record.get(o.name)
        return float(v) if isinstance(v, (int, float)) else 0.0

    acc = val(operands[0])
    for o in operands[1:]:
        v = val(o)
        if op is Operation.SUM:
            acc = acc + v
        elif op is Operation.SUB:
            acc = acc - v
        elif op is Operation.MUL:
            acc = acc * v
        else:
            if v == 0.0:
                return None
            if acc is None:
                return None
            acc = acc / v
        if acc is None:
            return None
    return acc


def test_fold_matches_python_reference(spark):
    rng = random.Random(42)
    cases = []
    for i in range(200):
        op_name = rng.choice(["sum", "subtract", "multiply", "division"])
        n_ops = rng.randint(2, 5)
        operands = []
        for _ in range(n_ops):
            if rng.random() < 0.3:
                operands.append(ConstOperand(rng.choice([-7, -1, 1, 3, 11])))
            else:
                operands.append(FieldOperand(rng.choice(_FIELDS)))
        record = {
            "value": round(rng.uniform(-100, 100), 2),
            "other": rng.choice([0.0, 1.5, -3.25, 42.0]),
            "text_field": "not-a-number",
        }
        cases.append((i, op_name, operands, record))

    rows = [
        (i, rec["value"], rec["other"], rec["text_field"], json.dumps({}))
        for i, _, _, rec in cases
    ]
    df = spark.createDataFrame(
        rows, "case_id long, value double, other double, text_field string, props string"
    )

    out = df
    for i, op_name, operands, _ in cases:
        spec = MathSpec(
            operation=Operation.resolve(op_name),
            operands=tuple(operands),
            output_field=f"out_{i}",
        )
        out = apply_spec(out, spec)
    result = {r["case_id"]: r for r in out.collect()}

    for i, op_name, operands, record in cases:
        expected = _py_fold(Operation.resolve(op_name), operands, record)
        actual = result[i][f"out_{i}"]
        if expected is None:
            assert actual is None, f"case {i}: {actual} != None"
        else:
            assert actual == pytest.approx(expected, abs=0, rel=0) or (
                math.isnan(expected) and math.isnan(actual)
            ), f"case {i} ({op_name}): {actual} != {expected}"


# ---------------------------------------------------------------------------
# hypothesis: the KV-properties front end (configure, math.c:37-132).
# ---------------------------------------------------------------------------


@given(st.text(max_size=12))
def test_unknown_property_keys_always_rejected(key):
    if key.strip().lower() in MathSpec._KNOWN_KEYS:
        return
    props = [("operation", "sum"), ("field", "a"), ("field", "b"),
             ("output_field", "out"), (key, "x")]
    with pytest.raises(SpecError):
        MathSpec.from_properties(props)


@given(st.lists(st.sampled_from(["a", "b", "c", "1", "-2"]), min_size=2, max_size=8))
def test_operand_order_preserved_from_properties(names):
    # Repeated field/constant keys accumulate in exactly config order
    # (mk_list tail-append, math.c:87,105).
    props = [("operation", "mul")]
    for n in names:
        props.append(("constant", n) if n.lstrip("-").isdigit() else ("field", n))
    props.append(("output_field", "out"))
    spec = MathSpec.from_properties(props)
    got = [
        o.name if isinstance(o, FieldOperand) else str(o.value)
        for o in spec.operands
    ]
    assert got == names


@given(st.sampled_from(["true", "on", "yes", "1", "false", "off", "no", "0",
                        "TRUE", "Off"]))
def test_cast_to_int_bool_parsing(raw):
    props = [("operation", "sum"), ("field", "a"), ("field", "b"),
             ("output_field", "out"), ("cast_to_int", raw)]
    spec = MathSpec.from_properties(props)
    assert spec.cast_to_int is (raw.strip().lower() in MathSpec._TRUE)


# ---------------------------------------------------------------------------
# hypothesis: Y4M container build→parse round-trip (pure Python, no
# Spark) — the parser must recover exactly the dimensions and frame
# count the builder encoded, for ANY payload, and must reject
# truncation with ValueError (the documented corrupt-container
# contract).
# ---------------------------------------------------------------------------
@given(st.binary(min_size=0, max_size=2048))
def test_y4m_roundtrip_any_payload(payload):
    from fluent_bit_filter_math_spark.operators.multimodal import (
        _Y4M_FR_MOD,
        _Y4M_H_MOD,
        _Y4M_W_MOD,
        _y4m_build,
        _y4m_parse,
    )

    blob = _y4m_build(payload)
    w, h, n_frames = _y4m_parse(blob)
    n = len(payload)
    assert (w, h, n_frames) == (
        4 + n % _Y4M_W_MOD,
        4 + n % _Y4M_H_MOD,
        n % _Y4M_FR_MOD + 1,
    )


@given(st.binary(min_size=1, max_size=512), st.integers(1, 40))
def test_y4m_truncation_always_valueerror(payload, cut):
    import pytest

    from fluent_bit_filter_math_spark.operators.multimodal import (
        _y4m_build,
        _y4m_parse,
    )

    blob = _y4m_build(payload)
    cut = min(cut, len(blob) - 1)
    truncated = blob[: len(blob) - cut]
    with pytest.raises(ValueError):
        _y4m_parse(truncated)


# ---------------------------------------------------------------------------
# hypothesis: the NTILE(k) closed form used by agg_equidepth_histogram
# (pure arithmetic, no Spark) — for any n ≥ k, applying the formula to
# every rank 1..n must reproduce exactly the SQL NTILE distribution:
# the first n%k buckets hold n//k+1 rows, the rest n//k, and buckets
# are assigned in rank order.
# ---------------------------------------------------------------------------
@given(st.integers(8, 5000))
def test_equidepth_ntile_closed_form(n):
    k = 8
    q, m = divmod(n, k)

    def bucket(r):
        big = m * (q + 1)
        if r <= big:
            return (r + q) // (q + 1)
        return m + (r - m * (q + 1) + q - 1) // q

    buckets = [bucket(r) for r in range(1, n + 1)]
    # Non-decreasing, starts at 1, ends at k.
    assert buckets[0] == 1 and buckets[-1] == k
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(buckets, buckets[1:]))
    from collections import Counter

    sizes = Counter(buckets)
    for b in range(1, k + 1):
        assert sizes[b] == q + 1 if b <= m else sizes[b] == q


# ---------------------------------------------------------------------------
# hypothesis: Morton interleave (pure-Python model of storage._zvalue)
# — z-order must agree with the bit-interleave definition, and within
# any aligned 2^b × 2^b tile the z-values must be contiguous (the
# property that makes range-partitioned files cover small rectangles).
# ---------------------------------------------------------------------------
def _py_zvalue(a: int, b: int, bits: int = 10) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@given(st.integers(0, 1023), st.integers(0, 1023), st.integers(0, 4))
def test_zvalue_tile_contiguity(a, b, tile_bits):
    # All cells of the aligned 2^t × 2^t tile containing (a, b) form a
    # CONTIGUOUS z-range of exactly 4^t values.
    t = tile_bits
    a0, b0 = (a >> t) << t, (b >> t) << t
    zs = [
        _py_zvalue(a0 + i, b0 + j)
        for i in range(1 << t)
        for j in range(1 << t)
    ]
    assert max(zs) - min(zs) == (1 << (2 * t)) - 1
    assert len(set(zs)) == 1 << (2 * t)


# ---------------------------------------------------------------------------
# hypothesis: PNG build→parse round-trip — the decoder's un-filtering
# (all five PNG filter types) must recover the exact cycled pixel
# plane the encoder filtered+deflated, for ANY payload; truncation
# anywhere must raise (CRC or length validation).
# ---------------------------------------------------------------------------
@settings(deadline=None)  # first example pays the module-import cost
@given(st.binary(min_size=0, max_size=1024))
def test_png_roundtrip_any_payload(payload):
    from fluent_bit_filter_math_spark.operators.multimodal import (
        _PNG_H_MOD,
        _PNG_W_MOD,
        _png_build,
        _png_parse,
    )

    n = len(payload)
    w, h = 4 + n % _PNG_W_MOD, 2 + n % _PNG_H_MOD
    src = payload if payload else b"\x00"
    plane = (src * (w * h // len(src) + 1))[: w * h]
    assert _png_parse(_png_build(payload)) == (
        w,
        h,
        w * h,
        sum(plane),
        sum((i + 1) * b for i, b in enumerate(plane)),
    )


@given(st.binary(min_size=1, max_size=256), st.integers(1, 40))
def test_png_truncation_always_valueerror(payload, cut):
    import pytest

    from fluent_bit_filter_math_spark.operators.multimodal import (
        _png_build,
        _png_parse,
    )

    blob = _png_build(payload)
    cut = min(cut, len(blob) - 9)  # keep at least the signature + a byte
    with pytest.raises(ValueError):
        _png_parse(blob[: len(blob) - cut])


# ---------------------------------------------------------------------------
# GIF LZW codec — property: decode(encode(x)) == x for ARBITRARY byte
# strings, any min-code-size the format allows. Random exploration on
# top of the fixed adversarial cases in test_extensions (width
# boundaries, full-table CLEAR, cScSc): hypothesis shrinks any
# counterexample to a minimal payload.
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    data=st.binary(max_size=4000),
    mcs=st.integers(min_value=2, max_value=8),
)
def test_gif_lzw_roundtrip_property(data, mcs):
    from fluent_bit_filter_math_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    clipped = bytes(b & ((1 << mcs) - 1) for b in data)
    enc = _gif_lzw_encode(mcs, clipped)
    assert _gif_lzw_decode(mcs, enc, len(clipped) + 1) == clipped
