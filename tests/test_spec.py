"""Config-layer parity tests (configure, /root/reference/filter_math/math.c:37-132)."""

import pytest

from fluent_bit_filter_math_spark.spec import (
    ConstOperand,
    FieldOperand,
    MathSpec,
    Operation,
    SpecError,
    parse_constant,
)


class TestOperationResolution:
    # 3-char case-insensitive prefix match (math.c:54-66)
    @pytest.mark.parametrize(
        "name,expected",
        [
            ("sum", Operation.SUM),
            ("SUM", Operation.SUM),
            ("summation", Operation.SUM),
            ("sub", Operation.SUB),
            ("subtract", Operation.SUB),
            ("SUBTRACTION", Operation.SUB),
            ("mul", Operation.MUL),
            ("multiply", Operation.MUL),
            ("div", Operation.DIV),
            ("division", Operation.DIV),
            ("DIVIDE", Operation.DIV),
        ],
    )
    def test_prefix_match(self, name, expected):
        assert Operation.resolve(name) is expected

    @pytest.mark.parametrize("bad", ["", "s", "su", "mod", "power", "add"])
    def test_invalid_operation(self, bad):
        with pytest.raises(SpecError):
            Operation.resolve(bad)


class TestConstants:
    # strtod → int truncation toward zero; 0 rejected (math.c:99-103)
    @pytest.mark.parametrize(
        "raw,expected",
        [("7", 7), ("1.9", 1), ("-2.9", -2), ("  42abc", 42), ("3e2", 300)],
    )
    def test_truncation(self, raw, expected):
        assert parse_constant(raw).value == expected

    @pytest.mark.parametrize("raw", ["0", "0.4", "-0.9", "abc", ""])
    def test_zero_rejected(self, raw):
        with pytest.raises(SpecError):
            parse_constant(raw)


class TestSpecValidation:
    def test_output_field_required(self):
        with pytest.raises(SpecError, match="output_field"):
            MathSpec.from_properties(
                [("operation", "sum"), ("field", "a"), ("field", "b")]
            )

    def test_two_operands_required(self):
        with pytest.raises(SpecError, match="two operands"):
            MathSpec.build("sum", ["a"], "out")

    def test_unknown_key_rejected(self):
        with pytest.raises(SpecError, match="Invalid configuration key"):
            MathSpec.from_properties(
                [("operation", "sum"), ("fields", "a"), ("output_field", "o")]
            )

    def test_operand_order_preserved(self):
        spec = MathSpec.from_properties(
            [
                ("operation", "sub"),
                ("field", "a"),
                ("constant", "2"),
                ("field", "b"),
                ("output_field", "o"),
            ]
        )
        assert spec.operands == (
            FieldOperand("a"),
            ConstOperand(2),
            FieldOperand("b"),
        )

    def test_cast_to_int_parse(self):
        spec = MathSpec.from_properties(
            [
                ("operation", "sum"),
                ("field", "a"),
                ("field", "b"),
                ("output_field", "o"),
                ("cast_to_int", "On"),
            ]
        )
        assert spec.cast_to_int is True

    def test_bad_bool_rejected(self):
        with pytest.raises(SpecError):
            MathSpec.from_properties(
                [
                    ("operation", "sum"),
                    ("field", "a"),
                    ("field", "b"),
                    ("output_field", "o"),
                    ("cast_to_int", "maybe"),
                ]
            )
