"""Fold-semantics parity tests against a pure-Python reference fold.

The invariants from SURVEY.md §2.1: left fold seeded by the first
operand; missing/non-numeric fields → 0.0; case-insensitive keys;
constant truncation; cast_to_int truncation toward zero; IEEE ±inf/NaN
division in ieee mode; malformed/NULL records coerce like the C.
"""

import math

import pytest
from pyspark.sql import Row

from fluent_bit_filter_math_spark.compile import apply_spec
from fluent_bit_filter_math_spark.pipeline import apply_specs
from fluent_bit_filter_math_spark.spec import MathSpec


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        Row(id=1, a=10.0, b=4.0, s="notnum", props='{"K": 2, "x": "str"}'),
        Row(id=2, a=-3.5, b=0.0, s="7.5", props='{"k": -1}'),
        Row(id=3, a=0.0, b=0.0, s=None, props=None),
        Row(id=4, a=None, b=2.0, s="2", props='{"k": 1.5}'),
    ]
    return spark.createDataFrame(rows)


def _col(df, name):
    return [r[name] for r in df.orderBy("id").collect()]


class TestFolds:
    def test_sum_left_fold(self, records):
        out = apply_spec(records, MathSpec.build("sum", ["a", "b", 2], "o"))
        assert _col(out, "o") == [16.0, -1.5, 2.0, 4.0]

    def test_sub_left_assoc(self, records):
        out = apply_spec(records, MathSpec.build("sub", ["a", "b", 1], "o"))
        # a - b - 1, with NULL a → 0
        assert _col(out, "o") == [5.0, -4.5, -1.0, -3.0]

    def test_mul(self, records):
        out = apply_spec(records, MathSpec.build("mul", ["a", "b"], "o"))
        assert _col(out, "o") == [40.0, -0.0, 0.0, 0.0]

    def test_div_null_mode(self, records):
        out = apply_spec(records, MathSpec.build("div", ["a", "b"], "o"))
        assert _col(out, "o") == [2.5, None, None, 0.0]

    def test_div_ieee_mode(self, records):
        out = apply_spec(
            records, MathSpec.build("div", ["a", "b"], "o", div_mode="ieee")
        )
        vals = _col(out, "o")
        assert vals[0] == 2.5
        assert vals[1] == -math.inf  # -3.5 / 0 → -inf (math.c:212-215)
        assert math.isnan(vals[2])  # 0 / 0 → NaN
        assert vals[3] == 0.0  # NULL→0, 0/2

    def test_string_numeric_coerces(self, records):
        # s='7.5' coerces to 7.5; s='notnum'/NULL → 0 (math.c:151-164)
        out = apply_spec(records, MathSpec.build("sum", ["a", "s"], "o"))
        assert _col(out, "o") == [10.0, 4.0, 0.0, 2.0]

    def test_json_props_field(self, records):
        # K matched case-insensitively through the props map; non-numeric
        # x → 0; NULL props → 0
        out = apply_spec(records, MathSpec.build("sum", ["a", "k"], "o"))
        assert _col(out, "o") == [12.0, -4.5, 0.0, 1.5]
        out2 = apply_spec(records, MathSpec.build("sum", ["a", "x"], "o"))
        assert _col(out2, "o") == [10.0, -3.5, 0.0, 0.0]

    def test_missing_field_is_zero(self, records):
        out = apply_spec(records, MathSpec.build("sum", ["a", "nope"], "o"))
        assert _col(out, "o") == [10.0, -3.5, 0.0, 0.0]

    def test_case_insensitive_column(self, records):
        out = apply_spec(records, MathSpec.build("sum", ["A", "B"], "o"))
        assert _col(out, "o") == [14.0, -3.5, 0.0, 2.0]

    def test_cast_to_int_truncates_toward_zero(self, records):
        out = apply_spec(
            records, MathSpec.build("div", ["a", "b"], "o", cast_to_int=True)
        )
        # 10/4 = 2.5 → 2; -3.5/0 NULL → NULL; 0/0 NULL; 0/2 → 0
        assert _col(out, "o") == [2, None, None, 0]

    def test_overwrite_semantics(self, records):
        # Divergence from the reference's duplicate-key quirk (math.c:245-262)
        out = apply_spec(records, MathSpec.build("sum", ["a", "b"], "a"))
        assert _col(out, "a") == [14.0, -3.5, 0.0, 2.0]
        assert out.columns.count("a") == 1

    def test_chained_specs(self, records):
        out = apply_specs(
            records,
            [
                MathSpec.build("mul", ["a", 2], "t"),
                MathSpec.build("sum", ["t", "b"], "o"),
            ],
        )
        assert _col(out, "o") == [24.0, -7.0, 0.0, 2.0]

    def test_constant_seed_first(self, records):
        # Constant can seed the fold: 100 - a
        out = apply_spec(records, MathSpec.build("sub", [100, "a"], "o"))
        assert _col(out, "o") == [90.0, 103.5, 100.0, 100.0]


class TestPlanShape:
    def test_no_shuffle_no_udf(self, records):
        out = apply_specs(
            records,
            [
                MathSpec.build("sum", ["a", "b"], "x"),
                MathSpec.build("mul", ["x", 2], "y"),
            ],
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # narrow, element-wise
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
