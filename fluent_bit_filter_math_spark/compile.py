"""Compile a MathSpec into a native Catalyst Column expression.

The reference evaluates the fold per record with function-pointer
dispatch (map_operate_fn, /root/reference/filter_math/math.c:167-195;
kernels math.c:197-215). Here the fold is *plan-time* expression
construction: the first operand seeds the accumulator (math.c:186-188)
and each subsequent operand is folded left-to-right (math.c:190). The
result is one Column — Catalyst constant-folds literal prefixes, fuses
stacked specs into a single projection (CollapseProject), and Tungsten
runs it in whole-stage codegen. No UDFs, no shuffle: the entire
reference surface is a narrow, element-wise stage.

Division (math.c:212-215) is plain C double division in the reference,
i.e. IEEE-754: x/0 → ±inf, 0/0 → NaN. Spark and DuckDB both yield NULL
instead (with ANSI off / try_divide). ``div_mode`` picks:

* ``"null"`` (default): ``try_divide`` — NULL on zero divisor. Agrees
  with the DuckDB oracle bit-for-bit.
* ``"ieee"``: an explicit when-guard reproducing ±inf/NaN, matching the
  reference's C semantics (SURVEY.md §7.3 decision).
"""

from __future__ import annotations

import math as _math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.coerce import resolve_field
from fluent_bit_filter_math_spark.spec import (
    ConstOperand,
    FieldOperand,
    MathSpec,
    Operation,
)

_INF = float("inf")
_NAN = float("nan")


def _ieee_div(acc: Column, v: Column) -> Column:
    """C double division semantics: x/0 → ±inf, 0/0 → NaN (math.c:212-215)."""
    return (
        F.when(
            v == F.lit(0.0),
            F.when(acc > F.lit(0.0), F.lit(_INF))
            .when(acc < F.lit(0.0), F.lit(-_INF))
            .otherwise(F.lit(_NAN)),
        )
        .otherwise(F.try_divide(acc, v))
    )


_FOLDS = {
    Operation.SUM: lambda a, b: a + b,  # apply_sum, math.c:197-200
    Operation.SUB: lambda a, b: a - b,  # apply_sub, math.c:202-205
    Operation.MUL: lambda a, b: a * b,  # apply_mul, math.c:207-210
    # DIV handled per div_mode (apply_div, math.c:212-215)
}


def operand_expr(df: DataFrame, operand, json_cols=("props",)) -> Column:
    if isinstance(operand, ConstOperand):
        # Config-time literal already int-truncated (math.c:181-182).
        return F.lit(float(operand.value))
    if isinstance(operand, FieldOperand):
        return resolve_field(df, operand.name, json_cols)
    raise TypeError(f"unknown operand {operand!r}")


def compile_spec(
    spec: MathSpec, df: DataFrame, json_cols=("props",)
) -> Column:
    """spec → one Column implementing the ordered left fold."""
    exprs = [operand_expr(df, op, json_cols) for op in spec.operands]
    if spec.operation is Operation.DIV:
        fold = _ieee_div if spec.div_mode == "ieee" else F.try_divide
    else:
        fold = _FOLDS[spec.operation]
    result = reduce(fold, exprs)
    if spec.cast_to_int:
        # double → integral truncates toward zero in Spark, matching the C
        # (int) cast (math.c:258-259); we widen int → long for 100 TB sanity.
        result = result.cast("long")
    return result


def apply_spec(df: DataFrame, spec: MathSpec, json_cols=("props",)) -> DataFrame:
    """Append the result column (overwrite on name collision — documented
    divergence from the reference's duplicate-key quirk, math.c:245-262)."""
    return df.withColumn(spec.output_field, compile_spec(spec, df, json_cols))
