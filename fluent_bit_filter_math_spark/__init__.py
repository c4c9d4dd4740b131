"""fluent_bit_filter_math_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference ``fopina/fluent-bit-filter-math`` (a Fluent Bit C filter plugin
that applies an ordered arithmetic fold over record fields — see
/root/reference/filter_math/math.c), re-expressed Spark-first:

* the reference's config surface becomes :class:`~.spec.MathSpec` — a
  validated logical spec (≈ ``configure``, math.c:37-132);
* the per-record fold becomes a native Catalyst ``Column`` expression
  tree built by :mod:`~.compile` (≈ ``map_operate_fn``, math.c:167-195) —
  zero Python UDFs on this surface, so the whole pipeline stays inside
  whole-stage codegen and needs no shuffle (narrow, element-wise);
* batch and Structured Streaming application live in :mod:`~.pipeline`
  (≈ ``cb_math_filter``, math.c:290-366).

Extensions beyond the reference surface (relational operators, event-time
windows, dedup, similarity search, text analysis, multimodal columns) are
in :mod:`~.operators` and :mod:`~.streaming`, designed for 100 TB scale:
broadcast-able dims, single-shuffle aggs, LSH instead of O(n²) joins.
"""

from fluent_bit_filter_math_spark.spec import (
    ConstOperand,
    FieldOperand,
    MathSpec,
    Operation,
    SpecError,
)
from fluent_bit_filter_math_spark.compile import compile_spec, apply_spec
from fluent_bit_filter_math_spark.pipeline import apply_specs, route_by_tag

__all__ = [
    "MathSpec",
    "Operation",
    "FieldOperand",
    "ConstOperand",
    "SpecError",
    "compile_spec",
    "apply_spec",
    "apply_specs",
    "route_by_tag",
]

__version__ = "0.1.0"
