"""Dynamic field access + numeric coercion — Spark form of find_operand_val.

The reference scans the record map for a case-insensitive key match and
coerces u64/i64/f32/f64 to double; a missing key or a non-numeric value
contributes 0.0 (/root/reference/filter_math/math.c:146-165).

Our data model splits a record into (a) typed top-level columns and (b) an
optional JSON "props"-style column carrying the truly dynamic fields. The
resolution order for an operand named ``f`` is:

1. a DataFrame column whose name matches ``f`` case-insensitively →
   ``try_cast`` to double (non-numeric string/array/… → NULL);
2. else each configured JSON column, parsed to ``map<string,string>`` →
   ``try_element_at(m, lower(f))`` → try_cast. Case-insensitivity comes
   from lowercasing the raw JSON *string* before parsing — that lowers
   keys without a higher-order function (``transform_keys`` + Python
   lambda costs seconds of codegen per query; ``lower`` is free), and
   only numeric values matter downstream, which ``lower`` can't change;
3. whatever survives is wrapped in ``coalesce(..., 0.0)`` so missing and
   non-numeric both coerce to 0.0, exactly like the reference.

Everything is a native Column expression inside whole-stage codegen.
``try_cast`` / ``try_element_at`` (not ``cast`` / ``element_at``) keep
the semantics identical whether or not the session runs in ANSI mode
(Spark 4 defaults ANSI on — and the verification driver owns the session).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DYNAMIC_MAP_TYPE = T.MapType(T.StringType(), T.StringType())


def lowered_json_map(json_col: Column) -> Column:
    """Parse a flat JSON object column into map<lower(key) -> string value>."""
    return F.from_json(F.lower(json_col), _DYNAMIC_MAP_TYPE)


def resolve_field(
    df: DataFrame, name: str, json_cols: Sequence[str] = ("props",)
) -> Column:
    """Operand value for field ``name`` with coerce-to-zero semantics."""
    candidates: list[Column] = []
    lowered = name.lower()
    by_lower = {c.lower(): c for c in df.columns}
    if lowered in by_lower:
        candidates.append(F.col(by_lower[lowered]).try_cast("double"))
    else:
        for jc in json_cols:
            if jc.lower() in by_lower:
                m = lowered_json_map(F.col(by_lower[jc.lower()]))
                candidates.append(
                    F.try_element_at(m, F.lit(lowered)).try_cast("double")
                )
    candidates.append(F.lit(0.0))
    return F.coalesce(*candidates)
