"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``fluent_bit_filter_math_spark`` package;
this module only adapts it to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference smoke scenario (/root/reference/test.sh:17-43): all four
    math-fold ops over the events stream, fused by Catalyst into a single
    narrow projection — no shuffle, no UDFs, whole-stage codegen.
    """
    from fluent_bit_filter_math_spark.operators.mathfold import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from fluent_bit_filter_math_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (where the
    semantics are SQL-expressible; LSH/stateful ops get rows-only checks)."""
    from fluent_bit_filter_math_spark.registry import all_oracles

    return all_oracles()
