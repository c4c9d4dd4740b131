"""Central registry mapping query names → (Spark builder, DuckDB oracle SQL).

The driver contract (__spark_entry__.py) needs two parallel dicts:
``queries()[name](spark, sf_dir) -> DataFrame`` and ``oracle_sql()[name]``
— ANSI SQL DuckDB runs over the same parquet tables. Operator modules
register here via :func:`register`; queries whose semantics aren't
SQL-expressible (LSH bucketing, stateful streaming) register with
``oracle=None`` and get the driver's weaker rows-only check.

Registration order is preserved (dict insertion order) so the benchmark
runs queries in a stable, documented order.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every operator module for its registration side effects."""
    global _LOADED
    if _LOADED:
        return
    # Imports deferred so `import registry` alone has no Spark dependency cost.
    from fluent_bit_filter_math_spark.operators import (  # noqa: F401
        mathfold,
        relational,
        dedup,
        similarity,
        text,
        multimodal,
        temporal,
        sql_functions,
        subqueries,
        python_udfs,
    )
    from fluent_bit_filter_math_spark.streaming import (  # noqa: F401
        dedup as stream_dedup,
        stateful,
        windows,
    )

    _LOADED = True
