"""Table catalog over the driver-generated parquet fixtures.

The reference has no sources at all — bytes are pushed into the filter
(/root/reference/filter_math/math.c:290-296). The engine's sources are
Spark's built-in readers; this module is the thin catalog over the
TESTDATA.md layout (`{sf_dir}/{table}.parquet`). Reading through here
keeps column pruning + predicate pushdown intact (plain
``spark.read.parquet``, no eager caching or collecting).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = frozenset({"region", "nation"})


# Tables whose fixture parquet carries TIMESTAMP(NANOS) columns, which the
# Spark 4 vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL). We read
# them via the legacy nanos-as-long path and truncate ns → µs with integer
# division — truncation, not rounding, to match how DuckDB (the correctness
# oracle) coerces timestamp_ns to its native µs timestamps.
_NANOS_TS_TABLES = {"events": ("ts",)}

# Per-path cache of the reader's INFERRED schema (metadata only, never
# data): the fixtures are deterministic read-only parquet, so the first
# read's footer inference fully determines every later read's schema —
# re-inferring runs one driver-side footer job per `table()` call
# (measured ~150 ms vs ~40 ms with an explicit schema; a bench rep
# issues hundreds of reads). This is the fixture-catalog twin of the
# commit-log snapshot-schema read (guide §6 — Delta/Iceberg readers
# never infer, the metadata layer already knows). Keyed per process;
# repopulated on first use after any restart, so nothing persists.
_SCHEMA_CACHE: dict[str, object] = {}


def _read_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    cached = _SCHEMA_CACHE.get(path)
    if cached is not None:
        return spark.read.schema(cached).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_CACHE[path] = df.schema
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Event-time expressions (window/date_trunc/date_format) interpret
    # TimestampType in the session timezone; the DuckDB oracle is
    # TZ-naive. Pin UTC here so results are driver-session-independent
    # (the verification driver owns its own SparkSession).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name in _NANOS_TS_TABLES:
        # Runtime-settable SQL conf; only affects NANOS columns, so leaving
        # it on is harmless for the µs timestamps in the other tables.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_cached_schema(spark, path)
        for c in _NANOS_TS_TABLES[name]:
            if dict(df.dtypes).get(c) == "bigint":
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return df
    return _read_cached_schema(spark, path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
