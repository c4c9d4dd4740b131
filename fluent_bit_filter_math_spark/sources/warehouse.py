"""Bucketed managed tables — co-located joins without a shuffle.

The reference has no storage layer at all (bytes in, bytes out —
/root/reference/filter_math/math.c:290-296,356-357); this is pure
extension surface, and it is THE lever for repeated fact-fact joins at
100 TB: a join between two tables bucketed by the join key into the
same bucket count needs no Exchange on either side — each task reads
bucket i of both tables. The shuffle is paid ONCE at write time and
amortized over every subsequent join/aggregation on that key, instead
of re-shuffling ~100 TB per query.

Spark only recognizes bucketing metadata on *managed tables* (the
parquet files alone don't carry it), hence ``saveAsTable`` against the
session warehouse rather than ``save(path)``. ``sortBy`` additionally
orders rows inside each bucket file so single-file buckets skip the
sort-merge-join sort.

The no-Exchange property is pinned in ``tests/test_scale.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and optionally
    sorted) by the given columns. Joins/aggregations keyed on
    ``bucket_cols`` against any table with the SAME bucket count then run
    shuffle-free."""
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    missing = [c for c in bucket_cols if c not in df.columns]
    if missing:
        raise ValueError(f"bucket columns not in DataFrame: {missing}")
    if mode == "overwrite":
        # saveAsTable(overwrite) replaces a *catalogued* table fine, but a
        # location left by a previous process (in-memory catalog, durable
        # filesystem) fails with LOCATION_ALREADY_EXISTS — clear both.
        df.sparkSession.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a managed bucketed table (the bucketing metadata rides along,
    which a raw ``spark.read.parquet`` of the same files would lose)."""
    return spark.table(table_name)
