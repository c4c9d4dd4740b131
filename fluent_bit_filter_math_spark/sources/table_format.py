"""Minimal lakehouse table format: a JSON commit-log over parquet with
snapshot isolation, time travel, and optimistic concurrency.

The reference's only persistence is an output plugin writing records to
a sink (/root/reference/test.sh:42 `stdout`); a production deployment of
the same pipeline lands results in a TABLE whose readers must never see
a half-written batch. This module is the smallest honest version of the
public lakehouse recipe (Delta Lake's `_delta_log` JSON actions,
Iceberg's snapshot+manifest chain — Armbrust et al., VLDB'20 "Delta
Lake: High-Performance ACID Table Storage over Cloud Object Stores"):

* A table is a directory of immutable parquet DATA FILES plus a
  ``_log/`` directory of numbered JSON COMMITS (`00000000.json`, ...).
* Each commit holds ``add`` (data files made live) and ``remove``
  (files made dead) lists plus the writer's schema DDL. A snapshot at
  version V = replay commits 0..V, live set = Σadd − Σremove.
* Writers stage parquet under a UUID subdirectory first, then publish
  with ONE ``open(log, "x")`` exclusive create — the commit either
  exists completely or not at all, so readers get snapshot isolation
  without locks, and two racing writers of the same version lose
  deterministically (optimistic concurrency: the loser retries on top
  of the winner — Delta's commit protocol, collapsed to a local FS).
* Readers NEVER list data files (the object-store-listing trap the
  log-structured design exists to avoid): the live set comes from the
  log alone, so `spark.read.parquet(*live_files)` scans exactly one
  snapshot — time travel is replaying a shorter prefix.

Scale shape: the log is O(commits) tiny JSON — the 100 TB of data sits
in parquet that Spark scans with full pushdown/pruning (the read path
IS `spark.read.parquet`, so PushedFilters/partition pruning work
unchanged); snapshot resolution is a driver-side replay of the commit
chain, exactly like Delta/Iceberg metadata handling.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from fluent_bit_filter_math_spark.registry import register

_LOG_DIR = "_log"
_WIDTH = 8


class CommitConflict(Exception):
    """Another writer published this version first (optimistic
    concurrency loss) — re-read the latest snapshot and retry."""


def _log_path(table_path: str, version: int) -> str:
    return os.path.join(
        table_path, _LOG_DIR, f"{version:0{_WIDTH}d}.json"
    )


def latest_version(table_path: str) -> int:
    """Highest committed version, or -1 for a not-yet-created table."""
    log = os.path.join(table_path, _LOG_DIR)
    if not os.path.isdir(log):
        return -1
    versions = [
        int(f[: -len(".json")])
        for f in os.listdir(log)
        if f.endswith(".json") and f[: -len(".json")].isdigit()
    ]
    return max(versions, default=-1)


def _replay(table_path: str, version: int) -> tuple[list[str], str]:
    """(live data files, schema DDL) of the snapshot at *version*."""
    live: dict[str, None] = {}  # insertion-ordered set
    schema = ""
    for v in range(version + 1):
        p = _log_path(table_path, v)
        with open(p) as f:
            commit = json.load(f)
        for rel in commit.get("remove", []):
            live.pop(rel, None)
        for rel in commit.get("add", []):
            live[rel] = None
        schema = commit.get("schema", schema)
    return [os.path.join(table_path, rel) for rel in live], schema


def _stage(df: DataFrame, table_path: str) -> tuple[list[str], str]:
    """Write *df* as parquet under a fresh UUID subdir; return the
    RELATIVE staged file paths and the schema DDL. Staged files are
    invisible until a commit references them (readers never list)."""
    sub = f"data-{uuid.uuid4().hex[:12]}"
    out = os.path.join(table_path, sub)
    df.write.parquet(out)
    rels = [
        os.path.join(sub, f)
        for f in sorted(os.listdir(out))
        if f.endswith(".parquet")
    ]
    return rels, df.schema.simpleString()


def _publish(
    table_path: str,
    version: int,
    add: list[str],
    remove: list[str],
    schema: str,
    action: str,
) -> None:
    payload = json.dumps(
        {
            "version": version,
            "action": action,
            "add": add,
            "remove": remove,
            "schema": schema,
        },
        sort_keys=True,
    )
    os.makedirs(os.path.join(table_path, _LOG_DIR), exist_ok=True)
    path = _log_path(table_path, version)
    try:
        # "x": the atomic publish — exactly one writer can create this
        # version file; a loser sees FileExistsError, never a torn log.
        with open(path, "x") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
    except FileExistsError as exc:
        raise CommitConflict(
            f"version {version} already committed at {path}"
        ) from exc


def tf_append(df: DataFrame, table_path: str) -> int:
    """Append *df* as a new commit; returns the committed version."""
    add, schema = _stage(df, table_path)
    version = latest_version(table_path) + 1
    _publish(table_path, version, add, [], schema, "append")
    return version


def tf_overwrite(df: DataFrame, table_path: str) -> int:
    """Replace the table's contents with *df* (logical delete: prior
    files become dead in the log but stay on disk, which is what makes
    time travel free until a vacuum)."""
    version = latest_version(table_path) + 1
    if version > 0:
        prior, _ = _replay(table_path, version - 1)
        remove = [os.path.relpath(p, table_path) for p in prior]
    else:
        remove = []
    add, schema = _stage(df, table_path)
    _publish(table_path, version, add, remove, schema, "overwrite")
    return version


def tf_read(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read. ``version=None`` reads the latest; an integer
    time-travels. An empty live set returns an empty frame with the
    snapshot's schema (overwrite-with-nothing stays readable)."""
    head = latest_version(table_path)
    if head < 0:
        raise FileNotFoundError(f"no table at {table_path}")
    v = head if version is None else version
    if not 0 <= v <= head:
        raise ValueError(f"version {v} outside [0, {head}]")
    files, schema = _replay(table_path, v)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*files)


@register(
    "io_table_format_snapshot",
    oracle="""
    WITH v0 AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0
    ),
    v1 AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 1
    ),
    v2 AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 5 = 0
    ),
    snap1 AS (SELECT * FROM v0 UNION ALL SELECT * FROM v1),
    cents AS (
      SELECT 1 AS version, o_orderkey,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
      FROM snap1
      UNION ALL
      SELECT 2, o_orderkey,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
      FROM v2
    )
    SELECT CAST(version AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(c) AS BIGINT) AS total_cents,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM cents GROUP BY version ORDER BY version
    """,
)
def io_table_format_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a commit-log table from orders (append, append, overwrite),
    then verify BOTH time travel and the latest snapshot against the
    log-free closed form: snapshot@1 = the two appended subsets,
    snapshot@2 = only the overwrite's subset — proving dead files stay
    out of the scan and time travel replays exactly the prefix.
    Reference analogue: durable, atomic output for the filter pipeline
    (test.sh:42's stdout sink, productionized)."""
    import pyspark.sql.functions as F

    from fluent_bit_filter_math_spark.functions import exact_cents
    from fluent_bit_filter_math_spark.scratch import scratch_dir
    from fluent_bit_filter_math_spark.sources import table

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = scratch_dir("table-format")
    tpath = os.path.join(base, "orders_tf")
    tf_append(orders.filter(F.col("o_orderkey") % 3 == 0), tpath)
    tf_append(orders.filter(F.col("o_orderkey") % 3 == 1), tpath)
    tf_overwrite(orders.filter(F.col("o_orderkey") % 5 == 0), tpath)

    def _summary(df: DataFrame, version: int) -> DataFrame:
        return df.agg(
            F.lit(version).cast("long").alias("version"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum(exact_cents(F.col("o_totalprice")))
            .cast("long")
            .alias("total_cents"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )

    snap1 = tf_read(spark, tpath, version=1)  # time travel
    snap2 = tf_read(spark, tpath)  # latest
    return (
        _summary(snap1, 1).unionAll(_summary(snap2, 2)).orderBy("version")
    )
