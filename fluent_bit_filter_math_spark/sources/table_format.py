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


def committed_batch_ids(table_path: str) -> set[int]:
    """Streaming-sink replay guard: the set of foreachBatch epoch ids
    already committed to the log."""
    out: set[int] = set()
    for v in range(latest_version(table_path) + 1):
        with open(_log_path(table_path, v)) as f:
            b = json.load(f).get("batch_id")
        if b is not None:
            out.add(int(b))
    return out


def tf_append_batch(df: DataFrame, table_path: str, batch_id: int) -> int | None:
    """Exactly-once streaming append: one commit per micro-batch epoch,
    idempotent under foreachBatch replay (Spark re-runs a failed epoch
    with the SAME batch_id — if the log already holds that epoch, the
    replay is a no-op instead of a duplicate append; the same contract
    Delta's `txn` action gives idempotent writers). Returns the
    committed version, or None when the epoch was already in the log."""
    if batch_id in committed_batch_ids(table_path):
        return None
    add, schema = _stage(df, table_path)
    version = latest_version(table_path) + 1
    payload = {
        "version": version,
        "action": "append",
        "add": add,
        "remove": [],
        "schema": schema,
        "batch_id": int(batch_id),
    }
    os.makedirs(os.path.join(table_path, _LOG_DIR), exist_ok=True)
    try:
        with open(_log_path(table_path, version), "x") as f:
            f.write(json.dumps(payload, sort_keys=True))
            f.flush()
            os.fsync(f.fileno())
    except FileExistsError as exc:
        raise CommitConflict(
            f"version {version} already committed"
        ) from exc
    return version


def tf_compact(spark: SparkSession, table_path: str) -> int:
    """Small-file compaction as ONE commit: read the live snapshot,
    rewrite it as a single right-sized file set, publish add(compacted)
    + remove(all prior live) atomically. Readers of the latest snapshot
    flip file sets at the commit boundary; time travel still resolves
    every older version (dead files stay on disk until vacuum) — the
    OPTIMIZE/rewrite_data_files recipe."""
    head = latest_version(table_path)
    files, _ = _replay(table_path, head)
    snap = spark.read.parquet(*files)
    remove = [os.path.relpath(p, table_path) for p in files]
    add, schema = _stage(snap.coalesce(1), table_path)
    version = head + 1
    _publish(table_path, version, add, remove, schema, "compact")
    return version


def tf_vacuum(table_path: str, keep_from_version: int) -> list[str]:
    """Physically delete data files not live in ANY snapshot >=
    *keep_from_version* (retention cutoff). Time travel to vacuumed
    versions then fails at scan time — exactly Delta/Iceberg VACUUM /
    expire_snapshots semantics. Returns the deleted relative paths."""
    head = latest_version(table_path)
    keep: set[str] = set()
    for v in range(max(0, keep_from_version), head + 1):
        files, _ = _replay(table_path, v)
        keep.update(os.path.relpath(p, table_path) for p in files)
    ever: set[str] = set()
    for v in range(head + 1):
        with open(_log_path(table_path, v)) as f:
            ever.update(json.load(f).get("add", []))
    doomed = sorted(ever - keep)
    for rel in doomed:
        p = os.path.join(table_path, rel)
        if os.path.exists(p):
            os.remove(p)
    return doomed


@register(
    "stream_table_format_sink",
    oracle="""
    SELECT CAST(event_id % 16 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT) + user_id)
                AS BIGINT) AS fold_cents
    FROM events
    WHERE event_id % 4 = 1
    GROUP BY shard ORDER BY shard
    """,
)
def stream_table_format_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming half of the commit-log table: a bounded events
    replay folds cents+user (the reference's SUM chain, math.c:197-200)
    and lands EVERY micro-batch as one idempotent log commit via
    foreachBatch + tf_append_batch — a replayed epoch is a no-op, so
    the table holds each record exactly once; the result re-reads the
    LATEST SNAPSHOT through the log (never a directory listing)."""
    import pyspark.sql.functions as F

    from fluent_bit_filter_math_spark.functions import exact_cents
    from fluent_bit_filter_math_spark.pipeline import read_events_stream
    from fluent_bit_filter_math_spark.scratch import scratch_dir
    from fluent_bit_filter_math_spark.sources import table

    # build the bounded source from the fixture (nanos-safe via table())
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 4 == 1)
    base = scratch_dir("tf-stream")
    src = os.path.join(base, "src")
    # multiple source files => multiple micro-batches with
    # maxFilesPerTrigger=1 (the established replay recipe)
    ev.select("event_id", "user_id", "value").repartition(3).write.parquet(
        src
    )
    stream = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    folded = stream.select(
        "event_id",
        "user_id",
        (exact_cents(F.col("value")) + F.col("user_id")).alias("fold"),
    )
    tpath = os.path.join(base, "table")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        tf_append_batch(batch_df, tpath, batch_id)
        # replay the SAME epoch: must be a no-op (exactly-once pinning
        # inside the query itself, not just the unit test)
        assert tf_append_batch(batch_df, tpath, batch_id) is None

    ckpt = os.path.join(base, "ckpt")
    q = (
        folded.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import pyspark.sql.functions as F2

    snap = tf_read(spark, tpath)
    return (
        snap.groupBy((F2.col("event_id") % 16).alias("shard"))
        .agg(
            F2.count("*").cast("long").alias("n_rows"),
            F2.sum("fold").cast("long").alias("fold_cents"),
        )
        .select(F2.col("shard").cast("long"), "n_rows", "fold_cents")
        .orderBy("shard")
    )
