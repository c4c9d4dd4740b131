"""Custom Python DataSource WRITER: a JSON-lines sink.

The reference pipeline's output side is Fluent Bit's stdout plugin
printing msgpack records as JSON lines (/root/reference/test.sh:30-43).
`sources/io.py` maps that to the built-in console/json sinks;
this module closes the OTHER half of the Python DataSource API story
(the `mem` input connector in mem_input.py is the read side): a
batch writer whose per-partition `write()` tasks emit newline-delimited
JSON shards, with the executor→driver commit protocol carrying shard
manifests.

Scale shape: each write task streams its partition to its own shard
file and returns only a (path, row-count) commit message; the driver
sees manifests, never rows — the same contract as a real distributed
committer. Abort removes the written shards (best-effort cleanup on
task/job failure).

Float discipline: callers send integer/string columns only (cents, not
doubles) — JSON text round-trips of arbitrary doubles are
engine-asymmetric, integers are exact.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonsink requires a 'path' option")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(self.path, f"part-{uuid.uuid4().hex}.json")
        n = 0
        with open(shard, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), separators=(",", ":")))
                f.write("\n")
                n += 1
        return _ShardCommit(shard, n)

    def commit(self, messages):
        manifest = os.path.join(self.path, "_MANIFEST.json")
        shards = [
            {"path": m.path, "rows": m.n_rows} for m in messages if m
        ]
        with open(manifest, "w", encoding="utf-8") as f:
            json.dump({"shards": shards}, f)

    def abort(self, messages):
        for m in messages:
            if m is not None:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


class JsonLinesStreamWriter(DataSourceStreamWriter):
    """Per-epoch twin of :class:`JsonLinesWriter` — the fourth Python
    DataSource quadrant (batch reader/writer and streaming reader exist
    in mem_input.py / above; this is the STREAMING writer).

    Exactly-once protocol: each micro-batch's tasks stream their
    partitions to private shard files and return (path, rows) commit
    messages; the driver-side ``commit(messages, batchId)`` publishes
    ``_MANIFEST-<batchId>.json`` via write-to-temp + ``os.replace`` —
    atomic AND idempotent, so a batch REPLAYED after a crash between
    sink commit and checkpoint commit (same batchId by the microbatch
    contract) atomically supersedes its own manifest instead of
    double-counting. Readers consume only manifested shards
    (:func:`read_manifested`), so orphans from failed/retried tasks or
    superseded replays are invisible — the same commit-log discipline
    as the built-in file sink's _spark_metadata, in ~30 lines of
    user-level DataSource API.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonsink requires a 'path' option")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(self.path, f"part-{uuid.uuid4().hex}.json")
        n = 0
        with open(shard, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), separators=(",", ":")))
                f.write("\n")
                n += 1
        return _ShardCommit(shard, n)

    def commit(self, messages, batchId: int) -> None:
        manifest = os.path.join(self.path, f"_MANIFEST-{batchId:09d}.json")
        shards = [
            {"path": m.path, "rows": m.n_rows} for m in messages if m
        ]
        tmp = manifest + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"batch_id": batchId, "shards": shards}, f)
        os.replace(tmp, manifest)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


def read_manifested(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Batch-read ONLY the shards recorded by committed manifests.

    Glob reads would double-count orphan part files left by retried
    tasks or superseded batch replays; the manifest set is the committed
    truth (one manifest per epoch for the stream writer, a single
    ``_MANIFEST.json`` for the batch writer).
    """
    shard_paths: list[str] = []
    for mf in sorted(glob.glob(os.path.join(path, "_MANIFEST*.json"))):
        with open(mf, encoding="utf-8") as f:
            shard_paths.extend(s["path"] for s in json.load(f)["shards"])
    return spark.read.schema(schema).json(shard_paths)


class JsonLinesSink(DataSource):
    """``df.write.format("jsonsink").option("path", dir).save()`` and
    ``df.writeStream.format("jsonsink").option("path", dir)...``."""

    @classmethod
    def name(cls) -> str:
        return "jsonsink"

    def writer(self, schema, overwrite: bool) -> JsonLinesWriter:
        return JsonLinesWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> JsonLinesStreamWriter:
        return JsonLinesStreamWriter(self.options)


def register_json_sink(spark: SparkSession) -> None:
    """Idempotent registration of the sink on a session."""
    spark.dataSource.register(JsonLinesSink)
