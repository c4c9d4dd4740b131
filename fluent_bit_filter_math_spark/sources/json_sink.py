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

import json
import os
import uuid

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
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


class JsonLinesSink(DataSource):
    """``df.write.format("jsonsink").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonsink"

    def writer(self, schema, overwrite: bool) -> JsonLinesWriter:
        return JsonLinesWriter(self.options)


def register_json_sink(spark: SparkSession) -> None:
    """Idempotent registration of the sink on a session."""
    spark.dataSource.register(JsonLinesSink)
