"""Round-16 pins: ADVICE r15 fixes (bloom type canonicalization,
append TOCTOU, delete no-op protocol, legacy merge replay), the
executor-side bloom build, sort-clustered compaction, and the
index-maintenance / cross-epoch / classifier-eval lifecycle queries'
non-oracle invariants."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.sources.table_format import (
    _bloom_build,
    _bloom_might_contain,
    _log_path,
    committed_merge_txn_ids,
    latest_version,
    tf_append,
    tf_compact,
    tf_delete,
    tf_merge,
    tf_pruned_files,
    tf_read,
    tf_vacuum,
)


class TestBloomTypeCanonicalization:
    """ADVICE r15 #1: numerically-equal values of different runtime
    types must hash to the same bit positions on build AND probe."""

    def test_int_probe_hits_float_built_bloom(self):
        bloom = _bloom_build([7.0, 8.0, 9.5])
        assert _bloom_might_contain(bloom, 7)
        assert _bloom_might_contain(bloom, 8)
        assert _bloom_might_contain(bloom, 9.5)

    def test_float_probe_hits_int_built_bloom(self):
        bloom = _bloom_build([7, 8, 1000])
        assert _bloom_might_contain(bloom, 7.0)
        assert _bloom_might_contain(bloom, 8.0)
        assert _bloom_might_contain(bloom, 1000.0)

    def test_bool_canonicalizes_with_int(self):
        bloom = _bloom_build([True, False])
        assert _bloom_might_contain(bloom, 1)
        assert _bloom_might_contain(bloom, 0)

    def test_decimal_canonicalizes_with_int(self):
        from decimal import Decimal

        bloom = _bloom_build([Decimal("7"), Decimal("2.5")])
        assert _bloom_might_contain(bloom, 7)
        assert _bloom_might_contain(bloom, 2.5)

    def test_absent_value_still_prunes(self):
        bloom = _bloom_build([7, 8, 9])
        assert not _bloom_might_contain(bloom, 12345678)
        assert not _bloom_might_contain(bloom, "12345678x")

    def test_legacy_bloom_probes_with_legacy_keys(self):
        # a persisted bloom without the scheme tag was built with
        # str() keys: the probe must fall back to them (int 7 under
        # str() is "7", not "7.0")
        import base64

        from fluent_bit_filter_math_spark.sources.table_format import (
            _bloom_positions,
        )

        m = 640
        bits = bytearray(m // 8)
        for v in (7, 8, 9):
            for pos in _bloom_positions(v, m, scheme="legacy"):
                bits[pos // 8] |= 1 << (pos % 8)
        legacy = {
            "m": m,
            "k": 7,
            "b64": base64.b64encode(bytes(bits)).decode(),
        }
        assert _bloom_might_contain(legacy, 7)
        assert _bloom_might_contain(legacy, "7")
        assert not _bloom_might_contain(legacy, 12345)

    def test_truncated_payload_keeps_file_not_indexerror(self):
        bloom = _bloom_build(list(range(100)))
        bloom["b64"] = bloom["b64"][:8]  # decoded length << m/8
        assert _bloom_might_contain(bloom, 7) is True

    def test_malformed_b64_keeps_file(self):
        assert _bloom_might_contain({"m": 64, "b64": 123}, 7) is True
        assert _bloom_might_contain({}, 7) is True


class TestDeleteNoopProtocol:
    """ADVICE r15 #3: a DELETE matching nothing must not commit at
    all — in particular it must not bump min_reader_version and lock
    out older readers for a no-op."""

    def test_unmatched_delete_commits_nothing(self, tmp_path, spark):
        t = str(tmp_path / "t")
        tf_append(spark.range(10).withColumn("v", F.col("id") * 2), t)
        head0 = latest_version(t)
        version, dv_files, empty_cands, skipped = tf_delete(
            spark, t, [("id", ">", 1000)]
        )
        assert version == head0
        assert latest_version(t) == head0  # no commit in the log
        assert dv_files == 0

    def test_matched_delete_still_bumps_protocol(self, tmp_path, spark):
        t = str(tmp_path / "t")
        tf_append(spark.range(10).withColumn("v", F.col("id") * 2), t)
        version, dv_files, _, _ = tf_delete(spark, t, [("id", "=", 3)])
        assert dv_files == 1
        with open(_log_path(t, version)) as f:
            commit = json.load(f)
        assert "min_reader_version" in commit


class TestLegacyMergeReplayGuard:
    """ADVICE r15 #5: merges recorded under the legacy batch_id key
    (pre-namespace-split tables) must keep replay protection."""

    def _legacy_merge_commit(self, t: str, batch_id: int) -> None:
        v = latest_version(t) + 1
        payload = {
            "version": v,
            "action": "merge",
            "add": [],
            "remove": [],
            "schema": "struct<id:bigint,v:bigint>",
            "batch_id": batch_id,
        }
        with open(_log_path(t, v), "x") as f:
            f.write(json.dumps(payload, sort_keys=True))

    def test_legacy_id_counts_as_committed(self, tmp_path, spark):
        t = str(tmp_path / "t")
        tf_append(spark.range(5).withColumn("v", F.col("id")), t)
        self._legacy_merge_commit(t, 42)
        assert 42 in committed_merge_txn_ids(t)

    def test_replayed_legacy_merge_noops(self, tmp_path, spark):
        t = str(tmp_path / "t")
        tf_append(spark.range(5).withColumn("v", F.col("id")), t)
        self._legacy_merge_commit(t, 42)
        head = latest_version(t)
        changes = spark.createDataFrame(
            [(1, 99, False)], "id long, v long, _delete boolean"
        )
        version, rewritten, _ = tf_merge(
            spark, t, changes, "id", batch_id=42
        )
        assert version == head and rewritten == 0  # replay no-op
        assert latest_version(t) == head

    def test_append_epoch_id_does_not_leak_into_merges(
        self, tmp_path, spark
    ):
        # an APPEND epoch with the same numeric id must NOT no-op a
        # merge (the r14 namespace split, preserved by the transition)
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_append_batch,
        )

        t = str(tmp_path / "t")
        tf_append(spark.range(5).withColumn("v", F.col("id")), t)
        tf_append_batch(
            spark.createDataFrame([(100, 1)], "id long, v long"), t, 7
        )
        assert 7 not in committed_merge_txn_ids(t)


class TestExecutorSideBloom:
    """VERDICT r15 #3: _stage builds per-file blooms in executor
    tasks; bytes must equal a driver-side reference build."""

    def test_bloom_bytes_match_reference(self, tmp_path, spark):
        import pyarrow.parquet as pq

        from fluent_bit_filter_math_spark.sources.table_format import (
            _resolve,
        )

        t = str(tmp_path / "t")
        df = spark.range(100).select(
            F.col("id"), F.md5(F.col("id").cast("string")).alias("h")
        ).repartition(3)
        tf_append(df, t, bloom_columns=("h",))
        files, _, _ = _resolve(t, latest_version(t))
        assert len(files) >= 2
        for rel, stats, _ in files:
            got = stats["h"]["bloom"]
            tbl = pq.read_table(os.path.join(t, rel), columns=["h"])
            expect = _bloom_build(tbl.column("h").to_pylist())
            assert got == expect

    def test_skipping_still_works_after_executor_build(
        self, tmp_path, spark
    ):
        t = str(tmp_path / "t")
        df = spark.range(1000).select(
            F.col("id"), F.md5(F.col("id").cast("string")).alias("h")
        ).repartition(4)
        tf_append(df, t, bloom_columns=("h",))
        import hashlib

        present = hashlib.md5(b"7").hexdigest()
        kept_p, total = tf_pruned_files(t, [("h", "=", present)])
        kept_a, _ = tf_pruned_files(t, [("h", "=", "nope")])
        assert total == 4
        assert len(kept_a) == 0  # absent value prunes everything
        assert 1 <= len(kept_p) <= total


class TestClusterByCompaction:
    """tf_compact(cluster_by=...): sort-based rewrite keeps the
    probe-key file pruning that bin-pack coalesce would destroy."""

    def test_clustered_rewrite_prunes(self, tmp_path, spark):
        t = str(tmp_path / "t")
        df = spark.range(400).select(
            (F.col("id") % 4).alias("band"),
            F.col("id").cast("string").alias("key"),
            F.col("id").alias("doc_id"),
        )
        # three trickle appends -> 3 commits of small files
        for i in range(3):
            tf_append(df.filter(F.col("doc_id") % 3 == i), t)
        v = tf_compact(spark, t, cluster_by=("band", "key"), n_files=4)
        kept, total = tf_pruned_files(t, [("band", "=", 2)])
        assert total == 4
        assert len(kept) < total
        # row-identical across the rewrite
        assert tf_read(spark, t, v).count() == 400
        # and vacuum reclaims the trickle generation
        removed = tf_vacuum(t, v)
        assert len(removed) >= 3
        assert tf_read(spark, t).count() == 400

    def test_cluster_and_zorder_exclusive(self, tmp_path, spark):
        t = str(tmp_path / "t")
        tf_append(spark.range(10).withColumn("v", F.col("id")), t)
        with pytest.raises(ValueError):
            tf_compact(
                spark, t, zorder_by=("id", "v"), cluster_by=("id",)
            )


class TestAppendToctou:
    """ADVICE r15 #2: metadata is pinned to a pre-stage read_version,
    so a schema/rename commit landing DURING staging is refused by the
    rebase interleave scan instead of committing stale files."""

    def test_append_batch_refuses_interleaved_schema(
        self, tmp_path, spark, monkeypatch
    ):
        import fluent_bit_filter_math_spark.sources.table_format as tf

        t = str(tmp_path / "t")
        tf_append(spark.range(5).withColumn("v", F.col("id")), t)

        real_stage = tf._stage

        def stage_with_interleaved_rename(df, table_path, bloom=()):
            out = real_stage(df, table_path, bloom)
            # a rename lands AFTER metadata was read + files staged
            tf.tf_rename_column(t, "v", "v2")
            return out

        monkeypatch.setattr(tf, "_stage", stage_with_interleaved_rename)
        with pytest.raises(tf.ConcurrentOverwrite):
            tf.tf_append_batch(
                spark.createDataFrame([(100, 1)], "id long, v long"),
                t,
                3,
            )
