"""Round 13b: deletion vectors + change data feed on the commit-log
table format.

DV contract under test: a ``delete`` commit attaches position sidecars
to live files WITHOUT touching them — readers subtract positions, time
travel still sees the rows, sidecars union under overlapping deletes,
compaction/merge materialize the logical (post-DV) content, vacuum
reclaims superseded sidecars, and the incremental stream source refuses
the now non-append history. CDF contract: row-level inserts/deletes
between versions derive from the log alone, with delete rows recovered
by position from the untouched data files.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from tests.conftest import reader_rows
from fluent_bit_filter_math_spark.sources.table_format import (
    ConcurrentOverwrite,
    _dv_indexes,
    _dv_write,
    _resolve,
    latest_version,
    tf_append,
    tf_changes,
    tf_compact,
    tf_delete,
    tf_merge,
    tf_read,
    tf_vacuum,
    write_checkpoint,
)


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )


def _table(spark, tmp_path, name="t"):
    t = str(tmp_path / name)
    for lo in (0, 100, 200, 300):
        tf_append(_mk(spark, lo, lo + 100).coalesce(1), t)
    return t


def _live(t):
    files, _, _ = _resolve(t, latest_version(t))
    return files


class TestDeletionVectors:
    def test_sidecar_roundtrip_dedups_and_sorts(self, tmp_path):
        t = str(tmp_path)
        rel = _dv_write(t, [5, 1, 5, 3, 1])
        assert list(_dv_indexes(t, rel)) == [1, 3, 5]
        assert rel.startswith("_dv/")

    def test_delete_is_logical(self, spark, tmp_path):
        t = _table(spark, tmp_path)
        pre = latest_version(t)
        data_files = {rel for rel, _, _ in _live(t)}
        v, dvd, nomatch, skipped = tf_delete(
            spark, t, [("k", ">=", 390)]
        )
        # stats prune the three low files; only the last gains a DV
        assert (dvd, nomatch, skipped) == (1, 0, 3)
        assert {rel for rel, _, _ in _live(t)} == data_files
        ks = {r.k for r in tf_read(spark, t, version=v).collect()}
        assert len(ks) == 390 and 390 not in ks and 389 in ks
        # time travel: the rows were never physically removed
        assert tf_read(spark, t, version=pre).count() == 400
        # every original data file still on disk, untouched
        for rel in data_files:
            assert os.path.exists(os.path.join(t, rel))

    def test_overlapping_delete_unions_positions(self, spark, tmp_path):
        t = _table(spark, tmp_path)
        tf_delete(spark, t, [("k", ">=", 390)])
        # wider overlapping range: already-deleted rows are idempotent
        v2, dvd, nomatch, _ = tf_delete(spark, t, [("k", ">=", 380)])
        assert (dvd, nomatch) == (1, 0)
        entries = {rel: dv for rel, _, dv in _live(t)}
        dvs = [dv for dv in entries.values() if dv]
        assert len(dvs) == 1
        assert len(_dv_indexes(t, dvs[0])) == 20  # 380..399 once each
        assert tf_read(spark, t, version=v2).count() == 380

    def test_delete_nothing_is_a_noop(self, spark, tmp_path):
        t = _table(spark, tmp_path)
        head = latest_version(t)
        v, dvd, nomatch, skipped = tf_delete(spark, t, [("k", ">", 999)])
        assert v == head and dvd == 0
        # all four candidates were skipped by stats alone
        assert skipped == 4 and nomatch == 0
        # fully-deleted-already is also a no-op commit-wise
        tf_delete(spark, t, [("k", ">=", 395)])
        h2 = latest_version(t)
        v2, dvd2, nomatch2, _ = tf_delete(spark, t, [("k", ">=", 395)])
        assert v2 == h2 and dvd2 == 0 and nomatch2 == 1

    def test_compact_materializes_deletes(self, spark, tmp_path):
        t = _table(spark, tmp_path)
        tf_delete(spark, t, [("k", "<", 10)])
        v = tf_compact(spark, t, n_files=2)
        assert tf_read(spark, t, version=v).count() == 390
        # rewritten files carry no DVs
        assert all(dv is None for _, _, dv in _live(t))
        # deleted rows stay gone
        ks = {r.k for r in tf_read(spark, t).collect()}
        assert min(ks) == 10

    def test_merge_does_not_resurrect_dv_deleted_rows(
        self, spark, tmp_path
    ):
        t = _table(spark, tmp_path)
        tf_delete(spark, t, [("k", "=", 350)])
        ch = spark.createDataFrame(
            [(360, 8888, False)], "k long, v long, _delete boolean"
        )
        v, rewritten, untouched = tf_merge(spark, t, ch, "k")
        assert (rewritten, untouched) == (1, 3)
        snap = {r.k: r.v for r in tf_read(spark, t, version=v).collect()}
        assert 350 not in snap and snap[360] == 8888
        assert len(snap) == 399

    def test_vacuum_reclaims_superseded_sidecars(self, spark, tmp_path):
        t = _table(spark, tmp_path)
        tf_delete(spark, t, [("k", ">=", 390)])
        first_dv = [dv for _, _, dv in _live(t) if dv][0]
        tf_delete(spark, t, [("k", ">=", 380)])
        second_dv = [dv for _, _, dv in _live(t) if dv][0]
        assert first_dv != second_dv
        doomed = tf_vacuum(t, keep_from_version=latest_version(t))
        assert first_dv in doomed
        assert second_dv not in doomed
        # no data file was reclaimed: all are still live
        assert all(not d.endswith(".parquet") for d in doomed)
        assert tf_read(spark, t).count() == 380

    def test_checkpoint_carries_dv_state(self, spark, tmp_path):
        t = _table(spark, tmp_path)
        tf_delete(spark, t, [("k", ">=", 395)])
        v = write_checkpoint(t)
        before = sorted(_live(t))
        # checkpoint-accelerated resolve == raw replay
        assert tf_read(spark, t, version=v).count() == 395
        for f in os.listdir(os.path.join(t, "_log")):
            if f.endswith(".checkpoint.json"):
                os.remove(os.path.join(t, "_log", f))
        assert sorted(_live(t)) == before
        assert tf_read(spark, t, version=v).count() == 395

    def test_pre_dv_checkpoint_still_readable(self, spark, tmp_path):
        t = _table(spark, tmp_path)
        v = write_checkpoint(t)
        p = os.path.join(t, "_log", f"{v:08d}.checkpoint.json")
        with open(p) as f:
            state = json.load(f)
        # rewrite as a pre-DV 2-element checkpoint
        state["live"] = {
            rel: e[:2] for rel, e in state["live"].items()
        }
        os.remove(p)
        with open(p, "w") as f:
            json.dump(state, f)
        assert tf_read(spark, t, version=v).count() == 400

    def test_stream_source_refuses_delete_commits(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            TableFormatStreamReader,
        )

        t = _table(spark, tmp_path)
        tf_delete(spark, t, [("k", ">=", 399)])
        r = TableFormatStreamReader({"path": t})
        r.initialOffset()
        with pytest.raises(ValueError, match="append-only"):
            r.partitions(
                {"version": -1}, {"version": latest_version(t)}
            )


class TestChangeDataFeed:
    def test_append_delete_changes(self, spark, tmp_path):
        t = _table(spark, tmp_path)
        tf_delete(spark, t, [("k", ">=", 390)])
        ch = tf_changes(spark, t, 0, latest_version(t))
        agg = {
            (r._commit_version, r._change_type): r.n
            for r in ch.groupBy("_commit_version", "_change_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert agg == {
            (0, "insert"): 100,
            (1, "insert"): 100,
            (2, "insert"): 100,
            (3, "insert"): 100,
            (4, "delete"): 10,
        }
        # the delete rows carry the deleted VALUES
        dels = {
            r.k
            for r in ch.filter(F.col("_change_type") == "delete").collect()
        }
        assert dels == set(range(390, 400))

    def test_second_delete_emits_only_new_positions(
        self, spark, tmp_path
    ):
        t = _table(spark, tmp_path)
        tf_delete(spark, t, [("k", ">=", 390)])
        v2, _, _, _ = tf_delete(spark, t, [("k", ">=", 380)])
        ch = tf_changes(spark, t, v2, v2)
        dels = {r.k for r in ch.collect()}
        assert dels == set(range(380, 390))  # 390+ already deleted

    def test_overwrite_emits_delete_plus_insert(self, spark, tmp_path):
        t = str(tmp_path / "ow")
        tf_append(_mk(spark, 0, 10).coalesce(1), t)
        tf_delete(spark, t, [("k", "=", 0)])
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_overwrite,
        )

        v = tf_overwrite(_mk(spark, 100, 105).coalesce(1), t)
        ch = tf_changes(spark, t, v, v)
        dels = {r.k for r in ch.filter(
            F.col("_change_type") == "delete").collect()}
        ins = {r.k for r in ch.filter(
            F.col("_change_type") == "insert").collect()}
        # the overwritten rows are the THEN-LIVE ones (DV applied)
        assert dels == set(range(1, 10))
        assert ins == set(range(100, 105))

    def test_compact_emits_nothing(self, spark, tmp_path):
        t = _table(spark, tmp_path)
        v = tf_compact(spark, t, n_files=1)
        assert tf_changes(spark, t, v, v).count() == 0

    def test_bad_range_raises(self, spark, tmp_path):
        t = _table(spark, tmp_path)
        with pytest.raises(ValueError, match="outside"):
            tf_changes(spark, t, 0, 99)


class TestDeleteConcurrency:
    def test_delete_after_interloper_raises(
        self, spark, tmp_path, monkeypatch
    ):
        """A commit landing between the delete's snapshot read and its
        publish must raise, not attach DVs computed from a stale live
        set."""
        import fluent_bit_filter_math_spark.sources.table_format as tfm

        t = _table(spark, tmp_path)
        real = tfm.latest_version
        calls = {"n": 0}

        def stale(path):
            calls["n"] += 1
            if calls["n"] == 1:
                return real(path)  # the snapshot read
            # afterwards the log has grown under us
            return real(path) + 1

        monkeypatch.setattr(tfm, "latest_version", stale)
        with pytest.raises(ConcurrentOverwrite):
            tf_delete(spark, t, [("k", ">=", 399)])


class TestCdfStreamReader:
    """Unit-level pins of the changefeed stream reader: partition
    planning straight off the log and executor-side position reads,
    without spinning the streaming engine."""

    def _drain(self, t, lo, hi):
        from fluent_bit_filter_math_spark.sources.table_format import (
            TableFormatCdfStreamReader,
        )

        r = TableFormatCdfStreamReader({"path": t})
        r.initialOffset()
        rows = []
        for p in r.partitions({"version": lo}, {"version": hi}):
            rows.extend(reader_rows(r, p))
        return rows

    def test_delete_then_overwrite_excludes_dv_rows(
        self, spark, tmp_path
    ):
        from fluent_bit_filter_math_spark.sources.table_format import (
            tf_overwrite,
        )

        t = str(tmp_path / "cdf1")
        tf_append(_mk(spark, 0, 100).coalesce(1), t)          # v0
        tf_delete(spark, t, [("k", ">=", 90)])                # v1
        tf_overwrite(_mk(spark, 1000, 1005).coalesce(1), t)   # v2
        rows = self._drain(t, -1, 2)
        by = {}
        for *vals, ct, v in rows:
            by.setdefault((v, ct), set()).add(vals[0])
        assert by[(0, "insert")] == set(range(100))
        assert by[(1, "delete")] == set(range(90, 100))
        # the overwrite's deletes are the THEN-LIVE rows: the DV'd
        # 90..99 must NOT be re-deleted
        assert by[(2, "delete")] == set(range(90))
        assert by[(2, "insert")] == set(range(1000, 1005))

    def test_compact_version_emits_nothing(self, spark, tmp_path):
        t = str(tmp_path / "cdf2")
        tf_append(_mk(spark, 0, 50).coalesce(1), t)           # v0
        tf_delete(spark, t, [("k", "<", 5)])                  # v1
        v = tf_compact(spark, t, n_files=1)                   # v2
        assert self._drain(t, v - 1, v) == []
        # and the full drain equals insert 50 + delete 5
        rows = self._drain(t, -1, v)
        kinds = {}
        for *_, ct, _v in rows:
            kinds[ct] = kinds.get(ct, 0) + 1
        assert kinds == {"insert": 50, "delete": 5}

    def test_schema_splices_change_columns(self, spark, tmp_path):
        from fluent_bit_filter_math_spark.sources.table_format import (
            TableFormatDataSource,
        )

        t = str(tmp_path / "cdf3")
        tf_append(_mk(spark, 0, 5).coalesce(1), t)
        ds = TableFormatDataSource({"path": t, "changefeed": "true"})
        s = ds.schema()
        assert s.endswith(",_change_type:string,_commit_version:bigint>")
        plain = TableFormatDataSource({"path": t}).schema()
        assert "_change_type" not in plain
