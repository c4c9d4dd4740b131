"""Round-16 optimization pins: the disjunctive point-lookup scan
(`tf_scan_any`), the snapshot-schema parse helper (`_snapshot_struct`),
and the Arrow-batch stream readers' row fidelity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.sources.table_format import (
    TableFormatStreamReader,
    _snapshot_struct,
    tf_append,
    tf_pruned_files,
    tf_read,
    tf_scan,
    tf_scan_any,
)
from tests.conftest import reader_rows


def _clustered_table(spark, tmp_path) -> str:
    """Four appends with disjoint key ranges so per-value stats
    pruning actually drops files."""
    t = str(tmp_path / "t")
    for lo in (0, 100, 200, 300):
        df = spark.range(lo, lo + 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        tf_append(df.coalesce(1), t)
    return t


class TestTfScanAny:
    def test_rows_match_per_value_union(self, spark, tmp_path):
        t = _clustered_table(spark, tmp_path)
        values = [5, 150, 320]
        got = tf_scan_any(spark, t, "k", values)
        want = None
        for v in values:
            s = tf_scan(spark, t, [("k", "=", v)])
            want = s if want is None else want.unionByName(s)
        assert sorted(got.collect()) == sorted(want.collect())
        assert sorted(r["k"] for r in got.collect()) == values

    def test_keeps_union_of_surviving_files(self, spark, tmp_path):
        t = _clustered_table(spark, tmp_path)
        # each probed value prunes to 1 of 4 files; the disjunction
        # must keep exactly the union (2 files), not all 4
        kept_5, total = tf_pruned_files(t, [("k", "=", 5)])
        kept_150, _ = tf_pruned_files(t, [("k", "=", 150)])
        assert total == 4 and len(kept_5) == 1 and len(kept_150) == 1
        got = tf_scan_any(spark, t, "k", [5, 150])
        assert sorted(r["k"] for r in got.collect()) == [5, 150]

    def test_empty_values_yields_empty(self, spark, tmp_path):
        t = _clustered_table(spark, tmp_path)
        assert tf_scan_any(spark, t, "k", []).count() == 0

    def test_absent_value_yields_no_rows(self, spark, tmp_path):
        t = _clustered_table(spark, tmp_path)
        assert tf_scan_any(spark, t, "k", [99999]).count() == 0

    def test_version_pinning(self, spark, tmp_path):
        t = _clustered_table(spark, tmp_path)
        v_old = 1  # only the first two appends visible
        got = tf_scan_any(spark, t, "k", [5, 150, 320], version=v_old)
        assert sorted(r["k"] for r in got.collect()) == [5, 150]


class TestSnapshotStruct:
    def test_parses_simple_string_form(self, spark):
        st = _snapshot_struct("struct<k:bigint,v:bigint>")
        assert st is not None
        assert [f.name for f in st.fields] == ["k", "v"]

    def test_parses_ddl_form(self, spark):
        st = _snapshot_struct("k BIGINT, v STRING")
        assert st is not None and len(st.fields) == 2

    def test_nested_types(self, spark):
        st = _snapshot_struct(
            "struct<a:array<int>,b:struct<x:double,y:string>>"
        )
        assert st is not None and len(st.fields) == 2

    def test_garbage_returns_none(self, spark):
        assert _snapshot_struct("not a schema <<<") is None
        assert _snapshot_struct("") is None
        assert _snapshot_struct(None) is None

    def test_snapshot_read_matches_inference(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.range(10).select(
            F.col("id").alias("k"),
            F.col("id").cast("double").alias("d"),
            F.col("id").cast("string").alias("s"),
        )
        tf_append(df, t)
        got = tf_read(spark, t)
        # file sources read all-nullable (footer inference does too);
        # names and types must match exactly
        assert [(f.name, f.dataType) for f in got.schema.fields] == [
            (f.name, f.dataType) for f in df.schema.fields
        ]
        assert sorted(got.collect()) == sorted(df.collect())


class TestArrowStreamReaderRows:
    def test_plain_reader_yields_batches_with_same_rows(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "t")
        df = spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        tf_append(df, t)
        r = TableFormatStreamReader({"path": t})
        rows = []
        for p in r.partitions({"version": -1}, {"version": 0}):
            rows.extend(reader_rows(r, p))
        assert sorted(rows) == sorted(
            (row["k"], row["v"]) for row in df.collect()
        )
