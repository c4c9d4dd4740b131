"""Round 14, part 1: the ADVICE r13 fixes.

1. _rows_at_positions reads with mergeSchema (position-addressed reads
   across evolved writer schemas must not drop columns),
2. CHECK-constraint races: append rebase over an interleaved
   constraint commit re-validates; restore validates resurrected rows,
3. kafka wire: unknown compression flags answer protocol errors on
   both the produce and fetch paths (never a snappy-sealed echo),
4. Avro union encode falls through to the next accepting branch when
   the type-witness choice fails to encode,
5. the baseline re-anchor tool refuses plan-changed movers.
"""

from __future__ import annotations

import json
import os
import socket
import struct

import pytest
import pyspark.sql.functions as F

from fluent_bit_filter_math_spark.sources import table_format as tf
from fluent_bit_filter_math_spark.sources.avro_ocf import (
    _enc_any,
    _enc_string,
    _zigzag_encode,
)


# ---------------------------------------------------------------------------
# 1+2 — table-format constraint races + evolved position reads
# ---------------------------------------------------------------------------
class TestConstraintRaces:
    def _fresh(self, tmp_path, spark, n=20):
        t = str(tmp_path / "t")
        df = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
        tf.tf_append(df, t)
        return t

    def test_append_rebase_revalidates_interleaved_constraint(
        self, tmp_path, spark
    ):
        t = self._fresh(tmp_path, spark)
        # a writer validates (no constraints yet), stages, and then an
        # interleaved constraint commit lands before its publish
        bad = spark.range(5).select(
            F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
        )
        tf._validate_constraints(bad, t, "append")  # passes: none yet
        staged_read = tf.latest_version(t)
        add, schema = tf._stage(
            tf._to_physical_df(bad, tf.tf_column_mapping(t)), t
        )
        tf.tf_set_constraint(spark, t, "v_nonneg", "v >= 0")
        with pytest.raises(tf.ConstraintViolation):
            tf._commit_with_rebase(
                t, add, [], schema, "append", staged_read, 5,
                revalidate=lambda: tf._validate_constraints(
                    bad, t, "append (rebased)"
                ),
            )
        # nothing published past the constraint commit
        assert tf.latest_version(t) == staged_read + 1
        # the same race with VALID data lands fine
        good = spark.range(5).select(
            F.col("id").alias("k"), F.lit(7).cast("long").alias("v")
        )
        v = tf.tf_append(good, t)
        assert v == staged_read + 2

    def test_restore_validates_resurrected_rows(self, tmp_path, spark):
        t = self._fresh(tmp_path, spark)
        pre = tf.latest_version(t)
        # delete the rows that would violate the upcoming constraint,
        # then add it (validates over the shrunken live set: passes)
        tf.tf_delete(spark, t, [("k", ">=", 15)])
        tf.tf_set_constraint(spark, t, "k_small", "k < 15")
        # restoring past the delete would resurrect k >= 15 rows that
        # violate the now-active constraint — refused, nothing published
        head = tf.latest_version(t)
        with pytest.raises(tf.ConstraintViolation):
            tf.tf_restore(t, pre)
        assert tf.latest_version(t) == head
        # dropping the constraint lets the same restore through
        tf.tf_drop_constraint(t, "k_small")
        v = tf.tf_restore(t, pre)
        assert tf.tf_read(spark, t, version=v).count() == 20

    def test_rows_at_positions_merges_evolved_schemas(
        self, tmp_path, spark
    ):
        t = str(tmp_path / "t")
        tf.tf_append(
            spark.range(4).select(F.col("id").alias("k")), t
        )
        tf.tf_append(
            spark.range(4, 8).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("extra")
            ),
            t,
        )
        files, _, evolved = tf._resolve(t, tf.latest_version(t))
        assert evolved
        pairs = [(rel, [0]) for rel, _, _ in files]
        got = tf._rows_at_positions(spark, t, pairs)
        # the evolved-only column must survive a position-addressed
        # read that spans both generations
        assert "extra" in got.columns
        assert got.count() == len(pairs)


# ---------------------------------------------------------------------------
# 3 — kafka wire unknown compression flags
# ---------------------------------------------------------------------------
class TestKafkaWireUnknownFlags:
    def _rpc(self, port, body):
        from fluent_bit_filter_math_spark.sources.kafka_wire import _rpc

        return _rpc(port, body)

    def test_fetch_unknown_flag_is_protocol_error(self):
        from fluent_bit_filter_math_spark.sources.kafka_wire import (
            MiniBroker,
        )

        b = MiniBroker()
        try:
            topic = b"t"
            body = (
                bytes([0x46])
                + struct.pack(">H", len(topic))
                + topic
                + struct.pack(">i", 0)
                + struct.pack(">q", 0)
                + struct.pack(">i", -1)
                + bytes([7])  # unknown compression flag
            )
            resp = self._rpc(b.port, body)
            (count,) = struct.unpack_from(">i", resp, 0)
            assert count == -1  # protocol error, not a sealed echo
        finally:
            b.stop()

    def test_produce2_unknown_flag_rejected_and_log_unchanged(self):
        from fluent_bit_filter_math_spark.sources.kafka_wire import (
            MiniBroker,
        )

        b = MiniBroker()
        try:
            topic = b"t"
            body = (
                bytes([0x51])
                + struct.pack(">H", len(topic))
                + topic
                + bytes([7])  # unknown flag
                + struct.pack(">qii", 0, 0, 1)
                + b"junk"
            )
            resp = self._rpc(b.port, body)
            (ack,) = struct.unpack_from(">q", resp, 0)
            assert ack == -1
            assert b.logs == {}
        finally:
            b.stop()

    def test_seal_section_rejects_unknown_flag(self):
        from fluent_bit_filter_math_spark.sources.kafka_wire import (
            _seal_section,
        )

        with pytest.raises(ValueError):
            _seal_section(b"abc", 7)


# ---------------------------------------------------------------------------
# 4 — Avro union encode fallback
# ---------------------------------------------------------------------------
class TestUnionEncodeFallback:
    MAP_THEN_RECORD = [
        {"type": "map", "values": "long"},
        {
            "type": "record",
            "name": "R",
            "fields": [{"name": "s", "type": "string"}],
        },
    ]

    def test_falls_through_to_record_branch(self):
        # dict matches the MAP branch by type, but its string value
        # cannot encode as a long — the record branch must win
        got = _enc_any(self.MAP_THEN_RECORD, {"s": "hi"})
        assert got == _zigzag_encode(1) + _enc_string("hi")

    def test_map_branch_still_wins_when_it_encodes(self):
        got = _enc_any(self.MAP_THEN_RECORD, {"s": 5})
        assert got.startswith(_zigzag_encode(0))

    def test_all_accepting_branches_failing_raises(self):
        with pytest.raises(ValueError, match="failed to encode"):
            _enc_any([{"type": "map", "values": "long"}], {"s": "hi"})


# ---------------------------------------------------------------------------
# 5 — re-anchor tool refuses plan-changed movers
# ---------------------------------------------------------------------------
class TestReanchorGuard:
    def _load_tool(self):
        import importlib.util

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "baseline_reanchor_r13b.py",
        )
        spec = importlib.util.spec_from_file_location("reanchor", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_plan_changed_mover_refused(self, tmp_path, monkeypatch,
                                        capsys):
        mod = self._load_tool()
        monkeypatch.chdir(tmp_path)
        (tmp_path / "BENCH_DETAIL.json").write_text(json.dumps(
            {"warm": {"q_a": 9.0, "q_b": 9.0},
             "cold": {"q_a": 9.5, "q_b": 9.5}}
        ))
        (tmp_path / "BASELINE.md").write_text(
            "| q_a | 1.0000 | 1.1000 | 5 |\n"
            "| q_b | 1.0000 | 1.1000 | 5 |\n"
        )
        (tmp_path / "PLANS.md").write_text(
            "| q_a | 2 | 0 | 0 | 0 | 1 | 1 |\n"
            "| q_b | 2 | 0 | 0 | 0 | 1 | 1 |\n"
        )
        # anchor-era plans: q_a's fingerprint differed (plan changed
        # since the anchor), q_b's matches (pure era shift)
        monkeypatch.setattr(
            mod, "_anchor_era_plans",
            lambda: {"q_a": "9 | 9 | 9 | 9 | 9 | 9",
                     "q_b": "2 | 0 | 0 | 0 | 1 | 1"},
        )
        mod.main(["--apply"])
        out = capsys.readouterr().out
        assert "REFUSED" in out and "q_a" in out
        text = (tmp_path / "BASELINE.md").read_text()
        assert "| q_a | 1.0000 |" in text  # refused: anchor untouched
        assert "| q_b | 9.0000 |" in text  # era shift: re-anchored

    def test_force_overrides_refusal(self, tmp_path, monkeypatch):
        mod = self._load_tool()
        monkeypatch.chdir(tmp_path)
        (tmp_path / "BENCH_DETAIL.json").write_text(json.dumps(
            {"warm": {"q_a": 9.0}, "cold": {"q_a": 9.5}}
        ))
        (tmp_path / "BASELINE.md").write_text(
            "| q_a | 1.0000 | 1.1000 | 5 |\n"
        )
        (tmp_path / "PLANS.md").write_text(
            "| q_a | 2 | 0 | 0 | 0 | 1 | 1 |\n"
        )
        monkeypatch.setattr(
            mod, "_anchor_era_plans",
            lambda: {"q_a": "9 | 9 | 9 | 9 | 9 | 9"},
        )
        mod.main(["--apply", "--force-plan-changed", "q_a"])
        assert "| q_a | 9.0000 |" in (tmp_path / "BASELINE.md").read_text()
