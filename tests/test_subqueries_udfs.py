"""Unit coverage for the correlated-subquery corpus, the Python
UDF/UDAF/UDTF surface, and streaming dedup (oracle gate covers the
sf0.01 happy path; these pin shapes and invariants at sf0.001)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.operators.python_udfs import (
    udaf_event_type_cents,
    udf_scalar_doc_stats,
    udtf_tokenize_docs,
)
from fluent_bit_filter_math_spark.operators.subqueries import (
    subq_exists_late_ship,
    subq_in_big_orders,
    subq_not_exists_customers,
    subq_scalar_below_avg_qty,
)
from fluent_bit_filter_math_spark.sources import table
from fluent_bit_filter_math_spark.streaming.dedup import stream_dedup_events


def test_exists_plus_not_exists_partition_orders(spark, sf_dir):
    # EXISTS-late + its complement must partition the orders table.
    n_orders = table(spark, sf_dir, "orders").count()
    n_late = (
        subq_exists_late_ship(spark, sf_dir).agg(F.sum("n_orders")).first()[0]
    )
    spark.sql(
        """
        SELECT COUNT(*) AS n FROM sq_orders
        WHERE NOT EXISTS (SELECT 1 FROM sq_lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        """
    ).createOrReplaceTempView("complement")
    n_not_late = spark.table("complement").first()["n"]
    assert n_late + n_not_late == n_orders


def test_not_exists_customers_are_lapsed(spark, sf_dir):
    lapsed = {r.c_custkey for r in subq_not_exists_customers(spark, sf_dir).collect()}
    recent = {
        r.o_custkey
        for r in table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2001-01-01")
        .select("o_custkey")
        .distinct()
        .collect()
    }
    assert lapsed and not (lapsed & recent)


def test_scalar_correlated_returns_single_row(spark, sf_dir):
    rows = subq_scalar_below_avg_qty(spark, sf_dir).collect()
    assert len(rows) == 1
    assert rows[0].n_items >= 0


def test_in_big_orders_sorted_and_bounded(spark, sf_dir):
    rows = subq_in_big_orders(spark, sf_dir).collect()
    assert len(rows) <= 100
    prices = [r.o_totalprice for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_udf_scalar_matches_native_length(spark, sf_dir):
    out = udf_scalar_doc_stats(spark, sf_dir)
    native = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.length("text").alias("n_chars"))
    )
    assert out.exceptAll(native).count() == 0
    assert native.exceptAll(out).count() == 0


def test_udaf_totals_match_native_agg(spark, sf_dir):
    out = {r.event_type: (r.n_events, r.total_cents)
           for r in udaf_event_type_cents(spark, sf_dir).collect()}
    native = {
        r.event_type: (r.n, r.cents)
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert out == native


def test_udtf_positions_are_dense(spark, sf_dir):
    out = udtf_tokenize_docs(spark, sf_dir)
    per_doc = (
        out.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.max("pos").alias("mx"))
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r.mx == r.n - 1  # positions 0..n-1, no gaps


def test_stream_dedup_equals_batch_distinct(spark, sf_dir):
    streamed = stream_dedup_events(spark, sf_dir)
    batch = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0


def test_polymorphic_udtf_schema_tracks_k(spark):
    """One registered function, two call sites, two schemas — and a
    non-constant k is rejected at ANALYSIS time, not at run time."""
    from pyspark.sql.functions import udtf

    from fluent_bit_filter_math_spark.operators.python_udfs import (
        _SplitFieldsUDTF,
    )

    spark.udtf.register(
        "fbm_fields_t", udtf(_SplitFieldsUDTF, useArrow=True)
    )
    two = spark.sql(
        "SELECT * FROM fbm_fields_t('alpha beta gamma', 2)"
    )
    assert two.columns == ["c1", "c2"]
    assert two.collect()[0][:] == ("alpha", "beta")
    five = spark.sql("SELECT * FROM fbm_fields_t('a b', 5)")
    assert five.columns == ["c1", "c2", "c3", "c4", "c5"]
    assert five.collect()[0][:] == ("a", "b", None, None, None)
    import pytest as _pytest

    spark.range(1).selectExpr("CAST(id + 2 AS INT) AS k")\
        .createOrReplaceTempView("nonconst_k")
    with _pytest.raises(Exception, match="constant"):
        spark.sql(
            "SELECT t.* FROM nonconst_k n,"
            " LATERAL fbm_fields_t('a b c', n.k) t"
        ).collect()
