"""Scale-mechanism tests: bucketed co-located joins (no Exchange) and
the salted skew-join rewrite (identical output, spread keys)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.operators.skew import salted_join
from fluent_bit_filter_math_spark.sources import table
from fluent_bit_filter_math_spark.sources.warehouse import (
    bucketed_table,
    write_bucketed,
)
from tests.test_plans import plan_of


@pytest.fixture()
def no_broadcast(spark):
    """Force real shuffle-strategy decisions on the tiny test tables."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast):
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], 8)
    write_bucketed(li, "t_lineitem_b", ["l_orderkey"], 8)

    ob, lb = bucketed_table(spark, "t_orders_b"), bucketed_table(
        spark, "t_lineitem_b"
    )
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
    plan = plan_of(joined)
    # Both sides arrive pre-clustered on the join key: zero shuffles.
    assert "Exchange" not in plan
    # And the result is the ordinary join result.
    want = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert joined.count() == want


def test_bucketed_agg_reuses_clustering(spark, sf_dir, no_broadcast):
    lb = bucketed_table(spark, "t_lineitem_b")
    agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    # Aggregation on the bucket key needs no exchange either.
    assert "Exchange" not in plan_of(agg)


def test_write_bucketed_validates():
    with pytest.raises(ValueError):
        write_bucketed(None, "t", ["k"], 0)


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    plain = {
        tuple(r)
        for r in li.join(orders, on=["l_orderkey"], how="inner").collect()
    }
    salted = {
        tuple(r)
        for r in salted_join(li, orders, on=["l_orderkey"], salt=4).collect()
    }
    assert salted == plain and len(plain) > 0


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k long, v string")
    small = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, w double")
    out = salted_join(big, small, on=["k"], salt=4, how="left").collect()
    assert len(out) == 3
    assert {r.k: r.w for r in out} == {1: 10.0, 2: 20.0, 99: None}


def test_salted_join_rejects_outer():
    with pytest.raises(ValueError):
        salted_join(None, None, on=["k"], how="full")
