"""Correlated-subquery corpus — EXISTS / NOT EXISTS / scalar-correlated /
IN + HAVING, expressed through ``spark.sql`` so Catalyst's subquery
decorrelation (RewriteCorrelatedScalarSubquery, RewritePredicateSubquery)
owns the physical strategy.

Absent entirely from the reference (single-record scope, no cross-record
access — /root/reference/filter_math/math.c:322-353); this is the
"subquery handling" row of SURVEY.md §2.3's optimizer checklist. Each
query's decorrelated plan is a join Catalyst picks for us:

* EXISTS → left-semi join on the correlation key (one shuffle, or
  broadcast when the inner side is small post-aggregation);
* NOT EXISTS → left-anti join, same key;
* correlated scalar agg → inner aggregate on the correlation key, then
  an equi-join back to the outer — the aggregate shrinks the build side
  to one row per key, so at 100 TB the join input is |distinct keys|,
  not |lineitem|;
* IN (... GROUP BY ... HAVING ...) → left-semi against the aggregated
  subquery.

Float discipline matches ``relational._dsum``: every aggregate a
comparison depends on runs as an exact DECIMAL(38,6) sum cast back to
double, so Spark's partial/final tree and DuckDB's sequential fold agree
bit-for-bit, and threshold comparisons select identical row sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

_DAVG_QTY = (
    "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)"
)
_DSUM_QTY = "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)"
_DSUM_PRICE = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)"


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(f"sq_{name}")


# ---------------------------------------------------------------------------
# correlated EXISTS — TPC-H Q4 shape: orders with at least one line item
# shipped more than 60 days after the order date.
# ---------------------------------------------------------------------------
@register(
    "subq_exists_late_ship",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def subq_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM sq_orders
        WHERE EXISTS (SELECT 1 FROM sq_lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# correlated NOT EXISTS — lapsed customers: no order since 2001 (anti
# join with a pushed-down predicate on the inner side).
# ---------------------------------------------------------------------------
@register(
    "subq_not_exists_customers",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    """,
)
def subq_not_exists_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM sq_customer
        WHERE NOT EXISTS (SELECT 1 FROM sq_orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2001-01-01')
        """
    )


# ---------------------------------------------------------------------------
# correlated scalar aggregate — TPC-H Q17 shape: revenue of line items
# ordering below 20% of their part's average quantity.
# ---------------------------------------------------------------------------
@register(
    "subq_scalar_below_avg_qty",
    oracle=f"""
    SELECT {_DSUM_PRICE} / 7.0 AS avg_yearly, COUNT(*) AS n_items
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND l_quantity < (SELECT 0.2 * {_DAVG_QTY}
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def subq_scalar_below_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        f"""
        SELECT {_DSUM_PRICE} / 7.0 AS avg_yearly, COUNT(*) AS n_items
        FROM sq_lineitem, sq_part
        WHERE p_partkey = l_partkey
          AND l_quantity < (SELECT 0.2 * {_DAVG_QTY}
                            FROM sq_lineitem l2
                            WHERE l2.l_partkey = p_partkey)
        """
    )


# ---------------------------------------------------------------------------
# IN + GROUP BY/HAVING — TPC-H Q18 shape: large-volume orders.
# ---------------------------------------------------------------------------
@register(
    "subq_in_big_orders",
    oracle=f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING {_DSUM_QTY} > 150)
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def subq_in_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_totalprice
        FROM sq_orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM sq_lineitem
                             GROUP BY l_orderkey
                             HAVING {_DSUM_QTY} > 150)
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
        """
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery — per-customer top-2 orders by price.
# The naive reading re-executes the inner ORDER BY/LIMIT once per outer
# row; Catalyst DECORRELATES it (DecorrelateInnerQuery) into one
# window rank over orders plus one equi-join — verified in the plan:
# Window + BroadcastHashJoin, no nested loop, no per-row subquery
# nodes. The same rewrite is what makes the construct survive 100 TB:
# cost is one shuffle of orders by custkey, independent of customer
# count. DuckDB runs the identical LATERAL text natively.
# ---------------------------------------------------------------------------
@register(
    "subq_lateral_topk",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c
    JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) o ON TRUE
    """,
)
def subq_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM sq_customer c
        JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM sq_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) o
        """
    )
