"""Extended TPC-H-shape query corpus (Q7/Q8/Q9/Q10/Q12/Q14/Q16/Q18/Q19).

The reference engine has no joins or aggregations at all (single-record
scope, math.c:322-353), so this whole module is §2.3 extension surface:
the classic decision-support shapes adapted to the fixture schema (no
partsupp table, no l_receiptdate/l_shipmode/p_container columns — each
adaptation is noted per query).

Scale stance (100 TB): every query is expressed declaratively so
Catalyst owns join order and physical strategy; dimension tables
(nation, region, filtered part/supplier slices) are broadcast
explicitly, fact-fact joins (orders⋈lineitem) shuffle once on the order
key, and all money aggregates run through the exact-DECIMAL sum idiom
(`_dsum`) so partial/final aggregation trees agree bit-for-bit with the
oracle's sequential sums. Ratio outputs divide two such sums as doubles
— one IEEE division, identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

# Shared with relational.py: exact decimal(38,6) sum of a double row
# expression, surfaced as double (see relational.py:28 for the scale
# rationale — fixture money columns sit on a ≤6-dp grid).
def _dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


_REVENUE = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by supplier-nation /
# customer-nation / year. The nation-pair predicate is pushed into two
# broadcast joins against the 25-row nation dim; the only real shuffles
# are lineitem⋈orders (orderkey) and ⋈customer (custkey) plus the final
# 3-key aggregate.
# ---------------------------------------------------------------------------
@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {_dsum(_REVENUE)} AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
    GROUP BY 1, 2, 3
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1998-12-31 00:00:00")
    )
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.expr(_dsum(_REVENUE)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — market share of one supplier nation within a customer region, per
# year, for one part type. Adaptation: fixture p_type is a single word
# (no partsupp), so the part filter is p_type = 'ECONOMY'. The share is
# a conditional decimal sum over a plain decimal sum, divided as
# doubles. part and the dims broadcast; at 100 TB the filtered part
# slice (1/6 of part) may exceed the broadcast threshold, in which case
# AQE falls back to a shuffle join on l_partkey — correct either way.
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           {_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {_dsum('volume')} AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_REVENUE} AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
           region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1997-12-31'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1997-12-31 00:00:00")
    )
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "nation")
    )
    all_nations = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.expr(_REVENUE).alias("volume"),
            "nation",
        )
    )
    return (
        all_nations.groupBy("o_year")
        .agg(
            (
                F.expr(
                    _dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")
                )
                / F.expr(_dsum("volume"))
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year. Adaptation: no partsupp
# table, so supply cost is modeled as 10% of p_retailprice per unit
# (profit = revenue − 0.1·p_retailprice·l_quantity); part filter is a
# name substring like the original's '%green%'.
# ---------------------------------------------------------------------------
@register(
    "q9_product_profit",
    oracle=f"""
    SELECT nation,
           o_year,
           {_dsum('amount')} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "nation")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.expr(
                "l_extendedprice * (1 - l_discount)"
                " - 0.1 * p_retailprice * l_quantity"
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.expr(_dsum("amount")).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top 20 customers by lost revenue in one
# quarter. orders filtered to the quarter, lineitem to returnflag='R';
# customer⋈nation broadcast.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {_dsum(_REVENUE)} AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.expr(_dsum(_REVENUE)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-latency priority audit. Adaptation: no l_shipmode /
# l_receiptdate, so the "late" predicate is shipped > 90 days after the
# order date, bucketed by ship year: count urgent/high-priority vs other
# orders among late shipments. Pure conditional aggregation after one
# orderkey join.
# ---------------------------------------------------------------------------
@register(
    "q12_late_priority",
    oracle="""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    ORDER BY ship_year
    """,
)
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


# ---------------------------------------------------------------------------
# Q14 — promotion-revenue share in one month. part broadcast; one
# conditional decimal sum over another, divided as doubles.
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * {_dsum(f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE} ELSE 0 END")}
             / {_dsum(_REVENUE)} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1998-03-01'
      AND l_shipdate < TIMESTAMP '1998-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-03-01") & (F.col("l_shipdate") < "1998-04-01")
    )
    part = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.expr(
                    _dsum(f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE} ELSE 0 END")
                )
                / F.expr(_dsum(_REVENUE))
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q16 — supplier variety per part attribute triple. Adaptation: the
# part-supplier relation comes from lineitem (no partsupp); excluded
# suppliers are the negative-balance ones (no s_comment complaints
# column). COUNT(DISTINCT) after a broadcast anti-join exclusion.
# ---------------------------------------------------------------------------
@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 50
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = table(spark, sf_dir, "lineitem")
    bad_supp = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(
            F.broadcast(bad_supp),
            li.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: orders whose line quantities sum past a
# threshold, joined back to customer. The HAVING subquery and the outer
# join share the same orderkey clustering; Catalyst plans the semi
# filter as a broadcast of the (small) qualifying-key set at this SF,
# and a shuffle join at scale — both correct.
# ---------------------------------------------------------------------------
@register(
    "q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d'),
             o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"), li.l_orderkey == F.col("bk"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive predicate revenue: OR-of-ANDs over (brand, size
# range, quantity range). Catalyst pushes the common l_partkey equi-key
# out of the disjunction so the join stays a hash join with the OR as a
# post-join filter; part broadcast. Adaptation: p_container → p_size
# bands.
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_pred",
    oracle=f"""
    SELECT {_dsum(_REVENUE)} AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
            AND l_quantity BETWEEN 20 AND 30))
    """,
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 40)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(F.expr(_dsum(_REVENUE)).alias("revenue"))


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part (correlated MIN subquery). Adaptation:
# the part↔supplier relation comes from distinct lineitem pairs (no
# partsupp) and "cost" is s_acctbal. The correlated scalar MIN
# decorrelates to a per-part aggregate joined back on equality —
# exactly Catalyst's rewrite; the DataFrame form writes that join
# explicitly, the oracle keeps the correlated form so DuckDB's
# decorrelation is exercised against it.
# ---------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_partkey, p_name, s_name, s_acctbal
    FROM part, supplier, ps
    WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
      AND p_size = 15 AND p_type = 'STANDARD'
      AND s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM supplier s2, ps ps2
        WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
      )
    ORDER BY s_acctbal DESC, p_partkey, s_name
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supp = table(spark, sf_dir, "supplier")
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    cand = (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), pairs.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
    )
    min_bal = cand.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        cand.join(
            F.broadcast(min_bal),
            (cand.p_partkey == min_bal.mk) & (cand.s_acctbal == min_bal.min_bal),
        )
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name"))
    )


# ---------------------------------------------------------------------------
# Q4 — order-priority checking: orders in one quarter with at least one
# late line (EXISTS with a correlated non-equi condition). The semi
# join carries the o_orderdate comparison in its condition — state
# never duplicates orders however many lines match.
# ---------------------------------------------------------------------------
@register(
    "q4_priority_checking",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: per-nation "inventory value" above a global
# share threshold (HAVING against a scalar subquery). Adaptation: value
# = revenue routed through supplier nationality (no partsupp). Both
# sides of the > comparison derive from the same exact decimal sums, so
# the threshold test is engine-identical.
# ---------------------------------------------------------------------------
@register(
    "q11_important_stock",
    oracle=f"""
    WITH sv AS (
      SELECT n_name, {_dsum(_REVENUE)} AS value
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, value
    FROM sv
    WHERE value > (SELECT 0.04 * SUM(value) FROM sv)
    ORDER BY value DESC, n_name
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    nation = table(spark, sf_dir, "nation")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    sv = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("n_name")
        .agg(F.expr(_dsum(_REVENUE)).alias("value"))
    )
    total = sv.agg((F.lit(0.04) * F.sum("value")).alias("cut"))
    return (
        sv.join(F.broadcast(total))
        .filter(F.col("value") > F.col("cut"))
        .select("n_name", "value")
        .orderBy(F.desc("value"), F.asc("n_name"))
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue: an aggregate view joined
# against its own MAX (scalar subquery). Identical doubles on both
# engines ⇒ identical argmax set.
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {_dsum(_REVENUE)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.expr(_dsum(_REVENUE)).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: lineitems below half their part's
# average quantity (correlated scalar AVG → decorrelated per-part
# aggregate join). l_quantity is integer-valued, so the AVG is an exact
# integer sum over a count — division and the 0.5× comparison are the
# same IEEE ops in both engines.
# ---------------------------------------------------------------------------
@register(
    "q17_small_qty_revenue",
    oracle=f"""
    SELECT {_dsum('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#4' AND p_size <= 10
      AND l_quantity < (
        SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") <= 10)
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg((F.expr(_dsum("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity: per-nation count/balance of customers
# above the positive-balance average (scalar subquery) with no RECENT
# orders (anti join against the filtered order slice — every fixture
# customer has SOME order, so the original all-time NOT EXISTS is
# vacuous here). The average is an exact-decimal sum over a count so the
# threshold is engine-identical; the anti join is the classic NOT
# EXISTS decorrelation.
# ---------------------------------------------------------------------------
@register(
    "q22_sales_opportunity",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)")
            / F.count("*")
        ).alias("cut")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("cut"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.expr(
                "CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)"
            ).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: LEFT OUTER join (customers
# with zero orders must appear), per-customer count, then a histogram
# of the counts. Two shuffles by construction (custkey agg, count agg);
# the left join shuffles on custkey once and the first aggregate reuses
# that clustering.
# ---------------------------------------------------------------------------
@register(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion: suppliers who moved serious volume of
# one part family in one year (nested IN chain: parts by name → grouped
# HAVING per (supplier, part) → supplier IN). Adaptation: volume
# condition on shipped quantity (no partsupp availqty). The chain
# compiles to two semi joins; the grouped HAVING shuffles once on the
# composite key.
# ---------------------------------------------------------------------------
@register(
    "q20_part_promotion",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE '%blue%'
        )
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 50
    )
    ORDER BY s_suppkey
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    blue = table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    movers = (
        li.join(
            F.broadcast(blue.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        supp.join(
            F.broadcast(movers), supp.s_suppkey == movers.l_suppkey, "left_semi"
        )
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: the only late supplier in a
# multi-supplier order (EXISTS + NOT EXISTS over the same fact).
# Adaptation: "late" = shipped > 90 days after order date (no
# receipt/commit dates). The two correlated EXISTS decorrelate to two
# per-order aggregates — distinct suppliers and distinct LATE suppliers
# — both reusing the orderkey clustering of the late-lines join.
# ---------------------------------------------------------------------------
@register(
    "q21_waiting_supplier",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    ),
    per_order AS (
      SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY l_orderkey
    ),
    late_per_order AS (
      SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_late
      FROM late GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(DISTINCT late.l_orderkey) AS numwait
    FROM late
    JOIN per_order USING (l_orderkey)
    JOIN late_per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = late.l_suppkey
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    late_per_order = late.groupBy(F.col("l_orderkey").alias("lk")).agg(
        F.countDistinct("l_suppkey").alias("n_late")
    )
    return (
        late.join(per_order, "l_orderkey")
        .join(late_per_order, late.l_orderkey == F.col("lk"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct(late.l_orderkey).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
