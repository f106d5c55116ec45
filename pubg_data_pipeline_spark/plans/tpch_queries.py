"""TPC-H pattern completion queries (SURVEY.md §2.4/§7.2 M3).

The reference implements zero joins (producer-side denormalization —
reference: producer/producer.py:162-204), but the driver's oracle
harness runs on a TPC-H-style star schema, so the engine ships the
full relational pattern suite. This module adds the TPC-H shapes not
yet covered by relational_queries.py: Q4 (EXISTS with non-equi
correlation), Q5 (local-supplier six-table join), Q7 (two-dimension
nation pairs), Q8 (market share),
Q13 (distribution histogram), Q15 (argmax via scalar subquery), Q17
(correlated per-group average filter), Q19 (disjunctive join
predicates), Q22 (anti-join + global threshold subquery).

Q2/Q9/Q11/Q16/Q20/Q21 need columns the synthetic schema omits
(partsupp, commitdate/receiptdate, phone) and are out of scope by
data design, not by engine limitation.

Physical strategy: nation/region and brand-filtered part are
explicitly broadcast (small at any scale factor); customer/supplier/
unfiltered part carry no hint — AQE picks broadcast at test scale
and shuffle joins at 100 TB where they exceed the threshold. All
money aggregates follow the exact-fixed-point determinism rules in
plans.base.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.plans.base import QuerySpec, exact_scaled, sql_scaled
from pubg_data_pipeline_spark.sources.tables import load_table

_DISC_PRICE_E4 = sql_scaled("l_extendedprice * (1.0 - l_discount)", 4)


def _disc_price_e4():
    return exact_scaled(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)


def order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter that have at least one
    line shipped after the order date (EXISTS with a non-equi
    correlated predicate), counted per priority. Plans as a LEFT SEMI
    join — the lineitem side never duplicates order rows."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flows between a nation pair, per ship
    year, in both directions. The two nation dimensions are filtered to
    the pair BEFORE the join (2-row broadcasts), so the disjunctive
    pair predicate only excludes same-nation flows afterwards."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pair = ("NATION_3", "NATION_7")
    n1 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    agged = joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.sum(_disc_price_e4()).alias("rev_e4"), F.count(F.lit(1)).alias("n_lines"))
    return agged.select(
        "supp_nation",
        "cust_nation",
        "l_year",
        "n_lines",
        F.round(F.col("rev_e4") / 10000.0, 2).alias("revenue"),
    )


_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, COUNT(*) AS n_lines,
       ROUND(CAST(SUM({_DISC_PRICE_E4}) AS BIGINT) / 10000.0, 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_3', 'NATION_7')
    AND n2.n_name IN ('NATION_3', 'NATION_7')
    AND n1.n_name <> n2.n_name
)
GROUP BY supp_nation, cust_nation, l_year
"""


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of revenue delivered
    to customers in one region, per order year. Conditional numerator
    inside the same aggregate; the share division happens once on exact
    integer sums."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = _disc_price_e4()
    target = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(F.lit(0).cast("long"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cust_nations), F.col("c_nationkey") == F.col("c_nk"))
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nk"))
    )
    agged = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(target).alias("nation_e4"), F.sum(rev).alias("total_e4")
    )
    return agged.select(
        "o_year",
        F.round(F.col("nation_e4") / 10000.0, 2).alias("nation_revenue"),
        F.round(F.col("total_e4") / 10000.0, 2).alias("total_revenue"),
        F.round(F.col("nation_e4") / F.col("total_e4"), 6).alias("mkt_share"),
    )


_Q8_SQL = f"""
SELECT o_year,
       ROUND(nation_e4 / 10000.0, 2) AS nation_revenue,
       ROUND(total_e4 / 10000.0, 2) AS total_revenue,
       ROUND(nation_e4 * 1.0 / total_e4, 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(SUM(CASE WHEN sn.n_name = 'NATION_5' THEN {_DISC_PRICE_E4} ELSE 0 END) AS BIGINT)
           AS nation_e4,
         CAST(SUM({_DISC_PRICE_E4}) AS BIGINT) AS total_e4
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  GROUP BY 1
)
"""


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation from orders where the customer
    and the line's supplier sit in the SAME nation of one region, for
    one order year. The local-supplier predicate
    (c_nationkey = s_nationkey) is applied post-join; nation⋈region is
    pre-filtered and broadcast so only in-region rows survive."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    region_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region_nations), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    agged = joined.groupBy("n_name").agg(
        F.sum(_disc_price_e4()).alias("rev_e4"), F.count(F.lit(1)).alias("n_lines")
    )
    return agged.select(
        "n_name", "n_lines", F.round(F.col("rev_e4") / 10000.0, 2).alias("revenue")
    )


_Q5_SQL = f"""
SELECT n_name, COUNT(*) AS n_lines,
       ROUND(CAST(SUM({_DISC_PRICE_E4}) AS BIGINT) / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey AND r_name = 'ASIA'
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def customer_orders_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count —
    two-level aggregation over a LEFT join so zero-order customers land
    in the c_count=0 bucket."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy(customer.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The max is compared on the exact integer cent-sum (no float ties);
    the scalar max is a 1-row aggregate cross-joined back (broadcast),
    never a driver-side collect."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_price_e4()).alias("rev_e4"))
    max_rev = rev.agg(F.max("rev_e4").alias("max_e4"))
    best = rev.join(F.broadcast(max_rev), rev.rev_e4 == max_rev.max_e4)
    joined = best.join(supplier, best.l_suppkey == supplier.s_suppkey)
    return joined.select(
        "s_suppkey", "s_name", F.round(F.col("rev_e4") / 10000.0, 2).alias("total_revenue")
    )


_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_DISC_PRICE_E4}) AS BIGINT) AS rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ROUND(rev_e4 / 10000.0, 2) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_e4 = (SELECT MAX(rev_e4) FROM rev)
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lines whose quantity is below 20%
    of the part's average quantity, for one brand. The correlated
    per-part average is a window over the already-joined rows (one
    pass, no second aggregate-join); quantities are integer-valued so
    the windowed sum/count division is exact and cross-engine stable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    w = Window.partitionBy("p_partkey")
    avg_qty = F.sum("l_quantity").over(w) / F.count(F.lit(1)).over(w)
    flt = joined.withColumn("avg_qty", avg_qty).filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    agged = flt.agg(
        F.sum(exact_scaled(F.col("l_extendedprice"))).alias("cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return agged.select(
        F.round(F.col("cents") / 100.0 / 7.0, 2).alias("avg_yearly"), "n_lines"
    )


_Q17_SQL = f"""
SELECT ROUND(CAST(SUM({sql_scaled('l_extendedprice', 2)}) AS BIGINT) / 100.0 / 7.0, 2)
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM (
  SELECT l_quantity, l_extendedprice,
         SUM(l_quantity) OVER (PARTITION BY p_partkey) * 1.0
           / COUNT(*) OVER (PARTITION BY p_partkey) AS avg_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#5'
)
WHERE l_quantity < 0.2 * avg_qty
"""


def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate across
    both join sides (brand × size × quantity arms). Catalyst extracts
    the common p_partkey equi-key so this still plans as a hash join
    with the disjunction as a post-join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size").between(1, smax))
        & (F.col("l_quantity").between(qlo, qhi))
    )
    cond = arm("Brand#3", 15, 1, 11) | arm("Brand#13", 25, 10, 20) | arm("Brand#23", 35, 20, 30)
    joined = li.join(part, li.l_partkey == part.p_partkey).filter(cond)
    agged = joined.agg(
        F.sum(_disc_price_e4()).alias("rev_e4"), F.count(F.lit(1)).alias("n_lines")
    )
    return agged.select(F.round(F.col("rev_e4") / 10000.0, 2).alias("revenue"), "n_lines")


_Q19_SQL = f"""
SELECT ROUND(CAST(SUM({_DISC_PRICE_E4}) AS BIGINT) / 10000.0, 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    with no recent orders (none since 2000-01-01 — the synthetic data
    gives every customer at least one historical order, so plain
    NOT-EXISTS selects nothing), aggregated per nation. The global
    threshold is derived from exact integer cents (sum
    order-independent) and cross-joined back as a 1-row broadcast — no
    driver collect."""
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    stats = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(exact_scaled(F.col("c_acctbal"))) / 100.0 / F.count(F.lit(1))
        ).alias("thr")
    )
    rich = customer.crossJoin(F.broadcast(stats)).filter(F.col("c_acctbal") > F.col("thr"))
    idle = rich.join(orders, "c_custkey", "left_anti")
    agged = idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(exact_scaled(F.col("c_acctbal"))).alias("cents"),
    )
    return agged.select(
        "c_nationkey", "n_customers", F.round(F.col("cents") / 100.0, 2).alias("total_balance")
    )


_Q22_SQL = f"""
WITH t AS (
  SELECT CAST(SUM({sql_scaled('c_acctbal', 2)}) AS BIGINT) / 100.0 / COUNT(*) AS thr
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, COUNT(*) AS n_customers,
       ROUND(CAST(SUM({sql_scaled('c_acctbal', 2)}) AS BIGINT) / 100.0, 2) AS total_balance
FROM customer, t
WHERE c_acctbal > thr
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


SPECS = [
    QuerySpec("order_priority_checking", order_priority_checking, _Q4_SQL, ("join", "tpch")),
    QuerySpec("volume_shipping", volume_shipping, _Q7_SQL, ("join", "tpch")),
    QuerySpec("nation_market_share", nation_market_share, _Q8_SQL, ("join", "tpch")),
    QuerySpec("local_supplier_volume", local_supplier_volume, _Q5_SQL, ("join", "tpch")),
    QuerySpec("customer_orders_histogram", customer_orders_histogram, _Q13_SQL, ("join", "tpch")),
    QuerySpec("top_supplier_revenue", top_supplier_revenue, _Q15_SQL, ("join", "tpch")),
    QuerySpec("small_quantity_revenue", small_quantity_revenue, _Q17_SQL, ("join", "tpch", "window")),
    QuerySpec("disjunctive_brand_revenue", disjunctive_brand_revenue, _Q19_SQL, ("join", "tpch")),
    QuerySpec("idle_customer_balance", idle_customer_balance, _Q22_SQL, ("join", "tpch")),
]
