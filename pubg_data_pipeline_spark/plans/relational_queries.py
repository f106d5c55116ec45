"""Relational-completion queries over the star schema (SURVEY.md §2.4
/ §7.2 M3).

The reference has zero joins (producer-side denormalization —
reference: producer/producer.py:162-204); the driver's oracle harness
runs on a TPC-H-style star schema, so the full join suite, set ops,
rollup/cube, window ranking, and non-equi joins are first-class here.

Physical strategy notes (verified via .explain): dimension joins
(nation/region/part at these sizes, and any dim under the broadcast
threshold at scale) plan as BroadcastHashJoin — zero fact-table
shuffle; fact-fact joins (orders ⋈ lineitem) plan as sort-merge or
AQE-selected shuffled-hash on the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import relational, windows
from pubg_data_pipeline_spark.plans.base import QuerySpec, exact_scaled, sql_scaled
from pubg_data_pipeline_spark.sources.tables import load_table

_PRICE_CENTS = sql_scaled("o_totalprice", 2)
_DISC_PRICE_E4 = sql_scaled("l_extendedprice * (1.0 - l_discount)", 4)


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical scan → filter →
    hash-aggregate report (grouped multi-agg family A1). Money sums use
    exact fixed-point encoding (plans.base) so they hash-match DuckDB.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    agged = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),  # whole numbers: exact in double
        F.sum(exact_scaled(F.col("l_extendedprice"))).alias("base_cents"),
        F.sum(exact_scaled(disc_price, 4)).alias("disc_e4"),
        F.sum(exact_scaled(charge, 6)).alias("charge_e6"),
        F.sum(exact_scaled(F.col("l_discount"))).alias("disc_cents"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agged.select(
        "l_returnflag",
        "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round(F.col("base_cents") / 100.0, 2).alias("sum_base_price"),
        F.round(F.col("disc_e4") / 10000.0, 2).alias("sum_disc_price"),
        F.round(F.col("charge_e6") / 1000000.0, 2).alias("sum_charge"),
        F.round(F.col("sum_qty") / F.col("count_order"), 4).alias("avg_qty"),
        F.round(F.col("base_cents") / 100.0 / F.col("count_order"), 4).alias("avg_price"),
        F.round(F.col("disc_cents") / 100.0 / F.col("count_order"), 4).alias("avg_disc"),
        "count_order",
    )


_PRICING_SQL = f"""
SELECT l_returnflag, l_linestatus,
       ROUND(sum_qty, 2) AS sum_qty,
       ROUND(base_cents / 100.0, 2) AS sum_base_price,
       ROUND(disc_e4 / 10000.0, 2) AS sum_disc_price,
       ROUND(charge_e6 / 1000000.0, 2) AS sum_charge,
       ROUND(sum_qty / count_order, 4) AS avg_qty,
       ROUND(base_cents / 100.0 / count_order, 4) AS avg_price,
       ROUND(disc_cents / 100.0 / count_order, 4) AS avg_disc,
       count_order
FROM (
  SELECT l_returnflag, l_linestatus,
         SUM(l_quantity) AS sum_qty,
         CAST(SUM({sql_scaled('l_extendedprice', 2)}) AS BIGINT) AS base_cents,
         CAST(SUM({_DISC_PRICE_E4}) AS BIGINT) AS disc_e4,
         CAST(SUM({sql_scaled('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)', 6)}) AS BIGINT) AS charge_e6,
         CAST(SUM({sql_scaled('l_discount', 2)}) AS BIGINT) AS disc_cents,
         COUNT(*) AS count_order
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
  GROUP BY l_returnflag, l_linestatus
)
"""


def top_revenue_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-way star join with broadcast dimensions:
    lineitem ⋈ orders (shuffle on orderkey) ⋈ customer ⋈ nation ⋈
    region (all broadcast). Revenue per nation/region."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = exact_scaled(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    agged = joined.groupBy("n_name", "r_name").agg(
        F.count(F.lit(1)).alias("line_count"), F.sum(rev).alias("rev_e4")
    )
    return agged.select(
        "n_name", "r_name", "line_count", F.round(F.col("rev_e4") / 10000.0, 2).alias("revenue")
    )


_REVENUE_NATIONS_SQL = f"""
SELECT n_name, r_name, COUNT(*) AS line_count,
       ROUND(CAST(SUM({_DISC_PRICE_E4}) AS BIGINT) / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: filtered 3-way join → grouped revenue → global
    top-10 by rounded revenue (TakeOrderedAndProject; tie-break on
    orderkey so the rounded-score ordering is deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    rev = exact_scaled(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
    joined = (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    )
    agged = (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("rev_e4"))
        .select(
            "l_orderkey",
            F.round(F.col("rev_e4") / 10000.0, 2).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )
    return relational.top_k(agged, [F.col("revenue").desc(), F.col("l_orderkey").asc()], 10)


_SHIPPING_SQL = f"""
SELECT l_orderkey,
       ROUND(CAST(SUM({_DISC_PRICE_E4}) AS BIGINT) / 10000.0, 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + null-aware aggregates: every customer with
    order count (0 for none) and total spend."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = relational.equi_join(
        customer, orders, customer.c_custkey == orders.o_custkey, how="left"
    )
    agged = joined.groupBy("c_custkey", "c_mktsegment").agg(
        F.count("o_orderkey").alias("order_count"),
        F.coalesce(F.sum(exact_scaled(F.col("o_totalprice"))), F.lit(0)).alias("spent_cents"),
    )
    return agged.select(
        "c_custkey",
        "c_mktsegment",
        "order_count",
        F.round(F.col("spent_cents") / 100.0, 2).alias("total_spent"),
    )


_CUST_ORDERS_SQL = f"""
SELECT c_custkey, c_mktsegment,
       COUNT(o_orderkey) AS order_count,
       ROUND(CAST(COALESCE(SUM({_PRICE_CENTS}), 0) AS BIGINT) / 100.0, 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


def big_order_customers_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join: high-value orders RIGHT JOIN the BUILDING
    customer segment. Every customer of the segment survives; those
    with no qualifying order null-extend (order count 0, total 0.0) —
    the RightOuter Catalyst node (operators/relational.py equi_join
    ``how="right"``), the mirror of customer_order_stats' left join.
    At scale the filtered ("big orders") side streams while the
    preserved customer side builds — the planner picks sides; the
    semantics here pin the null extension either way."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            exact_scaled(F.col("o_totalprice")).alias("o_cents"),
        )
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )
    joined = relational.equi_join(orders, cust, "c_custkey", how="right")
    return joined.groupBy("c_custkey", "c_name").agg(
        F.count("o_orderkey").alias("big_orders"),
        F.round(F.coalesce(F.sum("o_cents"), F.lit(0)) / 100.0, 2).alias("big_total"),
    )


_RIGHT_OUTER_SQL = f"""
SELECT c.c_custkey, c.c_name,
       COUNT(o.o_orderkey) AS big_orders,
       ROUND(CAST(COALESCE(SUM(o.cents), 0) AS BIGINT) / 100.0, 2) AS big_total
FROM (SELECT o_custkey, o_orderkey, {_PRICE_CENTS} AS cents
      FROM orders WHERE o_totalprice > 300000) o
RIGHT JOIN (SELECT c_custkey, c_name FROM customer
            WHERE c_mktsegment = 'BUILDING') c
  ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return relational.anti_join(customer, orders, "c_custkey").select(
        "c_custkey", "c_name", "c_acctbal"
    )


_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def active_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) + grouped aggregate."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    active = relational.semi_join(customer, orders, "c_custkey")
    agged = active.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("active_customers"),
        F.sum(exact_scaled(F.col("c_acctbal"))).alias("bal_cents"),
    )
    return agged.select(
        "c_mktsegment",
        "active_customers",
        F.round(F.col("bal_cents") / 100.0, 2).alias("total_balance"),
    )


_SEMI_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS active_customers,
       ROUND(CAST(SUM({sql_scaled('c_acctbal', 2)}) AS BIGINT) / 100.0, 2) AS total_balance
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
"""


def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(status, priority): subtotals + grand total (SURVEY.md
    §2.5 — absent from the reference, included because the hourly×mode×
    map aggregate A5 is the natural grouping-sets use case)."""
    orders = load_table(spark, sf_dir, "orders")
    agged = relational.rollup_agg(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        [
            F.count(F.lit(1)).alias("order_count"),
            F.sum(exact_scaled(F.col("o_totalprice"))).alias("cents"),
        ],
    )
    return agged.select(
        "o_orderstatus",
        "o_orderpriority",
        "order_count",
        F.round(F.col("cents") / 100.0, 2).alias("total_value"),
    )


_ROLLUP_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS order_count,
       ROUND(CAST(SUM({_PRICE_CENTS}) AS BIGINT) / 100.0, 2) AS total_value
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def returnflag_linestatus_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(returnflag, linestatus): all grouping-set combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    agged = relational.cube_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [F.count(F.lit(1)).alias("line_count"), F.sum("l_quantity").alias("qty")],
    )
    return agged.select(
        "l_returnflag", "l_linestatus", "line_count", F.round("qty", 2).alias("total_qty")
    )


_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS line_count, ROUND(SUM(l_quantity), 2) AS total_qty
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
"""


def segment_intersect_bigspenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two key extracts."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 5000)
    ).select("c_custkey")
    big = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(big)


_INTERSECT_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
"""


def high_balance_except_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): high-balance customers who never ordered."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = customer.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    active = orders.select(F.col("o_custkey").alias("c_custkey"))
    return rich.subtract(active)


_EXCEPT_SQL = """
SELECT c_custkey FROM customer WHERE c_acctbal > 9000
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
"""


def customer_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/delta + rank/dense_rank per customer (SURVEY.md §2.6 —
    not in the reference; shipped because trend detection W4 is more
    naturally lag and the oracle harness tests them)."""
    orders = load_table(spark, sf_dir, "orders")
    out = windows.lag_lead_features(
        orders,
        partition_by=["o_custkey"],
        order_by=[F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        value_col="o_totalprice",
    )
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("prev_o_totalprice").alias("prev_price"),
        F.col("next_o_totalprice").alias("next_price"),
        F.round("o_totalprice_delta", 2).alias("price_delta"),
        F.rank().over(w_rank).alias("price_rank"),
        F.dense_rank().over(w_rank).alias("price_dense_rank"),
    )


_WINDOWS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       ROUND(o_totalprice - LAG(o_totalprice) OVER w, 2) AS price_delta,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
       DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_dense_rank
FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def part_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny in-memory band table —
    plans as BroadcastNestedLoopJoin, which is correct here because the
    band side is 3 rows (SURVEY.md §2.4 theta-join surface)."""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 950.0), ("mid", 950.0, 980.0), ("premium", 980.0, 10_000_000.0)],
        "band string, lo double, hi double",
    )
    joined = relational.range_join(
        part, bands, (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi)
    )
    agged = joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("part_count"),
        F.sum(exact_scaled(F.col("p_retailprice"))).alias("cents"),
    )
    return agged.select(
        "band", "part_count", F.round(F.col("cents") / 100.0 / F.col("part_count"), 4).alias("avg_retail")
    )


_BANDS_SQL = f"""
SELECT band, COUNT(*) AS part_count,
       ROUND(CAST(SUM({sql_scaled('p_retailprice', 2)}) AS BIGINT) / 100.0 / COUNT(*), 4) AS avg_retail
FROM part
JOIN (VALUES ('budget', 0.0, 950.0), ('mid', 950.0, 980.0), ('premium', 980.0, 10000000.0))
  AS bands(band, lo, hi)
ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


def order_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) quartile analysis over a deterministic total order —
    WITHOUT the single-partition global sort NTILE normally costs.

    The exact global rank comes from the distributed decomposition
    (operators/windows.global_rank: bucket histogram -> tiny CDF ->
    bucket-partitioned local ranks), then NTILE's bucket-assignment
    formula is applied as a pure expression: with n rows and k=4
    tiles, the first n%k tiles get ceil(n/k) rows — identical row
    placement to SQL NTILE over the same (price, orderkey) order, but
    every stage is partition-parallel. The plan auditor
    (pubg_data_pipeline_spark/audit.py) flags the naive form; this is
    the fix it prescribes."""
    orders = load_table(spark, sf_dir, "orders")
    ranked = windows.global_rank(
        orders,
        F.col("o_totalprice"),
        tiebreak="o_orderkey",
        ascending=True,
        out_col="__r",
    )
    n = orders.agg(F.count(F.lit(1)).alias("__n"))
    # exact integer arithmetic (div), so placement is bit-identical to
    # SQL NTILE at any n: first n%4 tiles take (n div 4)+1 rows each
    tiled = ranked.crossJoin(F.broadcast(n)).withColumn(
        "quartile", windows.ntile_expr("__r", "__n", 4)
    )
    agged = tiled.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.sum(exact_scaled(F.col("o_totalprice"))).alias("cents"),
    )
    return agged.select(
        "quartile",
        "n_orders",
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
        F.round(F.col("cents") / 100.0 / F.col("n_orders"), 4).alias("avg_price"),
    )


_QUARTILES_SQL = f"""
SELECT quartile, COUNT(*) AS n_orders,
       ROUND(MIN(o_totalprice), 2) AS min_price,
       ROUND(MAX(o_totalprice), 2) AS max_price,
       ROUND(CAST(SUM({_PRICE_CENTS}) AS BIGINT) / 100.0 / COUNT(*), 4) AS avg_price
FROM (
  SELECT o_totalprice, NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile FROM orders
) GROUP BY quartile
"""


def nation_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two per-nation aggregates."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("customer_count")
    )
    s = supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("supplier_count")
    )
    return relational.equi_join(c, s, ["nationkey"], how="full")


_FULL_OUTER_SQL = """
WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS customer_count FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS supplier_count FROM supplier GROUP BY 1)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey, c.customer_count, s.supplier_count
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
"""


def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: grouped HAVING filter, then join the surviving
    keys back to the dimension tables. The HAVING side reduces first
    (partial agg + filter) so the join probes a small key set."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    joined = (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
    )
    return joined.select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.round("total_qty", 2).alias("total_qty"),
    )


_LARGE_ORDERS_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       ROUND(total_qty, 2) AS total_qty
FROM (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def lineitem_flags_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — the multiset variants (Catalyst
    plans them as aggregated joins on per-row counts)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 25).select("l_orderkey", "l_returnflag")
    b = li.filter(F.col("l_discount") >= 0.05).select("l_orderkey", "l_returnflag")
    inter = a.intersectAll(b).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_intersect")
    )
    exc = a.exceptAll(b).groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_except"))
    return inter.join(exc, "l_returnflag", "full")


_INTERSECT_ALL_SQL = """
WITH a AS (SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity >= 25),
     b AS (SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_discount >= 0.05),
     i AS (SELECT l_returnflag, COUNT(*) AS n_intersect
           FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1),
     e AS (SELECT l_returnflag, COUNT(*) AS n_except
           FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1)
SELECT COALESCE(i.l_returnflag, e.l_returnflag) AS l_returnflag, i.n_intersect, e.n_except
FROM i FULL OUTER JOIN e ON i.l_returnflag = e.l_returnflag
"""


def lineitem_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-table windowing at full scale: per-order line sequence with
    lag and a running revenue total over the 600k-row lineitem (the
    window partitions on the natural key, so partitions stay small and
    the sort is per-order, never global)."""
    li = load_table(spark, sf_dir, "lineitem")
    # the synthetic generator does NOT keep (orderkey, linenumber)
    # unique — order on enough columns that any remaining ties are
    # full duplicates of every output value
    order = [
        F.col("l_linenumber").asc(),
        F.col("l_partkey").asc(),
        F.col("l_suppkey").asc(),
        F.col("l_quantity").asc(),
        F.col("l_extendedprice").asc(),
    ]
    w = Window.partitionBy("l_orderkey").orderBy(*order)
    cents = exact_scaled(F.col("l_extendedprice"))
    running = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.sum(cents).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("run_cents"),
        F.count(F.lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("line_seq"),
    )
    return running.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "prev_qty",
        "line_seq",
        F.round(F.col("run_cents") / 100.0, 2).alias("running_price"),
    )


_RUNNING_SQL = f"""
SELECT l_orderkey, l_linenumber, l_quantity,
       LAG(l_quantity) OVER w AS prev_qty,
       CAST(COUNT(*) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS line_seq,
       ROUND(CAST(SUM({sql_scaled('l_extendedprice', 2)})
                  OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) / 100.0, 2) AS running_price
FROM lineitem WINDOW w AS (PARTITION BY l_orderkey
                           ORDER BY l_linenumber, l_partkey, l_suppkey,
                                    l_quantity, l_extendedprice)
"""


def supplier_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-side star join (lineitem ⋈ supplier ⋈ nation): the
    procurement mirror of the customer-side revenue rollup — exercises
    the supplier dimension end of the schema."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = exact_scaled(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
    joined = li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey).join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    )
    agged = joined.groupBy("n_name").agg(
        F.countDistinct("s_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("line_count"),
        F.sum(rev).alias("rev_e4"),
    )
    return agged.select(
        "n_name",
        "n_suppliers",
        "line_count",
        F.round(F.col("rev_e4") / 10000.0, 2).alias("supply_revenue"),
    )


_SUPPLIER_SQL = f"""
SELECT n_name,
       COUNT(DISTINCT s_suppkey) AS n_suppliers,
       COUNT(*) AS line_count,
       ROUND(CAST(SUM({_DISC_PRICE_E4}) AS BIGINT) / 10000.0, 2) AS supply_revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate filter + single global
    aggregate — the canonical pushdown showcase (every predicate
    reaches the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = exact_scaled(F.col("l_extendedprice") * F.col("l_discount"), 4)
    agged = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.sum(rev).alias("rev_e4"), F.count(F.lit(1)).alias("n_lines"))
    return agged.select(
        F.round(F.col("rev_e4") / 10000.0, 2).alias("revenue"), "n_lines"
    )


_FORECAST_SQL = f"""
SELECT ROUND(CAST(SUM({sql_scaled('l_extendedprice * l_discount', 4)}) AS BIGINT) / 10000.0, 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE-inside-SUM)
    aggregation — counts urgent vs non-urgent orders per returnflag."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    joined = li.filter(F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")).join(
        orders, li.l_orderkey == orders.o_orderkey
    )
    return joined.groupBy("l_returnflag").agg(
        F.sum(urgent).alias("high_priority"),
        F.sum(F.lit(1) - urgent).alias("low_priority"),
    )


_PRIORITY_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_priority,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_priority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > TIMESTAMP '1999-01-01'
GROUP BY l_returnflag
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue ratio over a join — the
    numerator is a filtered subset of the same aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = exact_scaled(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    agged = joined.agg(
        F.sum(promo).alias("promo_e4"), F.sum(rev).alias("total_e4")
    )
    return agged.select(
        F.round(F.col("promo_e4") / 10000.0, 2).alias("promo_revenue"),
        F.round(F.col("total_e4") / 10000.0, 2).alias("total_revenue"),
        F.round(F.col("promo_e4") * 100.0 / F.col("total_e4"), 6).alias("promo_pct"),
    )


_PROMO_SQL = f"""
SELECT ROUND(promo_e4 / 10000.0, 2) AS promo_revenue,
       ROUND(total_e4 / 10000.0, 2) AS total_revenue,
       ROUND(promo_e4 * 100.0 / total_e4, 6) AS promo_pct
FROM (
  SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                       THEN {_DISC_PRICE_E4} ELSE 0 END) AS BIGINT) AS promo_e4,
         CAST(SUM({_DISC_PRICE_E4}) AS BIGINT) AS total_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
"""


def returned_items_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top-20
    by rounded revenue (TakeOrderedAndProject)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = exact_scaled(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
    joined = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    agged = (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("rev_e4"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("rev_e4") / 10000.0, 2).alias("lost_revenue"),
        )
    )
    return relational.top_k(
        agged, [F.col("lost_revenue").desc(), F.col("c_custkey").asc()], 20
    )


_RETURNED_SQL = f"""
SELECT c_custkey, c_name, n_name,
       ROUND(CAST(SUM({_DISC_PRICE_E4}) AS BIGINT) / 10000.0, 2) AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey LIMIT 20
"""


def nullsafe_segment_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): customer
    market segments are masked to NULL for every 7th customer (the
    deterministic stand-in for unknown attribution), and a segment
    reference table carrying an explicit NULL row must still match
    those customers — the reconciliation semantics a plain = join
    silently drops. Counts per matched label prove the NULL<->NULL
    matches happened on both engines."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("c_mktsegment")
        ).alias("seg"),
    )
    segs = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("ref_seg"))
        .distinct()
        .unionByName(
            cust.sparkSession.createDataFrame([(None,)], "ref_seg string")
        )
        .withColumn(
            "seg_label", F.coalesce(F.col("ref_seg"), F.lit("UNKNOWN"))
        )
    )
    joined = relational.null_safe_equi_join(
        cust, segs, "seg", "ref_seg", broadcast_right=True
    )
    return joined.groupBy("seg_label").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


_NULLSAFE_SQL = """
WITH cust AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
  FROM customer
), segs AS (
  SELECT ref_seg, COALESCE(ref_seg, 'UNKNOWN') AS seg_label
  FROM (SELECT DISTINCT c_mktsegment AS ref_seg FROM customer
        UNION ALL SELECT NULL)
)
SELECT seg_label, COUNT(*) AS n_customers
FROM cust JOIN segs ON cust.seg IS NOT DISTINCT FROM segs.ref_seg
GROUP BY 1
"""



SPECS = [
    QuerySpec(
        "nullsafe_segment_match", nullsafe_segment_match, _NULLSAFE_SQL, ("join", "nullsafe")
    ),
    QuerySpec("pricing_summary", pricing_summary, _PRICING_SQL, ("agg", "tpch")),
    QuerySpec("lineitem_running_totals", lineitem_running_totals, _RUNNING_SQL, ("window", "tpch")),
    QuerySpec("forecast_revenue", forecast_revenue, _FORECAST_SQL, ("agg", "tpch")),
    QuerySpec("supplier_nation_revenue", supplier_nation_revenue, _SUPPLIER_SQL, ("join",)),
    QuerySpec("priority_shipping", priority_shipping, _PRIORITY_SQL, ("join", "tpch")),
    QuerySpec("promo_revenue_share", promo_revenue_share, _PROMO_SQL, ("join", "tpch")),
    QuerySpec("returned_items_report", returned_items_report, _RETURNED_SQL, ("join", "tpch", "topk")),
    QuerySpec("large_quantity_orders", large_quantity_orders, _LARGE_ORDERS_SQL, ("join", "tpch")),
    QuerySpec("lineitem_flags_intersect_all", lineitem_flags_intersect_all, _INTERSECT_ALL_SQL, ("setop",)),
    QuerySpec("top_revenue_nations", top_revenue_nations, _REVENUE_NATIONS_SQL, ("join",)),
    QuerySpec("shipping_priority", shipping_priority, _SHIPPING_SQL, ("join", "topk")),
    QuerySpec("customer_order_stats", customer_order_stats, _CUST_ORDERS_SQL, ("join",)),
    QuerySpec("big_order_customers_right_join", big_order_customers_right_join, _RIGHT_OUTER_SQL, ("join",)),
    QuerySpec("customers_without_orders", customers_without_orders, _ANTI_SQL, ("join",)),
    QuerySpec("active_customer_segments", active_customer_segments, _SEMI_SQL, ("join",)),
    QuerySpec("order_priority_rollup", order_priority_rollup, _ROLLUP_SQL, ("agg",)),
    QuerySpec("returnflag_linestatus_cube", returnflag_linestatus_cube, _CUBE_SQL, ("agg",)),
    QuerySpec("segment_intersect_bigspenders", segment_intersect_bigspenders, _INTERSECT_SQL, ("setop",)),
    QuerySpec("high_balance_except_active", high_balance_except_active, _EXCEPT_SQL, ("setop",)),
    QuerySpec("customer_order_windows", customer_order_windows, _WINDOWS_SQL, ("window",)),
    QuerySpec("part_price_bands", part_price_bands, _BANDS_SQL, ("join",)),
    QuerySpec("order_quartiles", order_quartiles, _QUARTILES_SQL, ("window",)),
    QuerySpec("nation_customer_supplier", nation_customer_supplier, _FULL_OUTER_SQL, ("join",)),
]
