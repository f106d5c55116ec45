"""SQL-front-end queries: the same engine through ``spark.sql`` over
registered views, exercising subquery shapes the DataFrame API doesn't
surface directly (scalar, IN, correlated EXISTS). Catalyst decorrelates
these into the same joins the DataFrame suite plans — the point is API
parity: a reference user can bring either dialect (SURVEY.md §2.4's
"standard join suite ... only API surface + correctness tests").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pubg_data_pipeline_spark.plans.base import QuerySpec, sql_scaled
from pubg_data_pipeline_spark.sources.tables import load_table

_CENTS = sql_scaled("o_totalprice", 2)


def _sql(spark: SparkSession, sf_dir: str, tables: tuple[str, ...], query: str) -> DataFrame:
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(query)


# Scalar subquery: global average as an uncorrelated scalar.
_ABOVE_AVG_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
"""


def above_avg_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ("customer",), _ABOVE_AVG_SQL)


# IN subquery (Catalyst -> left semi join).
_IN_SUBQ_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
  AND o_totalprice > 200000
"""


def machinery_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ("orders", "customer"), _IN_SUBQ_SQL)


# Correlated scalar subquery (per-customer max, decorrelated to an agg join).
_CORR_SQL = f"""
SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                        WHERE o2.o_custkey = o.o_custkey)
"""


def biggest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ("orders",), _CORR_SQL)


# CTE + window + join in one statement, same text in both dialects.
_CTE_SQL = """
WITH seg_totals AS (
  SELECT c_mktsegment, c_custkey, SUM(o_totalprice) AS spend
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_mktsegment, c_custkey
), ranked AS (
  SELECT c_mktsegment, c_custkey,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY ROUND(spend, 2) DESC, c_custkey) AS rn
  FROM seg_totals
)
SELECT c_mktsegment, c_custkey, rn FROM ranked WHERE rn <= 5
"""


def top_spenders_per_segment_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + join + windowed rank in one SQL statement — identical
    text runs on both engines (ordering on the rounded spend with a
    key tie-break keeps rank selection deterministic; spend itself is
    not projected, so float noise can't reach the hash)."""
    return _sql(spark, sf_dir, ("customer", "orders"), _CTE_SQL)


# The above SQL strings are valid in both dialects, so the oracle is
# the identical text (plus a deterministic guard where needed).
SPECS = [
    QuerySpec("above_avg_balance_customers", above_avg_balance_customers, _ABOVE_AVG_SQL, ("sql", "subquery")),
    QuerySpec("machinery_big_orders", machinery_big_orders, _IN_SUBQ_SQL, ("sql", "subquery")),
    QuerySpec("biggest_order_per_customer", biggest_order_per_customer, _CORR_SQL, ("sql", "subquery")),
    QuerySpec("top_spenders_per_segment_cte", top_spenders_per_segment_cte, _CTE_SQL, ("sql", "window")),
]
