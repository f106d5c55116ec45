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


# Recursive CTE #1 — generator shape (single-row growth): a daily date
# spine anchored on the data's own min/max, left-joined to per-day
# counts so gap days surface as explicit zeros. Spark 4 recursive CTEs
# (UnionLoopExec) default to a 100-iteration cap; the Spark text raises
# it via MAX RECURSION LEVEL so a legitimately longer retention window
# (up to ~13 months of days) still plans, while a dirty far-future row
# fails fast at the cap instead of looping for years. The oracle is the
# same query in DuckDB's dialect (strftime / no level clause).
# The recursion bound travels WITH the row (spine carries dmax): a
# bound expressed as a scalar subquery in the recursive leg would be
# re-evaluated on EVERY iteration — 30 extra scans of events here, and
# a full re-scan per day of spine at 100 TB. Anchoring both ends once
# makes each iteration a 1-row arithmetic step.
_SPINE_RCTE_SPARK = """
WITH RECURSIVE spine(d, dmax) MAX RECURSION LEVEL 400 AS (
  SELECT DATE_TRUNC('DAY', MIN(ts)), DATE_TRUNC('DAY', MAX(ts)) FROM events
  UNION ALL
  SELECT d + INTERVAL 1 DAY, dmax FROM spine
  WHERE d + INTERVAL 1 DAY <= dmax
),
daily AS (
  SELECT DATE_TRUNC('DAY', ts) AS d, COUNT(*) AS n
  FROM events GROUP BY DATE_TRUNC('DAY', ts)
)
SELECT date_format(spine.d, 'yyyy-MM-dd') AS day, COALESCE(daily.n, 0) AS n_events
FROM spine LEFT JOIN daily ON spine.d = daily.d
"""

_SPINE_RCTE_ORACLE = """
WITH RECURSIVE spine(d, dmax) AS (
  SELECT DATE_TRUNC('DAY', MIN(ts)), DATE_TRUNC('DAY', MAX(ts)) FROM events
  UNION ALL
  SELECT d + INTERVAL 1 DAY, dmax FROM spine
  WHERE d + INTERVAL 1 DAY <= dmax
),
daily AS (
  SELECT DATE_TRUNC('DAY', ts) AS d, COUNT(*) AS n
  FROM events GROUP BY DATE_TRUNC('DAY', ts)
)
SELECT strftime(spine.d, '%Y-%m-%d') AS day, COALESCE(daily.n, 0) AS n_events
FROM spine LEFT JOIN daily ON spine.d = daily.d
"""


def daily_spine_rcte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date spine via Spark 4's recursive CTE (SPARK-24497): the
    iterative twin of the ``sequence()``-based ``time_spine``
    (operators/timeseries.py) — same zero-filled output, different
    engine mechanism (UnionLoopExec batch iteration vs one array
    explode). The sequence() form is the production path at scale
    (one job, no per-iteration scheduling); this pins the SQL-dialect
    feature itself cross-engine."""
    return _sql(spark, sf_dir, ("events",), _SPINE_RCTE_SPARK)


# Recursive CTE #2 — set-growth shape (graph traversal): BFS over the
# observed event-type transition graph (distinct consecutive pairs per
# user), min-hop distance from 'signup' bounded to 2 hops. The depth
# bound makes termination data-independent; dedup-to-min happens in the
# final aggregate, exactly how the CC operator's oracle works
# (plans/graph_queries.py), so this also cross-checks the recursive
# dialect path end-to-end. Identical text runs on both engines.
_REACH_RCTE_SQL = """
WITH RECURSIVE reach(node, hops) AS (
  SELECT CAST('signup' AS VARCHAR(10)) AS node, 0 AS hops
  UNION ALL
  SELECT e.dst, r.hops + 1
  FROM reach r JOIN (
    SELECT DISTINCT src, dst FROM (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events
    ) t WHERE dst IS NOT NULL AND dst <> src
  ) e ON e.src = r.node
  WHERE r.hops < 2
)
SELECT node, MIN(hops) AS min_hops FROM reach GROUP BY node
"""


def event_type_reachability_rcte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS reachability through a recursive CTE — the
    set-growth recursion shape (frontier join per iteration). For
    unbounded-depth closure at 100 TB the pointer-jumping operator
    (operators/graph.py:connected_components, O(log d) rounds) is the
    scale path; a linear-depth recursive join is the right tool only
    for small bounded depths like this 2-hop probe."""
    return _sql(spark, sf_dir, ("events",), _REACH_RCTE_SQL)


# Bitwise / boolean aggregate family — BOOL_AND/BOOL_OR (ANSI
# every/any), BIT_AND/BIT_OR/BIT_XOR, COUNT_IF. All six are
# commutative-associative JVM aggregates (map-side partials, one
# shuffle) and order-independent by construction (bit ops on exact
# integers), so no rounding is needed anywhere. Identical text runs on
# both engines, except COUNT_IF: DuckDB's returns HUGEINT (int128 —
# arrives in pandas as float64 and drifts the driver hash), so the
# shared text pins it to BIGINT, a no-op for Spark.
_BITS_SQL = """
SELECT event_type,
       BOOL_AND(value >= 0) AS all_nonneg,
       BOOL_OR(value > 900) AS any_gt900,
       BIT_AND(user_id) AS uid_and,
       BIT_OR(user_id) AS uid_or,
       BIT_XOR(user_id) AS uid_xor,
       CAST(COUNT_IF(value > 500) AS BIGINT) AS n_gt500
FROM events
GROUP BY event_type
"""


def event_bitwise_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean and bitwise aggregate surface (NULL rows are skipped by
    all six aggregates in both engines — pinned by the shared text)."""
    return _sql(spark, sf_dir, ("events",), _BITS_SQL)


# The above SQL strings are valid in both dialects, so the oracle is
# the identical text (plus a deterministic guard where needed).
SPECS = [
    QuerySpec("above_avg_balance_customers", above_avg_balance_customers, _ABOVE_AVG_SQL, ("sql", "subquery")),
    QuerySpec("machinery_big_orders", machinery_big_orders, _IN_SUBQ_SQL, ("sql", "subquery")),
    QuerySpec("biggest_order_per_customer", biggest_order_per_customer, _CORR_SQL, ("sql", "subquery")),
    QuerySpec("top_spenders_per_segment_cte", top_spenders_per_segment_cte, _CTE_SQL, ("sql", "window")),
    QuerySpec("daily_spine_rcte", daily_spine_rcte, _SPINE_RCTE_ORACLE, ("sql", "recursive")),
    QuerySpec("event_type_reachability_rcte", event_type_reachability_rcte, _REACH_RCTE_SQL, ("sql", "recursive")),
    QuerySpec("event_bitwise_bool_aggs", event_bitwise_bool_aggs, _BITS_SQL, ("sql", "aggregate")),
]
