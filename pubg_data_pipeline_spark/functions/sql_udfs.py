"""SQL-native function library: the engine's scalar metric formulas
registered as Spark 4 SQL UDFs (CREATE TEMPORARY FUNCTION ... RETURN
<expr>), so a SQL-only client gets the exact semantics of
functions/metrics.py without touching the Python API.

SQL UDFs are inlined into the plan by Catalyst (they are expression
macros, not black-box callables), so they cost nothing at 100 TB —
unlike a Python UDF, the severity CASE chain registered here still
runs inside whole-stage codegen. Formula provenance is the same as
functions/metrics.py (reference: monitoring/metrics_collector.py:
122-126 for KDA, monitoring/alert_manager.py:366-396 for severity,
spark_apps/advanced_analytics.py:122-130 and :262-264 for the ranking
and difficulty polynomials).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, return type, body). Bodies are plain SQL
# expressions so Catalyst inlines them; keep them in exact sync with
# functions/metrics.py (tests/test_sql_udfs.py pins equivalence).
SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "safe_div": (
        "(num DOUBLE, den DOUBLE)",
        "DOUBLE",
        "num / GREATEST(den, 1.0D)",
    ),
    "kda": (
        "(kills INT, assists INT, death_type STRING)",
        "DOUBLE",
        "(kills + assists) / CAST(GREATEST(CASE WHEN death_type = 'alive' "
        "THEN 0 ELSE 1 END, 1) AS DOUBLE)",
    ),
    "severity": (
        "(kills INT, damage DOUBLE, max_zscore DOUBLE)",
        "STRING",
        "CASE WHEN kills >= 20 OR damage >= 4000 OR max_zscore >= 4 THEN 'HIGH' "
        "WHEN kills >= 15 OR damage >= 2500 OR max_zscore >= 3 THEN 'MEDIUM' "
        "ELSE 'LOW' END",
    ),
    "ranking_score": (
        "(avg_kills DOUBLE, avg_assists DOUBLE, avg_damage DOUBLE, "
        "avg_survival DOUBLE, win_rate DOUBLE, top10_rate DOUBLE, "
        "avg_headshot_ratio DOUBLE)",
        "DOUBLE",
        "avg_kills * 10 + avg_assists * 5 + avg_damage * 0.01 + "
        "avg_survival * 0.005 + win_rate * 100 + top10_rate * 50 + "
        "avg_headshot_ratio * 30",
    ),
    "difficulty_score": (
        "(avg_kills DOUBLE, avg_survival DOUBLE)",
        "DOUBLE",
        "(1.0D / (avg_kills + 1)) * (1.0D / (avg_survival + 1)) * 100",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every formula as a session-scoped SQL UDF; returns the
    registered names. Idempotent (CREATE OR REPLACE)."""
    for name, (sig, ret, body) in SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(SQL_FUNCTIONS)
