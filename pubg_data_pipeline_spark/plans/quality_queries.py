"""Data-quality query batch: column profiling and expectation gates
(operators/profile.py), oracle-checked.

The reference ships malformed rows straight to storage (PERMISSIVE
from_json at spark_apps/pubg_streaming.py:138-145 turns bad JSON into
all-null rows; nothing downstream checks them) — these queries grade
the validation layer a production ingest needs in front of that sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import profile
from pubg_data_pipeline_spark.plans.base import QuerySpec
from pubg_data_pipeline_spark.sources.tables import load_table


def events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column health report over events: nulls, exact distincts,
    typed min/max — one aggregation pass for all five columns
    (operators/profile.profile_columns; the multi-distinct plans as
    one Expand+partial-agg job). Timestamps are pre-formatted to
    second strings so min/max stringification is cross-engine-stable."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "user_id",
        "event_type",
        "value",
    )
    return profile.profile_columns(
        ev, ["event_id", "ts_s", "user_id", "event_type", "value"]
    )


def _profile_col_sql(col: str) -> str:
    return f"""
SELECT '{col}' AS column_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({col}) AS n_nulls,
       ROUND((COUNT(*) - COUNT({col})) * 1.0 / COUNT(*), 6) AS null_frac,
       COUNT(DISTINCT {col}) AS n_distinct,
       CAST(MIN({col}) AS VARCHAR) AS min_value,
       CAST(MAX({col}) AS VARCHAR) AS max_value
FROM src"""


_PROFILE_SQL = (
    """
WITH src AS (
  SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
         user_id, event_type, value
  FROM events
)
"""
    + "\nUNION ALL\n".join(
        _profile_col_sql(c)
        for c in ("event_id", "ts_s", "user_id", "event_type", "value")
    )
)


def events_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative ingest expectations over events, all rules evaluated
    in one scan (operators/profile.expectations_report): non-negative
    values, known event types, 2024 timestamps, present user ids. A
    NULL rule evaluation counts as a violation (CHECK-style safety)."""
    ev = load_table(spark, sf_dir, "events")
    rules = [
        ("value_nonnegative", F.col("value") >= 0),
        (
            "event_type_known",
            F.col("event_type").isin("signup", "click", "error", "view", "purchase"),
        ),
        ("ts_in_2024", F.year("ts") == 2024),
        ("user_id_present", F.col("user_id").isNotNull()),
    ]
    return profile.expectations_report(ev, rules)


_CHECKS_SQL = """
WITH src AS (SELECT * FROM events), r AS (
  SELECT 'value_nonnegative' AS rule_name,
         COUNT(*) AS n_rows,
         SUM(CASE WHEN NOT COALESCE(value >= 0, FALSE) THEN 1 ELSE 0 END) AS n_violations
  FROM src
  UNION ALL
  SELECT 'event_type_known', COUNT(*),
         SUM(CASE WHEN NOT COALESCE(event_type IN ('signup','click','error','view','purchase'), FALSE) THEN 1 ELSE 0 END)
  FROM src
  UNION ALL
  SELECT 'ts_in_2024', COUNT(*),
         SUM(CASE WHEN NOT COALESCE(EXTRACT(year FROM ts) = 2024, FALSE) THEN 1 ELSE 0 END)
  FROM src
  UNION ALL
  SELECT 'user_id_present', COUNT(*),
         SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
  FROM src
)
SELECT rule_name, n_rows, CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM r
"""


SPECS = [
    QuerySpec("events_column_profile", events_column_profile, _PROFILE_SQL, ("quality", "agg")),
    QuerySpec("events_quality_checks", events_quality_checks, _CHECKS_SQL, ("quality", "agg")),
]
