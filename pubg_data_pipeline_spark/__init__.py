"""pubg_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference PUBG telemetry pipeline
(``vkfltmdwpfmakd-spec/pubg_data_pipeline``) as an idiomatic Spark
DataFrame/SQL library, extended with the relational surface required
by a TPC-H-style star schema and LLM-training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Layers (SURVEY.md §7.0):
  session    -- SparkSession factory (AQE, timezone, parquet-nanos)
  sources    -- batch/streaming readers + table registry
  functions  -- column-expression kits (metrics, text, vectors)
  operators  -- pure DataFrame -> DataFrame operators
  plans      -- named analytic queries + duckdb-oracle SQL
  streaming  -- structured-streaming adapters over the same operators
"""

from pubg_data_pipeline_spark.audit import Finding, assert_scale_safe, audit_plan
from pubg_data_pipeline_spark.session import get_spark, configure_session

__all__ = [
    "get_spark",
    "configure_session",
    # pre-flight plan gate (audit.py): lint any DataFrame's physical
    # plan for the patterns that break at 100 TB — the same gate the
    # query registry runs under in tests/test_audit.py. Typical use:
    #
    #     import pubg_data_pipeline_spark as pds
    #     pds.assert_scale_safe(df)                       # raise on critical
    #     pds.assert_scale_safe(df, allow={"nested_loop_join"})  # documented exception
    #     findings = pds.audit_plan(df)                   # inspect instead
    "assert_scale_safe",
    "audit_plan",
    "Finding",
]
