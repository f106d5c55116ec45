"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query logic lives in ``pubg_data_pipeline_spark.plans`` — this
module only adapts the QuerySpec registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pubg_data_pipeline_spark.plans import all_specs  # noqa: E402
from pubg_data_pipeline_spark.session import configure_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (player-ranking top-10, SURVEY.md §7.1) on
    /root/testdata/sf0.001; driver checks rows>0."""
    configure_session(spark)
    spec = all_specs()["player_ranking_top10"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return spec.fn(spark, sf_dir)

        return run

    return {name: wrap(spec) for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible
    ops (MinHash/SimHash/LSH — hash-family mismatch), which get the
    driver's rows-only check."""
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle}
