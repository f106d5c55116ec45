"""The SQL-UDF library must stay formula-identical to the Python
Column expressions in functions/metrics.py — both surfaces are the
same engine, so every (SQL fn, Column expr) pair is evaluated over a
grid straddling each CASE/threshold boundary and compared exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.functions import metrics
from pubg_data_pipeline_spark.functions.sql_udfs import register_sql_functions


def test_sql_udfs_match_column_exprs(spark):
    register_sql_functions(spark)
    rows = [
        (k, a, dt, float(dmg), float(z), float(s))
        for k in (0, 14, 15, 19, 20, 33)
        for a in (0, 7)
        for dt in ("alive", "headshot")
        for dmg in (0.0, 2499.9, 2500.0, 4000.0, 5000.0)
        for z in (-1.0, 2.9, 3.0, 4.0)
        for s in (0.0, 1800.0)
    ]
    df = spark.createDataFrame(
        rows, "k int, a int, dt string, dmg double, z double, s double"
    ).createOrReplaceTempView("grid")

    out = spark.sql(
        """
        SELECT k, a, dt, dmg, z, s,
               kda(k, a, dt) AS kda_sql,
               severity(k, dmg, z) AS sev_sql,
               safe_div(dmg, s) AS sd_sql,
               difficulty_score(CAST(k AS DOUBLE), s) AS diff_sql,
               ranking_score(CAST(k AS DOUBLE), CAST(a AS DOUBLE), dmg, s,
                             0.25D, 0.5D, 0.1D) AS rank_sql
        FROM grid
        """
    ).withColumns(
        {
            "kda_py": metrics.kda_expr(F.col("k"), F.col("a"), F.col("dt")),
            "sev_py": metrics.severity_expr(F.col("k"), F.col("dmg"), F.col("z")),
            "sd_py": metrics.safe_div(F.col("dmg"), F.col("s")),
            "diff_py": metrics.difficulty_score_expr(
                F.col("k").cast("double"), F.col("s")
            ),
            "rank_py": metrics.ranking_score_expr(
                F.col("k").cast("double"),
                F.col("a").cast("double"),
                F.col("dmg"),
                F.col("s"),
                F.lit(0.25),
                F.lit(0.5),
                F.lit(0.1),
            ),
        }
    )
    mismatches = out.filter(
        (F.col("kda_sql") != F.col("kda_py"))
        | (F.col("sev_sql") != F.col("sev_py"))
        | (F.col("sd_sql") != F.col("sd_py"))
        | (F.col("diff_sql") != F.col("diff_py"))
        | (F.col("rank_sql") != F.col("rank_py"))
    ).count()
    assert mismatches == 0


def test_register_is_idempotent(spark):
    assert register_sql_functions(spark) == register_sql_functions(spark)
