"""Derived-metric column expressions (reference semantics, UDF-free).

Everything here is a pure Column expression so it stays inside
whole-stage codegen — the reference computed two of these row-at-a-time
in Python collectors (KDA: monitoring/metrics_collector.py:122-126;
severity: monitoring/alert_manager.py:366-396) which this engine
re-expresses as CASE/arithmetic expressions (SURVEY.md §2.2 P15-P16).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def safe_div(num: Column, den: Column) -> Column:
    """Null/zero-safe ratio: denominator floored at 1.

    reference: spark_apps/advanced_analytics.py:85-86 uses
    ``damage_dealt / greatest(time_survived, lit(1))``.
    """
    return num / F.greatest(den, F.lit(1))


def kda_expr(kills: Column, assists: Column, death_type: Column) -> Column:
    """KDA with 'alive' special-cased to zero deaths.

    reference: monitoring/metrics_collector.py:122-126 —
    ``deaths = 1 if death_type != 'alive' else 0;
    kda = (kills + assists) / max(deaths, 1)``.
    """
    deaths = F.when(death_type == "alive", F.lit(0)).otherwise(F.lit(1))
    return (kills + assists) / F.greatest(deaths, F.lit(1))


def severity_expr(kills: Column, damage: Column, max_zscore: Column) -> Column:
    """Alert severity classification as a chained CASE expression.

    reference: monitoring/alert_manager.py:366-396 —
    HIGH:   kills>=20 or damage>=4000 or any z>=4   (:387-389)
    MEDIUM: kills>=15 or damage>=2500 or any z>=3   (:392-394)
    else LOW. The z comparisons are SIGNED (the reference abs()es in
    the anomaly filter, advanced_analytics.py:193-195, but not here),
    so ``max_zscore`` = max of the signed per-metric z-scores.
    """
    return (
        F.when((kills >= 20) | (damage >= 4000) | (max_zscore >= 4), F.lit("HIGH"))
        .when((kills >= 15) | (damage >= 2500) | (max_zscore >= 3), F.lit("MEDIUM"))
        .otherwise(F.lit("LOW"))
    )


def ranking_score_expr(
    avg_kills: Column,
    avg_assists: Column,
    avg_damage: Column,
    avg_survival: Column,
    win_rate: Column,
    top10_rate: Column,
    avg_headshot_ratio: Column,
) -> Column:
    """Weighted player-ranking polynomial, exactly the reference's
    weights (verified against source).

    reference: spark_apps/advanced_analytics.py:122-130 —
    ``avg_kills*10 + avg_assists*5 + avg_damage*0.01 +
    avg_survival*0.005 + win_rate*100 + top10_rate*50 +
    avg_headshot_ratio*30``.
    """
    return (
        avg_kills * 10
        + avg_assists * 5
        + avg_damage * 0.01
        + avg_survival * 0.005
        + win_rate * 100
        + top10_rate * 50
        + avg_headshot_ratio * 30
    )


def difficulty_score_expr(avg_kills: Column, avg_survival: Column) -> Column:
    """Map-difficulty formula over RAW average survival seconds
    (the reference does not convert to minutes here).

    reference: spark_apps/advanced_analytics.py:262-264 —
    ``(1/(avg_kills+1)) * (1/(avg_survival+1)) * 100``.
    """
    return (1.0 / (avg_kills + 1)) * (1.0 / (avg_survival + 1)) * 100


def derived_performance_cols(df: DataFrame) -> DataFrame:
    """Attach the reference's per-match derived metrics.

    reference: spark_apps/advanced_analytics.py:84-89 — ka_score, dps,
    headshot_ratio, is_winner, top10_finish, plus the null guard.
    """
    return (
        df.withColumn("ka_score", F.col("kills") + F.col("assists"))
        .withColumn("dps", safe_div(F.col("damage_dealt"), F.col("time_survived")))
        .withColumn(
            "headshot_ratio",
            safe_div(F.col("headshot_kills").cast("double"), F.col("kills").cast("double")),
        )
        .withColumn("is_winner", F.when(F.col("win_place") == 1, 1).otherwise(0))
        .withColumn("top10_finish", F.when(F.col("win_place") <= 10, 1).otherwise(0))
        .filter(F.col("kills").isNotNull() & F.col("damage_dealt").isNotNull())
    )
