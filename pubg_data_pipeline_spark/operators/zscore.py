"""Z-score anomaly detection, fully lazy (no driver round-trip).

The reference collects global avg/stddev to the Python driver and
re-embeds them as literals (reference:
spark_apps/advanced_analytics.py:174-196, collect at :181) — a plan
break that forces materialization per micro-batch. Here the 1-row
stats DataFrame is crossJoin(broadcast(...))-ed back instead, keeping
the whole pipeline one Catalyst plan (SURVEY.md §4.1 table, last row).

Also fixes the σ=0 edge: the reference divides by stddev unguarded
(:186-191) yielding null/NaN; we emit z=0 when σ=0 — a documented
semantic difference (SURVEY.md §4.2 item 5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """1-row DataFrame of avg/stddev_samp per column.

    reference: spark_apps/advanced_analytics.py:174-181.
    """
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"avg_{c}"))
        aggs.append(F.stddev(c).alias(f"stddev_{c}"))
    return df.agg(*aggs)


def with_zscores(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Attach ``{col}_zscore`` per column via broadcast of global stats."""
    stats = global_stats(df, cols)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        sd, mu = F.col(f"stddev_{c}"), F.col(f"avg_{c}")
        out = out.withColumn(
            f"{c}_zscore",
            F.when(sd > 0, (F.col(c) - mu) / sd).otherwise(F.lit(0.0)),
        )
    drop = [f"avg_{c}" for c in cols] + [f"stddev_{c}" for c in cols]
    return out.drop(*drop)


def anomalies(df: DataFrame, cols: Sequence[str], threshold: float = 2.5) -> DataFrame:
    """Rows where any |z| exceeds the threshold.

    reference: spark_apps/advanced_analytics.py:184,192-196 —
    ``anomaly_threshold = 2.5``, disjunction of abs-z predicates.
    """
    out = with_zscores(df, cols)
    pred = None
    for c in cols:
        p = F.abs(F.col(f"{c}_zscore")) > threshold
        pred = p if pred is None else (pred | p)
    return out.filter(pred)
