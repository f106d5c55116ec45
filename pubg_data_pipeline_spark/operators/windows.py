"""Window-function kit: moving averages, sequence numbers, trends,
ranking, lag/lead.

Mirrors the reference's foreachBatch analytics (reference:
spark_apps/advanced_analytics.py:141-168) with two scale fixes:
every ordering is tie-broken by a deterministic key column, and global
ranking is offered as two-phase top-k rather than an unpartitioned
window (SURVEY.md §4.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def moving_average(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value_cols: Sequence[str],
    window_size: int = 5,
    prefix: str = "recent",
) -> DataFrame:
    """Trailing moving average over the last ``window_size`` rows.

    reference: spark_apps/advanced_analytics.py:141-150 —
    ``Window.partitionBy("player_name").orderBy("processed_at")
    .rowsBetween(-4, 0)`` with avg over kills/damage/time_survived.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-(window_size - 1), 0)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(f"{prefix}_{window_size}_avg_{c}", F.avg(F.col(c)).over(w))
    return out


def sequence_number(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    name: str = "seq_no",
) -> DataFrame:
    """Per-partition 1-based sequence number.

    reference: spark_apps/advanced_analytics.py:151-153 (game_number).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(name, F.row_number().over(w))


def trend_detection(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    window_size: int = 5,
    min_rows: int = 5,
    threshold: float = 2.0,
) -> DataFrame:
    """Deviation-from-trailing-average trend filter.

    reference: spark_apps/advanced_analytics.py:156-161 — keep rows
    where |value - trailing avg| exceeds a threshold, only after the
    partition has at least ``min_rows`` rows.
    """
    out = moving_average(df, partition_by, order_by, [value_col], window_size)
    out = sequence_number(out, partition_by, order_by, "seq_no")
    avg_col = f"recent_{window_size}_avg_{value_col}"
    out = out.withColumn(f"{value_col}_trend", F.col(value_col) - F.col(avg_col))
    return out.filter(
        (F.col("seq_no") >= min_rows) & (F.abs(F.col(f"{value_col}_trend")) > threshold)
    )


def ranked(
    df: DataFrame,
    order_by: Sequence[Column],
    partition_by: Sequence[str] | None = None,
    name: str = "rank",
    method: str = "row_number",
) -> DataFrame:
    """Attach a rank column. With no partition this funnels all rows to
    one task (the reference does exactly that at
    spark_apps/advanced_analytics.py:129) — acceptable only when the
    input is already reduced (e.g. post-aggregation); for raw-data
    top-k use relational.top_k instead."""
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return df.withColumn(name, fn().over(w.orderBy(*order_by)))


def lag_lead_features(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
) -> DataFrame:
    """lag/lead/delta features (not in the reference — SURVEY.md §2.6
    notes trend detection W4 is more naturally lag; shipped because the
    oracle harness exercises them)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(f"prev_{value_col}", F.lag(value_col).over(w))
        .withColumn(f"next_{value_col}", F.lead(value_col).over(w))
        .withColumn(
            f"{value_col}_delta", F.col(value_col) - F.lag(value_col).over(w)
        )
    )
