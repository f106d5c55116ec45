"""Single-pass side-channel metrics via DataFrame.observe.

The reference computes pipeline health with EXTRA queries — e.g. the
analytics app re-counts each micro-batch before processing it
(reference spark_apps/advanced_analytics.py: a ``batch_df.count()``
guard per batch) and the collectors re-scan Kafka topics to produce
row-rate gauges. ``observe`` attaches aggregate metrics to the SAME
job that produces the data: zero extra scans, exact values, delivered
through the Observation handle (batch) or QueryProgress (streaming).

At 100 TB the difference is one full pass per metric set — a
"count nulls before writing" guard done as a separate ``count()``
doubles the job; done as an observation it is free map-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def quality_metrics(value_col: str, ts_col: str | None = None) -> list[Column]:
    """The standard write-guard metric set: row count, null-value
    count, negative-value count, plus event-time bounds when a
    timestamp column is named. All commutative aggregates — observe
    computes them as map-side partials on the job's own pass."""
    cols = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col(value_col).isNull(), 1)).alias("n_null_value"),
        F.count(F.when(F.col(value_col) < 0, 1)).alias("n_negative_value"),
    ]
    if ts_col is not None:
        cols.append(F.min(ts_col).alias("min_ts"))
        cols.append(F.max(ts_col).alias("max_ts"))
    return cols


def observed(df: DataFrame, name: str, *metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach ``metrics`` to ``df``'s next action and return the
    (instrumented frame, observation handle). Read ``obs.get`` AFTER
    an action has materialized the frame — the handle blocks until the
    job that carried the metrics finishes.

    For STREAMING frames use ``df.observe(name, *metrics)`` directly
    and read the values from each progress event's ``observedMetrics``
    (streaming/metrics.ProgressMetricsListener picks them up); the
    Observation handle is batch-only by Spark's design."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
