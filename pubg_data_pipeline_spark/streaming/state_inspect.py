"""Streaming state-store observability: read a running (or stopped)
query's checkpointed state as ordinary DataFrames via Spark 4's
``statestore`` / ``state-metadata`` batch sources.

Why this exists: the reference operates its pipeline blind — its only
state visibility is log lines and InfluxDB gauges (reference
monitoring/performance_monitor.py polls the Spark REST API; nothing
can answer "WHICH keys are currently held by dropDuplicates?"). At
100 TB, debugging a watermark that refuses to advance, a state store
that balloons, or a dedup key that never expires requires inspecting
the state itself; these helpers make the checkpoint a queryable table
instead of an opaque directory tree.

Scale: both sources are ordinary batch scans over the checkpoint's
state files — they read in parallel per partition-store, never through
the driver, and compose with the usual ``filter``/``groupBy`` so a
"which keys dominate state?" question is one aggregation, not a full
download.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Operator-level map of a query checkpoint: one row per stateful
    operator with its operatorId/operatorName, state store names, and
    the min/max batch ids still reconstructible — the first thing to
    look at before reading any store (it tells you WHAT state exists
    and which ``operator_id``/``batch_id`` are valid to ask for)."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


def read_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """The state rows themselves: ``key`` / ``value`` structs plus the
    shuffle ``partition_id`` for every entry the operator holds as of
    ``batch_id`` (default: the last committed batch). Join-type
    operators expose multiple named stores — pass ``store_name`` (see
    :func:`state_metadata`)."""
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint_dir)


def state_key_histogram(
    spark: SparkSession, checkpoint_dir: str, operator_id: int = 0
) -> DataFrame:
    """Per-shuffle-partition state-row counts — the "is my state
    skewed?" readout. A healthy stateful operator spreads keys evenly;
    one hot partition here explains a straggling stateful stage the
    same way a hot key explains a straggling join."""
    return (
        read_state(spark, checkpoint_dir, operator_id)
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_state_rows"))
    )
