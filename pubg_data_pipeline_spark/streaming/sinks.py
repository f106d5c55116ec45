"""Streaming sinks (SURVEY.md §2.1 S3-S7) + multi-query orchestration.

Mirrors the reference's sink matrix: checkpointed append-mode parquet
(reference: spark_apps/pubg_streaming.py:236-244), console debug sink
(:265-269), foreachBatch escape hatch
(spark_apps/advanced_analytics.py:284-288), and Kafka JSON sinks
(:207-228,269-278). Ours adds date partitioning on the parquet sink
(partition pruning at 100 TB) and a memory sink for tests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_seconds: int = 60,
    partition_by: list[str] | None = None,
    query_name: str | None = None,
) -> StreamingQuery:
    """Append-mode checkpointed parquet sink, 60 s micro-batches like
    the reference (trigger at spark_apps/pubg_streaming.py:243), plus
    optional partition columns (the reference writes unpartitioned;
    date-partitioning makes downstream time-range scans prunable)."""
    writer = (
        df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if query_name:
        writer = writer.queryName(query_name)
    return writer.start()


def console_sink(df: DataFrame, num_rows: int = 20, trigger_seconds: int = 60) -> StreamingQuery:
    """Debug console sink (reference: spark_apps/pubg_streaming.py:265-269)."""
    return (
        df.writeStream.format("console")
        .outputMode("append")
        .option("numRows", num_rows)
        .option("truncate", "false")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def memory_sink(
    df: DataFrame, name: str, output_mode: str = "append"
) -> StreamingQuery:
    """In-memory table sink for tests: query results via
    ``spark.sql(f"SELECT * FROM {name}")``."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def foreach_batch_sink(
    df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    trigger_seconds: int = 60,
    output_mode: str = "append",
    available_now: bool = False,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """foreachBatch escape hatch (reference:
    spark_apps/advanced_analytics.py:284-288). The callback receives a
    materialized batch_df per epoch; callers should persist()/
    unpersist() it when issuing multiple actions — the reference
    recomputes its batch ~10× by skipping that (SURVEY.md §4.2 item 2).

    ``available_now=True`` is the backfill/reprocessing mode: drain
    everything currently in the source in rate-limited micro-batches,
    then stop — same checkpointed exactly-once bookkeeping, so one job
    definition serves both the 60 s live loop and a historical catch-up
    run (the reference cannot backfill at all: offsets policy `latest`,
    BASELINE.md)."""
    writer = df.writeStream.foreachBatch(fn).outputMode(output_mode)
    if checkpoint is not None:
        # An explicit location makes incremental reruns (availableNow
        # catch-up jobs) resume the SAME offset bookkeeping across
        # process restarts — required for ingest-style sinks whose
        # output accumulates outside the stream (e.g.
        # app.streaming_ingest_dedup).
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def kafka_json_sink(
    df: DataFrame, bootstrap_servers: str, topic: str
) -> None:
    """Batch Kafka sink: serialize all columns as one JSON value
    (reference: spark_apps/advanced_analytics.py:207-228 alert payload,
    :269-278 ``to_json(struct("*"))`` aggregate payload)."""
    (
        df.select(F.to_json(F.struct("*")).alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .mode("append")
        .save()
    )


def await_any(spark, timeout_seconds: int | None = None) -> bool:
    """Multi-query orchestration (D9): block until any active query
    terminates (reference: spark_apps/pubg_streaming.py:272).

    Returns True iff a query terminated (always True for the
    untimed form) — a poll-and-restart loop needs to distinguish
    'something terminated' from 'the timeout elapsed'."""
    if timeout_seconds is None:
        spark.streams.awaitAnyTermination()
        return True
    # StreamingQueryManager.awaitAnyTermination takes SECONDS
    # (PySpark converts to ms internally).
    return bool(spark.streams.awaitAnyTermination(timeout_seconds))
