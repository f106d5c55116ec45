"""Streaming sources behind one interface (SURVEY.md §7.2 M4).

The reference reads only Kafka (reference:
spark_apps/pubg_streaming.py:19-25 — subscribe ``pubg-matches``,
``startingOffsets=latest``, ``failOnDataLoss=false``). Tests use the
file and rate sources so no broker is needed; the operator pipeline is
identical regardless of source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Kafka source with the reference's options (reference:
    spark_apps/pubg_streaming.py:19-25; offset policy D10 at :23-24).
    Returns the raw (key, value, topic, partition, offset, timestamp)
    frame; pair with etl.parse_envelope."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
        .load()
    )


def json_file_stream(
    spark: SparkSession, path: str, schema: StructType, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File source over JSON-lines — the broker-free test stand-in for
    the Kafka topic; each file plays one batch of messages."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def parquet_file_stream(
    spark: SparkSession, path: str, schema: StructType, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def text_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Text-file source: one message per line in a single ``value``
    string column — shape-compatible with the Kafka source, so
    etl.parse_envelope works unchanged (the broker-free test path)."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.text(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic (timestamp, value) source for throughput tests."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
