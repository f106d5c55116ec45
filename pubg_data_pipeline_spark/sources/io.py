"""Batch IO: partitioned and bucketed writes (SURVEY.md §2.1 S3/S11
batch analogs, scaled).

The reference writes unpartitioned parquet to HDFS (reference:
spark_apps/pubg_streaming.py:236-244; layout docker-compose.yml:
137-148). At 100 TB two storage decisions dominate query cost:

- **date partitioning** -> partition pruning: time-range scans touch
  only matching directories (`PartitionFilters` in the plan);
- **bucketing on the join/dedup key** -> co-located joins: two tables
  bucketed on the same key by the same bucket count join with ZERO
  shuffle (no Exchange in the plan), and bucket-key aggregations skip
  the exchange too.

Both are exercised by tests/test_io.py, which asserts the plan shape,
not just the results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_date(
    df: DataFrame, path: str, ts_col: str, mode: str = "overwrite"
) -> None:
    """Parquet partitioned by the date of ``ts_col`` (adds a ``p_date``
    partition column)."""
    (
        df.withColumn("p_date", F.to_date(F.col(ts_col)))
        .write.mode(mode)
        .partitionBy("p_date")
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (optionally sorted) parquet table in the
    session catalog. Joins between tables bucketed on the same key and
    count need no shuffle; sorting within buckets additionally removes
    the sort from sort-merge joins."""
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """CSV batch source. Schema-on-read like every other source in the
    engine: pass an explicit DDL schema in production (inference scans
    the data twice and locks in whatever the sample implied); PERMISSIVE
    mode degrades malformed rows to nulls, matching the JSON path."""
    reader = spark.read.option("header", str(header).lower()).option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: str | None = None, multiline: bool = False
) -> DataFrame:
    """JSON-lines batch source (set multiline for one-document files)."""
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
