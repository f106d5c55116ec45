"""Batch table registry for the synthetic star schema (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. The
``events`` table stores ``ts`` as parquet timestamp[ns], which Spark
cannot read natively — under ``spark.sql.legacy.parquet.nanosAsLong``
it arrives as a long which we convert to a microsecond timestamp with
exact integer division (``ts div 1000``; double division would lose
precision at epoch-nanos magnitude).

At 100 TB these reads stay efficient because every consumer selects
columns explicitly (parquet column pruning) and filters early
(predicate pushdown) — verify with ``df.explain()``: look for
``PushedFilters`` and a narrow ``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.session import configure_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, normalizing types."""
    configure_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos -> micros, truncating like DuckDB's ns->us display/cast.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for spark.sql() access."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
