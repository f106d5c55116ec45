"""Encoding-drift guard for the generated testdata.

Round-2 postmortem: the driver regenerated /root/testdata after the
last commit, switching events.ts from parquet timestamp[ns] (read as
bigint under nanosAsLong) to timestamp[us]-NTZ, which Spark 4 reads as
TIMESTAMP_NTZ — four queries casting ts to numeric types broke and
the benchmark crashed. sources.tables.load_table now normalizes every
physical encoding to session-zoned TimestampType; these tests make a
future drift impossible to miss in the first minute of a round.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from pubg_data_pipeline_spark.sources.tables import load_table

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1") if os.path.isdir(d)]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize(
    "table,ts_col",
    [("events", "ts"), ("orders", "o_orderdate"), ("lineitem", "l_shipdate")],
)
def test_ts_columns_are_timestamp_for_every_sf(spark, sf_dir, table, ts_col):
    df = load_table(spark, sf_dir, table)
    assert df.schema[ts_col].dataType == TimestampType(), (
        f"{table}.{ts_col} normalized to {df.schema[ts_col].dataType} in {sf_dir}; "
        "load_table must handle this physical encoding (see sources/tables.py)"
    )


@pytest.mark.skipif(not SF_DIRS, reason="no /root/testdata sf dirs on this machine")
def test_required_columns_present(spark):
    # Column-level drift guard for every table the 130+ registered
    # queries depend on: regeneration that renames or retypes a column
    # should fail HERE in the first minute of a round, not deep inside
    # an oracle mismatch.
    required = {
        "region": {"r_regionkey", "r_name"},
        "nation": {"n_nationkey", "n_name", "n_regionkey"},
        "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
        "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
        "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
        "orders": {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"},
        "lineitem": {
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        },
        "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
        "documents": {"doc_id", "text", "lang", "source", "n_chars"},
        "embeddings": {"vec_id", "embedding", "label"},
    }
    for table, cols in required.items():
        got = set(load_table(spark, SF_DIRS[0], table).columns)
        missing = cols - got
        assert not missing, f"{table} lost columns {sorted(missing)} (has {sorted(got)})"


@pytest.mark.skipif(not SF_DIRS, reason="no /root/testdata sf dirs on this machine")
def test_events_ts_numeric_cast_and_unix_micros_work(spark):
    # The exact operations Spark 4 forbids on TIMESTAMP_NTZ — the
    # round-2 failure mode. They must be legal after normalization.
    df = load_table(spark, SF_DIRS[0], "events")
    row = df.selectExpr(
        "cast(ts as double) AS d",
        "cast(ts as long) AS l",
        "unix_micros(ts) AS um",
    ).first()
    assert row.um == pytest.approx(row.d * 1_000_000, rel=1e-9)
    assert row.l == row.um // 1_000_000


def _write_events_fixture(spark, tmp_path, ts_column, schema):
    path = str(tmp_path / "events.parquet")
    spark.createDataFrame([(1, ts_column, 7, "kill", 1.5, "{}")], schema).write.mode("overwrite").parquet(path)
    return str(tmp_path)


def test_ntz_synthesized_parquet_normalizes(spark, tmp_path):
    import datetime

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    sf_dir = _write_events_fixture(spark, tmp_path, datetime.datetime(2024, 1, 1, 12, 0, 0), schema)
    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType == TimestampType()
    # UTC session tz: NTZ wall-clock maps to identical epoch micros.
    assert df.selectExpr("unix_micros(ts) AS um").first().um == 1_704_110_400_000_000


def test_bigint_nanos_parquet_normalizes(spark, tmp_path):
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    nanos = 1_704_110_400_000_000_000  # 2024-01-01T12:00:00Z
    sf_dir = _write_events_fixture(spark, tmp_path, nanos, schema)
    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType == TimestampType()
    assert df.selectExpr("unix_micros(ts) AS um").first().um == nanos // 1000
