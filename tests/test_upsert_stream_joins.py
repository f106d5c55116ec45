"""Upsert (MERGE) semantics and streaming joins — stream-static and
watermarked stream-stream, the two join modes a streaming deployment
of the engine needs (the reference avoids joins entirely via producer
denormalization; SURVEY.md §2.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import relational


def test_upsert_replaces_and_inserts(spark):
    base = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 1, 20.0), ("c", 1, 30.0)], "k string, ver int, v double"
    )
    updates = spark.createDataFrame(
        [("b", 2, 21.0), ("b", 3, 22.0), ("d", 1, 40.0)], "k string, ver int, v double"
    )
    out = {
        r["k"]: (r["ver"], r["v"])
        for r in relational.upsert(base, updates, ["k"], order_key="ver").collect()
    }
    assert out == {
        "a": (1, 10.0),  # untouched
        "b": (3, 22.0),  # replaced by the LATEST update (ver 3)
        "c": (1, 30.0),
        "d": (1, 40.0),  # inserted
    }


def test_stream_static_join(spark, tmp_path):
    d = tmp_path / "ss"
    d.mkdir()
    (d / "b.jsonl").write_text('{"k": "x", "v": 1}\n{"k": "y", "v": 2}\n{"k": "zz", "v": 3}')
    dim = spark.createDataFrame([("x", "X-name"), ("y", "Y-name")], "k string, label string")
    stream = spark.readStream.schema("k string, v long").json(str(d))
    joined = stream.join(F.broadcast(dim), "k", "inner")
    q = joined.writeStream.format("memory").queryName("ss_join").outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {(r["k"], r["label"]) for r in spark.sql("SELECT * FROM ss_join").collect()}
    assert rows == {("x", "X-name"), ("y", "Y-name")}  # 'zz' dropped (inner)


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Watermarked stream-stream inner join: click and purchase events
    correlate on user within a 30-minute event-time band."""
    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir()
    buys_dir.mkdir()
    (clicks_dir / "c.jsonl").write_text(
        '{"user": "u1", "cts": "2024-01-01 10:00:00", "page": "p1"}\n'
        '{"user": "u2", "cts": "2024-01-01 11:00:00", "page": "p2"}'
    )
    (buys_dir / "b.jsonl").write_text(
        '{"user": "u1", "bts": "2024-01-01 10:10:00", "amount": 5.0}\n'
        '{"user": "u2", "bts": "2024-01-01 13:00:00", "amount": 9.0}'
    )
    clicks = (
        spark.readStream.schema("user string, cts string, page string")
        .json(str(clicks_dir))
        .withColumn("cts", F.to_timestamp("cts"))
        .withWatermark("cts", "1 hour")
    )
    buys = (
        spark.readStream.schema("user string, bts string, amount double")
        .json(str(buys_dir))
        .withColumn("bts", F.to_timestamp("bts"))
        .withWatermark("bts", "1 hour")
    )
    joined = clicks.join(
        buys,
        (clicks.user == buys.user)
        & (buys.bts >= clicks.cts)
        & (buys.bts <= clicks.cts + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select(clicks.user.alias("user"), "page", "amount")
    q = joined.writeStream.format("memory").queryName("ss2_join").outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {(r["user"], r["page"], r["amount"]) for r in spark.sql("SELECT * FROM ss2_join").collect()}
    # u1's purchase is 10 min after the click -> joins; u2's is 2 h later -> outside the band
    assert rows == {("u1", "p1", 5.0)}
