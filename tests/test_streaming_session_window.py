"""Native session_window in a STREAMING aggregation with watermark —
the streaming-capable twin of the batch user_sessions_native query.
Append mode only emits sessions the watermark has closed, so a late
sentinel event pushes the watermark past the real sessions before the
availableNow run drains."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

from pubg_data_pipeline_spark.streaming import sources

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


def test_streaming_session_window_matches_batch(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        (1, "2024-01-01T10:00:00", 1, "view"),
        (2, "2024-01-01T10:10:00", 1, "view"),   # same session (gap < 30m)
        (3, "2024-01-01T11:30:00", 1, "view"),   # new session
        (4, "2024-01-01T10:05:00", 2, "view"),
        # sentinel far in the future: advances the watermark past every
        # real session so append mode emits them before the stream ends
        (99, "2024-01-02T12:00:00", 999, "view"),
    ]
    with open(src / "b0.json", "w") as f:
        for eid, ts, uid, et in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts, "user_id": uid, "event_type": et}) + "\n")

    stream = sources.json_file_stream(spark, str(src), SCHEMA)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_stream").collect()
        if r["user_id"] != 999
    }
    assert got == {
        (1, "2024-01-01 10:00:00", 2),
        (1, "2024-01-01 11:30:00", 1),
        (2, "2024-01-01 10:05:00", 1),
    }

    # the batch form over the same rows agrees (streaming/batch parity
    # of the native session operator)
    batch = spark.createDataFrame(
        [(e, t.replace("T", " "), u, et) for e, t, u, et in rows],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got_batch = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in batch.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
        .collect()
        if r["user_id"] != 999
    }
    assert got_batch == got


def test_streaming_dynamic_gap_session_window(spark, tmp_path):
    """Per-event gap expression under streaming + watermark: a click
    closes after 10 minutes, a view after 30 — the 12-minute pause
    below splits the click-led session but not the view-led one."""
    src = tmp_path / "events_dyn"
    src.mkdir()
    rows = [
        # user 1: click at 10:00 (10m gap), next event at 10:12 -> SPLIT
        (1, "2024-01-01T10:00:00", 1, "click"),
        (2, "2024-01-01T10:12:00", 1, "click"),
        # user 2: view at 10:00 (30m gap), next at 10:12 -> same session
        (3, "2024-01-01T10:00:00", 2, "view"),
        (4, "2024-01-01T10:12:00", 2, "view"),
        (99, "2024-01-02T12:00:00", 999, "view"),  # watermark sentinel
    ]
    with open(src / "b0.json", "w") as f:
        for eid, ts, uid, et in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts, "user_id": uid, "event_type": et}) + "\n")

    stream = sources.json_file_stream(spark, str(src), SCHEMA)
    gap = F.when(F.col("event_type") == "click", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "n_events")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions_dyn")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_dyn").collect()
        if r["user_id"] != 999
    )
    assert got == [(1, 1), (1, 1), (2, 2)]  # clicks split, views merged


def test_session_window_exact_boundary_merges(spark, duck):
    """Spark 4.1 semantics probe pinned as a test: an event arriving
    at EXACTLY the previous session's end (prev_ts + gap) MERGES into
    it — the oracle break condition must therefore be strictly >, not
    >=. Synthetic testdata has microsecond-random timestamps that
    never hit the boundary, so this hand-built case is the only guard
    against the inclusive/exclusive drift."""
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:30:00"),  # exactly prev + 30m -> merges
            (1, "2024-01-01 11:00:01"),  # 1s past the new end -> splits
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    got = sorted(
        r["n_events"]
        for r in df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    assert got == [1, 2]  # first two merge, third splits
    # and the corrected oracle rule (> gap splits) agrees
    rows = duck.sql("""
        WITH e AS (
          SELECT * FROM (VALUES
            (TIMESTAMP '2024-01-01 10:00:00'),
            (TIMESTAMP '2024-01-01 10:30:00'),
            (TIMESTAMP '2024-01-01 11:00:01')) v(ts)
        ), o AS (
          SELECT ts, CASE WHEN LAG(ts) OVER (ORDER BY ts) IS NULL
                 OR epoch(ts) - epoch(LAG(ts) OVER (ORDER BY ts)) > 1800.0
                 THEN 1 ELSE 0 END AS is_new FROM e
        )
        SELECT SUM(is_new) AS n_sessions FROM o
    """).fetchall()
    assert rows[0][0] == 2


def test_dynamic_gap_exact_boundary_merges_and_oracle_agrees(spark, duck):
    """The dynamic-gap twin of the boundary probe above: an event at
    EXACTLY prev_ts + its predecessor's per-event gap merges (probed
    on Spark 4.1), so _SESSIONS_DYNAMIC_SQL's break must be strictly
    `t > prev_end` — `>=` split here until round 4. The oracle is run
    on the same hand-built rows to pin both engines at the boundary."""
    from pubg_data_pipeline_spark.plans.windowed_queries import (
        _SESSIONS_DYNAMIC_SQL,
    )

    rows = [
        (1, "2024-01-01 10:00:00", "click"),    # gap 10m
        (1, "2024-01-01 10:10:00", "view"),     # exactly prev_end -> merges
        (1, "2024-01-01 10:40:01", "view"),     # 1s past new end -> splits
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string, event_type string").select(
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
        F.monotonically_increasing_id().alias("event_id"),
    )
    gap = F.when(F.col("event_type") == "click", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    got = sorted(
        r["n"]
        for r in df.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == [1, 2]  # boundary event merged, the later one split

    import duckdb

    con = duckdb.connect()  # fresh: the shared fixture's events view is the corpus
    con.execute("CREATE TABLE events AS SELECT * FROM (VALUES "
                "(1, TIMESTAMP '2024-01-01 10:00:00', 'click', 0), "
                "(1, TIMESTAMP '2024-01-01 10:10:00', 'view', 1), "
                "(1, TIMESTAMP '2024-01-01 10:40:01', 'view', 2)"
                ") t(user_id, ts, event_type, event_id)")
    oracle = sorted(r[3] for r in con.execute(_SESSIONS_DYNAMIC_SQL).fetchall())
    con.close()
    assert oracle == [1, 2]
