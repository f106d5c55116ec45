"""Incremental materialized-rollup stream: foreachBatch merges each
micro-batch's partial state into a stored parquet state table; the
finalized store must equal a from-scratch batch recompute, across
multiple micro-batches (availableNow backfill mode)."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from pubg_data_pipeline_spark.operators import incremental
from pubg_data_pipeline_spark.streaming import app, sources

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _write_batch(path, rows):
    with open(path, "w") as f:
        for eid, ts, val in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts, "value": val}) + "\n")


def test_rollup_stream_matches_batch_recompute(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    # Two files -> two micro-batches (maxFilesPerTrigger=1); hour
    # 10:00 spans both batches, so the merge path is actually exercised.
    _write_batch(
        src / "b0.json",
        [
            (1, "2024-01-01T10:05:00", 10.25),
            (2, "2024-01-01T10:55:00", 1.75),
            (3, "2024-01-01T11:10:00", 3.00),
        ],
    )
    _write_batch(
        src / "b1.json",
        [
            (4, "2024-01-01T10:20:00", 2.50),
            (5, "2024-01-01T12:01:00", 7.125),
        ],
    )
    state = str(tmp_path / "state")
    stream = sources.json_file_stream(spark, str(src), SCHEMA, max_files_per_trigger=1)
    q = app.incremental_rollup_stream(stream, state, available_now=True)
    q.awaitTermination(120)

    got = sorted(
        tuple(r)
        for r in incremental.finalize_hourly(spark.read.parquet(state)).collect()
    )
    want = sorted(
        tuple(r)
        for r in incremental.finalize_hourly(
            incremental.partial_hourly_state(spark.read.schema(SCHEMA).json(str(src)))
        ).collect()
    )
    assert got == want
    assert len(got) == 3  # hours 10, 11, 12
    hour10 = [r for r in got if r[0] == "2024-01-01 10"][0]
    assert hour10[1] == 3 and hour10[2] == 14.5  # merged across batches


def test_rollup_epoch_replay_does_not_double_count(spark, tmp_path):
    """foreachBatch is at-least-once: replaying an absorbed epoch (crash
    after the state swap, before the checkpoint commit) must be a no-op
    — the _last_epoch marker inside the swapped directory pins it."""
    from pyspark.sql import functions as F

    state = str(tmp_path / "rollup_state")
    batch = spark.createDataFrame(
        [("2024-01-01 10:05:00", 10.0), ("2024-01-01 10:35:00", 4.0)],
        "ts_s string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "value")

    app.rollup_merge_epoch(batch, 0, state)
    once = {
        r["hour_key"]: (r["n"], r["scaled_sum"])
        for r in spark.read.parquet(state).collect()
    }
    app.rollup_merge_epoch(batch, 0, state)  # replay of the same epoch
    replayed = {
        r["hour_key"]: (r["n"], r["scaled_sum"])
        for r in spark.read.parquet(state).collect()
    }
    assert replayed == once  # no double-count

    # a NEW epoch still merges
    app.rollup_merge_epoch(batch, 1, state)
    merged = {
        r["hour_key"]: (r["n"], r["scaled_sum"])
        for r in spark.read.parquet(state).collect()
    }
    assert all(merged[b][0] == 2 * once[b][0] for b in once)

    # empty batches are skipped without rewriting state
    app.rollup_merge_epoch(batch.limit(0), 2, state)
    assert {
        r["hour_key"]: (r["n"], r["scaled_sum"])
        for r in spark.read.parquet(state).collect()
    } == merged
