"""Dead-letter-queue ingestion: the parse split routes poison pills to
quarantine with the raw payload preserved, good rows stay typed, and
epoch replays are idempotent."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.streaming import app, etl, sources
from tests.test_streaming import make_envelope


def test_parse_split_batch(spark):
    rows = [
        (json.dumps(make_envelope(1, ["m1"], "2024-03-01 10:00:00")),),
        ("{not json at all",),
        ("",),
        (json.dumps(make_envelope(2, ["m2"], "2024-03-01 11:00:00")),),
    ]
    raw = spark.createDataFrame(rows, "value string")
    good, dead = etl.parse_envelope_with_dlq(raw)
    assert good.count() == 2
    assert {r["reason"] for r in dead.collect()} == {"unparseable or empty envelope"}
    payloads = {r["raw_payload"] for r in dead.collect()}
    assert "{not json at all" in payloads
    # the typed side star-expands the envelope schema
    assert "player" in good.columns and "matches" in good.columns


def test_dlq_epoch_replay_idempotent(spark, tmp_path):
    good_p, dlq_p = str(tmp_path / "good"), str(tmp_path / "dlq")
    rows = [
        (json.dumps(make_envelope(1, ["m1"], "2024-03-01 10:00:00")),),
        ("broken{",),
    ]
    batch = spark.createDataFrame(rows, "value string")
    app.dlq_etl_epoch(batch, 0, good_p, dlq_p)
    app.dlq_etl_epoch(batch, 0, good_p, dlq_p)  # at-least-once replay
    assert spark.read.parquet(good_p).count() == 1
    dead = spark.read.parquet(dlq_p).collect()
    assert len(dead) == 1 and dead[0]["raw_payload"] == "broken{"


def test_streaming_etl_with_dlq_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.jsonl").write_text(
        json.dumps(make_envelope(1, ["m1", "m2"], "2024-03-01 10:00:00"))
        + "\n<<<garbage>>>\n"
        + json.dumps(make_envelope(2, ["m3"], "2024-03-01 10:30:00"))
    )
    q = app.streaming_etl_with_dlq(
        sources.text_stream(spark, str(src)),
        good_path=str(tmp_path / "good"),
        dlq_path=str(tmp_path / "dlq"),
        available_now=True,
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    good = spark.read.parquet(str(tmp_path / "good"))
    dead = spark.read.parquet(str(tmp_path / "dlq"))
    assert good.count() == 2
    assert good.filter(F.col("player").isNotNull()).count() == 2
    assert [r["raw_payload"] for r in dead.collect()] == ["<<<garbage>>>"]
