"""State-store reader (streaming/state_inspect.py): run a real
watermarked-dedup streaming query to a checkpoint, then read the
checkpoint back through the statestore / state-metadata batch sources
and confirm the held keys are exactly the deduped keys."""

from __future__ import annotations

import json as _json

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.streaming import etl, state_inspect


def _run_dedup_stream(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"id": "a", "ts": "2024-03-01 10:00:00"},
        {"id": "a", "ts": "2024-03-01 10:00:30"},
        {"id": "b", "ts": "2024-03-01 10:01:00"},
        {"id": "c", "ts": "2024-03-01 10:02:00"},
    ]
    (src / "batch0.json").write_text("\n".join(_json.dumps(r) for r in rows))
    raw = (
        spark.readStream.schema("id string, ts string")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    deduped = etl.dedup_within_watermark(raw, ["id"], "ts", watermark="10 minutes")
    ckpt = str(tmp_path / "ckpt")
    q = (
        deduped.writeStream.format("memory")
        .queryName("state_inspect_dedup")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return ckpt


def test_state_metadata_lists_dedup_operator(spark, tmp_path):
    ckpt = _run_dedup_stream(spark, tmp_path)
    meta = state_inspect.state_metadata(spark, ckpt).collect()
    assert len(meta) == 1
    assert meta[0]["operatorId"] == 0
    assert "dedupe" in meta[0]["operatorName"].lower()


def test_read_state_returns_held_dedup_keys(spark, tmp_path):
    ckpt = _run_dedup_stream(spark, tmp_path)
    state = state_inspect.read_state(spark, ckpt, operator_id=0)
    keys = sorted(r["key"]["id"] for r in state.collect())
    assert keys == ["a", "b", "c"]  # one state row per distinct key


def test_state_key_histogram_accounts_for_every_row(spark, tmp_path):
    ckpt = _run_dedup_stream(spark, tmp_path)
    hist = state_inspect.state_key_histogram(spark, ckpt).collect()
    assert sum(r["n_state_rows"] for r in hist) == 3
    assert all(r["n_state_rows"] >= 1 for r in hist)
