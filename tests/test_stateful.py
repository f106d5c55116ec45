"""applyInPandasWithState operators: state must carry ACROSS
micro-batches (the property the reference's process-local dicts lose
on restart and the batch-windowed approximations can't express)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.streaming import stateful


def _run_batches(spark, tmp_path, batches, build_query):
    """Write JSONL batch files one at a time, processing between
    writes so each file lands in its own micro-batch."""
    d = tmp_path / "in"
    d.mkdir()
    (d / "b0.jsonl").write_text(batches[0])
    stream = (
        spark.readStream.schema("key string, value double, ts_ms long")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = build_query(stream)
    try:
        q.processAllAvailable()
        for i, content in enumerate(batches[1:], start=1):
            (d / f"b{i}.jsonl").write_text(content)
            q.processAllAvailable()
    finally:
        q.stop()


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    batches = [
        '{"key": "a", "value": 1.0, "ts_ms": 0}\n{"key": "a", "value": 2.0, "ts_ms": 1}',
        '{"key": "a", "value": 4.0, "ts_ms": 2}\n{"key": "b", "value": 10.0, "ts_ms": 3}',
    ]

    def build(stream):
        out = stateful.running_totals(stream, "key", "value")
        return (
            out.writeStream.format("memory")
            .queryName("totals_probe")
            .outputMode("update")
            .start()
        )

    _run_batches(spark, tmp_path, batches, build)
    rows = spark.sql("SELECT * FROM totals_probe").collect()
    latest = {}
    for r in rows:
        cur = latest.get(r["key"])
        if cur is None or r["batches_seen"] > cur["batches_seen"]:
            latest[r["key"]] = r
    # 'a' accumulated across both batches: 3 events, 7.0 total, 2 batches
    assert latest["a"]["events_total"] == 3
    assert latest["a"]["value_total"] == pytest.approx(7.0)
    assert latest["a"]["batches_seen"] == 2
    assert latest["b"]["events_total"] == 1


def test_temporal_suppression_across_batches(spark, tmp_path):
    minute = 60 * 1000
    batches = [
        # t=0 emits; t=5min suppressed (within 15min)
        f'{{"key": "a", "value": 0, "ts_ms": 0}}\n{{"key": "a", "value": 0, "ts_ms": {5 * minute}}}',
        # next batch: t=10min still suppressed — state remembered the
        # t=0 emission; t=20min emits with 2 suppressed counted
        f'{{"key": "a", "value": 0, "ts_ms": {10 * minute}}}\n{{"key": "a", "value": 0, "ts_ms": {20 * minute}}}',
    ]

    def build(stream):
        out = stateful.temporal_suppression(stream, "key", "ts_ms")
        return (
            out.writeStream.format("memory")
            .queryName("suppress_probe")
            .outputMode("update")
            .start()
        )

    _run_batches(spark, tmp_path, batches, build)
    rows = sorted(
        spark.sql("SELECT * FROM suppress_probe").collect(), key=lambda r: r["emitted_ms"]
    )
    assert [(r["emitted_ms"], r["suppressed_since_last"]) for r in rows] == [
        (0, 0),
        (20 * minute, 2),
    ]


def test_running_totals_tws_plan_wires_transform_with_state(spark):
    """Plan-level assertion that runs in THIS container (no protobuf
    needed to BUILD the plan): the operator must wire a
    TransformWithStateInPySpark node in Update mode with the typed
    output schema — the execution-level twin below is the permanent
    environmental skip (google.protobuf is only needed by the Python
    worker at run time)."""
    stream = (
        spark.readStream.format("rate")
        .load()
        .selectExpr("CAST(value % 3 AS STRING) AS key", "CAST(value AS DOUBLE) AS value")
    )
    out = stateful.running_totals_tws(stream, "key", "value")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "TransformWithState" in plan, plan
    assert "Update" in plan and "NoTime" in plan
    assert [f.name for f in out.schema.fields] == [
        "key", "events_total", "value_total", "batches_seen",
    ]


def test_running_totals_tws_accumulate_across_batches(spark, tmp_path):
    """Same cross-batch semantics on the transformWithStateInPandas
    API (typed ValueState handle instead of one opaque state tuple).

    PERMANENT ENVIRONMENTAL SKIP in this container: Spark's
    transformWithState Python worker imports google.protobuf at run
    time, the container has no protobuf and no pip — so execution can
    only be exercised on clusters shipping the standard Spark 4
    runtime (where protobuf is vendored). The plan-level contract is
    asserted unconditionally above."""
    pytest.importorskip(
        "google.protobuf",
        reason="environmental-by-design: no protobuf/pip in container; "
        "plan-level twin asserts the wiring unconditionally",
    )
    batches = [
        '{"key": "a", "value": 1.0, "ts_ms": 0}\n{"key": "a", "value": 2.0, "ts_ms": 1}',
        '{"key": "a", "value": 4.0, "ts_ms": 2}\n{"key": "b", "value": 10.0, "ts_ms": 3}',
    ]

    def build(stream):
        out = stateful.running_totals_tws(stream, "key", "value")
        return (
            out.writeStream.format("memory")
            .queryName("totals_tws_probe")
            .outputMode("update")
            .start()
        )

    _run_batches(spark, tmp_path, batches, build)
    rows = spark.sql("SELECT * FROM totals_tws_probe").collect()
    latest = {}
    for r in rows:
        cur = latest.get(r["key"])
        if cur is None or r["batches_seen"] > cur["batches_seen"]:
            latest[r["key"]] = r
    assert latest["a"]["events_total"] == 3
    assert latest["a"]["value_total"] == pytest.approx(7.0)
    assert latest["a"]["batches_seen"] == 2
    assert latest["b"]["events_total"] == 1


def test_running_totals_long_key_and_null_values(spark, tmp_path):
    """Round-4 fixes: a non-string key column keeps its name and type
    in the output (the schema was hardcoded StringType 'key'), and
    null values are excluded from BOTH events_total and value_total."""
    import pandas as pd

    src = tmp_path / "src"
    pd.DataFrame({"uid": [7, 7, 7], "value": [1.0, None, 3.0]}).to_parquet(
        src / "p.parquet" if src.mkdir() is None else src / "p.parquet"
    )
    stream = spark.readStream.schema("uid long, value double").parquet(str(src))
    out = stateful.running_totals(stream, "uid", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("rt_longkey")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from rt_longkey").collect()
    assert rows and rows[-1]["uid"] == 7  # caller's name + long type
    assert rows[-1]["events_total"] == 2  # null-value row in neither total
    assert abs(rows[-1]["value_total"] - 4.0) < 1e-9
