"""Event-time + observability streaming tests: watermark drops late
data past the threshold, and the progress listener captures the
per-batch metrics the reference scraped out-of-band (SURVEY.md §2.10
X2-X3)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.streaming.metrics import ProgressMetricsListener


def test_progress_listener_captures_batches(spark, tmp_path):
    listener = ProgressMetricsListener()
    spark.streams.addListener(listener)
    d = tmp_path / "lines"
    d.mkdir()
    (d / "a.txt").write_text("one\ntwo\nthree")
    try:
        stream = spark.readStream.text(str(d))
        q = (
            stream.groupBy("value")
            .count()
            .writeStream.format("memory")
            .queryName("metrics_probe")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # listener delivery is async — allow a short drain
        for _ in range(40):
            if any(m.num_input_rows == 3 for m in listener.metrics):
                break
            time.sleep(0.25)
        rows_seen = [m for m in listener.metrics if m.query_name == "metrics_probe"]
        assert any(m.num_input_rows == 3 for m in rows_seen)
        m = next(m for m in rows_seen if m.num_input_rows == 3)
        assert m.batch_duration_ms >= 0
        assert m.sources and m.sources[0]["num_input_rows"] == 3
    finally:
        spark.streams.removeListener(listener)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Windowed count with a 10-minute watermark in append mode: a row
    arriving after the watermark has passed its window is dropped —
    the late-data policy the reference lacks entirely."""
    d = tmp_path / "late"
    d.mkdir()
    # batch 1: establish event time up to 12:00
    (d / "b1.jsonl").write_text(
        '{"ts": "2024-01-01 10:00:00", "k": "a"}\n'
        '{"ts": "2024-01-01 12:00:00", "k": "a"}'
    )
    stream = (
        spark.readStream.schema("ts string, k string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    windowed = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "k")
        .count()
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("late_probe")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a row for the 10:00 window, far behind the watermark
        (d / "b2.jsonl").write_text('{"ts": "2024-01-01 10:05:00", "k": "a"}')
        q.processAllAvailable()
        # batch 3: advance event time so closed windows emit
        (d / "b3.jsonl").write_text('{"ts": "2024-01-01 15:00:00", "k": "a"}')
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        (r["window"]["start"].hour, r["count"])
        for r in spark.sql("SELECT * FROM late_probe").collect()
    }
    # the 10:00 window emitted with count 1 — the late 10:05 row was
    # dropped, not merged (and never duplicated the emitted window)
    assert (10, 1) in out
    assert (10, 2) not in out
