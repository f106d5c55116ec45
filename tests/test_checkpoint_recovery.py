"""Checkpointed restart: a stopped streaming query resumed with the
same checkpoint must process each input exactly once (the reference
relies on this for its parquet sink — SURVEY.md §2.7 D8; here we prove
it survives a stop/restart cycle, which the reference never tests)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_parquet_sink_exactly_once_across_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start_query():
        stream = spark.readStream.schema("k string, v long").json(str(src))
        return (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 seconds")
            .start()
        )

    (src / "b1.jsonl").write_text('{"k": "a", "v": 1}\n{"k": "b", "v": 2}')
    q = start_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # restart from the same checkpoint; add one new file
    (src / "b2.jsonl").write_text('{"k": "c", "v": 3}')
    q2 = start_query()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    rows = sorted(
        (r["k"], r["v"]) for r in spark.read.parquet(out).collect()
    )
    # b1 rows appear exactly once despite the restart; b2 picked up
    assert rows == [("a", 1), ("b", 2), ("c", 3)]
