"""Streaming dimension maintenance (SCD1 MERGE in foreachBatch):
cross-epoch latest-per-key semantics, within-batch tie-breaking, and
idempotent replay of an epoch body."""

from __future__ import annotations

from pubg_data_pipeline_spark.streaming import app


def _run_batch(spark, files_dir, dim_path, checkpoint):
    stream = spark.readStream.schema("k string, ver long, v double").json(str(files_dir))
    q = app.streaming_dim_upsert(
        stream,
        str(dim_path),
        ["k"],
        "ver",
        available_now=True,
        checkpoint=str(checkpoint),
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()


def test_dim_upsert_across_epochs(spark, tmp_path):
    src = tmp_path / "changes"
    src.mkdir()
    dim = tmp_path / "dim"
    ckpt = tmp_path / "ckpt"

    (src / "b1.jsonl").write_text(
        '{"k": "a", "ver": 1, "v": 10.0}\n'
        '{"k": "b", "ver": 1, "v": 20.0}\n'
        '{"k": "b", "ver": 2, "v": 21.0}\n'  # within-batch dup: latest ver wins
    )
    _run_batch(spark, src, dim, ckpt)
    out = {r["k"]: (r["ver"], r["v"]) for r in spark.read.parquet(str(dim)).collect()}
    assert out == {"a": (1, 10.0), "b": (2, 21.0)}

    # second epoch: update one key, insert another; untouched key survives
    (src / "b2.jsonl").write_text(
        '{"k": "b", "ver": 3, "v": 22.0}\n{"k": "c", "ver": 1, "v": 30.0}\n'
    )
    _run_batch(spark, src, dim, ckpt)
    out = {r["k"]: (r["ver"], r["v"]) for r in spark.read.parquet(str(dim)).collect()}
    assert out == {"a": (1, 10.0), "b": (3, 22.0), "c": (1, 30.0)}


def test_dim_upsert_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the same epoch body
    with the same batch must leave the dim byte-identical in rows."""
    dim = tmp_path / "dim"
    batch = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 1, 20.0)], "k string, ver long, v double"
    )
    app.dim_upsert_epoch(batch, 0, str(dim), ["k"], "ver")
    first = sorted(map(tuple, spark.read.parquet(str(dim)).collect()))
    app.dim_upsert_epoch(batch, 0, str(dim), ["k"], "ver")  # replay
    assert sorted(map(tuple, spark.read.parquet(str(dim)).collect())) == first


def test_dim_upsert_empty_batch_is_noop(spark, tmp_path):
    dim = tmp_path / "dim"
    empty = spark.createDataFrame([], "k string, ver long, v double")
    app.dim_upsert_epoch(empty, 0, str(dim), ["k"], "ver")
    assert not dim.exists()  # no fileless unreadable table
    batch = spark.createDataFrame([("a", 1, 1.0)], "k string, ver long, v double")
    app.dim_upsert_epoch(batch, 1, str(dim), ["k"], "ver")
    app.dim_upsert_epoch(empty, 2, str(dim), ["k"], "ver")
    assert spark.read.parquet(str(dim)).count() == 1
