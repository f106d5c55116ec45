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


def test_stream_dim_equals_batch_scd2_current_slice(spark, tmp_path):
    """Cross-layer invariant: maintaining a latest-per-key dim from a
    change stream (streaming SCD1) must agree with batch-compacting
    the SAME changelog into SCD2 history and slicing is_current."""
    from pubg_data_pipeline_spark.operators import cdc

    src = tmp_path / "changes"
    src.mkdir()
    dim = tmp_path / "dim"
    ckpt = tmp_path / "ckpt"
    (src / "b1.jsonl").write_text(
        '{"k": "a", "ver": 1, "v": "x", "ts": "2024-01-01 00:00:00"}\n'
        '{"k": "b", "ver": 2, "v": "y", "ts": "2024-01-01 01:00:00"}\n'
    )
    stream_schema = "k string, ver long, v string, ts timestamp"
    stream = spark.readStream.schema(stream_schema).json(str(src))
    q = app.streaming_dim_upsert(
        stream, str(dim), ["k"], "ver", available_now=True, checkpoint=str(ckpt)
    )
    q.awaitTermination(120)
    q.stop()
    (src / "b2.jsonl").write_text(
        '{"k": "a", "ver": 3, "v": "x2", "ts": "2024-01-02 00:00:00"}\n'
        '{"k": "c", "ver": 4, "v": "z", "ts": "2024-01-02 01:00:00"}\n'
    )
    stream = spark.readStream.schema(stream_schema).json(str(src))
    q = app.streaming_dim_upsert(
        stream, str(dim), ["k"], "ver", available_now=True, checkpoint=str(ckpt)
    )
    q.awaitTermination(120)
    q.stop()

    stream_latest = {
        r["k"]: r["v"] for r in spark.read.parquet(str(dim)).collect()
    }
    changelog = spark.read.schema(stream_schema).json(str(src))
    hist = cdc.scd2_from_changelog(changelog, ["k"], "ts", ["v"], order_cols=["ver"])
    batch_current = {
        r["k"]: r["v"] for r in hist.filter("is_current").collect()
    }
    assert stream_latest == batch_current == {"a": "x2", "b": "y", "c": "z"}


def test_dim_upsert_late_change_cannot_regress(spark, tmp_path):
    """Cross-batch monotonicity: an out-of-order change with a LOWER
    order_key than the stored row must not replace it (at-least-once
    upstreams deliver these routinely)."""
    dim = tmp_path / "dim"
    app.dim_upsert_epoch(
        spark.createDataFrame([("a", 5, "new")], "k string, ver long, v string"),
        0, str(dim), ["k"], "ver",
    )
    app.dim_upsert_epoch(
        spark.createDataFrame([("a", 4, "stale")], "k string, ver long, v string"),
        1, str(dim), ["k"], "ver",
    )
    out = spark.read.parquet(str(dim)).collect()
    assert [(r["k"], r["ver"], r["v"]) for r in out] == [("a", 5, "new")]
    # equal order_key: the incoming update wins the tie
    app.dim_upsert_epoch(
        spark.createDataFrame([("a", 5, "retagged")], "k string, ver long, v string"),
        2, str(dim), ["k"], "ver",
    )
    assert spark.read.parquet(str(dim)).collect()[0]["v"] == "retagged"


def test_dim_upsert_recovers_from_crash_between_renames(spark, tmp_path):
    """Simulate a crash after `dim -> dim.old` but before
    `tmp -> dim`: the next epoch must restore the previous state, not
    rebuild from the micro-batch alone."""
    import os

    dim = tmp_path / "dim"
    app.dim_upsert_epoch(
        spark.createDataFrame([("a", 1, "x"), ("b", 1, "y")], "k string, ver long, v string"),
        0, str(dim), ["k"], "ver",
    )
    os.rename(str(dim), str(dim) + ".old")  # the crash window
    app.dim_upsert_epoch(
        spark.createDataFrame([("c", 1, "z")], "k string, ver long, v string"),
        1, str(dim), ["k"], "ver",
    )
    out = {r["k"]: r["v"] for r in spark.read.parquet(str(dim)).collect()}
    assert out == {"a": "x", "b": "y", "c": "z"}  # nothing lost
    assert not os.path.isdir(str(dim) + ".old")   # aside cleaned up


def test_epoch_sinks_reject_remote_uris(spark):
    import pytest

    batch = spark.createDataFrame([("a", 1, 1.0)], "k string, ver long, v double")
    with pytest.raises(ValueError, match="local-filesystem"):
        app.dim_upsert_epoch(batch, 0, "s3a://bucket/dim", ["k"], "ver")
    with pytest.raises(ValueError, match="local-filesystem"):
        app.rollup_merge_epoch(
            spark.createDataFrame([], "ts timestamp, value double"),
            0, "hdfs://nn/state",
        )
    with pytest.raises(ValueError, match="local-filesystem"):
        app.ingest_dedup_epoch(
            spark.createDataFrame([], "doc_id long, text string"),
            0, "s3a://b/idx", "s3a://b/corpus",
        )
