"""Streaming change-data-feed over snapshot tables
(sources/snapshot_cdf.py): version-offset resume across restarts,
executor-side file reads, append-only fail-loud."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.sources import snapshot_cdf, snapshots


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("doubled")
    )


def _drain(spark, table, ckpt, sink, extra_opts=None):
    """One availableNow run into a parquet sink (memory sinks cannot
    recover from checkpoints); returns the NEW rows this run appended."""
    import os

    before = set()
    if os.path.isdir(sink):
        before = {
            (r["id"], r["doubled"]) for r in spark.read.parquet(sink).collect()
        }
    reader = spark.readStream.format("snapshot_cdf").option("path", table)
    for k, v in (extra_opts or {}).items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    after = {(r["id"], r["doubled"]) for r in spark.read.parquet(sink).collect()}
    return after - before


def test_cdf_emits_each_commit_and_resumes_from_checkpoint(spark, tmp_path):
    snapshot_cdf.register(spark)
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    snapshots.snapshot_commit(_df(spark, 0, 5), table)
    snapshots.snapshot_commit(_df(spark, 5, 8), table)

    sink = str(tmp_path / "sink")
    got = _drain(spark, table, ckpt, sink)
    assert got == {(i, 2 * i) for i in range(8)}

    # two more commits while the stream is DOWN; the restart resumes
    # from the checkpointed version and emits exactly the delta
    snapshots.snapshot_commit(_df(spark, 8, 10), table)
    snapshots.snapshot_commit(_df(spark, 10, 11), table)
    got2 = _drain(spark, table, ckpt, sink)
    assert got2 == {(i, 2 * i) for i in range(8, 11)}

    # idle restart: nothing new, nothing re-emitted
    assert _drain(spark, table, ckpt, sink) == set()

    # schema came from the head manifest, not a user hint
    stream_df = (
        spark.readStream.format("snapshot_cdf").option("path", table).load()
    )
    assert stream_df.columns == ["id", "doubled"]


def test_cdf_starting_version_latest_skips_history(spark, tmp_path):
    snapshot_cdf.register(spark)
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    snapshots.snapshot_commit(_df(spark, 0, 100), table)  # history to skip
    # register stream AFTER the bulk load, starting at the head
    opts = {"starting_version": "latest"}
    first = _drain(spark, table, ckpt, sink, extra_opts=opts)
    assert first == set()
    snapshots.snapshot_commit(_df(spark, 100, 102), table)
    assert _drain(spark, table, ckpt, sink, extra_opts=opts) == {
        (100, 200),
        (101, 202),
    }


def test_cdf_fails_loud_on_overwrite_in_range(spark, tmp_path):
    snapshot_cdf.register(spark)
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    snapshots.snapshot_commit(_df(spark, 0, 3), table)
    _drain(spark, table, ckpt, sink)
    snapshots.snapshot_commit(_df(spark, 50, 52), table, mode="overwrite")
    q = (
        spark.readStream.format("snapshot_cdf")
        .option("path", table)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="not append-only"):
        q.awaitTermination(120)
        raise AssertionError("stream should have failed")
    q.stop()


def test_cdf_guards(spark, tmp_path):
    snapshot_cdf.register(spark)
    with pytest.raises(Exception, match="no snapshot commits"):
        (
            spark.readStream.format("snapshot_cdf")
            .option("path", str(tmp_path / "missing"))
            .load()
        )


def test_maintain_derived_table_exactly_once(spark, tmp_path):
    """Table-to-table maintenance: CDF tail -> per-row transform ->
    txn-deduped snapshot commits. Across restarts the target holds
    exactly transform(source head), all append lineage, and a manual
    epoch replay is a no-op."""
    from pubg_data_pipeline_spark.streaming import app

    src_tbl = str(tmp_path / "src")
    dst_tbl = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    snapshots.snapshot_commit(_df(spark, 0, 6), src_tbl)

    def run():
        q = app.maintain_derived_table(
            spark,
            src_tbl,
            dst_tbl,
            app_id="derive_even",
            transform=lambda df: df.filter(F.col("id") % 2 == 0).withColumn(
                "quad", F.col("doubled") * 2
            ),
            available_now=True,
            checkpoint=ckpt,
        )
        q.awaitTermination(120)
        q.stop()

    run()
    got = {
        (r.id, r.quad) for r in snapshots.snapshot_read(spark, dst_tbl).collect()
    }
    assert got == {(0, 0), (2, 8), (4, 16)}
    # source grows while the maintainer is down; restart catches up
    snapshots.snapshot_commit(_df(spark, 6, 10), src_tbl)
    run()
    got2 = {
        (r.id, r.quad) for r in snapshots.snapshot_read(spark, dst_tbl).collect()
    }
    assert got2 == {(i, 4 * i) for i in range(0, 10, 2)}
    # idle restart commits nothing (no empty versions minted)
    run()
    hist = snapshots.snapshot_history(dst_tbl)
    assert [h["op"] for h in hist] == ["append", "append"]
    # manual replay of an already-committed epoch: txn dedup holds
    replay = _df(spark, 0, 6).filter(F.col("id") % 2 == 0).withColumn(
        "quad", F.col("doubled") * 2
    )
    app.snapshot_sink_epoch(replay, 0, dst_tbl, "derive_even")
    assert snapshots.snapshot_read(spark, dst_tbl).count() == 5
