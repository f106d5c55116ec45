"""Python DataSource writer (sources/jsonl_sink.py): batch and
streaming JSONL delivery with tmp-then-rename commit."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.sources.jsonl_sink import JsonlSink


def _register(spark):
    # idempotent across tests sharing the session
    try:
        spark.dataSource.register(JsonlSink)
    except Exception:
        pass


def test_batch_write_publishes_committed_files_only(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "alerts")
    df = spark.createDataFrame(
        [(1, "high", 9.5), (2, "low", 1.0), (3, "high", 7.25)],
        "alert_id long, severity string, score double",
    ).repartition(2)
    df.write.format("jsonl_rows").mode("append").option("path", out).save()

    files = sorted(glob.glob(os.path.join(out, "part-*.jsonl")))
    assert len(files) == 2
    assert not glob.glob(os.path.join(out, ".tmp-*"))  # no uncommitted leftovers
    rows = []
    for p in files:
        with open(p) as f:
            rows += [json.loads(line) for line in f if line.strip()]
    assert sorted(r["alert_id"] for r in rows) == [1, 2, 3]
    assert all(set(r) == {"alert_id", "severity", "score"} for r in rows)


def test_stream_write_is_epoch_prefixed_and_committed(spark, tmp_path):
    _register(spark)
    src = tmp_path / "src"
    src.mkdir()
    (src / "b0.json").write_text(
        "\n".join(json.dumps({"id": i, "v": i * 1.5}) for i in range(4))
    )
    out = str(tmp_path / "stream_out")
    raw = spark.readStream.schema("id long, v double").json(str(src))
    q = (
        raw.writeStream.format("jsonl_rows")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    files = glob.glob(os.path.join(out, "batch-*-part-*.jsonl"))
    assert files, "stream writer published no committed files"
    assert not glob.glob(os.path.join(out, ".tmp-*"))
    rows = []
    for p in files:
        with open(p) as f:
            rows += [json.loads(line) for line in f if line.strip()]
    assert sorted(r["id"] for r in rows) == [0, 1, 2, 3]


def test_timestamps_serialize_stringly(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "ts_out")
    df = spark.sql("SELECT TIMESTAMP'2024-01-01 10:00:00' AS ts, 1 AS k").coalesce(1)
    df.write.format("jsonl_rows").mode("append").option("path", out).save()
    (path,) = glob.glob(os.path.join(out, "part-*.jsonl"))
    with open(path) as f:
        row = json.loads(f.readline())
    assert row["k"] == 1 and row["ts"].startswith("2024-01-01 10:00:00")


def test_append_mode_accumulates_across_jobs(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "acc")
    df1 = spark.createDataFrame([(1,)], "id long").coalesce(1)
    df2 = spark.createDataFrame([(2,)], "id long").coalesce(1)
    df1.write.format("jsonl_rows").mode("append").option("path", out).save()
    df2.write.format("jsonl_rows").mode("append").option("path", out).save()
    ids = []
    for p in glob.glob(os.path.join(out, "part-*.jsonl")):
        with open(p) as f:
            ids += [json.loads(line)["id"] for line in f if line.strip()]
    assert sorted(ids) == [1, 2]


def test_overwrite_mode_truncates_previous_jobs(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "trunc")
    spark.createDataFrame([(1,), (2,)], "id long").repartition(2).write.format(
        "jsonl_rows"
    ).mode("append").option("path", out).save()
    spark.createDataFrame([(9,)], "id long").coalesce(1).write.format(
        "jsonl_rows"
    ).mode("overwrite").option("path", out).save()
    ids = []
    for p in glob.glob(os.path.join(out, "part-*.jsonl")):
        with open(p) as f:
            ids += [json.loads(line)["id"] for line in f if line.strip()]
    assert ids == [9]


def test_complete_mode_stream_keeps_only_latest_snapshot(spark, tmp_path):
    _register(spark)
    src = tmp_path / "snap_src"
    src.mkdir()
    (src / "b0.json").write_text(json.dumps({"k": "a", "v": 1}))
    out = str(tmp_path / "snap_out")
    raw = spark.readStream.schema("k string, v long").json(str(src))
    agg = raw.groupBy("k").count()
    q = (
        agg.writeStream.format("jsonl_rows")
        .outputMode("complete")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "snap_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        (src / "b1.json").write_text(json.dumps({"k": "a", "v": 2}))
        q.processAllAvailable()
    finally:
        q.stop()
    files = glob.glob(os.path.join(out, "*.jsonl"))
    epochs = {os.path.basename(p).split("-part-")[0] for p in files}
    assert len(epochs) == 1, f"stale epochs kept: {sorted(epochs)}"
    rows = []
    for p in files:
        with open(p) as f:
            rows += [json.loads(line) for line in f if line.strip()]
    assert rows == [{"count": 2, "k": "a"}]


def test_epoch_replay_with_fewer_partitions_sweeps_leftovers(tmp_path):
    """Drive the stream commit protocol directly: attempt 1 of epoch 7
    published 3 part files; the replay plans 2 partitions — the stale
    third file must go, and the two replacements must land atomically
    under the SAME names."""
    from pubg_data_pipeline_spark.sources.jsonl_sink import (
        JsonlStreamWriter,
        _write_partition,
    )

    out = str(tmp_path / "replay")

    class Row:
        def __init__(self, i):
            self.i = i

        def asDict(self, recursive=False):
            return {"i": self.i}

    w = JsonlStreamWriter({"path": out}, overwrite=False)
    first = [_write_partition(out, iter([Row(i)])) for i in range(3)]
    w.commit(first, batchId=7)
    assert len(glob.glob(os.path.join(out, "batch-00000007-part-*.jsonl"))) == 3

    second = [_write_partition(out, iter([Row(10 + i)])) for i in range(2)]
    w.commit(second, batchId=7)
    files = sorted(glob.glob(os.path.join(out, "batch-00000007-part-*.jsonl")))
    assert len(files) == 2
    ids = []
    for p in files:
        with open(p) as f:
            ids += [json.loads(line)["i"] for line in f if line.strip()]
    assert sorted(ids) == [10, 11]


def test_remote_uri_rejected_at_construction(tmp_path):
    """The commit protocol renames executor-written tmps from the
    driver — only valid on a shared local filesystem. A scheme:// path
    must fail at writer construction, before any task writes."""
    import pytest

    from pubg_data_pipeline_spark.sources.jsonl_sink import (
        JsonlBatchWriter,
        JsonlStreamWriter,
    )

    for cls in (JsonlBatchWriter, JsonlStreamWriter):
        with pytest.raises(ValueError, match="local-filesystem"):
            cls({"path": "s3a://bucket/deliveries"}, overwrite=False)
    # plain local paths still construct
    JsonlBatchWriter({"path": str(tmp_path / "ok")}, overwrite=False)


class _FakeRow:
    """Minimal Row stand-in for driving _write_partition directly."""

    def __init__(self, i):
        self.i = i

    def asDict(self, recursive=False):
        return {"i": self.i}


def _split(rows, k):
    parts = [[] for _ in range(k)]
    for idx, r in enumerate(rows):
        parts[idx % k].append(r)
    return parts


def _read_epoch(path, batch_id):
    out = []
    for p in sorted(glob.glob(os.path.join(path, f"batch-{batch_id:08d}-part-*.jsonl"))):
        with open(p) as f:
            out += [json.loads(line)["i"] for line in f if line.strip()]
    return out


def test_stream_replay_convergence_property(tmp_path):
    """Property form of the streaming commit contract
    (sources/jsonl_sink.py docstring: a replayed foreachBatch epoch
    converges even if the replay plans a different partition count
    than the crashed attempt): for ANY row set, ANY partition counts
    before/after, and ANY crash point inside the first attempt's
    commit, a full replay leaves readers seeing exactly the replay's
    rows — no leftovers from the crashed attempt, no torn files."""
    from hypothesis import given, settings, strategies as st

    from pubg_data_pipeline_spark.sources.jsonl_sink import (
        JsonlStreamWriter,
        _write_partition,
    )

    counter = [0]

    @settings(max_examples=60, deadline=None)
    @given(
        rows=st.lists(st.integers(0, 999), min_size=0, max_size=25),
        k_before=st.integers(1, 4),
        k_after=st.integers(1, 4),
        # crash after publishing this many of the first attempt's files
        # (clamped to k_before); k_before+1 means the commit completed
        # and the replay is a pure re-execution
        crash_after=st.integers(0, 5),
    )
    def prop(rows, k_before, k_after, crash_after):
        counter[0] += 1
        out = str(tmp_path / f"case-{counter[0]}")
        w = JsonlStreamWriter({"path": out}, overwrite=False)

        # attempt 1: tasks all wrote; the driver's commit crashes after
        # publishing `crash_after` files (simulated by doing the
        # publish renames by hand and stopping early — abort never runs,
        # which is exactly what a dead driver looks like)
        first = [
            _write_partition(out, iter(p)) for p in _split([_FakeRow(r) for r in rows], k_before)
        ]
        j = min(crash_after, len(first))
        if j >= len(first):
            w.commit(first, batchId=3)  # commit completed; replay anyway
        else:
            for i, m in enumerate(first[:j]):
                os.replace(
                    os.path.join(out, m.tmp_name),
                    os.path.join(out, f"batch-{3:08d}-part-{i:05d}.jsonl"),
                )

        # the replay: same logical rows, different partition count,
        # commit runs to completion
        second = [
            _write_partition(out, iter(p)) for p in _split([_FakeRow(r) for r in rows], k_after)
        ]
        w.commit(second, batchId=3)

        assert sorted(_read_epoch(out, 3)) == sorted(rows)
        published = [
            e for e in os.listdir(out) if e.endswith(".jsonl") and not e.startswith(".tmp-")
        ]
        assert len(published) == k_after

    prop()
