"""The transactional-log commit backend (commitproto.TxnLog) and its
consumers: versioned CAS publishes, snapshot isolation, the log-backed
maintenance journal behind propagate_deletes/expire_partitions, and
fsck over log-maintained tables. snapshots.py runs on the same class —
its protocol tests (test_snapshots.py) are the table-level suite."""

from __future__ import annotations

import json
import os

import pytest

from pubg_data_pipeline_spark.sources import io as sio
from pubg_data_pipeline_spark.sources.commitproto import TxnLog


def test_txnlog_dense_versions_and_pinned_reads(tmp_path):
    log = TxnLog(str(tmp_path / "log"))
    assert log.versions() == [] and log.read() is None
    v1 = log.publish({"state": "a"})
    v2 = log.publish({"state": "b"})
    assert (v1, v2) == (1, 2)
    assert log.read()["state"] == "b"
    # snapshot isolation: a pinned read is immune to later commits
    pinned = log.read(1)
    log.publish({"state": "c"})
    assert pinned["state"] == "a" and log.read(1)["state"] == "a"
    assert log.read()["state"] == "c"
    # every committed doc carries its version stamp
    assert log.read(2)["_txn"]["version"] == 2


def test_txnlog_cas_loser_rebases_not_clobbers(tmp_path):
    log = TxnLog(str(tmp_path / "log"))
    log.publish({"state": "a"})
    # a concurrent winner occupies the next slot out-of-band
    with open(os.path.join(str(tmp_path / "log"), "v000000000002.json"), "w") as f:
        json.dump({"state": "winner"}, f)
    # publish() must take slot 3, leaving the winner intact
    assert log.publish({"state": "b"}) == 3
    assert log.read(2)["state"] == "winner"
    # the slot primitive reports the loss instead of overwriting
    assert not log.try_publish_version({"state": "x"}, 2, "me")
    assert log.read(2)["state"] == "winner"


def test_txnlog_vacuum_drops_history_keeps_head(tmp_path):
    log = TxnLog(str(tmp_path / "log"))
    for s in "abcd":
        log.publish({"state": s})
    removed = log.vacuum(keep_versions=2)
    assert len(removed) == 2
    assert log.versions() == [3, 4]
    assert log.read()["state"] == "d"
    with pytest.raises(ValueError):
        log.vacuum(0)


def _partitioned_table(spark, tmp_path, name="t"):
    path = str(tmp_path / name)
    spark.createDataFrame(
        [(k, k % 3, f"v{k}") for k in range(30)], "user_id long, day int, v string"
    ).write.partitionBy("day").parquet(path)
    return path


def test_propagate_deletes_log_backend_journals_before_sweep(spark, tmp_path):
    path = _partitioned_table(spark, tmp_path)
    kill = spark.createDataFrame(
        [(k,) for k in range(0, 30, 3)] + [(1,)], "user_id long"
    )
    stats = sio.propagate_deletes(spark, path, kill, "user_id", "day", backend="log")
    # same observable behavior as the direct backend...
    assert stats == {"affected_partitions": 2, "deleted_rows": 11}
    assert not os.path.isdir(os.path.join(path, "day=0"))
    assert spark.read.parquet(path).count() == 19
    # ...plus an auditable journal entry with the doom-set, followed by
    # the sweep-completion marker citing it
    log = TxnLog(os.path.join(path, "_maintenance_log"))
    entry = log.read(log.versions()[0])
    assert entry["op"] == "propagate_deletes"
    assert entry["doomed"] == ["0"]
    assert entry["deleted_rows"] == 11
    marker = log.read()
    assert marker["op"] == "sweep_complete"
    assert marker["for_version"] == entry["_txn"]["version"]


def test_expire_partitions_log_backend_and_crash_replay(spark, tmp_path):
    path = str(tmp_path / "t3")
    spark.createDataFrame(
        [(1, "2024-01-10"), (2, "2024-01-15"), (3, "2024-01-20")],
        "id long, day string",
    ).write.partitionBy("day").parquet(path)
    dropped = sio.expire_partitions(
        path, "day", keep=lambda d: d >= "2024-01-15", backend="log"
    )
    assert dropped == ["2024-01-10"]
    log = TxnLog(os.path.join(path, "_maintenance_log"))
    entry = log.read(log.versions()[0])
    assert entry["op"] == "expire_partitions" and entry["doomed"] == ["2024-01-10"]
    # crash window: journal committed but the sweep died — simulate by
    # resurrecting the doomed directory AND removing the completion
    # marker (a finished sweep is never replayed), then replay converges
    os.makedirs(os.path.join(path, "day=2024-01-10"))
    (tmp_path / "t3" / "day=2024-01-10" / "part-0.parquet").write_text("stale")
    log.remove(log.versions()[-1])
    removed = sio.complete_pending_maintenance(path, "day")
    assert removed == ["2024-01-10"]
    assert not os.path.isdir(os.path.join(path, "day=2024-01-10"))
    # recovery published its own completion marker: nothing left to do,
    # and a second resurrection is NOT re-swept (the entry is complete)
    assert sio.complete_pending_maintenance(path, "day") == []
    os.makedirs(os.path.join(path, "day=2024-01-10"))
    assert sio.complete_pending_maintenance(path, "day") == []


def test_complete_pending_maintenance_skips_completed_entries(spark, tmp_path):
    """A COMPLETED doom-set must never kill a legitimately re-created
    partition — completion is tracked per entry (sweep_complete
    markers), so only entries whose sweep never finished replay."""
    path = str(tmp_path / "t4")
    spark.createDataFrame(
        [(1, "2024-01-10"), (2, "2024-01-20")], "id long, day string"
    ).write.partitionBy("day").parquet(path)
    sio.expire_partitions(path, "day", keep=lambda d: d >= "2024-01-15", backend="log")
    # the expired day legitimately returns (late re-ingest)...
    spark.createDataFrame([(9, "2024-01-10")], "id long, day string").write.mode(
        "append"
    ).partitionBy("day").parquet(path)
    # ...then a NEWER maintenance pass dooms a different value
    sio.expire_partitions(path, "day", keep=lambda d: d != "2024-01-20", backend="log")
    assert sio.complete_pending_maintenance(path, "day") == []
    # the re-created old partition survived the replay
    assert os.path.isdir(os.path.join(path, "day=2024-01-10"))
    # a table with no journal is a no-op
    bare = _partitioned_table(spark, tmp_path, "bare")
    assert sio.complete_pending_maintenance(bare, "day") == []


def test_complete_pending_maintenance_replays_buried_incomplete_entry(
    spark, tmp_path
):
    """The round-7 ADVICE burial hazard: a sweep that crashed, followed
    by a LATER maintenance run that completed, must still be recovered —
    the old newest-entry-only replay hid it forever."""
    path = str(tmp_path / "t6")
    spark.createDataFrame(
        [(1, "2024-01-10"), (2, "2024-01-20"), (3, "2024-01-30")],
        "id long, day string",
    ).write.partitionBy("day").parquet(path)
    sio.expire_partitions(path, "day", keep=lambda d: d >= "2024-01-15", backend="log")
    log = TxnLog(os.path.join(path, "_maintenance_log"))
    crashed_version = log.versions()[0]
    # simulate the crash: doomed dir resurrected, completion marker gone
    os.makedirs(os.path.join(path, "day=2024-01-10"))
    log.remove(log.versions()[-1])
    # a LATER run on a different value completes normally — under the
    # old protocol this BURIED the crashed entry
    sio.expire_partitions(path, "day", keep=lambda d: d != "2024-01-30", backend="log")
    assert not os.path.isdir(os.path.join(path, "day=2024-01-30"))
    # recovery replays the buried incomplete doom-set
    assert sio.complete_pending_maintenance(path, "day") == ["2024-01-10"]
    assert not os.path.isdir(os.path.join(path, "day=2024-01-10"))
    # and records its completion against the crashed entry
    markers = [
        log.read(v)
        for v in log.versions()
        if log.read(v).get("op") == "sweep_complete"
    ]
    assert crashed_version in {m["for_version"] for m in markers}
    assert sio.complete_pending_maintenance(path, "day") == []


def test_unknown_maintenance_backend_rejected(spark, tmp_path):
    path = _partitioned_table(spark, tmp_path, "t5")
    kill = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(ValueError, match="backend"):
        sio.propagate_deletes(spark, path, kill, "user_id", "day", backend="nope")
    with pytest.raises(ValueError, match="backend"):
        sio.expire_partitions(path, "day", keep=lambda d: True, backend="nope")


def test_fsck_on_log_maintained_table(spark, tmp_path):
    """A healthy log-maintained table is fsck-silent (the log dirs are
    committed state, not residue); a crashed CAS publish's tmp slot
    file is flagged as tmp_orphan like every other tmp spelling."""
    path = _partitioned_table(spark, tmp_path, "t6")
    kill = spark.createDataFrame([(1,)], "user_id long")
    sio.propagate_deletes(spark, path, kill, "user_id", "day", backend="log")
    assert sio.warehouse_fsck(str(tmp_path)) == []
    # crashed CAS: tmp written, link never happened, unlink never ran
    stranded = os.path.join(path, "_maintenance_log", ".tmp-deadbeef-2")
    with open(stranded, "w") as f:
        f.write("{}")
    found = sio.warehouse_fsck(str(tmp_path))
    assert [(f["kind"], f["path"]) for f in found] == [("tmp_orphan", stranded)]


def test_txnlog_concurrent_publishers_lose_nothing(tmp_path):
    """Real-concurrency CAS: 8 threads x 10 publishes race on one log.
    Every publish must land in its OWN dense version slot — no
    clobbers, no gaps, no duplicate winners (the os.link EEXIST
    contract under actual interleaving, not just the simulated race)."""
    import threading

    log = TxnLog(str(tmp_path / "log"), retries=200)
    won: list[int] = []
    lock = threading.Lock()
    errs: list[Exception] = []

    def worker(tid: int) -> None:
        try:
            for i in range(10):
                v = log.publish({"writer": tid, "i": i})
                with lock:
                    won.append(v)
        except Exception as exc:  # pragma: no cover - fail the test below
            errs.append(exc)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert sorted(won) == list(range(1, 81))  # dense, unique, complete
    assert log.versions() == list(range(1, 81))
    # every document is intact and attributable
    seen = {(d["writer"], d["i"]) for d in (log.read(v) for v in log.versions())}
    assert seen == {(t, i) for t in range(8) for i in range(10)}


_ROWS_BASE = [
    ("2024-01-01", 1, 10.0),
    ("2024-01-02", 2, 5.0),
]


def test_backfill_log_retention_bounds_metadata(spark, tmp_path):
    """log_keep_versions: a recurring backfill must not accrete one
    manifest per run forever; only the newest N survive and the diff
    still reads the latest state correctly."""
    target = str(tmp_path / "daily")
    rows = list(_ROWS_BASE)
    for i in range(5):
        rows.append(("2024-01-01", 100 + i, float(i)))
        sio.backfill_stale_partitions(
            spark,
            spark.createDataFrame(rows, "day string, user_id long, value double"),
            target,
            "day",
            lambda df: df.groupBy("day").count(),
            backend="log",
            log_keep_versions=2,
        )
    log = TxnLog(os.path.join(target, "_backfill_log"))
    assert len(log.versions()) == 2  # bounded, newest retained
    # the retained head is authoritative: a no-change rerun stays quiet
    rep = sio.backfill_stale_partitions(
        spark,
        spark.createDataFrame(rows, "day string, user_id long, value double"),
        target,
        "day",
        lambda df: df.groupBy("day").count(),
        backend="log",
        log_keep_versions=2,
    )
    assert rep["stale"] == []


def test_legacy_markerless_journal_replays_only_newest_entry(spark, tmp_path):
    """Review finding (round 8): a journal written by the pre-marker
    protocol has no sweep_complete records at all — recovery must keep
    the OLD newest-entry-only semantics there, or it would re-doom
    every historical partition value including legitimately re-created
    ones."""
    path = str(tmp_path / "legacy")
    spark.createDataFrame(
        [(1, "2024-01-10"), (2, "2024-01-20"), (3, "2024-01-30")],
        "id long, day string",
    ).write.partitionBy("day").parquet(path)
    # hand-write a legacy journal: two completed doom entries, no markers
    log = TxnLog(os.path.join(path, "_maintenance_log"))
    log.publish(
        {"op": "expire_partitions", "partition_col": "day", "doomed": ["2024-01-10"]}
    )
    log.publish(
        {"op": "expire_partitions", "partition_col": "day", "doomed": ["2024-01-20"]}
    )
    # 2024-01-10 was swept long ago and legitimately re-created; the
    # NEWEST entry's sweep crashed (its dir still present)
    removed = sio.complete_pending_maintenance(path, "day")
    assert removed == ["2024-01-20"]
    assert os.path.isdir(os.path.join(path, "day=2024-01-10"))  # survives
    # recovery published a marker -> the table is on the new protocol now
    assert sio.complete_pending_maintenance(path, "day") == []
