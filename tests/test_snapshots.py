"""Manifest-committed snapshot tables (sources/snapshots.py): atomic
commits, reader isolation / time travel, optimistic-concurrency races,
and vacuum safety. These assert the METADATA protocol — what a reader
can observe at each point — not just final row counts."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.sources import snapshots


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("doubled")
    )


def test_append_versions_and_latest_read(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = snapshots.snapshot_commit(_df(spark, 0, 10), path)
    v2 = snapshots.snapshot_commit(_df(spark, 10, 15), path)
    assert (v1, v2) == (1, 2)
    assert snapshots.snapshot_read(spark, path).count() == 15
    hist = snapshots.snapshot_history(path)
    assert [h["version"] for h in hist] == [1, 2]
    assert [h["parent"] for h in hist] == [0, 1]


def test_time_travel_pinned_version_is_immutable(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 10), path)
    old = snapshots.snapshot_read(spark, path, version=1)
    # later commits — including a full overwrite — must not change v1
    snapshots.snapshot_commit(_df(spark, 100, 120), path)
    snapshots.snapshot_commit(_df(spark, 500, 503), path, mode="overwrite")
    assert sorted(r.id for r in old.collect()) == list(range(10))
    assert sorted(
        r.id for r in snapshots.snapshot_read(spark, path, version=1).collect()
    ) == list(range(10))
    # head reflects only the overwrite
    assert sorted(r.id for r in snapshots.snapshot_read(spark, path).collect()) == [
        500,
        501,
        502,
    ]


def test_uncommitted_data_files_are_invisible(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 5), path)
    # simulate a crashed commit: data written, manifest never published
    _df(spark, 90, 99).write.parquet(os.path.join(path, "data", "stranded"))
    assert snapshots.snapshot_read(spark, path).count() == 5


def test_concurrent_commit_race_retries_and_loses_nothing(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 5), path)
    # occupy the version-2 slot as a concurrent winner would: the next
    # committer must rebase onto it instead of clobbering or failing
    winner_data = os.path.join(path, "data", "winner")
    _df(spark, 5, 8).write.parquet(winner_data)
    files = [
        os.path.join("data", "winner", f)
        for f in sorted(os.listdir(winner_data))
        if f.endswith(".parquet")
    ]
    prev = json.load(
        open(os.path.join(path, "_manifests", "v000000000001.json"))
    )
    manifest = {
        "version": 2,
        "parent": 1,
        "op": "append",
        "commit_id": "winner",
        "n_files": len(prev["files"]) + len(files),
        "files": prev["files"] + files,
    }
    with open(os.path.join(path, "_manifests", "v000000000002.json"), "w") as f:
        json.dump(manifest, f)

    v = snapshots.snapshot_commit(_df(spark, 8, 12), path)
    assert v == 3
    assert sorted(r.id for r in snapshots.snapshot_read(spark, path).collect()) == list(
        range(12)
    )


def test_vacuum_keeps_retained_versions_readable(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 5), path)
    snapshots.snapshot_commit(_df(spark, 5, 10), path)
    snapshots.snapshot_commit(_df(spark, 50, 53), path, mode="overwrite")
    snapshots.snapshot_commit(_df(spark, 53, 55), path)
    removed = snapshots.snapshot_vacuum(path, keep_versions=2, retain_seconds=0, min_version_age_seconds=0)
    # v1/v2 manifests gone; the appended-only commits from before the
    # overwrite are unreferenced by v3/v4 and physically deleted
    assert any("v000000000001.json" in p for p in removed)
    assert any(os.sep + "data" + os.sep in p for p in removed)
    with pytest.raises(ValueError):
        snapshots.snapshot_read(spark, path, version=1)
    assert sorted(r.id for r in snapshots.snapshot_read(spark, path).collect()) == list(
        range(50, 55)
    )
    assert sorted(
        r.id for r in snapshots.snapshot_read(spark, path, version=3).collect()
    ) == [50, 51, 52]


def test_vacuum_reclaims_stranded_crash_debris(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 5), path)
    stranded = os.path.join(path, "data", "stranded")
    _df(spark, 90, 99).write.parquet(stranded)
    # default retention refuses to touch a YOUNG unreferenced dir —
    # it could be an in-flight snapshot_commit's data (round-4 fix)
    assert stranded not in snapshots.snapshot_vacuum(path, keep_versions=1)
    assert os.path.isdir(stranded)
    # with the guard lifted (offline maintenance) the debris goes
    removed = snapshots.snapshot_vacuum(path, keep_versions=1, retain_seconds=0, min_version_age_seconds=0)
    assert stranded in removed
    assert snapshots.snapshot_read(spark, path).count() == 5


def test_empty_table_and_bad_version_errors(spark, tmp_path):
    path = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        snapshots.snapshot_read(spark, path)
    snapshots.snapshot_commit(_df(spark, 0, 3), path)
    with pytest.raises(ValueError):
        snapshots.snapshot_read(spark, path, version=7)


def test_remote_uri_refused(spark):
    with pytest.raises(ValueError, match="conditional PUT"):
        snapshots.snapshot_commit(_df(spark, 0, 3), "s3a://bucket/tbl")
    with pytest.raises(ValueError):
        snapshots.snapshot_vacuum("hdfs://nn/tbl")


def test_append_preserves_schema_and_values(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 4), path)
    snapshots.snapshot_commit(_df(spark, 4, 6), path)
    back = snapshots.snapshot_read(spark, path)
    assert back.columns == ["id", "doubled"]
    rows = {(r.id, r.doubled) for r in back.collect()}
    assert rows == {(i, 2 * i) for i in range(6)}


def test_txn_commit_is_idempotent_under_replay(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 5), path, txn=("appA", 0))
    # at-least-once retry of the SAME epoch: must be a no-op
    v = snapshots.snapshot_commit(_df(spark, 0, 5), path, txn=("appA", 0))
    assert v == 1
    assert snapshots.snapshot_read(spark, path).count() == 5
    # a LOWER epoch replay (restart from older checkpoint) also skips
    snapshots.snapshot_commit(_df(spark, 0, 5), path, txn=("appA", 1))
    snapshots.snapshot_commit(_df(spark, 99, 100), path, txn=("appA", 0))
    assert snapshots.snapshot_read(spark, path).count() == 10
    # a different app_id is an independent txn lane
    snapshots.snapshot_commit(_df(spark, 100, 101), path, txn=("appB", 0))
    assert snapshots.snapshot_read(spark, path).count() == 11
    assert snapshots.last_committed_txn(path, "appA") == 1
    assert snapshots.last_committed_txn(path, "appB") == 0
    assert snapshots.last_committed_txn(path, "appC") is None


def test_changes_returns_exactly_the_appended_rows(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 5), path)
    snapshots.snapshot_commit(_df(spark, 5, 9), path)
    snapshots.snapshot_commit(_df(spark, 9, 12), path)
    delta = snapshots.snapshot_changes(spark, path, since_version=1)
    assert sorted(r.id for r in delta.collect()) == list(range(5, 12))
    mid = snapshots.snapshot_changes(spark, path, 1, to_version=2)
    assert sorted(r.id for r in mid.collect()) == [5, 6, 7, 8]
    # zero-delta keeps the schema
    none = snapshots.snapshot_changes(spark, path, 3, to_version=3)
    assert none.columns == ["id", "doubled"] and none.count() == 0


def test_changes_refuses_overwrite_in_range(spark, tmp_path):
    import pytest as _pytest

    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 5), path)
    snapshots.snapshot_commit(_df(spark, 50, 52), path, mode="overwrite")
    snapshots.snapshot_commit(_df(spark, 52, 54), path)
    with _pytest.raises(ValueError, match="overwrite"):
        snapshots.snapshot_changes(spark, path, since_version=1)
    # range strictly after the overwrite is fine
    ok = snapshots.snapshot_changes(spark, path, since_version=2)
    assert sorted(r.id for r in ok.collect()) == [52, 53]


def test_streaming_to_snapshot_end_to_end_and_epoch_replay(spark, tmp_path):
    from pubg_data_pipeline_spark.streaming import app

    src = tmp_path / "in"
    src.mkdir()
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema("id long, doubled long").json(str(src))
        q = app.streaming_to_snapshot(
            stream, table, app_id="snapstream", available_now=True, checkpoint=ckpt
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()

    (src / "b1.jsonl").write_text('{"id": 1, "doubled": 2}\n{"id": 2, "doubled": 4}\n')
    run()
    assert snapshots.snapshot_read(spark, table).count() == 2
    (src / "b2.jsonl").write_text('{"id": 3, "doubled": 6}\n')
    run()
    assert sorted(r.id for r in snapshots.snapshot_read(spark, table).collect()) == [1, 2, 3]
    # manual replay of an already-committed epoch: exactly-once holds
    replay = spark.createDataFrame([(1, 2), (2, 4)], "id long, doubled long")
    app.snapshot_sink_epoch(replay, 0, table, "snapstream")
    assert snapshots.snapshot_read(spark, table).count() == 3
    # each micro-batch was one atomic version, all append-lineage
    assert [h["op"] for h in snapshots.snapshot_history(table)] == ["append", "append"]


def test_delete_where_sql_null_semantics_and_time_travel(spark, tmp_path):
    """DELETE WHERE: only condition=TRUE rows die (NULL-condition rows
    are KEPT, the SQL rule a bare filter(~cond) breaks); the pre-delete
    version stays readable."""
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 50.0)], "id long, score double"
    )
    snapshots.snapshot_commit(df, path)
    rep = snapshots.snapshot_delete_where(spark, path, F.col("score") > 10.0)
    assert rep == {"version": 2, "deleted_rows": 1}
    back = {r.id for r in snapshots.snapshot_read(spark, path).collect()}
    assert back == {1, 2}  # NULL-score row 2 survives
    # time travel to the pre-delete version
    old = {r.id for r in snapshots.snapshot_read(spark, path, version=1).collect()}
    assert old == {1, 2, 3}
    # deleting nothing is a no-op commit-wise
    rep2 = snapshots.snapshot_delete_where(spark, path, F.col("score") > 999.0)
    assert rep2 == {"version": 2, "deleted_rows": 0}
    assert [h["version"] for h in snapshots.snapshot_history(path)] == [1, 2]


def test_expected_parent_detects_concurrent_commit(spark, tmp_path):
    """The serializable RMW primitive: a commit pinned to a stale head
    raises CommitConflict instead of rebasing over the winner."""
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 5), path)
    head = 1
    # concurrent writer lands v2 between our read and our commit
    snapshots.snapshot_commit(_df(spark, 5, 8), path)
    with pytest.raises(snapshots.CommitConflict, match="head moved"):
        snapshots.snapshot_commit(
            _df(spark, 0, 3), path, mode="overwrite", expected_parent=head
        )
    # the winner's rows are intact; no v3 was published
    assert snapshots.snapshot_read(spark, path).count() == 8
    assert [h["version"] for h in snapshots.snapshot_history(path)] == [1, 2]


def test_delete_where_retries_past_conflict(spark, tmp_path, monkeypatch):
    """snapshot_delete_where re-derives from the NEW head after a
    conflict: a row appended concurrently (and not matching the
    predicate) survives the delete."""
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 5), path)

    real_commit = snapshots.snapshot_commit
    fired = {"done": False}

    def racing_commit(df, p, **kw):
        # first delete attempt: sneak a concurrent append in just
        # before the pinned commit, forcing CommitConflict once
        if not fired["done"] and kw.get("expected_parent") is not None:
            fired["done"] = True
            real_commit(_df(spark, 100, 101), p)  # id=100, doubled=200
        return real_commit(df, p, **kw)

    monkeypatch.setattr(snapshots, "snapshot_commit", racing_commit)
    rep = snapshots.snapshot_delete_where(spark, path, F.col("id") < 2)
    assert rep["deleted_rows"] == 2
    back = sorted(r.id for r in snapshots.snapshot_read(spark, path).collect())
    assert back == [2, 3, 4, 100]  # concurrent append NOT lost


def test_compact_bounds_files_preserves_rows_and_history(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for i in range(6):
        snapshots.snapshot_commit(_df(spark, i * 3, i * 3 + 3).repartition(4), path)
    before = snapshots.snapshot_history(path)[-1]["n_files"]
    assert before > 4
    rep = snapshots.snapshot_compact(spark, path, target_files=4)
    assert rep["files_before"] == before and rep["files_after"] <= 4
    back = sorted(r.id for r in snapshots.snapshot_read(spark, path).collect())
    assert back == list(range(18))
    # pre-compaction version still readable (reader isolation)
    assert snapshots.snapshot_read(spark, path, version=6).count() == 18
    # idempotent: already-compact head is a no-op
    rep2 = snapshots.snapshot_compact(spark, path, target_files=4)
    assert rep2["version"] == rep["version"]
    with pytest.raises(ValueError):
        snapshots.snapshot_compact(spark, path, target_files=0)


def test_restore_is_a_new_commit_preserving_history(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 5), path)
    snapshots.snapshot_commit(_df(spark, 500, 503), path, mode="overwrite")  # bad load
    v = snapshots.snapshot_restore(spark, path, version=1)
    assert v == 3
    assert sorted(r.id for r in snapshots.snapshot_read(spark, path).collect()) == list(
        range(5)
    )
    # nothing rewritten: the bad version stays inspectable
    assert sorted(r.id for r in snapshots.snapshot_read(spark, path, version=2).collect()) == [
        500, 501, 502,
    ]
    hist = snapshots.snapshot_history(path)
    assert [h["op"] for h in hist] == ["append", "overwrite", "restore"]
    # vacuum keeps the restored head's files (referenced via the
    # original commit id)
    snapshots.snapshot_vacuum(path, keep_versions=1, retain_seconds=0, min_version_age_seconds=0)
    assert snapshots.snapshot_read(spark, path).count() == 5
    with pytest.raises(ValueError):
        snapshots.snapshot_restore(spark, path, version=99)


def test_append_schema_enforcement(spark, tmp_path):
    """Delta-default enforcement: dropped/changed columns are rejected
    outright; added columns need allow_schema_evolution, after which
    reads merge schemas and old files surface NULLs."""
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 3), path)
    # type change: rejected
    changed = spark.range(3, 5).select(
        F.col("id"), F.col("id").cast("string").alias("doubled")
    )
    with pytest.raises(ValueError, match="changes a type"):
        snapshots.snapshot_commit(changed, path)
    # dropped column: rejected
    with pytest.raises(ValueError, match="drops a column"):
        snapshots.snapshot_commit(spark.range(3, 5).select("id"), path)
    # additive without the flag: rejected
    wider = _df(spark, 3, 5).withColumn("extra", F.lit("x"))
    with pytest.raises(ValueError, match="allow_schema_evolution"):
        snapshots.snapshot_commit(wider, path)
    # nothing was committed by the rejections
    assert [h["version"] for h in snapshots.snapshot_history(path)] == [1]

    v = snapshots.snapshot_commit(wider, path, allow_schema_evolution=True)
    assert v == 2
    back = snapshots.snapshot_read(spark, path)
    assert set(back.columns) == {"id", "doubled", "extra"}
    rows = {(r.id, r.extra) for r in back.collect()}
    assert rows == {(0, None), (1, None), (2, None), (3, "x"), (4, "x")}
    # the evolved flag is inherited: a same-schema follow-up append
    # still merge-reads the mixed lineage
    snapshots.snapshot_commit(
        _df(spark, 5, 6).withColumn("extra", F.lit("y")), path
    )
    assert snapshots.snapshot_read(spark, path).count() == 6
    # nullability drift alone is NOT a schema change
    renull = spark.createDataFrame(
        [(9, 18)], "id long, doubled long"
    ).withColumn("extra", F.lit(None).cast("string"))
    snapshots.snapshot_commit(renull, path)
    assert snapshots.snapshot_read(spark, path).count() == 7
    # overwrite replaces the schema freely and resets evolution
    snapshots.snapshot_commit(spark.range(2).select("id"), path, mode="overwrite")
    assert snapshots.snapshot_read(spark, path).columns == ["id"]


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 5), path)  # (id, doubled=2*id)
    updates = spark.createDataFrame(
        [(2, 999), (4, 888), (10, 20)], "id long, doubled long"
    )
    rep = snapshots.snapshot_merge_upsert(spark, path, updates, ["id"])
    assert rep["updated"] == 2 and rep["inserted"] == 1
    back = {(r.id, r.doubled) for r in snapshots.snapshot_read(spark, path).collect()}
    assert back == {(0, 0), (1, 2), (2, 999), (3, 6), (4, 888), (10, 20)}
    # pre-merge version intact (time travel)
    assert {
        (r.id, r.doubled)
        for r in snapshots.snapshot_read(spark, path, version=1).collect()
    } == {(i, 2 * i) for i in range(5)}
    # duplicate update keys rejected before any commit
    dup = spark.createDataFrame([(7, 1), (7, 2)], "id long, doubled long")
    with pytest.raises(ValueError, match="duplicate keys"):
        snapshots.snapshot_merge_upsert(spark, path, dup, ["id"])
    # schema mismatch rejected
    bad = spark.createDataFrame([(1, 2, 3)], "id long, doubled long, extra long")
    with pytest.raises(ValueError, match="columns"):
        snapshots.snapshot_merge_upsert(spark, path, bad, ["id"])
    assert snapshots.snapshot_history(path)[-1]["version"] == 2


def test_merge_upsert_retries_past_conflict(spark, tmp_path, monkeypatch):
    """Same injected-race proof as delete: a row appended concurrently
    mid-merge survives because the merge re-derives from the new head."""
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 3), path)

    real_commit = snapshots.snapshot_commit
    fired = {"done": False}

    def racing_commit(df, p, **kw):
        if not fired["done"] and kw.get("expected_parent") is not None:
            fired["done"] = True
            real_commit(_df(spark, 50, 51), p)  # concurrent append (50, 100)
        return real_commit(df, p, **kw)

    monkeypatch.setattr(snapshots, "snapshot_commit", racing_commit)
    updates = spark.createDataFrame([(1, 111)], "id long, doubled long")
    rep = snapshots.snapshot_merge_upsert(spark, path, updates, ["id"])
    assert rep["updated"] == 1 and rep["inserted"] == 0
    back = {(r.id, r.doubled) for r in snapshots.snapshot_read(spark, path).collect()}
    assert back == {(0, 0), (1, 111), (2, 4), (50, 100)}  # append NOT lost


def test_compact_with_clustering_restores_file_skipping(spark, tmp_path):
    """sort_within_by: post-compaction files tile the sort column
    (disjoint min-max ranges), so predicates on it prune files."""
    import glob
    import json as _json

    path = str(tmp_path / "tbl")
    # arrival order scrambles id across files
    for i in range(4):
        snapshots.snapshot_commit(
            _df(spark, 0, 40).filter(F.col("id") % 4 == i).repartition(3), path
        )
    rep = snapshots.snapshot_compact(spark, path, target_files=4, sort_within_by=["id"])
    assert rep["files_after"] <= 4
    back = snapshots.snapshot_read(spark, path)
    assert back.count() == 40
    # read each compacted file's id range: ranges must be disjoint
    files = [
        f
        for f in snapshots._read_manifest(path, rep["version"])["files"]
    ]
    import os as _os

    ranges = []
    for f in files:
        stats = (
            spark.read.parquet(_os.path.join(path, f))
            .agg(F.min("id"), F.max("id"))
            .first()
        )
        ranges.append((stats[0], stats[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"file ranges overlap: {ranges}"


# ------------------------------------------------ round 8: change feed


def _changes(spark, path, since, to=None):
    return {
        tuple(r)
        for r in snapshots.snapshot_table_changes(spark, path, since, to)
        .select("id", "doubled", "_change_type", "_commit_version")
        .collect()
    }


def test_table_changes_through_appends_and_delete(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 4), path)          # v1
    snapshots.snapshot_commit(_df(spark, 4, 6), path)          # v2
    snapshots.snapshot_delete_where(spark, path, F.col("id") < 2)  # v3
    got = _changes(spark, path, 0)
    expect = (
        {(i, 2 * i, "insert", 1) for i in range(4)}
        | {(i, 2 * i, "insert", 2) for i in (4, 5)}
        | {(i, 2 * i, "delete", 3) for i in (0, 1)}
    )
    assert got == expect
    # a bounded slice attributes per commit
    assert _changes(spark, path, 1, 2) == {(i, 2 * i, "insert", 2) for i in (4, 5)}
    # net state from the feed equals the head read (CDC replay check)
    assert _changes(spark, path, 2) == {(i, 2 * i, "delete", 3) for i in (0, 1)}


def test_table_changes_compaction_is_silent_merge_is_rowlevel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for lo in range(0, 8, 2):
        snapshots.snapshot_commit(_df(spark, lo, lo + 2).repartition(2), path)
    head = snapshots.snapshot_history(path)[-1]["version"]
    snapshots.snapshot_compact(spark, path, target_files=1)
    # compaction contributes zero change rows
    assert _changes(spark, path, head) == set()
    upd = spark.createDataFrame([(3, 99), (50, 100)], "id long, doubled long")
    snapshots.snapshot_merge_upsert(spark, path, upd, ["id"])
    mv = snapshots.snapshot_history(path)[-1]["version"]
    assert _changes(spark, path, head) == {
        (3, 6, "update_preimage", mv),
        (3, 99, "update_postimage", mv),
        (50, 100, "insert", mv),
    }


def test_table_changes_restore_records_row_diff(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 3), path)              # v1
    snapshots.snapshot_commit(_df(spark, 3, 5), path)              # v2
    v3 = snapshots.snapshot_restore(spark, path, 1)                # v3
    assert _changes(spark, path, 2) == {(i, 2 * i, "delete", v3) for i in (3, 4)}
    # restore to the current head is an empty change set
    v4 = snapshots.snapshot_restore(spark, path, v3)
    assert _changes(spark, path, v3) == set()
    assert snapshots.snapshot_history(path)[-1]["version"] == v4


def test_table_changes_fails_loud_on_legacy_overwrite_and_vacuum(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 3), path)
    snapshots.snapshot_commit(_df(spark, 9, 12), path, mode="overwrite")
    with pytest.raises(ValueError, match="no recorded change data"):
        snapshots.snapshot_table_changes(spark, path, 0)
    snapshots.snapshot_commit(_df(spark, 12, 14), path)
    snapshots.snapshot_vacuum(
        path, keep_versions=1, retain_seconds=0, min_version_age_seconds=0
    )
    with pytest.raises(ValueError, match="vacuumed"):
        snapshots.snapshot_table_changes(spark, path, 1)


def test_vacuum_reclaims_unreferenced_change_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 6), path)
    snapshots.snapshot_delete_where(spark, path, F.col("id") < 2)
    changes_root = os.path.join(path, "_changes")
    assert os.listdir(changes_root)  # delete recorded change files
    snapshots.snapshot_vacuum(
        path, keep_versions=1, retain_seconds=0, min_version_age_seconds=0
    )
    # the delete commit is retained (head) -> its change dir survives;
    # now delete again and vacuum past it
    snapshots.snapshot_delete_where(spark, path, F.col("id") == 2)
    snapshots.snapshot_vacuum(
        path, keep_versions=1, retain_seconds=0, min_version_age_seconds=0
    )
    head_v = snapshots.snapshot_history(path)[-1]["version"]
    live = snapshots._read_manifest(path, head_v)
    cited = {f.split(os.sep)[1] for f in live.get("change", {}).get("files", [])}
    assert cited and set(os.listdir(changes_root)) == cited


# ------------------------------------- round 8: stats pruning + vacuum guard


def test_manifest_stats_prune_files_and_preserve_semantics(spark, tmp_path):
    path = str(tmp_path / "tbl")
    # clustered commits: each version's file covers a disjoint id range
    for lo in range(0, 100, 20):
        snapshots.snapshot_commit(
            _df(spark, lo, lo + 20).coalesce(1), path, stats_cols=["id"]
        )
    full = snapshots.snapshot_read(spark, path)
    assert len(full.inputFiles()) == 5
    pruned = snapshots.snapshot_read(spark, path, where=[("id", ">=", 77)])
    assert len(pruned.inputFiles()) == 2  # [60,80) + [80,100) survive
    assert {r.id for r in pruned.collect()} == set(range(77, 100))
    # equality prune: single file
    one = snapshots.snapshot_read(spark, path, where=[("id", "==", 5)])
    assert len(one.inputFiles()) == 1
    assert one.collect()[0].doubled == 10
    # impossible predicate: zero files, empty result, schema preserved
    none = snapshots.snapshot_read(spark, path, where=[("id", ">", 1000)])
    assert none.count() == 0 and none.columns == ["id", "doubled"]
    # files without recorded stats are always kept (older table)
    bare = str(tmp_path / "bare")
    snapshots.snapshot_commit(_df(spark, 0, 5), bare)
    kept = snapshots.snapshot_read(spark, bare, where=[("id", "==", 1)])
    assert kept.count() == 1


def test_compact_with_clustering_then_stats_prune(spark, tmp_path):
    """snapshot_compact's 'restores file skipping' docstring claim,
    now an assertion: arrival-ordered files have overlapping ranges
    (no pruning), re-clustering + stats makes selective reads touch
    a strict subset of files."""
    path = str(tmp_path / "tbl")
    # interleaved commits: every file spans nearly the full id range
    for k in range(4):
        part = spark.range(k, 100, 4).select(
            F.col("id"), (F.col("id") * 2).alias("doubled")
        )
        snapshots.snapshot_commit(part.coalesce(1), path, stats_cols=["id"])
    overlapped = snapshots.snapshot_read(spark, path, where=[("id", "<", 10)])
    assert len(overlapped.inputFiles()) == 4  # all ranges overlap: no skip
    snapshots.snapshot_compact(spark, path, target_files=2, sort_within_by=["id"])
    clustered = snapshots.snapshot_read(spark, path, where=[("id", "<", 10)])
    assert len(clustered.inputFiles()) == 1  # disjoint ranges: one file
    assert {r.id for r in clustered.collect()} == set(range(10))
    # stats survive the compaction (recomputed for the new files)
    head = snapshots.snapshot_history(path)[-1]["version"]
    m = snapshots._read_manifest(path, head)
    assert m["stats_cols"] == ["id"]
    assert all(f in m["file_stats"] for f in m["files"])


def test_stats_inherited_as_table_property(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 10).coalesce(1), path, stats_cols=["id"])
    # later appends inherit stats_cols without restating it
    snapshots.snapshot_commit(_df(spark, 10, 20).coalesce(1), path)
    m = snapshots._read_manifest(path, 2)
    assert m["stats_cols"] == ["id"]
    assert len(m["file_stats"]) == 2
    pruned = snapshots.snapshot_read(spark, path, where=[("id", ">=", 15)])
    assert len(pruned.inputFiles()) == 1


def test_vacuum_min_version_age_guards_pinned_readers(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 5), path)
    snapshots.snapshot_commit(_df(spark, 5, 8), path)
    pinned = snapshots.snapshot_read(spark, path, version=1)  # open reader
    # a vacuum with the default pinned-reader guard keeps the young
    # version even though keep_versions=1 would drop it
    removed = snapshots.snapshot_vacuum(path, keep_versions=1, retain_seconds=0)
    assert removed == []
    assert pinned.count() == 5  # files still there mid-"scan"
    assert [h["version"] for h in snapshots.snapshot_history(path)] == [1, 2]
    # explicit opt-out reclaims it (offline maintenance)
    snapshots.snapshot_vacuum(
        path, keep_versions=1, retain_seconds=0, min_version_age_seconds=0
    )
    assert [h["version"] for h in snapshots.snapshot_history(path)] == [2]


def test_file_may_match_pure_predicate_logic():
    """The pruning predicate in isolation: missing stats keep, all-null
    skip, boundary equality, type mismatch keeps, and the
    'YYYY-MM-DD HH:MM:SS' vs ISO-'T' normalization that would
    otherwise mis-prune same-date files (space sorts before 'T')."""
    m = snapshots._file_may_match
    s = lambda mn, mx, nulls=0, rows=10: {"c": {"min": mn, "max": mx, "nulls": nulls, "rows": rows}}
    assert m(None, [("c", "==", 5)])  # no stats recorded: keep
    assert m({"c": None}, [("c", "==", 5)])  # column unprunable: keep
    assert m(s(1, 10), [("c", "==", 10)])  # inclusive upper boundary
    assert m(s(1, 10), [("c", "==", 1)])  # inclusive lower boundary
    assert not m(s(1, 10), [("c", "==", 11)])
    assert not m(s(1, 10), [("c", ">", 10)])
    assert m(s(1, 10), [("c", ">=", 10)])
    assert not m(s(1, 10), [("c", "<", 1)])
    assert m(s(1, 10), [("c", "<=", 1)])
    # conjuncts AND together: any impossible conjunct skips
    assert not m(s(1, 10), [("c", ">=", 2), ("c", "==", 0)])
    # all-null file can satisfy no comparison
    assert not m(s(None, None, nulls=10, rows=10), [("c", "==", 3)])
    # empty file (0 rows) can satisfy no comparison
    assert not m(s(None, None, nulls=0, rows=0), [("c", ">=", 0)])
    # type mismatch: keep (never unsafe-prune)
    assert m(s("a", "z"), [("c", "==", 5)])
    # timestamp literal with a space separator vs ISO stats
    iso = s("2024-01-15T08:00:00", "2024-01-15T20:00:00")
    assert m(iso, [("c", ">=", "2024-01-15 12:00:00")])
    assert not m(iso, [("c", ">=", "2024-01-15 21:00:00")])
    assert not m(iso, [("c", "<", "2024-01-15 08:00:00")])
    # datetime objects normalize through isoformat
    import datetime

    assert m(iso, [("c", "==", datetime.datetime(2024, 1, 15, 9, 0))])
    assert not m(iso, [("c", "==", datetime.datetime(2024, 1, 16, 9, 0))])


def test_stat_value_encoding_rules():
    import datetime
    import decimal

    sv = snapshots._stat_value
    assert sv(5) == 5 and sv(2.5) == 2.5 and sv("x") == "x"
    assert sv(b"abc") == "abc"
    assert sv(b"\xff\xfe") is None  # undecodable bytes: unprunable
    assert sv(datetime.date(2024, 1, 15)) == "2024-01-15"
    assert sv(datetime.datetime(2024, 1, 15, 8)) == "2024-01-15T08:00:00"
    assert sv(decimal.Decimal("1.23")) is None  # order-unsafe encoding
    assert sv(None) is None


def test_pruning_date_only_literals_do_not_overprune():
    """Review finding (round 8): a bare 'YYYY-MM-DD' literal (or
    datetime.date) compared against ISO timestamp stats must behave as
    its midnight instant — not sort lexicographically below every
    same-day timestamp and wrongly skip boundary files."""
    import datetime

    m = snapshots._file_may_match
    iso = {
        "c": {
            "min": "2024-01-05T00:00:00",
            "max": "2024-01-05T20:00:00",
            "nulls": 0,
            "rows": 5,
        }
    }
    # the midnight row matches ts <= date'2024-01-05' — keep the file
    assert m(iso, [("c", "<=", "2024-01-05")])
    assert m(iso, [("c", "<=", datetime.date(2024, 1, 5))])
    assert m(iso, [("c", "==", "2024-01-05")])
    assert m(iso, [("c", ">=", "2024-01-05")])
    # a date strictly before the file still prunes
    assert not m(iso, [("c", "<=", "2024-01-04")])
    assert not m(iso, [("c", "==", "2024-01-06")])
    # date-typed stats vs a timestamp literal: midnight boundary kept
    date_stats = {
        "c": {"min": "2024-01-05", "max": "2024-01-06", "nulls": 0, "rows": 5}
    }
    assert m(date_stats, [("c", ">=", "2024-01-06T00:00:00")])
    assert not m(date_stats, [("c", ">", "2024-01-06T00:00:00")])


def test_restore_then_pruned_or_empty_read_uses_manifest_schema(spark, tmp_path):
    """Review finding (round 8): RESTORE commits are manifest-only (no
    data/<commit_id> directory) — an all-files-pruned read of a
    restored head must return the documented empty result, not crash
    on a missing path."""
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(
        _df(spark, 0, 10).coalesce(1), path, stats_cols=["id"]
    )
    snapshots.snapshot_commit(_df(spark, 10, 20).coalesce(1), path)
    snapshots.snapshot_restore(spark, path, 1)
    out = snapshots.snapshot_read(spark, path, where=[("id", ">", 10_000)])
    assert out.count() == 0 and out.columns == ["id", "doubled"]
    # restore of an empty overwrite reads back empty with schema
    import pyspark.sql.functions as _F

    snapshots.snapshot_commit(
        _df(spark, 0, 0), path, mode="overwrite"
    )
    v_empty = snapshots.snapshot_history(path)[-1]["version"]
    snapshots.snapshot_commit(_df(spark, 30, 33), path)
    snapshots.snapshot_restore(spark, path, v_empty, record_changes=False)
    back = snapshots.snapshot_read(spark, path)
    assert back.count() == 0 and back.columns == ["id", "doubled"]


def test_zorder_compact_prunes_on_every_clustered_dimension(spark, tmp_path):
    """OPTIMIZE ZORDER semantics: after Morton clustering on (x, y),
    manifest stats prune files for a range on EITHER column — a linear
    sort_within_by only ever serves its leading column."""
    path = str(tmp_path / "tbl")
    grid = (
        spark.range(0, 10_000)
        .select(
            (F.col("id") % 100).alias("x"),
            (F.col("id") / 100).cast("long").alias("y"),
            F.col("id").alias("v"),
        )
        .orderBy(F.xxhash64("id"))  # arrival order: useless stats
    )
    snapshots.snapshot_commit(grid, path, stats_cols=["x", "y"])
    c = snapshots.snapshot_compact(spark, path, target_files=16, zorder_by=["x", "y"])
    m = snapshots._read_manifest(path, c["version"])
    fs = m["file_stats"]

    def kept(where):
        return sum(
            1 for f in m["files"] if snapshots._file_may_match(fs.get(f), where)
        )

    assert kept([("x", ">=", 10), ("x", "<=", 20)]) < 16
    assert kept([("y", ">=", 10), ("y", "<=", 20)]) < 16
    # rows identical, pruned read exact
    assert snapshots.snapshot_read(spark, path).count() == 10_000
    assert (
        snapshots.snapshot_read(
            spark, path, where=[("x", ">=", 10), ("x", "<=", 20)]
        ).count()
        == 11 * 100
    )
    # the z-order rewrite is still a provably-empty change set
    assert snapshots.snapshot_table_changes(spark, path, 1).count() == 0


def test_zorder_validation_and_edge_inputs(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, 1.0, "a", None), (2, 1.0, "b", None)],
        "k long, const double, s string, nul timestamp",
    )
    snapshots.snapshot_commit(df, path)
    with pytest.raises(ValueError, match=">= 2 columns"):
        snapshots.snapshot_compact(spark, path, zorder_by=["k"])
    with pytest.raises(ValueError, match="not in"):
        snapshots.snapshot_compact(spark, path, zorder_by=["k", "missing"])
    with pytest.raises(ValueError, match="numeric/temporal"):
        snapshots.snapshot_compact(spark, path, zorder_by=["k", "s"])
    with pytest.raises(ValueError, match="not both"):
        snapshots.snapshot_compact(
            spark, path, sort_within_by=["k"], zorder_by=["k", "const"]
        )
    # constant and all-NULL columns cluster without dividing by zero
    c = snapshots.snapshot_compact(
        spark, path, target_files=2, zorder_by=["k", "const", "nul"]
    )
    assert snapshots.snapshot_read(spark, path, version=c["version"]).count() == 2


def test_explicit_clustering_rewrites_even_at_low_file_count(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 100).coalesce(1), path)
    # bare compact: fast path, no new version
    before = snapshots.snapshot_history(path)[-1]["version"]
    assert (
        snapshots.snapshot_compact(spark, path, target_files=4)["version"] == before
    )
    # requested clustering: always rewrites
    c = snapshots.snapshot_compact(
        spark, path, target_files=4, sort_within_by=["id"]
    )
    assert c["version"] == before + 1
