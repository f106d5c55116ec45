"""Deletion vectors for snapshot tables
(sources/snapshots.snapshot_delete_where(use_dv=True)): a DELETE
writes O(deleted rows) of position metadata instead of rewriting the
table, readers apply it as one anti-join, compaction materializes it.
These pin the METADATA protocol — what each version's manifest claims
and what a reader can observe — alongside row-level semantics, change
-feed exactly-once, and interop with every other snapshot operation.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.sources import snapshots


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("doubled")
    )


def _ids(df):
    return sorted(r.id for r in df.collect())


def _data_commit_dirs(path):
    return sorted(os.listdir(os.path.join(path, "data")))


def test_dv_delete_matches_filter_semantics_without_rewriting(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 100).repartition(4), path)
    before_dirs = _data_commit_dirs(path)
    r = snapshots.snapshot_delete_where(spark, path, F.col("id") < 30, use_dv=True)
    assert r["deleted_rows"] == 30
    assert _ids(snapshots.snapshot_read(spark, path)) == list(range(30, 100))
    # THE point: no data rewrite — not one new data directory, and the
    # manifest keeps the parent's file list verbatim
    assert _data_commit_dirs(path) == before_dirs
    m1 = snapshots._read_manifest(path, 1)
    m2 = snapshots._read_manifest(path, 2)
    assert m2["files"] == m1["files"]
    assert m2["op"] == "delete"
    assert m2["dv"]["rows"] == 30
    # time travel: the pre-delete version is untouched
    assert snapshots.snapshot_read(spark, path, version=1).count() == 100


def test_dv_null_condition_rows_are_kept(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id long, v double"
    )
    snapshots.snapshot_commit(df, path)
    r = snapshots.snapshot_delete_where(spark, path, F.col("v") < 0, use_dv=True)
    assert r["deleted_rows"] == 1
    assert _ids(snapshots.snapshot_read(spark, path)) == [1, 2]


def test_dv_no_match_is_a_no_op_commit(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 10), path)
    r = snapshots.snapshot_delete_where(spark, path, F.col("id") > 99, use_dv=True)
    assert r == {"version": 1, "deleted_rows": 0}
    assert snapshots._versions(path) == [1]


def test_stacked_dv_deletes_record_each_row_exactly_once(spark, tmp_path):
    """A second DELETE whose predicate ALSO matches already-deleted
    rows must record only the newly-deleted ones — the change feed
    emits each deleted row exactly once across the table's history."""
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 100).repartition(4), path)
    snapshots.snapshot_delete_where(spark, path, F.col("id") < 30, use_dv=True)
    r2 = snapshots.snapshot_delete_where(spark, path, F.col("id") < 40, use_dv=True)
    assert r2["deleted_rows"] == 10
    assert _ids(snapshots.snapshot_read(spark, path)) == list(range(40, 100))
    ch = snapshots.snapshot_table_changes(spark, path, 0)
    dels = (
        ch.filter(F.col("_change_type") == "delete")
        .groupBy("_commit_version")
        .agg(F.count(F.lit(1)).alias("n"), F.collect_set("id").alias("ids"))
        .collect()
    )
    per_version = {r2_._commit_version: r2_ for r2_ in dels}
    assert per_version[2].n == 30 and sorted(per_version[2].ids) == list(range(30))
    assert per_version[3].n == 10 and sorted(per_version[3].ids) == list(
        range(30, 40)
    )
    # and the feed nets to the final state
    adds = ch.filter(F.col("_change_type") == "insert").select("id", "doubled")
    rems = ch.filter(F.col("_change_type") == "delete").select("id", "doubled")
    assert _ids(adds.exceptAll(rems)) == list(range(40, 100))


def test_append_after_dv_delete_inherits_the_vector(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 50), path)
    snapshots.snapshot_delete_where(spark, path, F.col("id") < 20, use_dv=True)
    snapshots.snapshot_commit(_df(spark, 100, 110), path)
    assert _ids(snapshots.snapshot_read(spark, path)) == list(range(20, 50)) + list(
        range(100, 110)
    )
    head = snapshots._read_manifest(path, 3)
    assert head["dv"]["rows"] == 20  # carried forward by the append


def test_dv_delete_after_append_can_hit_both_commits(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 10), path)
    snapshots.snapshot_commit(_df(spark, 10, 20), path)
    r = snapshots.snapshot_delete_where(
        spark, path, F.col("id").isin(3, 13), use_dv=True
    )
    assert r["deleted_rows"] == 2
    assert _ids(snapshots.snapshot_read(spark, path)) == [
        i for i in range(20) if i not in (3, 13)
    ]


def test_compact_materializes_the_vector(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 100).repartition(4), path)
    snapshots.snapshot_delete_where(spark, path, F.col("id") % 3 == 0, use_dv=True)
    want = [i for i in range(100) if i % 3 != 0]
    # low file count would normally skip compaction — a DV-bearing head
    # must compact anyway (materialization is the point)
    c = snapshots.snapshot_compact(spark, path, target_files=4)
    m = snapshots._read_manifest(path, c["version"])
    assert "dv" not in m
    assert _ids(snapshots.snapshot_read(spark, path)) == want
    # the compaction stays an empty change set: a CDF consumer already
    # saw the deletes at DV-commit time and sees nothing new here
    ch = snapshots.snapshot_table_changes(spark, path, 2)
    assert ch.count() == 0


def test_merge_upsert_on_dv_table_does_not_resurrect(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 10), path)
    snapshots.snapshot_delete_where(spark, path, F.col("id") < 5, use_dv=True)
    updates = spark.createDataFrame([(7, 700), (42, 84)], "id long, doubled long")
    res = snapshots.snapshot_merge_upsert(spark, path, updates, ["id"])
    assert (res["updated"], res["inserted"]) == (1, 1)
    rows = {
        r.id: r.doubled for r in snapshots.snapshot_read(spark, path).collect()
    }
    assert set(rows) == {5, 6, 7, 8, 9, 42}
    assert rows[7] == 700 and rows[42] == 84


def test_restore_to_dv_version_reapplies_it(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 20), path)  # v1
    snapshots.snapshot_delete_where(spark, path, F.col("id") < 5, use_dv=True)  # v2
    snapshots.snapshot_commit(_df(spark, 100, 105), path)  # v3
    v = snapshots.snapshot_restore(spark, path, 2)
    assert _ids(snapshots.snapshot_read(spark, path, version=v)) == list(range(5, 20))
    # the restore's recorded change set is exactly the undone append
    ch = snapshots.snapshot_table_changes(spark, path, 3, v)
    assert sorted(
        (r.id, r._change_type) for r in ch.collect()
    ) == [(i, "delete") for i in range(100, 105)]


def test_vacuum_keeps_live_dv_files_and_reclaims_dead_ones(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 30), path)  # v1
    snapshots.snapshot_delete_where(spark, path, F.col("id") < 10, use_dv=True)  # v2
    snapshots.snapshot_commit(_df(spark, 50, 55), path)  # v3 inherits DV
    # keep only the head: v2's DV dir must SURVIVE (the head's manifest
    # still references those files)
    snapshots.snapshot_vacuum(
        path, keep_versions=1, retain_seconds=0, min_version_age_seconds=0
    )
    assert _ids(snapshots.snapshot_read(spark, path)) == list(range(10, 30)) + list(
        range(50, 55)
    )
    # now materialize and vacuum again: no manifest references the DV
    # any more -> its directory is reclaimed
    snapshots.snapshot_compact(spark, path, target_files=1)
    snapshots.snapshot_vacuum(
        path, keep_versions=1, retain_seconds=0, min_version_age_seconds=0
    )
    assert os.listdir(os.path.join(path, "_dv")) == []


def test_dv_prune_where_skips_files_and_still_deletes(spark, tmp_path):
    path = str(tmp_path / "tbl")
    # four key-range files with recorded id stats
    for lo in (0, 25, 50, 75):
        snapshots.snapshot_commit(
            _df(spark, lo, lo + 25).coalesce(1), path, stats_cols=["id"]
        )
    r = snapshots.snapshot_delete_where(
        spark,
        path,
        F.col("id") < 10,
        use_dv=True,
        prune_where=[("id", "<", 10)],
    )
    assert r["deleted_rows"] == 10
    assert _ids(snapshots.snapshot_read(spark, path)) == list(range(10, 100))
    # the recorded DV names positions in ONE file only (the pruned scan
    # never touched the other three)
    dv = snapshots._read_manifest(path, r["version"])["dv"]
    dv_df = spark.read.parquet(
        *[os.path.join(path, f) for f in dv["files"]]
    )
    assert dv_df.select("_dv_file").distinct().count() == 1


def test_dv_prune_where_rejects_bad_op(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 10), path)
    with pytest.raises(ValueError, match="prune_where op"):
        snapshots.snapshot_delete_where(
            spark, path, F.col("id") < 5, use_dv=True, prune_where=[("id", "!=", 5)]
        )
    with pytest.raises(ValueError, match="use_dv=True"):
        snapshots.snapshot_delete_where(
            spark, path, F.col("id") < 5, prune_where=[("id", "<", 5)]
        )


def test_dv_read_with_where_composes_with_pruning(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for lo in (0, 50):
        snapshots.snapshot_commit(
            _df(spark, lo, lo + 50).coalesce(1), path, stats_cols=["id"]
        )
    snapshots.snapshot_delete_where(spark, path, F.col("id") % 2 == 0, use_dv=True)
    out = snapshots.snapshot_read(spark, path, where=[("id", "<", 50)])
    assert _ids(out) == [i for i in range(50) if i % 2 == 1]


def test_dv_on_schema_evolved_table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 10), path)
    snapshots.snapshot_commit(
        _df(spark, 10, 20).withColumn("extra", F.lit("x")),
        path,
        allow_schema_evolution=True,
    )
    r = snapshots.snapshot_delete_where(
        spark, path, F.col("id").isin(2, 12), use_dv=True
    )
    assert r["deleted_rows"] == 2
    got = snapshots.snapshot_read(spark, path)
    assert _ids(got) == [i for i in range(20) if i not in (2, 12)]
    # pre-evolution rows still surface the added column as NULL
    assert got.filter(F.col("id") == 3).first().extra is None


def test_dv_read_plan_broadcasts_small_vector(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 100), path)
    snapshots.snapshot_delete_where(spark, path, F.col("id") < 5, use_dv=True)
    plan = snapshots.snapshot_read(spark, path)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_dv_delete_concurrent_append_retries_on_new_head(spark, tmp_path):
    """A commit landing between the DV delete's scan and its publish
    must not be clobbered: the CAS loses, the RMW re-derives on the
    new head, and the appended rows survive (minus any that match)."""
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 20), path)

    from pubg_data_pipeline_spark.sources.commitproto import TxnLog

    calls = {"n": 0}
    orig = TxnLog.try_publish_version

    def racy(self, manifest, version, commit_id):
        if calls["n"] == 0 and manifest.get("op") == "delete":
            calls["n"] += 1
            # concurrent append sneaks in first (uses orig directly)
            snapshots.snapshot_commit(_df(spark, 100, 103), path)
        return orig(self, manifest, version, commit_id)

    TxnLog.try_publish_version = racy
    try:
        r = snapshots.snapshot_delete_where(
            spark, path, F.col("id") < 5, use_dv=True
        )
    finally:
        TxnLog.try_publish_version = orig
    assert r["deleted_rows"] == 5
    assert _ids(snapshots.snapshot_read(spark, path)) == list(range(5, 20)) + [
        100,
        101,
        102,
    ]


def test_dv_merge_upserts_without_rewriting(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 100).repartition(4), path)
    before_dirs = _data_commit_dirs(path)
    upd = spark.createDataFrame(
        [(7, 700), (42, 4200), (200, 400)], "id long, doubled long"
    )
    r = snapshots.snapshot_merge_upsert(spark, path, upd, ["id"], use_dv=True)
    assert (r["updated"], r["inserted"]) == (2, 1)
    rows = {x.id: x.doubled for x in snapshots.snapshot_read(spark, path).collect()}
    assert len(rows) == 101
    assert rows[7] == 700 and rows[42] == 4200 and rows[200] == 400
    assert rows[3] == 6  # untouched rows intact
    # exactly ONE new data dir (the update rows); parent files untouched
    after_dirs = _data_commit_dirs(path)
    assert len(after_dirs) == len(before_dirs) + 1
    assert set(before_dirs) <= set(after_dirs)
    m = snapshots._read_manifest(path, r["version"])
    assert m["op"] == "merge" and m["dv"]["rows"] == 2
    # time travel: pre-merge world intact
    pre = {
        x.id: x.doubled
        for x in snapshots.snapshot_read(spark, path, version=1).collect()
    }
    assert pre[7] == 14 and 200 not in pre


def test_dv_merge_change_feed_nets_to_state(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 20), path)
    upd = spark.createDataFrame([(3, 33), (30, 60)], "id long, doubled long")
    snapshots.snapshot_merge_upsert(spark, path, upd, ["id"], use_dv=True)
    ch = snapshots.snapshot_table_changes(spark, path, 0)
    tagged = sorted(
        (x.id, x._change_type)
        for x in ch.filter(F.col("_commit_version") == 2).collect()
    )
    assert tagged == [
        (3, "update_postimage"),
        (3, "update_preimage"),
        (30, "insert"),
    ]
    adds = ch.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).select("id", "doubled")
    rems = ch.filter(
        F.col("_change_type").isin("delete", "update_preimage")
    ).select("id", "doubled")
    assert sorted(
        (r2.id, r2.doubled) for r2 in adds.exceptAll(rems).collect()
    ) == sorted(
        (r2.id, r2.doubled)
        for r2 in snapshots.snapshot_read(spark, path).collect()
    )


def test_dv_merge_prunes_match_scan_by_key_range(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for lo in (0, 25, 50, 75):
        snapshots.snapshot_commit(
            _df(spark, lo, lo + 25).coalesce(1), path, stats_cols=["id"]
        )
    # all update keys land in the first file's range: the DV written by
    # the merge must reference positions in ONE file only
    upd = spark.createDataFrame([(3, 33), (11, 111)], "id long, doubled long")
    r = snapshots.snapshot_merge_upsert(spark, path, upd, ["id"], use_dv=True)
    assert (r["updated"], r["inserted"]) == (2, 0)
    dv = snapshots._read_manifest(path, r["version"])["dv"]
    dv_df = spark.read.parquet(*[os.path.join(path, f) for f in dv["files"]])
    assert dv_df.select("_dv_file").distinct().count() == 1
    rows = {x.id: x.doubled for x in snapshots.snapshot_read(spark, path).collect()}
    assert rows[3] == 33 and rows[11] == 111 and len(rows) == 100


def test_dv_merge_on_dv_deleted_table_does_not_resurrect(spark, tmp_path):
    """A key whose only table row is hidden by the DV counts as
    UNMATCHED: the merge re-inserts it (upsert semantics), it does not
    resurrect the deleted row or double-count."""
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 10), path)
    snapshots.snapshot_delete_where(spark, path, F.col("id") < 5, use_dv=True)
    upd = spark.createDataFrame([(2, 222), (7, 777)], "id long, doubled long")
    r = snapshots.snapshot_merge_upsert(spark, path, upd, ["id"], use_dv=True)
    assert (r["updated"], r["inserted"]) == (1, 1)
    rows = {x.id: x.doubled for x in snapshots.snapshot_read(spark, path).collect()}
    assert set(rows) == {2, 5, 6, 7, 8, 9}
    assert rows[2] == 222 and rows[7] == 777


def test_dv_merge_rejects_schema_drift(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 10), path)
    bad = spark.createDataFrame([(1, "x")], "id long, doubled string")
    with pytest.raises(ValueError, match="not the table schema"):
        snapshots.snapshot_merge_upsert(spark, path, bad, ["id"], use_dv=True)


def test_dv_merge_concurrent_append_retries(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshots.snapshot_commit(_df(spark, 0, 10), path)

    from pubg_data_pipeline_spark.sources.commitproto import TxnLog

    calls = {"n": 0}
    orig = TxnLog.try_publish_version

    def racy(self, manifest, version, commit_id):
        if calls["n"] == 0 and manifest.get("op") == "merge":
            calls["n"] += 1
            snapshots.snapshot_commit(_df(spark, 100, 103), path)
        return orig(self, manifest, version, commit_id)

    TxnLog.try_publish_version = racy
    try:
        upd = spark.createDataFrame([(3, 33), (101, 1)], "id long, doubled long")
        r = snapshots.snapshot_merge_upsert(spark, path, upd, ["id"], use_dv=True)
    finally:
        TxnLog.try_publish_version = orig
    # the retry re-derived on the new head: 101 now EXISTS -> updated,
    # and the concurrent append's other rows survive
    assert (r["updated"], r["inserted"]) == (2, 0)
    rows = {x.id: x.doubled for x in snapshots.snapshot_read(spark, path).collect()}
    assert rows[3] == 33 and rows[101] == 1 and rows[100] == 200 and rows[102] == 204


def test_streaming_cdf_rides_through_dv_delete(spark, tmp_path):
    """The snapshot_cdf stream serves a DV delete exactly like a
    rewrite delete: its recorded change files, rows tagged delete."""
    from pubg_data_pipeline_spark.sources import snapshot_cdf

    path = str(tmp_path / "tbl")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    snapshots.snapshot_commit(_df(spark, 0, 10), path)
    snapshots.snapshot_delete_where(spark, path, F.col("id") < 3, use_dv=True)
    snapshot_cdf.register(spark)
    q = (
        spark.readStream.format("snapshot_cdf")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.read.parquet(out_dir)
    dels = got.filter(F.col("_change_type") == "delete")
    assert sorted(r.id for r in dels.collect()) == [0, 1, 2]
    assert dels.select("_commit_version").distinct().first()[0] == 2
    net = got.filter(F.col("_change_type") == "insert").select(
        "id", "doubled"
    ).exceptAll(dels.select("id", "doubled"))
    assert _ids(net) == list(range(3, 10))
