"""Warehouse residue sweep (sources/io.py:warehouse_fsck) — pure
filesystem diagnostics for the engine's tmp-then-rename protocols."""

from __future__ import annotations

import os

from pubg_data_pipeline_spark.sources.io import warehouse_fsck


def _mk(tmp_path, rel, is_dir=False, content=""):
    full = tmp_path / rel
    if is_dir:
        full.mkdir(parents=True, exist_ok=True)
    else:
        full.parent.mkdir(parents=True, exist_ok=True)
        full.write_text(content)
    return str(full)


def test_fsck_classifies_each_residue_kind(tmp_path):
    _mk(tmp_path, "clean_table/_SUCCESS")
    _mk(tmp_path, "clean_table/part-0.parquet", content="x")
    tmp_orphan = _mk(tmp_path, "alerts/.tmp-abc123.jsonl", content="{}")
    state_tmp = _mk(tmp_path, "state/index.json.tmp", content="{}")
    aside = _mk(tmp_path, "rollup.old", is_dir=True)
    uncommitted = str(tmp_path / "dead_write")
    _mk(tmp_path, "dead_write/part-0.parquet", content="x")
    empty_part = _mk(tmp_path, "table2/day=2024-01-01", is_dir=True)
    _mk(tmp_path, "table2/_SUCCESS")

    by_kind = {}
    for f in warehouse_fsck(str(tmp_path)):
        by_kind.setdefault(f["kind"], set()).add(f["path"])

    assert tmp_orphan in by_kind["tmp_orphan"]
    assert state_tmp in by_kind["tmp_orphan"]
    assert aside in by_kind["aside_orphan"]
    assert uncommitted in by_kind["uncommitted_parquet"]
    assert empty_part in by_kind["empty_partition_dir"]
    # the healthy committed table is NOT flagged
    flagged = {p for s in by_kind.values() for p in s}
    assert not any("clean_table" in p for p in flagged)


def test_fsck_clean_tree_is_silent_and_cap_respected(tmp_path):
    _mk(tmp_path, "t/_SUCCESS")
    _mk(tmp_path, "t/part-0.parquet", content="x")
    assert warehouse_fsck(str(tmp_path)) == []
    for i in range(20):
        _mk(tmp_path, f"junk/.tmp-{i}.jsonl", content="{}")
    assert len(warehouse_fsck(str(tmp_path), max_findings=5)) == 5


def test_fsck_catches_every_engine_tmp_spelling(tmp_path):
    """The protocols' actual spellings: epoch publishes, compactions,
    the compact_parquet swap — plus no descent into flagged residue."""
    spellings = [
        "state.json.tmp-42",        # epoch publish (streaming/app.py)
        "grams.tmp-compact",        # state compaction
        "daily.compact-tmp",        # compact_parquet swap dir
        "manifest.json.tmp",        # tmp-then-rename manifest
        ".tmp-deadbeef.jsonl",      # jsonl sink task file
    ]
    for s in spellings:
        _mk(tmp_path, f"w/{s}", content="x")
    big_old = tmp_path / "w" / "rollup.old" / "day=2024-01-01"
    big_old.mkdir(parents=True)
    (tmp_path / "w" / "rollup.old" / "part-0.parquet").write_text("x")

    found = warehouse_fsck(str(tmp_path / "w"))
    tmp_hits = {os.path.basename(f["path"]) for f in found if f["kind"] == "tmp_orphan"}
    assert tmp_hits == set(spellings)
    # the .old tree is ONE aside finding — interior residue not re-reported
    kinds = [f["kind"] for f in found]
    assert kinds.count("aside_orphan") == 1
    assert "uncommitted_parquet" not in kinds
    assert "empty_partition_dir" not in kinds


def test_fsck_flags_dead_partitioned_write(tmp_path):
    _mk(tmp_path, "ptable/day=2024-01-01/part-0.parquet", content="x")
    found = warehouse_fsck(str(tmp_path))
    assert {f["kind"] for f in found} == {"uncommitted_parquet"}
    assert found[0]["path"].endswith("ptable")
    # committed twin is silent
    _mk(tmp_path, "ptable/_SUCCESS")
    assert warehouse_fsck(str(tmp_path)) == []
