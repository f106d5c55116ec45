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
