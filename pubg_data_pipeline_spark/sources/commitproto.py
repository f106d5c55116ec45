"""The shared commit protocol behind every storage-maintenance write.

Four subsystems publish state the same way — write a tmp file, fsync,
atomically install, sweep what the new state obsoletes:

- snapshot manifests (:mod:`sources.snapshots`): create-only slot
  publish via ``os.link`` (losing a version race is detected, not
  clobbered);
- the backfill manifest (:func:`sources.io.backfill_stale_partitions`):
  last-writer-wins publish via ``os.replace``;
- partition sweeps (:func:`sources.io.propagate_deletes`,
  ``expire_partitions``, backfill's doomed-partition prune): remove
  ``col=value`` directories matched against the ACTUAL on-disk
  Hive-escaped names;
- the JSONL sink's two-phase commit (:mod:`sources.jsonl_sink`):
  tmp-per-task, driver-side rename publish.

This module is the ONE place those disciplines live, so a lake-format
backend (Delta/Iceberg MERGE, conditional PUT, catalog commit) replaces
this module — not four hand-rolled protocols. Everything here is plain
local-filesystem code by design; :func:`require_local_path` is the
shared fail-loud gate every caller runs first.

(Reference contrast: the reference appends to HDFS with no commit
protocol at all — a crashed job leaves partial files readers serve;
spark_apps/pubg_streaming.py's parquet sink.)
"""

from __future__ import annotations

import json
import os
import shutil
from urllib.parse import unquote


def require_local_path(path: str, op: str, hint: str) -> str:
    """Fail-loud gate for every local-filesystem commit protocol: the
    tmp-then-rename/link disciplines below are only atomic on a real
    (driver-and-executor-shared) local filesystem, so a ``scheme://``
    URI must be rejected BEFORE any state is written. ``op`` names the
    caller, ``hint`` says what to use instead on an object store."""
    if "://" in path:
        raise ValueError(f"{op} uses local-filesystem atomic commits; got remote URI {path!r} — {hint}")
    return path


def _write_tmp_json(tmp: str, doc: dict) -> None:
    os.makedirs(os.path.dirname(tmp) or ".", exist_ok=True)
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(doc, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())


def publish_json(doc: dict, final_path: str) -> None:
    """Last-writer-wins atomic JSON publish: write ``<final>.tmp``,
    fsync, ``os.replace`` onto the final name. A reader sees the old
    document or the new one, never a torn write; a crash leaves at
    worst a ``.tmp`` orphan (warehouse_fsck's ``tmp_orphan`` class)."""
    tmp = final_path + ".tmp"
    _write_tmp_json(tmp, doc)
    os.replace(tmp, final_path)


def publish_json_slot(doc: dict, final_path: str, tmp_path: str) -> bool:
    """Create-only atomic JSON publish for optimistic-concurrency
    slots: ``os.link(tmp, final)`` is atomic AND fails with EEXIST if
    another writer took the slot first — the loser learns it lost
    (returns False) instead of clobbering, which is the property
    ``os.replace`` cannot give. The tmp file is always cleaned up;
    ``tmp_path`` must be writer-unique (e.g. carry a commit id)."""
    _write_tmp_json(tmp_path, doc)
    try:
        os.link(tmp_path, final_path)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp_path)


def partition_dirs(table_path: str, partition_col: str) -> dict[str, str]:
    """Map of Hive-UNESCAPED partition value -> directory path for one
    level of ``col=value`` layout. Matching on-disk names through
    ``unquote`` is load-bearing: Spark percent-encodes special chars
    (':' -> '%3A') in partition paths, so building names from raw
    values would silently miss exactly the directories being managed."""
    prefix = f"{partition_col}="
    out: dict[str, str] = {}
    if os.path.isdir(table_path):
        for entry in os.listdir(table_path):
            full = os.path.join(table_path, entry)
            if os.path.isdir(full) and entry.startswith(prefix):
                out[unquote(entry[len(prefix):])] = full
    return out


def sweep_partition_dirs(
    table_path: str, partition_col: str, doomed: set[str]
) -> list[str]:
    """Remove the ``col=value`` directories whose unescaped value is in
    ``doomed``; returns the values actually removed. The sweep half of
    every dynamic-overwrite protocol: a partition whose recompute
    produced zero rows writes nothing, so its stale directory must be
    removed explicitly or readers serve pre-delete data forever."""
    removed = []
    for value, full in partition_dirs(table_path, partition_col).items():
        if value in doomed:
            shutil.rmtree(full)
            removed.append(value)
    return sorted(removed)
