"""Manifest-committed parquet tables: atomic commits, time travel,
reader isolation, vacuum — the minimal slice of a modern table format
(Delta/Iceberg-style) built on plain parquet + JSON manifests.

Why it exists: the reference appends bare parquet directories forever
(reference: spark_apps/pubg_streaming.py:236-244, layout
docker-compose.yml:137-148), so a reader that lists files mid-write
sees half a commit, there is no way to retract a bad batch, and
nothing records table history. At 100 TB the fix is a metadata layer,
not bigger directories: data files are immutable and INVISIBLE until a
manifest references them, commits are one atomic manifest publish, and
readers pin a version for the lifetime of a query.

Layout::

    <path>/data/<commit-uuid>/part-*.parquet   immutable data files
    <path>/_manifests/v{N:012d}.json           one JSON per version

Commit protocol (optimistic concurrency):

1. write the DataFrame to a fresh ``data/<uuid>/`` directory — crash
   here strands invisible files (vacuum reclaims them), never corrupts
   the table;
2. compose the new file list (parent's files + new for ``append``,
   new only for ``overwrite``);
3. publish ``v{parent+1}.json`` via write-temp + fsync +
   ``os.link(tmp, final)``: the hard link is atomic AND fails with
   EEXIST if a concurrent writer won the version — the loser re-reads
   the new head and retries on top of it. (On an object store the
   same slot is a conditional PUT / putIfAbsent; local-fs guard below
   mirrors expire_partitions.)

Readers never list ``data/``: they load exactly the files named by one
manifest, so a query planned against version N is immune to later
commits (snapshot isolation) and ``version=`` gives time travel.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_COMMIT_RETRIES = 20


def _require_local(path: str) -> None:
    from pubg_data_pipeline_spark.sources.commitproto import require_local_path

    require_local_path(
        path,
        "snapshot tables",
        "on an object store publish the manifest with a conditional PUT instead.",
    )


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _log(path: str):
    """The table's manifest log IS the shared transactional-log
    backend (commitproto.TxnLog): same v{N:012d}.json layout, same CAS
    slot publish — snapshots was the prototype of that protocol and
    now runs on the one shared implementation."""
    from pubg_data_pipeline_spark.sources.commitproto import TxnLog

    return TxnLog(_manifest_dir(path), retries=_COMMIT_RETRIES)


def _versions(path: str) -> list[int]:
    return _log(path).versions()


def _read_manifest(path: str, version: int) -> dict:
    return _log(path).read(version)


def _list_part_files(data_dir: str) -> list[str]:
    return sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def last_committed_txn(path: str, app_id: str) -> int | None:
    """Highest ``txn_version`` any live manifest records for ``app_id``
    (the Delta txnAppId/txnVersion idempotency protocol): a retried
    micro-batch asks this before writing and skips epochs the table has
    already absorbed. Scans manifests newest-first and RETURNS ON THE
    FIRST HIT — per-app txn versions only move forward (the Delta
    setTransaction contract: latest entry wins), so the newest manifest
    recording the app holds its latest version, and the common case
    (epoch just committed, sink retrying) reads one small JSON instead
    of the table's whole manifest history (O(n) -> O(1) per commit;
    the scan-everything form made a minute-cadence stream's commit
    latency grow without bound)."""
    for v in reversed(_versions(path)):
        txn = _read_manifest(path, v).get("txn")
        if txn and txn.get("app_id") == app_id:
            return txn["version"]
    return None


def _schema_fields(schema_json: str) -> dict[str, str]:
    """name -> canonical-type map from a StructType JSON, IGNORING
    nullability (Spark flips nullable flags freely across identical
    writes; nullability is not a schema contract here)."""
    import json as _json

    doc = _json.loads(schema_json)
    return {
        f["name"]: _json.dumps(f["type"], sort_keys=True) for f in doc["fields"]
    }


def _schema_compat(parent_json: str, new_json: str) -> str:
    """'same' | 'additive' (new nullable columns only) |
    'incompatible' (dropped columns or changed types — silent data
    corruption for readers of the mixed file list)."""
    parent, new = _schema_fields(parent_json), _schema_fields(new_json)
    for name, typ in parent.items():
        if name not in new or new[name] != typ:
            return "incompatible"
    return "additive" if len(new) > len(parent) else "same"


class CommitConflict(RuntimeError):
    """A commit pinned to ``expected_parent`` found the table head
    moved — the serializable-conflict signal for read-modify-write
    callers (delete/compact): re-read the new head and redo the
    transformation; blindly rebasing would clobber the concurrent
    commit's rows (lost update)."""


def snapshot_commit(
    df: DataFrame,
    path: str,
    mode: str = "append",
    txn: tuple[str, int] | None = None,
    expected_parent: int | None = None,
    allow_schema_evolution: bool = False,
) -> int:
    """Commit ``df`` as a new table version and return its number.

    ``append`` keeps the parent version's files, ``overwrite`` replaces
    them (logically — old files stay on disk for time travel until
    ``snapshot_vacuum``). Safe under concurrent committers: losing the
    version race re-reads the head and retries (data files are written
    once, outside the retry loop).

    ``txn=(app_id, version)`` makes the commit IDEMPOTENT for
    at-least-once callers (foreachBatch epochs): if the table already
    holds a commit from ``app_id`` at ``version`` or later, nothing is
    written and the current head version is returned — so a replayed
    micro-batch cannot double-append (the failure mode ADVICE.md r3
    flagged for non-transactional dual writes). The check runs again
    inside the publish loop, closing the race where two retries of the
    same epoch interleave.

    ``expected_parent`` pins the commit to a specific parent version
    (serializable read-modify-write): if any other commit lands first,
    :class:`CommitConflict` is raised instead of rebasing — an append
    can rebase safely (its rows are independent), but a commit DERIVED
    from version N (delete, compaction) must not silently clobber
    N+1's rows. The loser's already-written data directory is stranded
    invisible and reclaimed by ``snapshot_vacuum``, same as any
    crashed commit.

    Schema enforcement (the Delta default): every manifest records its
    commit's schema; an APPEND whose schema drops a column or changes
    a type is rejected outright (readers of the mixed file list would
    silently corrupt), and one that only ADDS columns is rejected
    unless ``allow_schema_evolution=True`` — then the manifest is
    flagged ``evolved`` (inherited by descendants) and
    ``snapshot_read`` turns on ``mergeSchema`` for exactly those
    tables, so old files surface the new columns as NULLs without
    every healthy table paying the all-footers merge cost. Overwrites
    replace the schema freely and reset the flag. Nullability is not
    part of the contract (Spark flips it across identical writes);
    pre-schema manifests (older tables) skip enforcement until their
    next commit records one."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    _require_local(path)
    if txn is not None:
        done = last_committed_txn(path, txn[0])
        if done is not None and done >= txn[1]:
            versions = _versions(path)
            return versions[-1] if versions else 0
    commit_id = uuid.uuid4().hex
    new_schema = df.schema.json()
    data_dir = os.path.join(path, "data", commit_id)
    df.write.mode("error").parquet(data_dir)
    new_files = [
        os.path.relpath(p, path) for p in _list_part_files(data_dir)
    ]

    mdir = _manifest_dir(path)
    os.makedirs(mdir, exist_ok=True)
    for _ in range(_COMMIT_RETRIES):
        versions = _versions(path)
        if txn is not None:
            done = last_committed_txn(path, txn[0])
            if done is not None and done >= txn[1]:
                return versions[-1] if versions else 0
        parent = versions[-1] if versions else 0
        if expected_parent is not None and parent != expected_parent:
            raise CommitConflict(
                f"snapshot_commit at {path!r}: head moved to v{parent} while "
                f"this read-modify-write was derived from v{expected_parent} "
                "— re-read and retry the transformation."
            )
        files = list(new_files)
        evolved = False
        if mode == "append" and parent:
            pm = _read_manifest(path, parent)
            files = pm["files"] + files
            evolved = bool(pm.get("evolved"))
            if "schema" in pm:
                compat = _schema_compat(pm["schema"], new_schema)
                if compat == "incompatible":
                    raise ValueError(
                        f"snapshot_commit append at {path!r}: schema drops a "
                        "column or changes a type vs the table head — readers "
                        "of the mixed file list would silently corrupt. "
                        "Overwrite explicitly if the schema really changed."
                    )
                if compat == "additive":
                    if not allow_schema_evolution:
                        raise ValueError(
                            f"snapshot_commit append at {path!r}: schema adds "
                            "columns vs the table head — pass "
                            "allow_schema_evolution=True to accept (readers "
                            "will see NULLs for old files)."
                        )
                    evolved = True
        version = parent + 1
        manifest = {
            "version": version,
            "parent": parent,
            "op": mode,
            "commit_id": commit_id,
            "n_files": len(files),
            "files": files,
            "schema": new_schema,
            "evolved": evolved,
        }
        if txn is not None:
            manifest["txn"] = {"app_id": txn[0], "version": txn[1]}
        if _log(path).try_publish_version(manifest, version, commit_id):
            return version
        continue  # a concurrent commit took this slot — rebase
    raise RuntimeError(
        f"snapshot_commit lost the version race {_COMMIT_RETRIES} times at "
        f"{path!r} — contention this hot needs a coordinating commit service."
    )


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read one table version (latest by default). The plan references
    exactly the manifest's files, so concurrent commits — including
    overwrites — cannot change or tear this query's input."""
    _require_local(path)
    versions = _versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshot commits at {path!r}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise ValueError(
            f"version {version} not found at {path!r} (have {versions})"
        )
    meta = _read_manifest(path, version)
    files = meta["files"]
    if not files:
        # an overwrite with an empty DataFrame: preserve its schema via
        # the commit's (empty) data directory
        return spark.read.parquet(os.path.join(path, "data", meta["commit_id"]))
    reader = spark.read
    if meta.get("evolved"):
        # schema-evolved lineage: union all footers so pre-evolution
        # files surface the added columns as NULLs. Only these tables
        # pay the merge cost — a healthy table reads one footer.
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*[os.path.join(path, f) for f in files])


def snapshot_changes(
    spark: SparkSession, path: str, since_version: int, to_version: int | None = None
) -> DataFrame:
    """Incremental read: rows ADDED between ``since_version``
    (exclusive) and ``to_version`` (inclusive, default head) — the
    append-only slice of a change-data-feed. An incremental consumer
    (rollup refresh, downstream sync) processes O(new data) instead of
    re-reading the table.

    Data files are immutable, so the delta is exactly the manifest
    file-list difference. If any commit in the range is an
    ``overwrite``, added-files no longer mean added-rows (rows also
    vanished) and this raises rather than silently under-reporting the
    change set."""
    _require_local(path)
    versions = _versions(path)
    if since_version not in versions:
        raise ValueError(f"version {since_version} not found at {path!r}")
    if to_version is None:
        to_version = versions[-1]
    elif to_version not in versions:
        raise ValueError(f"version {to_version} not found at {path!r}")
    if to_version < since_version:
        raise ValueError(f"to_version {to_version} < since_version {since_version}")
    for v in versions:
        if since_version < v <= to_version and _read_manifest(path, v)["op"] != "append":
            raise ValueError(
                f"version {v} is an overwrite: the {since_version}->{to_version} "
                "delta is not append-only — re-read the full snapshot instead."
            )
    before = set(_read_manifest(path, since_version)["files"])
    after = _read_manifest(path, to_version)["files"]
    added = [f for f in after if f not in before]
    if not added:
        # zero-delta: preserve schema via the base version's read
        return snapshot_read(spark, path, since_version).limit(0)
    return spark.read.parquet(*[os.path.join(path, f) for f in added])


def snapshot_history(path: str) -> list[dict]:
    """All manifests oldest-first, file lists elided to counts."""
    out = []
    for v in _versions(path):
        m = _read_manifest(path, v)
        out.append({k: m[k] for k in ("version", "parent", "op", "n_files")})
    return out


def snapshot_merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    max_retries: int = 5,
) -> dict:
    """``MERGE INTO table USING updates ON keys`` (upsert form: matched
    rows replaced by the update, unmatched updates inserted) with the
    same serializable read-modify-write protocol as
    :func:`snapshot_delete_where` — pinned to the head it read,
    :class:`CommitConflict` retries the whole merge, so a concurrent
    append can never be silently clobbered. ``updates`` must be
    key-unique (enforced — a multi-match MERGE is nondeterministic and
    every real MERGE implementation rejects it) and schema-compatible
    with the table. Returns ``{"version", "updated", "inserted"}``.

    Plan shape: one left_anti join on the keys (survivors) + one union
    — the keys side is ``updates``, typically small enough that AQE
    broadcasts it; the table side is scanned once. On a lake format
    this is file-pruned MERGE; here the whole head is rewritten (the
    snapshot layer tracks files per COMMIT, not per key range)."""
    from pyspark.sql import functions as F

    _require_local(path)
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    dup = (
        updates.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            "snapshot_merge_upsert: updates contain duplicate keys — a "
            "multi-match MERGE is nondeterministic; dedupe updates first "
            "(e.g. latest-wins by a version column)."
        )
    updates = updates.localCheckpoint()  # one plan, stable across retries
    n_updates = updates.count()
    for _ in range(max_retries):
        versions = _versions(path)
        if not versions:
            raise FileNotFoundError(f"no snapshot commits at {path!r}")
        head = versions[-1]
        current = snapshot_read(spark, path, version=head)
        if set(current.columns) != set(updates.columns):
            raise ValueError(
                f"snapshot_merge_upsert: updates columns {sorted(updates.columns)} "
                f"!= table columns {sorted(current.columns)}"
            )
        survivors = current.join(updates.select(*key_cols), key_cols, "left_anti")
        n_survivors = survivors.count()
        n_current = current.count()
        merged = survivors.select(*current.columns).unionByName(
            updates.select(*current.columns)
        )
        try:
            v = snapshot_commit(merged, path, mode="overwrite", expected_parent=head)
        except CommitConflict:
            continue
        updated = n_current - n_survivors
        return {"version": v, "updated": updated, "inserted": n_updates - updated}
    raise RuntimeError(
        f"snapshot_merge_upsert lost the read-modify-write race "
        f"{max_retries} times at {path!r}."
    )


def snapshot_restore(spark: SparkSession, path: str, version: int) -> int:
    """RESTORE TABLE to an earlier version — as a NEW commit whose file
    list is the old version's (Delta RESTORE semantics): history is
    never rewritten, the bad commits stay inspectable, and the restore
    itself is one manifest publish (no data is copied — the old files
    are immutable and still on disk unless vacuumed past). Returns the
    new head version. Rebasing is safe here only because the caller
    explicitly chose to discard later versions' content; concurrent
    committers still CAS normally."""
    _require_local(path)
    versions = _versions(path)
    if version not in versions:
        raise ValueError(f"version {version} not found at {path!r} (have {versions})")
    src = _read_manifest(path, version)
    commit_id = uuid.uuid4().hex
    log = _log(path)
    for _ in range(_COMMIT_RETRIES):
        head = _versions(path)[-1]
        manifest = {
            "version": head + 1,
            "parent": head,
            "op": "restore",
            "restored_from": version,
            "commit_id": src["commit_id"],
            "n_files": src["n_files"],
            "files": src["files"],
        }
        if "schema" in src:
            manifest["schema"] = src["schema"]
        if "evolved" in src:
            manifest["evolved"] = src["evolved"]
        if log.try_publish_version(manifest, head + 1, commit_id):
            return head + 1
    raise RuntimeError(
        f"snapshot_restore lost the version race {_COMMIT_RETRIES} times at {path!r}."
    )


def snapshot_vacuum(
    path: str, keep_versions: int = 1, retain_seconds: float = 3600.0
) -> list[str]:
    """Physically delete data no retained version references: keeps the
    newest ``keep_versions`` manifests, removes older manifests and any
    ``data/<commit>/`` directory none of the keepers cite (stranded
    crash debris included). Returns removed paths. Callers give up time
    travel past the retention horizon — same contract as Delta VACUUM —
    and idempotent-sink users must keep retention LONGER than their
    source's replay horizon: the ``txn`` dedup records live in the
    manifests, so vacuuming past them would let an ancient replayed
    epoch re-append.

    ``retain_seconds`` is the concurrent-writer guard (Delta VACUUM's
    file-age threshold): an unreferenced ``data/<commit>/`` directory
    younger than it is left alone, because an IN-FLIGHT
    ``snapshot_commit`` writes its data directory BEFORE publishing the
    manifest that references it — deleting the young directory would
    corrupt the about-to-publish version. Set 0 only when no writer can
    be active (tests, offline maintenance)."""
    _require_local(path)
    import shutil
    import time

    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    versions = _versions(path)
    keep = set(versions[-keep_versions:])
    live_commits = set()
    for v in keep:
        m = _read_manifest(path, v)
        live_commits.add(m["commit_id"])
        for f in m["files"]:
            # files may come from ancestor commits still referenced
            live_commits.add(f.split(os.sep)[1])
    removed = []
    log = _log(path)
    for v in versions:
        if v not in keep:
            removed.append(log.remove(v))
    data_root = os.path.join(path, "data")
    now = time.time()
    if os.path.isdir(data_root):
        for entry in sorted(os.listdir(data_root)):
            if entry not in live_commits:
                full = os.path.join(data_root, entry)
                if now - os.path.getmtime(full) < retain_seconds:
                    continue  # possibly an in-flight commit's data
                shutil.rmtree(full)
                removed.append(full)
    return removed


def snapshot_delete_where(
    spark: SparkSession, path: str, condition, max_retries: int = 5
) -> dict:
    """``DELETE FROM table WHERE condition`` with snapshot-table
    semantics: read the head version, keep the survivors, commit them
    as an overwrite PINNED to that head (``expected_parent``) — a
    concurrent commit raises :class:`CommitConflict` and the whole
    read-modify-write retries on the new head, so a concurrent
    append's rows can never be silently lost (the write-skew hazard
    every naive read-then-overwrite has). SQL DELETE semantics for
    NULLs: a row whose condition evaluates NULL is KEPT (only
    condition=TRUE deletes), spelled explicitly because a bare
    ``filter(~cond)`` would drop NULL-condition rows too.

    Old files stay readable for time travel until ``snapshot_vacuum``
    (and the ``txn`` dedup history is untouched — deletes don't replay
    epochs). Returns ``{"version", "deleted_rows"}``."""
    from pyspark.sql import functions as F

    _require_local(path)
    for _ in range(max_retries):
        versions = _versions(path)
        if not versions:
            raise FileNotFoundError(f"no snapshot commits at {path!r}")
        head = versions[-1]
        df = snapshot_read(spark, path, version=head)
        kept = df.filter(~F.coalesce(condition, F.lit(False)))
        deleted = df.count() - kept.count()
        if deleted == 0:
            return {"version": head, "deleted_rows": 0}  # no-op, no commit
        try:
            v = snapshot_commit(kept, path, mode="overwrite", expected_parent=head)
            return {"version": v, "deleted_rows": deleted}
        except CommitConflict:
            continue  # head moved: re-read, re-derive, re-commit
    raise RuntimeError(
        f"snapshot_delete_where lost the read-modify-write race "
        f"{max_retries} times at {path!r}."
    )


def snapshot_compact(
    spark: SparkSession,
    path: str,
    target_files: int = 8,
    max_retries: int = 5,
    sort_within_by: list[str] | None = None,
) -> dict:
    """OPTIMIZE for snapshot tables: rewrite the head version's file
    list into ``target_files`` files as one overwrite commit — rows
    identical, file count bounded (a minute-cadence streaming sink
    accretes one file per micro-batch; at 100 TB the footer reads
    dominate scan setup). Same serializable read-modify-write protocol
    as :func:`snapshot_delete_where`: pinned to the head it read,
    conflict = re-read and retry, so compaction can never swallow a
    concurrent append. Readers are never disturbed — the old files
    remain until ``snapshot_vacuum``, and a reader planned against the
    pre-compaction version keeps serving it. ``sort_within_by``
    additionally range-partitions + sorts on those columns (OPTIMIZE's
    clustering half): a streaming sink's arrival-ordered files have
    useless min-max stats, and re-clustering restores file skipping on
    the sort columns. Returns ``{"version", "files_before",
    "files_after"}``."""
    _require_local(path)
    if target_files < 1:
        raise ValueError("target_files must be >= 1")
    for _ in range(max_retries):
        versions = _versions(path)
        if not versions:
            raise FileNotFoundError(f"no snapshot commits at {path!r}")
        head = versions[-1]
        files_before = _read_manifest(path, head)["n_files"]
        if files_before <= target_files:
            return {
                "version": head,
                "files_before": files_before,
                "files_after": files_before,
            }
        df = snapshot_read(spark, path, version=head)
        if sort_within_by:
            df = df.repartitionByRange(target_files, *sort_within_by)
            df = df.sortWithinPartitions(*sort_within_by)
        else:
            df = df.repartition(target_files)
        try:
            v = snapshot_commit(df, path, mode="overwrite", expected_parent=head)
        except CommitConflict:
            continue
        return {
            "version": v,
            "files_before": files_before,
            "files_after": _read_manifest(path, v)["n_files"],
        }
    raise RuntimeError(
        f"snapshot_compact lost the read-modify-write race "
        f"{max_retries} times at {path!r}."
    )
