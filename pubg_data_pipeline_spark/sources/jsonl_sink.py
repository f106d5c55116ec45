"""JSONL sink (Spark 4 Python DataSource WRITER): the write-side twin
of sources/rest_source.py's reader, completing the in-engine Python
DataSource surface (batch read + stream read there; batch write +
stream write here).

Why it exists: the reference delivers its final artifacts through
out-of-process Python daemons — the alert manager serializes alert
dicts to JSON lines for Slack/SMTP delivery (reference
monitoring/alert_manager.py) and the collectors hand-append records to
files/InfluxDB row-by-row with no atomicity. This sink keeps that
"rows out as JSON lines" contract but runs it as Spark-managed write
tasks with a real two-phase commit, so a crashed job can never leave a
half-written delivery directory that a downstream notifier partially
sends.

Commit protocol (the part worth copying): each task writes its rows to
``<path>/.tmp-<uuid>.jsonl`` and returns the name in its commit
message; the DRIVER's ``commit`` renames every tmp file to
``part-<job>-....jsonl`` only after all tasks succeeded, and ``abort``
deletes the orphans. Readers that list ``*.jsonl`` therefore see a
task's output all-or-nothing — the same tmp-then-rename discipline as
the engine's state swaps (streaming/app.py) and index builds
(plans/base.ensure_index_cache). Final names carry a job-unique token,
so append-mode jobs accumulate (no deterministic-name clobbering);
overwrite mode sweeps all previously published files inside the same
commit. The streaming writer sweeps-then-republishes its epoch's
``batch-<id>-`` files, so a replayed foreachBatch epoch converges even
if the replay plans a different partition count than the crashed
attempt.

Scale: one file per task partition, no driver data movement —
``commit`` touches only O(tasks) renames. Coalesce upstream if small
files matter; the sink deliberately does not merge.

Filesystem contract: tasks write tmp files with plain ``os`` calls on
the EXECUTORS and the driver commits with ``os.replace`` — the path
must therefore be a filesystem shared between driver and executors
(single machine, or NFS-style mount). Remote ``scheme://`` URIs are
rejected up front (same guard as backfill_stale_partitions /
propagate_deletes); on an object store use a lake format's
transactional sinks instead.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


def _require_local_path(path: str) -> str:
    # Driver-side, raised at writer construction BEFORE any task runs:
    # the two-phase commit renames executor-written tmp files from the
    # driver, which only works on a driver/executor-shared local
    # filesystem — on a real cluster with per-node disks commit() would
    # fail and abort() could not reach executor-local tmps.
    from pubg_data_pipeline_spark.sources.commitproto import require_local_path

    return require_local_path(
        path,
        "jsonl_rows (driver/executor-shared local-filesystem two-phase commit)",
        "use a lake format's transactional sink on object stores.",
    )


class _FileCommit(WriterCommitMessage):
    def __init__(self, tmp_name: str, n_rows: int):
        self.tmp_name = tmp_name
        self.n_rows = n_rows


def _write_partition(path: str, iterator) -> _FileCommit:
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".tmp-{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(tmp, "w", encoding="utf-8") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(recursive=True), default=str, sort_keys=True))
            f.write("\n")
            n += 1
    return _FileCommit(os.path.basename(tmp), n)


def _publish(path: str, messages, prefix: str) -> None:
    for i, m in enumerate(messages):
        src = os.path.join(path, m.tmp_name)
        dst = os.path.join(path, f"{prefix}part-{i:05d}.jsonl")
        os.replace(src, dst)


def _discard(path: str, messages) -> None:
    for m in messages:
        if m is None:
            continue
        try:
            os.remove(os.path.join(path, m.tmp_name))
        except FileNotFoundError:
            pass


def _published_files(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return [
        e
        for e in os.listdir(path)
        if e.endswith(".jsonl") and not e.startswith(".tmp-")
    ]


class JsonlBatchWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = _require_local_path(options["path"])
        self.overwrite = overwrite
        # job-unique token in the FINAL names: append-mode jobs to the
        # same directory accumulate instead of silently clobbering a
        # previous job's part-00000 (and a job with fewer partitions
        # can't leave a stale mix of old high-indexed files)
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        return _write_partition(self.path, iterator)

    def commit(self, messages):
        # PUBLISH FIRST, then truncate: a crash anywhere in this method
        # leaves either the old output intact (before any rename) or a
        # transient old+new union (mid-truncate) — never an emptied
        # delivery directory, which remove-first ordering would risk.
        prefix = f"part-{self.job_id}-"
        _publish(self.path, messages, prefix=prefix)
        if self.overwrite:
            for entry in _published_files(self.path):
                if not entry.startswith(prefix):
                    os.remove(os.path.join(self.path, entry))

    def abort(self, messages):
        _discard(self.path, messages)


class JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options, overwrite: bool):
        self.path = _require_local_path(options["path"])
        self.overwrite = overwrite

    def write(self, iterator):
        return _write_partition(self.path, iterator)

    def commit(self, messages, batchId):
        # os.replace onto the SAME final names keeps a replayed epoch
        # atomic per file (a reader never sees a committed file vanish);
        # a replay that plans FEWER partitions then sweeps only the
        # crashed attempt's higher-indexed leftovers. Complete-output
        # streams (overwrite=True) additionally retire every OLDER
        # epoch's files after publishing — snapshot semantics, with the
        # same publish-first crash ordering as the batch writer.
        prefix = f"batch-{batchId:08d}-"
        _publish(self.path, messages, prefix=prefix)
        for entry in _published_files(self.path):
            full = os.path.join(self.path, entry)
            if entry.startswith(prefix):
                # leftover indices beyond this attempt's partition count
                idx = entry[len(prefix) + len("part-"):].split(".")[0]
                if idx.isdigit() and int(idx) >= len(messages):
                    os.remove(full)
            elif self.overwrite:
                os.remove(full)

    def abort(self, messages, batchId):
        _discard(self.path, messages)


class JsonlSink(DataSource):
    """Register with ``spark.dataSource.register(JsonlSink)``, then
    ``df.write.format("jsonl_rows").mode("append").option("path", p)``
    or ``df.writeStream.format("jsonl_rows")...``."""

    @classmethod
    def name(cls):
        return "jsonl_rows"

    def writer(self, schema, overwrite):
        return JsonlBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite):
        return JsonlStreamWriter(self.options, overwrite)
