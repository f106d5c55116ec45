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


def _remove_matching(path: str, prefix: str) -> None:
    if not os.path.isdir(path):
        return
    for entry in os.listdir(path):
        if entry.startswith(prefix) and entry.endswith(".jsonl"):
            os.remove(os.path.join(path, entry))


class JsonlBatchWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite
        # job-unique token in the FINAL names: append-mode jobs to the
        # same directory accumulate instead of silently clobbering a
        # previous job's part-00000 (and a job with fewer partitions
        # can't leave a stale mix of old high-indexed files)
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        return _write_partition(self.path, iterator)

    def commit(self, messages):
        if self.overwrite:
            # truncate semantics: every previously published file goes,
            # only then does this job's output appear
            _remove_matching(self.path, "part-")
            _remove_matching(self.path, "batch-")
        _publish(self.path, messages, prefix=f"part-{self.job_id}-")

    def abort(self, messages):
        _discard(self.path, messages)


class JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _write_partition(self.path, iterator)

    def commit(self, messages, batchId):
        # epoch replay idempotence must hold even when the replay plans
        # FEWER partitions than the crashed attempt: sweep every file
        # of this epoch before publishing, then republish — downstream
        # readers keyed on batch-<id>- see exactly one attempt's output
        _remove_matching(self.path, f"batch-{batchId:08d}-")
        _publish(self.path, messages, prefix=f"batch-{batchId:08d}-")

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
        return JsonlStreamWriter(self.options)
