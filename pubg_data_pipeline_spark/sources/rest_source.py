"""REST-poll data source (Spark 4 Python DataSource API): the
reference's out-of-process producer, re-expressed IN-engine.

The reference runs a standalone Python daemon that polls a REST API
and forwards JSON envelopes to Kafka (reference:
producer/producer.py:24,73-105,215,243 — poll loop at :232-270);
Spark only ever sees the Kafka topic. This module removes that moving
part: ``RestEnvelopeSource`` registers as a first-class Spark format
(``spark.dataSource.register`` then ``spark.read.format(
"rest_envelope")`` / ``spark.readStream.format("rest_envelope")``),
so the poll loop becomes Spark-managed tasks with Spark-managed
offsets instead of an unsupervised daemon.

Rows mimic the Kafka wire shape the rest of the engine already
consumes — ``value`` is the raw JSON envelope string — so the output
feeds ``streaming/etl.parse_envelope`` unchanged.

Scale model: one API endpoint is bandwidth-bound, not CPU-bound, so
the unit of parallelism is the SHARD (``shards`` option, default 1):
each input partition polls ``url?shard=i&offset=n`` — the standard
keyset-sharded export endpoint. Downstream parse/flatten work
re-partitions freely; the source layer never needs wide parallelism
because the network is the bottleneck (same reasoning as one Kafka
partition per consumer).

Streaming offsets: the stream reader's offset is the POLL NUMBER —
one poll per micro-batch via the simple-stream-reader contract
(``read(start)`` gets the checkpoint-restored offset and returns
``start + 1``), so restart resumes from the last committed poll with
no duplicate fetch and no reader-side counter to lose (the endpoint
is expected to serve a stable page per (shard, offset), like any
cursor-paginated export API; ``readBetweenOffsets`` replays a planned
page deterministically after a crash).

Options: ``url`` (required), ``shards`` (int, default 1),
``timeout_sec`` (HTTP timeout, default 10).
"""

from __future__ import annotations

import json
from urllib.request import urlopen

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "value string, shard int, poll int"


def _fetch(
    url: str, shard: int, poll: int, timeout_sec: float, retries: int = 0
) -> list[tuple]:
    """GET one (shard, poll) page; returns Kafka-shaped rows. Each
    element of the returned JSON array is one envelope, re-serialized
    compactly as the ``value`` string.

    ``retries``: bounded in-process retry with exponential backoff.
    The BATCH reader leaves it 0 — those fetches run in executor tasks
    where Spark's task retry is the policy. The STREAMING reader runs
    on the DRIVER (SimpleDataSourceStreamReader contract), where no
    task retry exists and a single transient 503 would otherwise kill
    the whole StreamingQuery — it passes retries > 0."""
    import time

    sep = "&" if "?" in url else "?"
    full = f"{url}{sep}shard={shard}&offset={poll}"
    attempt = 0
    while True:
        try:
            with urlopen(full, timeout=timeout_sec) as resp:
                payload = json.loads(resp.read().decode("utf-8"))
            break
        except Exception:
            if attempt >= retries:
                raise
            time.sleep(min(0.2 * (2 ** attempt), 5.0))
            attempt += 1
    return [(json.dumps(env, sort_keys=True), shard, poll) for env in payload]


class _ShardPartition(InputPartition):
    def __init__(self, shard: int, poll: int):
        self.shard = shard
        self.poll = poll


class RestEnvelopeBatchReader(DataSourceReader):
    """Batch form: ``polls`` consecutive pages (default 1 — the
    "snapshot now" read) across all shards; a historical backfill sets
    ``polls=N`` and gets one task per (shard, poll) page — the batch
    counterpart of the stream reader's offset walk."""

    def __init__(self, options):
        self.url = options["url"]
        self.shards = int(options.get("shards", 1))
        self.polls = int(options.get("polls", 1))
        self.timeout = float(options.get("timeout_sec", 10))

    def partitions(self):
        return [
            _ShardPartition(s, p)
            for s in range(self.shards)
            for p in range(self.polls)
        ]

    def read(self, partition):
        yield from _fetch(self.url, partition.shard, partition.poll, self.timeout)


class RestEnvelopeStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: offset = poll number, one poll per micro-batch,
    checkpoint-resumable BY CONSTRUCTION — ``read(start)`` receives
    the restored offset from Spark's checkpoint and fetches exactly
    page ``start``, returning ``end = start + 1``. (The stateful
    ``DataSourceStreamReader.latestOffset`` variant would need its own
    counter, which resets on driver restart and regresses the offset
    log — a class of bug the simple-reader contract cannot express.)
    ``readBetweenOffsets`` replays committed-but-unprocessed pages
    deterministically after a crash: pages are immutable cursor reads.

    All shards of one poll are fetched in this driver-side reader —
    matching the reference producer's single poll loop
    (producer/producer.py:232-270) and the bandwidth-bound nature of
    one API endpoint; wide parallelism belongs downstream (the
    DataFrame repartitions freely after the source)."""

    def __init__(self, options):
        self.url = options["url"]
        self.shards = int(options.get("shards", 1))
        self.timeout = float(options.get("timeout_sec", 10))
        self.retries = int(options.get("retries", 3))

    def initialOffset(self):
        return {"poll": 0}

    def _page(self, poll: int):
        for shard in range(self.shards):
            yield from _fetch(
                self.url, shard, poll, self.timeout, retries=self.retries
            )

    def read(self, start):
        poll = int(start["poll"])
        return iter(list(self._page(poll))), {"poll": poll + 1}

    def readBetweenOffsets(self, start, end):
        for poll in range(int(start["poll"]), int(end["poll"])):
            yield from self._page(poll)

    def commit(self, end):
        # nothing external to acknowledge: pages are immutable cursor
        # reads; Spark's checkpoint already persisted `end`
        pass


class RestEnvelopeSource(DataSource):
    @classmethod
    def name(cls):
        return "rest_envelope"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return RestEnvelopeBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return RestEnvelopeStreamReader(self.options)


def register(spark) -> None:
    """Make the format available: ``register(spark)`` then
    ``spark.read.format("rest_envelope").option("url", ...)``."""
    spark.dataSource.register(RestEnvelopeSource)
