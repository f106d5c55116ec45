"""The in-engine REST-poll source (sources/rest_source.py) against a
real local HTTP server: batch snapshot, shard partitioning, streaming
offsets across micro-batches, and the parse_envelope handoff."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from pubg_data_pipeline_spark.sources import rest_source


def _envelope(shard: int, poll: int, i: int) -> dict:
    return {
        "player": {"account_id": f"acct-{shard}-{poll}-{i}", "name": f"p{i}"},
        "matches": [{"match_id": f"m-{shard}-{poll}-{i}", "kills": i}],
    }


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 - stdlib naming
        q = parse_qs(urlparse(self.path).query)
        shard = int(q.get("shard", ["0"])[0])
        poll = int(q.get("offset", ["0"])[0])
        body = json.dumps([_envelope(shard, poll, i) for i in range(2)]).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence test output
        pass


@pytest.fixture(scope="module")
def http_url():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/export"
    srv.shutdown()


def test_batch_read_with_shard_partitions(spark, http_url):
    rest_source.register(spark)
    df = (
        spark.read.format("rest_envelope")
        .option("url", http_url)
        .option("shards", 3)
        .load()
    )
    rows = df.collect()
    # 3 shards x 2 envelopes at poll 0
    assert len(rows) == 6
    assert {r["shard"] for r in rows} == {0, 1, 2}
    assert all(r["poll"] == 0 for r in rows)
    assert df.rdd.getNumPartitions() == 3  # one task per shard
    env = json.loads(rows[0]["value"])
    assert "player" in env and "matches" in env


def test_stream_read_advances_offsets(spark, http_url, tmp_path):
    rest_source.register(spark)
    stream = (
        spark.readStream.format("rest_envelope")
        .option("url", http_url)
        .option("shards", 2)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rest_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM rest_stream").collect()[0]["c"]
            polls = {
                r["poll"]
                for r in spark.sql("SELECT DISTINCT poll FROM rest_stream").collect()
            }
            if n >= 8 and len(polls) >= 2:
                break
            time.sleep(0.5)
        else:
            raise AssertionError("stream did not produce 2+ polls in time")
    finally:
        q.stop()
    # each micro-batch = one poll across both shards (2 shards x 2 envelopes)
    per_poll = {
        (r["poll"], r["shard"])
        for r in spark.sql("SELECT poll, shard FROM rest_stream").collect()
    }
    for poll in sorted({p for p, _ in per_poll})[:2]:
        assert {(poll, 0), (poll, 1)} <= per_poll


def test_source_feeds_parse_envelope(spark, http_url):
    """The value column is wire-compatible with the streaming ETL's
    envelope parser — the source replaces the reference's
    producer-daemon + Kafka hop with zero downstream changes."""
    from pubg_data_pipeline_spark.streaming import etl

    rest_source.register(spark)
    raw = (
        spark.read.format("rest_envelope").option("url", http_url).load()
    )
    parsed = etl.parse_envelope(raw)
    players = etl.extract_players(parsed)
    assert players.filter("account_id IS NOT NULL").count() == 2


def test_rest_streaming_etl_end_to_end(spark, http_url, tmp_path):
    """REST endpoint -> rest_envelope stream -> parse/flatten/dedup ->
    parquet tables: the reference's full ingest chain, one pipeline."""
    from pubg_data_pipeline_spark.streaming import app

    queries = app.rest_streaming_etl(
        spark,
        http_url,
        str(tmp_path / "players"),
        str(tmp_path / "matches"),
        str(tmp_path / "ckpt"),
        shards=2,
        trigger_seconds=1,
    )
    try:
        import time

        deadline = time.time() + 90
        ok = False
        while time.time() < deadline and not ok:
            try:
                p = spark.read.parquet(str(tmp_path / "players"))
                m = spark.read.parquet(str(tmp_path / "matches"))
                ok = p.count() >= 4 and m.count() >= 4
            except Exception:
                pass
            time.sleep(1)
        assert ok, "ETL did not land rows from the REST stream in time"
    finally:
        for q in queries:
            q.stop()
    p = spark.read.parquet(str(tmp_path / "players"))
    assert "account_id" in p.columns


def test_batch_backfill_polls_multiple_pages(spark, http_url):
    rest_source.register(spark)
    df = (
        spark.read.format("rest_envelope")
        .option("url", http_url)
        .option("shards", 2)
        .option("polls", 3)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 12  # 2 shards x 3 polls x 2 envelopes
    assert {(r["shard"], r["poll"]) for r in rows} == {
        (s, p) for s in range(2) for p in range(3)
    }
    assert df.rdd.getNumPartitions() == 6  # one task per page


def test_stream_restart_resumes_from_committed_poll(spark, http_url, tmp_path):
    """Restart with the same checkpoint must CONTINUE the poll
    sequence, not reset it (the offset regression a counter-based
    latestOffset reader exhibits)."""
    import time

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    rest_source.register(spark)

    def polls_on_disk():
        try:
            return {r["poll"] for r in spark.read.parquet(out).select("poll").distinct().collect()}
        except Exception:
            return set()

    def run_until(pred):
        stream = (
            spark.readStream.format("rest_envelope")
            .option("url", http_url)
            .option("shards", 1)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                if pred(polls_on_disk()):
                    return polls_on_disk()
                time.sleep(0.5)
            raise AssertionError("stream made no progress")
        finally:
            q.stop()

    first = run_until(lambda ps: len(ps) >= 2)
    resumed = run_until(lambda ps: len(ps - first) >= 1)
    new_polls = resumed - first
    assert new_polls and min(new_polls) > max(first), (
        f"restart re-fetched polls: before {sorted(first)}, after {sorted(resumed)}"
    )
    # and nothing was fetched twice: parquet rows per (poll, shard) unique
    from pyspark.sql import functions as F

    dup = (
        spark.read.parquet(out)
        .groupBy("poll", "shard", "value")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
