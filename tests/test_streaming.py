"""End-to-end streaming tests: envelope JSON lines → file (Kafka
stand-in) source → parse/flatten/watermarked-dedup → parquet sinks,
and the foreachBatch analytics app — no broker required, matching
SURVEY.md §7.2 M4's test strategy.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.streaming import app, etl, sources


def make_envelope(player_idx: int, match_ids: list[str], collected_at: str) -> dict:
    """Deterministic envelope matching the reference producer's shape
    (reference: producer/producer.py:215 envelope, :73-105 player,
    :118-158 match, :167-201 performance)."""
    name = f"player_{player_idx}"
    return {
        "player": {
            "player_name": name,
            "account_id": f"acct_{player_idx}",
            "shard_id": "steam",
            "title_id": "pubg",
            "patch_version": "1.0",
            "ban_type": "Innocent",
            "clan_id": f"clan_{player_idx % 2}",
            "stats": json.dumps({"tier": player_idx}),
            "rank": "{}",
            "total_matches_count": len(match_ids),
            "match_ids": match_ids,
            "data_collected_at": collected_at,
            "account_created_at": "2020-01-01 00:00:00",
            "account_updated_at": collected_at,
            "api_links": "{}",
            "all_raw_attributes": "{}",
        },
        "matches": [
            {
                "match_id": mid,
                "type": "match",
                "game_mode": ["solo", "duo", "squad"][i % 3],
                "map_name": ["Erangel", "Miramar"][i % 2],
                "duration": 1500 + 60 * i,
                "title_id": "pubg",
                "shard_id": "steam",
                "season_state": "progress",
                "is_custom_match": False,
                "tags": "{}",
                "created_at": f"2024-03-0{(i % 7) + 1} 12:00:00",
                "patch_version": "1.0",
                "match_type": "official",
                "telemetry_url": "https://example.invalid/telemetry",
                "rosters_count": 16,
                "participants_count": 64,
                "assets_count": 1,
                "api_links": "{}",
                "all_raw_attributes": "{}",
                "relationships_summary": "{}",
                "player_performance": {
                    "kills": (player_idx * 3 + i) % 12,
                    "assists": i % 4,
                    "headshot_kills": i % 3,
                    "longest_kill": 120.5 + i,
                    "road_kills": 0,
                    "team_kills": 0,
                    "damage_dealt": 250.0 * (i + 1),
                    "time_survived": 900.0 + 60 * i,
                    "dbnos": i % 5,
                    "death_type": "alive" if i % 4 == 0 else "byplayer",
                    "heals": i,
                    "boosts": i % 2,
                    "revives": 0,
                    "walk_distance": 2000.0 + 10 * i,
                    "ride_distance": 500.0 * (i % 3),
                    "swim_distance": 0.0,
                    "win_place": (i % 20) + 1,
                    "kill_place": (i % 30) + 1,
                    "weapons_acquired": 3 + i % 4,
                    "vehicle_destroys": 0,
                    "participant_name": name,
                    "participant_id": f"participant_{player_idx}",
                },
            }
            for i, mid in enumerate(match_ids)
        ],
    }


@pytest.fixture()
def envelope_dir(tmp_path):
    """Two message files; the second replays one envelope verbatim
    (producer re-poll) to exercise dedup."""
    d = tmp_path / "messages"
    d.mkdir()
    batch1 = [
        make_envelope(1, ["m1", "m2", "m3"], "2024-03-01 10:00:00"),
        make_envelope(2, ["m1", "m4"], "2024-03-01 10:00:00"),
    ]
    batch2 = [
        make_envelope(1, ["m1", "m2", "m3"], "2024-03-01 10:00:00"),  # exact replay
        make_envelope(1, ["m5"], "2024-03-01 11:00:00"),  # new poll
    ]
    (d / "b1.jsonl").write_text("\n".join(json.dumps(e) for e in batch1))
    (d / "b2.jsonl").write_text("\n".join(json.dumps(e) for e in batch2))
    return str(d)


def test_streaming_etl_end_to_end(spark, tmp_path, envelope_dir):
    raw = sources.text_stream(spark, envelope_dir)
    queries = app.streaming_etl(
        raw,
        players_path=str(tmp_path / "players"),
        matches_path=str(tmp_path / "matches"),
        checkpoint_root=str(tmp_path / "ckpt"),
        trigger_seconds=1,
    )
    try:
        for q in queries:
            q.processAllAvailable()
    finally:
        for q in queries:
            q.stop()

    players = spark.read.parquet(str(tmp_path / "players"))
    matches = spark.read.parquet(str(tmp_path / "matches"))

    # players: 4 envelopes, dedup on (account_id, data_collected_at):
    # the replay collapses -> 3 snapshots
    assert players.count() == 3
    assert players.select("account_id", "data_collected_at").distinct().count() == 3
    assert dict(players.dtypes)["data_collected_at"] == "timestamp"

    # matches: dedup on (match_id, account_id, created_at); the replay
    # of (m1..m3, acct_1) collapses
    got = {
        (r["match_id"], r["account_id"])
        for r in matches.select("match_id", "account_id").collect()
    }
    assert got == {
        ("m1", "acct_1"),
        ("m2", "acct_1"),
        ("m3", "acct_1"),
        ("m1", "acct_2"),
        ("m4", "acct_2"),
        ("m5", "acct_1"),
    }
    # nested performance was flattened and typed, with the reference
    # sink table's exact column names (player_-prefixed)
    row = matches.filter(
        (F.col("match_id") == "m2") & (F.col("account_id") == "acct_1")
    ).first()
    assert row["player_kills"] == 4 and row["player_damage_dealt"] == 500.0
    assert row["duration_minutes"] == pytest.approx(26.0)
    assert row["match_type"] == "match" and row["teams_count"] == 16


def test_metric_points_families(spark, envelope_dir):
    """X1 fan-out: the four measurement families with the collector's
    exact tag/field names (reference: monitoring/metrics_collector.py:
    56-152)."""
    from pubg_data_pipeline_spark.plans.analytics import metric_points

    raw = sources.text_stream(spark, envelope_dir)
    # batch-read the same envelope files (operators are batch-first)
    batch_raw = spark.read.text(envelope_dir)
    parsed = etl.parse_envelope(batch_raw)
    flat = etl.extract_matches_table(parsed)
    players = etl.extract_players(parsed)
    fams = metric_points(flat, players)
    assert set(fams) == {"player_stats", "match_info", "player_performance_v2", "player_kda"}
    kda = fams["player_kda"]
    assert {"player_name", "match_id", "game_mode", "kda_ratio", "kills", "deaths", "assists", "time"} <= set(kda.columns)
    row = kda.filter((F.col("match_id") == "m1") & (F.col("player_name") == "player_1")).first()
    # i=0 match: kills=3, assists=0, death_type='alive' -> deaths=0, kda=(3+0)/1
    assert row["deaths"] == 0 and row["kda_ratio"] == 3.0
    perf = fams["player_performance_v2"]
    assert "weapons_acquired" in perf.columns and "longest_kill" in perf.columns
    assert fams["player_stats"].count() == 4  # one row per envelope


def test_malformed_messages_become_null_rows(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "b.jsonl").write_text("not json at all\n{}")
    raw = sources.text_stream(spark, str(d))
    parsed = etl.parse_envelope(raw)
    q = parsed.writeStream.format("memory").queryName("bad_parse").outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM bad_parse").collect()
    # PERMISSIVE parse: malformed lines yield null player/matches, no crash
    assert len(rows) == 2
    assert all(r["player"] is None for r in rows)


def test_streaming_analytics_epochs(spark, tmp_path, envelope_dir):
    """foreachBatch analytics over the flattened match stream: every
    pipeline publishes per epoch; empty batches short-circuit."""
    raw = sources.text_stream(spark, envelope_dir)
    flat = etl.extract_matches(etl.parse_envelope(raw))
    published: dict[str, int] = {}

    def publish(name, df):
        published[name] = published.get(name, 0) + df.count()

    q = app.streaming_analytics(flat, publish, trigger_seconds=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert set(published) == {
        "player_ranking",
        "moving_trends",
        "anomaly_alerts",
        "hourly_aggregates",
        "map_difficulty",
    }
    assert published["player_ranking"] >= 1
    assert published["hourly_aggregates"] >= 1


def test_streaming_hourly_aggregates_event_time(spark, tmp_path, envelope_dir):
    """Native windowed aggregation accumulates per event-time hour
    ACROSS micro-batches (update mode shows the running state)."""
    raw = sources.text_stream(spark, envelope_dir, max_files_per_trigger=1)
    flat = etl.extract_matches(etl.parse_envelope(raw))
    agged = app.streaming_hourly_aggregates(flat, "created_at")
    q = (
        agged.writeStream.format("memory")
        .queryName("hourly_ev")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT * FROM hourly_ev ORDER BY hour_start, game_mode, map_name"
    ).collect()
    assert rows, "no windows emitted"
    # all envelope matches carry created_at 2024-03-0X 12:00:00 -> noon windows
    assert all(r["hour_start"].hour == 12 for r in rows)
    # update mode re-emits a window each batch it changes; the final
    # state per window is its max emission. The replayed envelope
    # counts again (windowed agg does not dedup; watermarked_dedup
    # upstream would remove it): 3 + 2 + 3 (replay) + 1 = 9 match rows.
    finals: dict = {}
    for r in rows:
        key = (r["hour_start"], r["game_mode"], r["map_name"])
        finals[key] = max(finals.get(key, 0), r["total_matches"])
    assert sum(finals.values()) == 9


def test_dedup_within_watermark_collapses_resends(spark, tmp_path):
    """dropDuplicatesWithinWatermark dedups on the business key ALONE:
    a re-send of the same key with a DIFFERENT event time (the
    reference producer's 60 s re-poll pattern) still collapses, which
    key+timestamp dedup (watermarked_dedup) cannot do."""
    import json as _json

    src = tmp_path / "dwm_src"
    src.mkdir()
    rows = [
        {"id": "a", "ts": "2024-03-01 10:00:00"},
        {"id": "a", "ts": "2024-03-01 10:00:30"},  # re-send, new timestamp
        {"id": "b", "ts": "2024-03-01 10:01:00"},
    ]
    (src / "batch0.json").write_text("\n".join(_json.dumps(r) for r in rows))
    raw = (
        spark.readStream.schema("id string, ts string")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    deduped = etl.dedup_within_watermark(raw, ["id"], "ts", watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dwm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dwm_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT id, ts FROM dwm").collect()
    assert sorted(r["id"] for r in out) == ["a", "b"]
    # the FIRST arrival of each key is the one kept
    kept_a = next(r for r in out if r["id"] == "a")
    assert kept_a["ts"].second == 0


def test_stream_static_enrichment(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    (d / "a.jsonl").write_text(
        "\n".join(
            json.dumps(x)
            for x in [
                {"user_id": 1, "v": 10.0},
                {"user_id": 2, "v": 20.0},
                {"user_id": 9, "v": 90.0},  # no dimension row -> null label
            ]
        )
    )
    stream = sources.text_stream(spark, str(d))
    parsed = stream.select(
        F.get_json_object("value", "$.user_id").cast("int").alias("user_id"),
        F.get_json_object("value", "$.v").cast("double").alias("v"),
    )
    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], "user_id int, label string")
    enriched = etl.enrich_stream_static(parsed, dim, "user_id")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["user_id"]: r["label"] for r in spark.sql("SELECT * FROM enriched_t").collect()}
    assert got == {1: "gold", 2: "silver", 9: None}


def test_stream_stream_interval_join(spark, tmp_path):
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir()
    clk_dir.mkdir()
    (imp_dir / "i.jsonl").write_text(
        "\n".join(
            json.dumps(x)
            for x in [
                {"ad": 1, "its": "2024-03-01 10:00:00"},
                {"ad": 2, "its": "2024-03-01 10:00:00"},
            ]
        )
    )
    (clk_dir / "c.jsonl").write_text(
        "\n".join(
            json.dumps(x)
            for x in [
                {"ad": 1, "cts": "2024-03-01 10:02:00"},  # within 5 min -> joins
                {"ad": 2, "cts": "2024-03-01 10:30:00"},  # outside tolerance -> dropped
            ]
        )
    )
    imps = sources.text_stream(spark, str(imp_dir)).select(
        F.get_json_object("value", "$.ad").cast("int").alias("ad"),
        F.get_json_object("value", "$.its").cast("timestamp").alias("its"),
    )
    clicks = sources.text_stream(spark, str(clk_dir)).select(
        F.get_json_object("value", "$.ad").cast("int").alias("ad"),
        F.get_json_object("value", "$.cts").cast("timestamp").alias("cts"),
    )
    joined = etl.stream_stream_interval_join(
        imps, clicks, key="ad", left_ts="its", right_ts="cts", tolerance="5 minutes"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT ad FROM attrib_t").collect()
    assert [r["ad"] for r in rows] == [1]


def test_stream_stream_left_outer_join_emits_unmatched_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: the unmatched impression is
    null-extended once the watermark passes its join window; a later
    micro-batch's far-future row advances the watermark to force the
    emission deterministically."""
    imp_dir, clk_dir = tmp_path / "impL", tmp_path / "clkL"
    imp_dir.mkdir()
    clk_dir.mkdir()
    (imp_dir / "i1.jsonl").write_text(
        json.dumps({"ad": 1, "its": "2024-03-01 10:00:00"})
        + "\n"
        + json.dumps({"ad": 2, "its": "2024-03-01 10:00:00"})
    )
    (clk_dir / "c1.jsonl").write_text(
        json.dumps({"ad": 1, "cts": "2024-03-01 10:02:00"})  # ad 2 never clicks
    )
    imps = sources.text_stream(spark, str(imp_dir)).select(
        F.get_json_object("value", "$.ad").cast("int").alias("ad"),
        F.get_json_object("value", "$.its").cast("timestamp").alias("its"),
    )
    clicks = sources.text_stream(spark, str(clk_dir)).select(
        F.get_json_object("value", "$.ad").cast("int").alias("ad"),
        F.get_json_object("value", "$.cts").cast("timestamp").alias("cts"),
    )
    joined = etl.stream_stream_interval_join(
        imps,
        clicks,
        key="ad",
        left_ts="its",
        right_ts="cts",
        watermark="1 minute",
        tolerance="5 minutes",
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_lo")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark-advancing batch: far-future rows on BOTH sides
        (imp_dir / "i2.jsonl").write_text(
            json.dumps({"ad": 99, "its": "2024-03-01 12:00:00"})
        )
        (clk_dir / "c2.jsonl").write_text(
            json.dumps({"ad": 98, "cts": "2024-03-01 12:00:00"})
        )
        q.processAllAvailable()
        # one more empty-ish cycle lets the state-store eviction emit
        (imp_dir / "i3.jsonl").write_text(
            json.dumps({"ad": 97, "its": "2024-03-01 13:00:00"})
        )
        (clk_dir / "c3.jsonl").write_text(
            json.dumps({"ad": 96, "cts": "2024-03-01 13:00:00"})
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {(r["ad"], r["cts"] is None) for r in spark.sql("SELECT ad, cts FROM attrib_lo").collect()}
    assert (1, False) in rows  # matched pair joined normally
    assert (2, True) in rows  # unmatched left emitted null-extended post-watermark


def test_stream_stream_full_outer_join_emits_both_unmatched_sides(spark, tmp_path):
    """Full-outer stream-stream join: an impression with no click AND a
    click with no impression both null-extend after the watermark."""
    imp_dir, clk_dir = tmp_path / "impF", tmp_path / "clkF"
    imp_dir.mkdir()
    clk_dir.mkdir()
    (imp_dir / "i1.jsonl").write_text(
        json.dumps({"ad": 1, "its": "2024-03-01 10:00:00"})
        + "\n"
        + json.dumps({"ad": 2, "its": "2024-03-01 10:00:00"})  # never clicked
    )
    (clk_dir / "c1.jsonl").write_text(
        json.dumps({"ad": 1, "cts": "2024-03-01 10:02:00"})
        + "\n"
        + json.dumps({"ad": 7, "cts": "2024-03-01 10:01:00"})  # click w/o impression
    )
    imps = sources.text_stream(spark, str(imp_dir)).select(
        F.get_json_object("value", "$.ad").cast("int").alias("ad"),
        F.get_json_object("value", "$.its").cast("timestamp").alias("its"),
    )
    clicks = sources.text_stream(spark, str(clk_dir)).select(
        F.get_json_object("value", "$.ad").cast("int").alias("ad"),
        F.get_json_object("value", "$.cts").cast("timestamp").alias("cts"),
    )
    joined = etl.stream_stream_interval_join(
        imps,
        clicks,
        key="ad",
        left_ts="its",
        right_ts="cts",
        watermark="1 minute",
        tolerance="5 minutes",
        how="full_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_fo")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        for i, hour in enumerate(("12", "13")):  # advance watermark twice
            (imp_dir / f"iw{i}.jsonl").write_text(
                json.dumps({"ad": 90 + i, "its": f"2024-03-01 {hour}:00:00"})
            )
            (clk_dir / f"cw{i}.jsonl").write_text(
                json.dumps({"ad": 80 + i, "cts": f"2024-03-01 {hour}:00:00"})
            )
            q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r["ad"], r["its"] is None, r["cts"] is None)
        for r in spark.sql("SELECT ad, its, cts FROM attrib_fo").collect()
    }
    assert (1, False, False) in rows  # matched
    assert (2, False, True) in rows  # unmatched impression
    assert (7, True, False) in rows  # unmatched click
