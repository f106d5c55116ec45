"""Streaming ETL transformations: parse → flatten → dedup.

Re-expresses the reference's streaming app (reference:
spark_apps/pubg_streaming.py:138-250) as pure DataFrame → DataFrame
functions that work identically on batch and streaming frames
(batch-first design, SURVEY.md §7.0), with one deliberate semantic
upgrade: dedup is WATERMARKED. The reference calls ``dropDuplicates``
with no watermark (:247,250), which grows state forever on an
unbounded stream (SURVEY.md §4.2 item 1); here state is bounded by an
event-time watermark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.sources.schemas import ENVELOPE_SCHEMA


def parse_envelope(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka value bytes → typed envelope struct.

    reference: spark_apps/pubg_streaming.py:138-145 — cast binary to
    string, from_json against the declared schema (PERMISSIVE: bad
    rows become nulls), star-expand."""
    return (
        raw.select(F.col(value_col).cast("string").alias("json_str"))
        .select(F.from_json("json_str", ENVELOPE_SCHEMA).alias("data"))
        .select("data.*")
    )


def parse_envelope_with_dlq(
    raw: DataFrame, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split of the envelope parse: (typed rows, rejects).

    The reference's PERMISSIVE parse silently forwards malformed
    envelopes as all-null rows into the sink (reference:
    spark_apps/pubg_streaming.py:138-145 — its only quality gate is
    collector-side try/except logging). Production ingestion keeps the
    poison pills: rows whose JSON does not parse at all (``from_json``
    → NULL struct) are routed to a quarantine frame carrying the raw
    payload and a reason, so they can be replayed after a schema fix
    instead of being lost. Both outputs are pure projections of ONE
    parse pass — no second scan, works identically on batch and
    streaming frames."""
    parsed = raw.select(F.col(value_col).cast("string").alias("json_str")).select(
        "json_str", F.from_json("json_str", ENVELOPE_SCHEMA).alias("data")
    )
    # PERMISSIVE from_json yields an all-NULL struct for malformed JSON
    # (only an empty input string gives a NULL struct), so "dead" =
    # struct null OR every top-level envelope field null — which also
    # quarantines the semantically-empty `{}` envelope
    dead_pred = F.col("data").isNull() | (
        F.col("data.player").isNull() & F.col("data.matches").isNull()
    )
    good = parsed.filter(~dead_pred).select("data.*")
    dead = parsed.filter(dead_pred).select(
        F.col("json_str").alias("raw_payload"),
        F.lit("unparseable or empty envelope").alias("reason"),
    )
    return good, dead


def extract_players(parsed: DataFrame) -> DataFrame:
    """Player-snapshot projection with the reference sink table's exact
    column names (stats_json/rank_json aliases at :163-164).

    reference: spark_apps/pubg_streaming.py:148-177; engine upgrade:
    ``data_collected_at`` parsed to TimestampType (SURVEY.md §1.2 —
    the reference stores it as a string)."""
    p = F.col("player")
    return parsed.filter(p.isNotNull()).select(
        p["player_name"].alias("player_name"),
        p["account_id"].alias("account_id"),
        p["shard_id"].alias("shard_id"),
        p["title_id"].alias("title_id"),
        p["patch_version"].alias("patch_version"),
        p["ban_type"].alias("ban_type"),
        p["clan_id"].alias("clan_id"),
        p["stats"].alias("stats_json"),
        p["rank"].alias("rank_json"),
        p["total_matches_count"].alias("total_matches_count"),
        F.size(p["match_ids"]).alias("recent_matches_count"),
        # try_to_timestamp: under Spark 4 ANSI mode a plain to_timestamp
        # THROWS on any nonconforming string, turning one bad-but-
        # valid-JSON envelope into a stream-killing poison pill the
        # checkpoint replays forever; NULL event times instead flow
        # to the watermark stage (dropped) / DLQ audits.
        F.try_to_timestamp(p["data_collected_at"], F.lit("yyyy-MM-dd HH:mm:ss")).alias(
            "data_collected_at"
        ),
        p["account_created_at"].alias("account_created_at"),
        p["account_updated_at"].alias("account_updated_at"),
        F.current_timestamp().alias("processed_at"),
    )


def extract_matches(parsed: DataFrame) -> DataFrame:
    """Flat (player, match) rows: explode the matches array and pull
    the nested performance struct up to top-level columns.

    reference: spark_apps/pubg_streaming.py:180-233 (explode at :183,
    nested access at :216-229)."""
    exploded = parsed.filter(F.col("matches").isNotNull()).select(
        F.col("player.player_name").alias("player_name"),
        F.col("player.account_id").alias("account_id"),
        F.explode("matches").alias("match"),
    )
    m = F.col("match")
    perf = m["player_performance"]
    return exploded.select(
        "player_name",
        "account_id",
        m["match_id"].alias("match_id"),
        m["game_mode"].alias("game_mode"),
        m["map_name"].alias("map_name"),
        m["duration"].alias("duration"),
        (m["duration"] / 60.0).alias("duration_minutes"),
        m["is_custom_match"].alias("is_custom_match"),
        F.try_to_timestamp(m["created_at"]).alias("created_at"),
        perf["kills"].alias("kills"),
        perf["assists"].alias("assists"),
        perf["headshot_kills"].alias("headshot_kills"),
        perf["longest_kill"].alias("longest_kill"),
        perf["damage_dealt"].alias("damage_dealt"),
        perf["time_survived"].alias("time_survived"),
        perf["death_type"].alias("death_type"),
        perf["heals"].alias("heals"),
        perf["boosts"].alias("boosts"),
        perf["walk_distance"].alias("walk_distance"),
        perf["ride_distance"].alias("ride_distance"),
        perf["win_place"].alias("win_place"),
        perf["weapons_acquired"].alias("weapons_acquired"),
        F.current_timestamp().alias("processed_at"),
    )


def extract_matches_table(parsed: DataFrame) -> DataFrame:
    """The ETL SINK shape of the flat match table, with the reference's
    exact column aliases (``player_``-prefixed performance columns,
    duration_seconds/minutes, teams/players_count, match_created_at).

    reference: spark_apps/pubg_streaming.py:180-233. Distinct from
    extract_matches, which produces the unprefixed ANALYTICS shape the
    foreachBatch app consumes (the reference's two apps genuinely use
    two different flat schemas — advanced_analytics.py:67-81
    star-expands player_performance unprefixed)."""
    exploded = parsed.filter(F.col("matches").isNotNull()).select(
        F.col("player.player_name").alias("player_name"),
        F.col("player.account_id").alias("account_id"),
        F.explode("matches").alias("match"),
    )
    m = F.col("match")
    perf = m["player_performance"]
    return exploded.select(
        "player_name",
        "account_id",
        m["match_id"].alias("match_id"),
        m["type"].alias("match_type"),
        m["game_mode"].alias("game_mode"),
        m["map_name"].alias("map_name"),
        m["duration"].alias("duration_seconds"),
        (m["duration"] / 60.0).alias("duration_minutes"),
        m["season_state"].alias("season_state"),
        m["is_custom_match"].alias("is_custom_match"),
        m["rosters_count"].alias("teams_count"),
        m["participants_count"].alias("players_count"),
        m["assets_count"].alias("assets_count"),
        F.try_to_timestamp(m["created_at"]).alias("match_created_at"),
        m["patch_version"].alias("patch_version"),
        m["telemetry_url"].alias("telemetry_url"),
        perf["kills"].alias("player_kills"),
        perf["assists"].alias("player_assists"),
        perf["headshot_kills"].alias("player_headshot_kills"),
        perf["damage_dealt"].alias("player_damage_dealt"),
        perf["time_survived"].alias("player_time_survived"),
        perf["heals"].alias("player_heals"),
        perf["boosts"].alias("player_boosts"),
        perf["walk_distance"].alias("player_walk_distance"),
        perf["ride_distance"].alias("player_ride_distance"),
        perf["win_place"].alias("player_win_place"),
        perf["kill_place"].alias("player_kill_place"),
        perf["longest_kill"].alias("player_longest_kill"),
        perf["weapons_acquired"].alias("player_weapons_acquired"),
        perf["death_type"].alias("player_death_type"),
        F.current_timestamp().alias("processed_at"),
    )


def watermarked_dedup(
    df: DataFrame,
    keys: list[str],
    event_time_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming dedup with bounded state.

    Fixes the reference's unbounded ``dropDuplicates`` (reference:
    spark_apps/pubg_streaming.py:247,250): the watermark lets Spark
    evict dedup state older than the delay, trading exactly-once dedup
    of arbitrarily-late replays for bounded memory — the correct trade
    at scale. On a batch DataFrame withWatermark is a no-op and this
    degrades to plain dropDuplicates."""
    return df.withWatermark(event_time_col, watermark).dropDuplicates(
        keys + [event_time_col]
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    event_time_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming dedup on the business keys ALONE with bounded state
    (``dropDuplicatesWithinWatermark``).

    Unlike watermarked_dedup, the event-time column is NOT part of the
    key, so re-sends of the same record with a different timestamp
    (the common at-least-once producer pattern — the reference's
    producer re-fetches the same matches every 60 s poll,
    reference: producer/producer.py:255-259) still collapse, as long
    as duplicates arrive within the watermark delay of each other.
    Streaming-only: batch DataFrames should use exact_dedup."""
    return df.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(keys)


def enrich_stream_static(
    stream_df: DataFrame, dim_df: DataFrame, on: list[str] | str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch is joined
    against the (batch) dimension table — Structured Streaming's
    dimension-lookup pattern. The static side is broadcast: at scale
    the dimension re-broadcasts per batch, which is the intended trade
    for a slowly-changing lookup table (no shuffle of the stream)."""
    return stream_df.join(F.broadcast(dim_df), on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
    tolerance: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join with a time-interval bound: rows
    pair when keys match and the right event time is within
    ``tolerance`` AFTER the left event time (left-then-right causality,
    e.g. impression -> click attribution).

    Both sides carry watermarks and the join condition bounds
    right_ts relative to left_ts from BOTH directions, so Spark can
    evict join state — the requirement for a non-growing state store
    in a 24/7 job. Column names other than ``key`` must be disjoint.

    ``how="left_outer"`` / ``"full_outer"`` emit unmatched rows
    null-extended — but only once the watermark has passed their join
    window (ts + tolerance + watermark), because until then a matching
    row could still arrive; the unmatched-row report is therefore
    watermark-delayed by construction, not a bug. Outer emission
    REQUIRES the interval bound + both watermarks (Spark rejects an
    unbounded outer stream-stream join: state could never be declared
    complete)."""
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(
            f"how must be 'inner', 'left_outer' or 'full_outer', got {how!r}"
        )
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"interval {tolerance}"))
    )
    joined = lw.join(rw, cond, how)
    if how == "full_outer":
        # unmatched RIGHT rows carry the key only on the right side;
        # explicit select (withColumn would be ambiguous with two key
        # attributes in scope)
        others = [F.col(f"l.{c}") for c in left.columns if c != key] + [
            F.col(f"r.{c}") for c in right.columns if c != key
        ]
        return joined.select(
            F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key), *others
        )
    return joined.drop(F.col(f"r.{key}"))
