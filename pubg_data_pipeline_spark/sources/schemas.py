"""Schema registry for the PUBG telemetry envelope.

Re-declares the reference's explicit StructType schemas (reference:
spark_apps/pubg_streaming.py:28-143 for the full envelope;
spark_apps/advanced_analytics.py:36-62 is a narrower projection of the
same shape). Schema-on-read, never inferred; all fields nullable so
malformed JSON degrades to nulls (PERMISSIVE parse), matching the
reference's behavior.

The envelope is one Kafka JSON message:
``{"player": {...}, "matches": [{..., "player_performance": {...}}]}``
assembled by the reference producer (reference: producer/producer.py:215)
which denormalizes per-player match performance into each match record
(producer/producer.py:162-204) — that producer-side roster scan is
semantically an inner equi-join, which this engine restores as a real
join in the normalized model (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def _field(name: str, dtype) -> StructField:
    return StructField(name, dtype, nullable=True)


# reference: spark_apps/pubg_streaming.py:28-60 (16 fields)
PLAYER_SCHEMA = StructType(
    [
        _field("player_name", StringType()),
        _field("account_id", StringType()),
        _field("shard_id", StringType()),
        _field("title_id", StringType()),
        _field("patch_version", StringType()),
        _field("ban_type", StringType()),
        _field("clan_id", StringType()),
        _field("stats", StringType()),  # opaque JSON-in-string
        _field("rank", StringType()),  # opaque JSON-in-string
        _field("total_matches_count", IntegerType()),
        _field("match_ids", ArrayType(StringType())),
        _field("data_collected_at", StringType()),  # "yyyy-MM-dd HH:mm:ss"
        _field("account_created_at", StringType()),
        _field("account_updated_at", StringType()),
        _field("api_links", StringType()),
        _field("all_raw_attributes", StringType()),
    ]
)

# reference: spark_apps/pubg_streaming.py:100-134 (24-field perf struct)
PLAYER_PERFORMANCE_SCHEMA = StructType(
    [
        _field("kills", IntegerType()),
        _field("assists", IntegerType()),
        _field("headshot_kills", IntegerType()),
        _field("longest_kill", DoubleType()),
        _field("road_kills", IntegerType()),
        _field("team_kills", IntegerType()),
        _field("damage_dealt", DoubleType()),
        _field("time_survived", DoubleType()),
        _field("dbnos", IntegerType()),
        _field("death_type", StringType()),
        _field("heals", IntegerType()),
        _field("boosts", IntegerType()),
        _field("revives", IntegerType()),
        _field("walk_distance", DoubleType()),
        _field("ride_distance", DoubleType()),
        _field("swim_distance", DoubleType()),
        _field("win_place", IntegerType()),
        _field("kill_place", IntegerType()),
        _field("weapons_acquired", IntegerType()),
        _field("vehicle_destroys", IntegerType()),
        _field("participant_name", StringType()),
        _field("participant_id", StringType()),
    ]
)

# reference: spark_apps/pubg_streaming.py:62-135 (21 top-level fields + perf)
MATCH_SCHEMA = ArrayType(
    StructType(
        [
            _field("match_id", StringType()),
            _field("type", StringType()),
            _field("game_mode", StringType()),
            _field("map_name", StringType()),
            _field("duration", IntegerType()),
            _field("title_id", StringType()),
            _field("shard_id", StringType()),
            _field("season_state", StringType()),
            _field("is_custom_match", BooleanType()),
            _field("tags", StringType()),
            _field("created_at", StringType()),
            _field("patch_version", StringType()),
            _field("match_type", StringType()),
            _field("telemetry_url", StringType()),
            _field("rosters_count", IntegerType()),
            _field("participants_count", IntegerType()),
            _field("assets_count", IntegerType()),
            _field("api_links", StringType()),
            _field("all_raw_attributes", StringType()),
            _field("relationships_summary", StringType()),
            _field("player_performance", PLAYER_PERFORMANCE_SCHEMA),
        ]
    )
)

# reference: spark_apps/pubg_streaming.py:140-143
ENVELOPE_SCHEMA = StructType(
    [
        _field("player", PLAYER_SCHEMA),
        _field("matches", MATCH_SCHEMA),
    ]
)
