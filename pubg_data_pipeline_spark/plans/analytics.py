"""The reference's advanced-analytics pipelines over the native PUBG
flat-match schema (FIXTURES.md §A2), batch-first.

These are the same operator compositions the events-table queries
exercise, but bound to the reference's own column names so the
streaming app (streaming/app.py) can run them per micro-batch exactly
as the reference's foreachBatch does (reference:
spark_apps/advanced_analytics.py:91-281) — with the §4.2 fixes:
results stay DataFrames (no driver collect), the batch is persisted
once by the caller, and σ=0 z-scores are guarded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.functions.metrics import (
    derived_performance_cols,
    difficulty_score_expr,
    ranking_score_expr,
)
from pubg_data_pipeline_spark.operators import timeseries, windows, zscore


def player_ranking(perf: DataFrame, top_k: int = 10) -> DataFrame:
    """Grouped player stats -> weighted score -> top-k.

    reference: spark_apps/advanced_analytics.py:105-135 (aggregates
    :105-116, derived rates :117-118, polynomial :121-129, rank filter
    :132-135)."""
    stats = perf.groupBy("player_name", "account_id").agg(
        F.count(F.lit(1)).alias("matches_played"),
        F.avg("kills").alias("avg_kills"),
        F.avg("assists").alias("avg_assists"),
        F.avg("damage_dealt").alias("avg_damage"),
        F.avg("time_survived").alias("avg_survival"),
        F.avg("headshot_ratio").alias("avg_headshot_ratio"),
        F.sum("is_winner").alias("wins"),
        F.sum("top10_finish").alias("top10_finishes"),
        F.avg("ka_score").alias("avg_ka_score"),
        F.avg("dps").alias("avg_dps"),
    )
    stats = stats.withColumn(
        "win_rate", F.col("wins") / F.col("matches_played")
    ).withColumn("top10_rate", F.col("top10_finishes") / F.col("matches_played"))
    scored = stats.withColumn(
        "ranking_score",
        ranking_score_expr(
            F.col("avg_kills"),
            F.col("avg_assists"),
            F.col("avg_damage"),
            F.col("avg_survival"),
            F.col("win_rate"),
            F.col("top10_rate"),
            F.col("avg_headshot_ratio"),
        ),
    )
    ranked = windows.ranked(
        scored,
        [F.col("ranking_score").desc(), F.col("player_name").asc()],
        name="rank",
    )
    return ranked.filter(F.col("rank") <= top_k)


def anomaly_alerts(perf: DataFrame, threshold: float = 2.5) -> DataFrame:
    """Z-score anomalies over kills/damage/headshot_ratio.

    reference: spark_apps/advanced_analytics.py:174-228 (threshold
    :184; alert payload :207-220). Fully lazy: broadcast stats instead
    of collect()."""
    flagged = zscore.anomalies(
        perf, ["kills", "damage_dealt", "headshot_ratio"], threshold
    )
    return flagged.select(
        "player_name",
        "match_id",
        "kills",
        "damage_dealt",
        "headshot_ratio",
        F.col("kills_zscore").alias("kill_zscore"),
        F.col("damage_dealt_zscore").alias("damage_zscore"),
        F.col("headshot_ratio_zscore").alias("headshot_zscore"),
        F.lit("statistical_anomaly").alias("alert_type"),
        F.col("processed_at"),
    )


def hourly_aggregates(perf: DataFrame) -> DataFrame:
    """Hourly × mode × map aggregate table.

    reference: spark_apps/advanced_analytics.py:236-248 (hour bucketing
    via date_format at :236-238)."""
    return (
        perf.groupBy(
            timeseries.time_bucket(F.col("processed_at"), "hour").alias("hour"),
            "game_mode",
            "map_name",
        )
        .agg(
            F.count(F.lit(1)).alias("total_matches"),
            F.countDistinct("player_name").alias("unique_players"),
            F.avg("kills").alias("avg_kills"),
            F.avg("damage_dealt").alias("avg_damage"),
            F.avg("time_survived").alias("avg_survival"),
            F.sum("is_winner").alias("total_wins"),
            F.avg("headshot_ratio").alias("avg_headshot_ratio"),
        )
    )


def map_difficulty(perf: DataFrame) -> DataFrame:
    """Per-map difficulty ranking.

    reference: spark_apps/advanced_analytics.py:254-266 (formula
    :260-262, sort :263)."""
    agged = perf.groupBy("map_name").agg(
        F.avg("kills").alias("avg_kills"),
        F.avg("time_survived").alias("avg_survival"),
        F.avg("damage_dealt").alias("avg_damage"),
        F.count(F.lit(1)).alias("total_matches"),
    )
    return agged.withColumn(
        "difficulty_score",
        difficulty_score_expr(F.col("avg_kills"), F.col("avg_survival")),
    ).orderBy(F.col("difficulty_score").desc())


def moving_average_trends(perf: DataFrame) -> DataFrame:
    """Trailing-5 moving averages + trend flags per player.

    reference: spark_apps/advanced_analytics.py:141-168 — tie-broken
    by match_id (the reference orders by processed_at alone, which is
    nondeterministic within a batch)."""
    order = [F.col("processed_at").asc(), F.col("match_id").asc()]
    out = windows.moving_average(
        perf, ["player_name"], order, ["kills", "damage_dealt", "time_survived"], 5
    )
    out = windows.sequence_number(out, ["player_name"], order, "game_number")
    out = out.withColumn(
        "kill_trend", F.col("kills") - F.col("recent_5_avg_kills")
    ).withColumn("damage_trend", F.col("damage_dealt") - F.col("recent_5_avg_damage_dealt"))
    return out.filter(
        (F.col("game_number") >= 5)
        & ((F.abs(F.col("kill_trend")) > 2) | (F.abs(F.col("damage_trend")) > 500))
    )


def prepare_performance(flat_matches: DataFrame) -> DataFrame:
    """Flat match rows -> performance frame with derived metrics
    (reference: spark_apps/advanced_analytics.py:70-89)."""
    return derived_performance_cols(flat_matches)


def metric_points(
    flat_matches: DataFrame, players: DataFrame | None = None
) -> dict[str, DataFrame]:
    """Per-message metric fan-out (SURVEY.md §2.10 X1): the SINK-shape
    flat match table (streaming.etl.extract_matches_table) -> the four
    tag/field measurement families the reference's collector builds
    row-at-a-time (reference: monitoring/metrics_collector.py:56-152 —
    player_stats :68-73, match_info :87-96, player_performance_v2
    :101-120, player_kda :128-137), with the exact tag and field names.
    Each family is one column-pruned projection of the same scan; any
    TSDB/JDBC sink can consume them via foreachBatch."""
    from pubg_data_pipeline_spark.functions.metrics import kda_expr

    m = flat_matches
    families = {
        "match_info": m.select(
            # tags
            "player_name", "match_id", "game_mode", "map_name",
            # fields
            "duration_seconds",
            "duration_minutes",
            F.col("players_count").alias("participants_count"),
            "teams_count",
            F.col("processed_at").alias("time"),
        ),
        "player_performance_v2": m.select(
            "player_name", "match_id", "game_mode", "map_name",
            F.col("player_kills").alias("kills"),
            F.col("player_assists").alias("assists"),
            F.col("player_headshot_kills").alias("headshot_kills"),
            F.col("player_damage_dealt").alias("damage_dealt"),
            F.col("player_time_survived").alias("time_survived"),
            F.col("player_heals").alias("heals"),
            F.col("player_boosts").alias("boosts"),
            F.col("player_walk_distance").alias("walk_distance"),
            F.col("player_ride_distance").alias("ride_distance"),
            F.col("player_win_place").alias("win_place"),
            F.col("player_longest_kill").alias("longest_kill"),
            F.col("player_weapons_acquired").alias("weapons_acquired"),
            F.col("processed_at").alias("time"),
        ),
        "player_kda": m.select(
            "player_name", "match_id", "game_mode",
            kda_expr(
                F.col("player_kills"), F.col("player_assists"), F.col("player_death_type")
            ).alias("kda_ratio"),
            F.col("player_kills").alias("kills"),
            F.when(F.col("player_death_type") == "alive", 0).otherwise(1).alias("deaths"),
            F.col("player_assists").alias("assists"),
            F.col("processed_at").alias("time"),
        ),
    }
    if players is not None:
        families["player_stats"] = players.select(
            "player_name", "account_id",
            "total_matches_count",
            F.col("processed_at").alias("time"),
        )
    return families
