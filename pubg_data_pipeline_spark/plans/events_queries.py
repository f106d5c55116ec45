"""Reference-surface queries over the synthetic ``events`` table.

Per FIXTURES.md §B the ``events`` table stands in for the reference's
flat match-performance stream: ``user_id`` ≈ player, ``event_type`` ≈
game_mode/map analog, ``value`` ≈ kills/damage analog, ``ts`` ≈
processed_at (event time), ``props`` ≈ the JSON-blob columns. Each
query here re-expresses one operator family from SURVEY.md §2 with its
reference citation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.functions.metrics import (
    difficulty_score_expr,
    ranking_score_expr,
    severity_expr,
)
from pubg_data_pipeline_spark.operators import dedup, timeseries, windows, zscore
from pubg_data_pipeline_spark.plans.base import QuerySpec, exact_scaled, sql_scaled
from pubg_data_pipeline_spark.sources.tables import load_table

_K = r'"k":\s*(\d+)'  # extract props.k (oracle uses regexp; Spark uses get_json_object)
_V_CENTS = sql_scaled("value", 2)


def _perf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + parsed props.k — the analog of the reference's flat
    performance projection (spark_apps/advanced_analytics.py:70-89)."""
    return load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )


# --------------------------------------------------------------- flagship

def player_ranking_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: grouped multi-agg -> weighted ranking score -> top-10.

    reference: spark_apps/advanced_analytics.py:105-135 (A1-A2 grouped
    aggregates, W1 row_number ranking, W5 rank<=10 filter) with the
    exact ranking polynomial of :121-129. The unpartitioned window is
    applied post-aggregation (one row per player), not on raw rows.
    """
    stats = (
        _perf(spark, sf_dir)
        .withColumn("a", F.expr("k div 2"))  # assists analog
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("games_played"),
            F.sum("k").alias("k_sum"),
            F.sum("a").alias("a_sum"),
            F.sum(exact_scaled(F.col("value"))).alias("v_cents"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("wins"),
            F.sum(F.when(F.col("value") >= 150.0, 1).otherwise(0)).alias("top10"),
        )
    )
    # events-analog metric mapping (FIXTURES.md §B): kills=k,
    # assists=k div 2, damage=value, survival=value, headshot=k/100
    avg_kills = F.col("k_sum") * 1.0 / F.col("games_played")
    avg_assists = F.col("a_sum") * 1.0 / F.col("games_played")
    avg_damage = F.col("v_cents") / 100.0 / F.col("games_played")
    win_rate = F.col("wins") * 1.0 / F.col("games_played")
    top10_rate = F.col("top10") * 1.0 / F.col("games_played")
    avg_headshot = F.col("k_sum") * 1.0 / F.col("games_played") / 100.0
    scored = stats.select(
        "user_id",
        "games_played",
        "wins",
        F.round(avg_kills, 4).alias("avg_kills"),
        F.round(avg_damage, 4).alias("avg_damage"),
        F.round(win_rate, 4).alias("win_rate"),
        F.round(
            ranking_score_expr(
                avg_kills, avg_assists, avg_damage, avg_damage, win_rate, top10_rate, avg_headshot
            ),
            4,
        ).alias("ranking_score"),
    )
    ranked = windows.ranked(
        scored, [F.col("ranking_score").desc(), F.col("user_id").asc()], name="rank"
    )
    return ranked.filter(F.col("rank") <= 10)


_RANKING_SQL = f"""
WITH perf AS (
  SELECT user_id, CAST(regexp_extract(props, '{_K}', 1) AS INT) AS k,
         CAST(regexp_extract(props, '{_K}', 1) AS INT) // 2 AS a,
         value, event_type
  FROM events
), stats AS (
  SELECT user_id,
         COUNT(*) AS games_played,
         CAST(SUM(k) AS BIGINT) AS k_sum,
         CAST(SUM(a) AS BIGINT) AS a_sum,
         CAST(SUM({_V_CENTS}) AS BIGINT) AS v_cents,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
         CAST(SUM(CASE WHEN value >= 150.0 THEN 1 ELSE 0 END) AS BIGINT) AS top10
  FROM perf GROUP BY user_id
), scored AS (
  SELECT user_id, games_played, wins,
         ROUND(k_sum * 1.0 / games_played, 4) AS avg_kills,
         ROUND(v_cents / 100.0 / games_played, 4) AS avg_damage,
         ROUND(wins * 1.0 / games_played, 4) AS win_rate,
         ROUND((k_sum * 1.0 / games_played) * 10
             + (a_sum * 1.0 / games_played) * 5
             + (v_cents / 100.0 / games_played) * 0.01
             + (v_cents / 100.0 / games_played) * 0.005
             + (wins * 1.0 / games_played) * 100
             + (top10 * 1.0 / games_played) * 50
             + (k_sum * 1.0 / games_played / 100.0) * 30, 4) AS ranking_score
  FROM stats
)
SELECT * FROM (
  SELECT user_id, games_played, wins, avg_kills, avg_damage, win_rate, ranking_score,
         ROW_NUMBER() OVER (ORDER BY ranking_score DESC, user_id) AS rank
  FROM scored
) WHERE rank <= 10
"""


# --------------------------------------------------- aggregates (A1-A8)

def hourly_event_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key hourly aggregate (A5/A6): groupBy(hour, type) with
    count/countDistinct/sum/avg. reference:
    spark_apps/advanced_analytics.py:236-248."""
    ev = load_table(spark, sf_dir, "events")
    agged = ev.groupBy(
        timeseries.time_bucket(F.col("ts"), "hour").alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct("user_id").alias("unique_users"),
        F.sum(exact_scaled(F.col("value"))).alias("v_cents"),
    )
    return agged.select(
        "hour",
        "event_type",
        "total_events",
        "unique_users",
        F.round(F.col("v_cents") / 100.0, 2).alias("total_value"),
        F.round(F.col("v_cents") / 100.0 / F.col("total_events"), 4).alias("avg_value"),
    )


_HOURLY_SQL = f"""
SELECT hour, event_type, total_events, unique_users,
       ROUND(v_cents / 100.0, 2) AS total_value,
       ROUND(v_cents / 100.0 / total_events, 4) AS avg_value
FROM (
  SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
         COUNT(*) AS total_events,
         COUNT(DISTINCT user_id) AS unique_users,
         CAST(SUM({_V_CENTS}) AS BIGINT) AS v_cents
  FROM events GROUP BY 1, 2
)
"""


def event_type_difficulty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-difficulty analog (A7): grouped avgs + difficulty formula.

    reference: spark_apps/advanced_analytics.py:254-263 —
    ``(1/(avg_kills+1)) * (1/(avg_survival+1)) * 100``."""
    s = (
        _perf(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.sum(exact_scaled(F.col("value"))).alias("v_cents"),
        )
    )
    avg_k = F.col("k_sum") * 1.0 / F.col("n_events")
    avg_v_min = F.col("v_cents") / 100.0 / F.col("n_events") / 60.0
    return s.select(
        "event_type",
        "n_events",
        F.round(avg_k, 4).alias("avg_k"),
        F.round(F.col("v_cents") / 100.0 / F.col("n_events"), 4).alias("avg_value"),
        F.round(difficulty_score_expr(avg_k, avg_v_min), 6).alias("difficulty_score"),
    )


_DIFFICULTY_SQL = f"""
WITH perf AS (
  SELECT event_type, CAST(regexp_extract(props, '{_K}', 1) AS INT) AS k, value FROM events
), s AS (
  SELECT event_type, COUNT(*) AS n_events,
         CAST(SUM(k) AS BIGINT) AS k_sum,
         CAST(SUM({_V_CENTS}) AS BIGINT) AS v_cents
  FROM perf GROUP BY 1
)
SELECT event_type, n_events,
       ROUND(k_sum * 1.0 / n_events, 4) AS avg_k,
       ROUND(v_cents / 100.0 / n_events, 4) AS avg_value,
       ROUND((1.0 / (k_sum * 1.0 / n_events + 1)) * (1.0 / (v_cents / 100.0 / n_events / 60.0 + 1)) * 100, 6)
         AS difficulty_score
FROM s
"""


def global_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ungrouped agg incl. stddev (A3/A4). reference:
    spark_apps/advanced_analytics.py:174-181 — kept as a 1-row
    DataFrame instead of ``.collect()[0]``."""
    ev = load_table(spark, sf_dir, "events")
    agged = ev.agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct("user_id").alias("unique_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum(exact_scaled(F.col("value"))).alias("v_cents"),
        F.stddev("value").alias("sd"),
    )
    return agged.select(
        "total_events",
        "unique_users",
        "min_value",
        "max_value",
        F.round(F.col("v_cents") / 100.0 / F.col("total_events"), 4).alias("avg_value"),
        F.round("sd", 4).alias("stddev_value"),
    )


_GLOBAL_STATS_SQL = f"""
SELECT total_events, unique_users, min_value, max_value,
       ROUND(v_cents / 100.0 / total_events, 4) AS avg_value,
       ROUND(sd, 4) AS stddev_value
FROM (
  SELECT COUNT(*) AS total_events, COUNT(DISTINCT user_id) AS unique_users,
         MIN(value) AS min_value, MAX(value) AS max_value,
         CAST(SUM({_V_CENTS}) AS BIGINT) AS v_cents,
         STDDEV_SAMP(value) AS sd
  FROM events
)
"""


# ------------------------------------------------ windows (W1-W7)

def moving_avg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-5 moving average + sequence number + trend filter.

    reference: spark_apps/advanced_analytics.py:141-161 (W2 rowsBetween
    (-4,0) moving averages, W3 game_number, W4 trend filter after >=5
    games); ordering tie-broken by event_id for determinism."""
    ev = load_table(spark, sf_dir, "events")
    out = windows.trend_detection(
        ev,
        partition_by=["user_id"],
        order_by=[F.col("ts").asc(), F.col("event_id").asc()],
        value_col="value",
        window_size=5,
        min_rows=5,
        threshold=50.0,
    )
    return out.select(
        "event_id",
        "user_id",
        "seq_no",
        F.round("recent_5_avg_value", 4).alias("recent5_avg"),
        F.round("value_trend", 4).alias("trend"),
    )


_TREND_SQL = """
WITH w AS (
  SELECT event_id, user_id, value,
         AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mavg,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq_no
  FROM events
)
SELECT event_id, user_id, seq_no,
       ROUND(mavg, 4) AS recent5_avg,
       ROUND(value - mavg, 4) AS trend
FROM w WHERE seq_no >= 5 AND ABS(value - mavg) > 50
"""


# -------------------------------------------- dedup / anomaly (D1-D5)

def first_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic batch form of the streaming dedup (D1/D2).

    reference: spark_apps/pubg_streaming.py:247,250 — dropDuplicates on
    key columns; here the kept row is pinned to min(event_id) so the
    oracle can reproduce the choice (plain dropDuplicates keeps an
    arbitrary row)."""
    ev = load_table(spark, sf_dir, "events")
    kept = dedup.exact_dedup(ev, ["user_id", "event_type"], "event_id")
    return kept.select("event_id", "user_id", "event_type", "value")


_DEDUP_SQL = """
SELECT event_id, user_id, event_type, value FROM (
  SELECT event_id, user_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
  FROM events
) WHERE rn = 1
"""


def zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection (D3), crossJoin(broadcast(stats)) form.

    reference: spark_apps/advanced_analytics.py:174-196 (threshold at
    :184; we use 1.5 because `value` is near-uniform so |z| caps around
    1.7 — same operator, tuned to produce a non-trivial result set).
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    flagged = zscore.anomalies(ev, ["value"], threshold=1.5)
    return flagged.select("event_id", "value", F.round("value_zscore", 4).alias("value_zscore"))


_ZSCORE_SQL = """
WITH st AS (SELECT AVG(value) AS mu, STDDEV_SAMP(value) AS sd FROM events)
SELECT event_id, value,
       ROUND(CASE WHEN sd > 0 THEN (value - mu) / sd ELSE 0.0 END, 4) AS value_zscore
FROM events CROSS JOIN st
WHERE ABS(CASE WHEN sd > 0 THEN (value - mu) / sd ELSE 0.0 END) > 1.5
"""


def alert_severity_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Severity CASE chain (P16) applied to the events analog
    (kills := props.k, damage := value*20, z := value/60).

    reference: monitoring/alert_manager.py:366-396 — HIGH: kills>=20 or
    damage>=4000 or z>=4; MEDIUM: kills>=15 or damage>=2500 or z>=3."""
    perf = _perf(spark, sf_dir).withColumn("damage", F.col("value") * 20)
    classified = perf.withColumn(
        "severity", severity_expr(F.col("k"), F.col("damage"), F.col("value") / 60.0)
    )
    agged = classified.groupBy("severity").agg(
        F.count(F.lit(1)).alias("alert_count"),
        F.sum(exact_scaled(F.col("damage"))).alias("d_cents"),
    )
    return agged.select(
        "severity",
        "alert_count",
        F.round(F.col("d_cents") / 100.0 / F.col("alert_count"), 4).alias("avg_damage"),
    )


_SEVERITY_SQL = f"""
WITH perf AS (
  SELECT CAST(regexp_extract(props, '{_K}', 1) AS INT) AS k, value, value * 20 AS damage
  FROM events
), classified AS (
  SELECT k, damage,
         CASE WHEN k >= 20 OR damage >= 4000 OR value / 60.0 >= 4 THEN 'HIGH'
              WHEN k >= 15 OR damage >= 2500 OR value / 60.0 >= 3 THEN 'MEDIUM'
              ELSE 'LOW' END AS severity
  FROM perf
)
SELECT severity, COUNT(*) AS alert_count,
       ROUND(CAST(SUM({sql_scaled('damage', 2)}) AS BIGINT) / 100.0 / COUNT(*), 4) AS avg_damage
FROM classified GROUP BY severity
"""


def alert_notification_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Notification formatting (X8), engine-side: the channel-agnostic
    alert payload for every HIGH/MEDIUM row — severity config
    (color + emoji name), a title line, and the conditional
    performance block.

    reference: monitoring/alert_manager.py:96-180 — the Python
    formatter builds severity_config {HIGH: 🚨/#FF0000, MEDIUM:
    ⚠️/#FFA500, LOW: ℹ️/#00FF00} (:103-107), appends per-metric lines
    only when the metric is present (:117-124), and z-score lines only
    beyond 2σ (:130-136), falling back to a 'no data' value (:158).
    All of that is presentation logic a row-at-a-time Python service
    re-derives per alert; here it is ONE column expression pass
    (``concat_ws`` drops the absent-metric NULLs exactly like the
    reference's if-guards), so payloads materialize at engine
    throughput and only the webhook POST stays out-of-engine."""
    perf = _perf(spark, sf_dir).withColumn("damage", F.col("value") * 20)
    z = F.col("value") / 60.0
    cls = perf.withColumn(
        "severity", severity_expr(F.col("k"), F.col("damage"), z)
    ).filter(F.col("severity").isin("HIGH", "MEDIUM"))
    color = F.when(F.col("severity") == "HIGH", F.lit("#FF0000")).otherwise(
        F.lit("#FFA500")
    )
    emoji = F.when(F.col("severity") == "HIGH", F.lit("rotating_light")).otherwise(
        F.lit("warning")
    )
    kills_line = F.when(
        F.col("k") > 0, F.concat(F.lit("kills: "), F.col("k").cast("string"))
    )
    damage_line = F.when(
        F.col("damage") > 0,
        F.concat(
            F.lit("damage: "), F.round("damage", 0).cast("long").cast("string")
        ),
    )
    z_line = F.when(
        F.abs(z) > 2,
        F.concat(F.lit("zscore: "), F.round(z, 1).cast("string"), F.lit("σ")),
    )
    body = F.concat_ws("\n", kills_line, damage_line, z_line)
    return cls.select(
        "event_id",
        "user_id",
        "severity",
        color.alias("color"),
        emoji.alias("emoji"),
        F.concat(
            F.col("severity"),
            F.lit(" severity anomaly: user "),
            F.col("user_id").cast("string"),
        ).alias("title"),
        F.coalesce(F.nullif(body, F.lit("")), F.lit("no data")).alias("body"),
    )


_NOTIFICATION_SQL = f"""
WITH perf AS (
  SELECT event_id, user_id,
         CAST(regexp_extract(props, '{_K}', 1) AS INT) AS k,
         value, value * 20 AS damage
  FROM events
), classified AS (
  SELECT *,
         CASE WHEN k >= 20 OR damage >= 4000 OR value / 60.0 >= 4 THEN 'HIGH'
              WHEN k >= 15 OR damage >= 2500 OR value / 60.0 >= 3 THEN 'MEDIUM'
              ELSE 'LOW' END AS severity
  FROM perf
)
SELECT event_id, user_id, severity,
       CASE WHEN severity = 'HIGH' THEN '#FF0000' ELSE '#FFA500' END AS color,
       CASE WHEN severity = 'HIGH' THEN 'rotating_light' ELSE 'warning' END AS emoji,
       severity || ' severity anomaly: user ' || CAST(user_id AS VARCHAR) AS title,
       COALESCE(NULLIF(concat_ws(chr(10),
         CASE WHEN k > 0 THEN 'kills: ' || CAST(k AS VARCHAR) END,
         CASE WHEN damage > 0
              THEN 'damage: ' || CAST(CAST(ROUND(damage, 0) AS BIGINT) AS VARCHAR) END,
         CASE WHEN ABS(value / 60.0) > 2
              THEN 'zscore: ' || CAST(ROUND(value / 60.0, 1) AS VARCHAR) || 'σ' END
       ), ''), 'no data') AS body
FROM classified
WHERE severity IN ('HIGH', 'MEDIUM')
"""


def kda_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KDA derived metric (P15) as a pure Column expression.

    reference: monitoring/metrics_collector.py:122-126 — computed
    row-at-a-time in Python there; here it's
    ``(kills + assists) / greatest(deaths, 1)`` with the 'alive'
    special case mapped to event_type = 'signup'."""
    perf = _perf(spark, sf_dir)
    deaths = F.when(F.col("event_type") == "signup", 0).otherwise(1)
    kda = (F.col("k") + F.expr("k div 2")) / F.greatest(deaths, F.lit(1))
    per_user = (
        perf.withColumn("kda", kda)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("games"), F.sum("kda").alias("kda_sum"))
    )
    return per_user.select(
        "user_id", "games", F.round(F.col("kda_sum") / F.col("games"), 4).alias("avg_kda")
    )


_KDA_SQL = f"""
WITH perf AS (
  SELECT user_id, CAST(regexp_extract(props, '{_K}', 1) AS INT) AS k, event_type FROM events
), scored AS (
  SELECT user_id,
         (k + k // 2) * 1.0 / GREATEST(CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END, 1) AS kda
  FROM perf
)
SELECT user_id, COUNT(*) AS games, ROUND(SUM(kda) / COUNT(*), 4) AS avg_kda
FROM scored GROUP BY user_id
"""


def severity_hourly_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly alert-summary counters (D5): total / high / medium alert
    counts per hour — the reference accumulates these in process-local
    dicts and resets each hour (reference:
    monitoring/alert_manager.py:398-461, 1 h check :520-524); here one
    windowed conditional aggregation produces every hour's summary."""
    perf = _perf(spark, sf_dir).withColumn("damage", F.col("value") * 20)
    classified = perf.withColumn(
        "severity", severity_expr(F.col("k"), F.col("damage"), F.col("value") / 60.0)
    )
    return classified.groupBy(
        timeseries.time_bucket(F.col("ts"), "hour").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("total_alerts"),
        F.sum(F.when(F.col("severity") == "HIGH", 1).otherwise(0)).alias("high_severity"),
        F.sum(F.when(F.col("severity") == "MEDIUM", 1).otherwise(0)).alias("medium_severity"),
    )


_SEVERITY_HOURLY_SQL = f"""
WITH classified AS (
  SELECT ts,
         CASE WHEN k >= 20 OR damage >= 4000 OR value / 60.0 >= 4 THEN 'HIGH'
              WHEN k >= 15 OR damage >= 2500 OR value / 60.0 >= 3 THEN 'MEDIUM'
              ELSE 'LOW' END AS severity
  FROM (SELECT ts, value, value * 20 AS damage,
               CAST(regexp_extract(props, '{_K}', 1) AS INT) AS k
        FROM events)
)
SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
       COUNT(*) AS total_alerts,
       CAST(SUM(CASE WHEN severity = 'HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_severity,
       CAST(SUM(CASE WHEN severity = 'MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium_severity
FROM classified GROUP BY 1
"""


# ------------------------------------------- time series (Q2-Q13 surface)

def hourly_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL ``GROUP BY time(1h) fill(null)`` (dashboard Q2 —
    monitoring/grafana/.../advanced_analytics_dashboard.json:55):
    generated hour spine left-joined to the hourly counts; missing
    buckets surface as null."""
    ev = load_table(spark, sf_dir, "events")
    return timeseries.spine_filled_agg(
        ev, "ts", [F.count(F.lit(1)).alias("total_events")], "hour", bucket_name="bucket"
    )


_SPINE_SQL = """
WITH b AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS t FROM b
), agg AS (
  SELECT date_trunc('hour', ts) AS t, COUNT(*) AS total_events FROM events GROUP BY 1
)
SELECT strftime(spine.t, '%Y-%m-%d %H') AS bucket, agg.total_events
FROM spine LEFT JOIN agg ON spine.t = agg.t
"""


def last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfluxQL/Flux ``last()`` per series (dashboard Q6/Q8/Q12) as
    ``max_by(value, ts)`` — single hash agg, no window sort."""
    ev = load_table(spark, sf_dir, "events")
    out = timeseries.last_by(ev, ["user_id"], "ts", ["value", "event_type"])
    return out.select(
        "user_id",
        F.col("last_value"),
        F.col("last_event_type"),
        F.date_format("max_ts", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
    )


_LAST_SQL = """
SELECT user_id,
       max_by(value, ts) AS last_value,
       max_by(event_type, ts) AS last_event_type,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
FROM events GROUP BY user_id
"""


def recent_events_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ORDER BY time DESC LIMIT 10`` (dashboard Q7) — plans as
    TakeOrderedAndProject (two-phase distributed top-k)."""
    ev = load_table(spark, sf_dir, "events")
    top = timeseries.recent_top_k(ev, "ts", "event_id", 10)
    return top.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    )


_RECENT_SQL = """
SELECT event_id, user_id, event_type, value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM events ORDER BY ts DESC, event_id DESC LIMIT 10
"""


# -------------------------------------------------- JSON / projections

def high_k_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-blob field extraction + predicate (J5/P11). reference:
    spark_apps/pubg_streaming.py:43-44,56-59 carry ``stats``/``rank``
    as opaque JSON strings; ``get_json_object`` pulls fields on demand."""
    return _perf(spark, sf_dir).filter(F.col("k") >= 90).select("event_id", "k")


_HIGH_K_SQL = f"""
SELECT event_id, CAST(regexp_extract(props, '{_K}', 1) AS INT) AS k
FROM events WHERE CAST(regexp_extract(props, '{_K}', 1) AS INT) >= 90
"""


def union_event_extracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two parallel extracts of one source (set-op
    surface; SURVEY.md §2.7 — the reference's player/match extracts
    from one parsed stream, spark_apps/pubg_streaming.py:148-233, are
    the natural use case)."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.lit("signup").alias("kind"), "user_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.lit("purchase").alias("kind"), "user_id", "value"
    )
    unioned = signups.unionByName(purchases)
    agged = unioned.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(exact_scaled(F.col("value"))).alias("v_cents"),
    )
    return agged.select(
        "kind", "n_events", "n_users", F.round(F.col("v_cents") / 100.0, 2).alias("total_value")
    )


_UNION_SQL = f"""
WITH u AS (
  SELECT 'signup' AS kind, user_id, value FROM events WHERE event_type = 'signup'
  UNION ALL
  SELECT 'purchase' AS kind, user_id, value FROM events WHERE event_type = 'purchase'
)
SELECT kind, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
       ROUND(CAST(SUM({_V_CENTS}) AS BIGINT) / 100.0, 2) AS total_value
FROM u GROUP BY kind
"""


def purchase_last_signup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators.timeseries.as_of_join): each
    purchase event picks the user's latest signup event at-or-before
    it — the point-in-time attribution lookup. Oracle is DuckDB's
    native ASOF LEFT JOIN; (user_id, ts) is unique in the synthetic
    data so the match is unambiguous."""
    from pubg_data_pipeline_spark.operators.timeseries import as_of_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event_id")
    )
    joined = as_of_join(
        purchases,
        signups,
        keys=["user_id"],
        right_cols=["signup_event_id", "ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("right_signup_event_id").alias("signup_event_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("right_ts"))).alias("gap_us"),
    )


_ASOF_SQL = """
SELECT a.event_id, a.user_id, b.event_id AS signup_event_id,
       CAST(epoch_us(a.ts) - epoch_us(b.ts) AS BIGINT) AS gap_us
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') a
ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
"""


def event_user_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic (operators.skew.skew_report): the top-10
    heaviest users by event count with table share and cumulative
    share — the pre-flight numbers behind the salting decision the
    salted aggregate/join queries then demonstrate. Top-N is
    TakeOrderedAndProject; the cumulative window runs over 10 rows."""
    from pubg_data_pipeline_spark.operators.skew import skew_report

    ev = load_table(spark, sf_dir, "events")
    return skew_report(ev, "user_id", top_n=10)


_SKEW_REPORT_SQL = """
WITH c AS (
  SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
), t AS (
  SELECT COUNT(*) AS total FROM events
), top AS (
  SELECT * FROM c ORDER BY n_rows DESC, user_id LIMIT 10
)
SELECT user_id, n_rows,
       ROUND(n_rows / total * 100, 4) AS share_pct,
       ROUND(SUM(n_rows) OVER w / total * 100, 4) AS cum_share_pct,
       CAST(ROW_NUMBER() OVER w AS INT) AS rank
FROM top CROSS JOIN t
WINDOW w AS (ORDER BY n_rows DESC, user_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def purchase_signup_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas merge_asof parity): the
    same attribution lookup, but a signup more than 3 days before the
    purchase no longer attributes — the match nulls out while the
    purchase row survives. The tolerance is a post-pick mask in
    operators.timeseries.as_of_join (zero extra shuffles); the oracle
    applies the identical mask over DuckDB's native ASOF JOIN."""
    from pubg_data_pipeline_spark.operators.timeseries import as_of_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event_id")
    )
    tol = 3 * 24 * 3600
    joined = as_of_join(
        purchases,
        signups,
        keys=["user_id"],
        right_cols=["signup_event_id", "ts"],
        tolerance_seconds=tol,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("right_signup_event_id").alias("signup_event_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("right_ts"))).alias("gap_us"),
    )


_ASOF_TOL_SQL = """
SELECT a.event_id, a.user_id,
       CASE WHEN epoch_us(a.ts) - epoch_us(b.ts) <= 259200000000
            THEN b.event_id END AS signup_event_id,
       CASE WHEN epoch_us(a.ts) - epoch_us(b.ts) <= 259200000000
            THEN CAST(epoch_us(a.ts) - epoch_us(b.ts) AS BIGINT) END AS gap_us
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') a
ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
"""


def incident_window_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded interval join (operators.timeseries.interval_join): count
    and max of purchase events inside the ±5-minute window around each
    high-value error "incident". Without the time-band equi key this
    is a big-big range join Catalyst can only plan as a broadcast
    nested loop; with it both sides hash-partition on the 10-minute
    bucket and the range predicate filters post-join. Incidents with
    no purchases in window are kept via the |incidents|-bounded
    aggregate-and-join-back composition, never an outer join on the
    point table. max (not sum) keeps the value column exact across
    engines regardless of float summation order."""
    ev = load_table(spark, sf_dir, "events")
    incidents = ev.filter((F.col("event_type") == "error") & (F.col("value") > 250)).select(
        F.col("event_id").alias("incident_id"),
        (F.col("ts") - F.expr("INTERVAL 5 MINUTES")).alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("win_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    matched = timeseries.interval_join(
        purchases, incidents, "purchase_ts", "win_start", "win_end", bucket_seconds=600
    )
    agg = matched.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.max("purchase_value"), 2).alias("max_purchase_value"),
    )
    return (
        incidents.select("incident_id")
        .join(agg, "incident_id", "left")
        .select(
            "incident_id",
            F.coalesce(F.col("n_purchases"), F.lit(0)).cast("long").alias("n_purchases"),
            "max_purchase_value",
        )
    )


_INTERVAL_JOIN_SQL = """
WITH incidents AS (
  SELECT event_id AS incident_id,
         ts - INTERVAL 5 MINUTE AS win_start,
         ts + INTERVAL 5 MINUTE AS win_end
  FROM events WHERE event_type = 'error' AND value > 250
), purchases AS (
  SELECT ts AS purchase_ts, value AS purchase_value FROM events WHERE event_type = 'purchase'
), matched AS (
  SELECT incident_id, COUNT(*) AS n_purchases,
         ROUND(MAX(purchase_value), 2) AS max_purchase_value
  FROM incidents JOIN purchases
    ON purchase_ts >= win_start AND purchase_ts <= win_end
  GROUP BY 1
)
SELECT i.incident_id,
       CAST(COALESCE(m.n_purchases, 0) AS BIGINT) AS n_purchases,
       m.max_purchase_value
FROM incidents i LEFT JOIN matched m USING (incident_id)
"""


def event_type_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators.skew.salted_aggregate):
    each hot grouping key spreads over 16 salt buckets in phase 1, the
    partials merge on the real key in phase 2. Decomposable aggregates
    only (count/sum/max here); the value sum rides the exact
    scaled-integer lane so the salted result is bit-identical to the
    oracle's direct GROUP BY regardless of partitioning or salt."""
    from pubg_data_pipeline_spark.operators import skew

    ev = load_table(spark, sf_dir, "events").withColumn(
        "v_cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    out = skew.salted_aggregate(
        ev,
        ["event_type"],
        {
            "n_events": ("*", "count"),  # COUNT(*) — matches the oracle
            "scaled_total": ("v_cents", "sum"),
            "max_cents": ("v_cents", "max"),
        },
    )
    return out.select(
        "event_type",
        "n_events",
        F.round(F.col("scaled_total") / 100.0, 2).alias("total_value"),
        F.round(F.col("max_cents") / 100.0, 2).alias("max_value"),
    )


_SALTED_AGG_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 2) AS total_value,
       ROUND(MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0, 2) AS max_value
FROM events GROUP BY event_type
"""


def event_enrich_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join (operators.skew.salted_join): events join their
    per-type stats on event_type — a 5-distinct-value key, the exact
    hot-key shape where a plain shuffle join funnels each type into one
    reducer. The salted form spreads every hot key over 16 buckets by
    replicating the (tiny) dim side; result is row-identical to the
    oracle's direct join regardless of salt (pinned by the hash gate).
    """
    from pubg_data_pipeline_spark.operators import skew

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("v_cents"),
    )
    dim = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_type"), F.sum("v_cents").alias("type_cents")
    )
    out = skew.salted_join(ev, dim, "event_type")
    return out.select(
        "event_id",
        "event_type",
        F.round(F.col("v_cents") / 100.0, 2).alias("value"),
        "n_type",
        F.round(F.col("type_cents") / 100.0, 2).alias("type_total"),
    )


_SALTED_JOIN_SQL = """
WITH e AS (
  SELECT event_id, event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS v_cents
  FROM events
), d AS (
  SELECT event_type, COUNT(*) AS n_type, SUM(v_cents) AS type_cents
  FROM e GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       ROUND(e.v_cents / 100.0, 2) AS value,
       d.n_type,
       ROUND(CAST(d.type_cents AS BIGINT) / 100.0, 2) AS type_total
FROM e JOIN d USING (event_type)
"""


def alert_severity_sqlfn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The severity/KDA pipeline driven ENTIRELY through the SQL
    front-end with the engine's SQL-UDF library
    (functions/sql_udfs.py): severity() and kda() are Spark 4 SQL
    UDFs — expression macros Catalyst inlines into codegen, proving a
    SQL-only client gets metric parity with the Python API. Same
    severity semantics as alert_severity_breakdown (reference:
    monitoring/alert_manager.py:366-396)."""
    from pubg_data_pipeline_spark.functions.sql_udfs import register_sql_functions

    register_sql_functions(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_sqlfn")
    return spark.sql(
        f"""
        WITH perf AS (
          SELECT CAST(get_json_object(props, '$.k') AS INT) AS k,
                 value, event_type
          FROM events_sqlfn
        )
        SELECT severity(k, value * 20, value / 60.0) AS severity,
               COUNT(*) AS n_alerts,
               ROUND(SUM(kda(k, k div 2,
                             CASE WHEN event_type = 'signup' THEN 'alive'
                                  ELSE 'dead' END)) / COUNT(*), 4) AS avg_kda
        FROM perf
        GROUP BY 1
        """
    )


_SEVERITY_SQLFN_SQL = f"""
WITH perf AS (
  SELECT CAST(regexp_extract(props, '{_K}', 1) AS INT) AS k, value, event_type
  FROM events
), scored AS (
  SELECT CASE WHEN k >= 20 OR value * 20 >= 4000 OR value / 60.0 >= 4 THEN 'HIGH'
              WHEN k >= 15 OR value * 20 >= 2500 OR value / 60.0 >= 3 THEN 'MEDIUM'
              ELSE 'LOW' END AS severity,
         (k + k // 2) / CAST(GREATEST(CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END,
                                      1) AS DOUBLE) AS kda
  FROM perf
)
SELECT severity, COUNT(*) AS n_alerts, ROUND(SUM(kda) / COUNT(*), 4) AS avg_kda
FROM scored GROUP BY 1
"""


SPECS = [
    QuerySpec(
        "alert_severity_sqlfn", alert_severity_sqlfn, _SEVERITY_SQLFN_SQL, ("expr", "sql")
    ),
    QuerySpec("player_ranking_top10", player_ranking_top10, _RANKING_SQL, ("flagship", "agg", "window")),
    QuerySpec("incident_window_purchases", incident_window_purchases, _INTERVAL_JOIN_SQL, ("join", "time")),
    QuerySpec("event_type_salted_agg", event_type_salted_agg, _SALTED_AGG_SQL, ("agg", "skew")),
    QuerySpec("event_enrich_salted_join", event_enrich_salted_join, _SALTED_JOIN_SQL, ("join", "skew")),
    QuerySpec("purchase_last_signup_asof", purchase_last_signup_asof, _ASOF_SQL, ("join", "time")),
    QuerySpec("event_user_skew_report", event_user_skew_report, _SKEW_REPORT_SQL, ("agg", "skew")),
    QuerySpec(
        "purchase_signup_asof_tolerance",
        purchase_signup_asof_tolerance,
        _ASOF_TOL_SQL,
        ("join", "time"),
    ),
    QuerySpec("hourly_event_aggregates", hourly_event_aggregates, _HOURLY_SQL, ("agg", "time")),
    QuerySpec("event_type_difficulty", event_type_difficulty, _DIFFICULTY_SQL, ("agg",)),
    QuerySpec("global_event_stats", global_event_stats, _GLOBAL_STATS_SQL, ("agg",)),
    QuerySpec("moving_avg_trend", moving_avg_trend, _TREND_SQL, ("window",)),
    QuerySpec("first_event_per_user_type", first_event_per_user_type, _DEDUP_SQL, ("dedup",)),
    QuerySpec("zscore_anomalies", zscore_anomalies, _ZSCORE_SQL, ("anomaly",)),
    QuerySpec("alert_severity_breakdown", alert_severity_breakdown, _SEVERITY_SQL, ("expr",)),
    QuerySpec(
        "alert_notification_payloads",
        alert_notification_payloads,
        _NOTIFICATION_SQL,
        ("expr", "alerting"),
    ),
    QuerySpec("severity_hourly_summary", severity_hourly_summary, _SEVERITY_HOURLY_SQL, ("expr", "time")),
    QuerySpec("kda_by_user", kda_by_user, _KDA_SQL, ("expr",)),
    QuerySpec("hourly_spine_fill", hourly_spine_fill, _SPINE_SQL, ("time",)),
    QuerySpec("last_event_per_user", last_event_per_user, _LAST_SQL, ("time",)),
    QuerySpec("recent_events_top10", recent_events_top10, _RECENT_SQL, ("time", "topk")),
    QuerySpec("high_k_events", high_k_events, _HIGH_K_SQL, ("json",)),
    QuerySpec("union_event_extracts", union_event_extracts, _UNION_SQL, ("setop",)),
]
