"""Data-quality query batch: column profiling and expectation gates
(operators/profile.py), oracle-checked.

The reference ships malformed rows straight to storage (PERMISSIVE
from_json at spark_apps/pubg_streaming.py:138-145 turns bad JSON into
all-null rows; nothing downstream checks them) — these queries grade
the validation layer a production ingest needs in front of that sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import profile
from pubg_data_pipeline_spark.plans.base import QuerySpec
from pubg_data_pipeline_spark.sources.tables import load_table


def events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column health report over events: nulls, exact distincts,
    typed min/max — one aggregation pass for all five columns
    (operators/profile.profile_columns; the multi-distinct plans as
    one Expand+partial-agg job). Timestamps are pre-formatted to
    second strings so min/max stringification is cross-engine-stable."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "user_id",
        "event_type",
        "value",
    )
    return profile.profile_columns(
        ev, ["event_id", "ts_s", "user_id", "event_type", "value"]
    )


def _profile_col_sql(col: str) -> str:
    return f"""
SELECT '{col}' AS column_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({col}) AS n_nulls,
       ROUND((COUNT(*) - COUNT({col})) * 1.0 / COUNT(*), 6) AS null_frac,
       COUNT(DISTINCT {col}) AS n_distinct,
       CAST(MIN({col}) AS VARCHAR) AS min_value,
       CAST(MAX({col}) AS VARCHAR) AS max_value
FROM src"""


_PROFILE_SQL = (
    """
WITH src AS (
  SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
         user_id, event_type, value
  FROM events
)
"""
    + "\nUNION ALL\n".join(
        _profile_col_sql(c)
        for c in ("event_id", "ts_s", "user_id", "event_type", "value")
    )
)


def events_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative ingest expectations over events, all rules evaluated
    in one scan (operators/profile.expectations_report): non-negative
    values, known event types, 2024 timestamps, present user ids. A
    NULL rule evaluation counts as a violation (CHECK-style safety)."""
    ev = load_table(spark, sf_dir, "events")
    rules = [
        ("value_nonnegative", F.col("value") >= 0),
        (
            "event_type_known",
            F.col("event_type").isin("signup", "click", "error", "view", "purchase"),
        ),
        ("ts_in_2024", F.year("ts") == 2024),
        ("user_id_present", F.col("user_id").isNotNull()),
    ]
    return profile.expectations_report(ev, rules)


_CHECKS_SQL = """
WITH src AS (SELECT * FROM events), r AS (
  SELECT 'value_nonnegative' AS rule_name,
         COUNT(*) AS n_rows,
         SUM(CASE WHEN NOT COALESCE(value >= 0, FALSE) THEN 1 ELSE 0 END) AS n_violations
  FROM src
  UNION ALL
  SELECT 'event_type_known', COUNT(*),
         SUM(CASE WHEN NOT COALESCE(event_type IN ('signup','click','error','view','purchase'), FALSE) THEN 1 ELSE 0 END)
  FROM src
  UNION ALL
  SELECT 'ts_in_2024', COUNT(*),
         SUM(CASE WHEN NOT COALESCE(EXTRACT(year FROM ts) = 2024, FALSE) THEN 1 ELSE 0 END)
  FROM src
  UNION ALL
  SELECT 'user_id_present', COUNT(*),
         SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
  FROM src
)
SELECT rule_name, n_rows, CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM r
"""


_DRIFT_SPLIT = "2024-01-08 00:00:00"


def event_value_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric distribution drift (Population Stability Index) of the
    event value between the first week (baseline) and the rest of the
    month (current), binned with width_bucket(0..500, 10) — the
    model-monitoring gate (PSI > 0.2 = shift) engine-side
    (operators/profile.py:distribution_drift). Proportions derive from
    exact integer counts; only the final ln is float, rounded 6dp."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("ts") < _DRIFT_SPLIT)
    cur = ev.filter(F.col("ts") >= _DRIFT_SPLIT)
    bucket = F.width_bucket(F.col("value"), F.lit(0.0), F.lit(500.0), F.lit(10)).cast(
        "long"
    )
    out = profile.distribution_drift(base, cur, bucket, key_name="bucket")
    return out.select(
        "bucket", "n_base", "n_cur", F.round("psi_contrib", 6).alias("psi_contrib")
    )


_VALUE_PSI_SQL = f"""
WITH tagged AS (
  SELECT CASE WHEN value < 0 THEN 0
              WHEN value >= 500 THEN 11
              ELSE CAST(FLOOR(value / 50.0) AS BIGINT) + 1 END AS bucket,
         (ts < TIMESTAMP '{_DRIFT_SPLIT}') AS is_base
  FROM events
), counts AS (
  SELECT bucket,
         COUNT(*) FILTER (WHERE is_base) AS n_base,
         COUNT(*) FILTER (WHERE NOT is_base) AS n_cur
  FROM tagged GROUP BY 1
), tot AS (
  SELECT SUM(n_base) AS t_base, SUM(n_cur) AS t_cur FROM counts
)
SELECT bucket, CAST(n_base AS BIGINT) AS n_base, CAST(n_cur AS BIGINT) AS n_cur,
       ROUND((n_cur / t_cur + 1e-06 - (n_base / t_base + 1e-06))
             * ln((n_cur / t_cur + 1e-06) / (n_base / t_base + 1e-06)), 6)
         AS psi_contrib
FROM counts, tot
"""


def event_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift of the event-type mix between the first week
    and the rest of the month — the same PSI formula over raw
    categories (one-sided categories survive via eps smoothing)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("ts") < _DRIFT_SPLIT)
    cur = ev.filter(F.col("ts") >= _DRIFT_SPLIT)
    out = profile.distribution_drift(base, cur, F.col("event_type"), key_name="event_type")
    return out.select(
        "event_type", "n_base", "n_cur", F.round("psi_contrib", 6).alias("psi_contrib")
    )


_TYPE_DRIFT_SQL = f"""
WITH counts AS (
  SELECT event_type,
         COUNT(*) FILTER (WHERE ts < TIMESTAMP '{_DRIFT_SPLIT}') AS n_base,
         COUNT(*) FILTER (WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT}') AS n_cur
  FROM events GROUP BY 1
), tot AS (
  SELECT SUM(n_base) AS t_base, SUM(n_cur) AS t_cur FROM counts
)
SELECT event_type, CAST(n_base AS BIGINT) AS n_base, CAST(n_cur AS BIGINT) AS n_cur,
       ROUND((n_cur / t_cur + 1e-06 - (n_base / t_base + 1e-06))
             * ln((n_cur / t_cur + 1e-06) / (n_base / t_base + 1e-06)), 6)
         AS psi_contrib
FROM counts, tot
"""


def events_k_anonymous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release of events (operators/profile.k_anonymize):
    direct identifiers dropped, quasi-identifiers generalized
    (timestamp -> date, value -> width-50 band), then every
    quasi-combination seen fewer than 10 times suppressed — the
    standard privacy gate before telemetry leaves the warehouse or
    enters a training corpus. The oracle replays the same window-count
    suppression, so a hash match pins the exact released multiset.

    Scale: generalization is a projection; suppression is one window
    count on the quasi keys (single shuffle, no join)."""
    from pubg_data_pipeline_spark.operators import profile as prof

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.floor(F.col("value") / 50).cast("long").alias("value_band"),
    )
    return prof.k_anonymize(ev, ["event_type", "event_date", "value_band"], k=10)


_K_ANON_SQL = """
WITH g AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date,
         CAST(FLOOR(value / 50) AS BIGINT) AS value_band
  FROM events
), c AS (
  SELECT *, COUNT(*) OVER (PARTITION BY event_type, event_date, value_band) AS n
  FROM g
)
SELECT event_type, event_date, value_band FROM c WHERE n >= 10
"""


def events_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the generalized quasi-groups
    (operators/profile.l_diversity_report): a k-anonymous group whose
    members all share one sensitive value still identifies it
    (homogeneity attack), so each (event_type, date) group must carry
    >= 3 distinct user_ids before release. One grouped aggregate."""
    from pubg_data_pipeline_spark.operators import profile as prof

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        "user_id",
    )
    return prof.l_diversity_report(
        ev, ["event_type", "event_date"], "user_id", l=3
    )


_L_DIVERSITY_SQL = """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date,
       COUNT(*) AS group_size,
       COUNT(DISTINCT user_id) AS n_sensitive_values,
       COUNT(DISTINCT user_id) >= 3 AS l_diverse
FROM events
GROUP BY event_type, strftime(ts, '%Y-%m-%d')
"""


def event_feed_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feed freshness / completeness SLA monitor: each
    event_type's newest event is lagged against the dataset watermark
    (the global max ts), feeds more than 60 minutes behind are flagged
    stale, and hours_with_data over the feed's own active span exposes
    gaps (a feed can be fresh yet hole-ridden). The standard "is every
    upstream producer still alive?" health page a 100 TB ingest runs
    on a schedule.

    Scale: one grouped aggregation over the scan (map-side partial
    agg on the handful of feed keys) plus a 1-row broadcast for the
    watermark — no shuffle beyond the per-feed agg, no window."""
    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(F.max("ts").alias("__wm"))
    per_feed = ev.groupBy("event_type").agg(
        F.max("ts").alias("__last"),
        F.min("ts").alias("__first"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.date_format("ts", "yyyy-MM-dd HH")).alias("hours_with_data"),
    )
    lag_min = F.floor(
        (F.unix_timestamp("__wm") - F.unix_timestamp("__last")) / F.lit(60)
    ).cast("long")
    span_hours = (
        F.floor(
            (F.unix_timestamp(F.date_trunc("hour", F.col("__last")))
             - F.unix_timestamp(F.date_trunc("hour", F.col("__first"))))
            / F.lit(3600)
        ).cast("long")
        + F.lit(1)
    )
    return per_feed.crossJoin(F.broadcast(wm)).select(
        "event_type",
        F.date_format("__last", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        lag_min.alias("lag_minutes"),
        (lag_min > 60).alias("stale"),
        "n_events",
        "hours_with_data",
        (span_hours - F.col("hours_with_data")).alias("missing_hours"),
    )


_FRESHNESS_SQL = """
WITH wm AS (SELECT MAX(ts) AS w FROM events),
per_feed AS (
  SELECT event_type,
         MAX(ts) AS last_ts,
         MIN(ts) AS first_ts,
         COUNT(*) AS n_events,
         COUNT(DISTINCT strftime(ts, '%Y-%m-%d %H')) AS hours_with_data
  FROM events GROUP BY event_type
)
SELECT event_type,
       strftime(last_ts, '%Y-%m-%d %H:%M:%S') AS last_seen,
       CAST(FLOOR((epoch(w) - epoch(last_ts)) / 60) AS BIGINT) AS lag_minutes,
       FLOOR((epoch(w) - epoch(last_ts)) / 60) > 60 AS stale,
       n_events,
       hours_with_data,
       CAST(FLOOR((epoch(date_trunc('hour', last_ts)) - epoch(date_trunc('hour', first_ts))) / 3600) AS BIGINT)
         + 1 - hours_with_data AS missing_hours
FROM per_feed, wm
"""


def events_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (operators/profile.t_closeness_report) —
    completes the privacy release gate after events_k_anonymous (group
    size) and events_l_diversity (distinct sensitive values): each
    day's event_type distribution must stay within total-variation
    distance 0.2 of the corpus-wide distribution, or the day leaks a
    skewness signal even though it is large and diverse. NULL
    sensitive values are excluded up front (both engines would
    otherwise drop them asymmetrically at the join)."""
    from pubg_data_pipeline_spark.operators import profile as prof

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isNotNull())
        .select(F.date_format("ts", "yyyy-MM-dd").alias("event_date"), "event_type")
    )
    return prof.t_closeness_report(ev, ["event_date"], "event_type", t=0.2)


_T_CLOSENESS_SQL = """
WITH base AS (
  SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type
  FROM events WHERE event_type IS NOT NULL
), cell AS (
  SELECT event_date, event_type, CAST(COUNT(*) AS DOUBLE) AS o
  FROM base GROUP BY event_date, event_type
), w AS (
  SELECT event_date, event_type, o,
         SUM(o) OVER (PARTITION BY event_date) AS gs
  FROM cell
), g AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM base) AS q
  FROM base GROUP BY event_type
)
SELECT event_date, CAST(MAX(gs) AS BIGINT) AS group_size,
       ROUND(0.5 * (SUM(ABS(o / gs - q)) + (1.0 - SUM(q))), 4) AS tvd,
       ROUND(0.5 * (SUM(ABS(o / gs - q)) + (1.0 - SUM(q))), 4) <= 0.2 AS t_close
FROM w JOIN g USING (event_type)
GROUP BY event_date
"""


SPECS = [
    QuerySpec(
        "events_t_closeness", events_t_closeness, _T_CLOSENESS_SQL, ("quality", "privacy")
    ),
    QuerySpec(
        "event_value_psi_drift", event_value_psi_drift, _VALUE_PSI_SQL, ("quality", "stats", "drift")
    ),
    QuerySpec(
        "event_feed_freshness", event_feed_freshness, _FRESHNESS_SQL, ("quality", "monitor")
    ),
    QuerySpec(
        "events_k_anonymous", events_k_anonymous, _K_ANON_SQL, ("quality", "privacy")
    ),
    QuerySpec(
        "events_l_diversity", events_l_diversity, _L_DIVERSITY_SQL, ("quality", "privacy")
    ),
    QuerySpec(
        "event_type_drift", event_type_drift, _TYPE_DRIFT_SQL, ("quality", "stats", "drift")
    ),
    QuerySpec("events_column_profile", events_column_profile, _PROFILE_SQL, ("quality", "agg")),
    QuerySpec("events_quality_checks", events_quality_checks, _CHECKS_SQL, ("quality", "agg")),
]
