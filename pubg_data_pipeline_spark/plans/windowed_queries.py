"""Event-time windowing, alert suppression, grouping sets, and the
Arrow/Pandas-UDF surface (SURVEY.md §2.7 D4-D5, §2.9).

The reference has NO real event-time windows — it buckets with
``date_format`` on processing time (reference:
spark_apps/advanced_analytics.py:82,236-238) and its alert dedup is an
in-memory Python cache (monitoring/alert_manager.py:83-94). These
queries supply the event-time variants (SURVEY.md §2.7 "streaming gaps
... deliberate scope for our engine"): tumbling/sliding ``F.window``,
session windows (gaps-and-islands form so the DuckDB oracle can
replicate; ``F.session_window`` is the streaming-path equivalent), and
a windowed batch form of the 15-minute alert suppression.

Pandas-UDF queries keep Python out of the row loop via Arrow batches
(mapInPandas / applyInPandas) — the multimodal-column pattern ships
here: opaque binary payload + byte-level feature extraction, with the
actual image/audio decode stubbed (functions.multimodal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.plans.base import QuerySpec, exact_scaled, sql_scaled
from pubg_data_pipeline_spark.sources.tables import load_table

_V_CENTS = sql_scaled("value", 2)


def tumbling_10min_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time window aggregate (dashboard Q3's
    ``GROUP BY time(10m)`` — monitoring/grafana/.../advanced_analytics_
    dashboard.json:103) via ``F.window`` instead of string bucketing."""
    ev = load_table(spark, sf_dir, "events")
    agged = ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(exact_scaled(F.col("value"))).alias("v_cents"),
    )
    return agged.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
        "event_type",
        "n_events",
        F.round(F.col("v_cents") / 100.0, 2).alias("total_value"),
    )


_TUMBLING_SQL = f"""
SELECT strftime(time_bucket(INTERVAL 10 MINUTE, ts), '%Y-%m-%d %H:%M') AS window_start,
       event_type, COUNT(*) AS n_events,
       ROUND(CAST(SUM({_V_CENTS}) AS BIGINT) / 100.0, 2) AS total_value
FROM events GROUP BY 1, 2
"""


def sliding_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window, 30-minute slide: every event lands in
    exactly two windows (epoch-aligned, like ``F.window``'s grid)."""
    ev = load_table(spark, sf_dir, "events")
    agged = ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return agged.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
        "n_events",
        "n_users",
    )


# Same epoch-aligned 1800s grid as F.window: for each offset in
# {0, 1800}, the unique window start on that sub-grid containing ts.
# make_timestamp (tz-NAIVE, like every other oracle here) rather than
# to_timestamp, which returns TIMESTAMPTZ and renders through DuckDB's
# session TimeZone — on a non-UTC host every window_start string would
# shift while the Spark side stays pinned to UTC.
_SLIDING_SQL = """
SELECT strftime(make_timestamp((CAST(FLOOR((epoch(ts) - off) / 3600) AS BIGINT) * 3600 + off) * 1000000),
                '%Y-%m-%d %H:%M') AS window_start,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events CROSS JOIN (VALUES (0), (1800)) o(off)
GROUP BY 1
"""


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap, in the
    oracle-checkable gaps-and-islands form (lag -> new-session flag ->
    running sum). The native streaming equivalent is
    ``F.session_window(ts, "30 minutes")``; this batch form pins
    identical semantics cross-engine."""
    from pubg_data_pipeline_spark.operators.timeseries import sessionize

    ev = load_table(spark, sf_dir, "events")
    # drop_null_keys=False: this query's oracle pins the NULL-user
    # group's behavior too
    sessioned = sessionize(ev, drop_null_keys=False)
    agged = sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("s_min"),
        F.max("ts").alias("s_max"),
    )
    return agged.select(
        "user_id",
        "session_id",
        "n_events",
        F.date_format("s_min", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("s_max", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.round(F.col("s_max").cast("double") - F.col("s_min").cast("double"), 3).alias(
            "duration_secs"
        ),
    )


_SESSIONS_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800.0 THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       ROUND(epoch(MAX(ts)) - epoch(MIN(ts)), 3) AS duration_secs
FROM s GROUP BY user_id, session_id
"""



def _session_agg(ev, gap):
    """Shared session aggregation shape: gap may be a fixed duration
    string or a per-event Column expression."""
    agged = ev.groupBy(
        F.session_window("ts", gap).alias("sw"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return agged.select(
        "user_id",
        F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


def user_sessions_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation (the streaming-capable
    session operator), pinned cross-engine against a first-principles
    gaps-and-islands oracle. Semantics note (probed on Spark 4.1):
    session_window merges an event arriving anywhere in
    [prev_ts, prev_ts + gap] INCLUSIVE — an event at exactly the
    session end still merges — so the oracle's break condition is
    strictly > 1800, and window.end is last_event + gap, not
    last_event."""
    return _session_agg(load_table(spark, sf_dir, "events"), "30 minutes")


def user_sessions_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window with a PER-EVENT gap expression (clicks
    close after 10 minutes, everything else after 30) — the dynamic-
    gap form Spark 4 supports and the fixed-gap oracle model can't
    describe. The oracle is the interval-union formulation from first
    principles: an event starts a new session iff its time is
    STRICTLY AFTER the running MAX of all previous events'
    (ts + their own gap) — boundary probed on Spark 4.1: an event at
    exactly the session end still merges, matching the fixed-gap
    oracle's strict break. window.end is the max interval end of the
    session."""
    gap = F.when(F.col("event_type") == "click", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    return _session_agg(load_table(spark, sf_dir, "events"), gap)


_SESSIONS_DYNAMIC_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS t,
         CASE WHEN event_type = 'click' THEN 600000000 ELSE 1800000000 END AS gap_us
  FROM events
), m AS (
  SELECT *, MAX(t + gap_us) OVER (PARTITION BY user_id ORDER BY t, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM g
), s AS (
  SELECT *, SUM(CASE WHEN prev_end IS NULL OR t > prev_end THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(make_timestamp(MAX(t + gap_us)), '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


_SESSIONS_NATIVE_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800.0 THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, session_id
"""


def user_trailing_hour_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rangeBetween window: per-event trailing-1-hour value sum per
    user — a VALUE-range frame over epoch seconds (peers at the same
    second are all included, so the result is order-independent),
    completing the rangeBetween surface SURVEY.md §2.6 commits to.

    Exact integer cents inside the frame keep the sum order-free."""
    ev = load_table(spark, sf_dir, "events")
    secs = F.col("ts").cast("long")  # truncates to epoch seconds
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-3600, 0)
    )
    out = ev.select(
        "event_id",
        "user_id",
        F.sum(exact_scaled(F.col("value"))).over(w).alias("hr_cents"),
        F.count(F.lit(1)).over(w).alias("events_in_hour"),
    )
    return out.select(
        "event_id",
        "user_id",
        "events_in_hour",
        F.round(F.col("hr_cents") / 100.0, 2).alias("trailing_hour_value"),
    )


_RANGE_WINDOW_SQL = f"""
SELECT event_id, user_id,
       CAST(events_in_hour AS BIGINT) AS events_in_hour,
       ROUND(hr_cents / 100.0, 2) AS trailing_hour_value
FROM (
  SELECT event_id, user_id,
         SUM({_V_CENTS}) OVER w AS hr_cents,
         COUNT(*) OVER w AS events_in_hour
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
)
"""


def alert_suppression_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the alert manager's temporal dedup: keep the first
    alert per (user, type) within each 15-minute bucket, reporting how
    many were suppressed.

    reference: monitoring/alert_manager.py:83-94 (in-memory cache,
    threshold_minutes=15 at :484) re-expressed as a window rank filter
    — SURVEY.md §2.7 D4's batch mapping."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("ts").cast("double") / 900).alias("b15")
    w = Window.partitionBy("user_id", "event_type", bucket).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_suppressed", F.count(F.lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)) - 1
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("alert_time"),
            "n_suppressed",
        )
    )


_SUPPRESSION_SQL = """
SELECT event_id, user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS alert_time,
       n_suppressed
FROM (
  SELECT event_id, user_id, event_type, ts,
         ROW_NUMBER() OVER w AS rn,
         COUNT(*) OVER (PARTITION BY user_id, event_type, FLOOR(epoch(ts) / 900)) - 1 AS n_suppressed
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type, FLOOR(epoch(ts) / 900) ORDER BY ts, event_id)
) WHERE rn = 1
"""


def status_priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status), (priority), ()) — the
    grouping-sets completion of rollup/cube (SURVEY.md §2.5 note)."""
    orders = load_table(spark, sf_dir, "orders")
    agged = orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("order_count"),
        F.sum(exact_scaled(F.col("o_totalprice"))).alias("cents"),
    )
    return agged.select(
        "o_orderstatus",
        "o_orderpriority",
        "order_count",
        F.round(F.col("cents") / 100.0, 2).alias("total_value"),
    )


_GROUPING_SETS_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS order_count,
       ROUND(CAST(SUM({sql_scaled('o_totalprice', 2)}) AS BIGINT) / 100.0, 2) AS total_value
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# ------------------------------------------- Arrow / Pandas-UDF surface

def doc_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-column plumbing: text re-encoded as an opaque binary
    payload column, processed with mapInPandas (real Arrow batching,
    real schema contract); the byte-level feature extraction stands in
    for an image/audio decode (functions.multimodal stubs the real
    decoders — codecs aren't available in this environment)."""
    import hashlib

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    payloads = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))

    def extract(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_size": pdf["payload"].map(len),
                    "content_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return payloads.mapInPandas(extract, "doc_id long, byte_size long, content_md5 string")


_MULTIMODAL_SQL = """
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS byte_size,
       md5(text) AS content_md5
FROM documents
"""


def user_value_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas computing an exact per-user median —
    exercises the Arrow grouped-map path with an oracle-checkable
    result (pandas and DuckDB both average the two middle values).
    A pure-JVM alternative is ``F.median`` (the registered twin
    ``user_value_median_native``); this spec deliberately takes the
    Pandas path to pin the extension point's semantics.

    Grouping is by a deterministic user BUCKET, not by user: a
    grouped-map function is invoked once per group, so grouping by
    user pays one Python call + two pandas-DataFrame constructions
    PER USER (measured ~2.9 s at sf0.1, ~10k users); per-user medians
    are instead computed vectorized inside each bucket with a single
    ``pandas.groupby`` (same exact interpolated median), which is the
    few-big-batches shape the optimization guide §4.2 prescribes for
    every Arrow extension point. Results are identical: the bucket is
    pmod(user_id, k), so one user never spans buckets."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    # Scale-adaptive bucket count: enough groups to spread over the
    # cluster (results are invariant to k; null user_ids pmod to a
    # null bucket and stay one group).
    n_buckets = spark.sparkContext.defaultParallelism * 8

    def med(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # dropna=False: Spark's groupBy keeps a null-key group, pandas
        # must too or null-user rows would silently vanish.
        g = pdf.groupby("user_id", dropna=False)["value"]
        medians = g.median().round(4)
        return pd.DataFrame(
            {
                "user_id": medians.index.to_numpy(),
                "n_events": g.size().to_numpy(),
                "median_value": medians.to_numpy(),
            }
        )

    return (
        ev.withColumn("__bucket", F.pmod(F.col("user_id"), F.lit(n_buckets)))
        .groupBy("__bucket")
        .applyInPandas(med, "user_id long, n_events long, median_value double")
    )


_MEDIAN_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       ROUND(CAST(median(value) AS DOUBLE), 4) AS median_value
FROM events GROUP BY user_id
"""


def approx_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (t-digest-style sketch) next to the exact
    interpolated percentiles of order_price_percentiles — the 100 TB
    variant (exact percentile collects each group's column; the sketch
    is mergeable map-side). Rows-only check: sketch algorithms differ
    across engines."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.9))").alias(
            "approx_pcts"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


def approx_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) next to the exact count — the
    100 TB variant of A6 (SURVEY.md §2.5: "at 100 TB offer
    approx_count_distinct"). Rows-only check: DuckDB's approx sketch
    is a different algorithm, so values can't hash-match."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


def order_price_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per order-status partition — the
    distribution-position analytics pair. The ORDER BY includes
    o_orderkey so every row is a unique peer group and both functions
    are tie-free deterministic cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


_DISTRIBUTION_SQL = """
SELECT o_orderkey, o_orderstatus,
       ROUND(percent_rank() OVER (PARTITION BY o_orderstatus
             ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
       ROUND(cume_dist() OVER (PARTITION BY o_orderstatus
             ORDER BY o_totalprice, o_orderkey), 6) AS cum_dist
FROM orders
"""


def user_value_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (LOCF) gap repair per user series: values on every
    third event are masked to NULL (a deterministic stand-in for
    dropped sensor samples), then carried forward from the last
    non-null observation in (ts, event_id) order. Emits only the
    masked rows (the interesting ones) with their filled value."""
    from pubg_data_pipeline_spark.operators import timeseries

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    masked = ev.withColumn(
        "v_masked",
        F.when(F.col("event_id") % 3 == 0, F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )
    filled = timeseries.forward_fill(
        masked, ["user_id"], ["ts", "event_id"], "v_masked", out_col="v_filled"
    )
    return (
        filled.filter(F.col("v_masked").isNull())
        .select(
            "user_id",
            "event_id",
            F.round("v_filled", 4).alias("filled_value"),
        )
    )


_LOCF_SQL = """
WITH m AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v_masked
  FROM events
), f AS (
  SELECT user_id, event_id, v_masked,
         last_value(v_masked IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
  FROM m
)
SELECT user_id, event_id, ROUND(v_filled, 4) AS filled_value
FROM f WHERE v_masked IS NULL
"""


def image_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate mining on the multimodal lane: binary
    payloads -> perceptual hash (functions.multimodal.perceptual_hash,
    deterministic block-mean fake with real pHash structure) -> all
    pairs within Hamming radius 10 via the pigeonhole chunk equi-join
    (operators.dedup.hamming_near_dups) — never an O(n^2) cross join.
    The fake hasher is exact-integer arithmetic, so the DuckDB oracle
    recomputes the identical signatures character-wise and verifies
    the pair set bit-for-bit (the oracle's cross-join pair scan is
    fine at oracle scale; the engine path is the bucketed one)."""
    from pubg_data_pipeline_spark.functions.multimodal import perceptual_hash
    from pubg_data_pipeline_spark.operators.dedup import hamming_near_dups

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    payloads = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))
    sigs = perceptual_hash(payloads, "doc_id", "payload", bits=48)
    return hamming_near_dups(sigs, "doc_id", "phash", bits=48, max_hamming=10)


_PHASH_SQL = """
WITH codes AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         ascii(substr(text, CAST(i AS INT), 1)) AS code,
         CAST(length(text) AS BIGINT) AS L
  FROM documents, unnest(generate_series(1, length(text))) t(i)
  WHERE length(text) > 0
), blocks AS (
  SELECT doc_id, (pos * 48) // L AS blk, code FROM codes
), blkmean AS (
  SELECT doc_id, blk, SUM(code) / COUNT(*) AS bm FROM blocks GROUP BY 1, 2
), docmean AS (
  SELECT doc_id, SUM(code) / COUNT(*) AS dm FROM codes GROUP BY 1
), sig AS (
  SELECT b.doc_id,
         CAST(SUM(CASE WHEN b.bm > d.dm
                       THEN (CAST(1 AS BIGINT) << CAST(b.blk AS INT))
                       ELSE 0 END) AS BIGINT) AS phash
  FROM blkmean b JOIN docmean d USING (doc_id) GROUP BY 1
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.phash, b.phash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 10
"""


def session_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval overlap join (operators/timeseries.py:
    interval_overlap_join): user sessions (30-min gaps-and-islands, the
    same construction as user_sessions) overlapped against incident
    windows — hours whose error-event count is >= 2x the average
    hourly error rate, taken as the closed hour interval. Emits, per
    session that touches at least one incident, the incident count and
    the total overlapped seconds. Both interval sets are derived (no
    static dim), so this is the big-big shape where the banded
    strategy matters; overlap durations come from exact epoch-micro
    integer arithmetic, deterministic cross-engine."""
    from pubg_data_pipeline_spark.operators.timeseries import sessionize

    ev = load_table(spark, sf_dir, "events")
    sessions = (
        sessionize(ev)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    hourly_err = (
        ev.where(F.col("event_type") == "error")
        .groupBy(F.date_trunc("HOUR", "ts").alias("inc_start"))
        .agg(F.count(F.lit(1)).alias("n_err"))
    )
    thresh = hourly_err.groupBy().agg((F.avg("n_err") * 2.0).alias("thr"))
    incidents = (
        hourly_err.crossJoin(F.broadcast(thresh))
        .where(F.col("n_err") >= F.col("thr"))
        .select(
            "inc_start",
            (F.col("inc_start") + F.expr("INTERVAL 1 HOUR") - F.expr("INTERVAL 1 MICROSECOND")).alias(
                "inc_end"
            ),
        )
    )
    from pubg_data_pipeline_spark.operators.timeseries import interval_overlap_join

    pairs = interval_overlap_join(
        sessions, incidents, "s_start", "s_end", "inc_start", "inc_end", bucket_seconds=3600
    )
    ov_us = F.least(F.unix_micros("s_end"), F.unix_micros("inc_end")) - F.greatest(
        F.unix_micros("s_start"), F.unix_micros("inc_start")
    )
    return (
        pairs.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_incidents"),
            F.round(F.sum(ov_us) / 1_000_000.0, 3).alias("overlap_sec"),
        )
        .select(
            "user_id",
            F.col("session_id").cast("long").alias("session_id"),
            "n_incidents",
            "overlap_sec",
        )
    )


_OVERLAP_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800.0 THEN 1 ELSE 0 END AS is_new
  FROM events WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
), sessions AS (
  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM s GROUP BY user_id, session_id
), hourly_err AS (
  SELECT DATE_TRUNC('HOUR', ts) AS inc_start, COUNT(*) AS n_err
  FROM events WHERE event_type = 'error' GROUP BY DATE_TRUNC('HOUR', ts)
), incidents AS (
  SELECT inc_start, inc_start + INTERVAL 1 HOUR - INTERVAL 1 MICROSECOND AS inc_end
  FROM hourly_err WHERE n_err >= (SELECT AVG(n_err) * 2.0 FROM hourly_err)
)
SELECT sessions.user_id, sessions.session_id,
       COUNT(*) AS n_incidents,
       ROUND(SUM(epoch_us(LEAST(s_end, inc_end)) - epoch_us(GREATEST(s_start, inc_start)))
             / 1000000.0, 3) AS overlap_sec
FROM sessions JOIN incidents
  ON s_start <= inc_end AND inc_start <= s_end
GROUP BY sessions.user_id, sessions.session_id
"""


def sliding_3h_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users over a trailing 3-hour sliding window, per
    hour — the aggregate Spark's window frames cannot express (no
    COUNT(DISTINCT) over a frame) and F.window's sliding variant would
    recount per-slide from raw rows. Scale pattern: collapse to
    distinct (user, hour) pairs FIRST (the only full-data shuffle),
    then each pair self-expands to the <=3 window-ends it serves and a
    second distinct-agg counts per window — work is O(distinct pairs x
    3), never O(rows x 3). Window ends are clipped to the last
    observed hour (a 1-row broadcast), so the output never reports
    phantom hours past the end of the data with decaying counts. The
    HLL twin for approximate needs is incremental_hourly_distinct;
    this is the exact path."""
    ev = load_table(spark, sf_dir, "events")
    pairs = (
        ev.where(F.col("user_id").isNotNull())
        .select("user_id", F.date_trunc("HOUR", "ts").alias("h"))
        .distinct()
    )
    hmax = pairs.groupBy().agg(F.max("h").alias("hmax"))
    exp = (
        pairs.crossJoin(F.broadcast(hmax))
        .select(
            "user_id",
            F.explode(
                F.array(
                    F.col("h"),
                    F.col("h") + F.expr("INTERVAL 1 HOUR"),
                    F.col("h") + F.expr("INTERVAL 2 HOUR"),
                )
            ).alias("wh"),
            "hmax",
        )
        .where(F.col("wh") <= F.col("hmax"))
    )
    return (
        exp.groupBy(F.date_format("wh", "yyyy-MM-dd HH:00").alias("window_end_hour"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


_SLIDING_DISTINCT_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id, DATE_TRUNC('HOUR', ts) AS h
  FROM events WHERE user_id IS NOT NULL
), exp AS (
  SELECT user_id, h + k * INTERVAL 1 HOUR AS wh
  FROM pairs CROSS JOIN (VALUES (0), (1), (2)) t(k)
)
SELECT strftime(wh, '%Y-%m-%d %H:00') AS window_end_hour,
       COUNT(DISTINCT user_id) AS n_users
FROM exp
WHERE wh <= (SELECT MAX(h) FROM pairs)
GROUP BY strftime(wh, '%Y-%m-%d %H:00')
"""


SPECS = [
    QuerySpec(
        "session_incident_overlap",
        session_incident_overlap,
        _OVERLAP_SQL,
        ("time", "join", "window"),
    ),
    QuerySpec(
        "sliding_3h_distinct_users",
        sliding_3h_distinct_users,
        _SLIDING_DISTINCT_SQL,
        ("time", "agg", "window"),
    ),
    QuerySpec(
        "image_phash_near_dups", image_phash_near_dups, _PHASH_SQL, ("llm", "pandas", "dedup", "multimodal")
    ),
    QuerySpec("tumbling_10min_counts", tumbling_10min_counts, _TUMBLING_SQL, ("time", "window")),
    QuerySpec("user_value_locf", user_value_locf, _LOCF_SQL, ("time", "window")),
    QuerySpec("order_price_distribution", order_price_distribution, _DISTRIBUTION_SQL, ("window",)),
    QuerySpec("sliding_hourly_counts", sliding_hourly_counts, _SLIDING_SQL, ("time", "window")),
    QuerySpec("user_sessions", user_sessions, _SESSIONS_SQL, ("time", "window")),
    QuerySpec(
        "user_sessions_dynamic_gap", user_sessions_dynamic_gap, _SESSIONS_DYNAMIC_SQL, ("window", "session", "time")
    ),
    QuerySpec("user_sessions_native", user_sessions_native, _SESSIONS_NATIVE_SQL, ("time", "window")),
    QuerySpec("user_trailing_hour_sum", user_trailing_hour_sum, _RANGE_WINDOW_SQL, ("window", "time")),
    QuerySpec("alert_suppression_15min", alert_suppression_15min, _SUPPRESSION_SQL, ("dedup", "time")),
    QuerySpec("status_priority_grouping_sets", status_priority_grouping_sets, _GROUPING_SETS_SQL, ("agg",)),
    QuerySpec("doc_multimodal_features", doc_multimodal_features, _MULTIMODAL_SQL, ("llm", "pandas")),
    QuerySpec("user_value_median", user_value_median, _MEDIAN_SQL, ("pandas",)),
    QuerySpec("approx_unique_users", approx_unique_users, None, ("agg", "approx")),
    QuerySpec("approx_order_percentiles", approx_order_percentiles, None, ("agg", "approx")),
]
