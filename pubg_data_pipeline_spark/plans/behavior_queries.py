"""User-behavior analytics over the events stream: funnels, retention
cohorts, and engine-side series smoothing/repair.

The reference's dashboards chart per-user activity (kills/damage
series, monitoring/grafana/.../pubg_analytics_dashboard.json) but do
every cross-event correlation client-side in Grafana; these queries
move the three classic product-analytics shapes into the engine where
they can run over the full history instead of a panel's time range:

- ordered funnel (view -> click -> purchase): chained min-timestamp
  aggregations, each stage a hash agg + a broadcast-size join on the
  per-user stage table — never a self-join of the raw fact table
  against itself on an inequality (which would be a range-join
  blow-up at 100 TB).
- weekly retention cohorts: one tiny first-seen-per-user aggregate
  joined back to the facts (broadcast at any realistic user count),
  then a distinct-count — the standard two-shuffle plan.
- EWMA smoothing and fill(linear) interpolation: per-series window
  expressions (operators/timeseries.py) — Grafana-side smoothing and
  the third InfluxQL fill mode, engine-side.

All oracles are exact: counts are integers, and the float formulas
(EWMA weights, interpolation slopes) are written with the identical
literal constants and evaluation order on both engines, then rounded
to 4dp (see plans/base.py determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators.ckpt import barrier

from pubg_data_pipeline_spark.plans.base import QuerySpec, exact_scaled, sql_scaled
from pubg_data_pipeline_spark.sources.tables import load_table


# ------------------------------------------------------------- funnel

def user_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked at or
    after their FIRST view, then purchased at or after their first
    qualifying click. Each stage is min-timestamp per user (hash agg
    with map-side combine), and the next stage joins the raw facts to
    that per-user table — which has at most one row per user, so Spark
    broadcasts it; the fact table is never self-joined on a time
    inequality. Three stages -> three rows of stage counts."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(views), "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(clicks), "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .select("user_id")
        .distinct()
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"), F.count(F.lit(1)).alias("n_users")
        )

    return (
        stage("1_view", views)
        .unionAll(stage("2_click_after_view", clicks))
        .unionAll(stage("3_purchase_after_click", purchases))
    )


_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= v.t1
  GROUP BY 1
), p AS (
  SELECT DISTINCT e.user_id
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= c.t2
)
SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
UNION ALL SELECT '2_click_after_view', COUNT(*) FROM c
UNION ALL SELECT '3_purchase_after_click', COUNT(*) FROM p
"""


# ---------------------------------------------------------- retention

def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by the ISO week of their first
    event; for each (cohort_week, week_offset) the count of cohort
    members active that week. The first-seen table is one row per
    user (broadcast); offsets come from epoch-second arithmetic so
    both engines bucket identically."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    joined = ev.join(F.broadcast(first_seen), "user_id")
    return (
        joined.groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (
                (
                    F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                    - F.unix_timestamp(F.col("cohort"))
                )
                / 604800
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


_RETENTION_SQL = """
WITH first_seen AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort FROM events GROUP BY 1
)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
       CAST((epoch(date_trunc('week', e.ts)) - epoch(f.cohort)) / 604800 AS BIGINT)
         AS week_offset,
       COUNT(DISTINCT e.user_id) AS active_users
FROM events e JOIN first_seen f USING (user_id)
GROUP BY 1, 2
"""


# ------------------------------------------------------ EWMA smoothing

_EWMA_ALPHA = 0.3
_EWMA_SPAN = 10
_EWMA_WEIGHTS = [_EWMA_ALPHA * (1.0 - _EWMA_ALPHA) ** k for k in range(_EWMA_SPAN)]


def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of the value series (finite-span exact form, see
    operators/timeseries.py:ewma): the engine-side version of the
    smoothing the reference's Grafana panels do client-side. Ordering
    is (ts, event_id) — tie-free across engines."""
    from pubg_data_pipeline_spark.operators import timeseries

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    out = timeseries.ewma(
        ev,
        ["user_id"],
        ["ts", "event_id"],
        "value",
        alpha=_EWMA_ALPHA,
        span=_EWMA_SPAN,
        out_col="ewma_value",
    )
    return out.select(
        "user_id", "event_id", F.round("ewma_value", 4).alias("ewma_value")
    )


def _ewma_sql() -> str:
    # Identical literal weights (repr round-trips the exact double) and
    # identical left-to-right accumulation order as the Spark expression.
    lags = ",\n         ".join(
        f"lag(value, {k}) OVER w AS v{k}" for k in range(_EWMA_SPAN)
    )
    num = " + ".join(
        f"CASE WHEN v{k} IS NOT NULL THEN {w!r} * v{k} ELSE 0.0 END"
        for k, w in enumerate(_EWMA_WEIGHTS)
    )
    den = " + ".join(
        f"CASE WHEN v{k} IS NOT NULL THEN {w!r} ELSE 0.0 END"
        for k, w in enumerate(_EWMA_WEIGHTS)
    )
    return f"""
WITH l AS (
  SELECT user_id, event_id,
         {lags}
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       ROUND((0.0 + {num}) / (0.0 + {den}), 4) AS ewma_value
FROM l
"""


# ------------------------------------------------ fill(linear) repair

def hourly_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grafana ``fill(linear)`` engine-side: per event type, the hourly
    mean value on a complete hour spine, with empty hours linearly
    interpolated between the nearest observed hours (edges carry the
    one-sided neighbor). The spine is bounds-derived (tiny) crossed
    with the 5 distinct types — both broadcast; interpolation is one
    window sort per series (operators/timeseries.py:linear_interpolate).
    """
    from pubg_data_pipeline_spark.operators import timeseries

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    agged = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("t")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(exact_scaled(F.col("value"))).alias("cents"),
    ).withColumn("v", (F.col("cents") / 100.0) / F.col("n"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine_t = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("t")
    )
    types = ev.select("event_type").distinct()
    spine = spine_t.crossJoin(F.broadcast(types))
    j = (
        spine.join(F.broadcast(agged.select("event_type", "t", "v")), ["event_type", "t"], "left")
        .withColumn("h", F.unix_timestamp("t"))
    )
    filled = timeseries.linear_interpolate(j, ["event_type"], "h", "v", out_col="v_interp")
    # No engine-side rounding: every double here is produced by the
    # identical op sequence on both engines (bit-identical), and a 4dp
    # round would REINTRODUCE drift whenever the true value sits on a
    # rounding boundary (engines disagree on half-up vs binary-half).
    return filled.select(
        "event_type",
        F.date_format("t", "yyyy-MM-dd HH").alias("hour"),
        F.col("v_interp").alias("filled_value"),
    )


_INTERP_SQL = f"""
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS t, COUNT(*) AS n,
         CAST(SUM({sql_scaled("value", 2)}) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), b AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS t FROM b
), grid AS (
  SELECT ty.event_type, spine.t,
         CAST(epoch(spine.t) AS BIGINT) AS h,
         (agg.cents / 100.0) / agg.n AS v
  FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events) ty
  LEFT JOIN agg ON agg.event_type = ty.event_type AND agg.t = spine.t
), f AS (
  SELECT event_type, t, h, v,
         last_value(v IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER wp AS po,
         first_value(v IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER wn AS no
  FROM grid
  WINDOW wp AS (PARTITION BY event_type ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY event_type ORDER BY h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, strftime(t, '%Y-%m-%d %H') AS hour,
       CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NOT NULL AND nv IS NOT NULL AND no <> po
                 THEN pv + (nv - pv) * (h - po) / (no - po)
            WHEN pv IS NOT NULL THEN pv
            ELSE nv END AS filled_value
FROM f
"""


# ----------------------------------------------------- RFM / baskets

def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quartiles) — the classic CRM cut, built scale-safe: each metric's
    quartile rides the distributed exact global rank
    (operators/windows.global_rank) + NTILE's integer placement
    formula, so no single-partition sort touches the customer table
    (same decomposition order_quartiles pins). Output: one row per
    (r, f, m) segment with its size and total spend."""
    from pubg_data_pipeline_spark.operators import windows as W

    orders = load_table(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("__maxd"))
    per_cust = (
        orders.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff(F.col("__maxd"), F.col("o_orderdate"))).alias("recency"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(exact_scaled(F.col("o_totalprice"))).alias("monetary_cents"),
        )
    )

    def tile(df, metric, out):
        # Materialize between tiles: each global_rank references its
        # input twice (bucket histogram + rank join), so three chained
        # tiles would otherwise re-execute the whole upstream lineage
        # ~2^3 times (measured 6.8 s -> 1.5 s at sf0.1). The frame is
        # one row per customer — small by construction.
        df = barrier(df, site=f"behavior:rfm_tile:{metric}", eager=True)
        ranked = W.global_rank(
            df, F.col(metric), tiebreak="o_custkey", ascending=True, out_col="__r"
        )
        n = df.agg(F.count(F.lit(1)).alias("__n"))
        return (
            ranked.crossJoin(F.broadcast(n))
            .withColumn(out, W.ntile_expr("__r", "__n", 4))
            .drop("__r", "__n")
        )

    tiled = tile(tile(tile(per_cust, "recency", "r"), "frequency", "f"), "monetary_cents", "m")
    return (
        tiled.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("monetary_cents") / 100.0, 2).alias("total_spend"),
        )
    )


_RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         MIN(datediff('day', o_orderdate,
                      (SELECT MAX(o_orderdate) FROM orders))) AS recency,
         COUNT(*) AS frequency,
         CAST(SUM({sql_scaled("o_totalprice", 2)}) AS BIGINT) AS monetary_cents
  FROM orders GROUP BY 1
), tiled AS (
  SELECT o_custkey, monetary_cents,
         ntile(4) OVER (ORDER BY recency, o_custkey) AS r,
         ntile(4) OVER (ORDER BY frequency, o_custkey) AS f,
         ntile(4) OVER (ORDER BY monetary_cents, o_custkey) AS m
  FROM per_cust
)
SELECT r, f, m, COUNT(*) AS n_customers,
       ROUND(SUM(monetary_cents) / 100.0, 2) AS total_spend
FROM tiled GROUP BY 1, 2, 3
"""


def part_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same
    order, with support and lift. One shuffle builds per-order BASKETS
    (collect_set dedups in the same agg), pairs explode map-side from
    the sorted array (bounded fan-out: an order has at most a handful
    of lines, so the explosion is O(orders x lines^2) with a small
    constant — never a join, and the basket exchange is reused across
    the three consumers); per-part order counts broadcast back for the
    lift denominator. Top 20 by support with full tie-breaks."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pair_structs = F.expr(
        "flatten(transform(parts, (x, i) -> "
        "transform(slice(parts, i + 2, size(parts)), "
        "y -> struct(x AS part_a, y AS part_b))))"
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    part_orders = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_orders_part"))
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    enriched = (
        pairs.join(
            F.broadcast(part_orders.select(F.col("l_partkey").alias("part_a"),
                                           F.col("n_orders_part").alias("cnt_a"))),
            "part_a",
        )
        .join(
            F.broadcast(part_orders.select(F.col("l_partkey").alias("part_b"),
                                           F.col("n_orders_part").alias("cnt_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    return (
        enriched.select(
            "part_a",
            "part_b",
            "support",
            F.round(
                F.col("support") * F.col("n_orders")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("support").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(20)
    )


_BASKET_SQL = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
), po AS (
  SELECT l_partkey, COUNT(*) AS n_orders_part FROM li GROUP BY 1
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li
)
SELECT part_a, part_b, support,
       ROUND(support * n.n_orders * 1.0 / (pa.n_orders_part * pb.n_orders_part), 6)
         AS lift
FROM pairs
JOIN po pa ON pa.l_partkey = part_a
JOIN po pb ON pb.l_partkey = part_b
CROSS JOIN n
ORDER BY support DESC, part_a ASC, part_b ASC LIMIT 20
"""



# ------------------------------------------------- journey transitions

def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey Markov transition matrix: for each (from_type,
    to_type) pair of CONSECUTIVE events of one user (ordered by ts,
    event_id — tie-free), the transition count and row-normalized
    probability. The reference's dashboards show per-type event rates
    (monitoring/grafana/.../pubg_analytics_dashboard.json) but never
    cross-event sequence structure; this is the engine-side journey
    model those panels can't compute.

    Scale: one window sort partitioned BY USER (thousands of small
    partitions, never a global sort), one hash agg to |types|^2 rows,
    and the per-from_type totals are a window over that tiny post-agg
    frame — the same dimension-sized-window pattern as
    source_mixture_weights. Probability is one division rounded to
    6dp; counts are exact integers."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    total = F.sum("n_transitions").over(
        Window.partitionBy("from_type")
    )
    return steps.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(F.col("n_transitions") / total, 6).alias("p_transition"),
    )


_TRANSITION_SQL = """
WITH steps AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
), c AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM steps WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       ROUND(n_transitions * 1.0 / SUM(n_transitions) OVER (PARTITION BY from_type), 6)
         AS p_transition
FROM c
"""


# --------------------------------------------------- OHLC downsampling

def hourly_value_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling — the classic financial/monitoring resample the
    reference's Grafana panels approximate client-side: per (event_type,
    hour), the first (open) and last (close) observed value, the min/low
    and max/high, and the event count. Open/close ride ONE lexicographic
    struct min/max over (ts, event_id, value) — (ts, event_id) is unique,
    so the pick is deterministic and no row_number window (and its
    full-width shuffle) is needed; the whole query is ONE aggregate with
    ONE exchange. Struct-ordered min/max isn't hash-aggregable (struct
    buffers aren't mutable), so Spark plans a partial SORT-aggregate —
    still map-side combining each partition down to |type x hour| rows
    before the shuffle; the per-partition pre-sort is the price of a
    deterministic open/close and vanishes when storage is laid out
    sorted by (event_type, ts) (sources/io.py z-ordered writes). Values
    pass through untouched (no float arithmetic), so both engines agree
    bit-for-bit."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    key = F.struct(
        F.col("ts").alias("t"), F.col("event_id").alias("i"), F.col("value").alias("v")
    )
    return (
        ev.groupBy(
            "event_type", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour")
        )
        .agg(
            F.min(key).getField("v").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(key).getField("v").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_OHLC_SQL = """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
       (min({'t': ts, 'i': event_id, 'v': value})).v AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       (max({'t': ts, 'i': event_id, 'v': value})).v AS close,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: every purchase credited to the user's
    FIRST-touch and LAST-touch preceding non-purchase event, then the
    purchase counts per (first_touch, last_touch) channel pair — the
    report that decides budget between first- and last-click models.

    Shape: one per-user window (partitioned — never global) computes
    both touches in a single sort via ignore-nulls first/last over the
    strictly-preceding frame; purchases filter AFTER the window (the
    frame must see non-purchase rows), then a tiny keyed aggregate.
    Purchases with no prior touch fold into the 'none' channel."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    enriched = ev.select(
        "event_type",
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return (
        enriched.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("first_touch", F.lit("none")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("none")).alias("last_touch"),
        )
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


_ATTRIBUTION_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type, ts,
         CASE WHEN event_type != 'purchase' THEN event_type END AS touch
  FROM events
), w AS (
  SELECT event_type,
         FIRST_VALUE(touch IGNORE NULLS) OVER pre AS first_touch,
         LAST_VALUE(touch IGNORE NULLS) OVER pre AS last_touch
  FROM e
  WINDOW pre AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT COALESCE(first_touch, 'none') AS first_touch,
       COALESCE(last_touch, 'none') AS last_touch,
       COUNT(*) AS n_purchases
FROM w WHERE event_type = 'purchase' GROUP BY 1, 2
"""


def signup_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: seconds from each user's FIRST
    signup to their first subsequent purchase, reported as exact
    p50/p90 percentiles plus converter count — the activation-latency
    KPI behind onboarding decisions.

    "First SUBSEQUENT purchase" is taken literally: purchases are
    filtered to ts >= the user's first signup BEFORE the per-user min,
    so a user whose earliest purchase predates their signup still
    converts on a later one (min-then-filter silently dropped such
    users — round-4 review fix; the interleaved synthetic events hit
    this).

    Shape: one one-row-per-user min aggregate (map-side combine), the
    broadcast-sized signup table joined back onto the purchase scan
    (same funnel shape as user_purchase_funnel), one conditional min,
    one global percentile — exact interpolated percentile over integer
    microsecond deltas, so both engines interpolate the same doubles.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("signup_us"))
    )
    first_purchase_after = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(first_signup), "user_id")
        .filter(F.unix_micros("ts") >= F.col("signup_us"))
        .groupBy("user_id", "signup_us")
        .agg(F.min(F.unix_micros("ts")).alias("purchase_us"))
    )
    lat = first_purchase_after.select(
        ((F.col("purchase_us") - F.col("signup_us")) / F.lit(1000000.0)).alias(
            "lat_sec"
        )
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converters"),
        F.round(F.percentile("lat_sec", 0.5), 3).alias("p50_sec"),
        F.round(F.percentile("lat_sec", 0.9), 3).alias("p90_sec"),
    )


_LATENCY_SQL = """
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS signup_us
  FROM events WHERE event_type = 'signup' GROUP BY 1
), p AS (
  SELECT e.user_id, s.signup_us, MIN(epoch_us(e.ts)) AS purchase_us
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.signup_us
  GROUP BY 1, 2
), lat AS (
  SELECT (purchase_us - signup_us) / 1000000.0 AS lat_sec FROM p
)
SELECT COUNT(*) AS n_converters,
       ROUND(quantile_cont(lat_sec, 0.5), 3) AS p50_sec,
       ROUND(quantile_cont(lat_sec, 0.9), 3) AS p90_sec
FROM lat
"""


def user_conversation_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT-style training-example assembly: each user's event history
    becomes ONE ordered example (array of turns), truncated to a token
    budget, then re-exploded to per-turn rows for the gate. This is the
    conversation/session packaging step an instruction-tuning pipeline
    runs between curation and shard writing — the reference has no
    example assembly at all (its sinks emit flat rows;
    spark_apps/pubg_streaming.py's parquet sink).

    Plan shape (the part that must hold at 100 TB):
    - ONE hash aggregate builds the per-user example:
      ``array_sort(collect_list(struct(ts, event_id, ...)))`` — the
      in-array sort replaces a window sort of the whole fact table
      (structs sort lexicographically; event_id is unique, so the
      order is total and deterministic).
    - the token-budget cutoff runs INSIDE the array with one
      ``aggregate`` fold (running token sum -> longest affordable
      prefix), so truncation costs zero extra shuffles; per-turn cost
      is ``length(event_type) + 2`` (role + separator tokens).
    - ``slice`` + ``posexplode`` emit only the kept turns.

    Oracle: with strictly positive turn costs the kept prefix equals
    exactly the rows whose running cost sum ≤ budget, which DuckDB
    expresses with one cumulative window — same order key, same cost
    literal."""
    budget = 64
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    turns = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type", "value"))
        ).alias("__turns")
    )
    # NULL-safe cost: a NULL event_type would make new_cum NULL, the
    # `exceeded` predicate NULL (falls to otherwise -> turn kept), and
    # cum NULL forever — unbounded output. coalesce pins NULL turns to
    # the 2-token role/separator floor on BOTH engines.
    cost = lambda t: (  # noqa: E731
        F.length(F.coalesce(t["event_type"], F.lit(""))).cast("bigint") + F.lit(2)
    )

    def _step(acc, t):
        new_cum = acc["cum"] + cost(t)
        exceeded = acc["stop"] | (new_cum > budget)
        return F.struct(
            new_cum.alias("cum"),
            F.when(exceeded, acc["keep"]).otherwise(acc["keep"] + 1).alias("keep"),
            exceeded.alias("stop"),
        )

    keep_n = F.aggregate(
        "__turns",
        F.struct(
            F.lit(0).cast("bigint").alias("cum"),
            F.lit(0).alias("keep"),
            F.lit(False).alias("stop"),
        ),
        _step,
        lambda acc: acc["keep"],
    )
    kept = turns.select("user_id", F.posexplode(F.slice("__turns", 1, keep_n)))
    return kept.select(
        "user_id",
        (F.col("pos") + 1).alias("turn_idx"),
        F.date_format(F.col("col.ts"), "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.col("col.event_type").alias("event_type"),
        F.col("col.value").alias("value"),
        (F.length(F.coalesce(F.col("col.event_type"), F.lit(""))) + 2).alias(
            "turn_tokens"
        ),
    )


_CONVERSATION_SQL = """
WITH seq AS (
  SELECT user_id, ts, event_type, value,
         ROW_NUMBER() OVER w AS turn_idx,
         SUM(length(COALESCE(event_type, '')) + 2) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(turn_idx AS INT) AS turn_idx,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       event_type, value,
       CAST(length(COALESCE(event_type, '')) + 2 AS INT) AS turn_tokens
FROM seq WHERE cum <= 64
"""


def preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLHF/DPO preference-pair assembly: for every user with >= 2
    purchase events, emit (chosen, rejected) = (highest-value,
    lowest-value) purchase with the preference margin — the standard
    reward-model / DPO training-pair shape, next to the SFT
    conversation assembly (user_conversation_examples). One aggregation
    per user via max_by/min_by over a composite ordering struct (no
    self-join, no window): ties on value break to the SMALLEST event_id
    on the chosen side and the LARGEST on the rejected side, so a user
    whose purchases all tie still yields two distinct events. Scales as
    a plain hash aggregate; margin is derived from per-row-rounded
    values (exact double max/min, no agg-order noise)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    ).select("user_id", "event_id", F.round("value", 2).alias("v"))
    # ONE ordering key serves both sides: the chosen/rejected asymmetry
    # lives entirely in max_by vs min_by (maximize -> smallest id on a
    # value tie; minimize -> largest id), not in the struct.
    ord_key = F.struct(F.col("v"), (-F.col("event_id")).alias("tb"))
    agged = p.groupBy("user_id").agg(
        F.max_by("event_id", ord_key).alias("chosen_event_id"),
        F.min_by("event_id", ord_key).alias("rejected_event_id"),
        F.max("v").alias("v_max"),
        F.min("v").alias("v_min"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        agged.where(F.col("n") >= 2)
        .select(
            "user_id",
            "chosen_event_id",
            "rejected_event_id",
            F.round(F.col("v_max") - F.col("v_min"), 2).alias("margin"),
        )
    )


# Oracle pins the same tie-break through two ROW_NUMBER orderings
# (value DESC, event_id ASC for chosen; value ASC, event_id DESC for
# rejected — identical to max_by/min_by over (v, -event_id)).
_PREFERENCE_SQL = """
WITH p AS (
  SELECT user_id, event_id, ROUND(value, 2) AS v,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ROUND(value, 2) DESC, event_id ASC) AS rb,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ROUND(value, 2) ASC, event_id DESC) AS rw,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL AND user_id IS NOT NULL
)
SELECT b.user_id, b.event_id AS chosen_event_id, w.event_id AS rejected_event_id,
       ROUND(b.v - w.v, 2) AS margin
FROM p b JOIN p w ON b.user_id = w.user_id AND b.rb = 1 AND w.rw = 1
WHERE b.n >= 2
"""


def user_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of per-user total value within each
    event_type — the inequality readout behind "do 1% of users drive
    90% of revenue?" (and, on a corpus, "do 1% of domains dominate the
    token mix?" — same operator over documents.source).

    Scale design: the rank-sum formula
    ``G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n`` needs a total order PER
    GROUP, and a bare window partitioned only by event_type funnels
    each type's full user set through one task. This uses the same
    two-phase decomposition as operators/windows.global_rank,
    generalized per group: range-bucket x within each type (per-type
    min/max is a |types|-row broadcast), rank locally per
    (type, bucket), and lift to the global rank contribution via
    exclusive bucket offsets — ``sum_global(i*x) = sum_b(local_s1 +
    offset_b * sum_b(x))``. Every sum is exact integer cents, so the
    only float op is the final division (deterministic); the oracle
    computes the same statistic through a plain rank window —
    independent mechanisms, same math."""
    ev = load_table(spark, sf_dir, "events")
    peruser = (
        ev.where(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.sum(exact_scaled(F.col("value"))).alias("x"))
    )
    n_buckets = 32
    rng = peruser.groupBy("event_type").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    bucketed = peruser.join(F.broadcast(rng), "event_type").withColumn(
        "bkt",
        F.when(F.col("mx") == F.col("mn"), F.lit(1)).otherwise(
            F.least(
                F.lit(n_buckets),
                (
                    F.floor(
                        (F.col("x") - F.col("mn"))
                        * n_buckets
                        / (F.col("mx") - F.col("mn") + 1)
                    )
                    + 1
                ).cast("int"),
            )
        ),
    )
    stats = bucketed.groupBy("event_type", "bkt").agg(
        F.count(F.lit(1)).alias("n_b"), F.sum("x").alias("sx")
    )
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offsets = stats.withColumn("off", F.sum("n_b").over(w_off) - F.col("n_b"))
    w_local = Window.partitionBy("event_type", "bkt").orderBy(
        F.col("x").asc(), F.col("user_id").asc()
    )
    # The rank-weighted sum is O(n^2 * x) per event_type: at 10^9 users
    # x cents it overflows int64 (ANSI mode raises) long before 100 TB.
    # Both product legs are widened to decimal(38,0) BEFORE summing —
    # rank/offset bounded by 10^12 rows per group, cents by 10^25 —
    # exact integer arithmetic end to end; only the final division is
    # floating point.
    per_bucket = (
        bucketed.withColumn("i", F.row_number().over(w_local))
        .groupBy("event_type", "bkt")
        .agg(
            F.sum(
                F.col("i").cast("decimal(12,0)") * F.col("x").cast("decimal(25,0)")
            ).alias("s1")
        )
    )
    per_type = (
        per_bucket.join(F.broadcast(offsets), ["event_type", "bkt"])
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("s1")
                + F.col("off").cast("decimal(12,0)")
                * F.col("sx").cast("decimal(25,0)")
            ).alias("s"),
            F.sum("n_b").alias("n_users"),
            F.sum("sx").alias("t"),
        )
    )
    gini = F.when(
        (F.col("t") > 0) & (F.col("n_users") > 0),
        F.round(
            2.0 * F.col("s").cast("double")
            / (F.col("n_users").cast("double") * F.col("t").cast("double"))
            - (F.col("n_users") + 1.0) / F.col("n_users"),
            6,
        ),
    )
    return per_type.select("event_type", "n_users", gini.alias("gini"))


def session_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-session conversion funnel: a session (30-minute
    gaps-and-islands, the shared construction) converts when it
    contains a view FOLLOWED by a purchase — ordering inside the
    session matters, unlike the lifetime-level user_purchase_funnel.
    Daily cohorts of session starts report volume and conversion rate.
    One sessionize window + one aggregate; the order test is
    ``min(view ts) <= max(purchase ts)`` computed inside the same
    grouped agg (no self-join, no second window)."""
    from pubg_data_pipeline_spark.operators.timeseries import sessionize

    ev = load_table(spark, sf_dir, "events")
    per_sess = sessionize(ev).groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("last_purchase"),
    )
    converted = (
        F.col("first_view").isNotNull()
        & F.col("last_purchase").isNotNull()
        & (F.col("first_view") <= F.col("last_purchase"))
    ).cast("long")
    return (
        per_sess.select(F.date_format("s_start", "yyyy-MM-dd").alias("cohort_day"), converted.alias("c"))
        .groupBy("cohort_day")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("c").alias("n_converted"),
            F.round(F.sum("c") / F.count(F.lit(1)), 4).alias("conversion_rate"),
        )
    )


_SESSION_CONVERSION_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800.0 THEN 1 ELSE 0 END AS is_new
  FROM events WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
), per_sess AS (
  SELECT user_id, session_id, MIN(ts) AS s_start,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
  FROM s GROUP BY user_id, session_id
)
SELECT strftime(s_start, '%Y-%m-%d') AS cohort_day,
       COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN first_view IS NOT NULL AND last_purchase IS NOT NULL
                 AND first_view <= last_purchase THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       ROUND(SUM(CASE WHEN first_view IS NOT NULL AND last_purchase IS NOT NULL
                       AND first_view <= last_purchase THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS conversion_rate
FROM per_sess GROUP BY strftime(s_start, '%Y-%m-%d')
"""


_GINI_SQL = f"""
WITH pu AS (
  SELECT event_type, user_id, SUM({sql_scaled('value', 2)}) AS x
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
  GROUP BY event_type, user_id
), r AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x, user_id) AS i
  FROM pu
)
SELECT event_type, COUNT(*) AS n_users,
       CASE WHEN SUM(x) > 0 AND COUNT(*) > 0
            THEN ROUND(2.0 * SUM(i * x) / (COUNT(*) * SUM(x))
                       - (COUNT(*) + 1.0) / COUNT(*), 6)
       END AS gini
FROM r GROUP BY event_type
"""


def session_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-class row-pattern recognition, the SQL-standard
    feature (Trino/Flink) Spark lacks, as the composition in
    operators/sequence.py: sessionize -> fold each session's event
    types into one deterministic ``>``-delimited string -> regex match.
    Per user: total 30-min sessions, sessions containing the
    view -> click -> purchase funnel as an ordered SUBSEQUENCE (any
    events between steps), and sessions containing a click IMMEDIATELY
    followed by a purchase (adjacency) — the two pattern classes that
    cover most funnel/journey analytics. One sequences pass serves both
    patterns. The oracle replays the identical fold with
    ``string_agg(... ORDER BY ts, event_id)`` and RE2 ``regexp_matches``
    (patterns use only the Java/RE2-common subset)."""
    from pubg_data_pipeline_spark.operators import sequence

    ev = load_table(spark, sf_dir, "events")
    seqs = sequence.session_sequences(ev)
    funnel = sequence.subsequence_pattern("view", "click", "purchase")
    adjacent = sequence.adjacency_pattern("click", "purchase")
    return seqs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count(
            F.when(sequence.matches_pattern(F.col("seq"), funnel), 1)
        ).alias("n_funnel_sessions"),
        F.count(
            F.when(sequence.matches_pattern(F.col("seq"), adjacent), 1)
        ).alias("n_adjacent_sessions"),
    )


_PATTERN_SQL = r"""
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800.0 THEN 1 ELSE 0 END AS is_new
  FROM events WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
), q AS (
  SELECT user_id, session_id,
         '>' || string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
  FROM s GROUP BY user_id, session_id
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       COUNT(*) FILTER (
         WHERE regexp_matches(seq, '>view(>[^>]+)*>click(>[^>]+)*>purchase(?:>|$)')
       ) AS n_funnel_sessions,
       COUNT(*) FILTER (
         WHERE regexp_matches(seq, '>click>purchase(?:>|$)')
       ) AS n_adjacent_sessions
FROM q GROUP BY user_id
"""


def funnel_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE cross-row MEASURES: not just "did this session
    convert" (session_pattern_match) but HOW LONG each funnel step
    took. operators/sequence.py:funnel_step_times extracts the matched
    steps' timestamps under first-match skip-to-next semantics (step
    i+1 binds to the first qualifying event strictly after step i in
    the canonical order — the exact subsequence the regex form tests),
    then per cohort day: completed-funnel count and step-delta
    percentiles. Binding is over the WHOLE user journey
    (``gap_seconds=None`` — lifetime conversion spans days; the
    synthetic 30-min sessions average ~1 event, so the session form
    would be vacuous), grouped by the day of the matched first step.
    The oracle replays the same binding as iterated min-position joins
    (arg_min over pos) — sequential conditional aggregation, the
    textbook SQL spelling of funnel measures. Reference contrast:
    advanced_analytics.py:141-161 derives per-step trend deltas
    imperatively per batch."""
    from pubg_data_pipeline_spark.operators import sequence

    ev = load_table(spark, sf_dir, "events")
    ft = sequence.funnel_step_times(
        ev, ["view", "click", "purchase"], gap_seconds=None
    )
    t0, t1, t2 = (F.col("step_ts").getItem(i) for i in range(3))
    d = ft.filter(F.col("completed")).select(
        F.date_format(t0, "yyyy-MM-dd").alias("cohort_day"),
        ((F.unix_micros(t1) - F.unix_micros(t0)) / 1000000.0).alias("view_click_sec"),
        ((F.unix_micros(t2) - F.unix_micros(t1)) / 1000000.0).alias("click_purchase_sec"),
        ((F.unix_micros(t2) - F.unix_micros(t0)) / 1000000.0).alias("total_sec"),
    )
    return d.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_funnels"),
        F.round(F.percentile("view_click_sec", 0.5), 3).alias("p50_view_click_sec"),
        F.round(F.percentile("click_purchase_sec", 0.5), 3).alias("p50_click_purchase_sec"),
        F.round(F.percentile("total_sec", 0.9), 3).alias("p90_total_sec"),
    )


_FUNNEL_LATENCY_SQL = r"""
WITH s AS (
  SELECT user_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
  FROM events WHERE user_id IS NOT NULL
), f1 AS (
  SELECT user_id, MIN(pos) AS p1, arg_min(ts, pos) AS t1
  FROM s WHERE event_type = 'view' GROUP BY user_id
), f2 AS (
  SELECT s.user_id, MIN(s.pos) AS p2, arg_min(s.ts, s.pos) AS t2
  FROM s JOIN f1 ON s.user_id = f1.user_id
  WHERE s.event_type = 'click' AND s.pos > f1.p1
  GROUP BY s.user_id
), f3 AS (
  SELECT s.user_id, arg_min(s.ts, s.pos) AS t3
  FROM s JOIN f2 ON s.user_id = f2.user_id
  WHERE s.event_type = 'purchase' AND s.pos > f2.p2
  GROUP BY s.user_id
), d AS (
  SELECT strftime(f1.t1, '%Y-%m-%d') AS cohort_day,
         (epoch_us(f2.t2) - epoch_us(f1.t1)) / 1000000.0 AS view_click_sec,
         (epoch_us(f3.t3) - epoch_us(f2.t2)) / 1000000.0 AS click_purchase_sec,
         (epoch_us(f3.t3) - epoch_us(f1.t1)) / 1000000.0 AS total_sec
  FROM f1
  JOIN f2 ON f1.user_id = f2.user_id
  JOIN f3 ON f1.user_id = f3.user_id
)
SELECT cohort_day, COUNT(*) AS n_funnels,
       ROUND(quantile_cont(view_click_sec, 0.5), 3) AS p50_view_click_sec,
       ROUND(quantile_cont(click_purchase_sec, 0.5), 3) AS p50_click_purchase_sec,
       ROUND(quantile_cont(total_sec, 0.9), 3) AS p90_total_sec
FROM d GROUP BY cohort_day
"""


def funnel_conversion_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE MEASURES beyond timestamps (``A.value``): the
    measures fold also captures chosen COLUMNS at each bound event —
    here the purchase VALUE at the funnel's bound purchase step, per
    first-view cohort day. The oracle binds the same step by exact
    position (min-pos row lookup, NULL-safe — arg_min would skip a
    NULL-valued bound event and silently read the next row)."""
    from pubg_data_pipeline_spark.operators import sequence

    ev = load_table(spark, sf_dir, "events")
    ft = sequence.funnel_step_times(
        ev,
        ["view", "click", "purchase"],
        gap_seconds=None,
        measure_cols=["value"],
    )
    done = ft.filter(F.col("completed"))
    return (
        done.select(
            F.date_format(F.col("step_ts").getItem(0), "yyyy-MM-dd").alias(
                "cohort_day"
            ),
            F.col("step_value").getItem(2).alias("pv"),
        )
        .groupBy("cohort_day")
        .agg(
            F.count(F.lit(1)).alias("n_funnels"),
            F.round(F.median("pv"), 4).alias("med_purchase_value"),
            F.round(F.sum("pv"), 4).alias("sum_purchase_value"),
        )
    )


_FUNNEL_VALUES_SQL = r"""
WITH s AS (
  SELECT user_id, ts, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
  FROM events WHERE user_id IS NOT NULL
), f1 AS (
  SELECT user_id, MIN(pos) AS p1, arg_min(ts, pos) AS t1
  FROM s WHERE event_type = 'view' GROUP BY user_id
), f2 AS (
  SELECT s.user_id, MIN(s.pos) AS p2
  FROM s JOIN f1 ON s.user_id = f1.user_id
  WHERE s.event_type = 'click' AND s.pos > f1.p1
  GROUP BY s.user_id
), f3 AS (
  SELECT s.user_id, MIN(s.pos) AS p3
  FROM s JOIN f2 ON s.user_id = f2.user_id
  WHERE s.event_type = 'purchase' AND s.pos > f2.p2
  GROUP BY s.user_id
), bound AS (
  SELECT f1.user_id, f1.t1, s.value AS pv
  FROM f1
  JOIN f3 ON f1.user_id = f3.user_id
  JOIN s ON s.user_id = f3.user_id AND s.pos = f3.p3
)
SELECT strftime(t1, '%Y-%m-%d') AS cohort_day,
       COUNT(*) AS n_funnels,
       ROUND(CAST(median(pv) AS DOUBLE), 4) AS med_purchase_value,
       ROUND(SUM(pv), 4) AS sum_purchase_value
FROM bound GROUP BY strftime(t1, '%Y-%m-%d')
"""


def error_burst_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified row-pattern recognition (MATCH_RECOGNIZE ``A{m,}``):
    sessions containing >= 2 CONSECUTIVE error events — the burst
    shape adjacency alone can't spell and subsequence deliberately
    ignores. One session_sequences pass; the repetition builder emits
    the RE2-common quantifier form both engines run verbatim."""
    from pubg_data_pipeline_spark.operators import sequence

    ev = load_table(spark, sf_dir, "events")
    seqs = sequence.session_sequences(ev)
    burst = sequence.repetition_pattern("error", 2)
    return (
        seqs.select(
            F.date_format("session_start", "yyyy-MM-dd").alias("day"),
            sequence.matches_pattern(F.col("seq"), burst).alias("b"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.count(F.when(F.col("b"), 1)).alias("n_burst_sessions"),
        )
    )


_ERROR_BURST_SQL = r"""
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800.0 THEN 1 ELSE 0 END AS is_new
  FROM events WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
), q AS (
  SELECT user_id, session_id, MIN(ts) AS s_start,
         '>' || string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
  FROM s GROUP BY user_id, session_id
)
SELECT strftime(s_start, '%Y-%m-%d') AS day,
       COUNT(*) AS n_sessions,
       COUNT(*) FILTER (
         WHERE regexp_matches(seq, '(?:>error){2,}(?:>|$)')
       ) AS n_burst_sessions
FROM q GROUP BY strftime(s_start, '%Y-%m-%d')
"""


SPECS = [
    QuerySpec(
        "session_pattern_match",
        session_pattern_match,
        _PATTERN_SQL,
        ("behavior", "window", "agg", "sequence"),
    ),
    QuerySpec(
        "funnel_step_latency",
        funnel_step_latency,
        _FUNNEL_LATENCY_SQL,
        ("behavior", "window", "agg", "sequence"),
    ),
    QuerySpec(
        "funnel_conversion_values",
        funnel_conversion_values,
        _FUNNEL_VALUES_SQL,
        ("behavior", "window", "agg", "sequence"),
    ),
    QuerySpec(
        "error_burst_sessions",
        error_burst_sessions,
        _ERROR_BURST_SQL,
        ("behavior", "window", "agg", "sequence"),
    ),
    QuerySpec("rfm_segments", rfm_segments, _RFM_SQL, ("behavior", "agg", "window")),
    QuerySpec(
        "preference_pairs", preference_pairs, _PREFERENCE_SQL, ("behavior", "llm", "curation")
    ),
    QuerySpec("user_value_gini", user_value_gini, _GINI_SQL, ("behavior", "stats", "window")),
    QuerySpec(
        "session_conversion_rate",
        session_conversion_rate,
        _SESSION_CONVERSION_SQL,
        ("behavior", "window", "agg"),
    ),
    QuerySpec(
        "user_conversation_examples",
        user_conversation_examples,
        _CONVERSATION_SQL,
        ("behavior", "llm", "curation"),
    ),
    QuerySpec(
        "purchase_attribution", purchase_attribution, _ATTRIBUTION_SQL, ("behavior", "window")
    ),
    QuerySpec(
        "signup_purchase_latency", signup_purchase_latency, _LATENCY_SQL, ("behavior", "agg")
    ),
    QuerySpec("part_basket_pairs", part_basket_pairs, _BASKET_SQL, ("behavior", "join")),
    QuerySpec("user_purchase_funnel", user_purchase_funnel, _FUNNEL_SQL, ("behavior", "agg")),
    QuerySpec(
        "weekly_retention_cohorts", weekly_retention_cohorts, _RETENTION_SQL, ("behavior", "agg")
    ),
    QuerySpec("user_value_ewma", user_value_ewma, _ewma_sql(), ("behavior", "time", "window")),
    QuerySpec("hourly_linear_interp", hourly_linear_interp, _INTERP_SQL, ("behavior", "time")),
    QuerySpec(
        "event_transition_matrix", event_transition_matrix, _TRANSITION_SQL,
        ("behavior", "window", "agg"),
    ),
    QuerySpec("hourly_value_ohlc", hourly_value_ohlc, _OHLC_SQL, ("behavior", "time", "agg")),
]
