"""Time-series kit: bucketing, spine fill, last/max_by, hourly rollups.

Covers the reference's hour bucketing (reference:
spark_apps/advanced_analytics.py:236-248 buckets with
``date_format(processed_at, "yyyy-MM-dd HH")``) and the downstream
InfluxQL dashboard surface (SURVEY.md §2.8): ``GROUP BY time(1h)
fill(null)`` becomes a generated time spine left-joined to the
aggregate; ``last()`` becomes ``max_by(value, ts)``.

Bucket keys are emitted as strings (``yyyy-MM-dd HH``) so oracle
comparison is precision-safe across engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_FMT = {"hour": "yyyy-MM-dd HH", "day": "yyyy-MM-dd", "minute": "yyyy-MM-dd HH:mm"}
_INTERVAL = {"hour": "interval 1 hour", "day": "interval 1 day", "minute": "interval 1 minute"}


def time_bucket(ts: Column, granularity: str = "hour") -> Column:
    """String time bucket, reference-style (P13)."""
    return F.date_format(ts, _FMT[granularity])


def bucketed_agg(
    df: DataFrame,
    ts_col: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    granularity: str = "hour",
    bucket_name: str = "bucket",
) -> DataFrame:
    """GROUP BY time(granularity), dims — one hash-agg shuffle; partial
    aggregation (map-side combine) applies automatically."""
    return df.groupBy(
        time_bucket(F.col(ts_col), granularity).alias(bucket_name), *group_cols
    ).agg(*aggs)


def time_spine(
    df: DataFrame, ts_col: str, granularity: str = "hour", bucket_name: str = "bucket"
) -> DataFrame:
    """Complete bucket spine spanning [min(ts), max(ts)] of the input:
    ``sequence(date_trunc(min), date_trunc(max), interval)`` exploded.
    One row per bucket — tiny, broadcastable."""
    bounds = df.agg(
        F.date_trunc(granularity, F.min(ts_col)).alias("lo"),
        F.date_trunc(granularity, F.max(ts_col)).alias("hi"),
    )
    return bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr(_INTERVAL[granularity]))).alias("__t")
    ).select(time_bucket(F.col("__t"), granularity).alias(bucket_name))


def spine_filled_agg(
    df: DataFrame,
    ts_col: str,
    aggs: Sequence[Column],
    granularity: str = "hour",
    bucket_name: str = "bucket",
) -> DataFrame:
    """InfluxQL ``GROUP BY time(...) fill(null)`` (dashboard queries Q2/
    Q3/Q5/Q10 — e.g. monitoring/grafana .../advanced_analytics_dashboard
    .json:55): aggregate per bucket, then left-join from the full spine
    so empty buckets surface as nulls. The aggregated side is small, so
    the join broadcasts."""
    agged = bucketed_agg(df, ts_col, [], aggs, granularity, bucket_name)
    spine = time_spine(df, ts_col, granularity, bucket_name)
    return spine.join(F.broadcast(agged), bucket_name, "left")


def last_by(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """InfluxQL/Flux ``last()`` per series (dashboard Q6/Q8/Q12):
    ``max_by(value, ts)`` — a single hash aggregation, no window sort."""
    aggs = [F.max_by(c, order_col).alias(f"last_{c}") for c in value_cols]
    aggs.append(F.max(order_col).alias(f"max_{order_col}"))
    return df.groupBy(*keys).agg(*aggs)


def forward_fill(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """LOCF (last-observation-carried-forward) gap fill per series:
    ``last(value, ignorenulls=True)`` over a running row frame — the
    standard sensor/metrics repair for missing samples (the reference's
    dashboards rely on Grafana ``fill(previous)``; this is the
    engine-side equivalent, cf. spine_filled_agg for the zero-fill
    form). One window sort per series partition, no shuffle beyond the
    partition exchange; at 100 TB series keys partition the sort."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col or f"{value_col}_filled",
        F.last(F.col(value_col), ignorenulls=True).over(w),
    )


def recent_top_k(df: DataFrame, ts_col: str, tiebreak: str, k: int = 10) -> DataFrame:
    """``ORDER BY time DESC LIMIT k`` (dashboard Q7) — plans as
    TakeOrderedAndProject (distributed two-phase top-k)."""
    return df.orderBy(F.col(ts_col).desc(), F.col(tiebreak).desc()).limit(k)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: each left row picks the LATEST right row of the
    same key with ``right_ts <= left_ts`` (``direction="backward"``,
    inclusive; the default) or the EARLIEST right row with
    ``right_ts >= left_ts`` (``direction="forward"``), null-padded
    when no matching right row exists — the point-in-time lookup of
    time-series stores (kdb aj, DuckDB ASOF JOIN), which Spark has no
    native operator for.

    Implemented as union-tag-window rather than a range join: tag both
    sides, sort each key's rows once by (ts, right-before-left), and
    carry the last non-null right values forward with
    ``last(..., ignorenulls=True)`` over a running frame. One shuffle on
    the key, O(n log n) in partition size — never the O(n*m) blow-up of
    a range-predicate join, and partition-parallel at 100 TB because
    state never crosses key boundaries. ``tiebreak`` (a right column)
    makes the pick deterministic if a key has duplicate right_ts values.

    ``tolerance_seconds`` (pandas merge_asof parity): a match farther
    than the tolerance from the left timestamp is nulled out — the
    left row survives unmatched. Implemented as a post-pick mask, so
    it adds zero shuffles.
    """
    keys = list(keys)
    # The matched right row is carried as ONE struct (its ts + the
    # requested columns), so every emitted right_<c> value comes from
    # the SAME matched row — per-column carries would let a NULL field
    # on the nearest row fall through to an older row's value, mixing
    # rows (and, with a tolerance, emitting values staler than the
    # bound). Struct nullability also makes the carry well-defined:
    # the struct itself is non-null for every right row even when all
    # its fields are null.
    rstruct_src = F.struct(
        F.col(right_ts).alias("__rmt"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    # __tie keeps the tiebreak column's OWN type: casting to long would
    # ANSI-crash on string tiebreaks and collapse distinct fractional
    # values into ties (left rows carry a typed NULL — tie ordering
    # only ever compares rows of the same side, __side sorts first).
    tie_type = right.schema[tiebreak].dataType if tiebreak else "int"
    lhs = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(tie_type).alias("__tie"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast(
            right.select(rstruct_src.alias("__r")).schema["__r"].dataType
        ).alias("__rrow"),
    )
    # Equi-join/ASOF NULL semantics (what the DuckDB oracle and pandas
    # merge_asof do): a right row with a NULL key or NULL timestamp can
    # never match anything — drop it here, or NULLS-FIRST ordering
    # would hand it out as the "earliest" match of its partition. Left
    # rows are NEVER dropped (left-join contract); NULL-ts left rows
    # are null-masked after the pick below.
    rhs_src = right.filter(F.col(right_ts).isNotNull())
    for k in keys:
        rhs_src = rhs_src.filter(F.col(k).isNotNull())
    tie = F.col(tiebreak) if tiebreak else F.lit(0).cast(tie_type)
    rhs = rhs_src.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        tie.alias("__tie"),
        F.lit(None).cast(lhs.schema["__lrow"].dataType).alias("__lrow"),
        rstruct_src.alias("__rrow"),
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    unioned = lhs.unionByName(rhs)
    if direction == "backward":
        # Right rows sort BEFORE left rows at equal ts (side desc) so
        # the match is inclusive; among equal-ts right rows the largest
        # tiebreak sorts last and wins the carry.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").desc(), F.col("__tie").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = F.last("__rrow", ignorenulls=True).over(w).alias("__rrow")
    else:
        # Forward: look DOWN the timeline — right rows sort AFTER left
        # rows at equal ts (side asc, still inclusive) and the first
        # right row in the following frame wins; among equal-ts right
        # rows the smallest tiebreak is first.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc_nulls_first())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picked = F.first("__rrow", ignorenulls=True).over(w).alias("__rrow")
    lefts = unioned.select("__side", "__ts", "__lrow", picked).filter(
        F.col("__side") == 0
    )
    # a NULL-ts left row satisfies no ASOF predicate: keep the row
    # (left-join contract) but null the match — unmasked, NULLS-FIRST
    # ordering would hand forward-mode NULL-ts rows the earliest right
    # row of their key
    lefts = lefts.select(
        "__side",
        "__ts",
        "__lrow",
        F.when(F.col("__ts").isNotNull(), F.col("__rrow")).alias("__rrow"),
    )
    if tolerance_seconds is not None:
        matched_ts = F.col("__rrow.__rmt")
        delta = (
            F.unix_micros(F.col("__ts")) - F.unix_micros(matched_ts)
            if direction == "backward"
            else F.unix_micros(matched_ts) - F.unix_micros(F.col("__ts"))
        )
        within = delta <= F.lit(int(tolerance_seconds * 1_000_000))
        lefts = lefts.select(
            "__side", "__ts", "__lrow", F.when(within, F.col("__rrow")).alias("__rrow")
        )
    out = lefts.select(
        "__lrow.*",
        *[F.col(f"__rrow.__r_{c}").alias(f"right_{c}") for c in right_cols],
    )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    bucket_seconds: int = 600,
) -> DataFrame:
    """Inner join of point rows into interval rows where
    ``start_col <= point_ts <= end_col`` (both inclusive), optionally
    also matching on equality ``keys`` — the big-big range join Spark
    has no native operator for. (Reference analog: the alert manager's
    fixed 15-minute suppression window membership,
    reference monitoring/alert_manager.py:83-94, is the degenerate
    single-interval-per-key case; this operator generalizes to
    arbitrary interval tables at scale.)

    Without an equi component Catalyst plans BroadcastNestedLoopJoin —
    O(|points| x |intervals|) and only viable when one side broadcasts.
    This operator manufactures the equi key by TIME BANDING: each point
    hashes to its single ``bucket_seconds`` bucket; each interval
    explodes to every bucket it overlaps (``sequence`` over the bucket
    range). The join is then a plain equi-join on (keys..., bucket)
    with the exact range predicate applied as a post-join filter, so
    both sides shuffle-partition by bucket and no pair outside
    overlapping buckets is ever generated. Each qualifying (point,
    interval) pair is produced EXACTLY once — the point contributes
    one bucket and the interval covers that bucket once — so no dedup
    pass is needed (same argument as the fuzzy join's length bands,
    operators/relational.py:fuzzy_blocked_pairs).

    Scale: choose ``bucket_seconds`` near the typical interval length;
    candidate fan-out per interval is ``len/bucket_seconds + 1`` rows.
    Point and interval column names must be disjoint (pre-alias if
    both derive from one table).

    Composition note: for LEFT semantics (keep intervals with no
    points), aggregate this inner result per interval id and join back
    — the unmatched side is |intervals|-bounded, never the point table.
    """
    keys = list(keys)
    usec = bucket_seconds * 1_000_000
    # floor (not cast-truncate) keeps bucket math correct for pre-1970
    # timestamps too.
    pt = points.withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(point_ts)) / usec).cast("long")
    )
    b_start = F.floor(F.unix_micros(F.col(start_col)) / usec).cast("long")
    b_end = F.floor(F.unix_micros(F.col(end_col)) / usec).cast("long")
    # Fail fast on a pathological interval instead of letting one dirty
    # row (an open-ended 9999-12-31 sentinel, an end in raw micros)
    # explode into 10^8+ bucket elements — an array near the 2^31
    # element limit or a multi-GB fan-out straggler that kills the
    # whole join. 1e6 buckets (~19 years at the 600s default) is far
    # beyond any legitimate interval; widen bucket_seconds for
    # genuinely long intervals.
    span_ok = F.assert_true(
        (b_end - b_start) < F.lit(1_000_000),
        F.lit(
            "interval_join: an interval spans >= 1e6 buckets — dirty "
            "open-ended row or bucket_seconds far too small for the "
            "interval lengths; clean the interval or raise bucket_seconds"
        ),
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            # assert_true is NULL on pass, so coalesce keeps the check
            # inside the used expression (survives column pruning)
            F.coalesce(span_ok.cast("array<bigint>"), F.sequence(b_start, b_end))
        ),
    )
    cond = pt["__bucket"] == iv["__bucket"]
    for k in keys:
        cond = cond & (pt[k] == iv[k])
    cond = (
        cond
        & (pt[point_ts] >= iv[start_col])
        & (pt[point_ts] <= iv[end_col])
    )
    joined = pt.join(iv, cond)
    drop_dups = [iv[k] for k in keys]
    out = joined.drop(pt["__bucket"]).drop(iv["__bucket"])
    for c in drop_dups:
        out = out.drop(c)
    return out


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    tiebreak: str = "event_id",
    gap_seconds: float = 1800.0,
    drop_null_keys: bool = True,
) -> DataFrame:
    """Gaps-and-islands sessionization — THE shared construction behind
    every batch session query (user_sessions, session_conversion_rate,
    session_incident_overlap): lag -> new-session flag on a strict
    ``> gap_seconds`` inactivity break -> running sum as the session
    id. Centralized so the break rule and (ts, tiebreak) ordering can
    never drift apart between the query families that must agree with
    each other (and with ``F.session_window``'s inclusive-merge twin,
    see user_sessions_native). By default NULL keys are dropped — a
    NULL partition would lump every keyless event into one giant
    session; pass ``drop_null_keys=False`` only when the consumer's
    contract pins the NULL-group behavior. Adds a ``session_id``
    column; all input columns pass through."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    prev = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("double") - prev.cast("double")
    out = df.where(F.col(key).isNotNull()) if drop_null_keys else df
    return (
        out.withColumn("__is_new", F.when(prev.isNull() | (gap > gap_seconds), 1).otherwise(0))
        .withColumn(
            "session_id",
            F.sum("__is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .drop("__is_new")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    keys: Sequence[str] = (),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join of two INTERVAL tables on closed-interval overlap
    (``left_start <= right_end AND right_start <= left_end``),
    optionally also on equality ``keys`` — the interval-interval
    generalization of :func:`interval_join` (point-in-interval).
    Without an equi component Catalyst can only plan a nested-loop
    join; this keeps the banding strategy.

    Both sides explode to the ``bucket_seconds`` buckets they cover,
    so a pair sharing k buckets would naively surface k times. The
    dedup-free trick: overlap of closed intervals implies the later
    start ``max(left_start, right_start)`` lies inside BOTH intervals,
    hence its bucket is covered by both sides exactly once — so the
    join keeps only the candidate where the shared bucket equals that
    max-start bucket, emitting every qualifying pair EXACTLY once with
    no distinct pass. (Same exactly-once argument as interval_join's
    single point bucket, shifted to the pair's max start.)

    Scale: shuffle partitions by (keys..., bucket); per-row fan-out is
    ``len/bucket_seconds + 1`` — pick bucket_seconds near the typical
    interval length. The 1e6-bucket fail-fast from interval_join
    applies to each side (dirty open-ended intervals die loudly, not
    as a multi-GB straggler). Column names of the two sides must be
    disjoint (pre-alias if both derive from one table)."""
    keys = list(keys)
    usec = bucket_seconds * 1_000_000

    def _banded(df: DataFrame, start_col: str, end_col: str, side: str) -> DataFrame:
        b_start = F.floor(F.unix_micros(F.col(start_col)) / usec).cast("long")
        b_end = F.floor(F.unix_micros(F.col(end_col)) / usec).cast("long")
        span_ok = F.assert_true(
            (b_end - b_start) < F.lit(1_000_000),
            F.lit(
                f"interval_overlap_join: a {side} interval spans >= 1e6 "
                "buckets — dirty open-ended row or bucket_seconds far too "
                "small; clean the interval or raise bucket_seconds"
            ),
        )
        return df.withColumn(
            "__bucket",
            F.explode(F.coalesce(span_ok.cast("array<bigint>"), F.sequence(b_start, b_end))),
        )

    lt = _banded(left, left_start, left_end, "left")
    rt = _banded(right, right_start, right_end, "right")
    cond = lt["__bucket"] == rt["__bucket"]
    for k in keys:
        cond = cond & (lt[k] == rt[k])
    max_start = F.greatest(
        F.unix_micros(lt[left_start]), F.unix_micros(rt[right_start])
    )
    cond = (
        cond
        & (lt[left_start] <= rt[right_end])
        & (rt[right_start] <= lt[left_end])
        # exactly-once: keep only the shared bucket that contains the
        # pair's later start
        & (lt["__bucket"] == F.floor(max_start / usec).cast("long"))
    )
    joined = lt.join(rt, cond)
    out = joined.drop(lt["__bucket"]).drop(rt["__bucket"])
    for k in keys:
        out = out.drop(rt[k])
    return out


def ewma(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.3,
    span: int = 10,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per series, the smoothing
    the reference's Grafana panels apply client-side (SURVEY.md §2.8 —
    e.g. monitoring/grafana dashboards smooth avg_kills series); here
    it is computed engine-side so alerts/queries can use it.

    Uses the finite-span exact form: a weighted sum of the trailing
    ``span`` observations with weights alpha*(1-alpha)^k, normalized
    over the weights actually present (series head has fewer rows).
    Truncating at ``span`` bounds the error by (1-alpha)^span (<3% of
    a unit-scale signal at alpha=.3, span=10) and keeps the whole
    computation a fixed expression over ``lag`` columns — one window
    sort per series, JVM-side, no UDF, no recursive state. The
    infinite-horizon recurrence would need sequential per-row state
    (arbitrary-precision running products overflow); bounded-span lag
    composition is the scale-correct distributed form.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    decay = 1.0 - alpha
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(span):
        v_k = F.lag(F.col(value_col), k).over(w)
        w_k = F.lit(alpha * decay**k)
        num = num + F.when(v_k.isNotNull(), w_k * v_k).otherwise(F.lit(0.0))
        den = den + F.when(v_k.isNotNull(), w_k).otherwise(F.lit(0.0))
    # den folds to 0.0 when the row's value and every in-span
    # predecessor are NULL (e.g. a NULL sample at a series head) —
    # under Spark's default ANSI mode 0.0/0.0 raises DIVIDE_BY_ZERO
    # and kills the whole query; emit NULL for that row instead (the
    # same guard linear_interpolate uses for a zero denominator).
    return df.withColumn(out_col, F.when(den > 0, num / den))


def linear_interpolate(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Grafana ``fill(linear)`` analog (the third fill mode next to
    spine_filled_agg's fill(null) and forward_fill's fill(previous)):
    missing samples are linearly interpolated between the nearest
    non-null neighbors on each side, ordered by a NUMERIC order column
    (epoch seconds / bucket index) so the slope is well-defined.

    Rows before the first or after the last observation fall back to
    the one-sided neighbor (LOCF / NOCB) — same edge rule DuckDB's
    window form produces, so oracle parity holds. Two value windows
    over ONE partition ordering: Catalyst plans a single sort+exchange
    per series; nothing here shuffles twice.
    """
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    known_o = F.when(v.isNotNull(), F.col(order_col))
    pv = F.last(v, ignorenulls=True).over(w_prev)
    po = F.last(known_o, ignorenulls=True).over(w_prev)
    nv = F.first(v, ignorenulls=True).over(w_next)
    no = F.first(known_o, ignorenulls=True).over(w_next)
    interp = (
        F.when(v.isNotNull(), v)
        .when(
            pv.isNotNull() & nv.isNotNull() & (no != po),
            pv + (nv - pv) * (F.col(order_col) - po) / (no - po),
        )
        .when(pv.isNotNull(), pv)
        .otherwise(nv)
    )
    return df.withColumn(out_col or f"{value_col}_interp", interp)
