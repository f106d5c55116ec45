"""Incremental (mergeable) aggregate maintenance.

The reference recomputes every hourly aggregate from the full
micro-batch each epoch (reference: spark_apps/advanced_analytics.py:
236-248) and its alert counters are reset-and-recount Python state
(monitoring/alert_manager.py:398-461). At 100 TB a rollup refresh must
instead be O(new data): keep *partial aggregate states* (count + exact
scaled sum — both associative and commutative) per bucket, reduce each
new partition to states, and merge states with a tiny groupBy over
bucket keys. Averages and other ratios are derived only at finalize
time, never stored (a stored avg is not mergeable).

This is the same partial/final split Catalyst applies inside a single
hash aggregation, lifted to *cross-run* granularity so it can span
days of stored state — the table-maintenance pattern behind
"hypertable rollup" features. Any sketch with a merge operation (HLL
via ``approx_count_distinct``'s binary form, t-digest) slots into the
same state schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_FMT = "yyyy-MM-dd HH"


def partial_hourly_state(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value", digits: int = 2
) -> DataFrame:
    """Reduce raw rows to mergeable per-hour state: (hour_key, n,
    scaled-integer sum). Integer sums are order-independent, so states
    are deterministic regardless of partitioning."""
    scaled = F.round(F.col(value_col) * (10**digits), 0).cast("long")
    return df.groupBy(
        F.date_format(F.date_trunc("hour", F.col(ts_col)), HOUR_FMT).alias("hour_key")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(scaled).alias("scaled_sum"),
    )


def merge_hourly_states(*states: DataFrame) -> DataFrame:
    """Merge any number of partial states: union + re-aggregate. The
    shuffle is over (hour_key) on pre-aggregated rows — cardinality =
    number of distinct hours, not number of events."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("hour_key").agg(
        F.sum("n").alias("n"),
        F.sum("scaled_sum").alias("scaled_sum"),
    )


def negate_hourly_state(state: DataFrame) -> DataFrame:
    """The retraction form of a partial hourly state: counts and sums
    negated, so merging it SUBTRACTS the underlying rows' contribution
    — exact because (count, scaled-integer sum) form an abelian group
    under addition. This is what makes the hourly rollup maintainable
    through change feeds that carry deletes/updates (rollup_cdf_epoch):
    a deleted source row's partial is merged with flipped sign and the
    state lands exactly where a batch recompute would. Hours whose
    count returns to zero should be filtered out after the merge
    (``n != 0``)."""
    return state.select(
        "hour_key",
        (-F.col("n")).alias("n"),
        (-F.col("scaled_sum")).alias("scaled_sum"),
    )


def partial_keyed_state(
    df: DataFrame, key_cols: list[str], value_col: str, digits: int = 2
) -> DataFrame:
    """Generalized mergeable state over arbitrary group keys: (keys...,
    n, scaled-integer total) — the hourly state with the bucketing key
    swapped for the caller's keys. Feeds the keyed aggregate-view
    maintenance loop (streaming/app.maintain_agg_view_table) and the
    batch counting algorithm (maintain_agg_view)."""
    scaled = F.round(F.col(value_col) * (10**digits), 0).cast("long")
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(scaled).alias("total"),
    )


def negate_keyed_state(state: DataFrame, key_cols: list[str]) -> DataFrame:
    """Retraction form of :func:`partial_keyed_state` (see
    negate_hourly_state — same abelian-group argument)."""
    return state.select(
        *key_cols,
        (-F.col("n")).alias("n"),
        (-F.col("total")).alias("total"),
    )


def merge_keyed_states(key_cols: list[str], *states: DataFrame) -> DataFrame:
    """Union + re-aggregate over the keys; shuffle cardinality = number
    of distinct keys, never number of events."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*key_cols).agg(
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
    )


def partial_distinct_state(
    df: DataFrame, ts_col: str = "ts", key_col: str = "user_id", lg_k: int = 12
) -> DataFrame:
    """Mergeable distinct-count state per hour: a Datasketches HLL
    sketch (binary column) + exact row count. The sketch IS the
    incremental form of countDistinct — exact distinct state would be
    the full key set per bucket (unbounded); the HLL state is fixed
    2^lg_k bytes regardless of cardinality, and union is associative,
    so day-N refresh merges yesterday's stored sketch with today's
    partial in O(buckets) (reference recomputes from scratch each
    micro-batch: spark_apps/advanced_analytics.py:236-248)."""
    return df.groupBy(
        F.date_format(F.date_trunc("hour", F.col(ts_col)), HOUR_FMT).alias("hour_key")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.hll_sketch_agg(F.col(key_col).cast("string"), F.lit(lg_k)).alias("key_hll"),
    )


def merge_distinct_states(*states: DataFrame) -> DataFrame:
    """Union + hll_union_agg: sketch merge is exact over the sketch
    lattice (no estimation error added by merging)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("hour_key").agg(
        F.sum("n").alias("n"),
        F.hll_union_agg("key_hll").alias("key_hll"),
    )


def finalize_distinct(state: DataFrame) -> DataFrame:
    """Estimate at read time; the stored state stays mergeable."""
    return state.select(
        "hour_key",
        F.col("n").alias("n_events"),
        F.hll_sketch_estimate("key_hll").alias("approx_distinct_keys"),
    )


def finalize_hourly(state: DataFrame, digits: int = 2) -> DataFrame:
    """Derive presentation metrics from state (one double division at
    the end, per the determinism rules in plans/base.py)."""
    denom = float(10**digits)
    return state.select(
        "hour_key",
        F.col("n").alias("n_events"),
        F.round(F.col("scaled_sum") / denom, 2).alias("total_value"),
        F.round(F.col("scaled_sum") / denom / F.col("n"), 4).alias("avg_value"),
    )


def rollup_to_daily(hourly_state: DataFrame) -> DataFrame:
    """Derive the DAY-level rollup from stored HOUR-level states — the
    hierarchical ("hypertable continuous aggregate") form: coarser
    resolutions re-aggregate the finer partial states (24 rows per
    day), never the raw events. Exact because the states are integer
    count/scaled-sum, which re-aggregate associatively."""
    return hourly_state.groupBy(
        F.substring("hour_key", 1, 10).alias("day_key")
    ).agg(
        F.sum("n").alias("n"),
        F.sum("scaled_sum").alias("scaled_sum"),
    )


def finalize_daily(state: DataFrame, digits: int = 2) -> DataFrame:
    denom = float(10**digits)
    return state.select(
        "day_key",
        F.col("n").alias("n_events"),
        F.round(F.col("scaled_sum") / denom, 2).alias("total_value"),
        F.round(F.col("scaled_sum") / denom / F.col("n"), 4).alias("avg_value"),
    )


def partial_value_histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int = 64
) -> DataFrame:
    """Reduce raw rows to a mergeable fixed-range histogram state:
    (bin, n) with equal-width bins over [lo, hi), out-of-range values
    clamped into the edge bins. Bin counts are integers, so states
    merge exactly and order-independently — the quantile-sketch
    counterpart of the count+sum states above, with a deterministic
    (oracle-reproducible) estimator instead of a probabilistic
    t-digest; at 100 TB the state is n_bins rows regardless of input."""
    width = (hi - lo) / n_bins
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")),
    )
    # NULLs AND NaNs are excluded, not clamped: Spark's greatest/least
    # IGNORE null arguments, so an unfiltered NULL value would silently
    # land in bin 0 and drag every quantile estimate down — and
    # floor(NaN) is NULL, so a NaN (e.g. a 0/0-derived value) took the
    # same silent bin-0 path (round-4 review fix).
    return (
        df.filter(F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col)))
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_histogram_states(*states: DataFrame) -> DataFrame:
    """Merge any number of histogram states: union + re-sum. Exact and
    associative (integer counts)."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("bin").agg(F.sum("n").alias("n"))


def histogram_quantiles(
    state: DataFrame,
    quantiles: list[float],
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Quantile estimates from a (merged) histogram state: for each q,
    locate the bin containing rank q*N on the cumulative counts and
    interpolate linearly inside it. Fully deterministic — both the bin
    walk and the interpolation are exact-arithmetic over integer
    counts, so an oracle reproduces it bit-for-bit (unlike t-digest).

    The cumulative window runs over the n_bins-row state (a deliberate
    single-partition window over dimension-sized post-agg data)."""
    from pyspark.sql import Window

    bad_q = [q for q in quantiles if not 0.0 <= q <= 1.0]
    if bad_q:
        raise ValueError(
            f"quantiles must be fractions in [0, 1], got {bad_q} "
            "(did you pass percents?)"
        )
    spark = state.sparkSession
    width = (hi - lo) / n_bins
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = state.withColumn("cum", F.sum("n").over(w))
    total = state.agg(F.sum("n").alias("total"))
    qdf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    joined = (
        qdf.crossJoin(F.broadcast(total))
        # q=0 would give target rank 0, matching no bin's (cum-n, cum]
        # range and silently dropping the row; the epsilon floor makes
        # it resolve to the low edge of the first non-empty bin
        .withColumn(
            "target", F.greatest(F.col("q") * F.col("total"), F.lit(1e-12))
        )
        .join(
            F.broadcast(cum),
            # the bin whose cumulative range [cum-n, cum) covers the
            # target rank; q=1.0 lands exactly on the last bin's cum
            (F.col("cum") >= F.col("target"))
            & ((F.col("cum") - F.col("n")) < F.col("target")),
        )
    )
    est = F.lit(lo) + F.lit(width) * (
        F.col("bin")
        + (F.col("target") - (F.col("cum") - F.col("n"))) / F.col("n")
    )
    return joined.select("q", F.round(est, 4).alias("estimate"))


def _mg_partition_gen(keys: list[str], k: int):
    """Shared per-partition Misra-Gries generator (the
    correctness-critical offset-reduction rule lives HERE ONLY;
    frequent_items and partial_mg_state both consume it, so a fix to
    the reduction cannot drift between them).

    Emits rows ``keys... , weight, part_rows``: MG-surviving keys with
    their residual weights, plus the partition's TOTAL row count
    carried on the first emitted row (0 on the rest) — callers sum
    ``part_rows`` for N without a second full scan of the input. A
    partition whose reduction empties the summary (all counts equal)
    still reports its rows via one null-key sentinel with weight 0.
    """
    import pandas as pd

    def mg(batches):
        from collections import Counter

        cnt: Counter = Counter()
        rows = 0
        for pdf in batches:
            rows += len(pdf)
            grouped = pdf.groupby(keys, dropna=False).size()
            for tup, c in grouped.items():
                if not isinstance(tup, tuple):
                    tup = (tup,)
                cnt[tup] += int(c)
            if len(cnt) > k:
                offset = sorted(cnt.values(), reverse=True)[k]
                cnt = Counter(
                    {t: c - offset for t, c in cnt.items() if c > offset}
                )
        if cnt:
            data = [
                list(t) + [c, rows if i == 0 else 0]
                for i, (t, c) in enumerate(cnt.items())
            ]
            yield pd.DataFrame(data, columns=keys + ["weight", "part_rows"])
        elif rows:
            # summary emptied by the reduction: still report the rows
            yield pd.DataFrame(
                [[None] * len(keys) + [0, rows]],
                columns=keys + ["weight", "part_rows"],
            )

    return mg


def _mg_schema(df: DataFrame, keys: list[str]):
    """keys (nullable — the sentinel row carries nulls) + weight +
    part_rows."""
    from pyspark.sql.types import LongType, StructField, StructType

    base = df.select(*keys).schema
    fields = [StructField(f.name, f.dataType, True) for f in base]
    fields += [StructField("weight", LongType(), False),
               StructField("part_rows", LongType(), False)]
    return StructType(fields)


def frequent_items(
    df: DataFrame,
    key_cols: list[str],
    support: float,
    counters: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters (all keys with frequency >= support * N)
    without shuffling every distinct key.

    A plain GROUP BY + HAVING is exact but shuffles the full distinct
    key set — at 100 TB with billions of distinct keys that is the
    dominant cost for a query whose answer is a handful of rows. This
    is the two-phase sketch-then-verify plan instead:

    1. Per-partition Misra-Gries summaries via ``mapInPandas`` (bounded
       memory: at most ``counters`` keys per partition, reduced once
       per Arrow batch with the mergeable-summaries offset rule —
       subtract the (k+1)-th largest count, drop non-positives).
       Any key with partition count > N_p/(k+1) survives its
       partition's summary; a globally support-heavy key is at least
       support-heavy in SOME partition, so with k >= 2/support the
       union of summaries is a PROVABLE superset of the true answer.
    2. Exact recount restricted to candidates: broadcast semi-join
       filter, then an ordinary hash aggregation over only candidate
       rows. False positives from phase 1 are eliminated exactly.

    Result is bit-identical to GROUP BY/HAVING (the oracle form) over
    the data as of THIS CALL: the sketch pass (candidates + N) runs
    eagerly here — like the k-means trainers, the operator does its
    bounded index/sketch work at build time and returns the serving
    plan — so data appended to the source between construction and the
    action is counted by the recount but not by the frozen
    candidates/N. Construct and execute in the same step (every
    registry consumer does), or rebuild for fresh data.
    """
    import math

    if not 0.0 < support <= 1.0:
        raise ValueError(f"support must be in (0, 1], got {support}")
    k = max(counters or 0, int(math.ceil(2.0 / support)), 8)
    keys = list(key_cols)

    # One mapInPandas pass produces BOTH the candidate summaries and
    # the per-partition row totals (part_rows), so N needs no second
    # full scan — the operator reads the input exactly twice (sketch
    # pass + exact recount). The summary is bounded (<= k rows per
    # partition), so candidates and N are materialized EAGERLY here
    # from one persisted pass, then the cache is released in the same
    # call — a persist left for "the caller's action" leaks for the
    # process lifetime when the plan is executed repeatedly (the bench
    # runs every query 4x) or never.
    per_part = df.select(*keys).mapInPandas(
        _mg_partition_gen(keys, k), _mg_schema(df, keys)
    ).persist()
    # The candidate union is <= k rows per input partition — small for
    # any sane (support, partition-count) pairing, but it SCALES WITH
    # PARTITIONS: at ~800k scan partitions and support=0.001 it could
    # reach 10^8 rows, where collecting/broadcasting is itself the
    # failure. Past the cap the sketch has lost its point, so fall back
    # to the plain GROUP BY/HAVING plan — identical answer, one full
    # shuffle, no driver round-trip.
    max_candidates = 100_000
    try:
        cand_df = per_part.filter(F.col("weight") > 0).select(*keys).distinct()
        cand_rows = cand_df.limit(max_candidates + 1).collect()
        n_total = per_part.agg(F.sum("part_rows").alias("__n")).collect()[0][0] or 0
    finally:
        per_part.unpersist()
    threshold = F.lit(float(support)) * F.lit(n_total).cast("long")
    if len(cand_rows) > max_candidates:
        return (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= threshold)
        )
    candidates = df.sparkSession.createDataFrame(cand_rows, cand_df.schema)
    # eqNullSafe, not plain equality: NULL is a legitimate GROUP BY key
    # (the classic empty-device-id hot key) and a NULL-keyed candidate
    # must survive the recount semi-join, or the single heaviest item
    # silently vanishes from the result.
    cond = None
    for key in keys:
        clause = df[key].eqNullSafe(candidates[key])
        cond = clause if cond is None else cond & clause
    return (
        df.join(F.broadcast(candidates), cond, "left_semi")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )


def maintain_join_view(
    view: DataFrame,
    left_old: DataFrame,
    delta_left: DataFrame,
    right_old: DataFrame,
    delta_right: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental maintenance of an INNER equi-join materialized view
    under insert-only deltas — the delta-algebra rule

        Δ(A ⋈ B) = ΔA ⋈ (B ∪ ΔB)  ∪  A_old ⋈ ΔB

    (the ΔA⋈ΔB cross term lands in the first join, exactly once).
    Both incremental joins carry a small delta side, so Catalyst plans
    them as broadcast hash joins: maintaining the view costs two scans
    and ZERO shuffles, vs a full shuffle join to recompute — on a
    bucketed/bloom-pruned base table even the scans prune to matching
    buckets. Result is row-identical to rejoining the updated bases.
    """
    inc = delta_left.join(right_old.unionByName(delta_right), on).unionByName(
        left_old.join(delta_right, on)
    )
    return view.unionByName(inc)


def maintain_agg_view(
    state: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    value_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Incremental maintenance of a grouped COUNT/SUM view under
    inserts AND deletes — the counting algorithm: the changelog carries
    op = +1 (insert) / -1 (retract); the delta reduces to per-group
    (sum(op), sum(op * value)) and merges into the stored state with a
    tiny groupBy over the touched keys. Groups whose support count
    reaches zero are dropped (a stored avg could never do this — only
    count+sum states are retractable). State schema matches
    partial_hourly_state's count/sum convention: (keys..., n, total).
    """
    delta = changelog.groupBy(*keys).agg(
        F.sum(F.col(op_col)).cast("long").alias("n"),
        F.sum(F.col(op_col) * F.col(value_col)).alias("total"),
    )
    merged = (
        state.unionByName(delta)
        .groupBy(*keys)
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
    )
    return merged.filter(F.col("n") > 0)


def partial_mg_state(
    df: DataFrame, key_cols: list[str], counters: int
) -> DataFrame:
    """Misra-Gries summary of one dataset as a MERGEABLE state table
    (keys..., weight), at most ``counters`` rows — the heavy-hitter
    sibling of the HLL/histogram states above, for when the exact
    recount pass of ``frequent_items`` isn't possible (streaming epochs
    that never revisit the data).

    Per-partition MG summaries (bounded memory, mapInPandas) merge via
    counter-add, then one offset reduction — subtract the
    (counters+1)-th largest weight from all, keep positives — which
    preserves the mergeable-summaries guarantee: for any key,
    true_count - weight <= (N - sum(weights)) / (counters + 1).
    The reduction ranks the pre-reduced summary (<= counters x
    partitions rows — bounded and tiny, so the single-partition window
    is safe by construction, same justification as skew_report's
    N-row window) and broadcasts the 1-row offset back.
    """
    keys = list(key_cols)
    per_part = (
        df.select(*keys)
        .mapInPandas(_mg_partition_gen(keys, counters), _mg_schema(df, keys))
        .filter(F.col("weight") > 0)  # drop row-count sentinels
        .drop("part_rows")
    )
    return _reduce_mg(per_part, keys, counters)


def _reduce_mg(summary: DataFrame, keys: list[str], counters: int) -> DataFrame:
    from pyspark.sql import Window

    merged = summary.groupBy(*keys).agg(F.sum("weight").alias("weight"))
    w = Window.orderBy(F.col("weight").desc(), *[F.col(k) for k in keys])
    ranked = merged.withColumn("__rn", F.row_number().over(w))
    off = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("__rn") == counters + 1, F.col("weight"))), F.lit(0)
        ).alias("__off")
    )
    return (
        ranked.crossJoin(F.broadcast(off))
        .withColumn("weight", F.col("weight") - F.col("__off"))
        .filter(F.col("weight") > 0)
        .drop("__rn", "__off")
    )


def merge_mg_states(states: list[DataFrame], counters: int) -> DataFrame:
    """Merge any number of MG state tables into one bounded summary;
    associative and commutative (counter-add then offset reduction),
    so epoch states can be folded in any order or compacted
    hierarchically."""
    keys = [c for c in states[0].columns if c != "weight"]
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return _reduce_mg(unioned, keys, counters)
