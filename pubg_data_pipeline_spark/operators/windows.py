"""Window-function kit: moving averages, sequence numbers, trends,
ranking, lag/lead.

Mirrors the reference's foreachBatch analytics (reference:
spark_apps/advanced_analytics.py:141-168) with two scale fixes:
every ordering is tie-broken by a deterministic key column, and global
ranking is offered as two-phase top-k rather than an unpartitioned
window (SURVEY.md §4.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def moving_average(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value_cols: Sequence[str],
    window_size: int = 5,
    prefix: str = "recent",
) -> DataFrame:
    """Trailing moving average over the last ``window_size`` rows.

    reference: spark_apps/advanced_analytics.py:141-150 —
    ``Window.partitionBy("player_name").orderBy("processed_at")
    .rowsBetween(-4, 0)`` with avg over kills/damage/time_survived.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-(window_size - 1), 0)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(f"{prefix}_{window_size}_avg_{c}", F.avg(F.col(c)).over(w))
    return out


def sequence_number(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    name: str = "seq_no",
) -> DataFrame:
    """Per-partition 1-based sequence number.

    reference: spark_apps/advanced_analytics.py:151-153 (game_number).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(name, F.row_number().over(w))


def trend_detection(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    window_size: int = 5,
    min_rows: int = 5,
    threshold: float = 2.0,
) -> DataFrame:
    """Deviation-from-trailing-average trend filter.

    reference: spark_apps/advanced_analytics.py:156-161 — keep rows
    where |value - trailing avg| exceeds a threshold, only after the
    partition has at least ``min_rows`` rows.
    """
    out = moving_average(df, partition_by, order_by, [value_col], window_size)
    out = sequence_number(out, partition_by, order_by, "seq_no")
    avg_col = f"recent_{window_size}_avg_{value_col}"
    out = out.withColumn(f"{value_col}_trend", F.col(value_col) - F.col(avg_col))
    return out.filter(
        (F.col("seq_no") >= min_rows) & (F.abs(F.col(f"{value_col}_trend")) > threshold)
    )


def ranked(
    df: DataFrame,
    order_by: Sequence[Column],
    partition_by: Sequence[str] | None = None,
    name: str = "rank",
    method: str = "row_number",
) -> DataFrame:
    """Attach a rank column. With no partition this funnels all rows to
    one task (the reference does exactly that at
    spark_apps/advanced_analytics.py:129) — acceptable only when the
    input is already reduced (e.g. post-aggregation); for raw-data
    top-k use relational.top_k instead."""
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return df.withColumn(name, fn().over(w.orderBy(*order_by)))


def lag_lead_features(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
) -> DataFrame:
    """lag/lead/delta features (not in the reference — SURVEY.md §2.6
    notes trend detection W4 is more naturally lag; shipped because the
    oracle harness exercises them)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(f"prev_{value_col}", F.lag(value_col).over(w))
        .withColumn(f"next_{value_col}", F.lead(value_col).over(w))
        .withColumn(
            f"{value_col}_delta", F.col(value_col) - F.lag(value_col).over(w)
        )
    )


def ntile_expr(rank_col: str = "__r", n_col: str = "__n", k: int = 4):
    """Exact NTILE placement from a precomputed (global) rank: the
    first ``n % k`` tiles take ``(n div k) + 1`` rows, the rest
    ``n div k`` — bit-identical to SQL NTILE at any n, in pure integer
    arithmetic (the first branch also covers n < k, so the ``div
    (n div k)`` in the second branch can never divide by zero). Pair
    with :func:`global_rank` so no single-partition window touches the
    data; the correctness argument lives HERE once instead of being
    re-audited at every NTILE-shaped query (order_quartiles,
    rfm_segments)."""
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= ({n_col} % {k}) * (({n_col} div {k}) + 1) "
        f"THEN ({rank_col} - 1) div (({n_col} div {k}) + 1) + 1 "
        f"ELSE ({n_col} % {k}) + ({rank_col} - ({n_col} % {k}) * (({n_col} div {k}) + 1) - 1) div ({n_col} div {k}) + 1 "
        f"END AS INT)"
    )


def global_rank(
    df: DataFrame,
    score: Column,
    tiebreak: str,
    n_buckets: int = 1000,
    ascending: bool = False,
    out_col: str = "global_rank",
) -> DataFrame:
    """Total-order rank over the WHOLE table without a single-partition
    sort — the scale path for "rank every document by quality".
    (Reference analog: the ranking windows of
    reference spark_apps/advanced_analytics.py:141-168 are per-batch
    and unpartitioned — the SURVEY.md §4.2 antipattern this
    decomposition fixes for corpus-wide ordering.)

    A bare ``row_number() over (order by score)`` funnels all rows
    through one task (Exchange SinglePartition — the classic global
    window antipattern). Instead:

    1. coarse bucket = ``width_bucket(score)`` over the score's range
       (two-pass: one cheap min/max aggregate, then the bucketed scan);
    2. per-bucket counts -> cumulative offsets, a ``n_buckets``-row
       running sum computed with a window over the TINY bucket table
       and broadcast back (never the data table);
    3. local rank inside each bucket (window partitioned by bucket —
       parallel across buckets) + the bucket's offset = exact global
       rank.

    Determinism: ties on score are broken by ``tiebreak`` everywhere.
    Skew note: at most one bucket's rows sort together, so bucket width
    bounds the largest local sort; raise ``n_buckets`` for heavier
    tails (cost of step 2 stays trivial). CAVEAT — range bucketing can
    never split EQUAL scores: a modal score value (40% of docs sharing
    quality=0.5, or an all-equal column) lands that whole tie mass in
    one bucket's sort regardless of ``n_buckets``, degrading toward
    the single-task sort this operator exists to avoid (results stay
    correct; the tie group's rows still sort by ``tiebreak`` within
    one task — the local sort SPILLS rather than OOMs). For tie-heavy
    score columns, rank on a higher-resolution score or a composite
    (score, coarse-hash-of-tiebreak is NOT valid — it would break the
    tiebreak total order).
    """
    bucketed = _score_buckets(df, score, ascending, n_buckets)
    counts = bucketed.groupBy("__gr_bucket").agg(F.count(F.lit(1)).alias("__gr_n"))
    offsets = _exclusive_bucket_offsets(counts, "__gr_n")
    w_local = Window.partitionBy("__gr_bucket").orderBy(
        F.col("__gr_score").asc(), F.col(tiebreak).asc()
    )
    return (
        bucketed.join(F.broadcast(offsets), "__gr_bucket")
        .withColumn(out_col, F.row_number().over(w_local) + F.col("__gr_offset"))
        .drop("__gr_bucket", "__gr_score", "__gr_offset")
    )


def _score_buckets(
    df: DataFrame, score: Column, ascending: bool, n_buckets: int
) -> DataFrame:
    """Coarse range-bucket assignment over the score's [min, max] —
    the shared first phase of the global rank/prefix-sum decomposition.
    Adds ``__gr_score`` (direction-normalized so asc ordering is always
    correct) and ``__gr_bucket`` (1..n_buckets).

    NULL/NaN scores fail fast instead of silently vanishing: a NULL
    score would yield a NULL bucket and be dropped by the inner join on
    ``__gr_bucket`` — diverging from an oracle's ROW_NUMBER, which
    ranks every row. The decomposition has no principled place for
    unordered rows (engines disagree on NULL sort position), so the
    caller must filter or fill them explicitly; the assert is folded
    into the bucket expression so it rides the same scan (no extra
    pass)."""
    direction = 1.0 if ascending else -1.0
    keyed = df.withColumn("__gr_score", score * F.lit(direction))
    # Bounds over non-NaN scores only (min/max already ignore NULLs):
    # one NaN would otherwise poison hi, making every HEALTHY row's
    # bucket NaN and erroring on the int cast before the per-row assert
    # below can report the real problem.
    clean_score = F.when(~F.isnan(F.col("__gr_score")), F.col("__gr_score"))
    bounds = keyed.agg(
        F.min(clean_score).alias("lo"), F.max(clean_score).alias("hi")
    )
    score_ok = F.assert_true(
        F.col("__gr_score").isNotNull() & ~F.isnan(F.col("__gr_score")),
        F.lit(
            "global rank/prefix-sum: NULL or NaN score — filter these rows "
            "or fill the score first (they cannot be placed in a total "
            "order deterministically)"
        ),
    )
    # crossJoin of a 1-row aggregate: broadcast literal bounds, no
    # driver collect in the plan.
    return keyed.crossJoin(F.broadcast(bounds)).withColumn(
        "__gr_bucket",
        # assert_true returns NULL when the row passes, so the `when`
        # always falls through to the real bucket expression — but the
        # check stays inside a USED column, surviving column pruning.
        F.when(
            score_ok.isNotNull(),
            F.lit(None).cast("int"),
        ).when(
            F.col("hi") == F.col("lo"), F.lit(1)
        ).otherwise(
            F.least(
                F.lit(n_buckets),
                (
                    (F.col("__gr_score") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / n_buckets)
                ).cast("int")
                + 1,
            )
        ),
    ).drop("lo", "hi")


def _exclusive_bucket_offsets(per_bucket: DataFrame, value_col: str) -> DataFrame:
    """Exclusive prefix over the per-bucket totals. This IS a
    single-partition window — over the n_buckets-row bucket table, not
    the data (the whole point of the decomposition)."""
    return per_bucket.withColumn(
        "__gr_offset",
        F.coalesce(
            F.sum(value_col).over(
                Window.orderBy("__gr_bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("__gr_bucket", "__gr_offset")


def global_prefix_sum(
    df: DataFrame,
    score: Column,
    tiebreak: str,
    value_col: str,
    n_buckets: int = 1000,
    ascending: bool = False,
    out_col: str = "running_total",
) -> DataFrame:
    """Exact running total of ``value_col`` over the table's TOTAL
    order (score, tiebreak) without a single-partition sort — the
    distributed scan primitive behind curriculum packing ("cumulative
    tokens over quality-ranked docs"), budget cutoffs, and exact
    quantile assignment.

    Same decomposition as ``global_rank``: per-bucket value sums roll
    into a tiny exclusive-prefix offset table (broadcast back), and a
    bucket-partitioned window computes the inclusive local running
    sum; offset + local = exact global running total. Use integer
    value columns for cross-engine exactness (float summation order
    differs from a naive global scan's).
    """
    bucketed = _score_buckets(df, score, ascending, n_buckets)
    sums = bucketed.groupBy("__gr_bucket").agg(F.sum(value_col).alias("__gr_v"))
    offsets = _exclusive_bucket_offsets(sums, "__gr_v")
    w_local = (
        Window.partitionBy("__gr_bucket")
        .orderBy(F.col("__gr_score").asc(), F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(offsets), "__gr_bucket")
        .withColumn(out_col, F.sum(value_col).over(w_local) + F.col("__gr_offset"))
        .drop("__gr_bucket", "__gr_score", "__gr_offset")
    )
