"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join handling (on in the session factory) covers sort-merge
joins automatically; these explicit forms cover the cases AQE can't:
skewed AGGREGATION keys (a hot grouping key funnels into one reducer)
and broadcast-infeasible skewed joins. At 100 TB a handful of hot keys
(a viral player, an empty-string device id) routinely dominates a
stage — salting trades one extra partial aggregation / a small-side
replication for even partition sizes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a synthetic salt key.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 aggregates on (keys + salt) —
    spreading each hot key over ``salt_buckets`` reducers — phase 2
    merges the partials on the real keys. Semantically identical to a
    direct groupBy for these decomposable aggregates (asserted in
    tests/test_skew.py).
    """
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)))
    phase1_aggs, phase2_aggs = [], []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            # SQL count semantics: count(col) skips the column's NULLs;
            # pass "*" for row-count COUNT(*). The old form silently
            # computed count(*) whatever column was named — breaking
            # the claimed direct-groupBy equivalence on nullable input.
            src = F.lit(1) if col == "*" else F.col(col)
            phase1_aggs.append(F.count(src).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    partial = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the (big, skewed) left side with a random
    bucket per row, replicate the (smaller) right side across all
    buckets, join on (key, salt). Each hot key's rows spread over
    ``salt_buckets`` tasks instead of one.

    Right-side cost is ×salt_buckets — use only when the right side is
    too big to broadcast but small enough to replicate; otherwise let
    AQE skew-join handle it.

    Only ``inner`` and ``left`` joins are valid: the right side is
    replicated across all salt buckets, so right/full outer joins would
    emit ``salt_buckets`` null-padded copies of each unmatched right row.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "leftsemi",
                   "left_semi", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "the replicated right side would duplicate unmatched right rows"
        )
    left_salted = left.withColumn(
        "__salt",
        F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)),
    )
    buckets = F.array(*[F.lit(i) for i in range(salt_buckets)])
    right_replicated = right.withColumn("__salt", F.explode(buckets))
    joined = left_salted.join(right_replicated, [key, "__salt"], how)
    return joined.drop("__salt")


def skew_report(
    df: DataFrame,
    key: str,
    top_n: int = 10,
) -> DataFrame:
    """Key-skew diagnostic: the top-N heaviest keys with their row
    counts, share of the table, and cumulative share — the numbers
    that decide whether a join/aggregate on ``key`` needs salting
    (operators above) or AQE skew handling, and what salt factor.

    The reference joins nothing so it never faces this; any real
    deployment of its analytics at scale does (one celebrity player =
    one straggler task).

    Plan: one groupBy(key) count (map-side partial agg), a top-N via
    TakeOrderedAndProject (two-phase, never a global sort), a scalar
    total broadcast back, and one window over the N-row result for the
    cumulative share — O(distinct keys) shuffle, O(N) window.
    """
    from pyspark.sql import Window

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    # the total from the already-reduced counts frame — the raw table
    # is scanned exactly once
    total = counts.agg(F.sum("n_rows").alias("__total"))
    top = (
        counts.orderBy(F.col("n_rows").desc(), F.col(key).asc())
        .limit(top_n)
        .crossJoin(F.broadcast(total))
    )
    w = (
        Window.orderBy(F.col("n_rows").desc(), F.col(key).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return top.select(
        F.col(key),
        "n_rows",
        F.round(F.col("n_rows") / F.col("__total") * 100, 4).alias("share_pct"),
        F.round(F.sum("n_rows").over(w) / F.col("__total") * 100, 4).alias("cum_share_pct"),
        F.row_number().over(w).alias("rank"),
    )
