"""Count-min sketch: mergeable frequency estimation in bounded space.

Complements the exact Misra-Gries frequent-items path
(operators/incremental.py:frequent_items) with the OTHER classical
frequency sketch: a k x w counter grid answering point frequency
queries with one-sided error (estimate >= true count, overshoot
bounded by e*N/w with probability 1-(1/2)^k). The reference pipeline
keeps only exact scalar aggregates (reference
spark_apps/advanced_analytics.py); a 100 TB engine needs the sketch
form because the exact per-key count table itself becomes big data —
the CMS is k*w integers REGARDLESS of input size, mergeable across
partitions, days, and streams by element-wise addition.

Determinism contract (same discipline as plans/base.py): the row
hashes are explicit integer affine maps ``((a_r * key + b_r) % P) % w``
— per-row int64 arithmetic is bit-identical across engines, so the
whole sketch (and every estimate) has an exact DuckDB oracle twin,
unlike library sketches whose hash seeds are engine-private.

Scale shape: building the sketch is one map-side projection (k-way
explode) plus a groupBy whose key space is AT MOST k*w rows — partial
aggregation collapses each task's contribution to <= k*w counters
before the shuffle, so the shuffle is O(tasks * k * w) bytes,
independent of row count. Estimation joins the (tiny, broadcast)
sketch against the query keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1; affine coefficients are fixed so runs,
# engines, and merge orders all agree (never RNG-seeded per session).
_P = 2_147_483_647
_A = (1_000_003, 999_983, 1_000_033, 1_000_081)
_B = (12_345, 67_890, 13_579, 24_680)


def _bucket(key: Column, r: int, width: int) -> Column:
    """Row-r bucket index for an integer key: ((a*key + b) % P) % w.

    int64-safe for keys < ~9e12 (a < 2^20, so a*key < 2^63); keys are
    synthetic surrogate ids here. Negative keys would need a %-sign
    guard — asserted non-negative by the caller's domain.
    """
    return (
        ((F.lit(_A[r]) * key.cast("long") + F.lit(_B[r])) % F.lit(_P)) % F.lit(width)
    ).cast("int")


def count_min_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: one row per non-empty (row, bucket) cell with
    its count. depth <= 4 with the fixed coefficient table.

    Missing cells are implicitly zero — estimation must therefore
    LEFT-join and coalesce, which :func:`count_min_estimate` does.
    """
    if not 1 <= depth <= len(_A):
        raise ValueError(f"depth must be in [1, {len(_A)}]")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _bucket(F.col(key_col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("h")
    return (
        df.select(cells)
        .groupBy(F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): element-wise
    counter addition — the property that lets per-day / per-partition /
    per-stream sketches combine without touching raw data."""
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for ``keys[key_col]``: min over the
    depth rows of that key's bucket counters. Output: (key_col, est).

    The sketch is at most depth*width rows — broadcast, so the lookup
    is a map-side hash join however many keys are probed.
    """
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(key_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("h"),
    ).select(key_col, F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
