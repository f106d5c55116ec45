"""Relational operator kit: joins, set ops, multidimensional aggregates.

The reference implements zero joins — its producer denormalizes
(reference: producer/producer.py:162-204 embeds the per-player
performance struct by scanning rosters/participants, which is
semantically an inner equi-join; SURVEY.md §2.4). This engine restores
the normalized model, so the full Catalyst join suite is first-class
API surface here, each wrapper documenting the physical strategy it
expects at scale.

Scale notes (100 TB):
- Small dimensions (region/nation/supplier and their analogs) are
  broadcast (`F.broadcast`) — no shuffle of the fact table.
- Fact-fact joins shuffle on the join key; AQE converts to broadcast
  at runtime when one side turns out small, and splits skewed keys.
- Set ops and rollup/cube are plain Catalyst exchanges — nothing
  custom needed (SURVEY.md §4.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join; set ``broadcast_right`` for small dimension tables to
    force a broadcast-hash join (no shuffle of ``left``)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """EXISTS semantics — returns left rows with a match, left columns only."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """NOT EXISTS semantics."""
    return left.join(right, on, "left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """Non-equi (theta/range) join. Without an equi component Catalyst
    plans BroadcastNestedLoopJoin — keep the right side small/broadcast;
    for big-big range joins pre-bucket both sides on a coarse band key
    first (see similarity.lsh_bucketed_cosine for the pattern)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, condition, how)


def fuzzy_blocked_pairs(
    df: DataFrame,
    id_col: str,
    block_col: str,
    text_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """All (id_a < id_b) pairs within a block at Levenshtein distance
    <= ``max_dist`` — the blocked fuzzy-join of entity resolution.

    The primary block key is refined by an EXACT secondary key: string
    length. Edit distance <= k implies |len(a) - len(b)| <= k (each
    edit changes length by at most 1), so side b fans out to its
    2k+1 admissible length keys and the equi-join on (block, length)
    recovers every qualifying pair exactly once — side a joins on its
    single true length, so no dedup is needed. A skewed block of n
    rows costs sum-over-length-bands |band_a| x |band_b| instead of
    n^2, and the refinement provably loses no pairs.
    """
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(block_col).alias("__blk"),
        F.col(text_col).alias("__txt"),
    )
    # DICTIONARY refinement: edit distance is a function of the TEXTS,
    # so compute it once per distinct (block, text) pair and join the
    # verdict back to rows — always correct, and on low-cardinality
    # columns (entity names, brands, categories: the normal fuzzy-match
    # input) it divides the quadratic levenshtein work by the average
    # duplication factor squared (measured ~100x fewer evaluations on
    # the 20k-row/64-name parts table). High-cardinality columns
    # degrade gracefully: distinct ~ rows and the two join-backs are
    # 1:1 equi-joins.
    names = base.select("__blk", "__txt").distinct().withColumn(
        "__len", F.length("__txt")
    )
    na = names.alias("na")
    nb = names.withColumn(
        "__lenkey", F.explode(F.sequence(F.col("__len") - max_dist, F.col("__len") + max_dist))
    ).alias("nb")
    # Bounded levenshtein (threshold arg): banded DP with early exit —
    # O(len * max_dist) per pair instead of O(len^2), returning -1 the
    # moment the distance provably exceeds the bound.
    dist = F.levenshtein(F.col("na.__txt"), F.col("nb.__txt"), max_dist)
    # ORDERED name pairs (both (t1,t2) and (t2,t1), plus (t,t)): a row
    # pair (u < v) is then matched by exactly one ordered pair —
    # (text(u), text(v)) — so the id filter below never drops a
    # cross-text pair whose lower id carries the "second" text.
    name_pairs = (
        na.join(
            nb,
            (F.col("na.__blk") == F.col("nb.__blk"))
            & (F.col("na.__len") == F.col("nb.__lenkey")),
        )
        .withColumn("edit_dist", dist)
        .filter(F.col("edit_dist") >= 0)
        .select(
            F.col("na.__blk").alias("__blk"),
            F.col("na.__txt").alias("__txt_a"),
            F.col("nb.__txt").alias("__txt_b"),
            "edit_dist",
        )
    )
    rows_a = base.select(
        F.col("__blk"), F.col("__txt").alias("__txt_a"), F.col("__id").alias("id_a")
    )
    rows_b = base.select(
        F.col("__blk"), F.col("__txt").alias("__txt_b"), F.col("__id").alias("id_b")
    )
    return (
        name_pairs.join(rows_a, ["__blk", "__txt_a"])
        .join(rows_b, ["__blk", "__txt_b"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.col("__blk").alias(block_col), "edit_dist")
    )


def union_by_name(dfs: Sequence[DataFrame], allow_missing: bool = False) -> DataFrame:
    """UNION ALL by column name (the reference's two parallel extracts
    from one parsed stream are the natural use case — reference:
    spark_apps/pubg_streaming.py:148-233)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=allow_missing)
    return out


def rollup_agg(df: DataFrame, group_cols: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """ROLLUP aggregate (subtotals per prefix + grand total)."""
    return df.rollup(*group_cols).agg(*aggs)


def cube_agg(df: DataFrame, group_cols: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """CUBE aggregate (all grouping-set combinations)."""
    return df.cube(*group_cols).agg(*aggs)


def upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_key: str | None = None,
) -> DataFrame:
    """MERGE/upsert semantics as a pure DataFrame op: rows from
    ``updates`` replace same-key rows in ``base``; unmatched rows from
    both sides survive. With ``order_key``, duplicate keys inside
    ``updates`` resolve to the row with the max order value first
    (deterministic last-writer-wins).

    This is the snapshot-refresh shape of the reference's player table
    (each poll re-emits the player's current stats — reference:
    producer/producer.py:73-105) expressed set-wise; on Delta/Iceberg
    storage this becomes a storage-level MERGE, but the row semantics
    are exactly this plan. Implementation is anti-join + union — both
    sides shuffle once on the key; at 100 TB bucket the base table on
    the key so only ``updates`` shuffles."""
    if order_key is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(F.col(order_key).desc())
        updates = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    survivors = base.join(updates.select(*keys), list(keys), "left_anti")
    return survivors.unionByName(updates)


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k via orderBy().limit(k).

    Catalyst plans this as TakeOrderedAndProject — a two-phase
    per-partition top-k + driver merge, NOT a single-partition global
    sort, so it is safe at any scale (SURVEY.md §4.2 item 4 — the
    reference's ``Window.orderBy(desc(...))`` at
    spark_apps/advanced_analytics.py:129 funnels all rows into one
    task; this is the fix)."""
    return df.orderBy(*order_by).limit(k)


def null_safe_equi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join where NULL keys MATCH EACH OTHER (SQL's
    ``IS NOT DISTINCT FROM`` / Spark's ``<=>``): the semantics a CDC /
    reconciliation pipeline needs when "unknown" is a legitimate join
    value rather than a non-match. Still a hash join — ``<=>`` is an
    equality predicate to Catalyst, so broadcast/shuffle-hash
    strategies apply exactly as for ``=``; NULL keys hash to one
    bucket, so a null-heavy side behaves like any other hot key (see
    operators/skew.py if that bucket dominates)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, left[left_key].eqNullSafe(r[right_key]), how)
