"""Edge cases of the bucket-decomposed global order primitives
(operators/windows.py:global_rank / global_prefix_sum). The main-path
exactness is proven by the oracle hash-matches (doc_length_global_rank,
curriculum_shard_packing); these pin the degenerate branches."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators.windows import global_prefix_sum, global_rank


def test_global_rank_all_equal_scores_single_bucket(spark):
    # hi == lo collapses every row into bucket 1; ranking must fall
    # back to the tiebreak and still be a permutation of 1..n.
    df = spark.createDataFrame([(i, 7.0) for i in range(1, 8)], "id long, s double")
    got = {
        r["id"]: r["global_rank"]
        for r in global_rank(df, F.col("s"), tiebreak="id", n_buckets=10).collect()
    }
    assert got == {i: i for i in range(1, 8)}


def test_global_rank_matches_naive_window(spark):
    rows = [(i, float((i * 37) % 11)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id long, s double")
    got = {
        r["id"]: r["global_rank"]
        for r in global_rank(df, F.col("s"), tiebreak="id", n_buckets=5).collect()
    }
    naive = {
        id_: rank
        for rank, (id_, _) in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0])), start=1
        )
    }
    assert got == naive


def test_global_prefix_sum_matches_naive(spark):
    rows = [(i, float((i * 37) % 11), (i * 13) % 7 + 1) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id long, s double, v long")
    got = {
        r["id"]: r["running_total"]
        for r in global_prefix_sum(
            df, F.col("s"), tiebreak="id", value_col="v", n_buckets=5
        ).collect()
    }
    run = 0
    naive = {}
    for id_, _, v in sorted(rows, key=lambda t: (-t[1], t[0])):
        run += v
        naive[id_] = run
    assert got == naive


def test_global_rank_ascending(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 1.0), (3, 3.0)], "id long, s double")
    got = {
        r["id"]: r["global_rank"]
        for r in global_rank(df, F.col("s"), tiebreak="id", ascending=True).collect()
    }
    assert got == {2: 1, 3: 2, 1: 3}


def test_global_rank_null_or_nan_score_fails_fast(spark):
    # A NULL score would bucket to NULL and silently vanish through the
    # inner offset join (diverging from an oracle's ROW_NUMBER); the
    # operator must error instead, telling the caller to filter/fill.
    import pytest

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "id long, s double"
    )
    with pytest.raises(Exception, match="NULL or NaN score"):
        global_rank(df, F.col("s"), tiebreak="id").collect()
    nan_df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan"))], "id long, s double"
    )
    with pytest.raises(Exception, match="NULL or NaN score"):
        global_prefix_sum(nan_df, F.col("s"), tiebreak="id", value_col="id").collect()
    # Clean scores still rank 1..n.
    ok = spark.createDataFrame([(1, 5.0), (2, 4.0)], "id long, s double")
    got = {r["id"]: r["global_rank"] for r in global_rank(ok, F.col("s"), tiebreak="id").collect()}
    assert got == {1: 1, 2: 2}
