"""Unit tests for operators/linalg.py: the partition-local Gramian
accumulation (second moments / covariance / PCA diagnostics) against
direct numpy computation on the same data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import linalg

DIM = 5


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(7)
    return rng.normal(size=(40, DIM))


@pytest.fixture(scope="module")
def vec_df(spark, vecs):
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    # Several partitions so the cross-partition accumulator reduce is
    # actually exercised.
    return spark.createDataFrame(rows, "id int, v array<double>").repartition(4)


def test_second_moments_match_numpy(spark, vec_df, vecs):
    row = linalg.second_moments(vec_df, "v", DIM).collect()[0]
    assert row["n"] == len(vecs)
    np.testing.assert_allclose(row["s"], vecs.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(row["g"]).reshape(DIM, DIM), vecs.T @ vecs, rtol=1e-12
    )


def test_covariance_pairs_match_numpy(spark, vec_df, vecs):
    got = {
        (r["dim_i"], r["dim_j"]): r["covar"]
        for r in linalg.covariance_pairs(vec_df, "v", DIM).collect()
    }
    want = np.cov(vecs, rowvar=False, bias=True)  # population covariance
    assert len(got) == DIM * (DIM + 1) // 2
    for (i, j), v in got.items():
        assert i <= j
        assert v == pytest.approx(want[i - 1, j - 1], rel=1e-9, abs=1e-12)


def test_pca_diagnostics_match_numpy_eigh(spark, vec_df, vecs):
    got = linalg.pca_diagnostics(vec_df, "v", DIM, top_k=DIM).collect()
    cov = np.cov(vecs, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert [r["component"] for r in got] == list(range(1, DIM + 1))
    for r, ev in zip(got, evals):
        assert r["eigenvalue"] == pytest.approx(ev, abs=2e-6)
    # cumulative explained variance is monotone and ends at 1
    cums = [r["cum_explained"] for r in got]
    assert cums == sorted(cums)
    assert cums[-1] == pytest.approx(1.0, abs=2e-6)


def test_null_and_ragged_vectors_are_ignored(spark, vecs):
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    rows += [(100, None), (101, [1.0, 2.0])]  # NULL + wrong length
    df = spark.createDataFrame(rows, "id int, v array<double>").repartition(3)
    row = linalg.second_moments(df, "v", DIM).collect()[0]
    assert row["n"] == len(vecs)
    np.testing.assert_allclose(row["s"], vecs.sum(axis=0), rtol=1e-12)


def test_empty_corpus_yields_zero_rows(spark):
    from pubg_data_pipeline_spark.operators import linalg

    empty = spark.createDataFrame([], "embedding array<double>")
    assert linalg.covariance_pairs(empty, "embedding", 4).count() == 0
    assert linalg.pca_diagnostics(empty, "embedding", 4).count() == 0


def test_moment_states_merge_matches_full_corpus(spark):
    from pubg_data_pipeline_spark.operators import linalg

    full = spark.range(200).select(
        F.array(
            (F.col("id") % 7).cast("double"),
            (F.col("id") % 13).cast("double"),
            (F.col("id") % 3).cast("double"),
        ).alias("v")
    )
    whole = linalg.second_moments(full, "v", 3).collect()[0]
    parts = [
        linalg.second_moments(
            full.filter(F.col("v")[0].cast("long") % 2 == i), "v", 3
        )
        for i in range(2)
    ]
    merged = linalg.reduce_moment_states(
        parts[0].unionByName(parts[1]), 3
    ).collect()[0]
    assert merged["n"] == whole["n"]
    for a, b in zip(merged["s"], whole["s"]):
        assert abs(a - b) < 1e-9
    for a, b in zip(merged["g"], whole["g"]):
        assert abs(a - b) < 1e-9


def test_streaming_moments_epochs_replay_and_covariance(spark, tmp_path):
    from pubg_data_pipeline_spark.operators import linalg
    from pubg_data_pipeline_spark.streaming import app

    state = tmp_path / "moments"
    b1 = spark.range(100).select(
        F.array((F.col("id") % 5).cast("double"), (F.col("id") % 4).cast("double")).alias("v")
    )
    b2 = spark.range(100, 160).select(
        F.array((F.col("id") % 6).cast("double"), (F.col("id") % 2).cast("double")).alias("v")
    )
    app.moments_epoch(b1, 0, str(state), "v", 2)
    app.moments_epoch(b2, 1, str(state), "v", 2)
    app.moments_epoch(b2, 1, str(state), "v", 2)  # idempotent replay
    merged = app.read_moments(spark, str(state), 2)
    direct = linalg.second_moments(b1.unionByName(b2), "v", 2).collect()[0]
    got = merged.collect()[0]
    assert got["n"] == direct["n"] == 160
    for a, b in zip(got["g"], direct["g"]):
        assert abs(a - b) < 1e-9
    # covariance from the epoch-merged state == covariance from a scan
    cov_stream = {
        (r["dim_i"], r["dim_j"]): round(r["covar"], 9)
        for r in linalg.covariance_pairs_from(merged, 2).collect()
    }
    cov_direct = {
        (r["dim_i"], r["dim_j"]): round(r["covar"], 9)
        for r in linalg.covariance_pairs(b1.unionByName(b2), "v", 2).collect()
    }
    assert cov_stream == cov_direct


def test_null_element_rows_are_excluded_not_poisoning(spark):
    """r5 review fix (execution-confirmed): a NULL ELEMENT inside one
    vector must invalidate that ROW (counted out of n), not silently
    zero whole dimensions of s/g through the NaN->NULL->0 laundering
    chain."""
    from pubg_data_pipeline_spark.operators import linalg

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, None]), (2, [5.0, 6.0])],
        "vec_id int, embedding array<double>",
    )
    row = linalg.second_moments(df, "embedding", dim=2).collect()[0]
    assert row["n"] == 2  # the corrupt row is OUT
    assert row["s"] == [6.0, 8.0]  # 1+5, 2+6
    assert row["g"] == [26.0, 32.0, 32.0, 40.0]
    cov = {
        (r["dim_i"], r["dim_j"]): r["covar"]
        for r in linalg.covariance_pairs(df, "embedding", dim=2).collect()
    }
    assert cov[(2, 2)] == 4.0  # var of {2, 6}, not zero


def test_unrolled_dot_is_bit_identical_to_the_fold(spark):
    """functions/vectors.py:dot(dim=...) — the unrolled codegen fast
    path must be BIT-identical to the zip_with/aggregate fold (same
    left fold order from 0.0), or switching an operator to the fast
    path could move an oracle value hash. Checked on hash-generated
    doubles including negatives, plus the NULL-propagation edges."""
    from pyspark.sql import functions as F

    from pubg_data_pipeline_spark.functions.vectors import cosine, dot, norm

    df = spark.range(2000).select(
        F.array(
            *[
                (F.pmod(F.hash(F.col("id") * F.lit(31 + k)), F.lit(2001)).cast("double") - 1000.0)
                / 999.0
                for k in range(7)
            ]
        ).alias("a"),
        F.array(
            *[
                (F.pmod(F.hash(F.col("id") * F.lit(131 + k)), F.lit(2001)).cast("double") - 1000.0)
                / 999.0
                for k in range(7)
            ]
        ).alias("b"),
    )
    mismatches = df.filter(
        (dot(F.col("a"), F.col("b")) != dot(F.col("a"), F.col("b"), 7))
        | (norm(F.col("a")) != norm(F.col("a"), 7))
        | (cosine(F.col("a"), F.col("b")) != cosine(F.col("a"), F.col("b"), 7))
    ).count()
    assert mismatches == 0

    # NULL array -> NULL either way; short array -> NULL (OOB access)
    # matches zip_with's NULL padding poisoning the fold.
    edge = spark.createDataFrame(
        [(None, [1.0, 2.0]), ([1.0], [1.0, 2.0])],
        "a array<double>, b array<double>",
    )
    rows = edge.select(
        dot(F.col("a"), F.col("b"), 2).alias("fast"),
        dot(F.col("a"), F.col("b")).alias("fold"),
    ).collect()
    assert all(r["fast"] is None and r["fold"] is None for r in rows)
