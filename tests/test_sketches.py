"""Count-min sketch invariants: one-sided error, exactness when the
grid is collision-free, and merge == rebuild over the union."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import sketches


@pytest.fixture(scope="module")
def keyed_df(spark):
    # 50 distinct keys with count = key+1 (0..49 -> 1..50), 1275 rows.
    return (
        spark.range(50)
        .select(F.col("id").alias("k"), F.explode(F.sequence(F.lit(0), F.col("id"))))
        .select("k")
    )


def _estimates(spark, sketch, keys_df, **kw):
    return {
        r["k"]: r["est"]
        for r in sketches.count_min_estimate(sketch, keys_df, "k", **kw).collect()
    }


def test_estimate_is_one_sided_and_exact_without_collisions(spark, keyed_df):
    keys = keyed_df.select("k").distinct()
    # width 256 >> 50 keys: with 4 independent rows, min over rows is
    # exact unless a key collides in ALL rows (checked, none here).
    sk = sketches.count_min_build(keyed_df, "k")
    est = _estimates(spark, sk, keys)
    exact = {
        r["k"]: r["n"]
        for r in keyed_df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)  # one-sided, always
    assert est == exact  # collision-free at this density


def test_tiny_width_overestimates_but_never_under(spark, keyed_df):
    keys = keyed_df.select("k").distinct()
    sk = sketches.count_min_build(keyed_df, "k", depth=2, width=8)
    est = _estimates(spark, sk, keys, depth=2, width=8)
    exact = {
        r["k"]: r["n"]
        for r in keyed_df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)
    assert any(est[k] > exact[k] for k in exact)  # 50 keys in 8 buckets


def test_merge_equals_rebuild_over_union(spark, keyed_df):
    a = keyed_df.filter(F.col("k") % 2 == 0)
    b = keyed_df.filter(F.col("k") % 2 == 1)
    merged = sketches.count_min_merge(
        sketches.count_min_build(a, "k"), sketches.count_min_build(b, "k")
    )
    full = sketches.count_min_build(keyed_df, "k")
    m = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    f = {(r["row"], r["bucket"]): r["cnt"] for r in full.collect()}
    assert m == f


def test_absent_key_estimates_small(spark, keyed_df):
    probe = spark.range(1).select((F.col("id") + 10_000).alias("k"))
    sk = sketches.count_min_build(keyed_df, "k")
    est = _estimates(spark, sk, probe)
    # absent key: estimate is whatever collides, bounded well under
    # the total row count for a sparse grid
    assert est[10_000] < 1275


def test_depth_out_of_range_rejected(spark, keyed_df):
    with pytest.raises(ValueError):
        sketches.count_min_build(keyed_df, "k", depth=5)
