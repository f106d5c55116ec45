"""Salting operators must be exactly result-equivalent to their
unsalted forms while spreading hot keys across partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import skew


@pytest.fixture(scope="module")
def skewed_df(spark):
    # key 'hot' holds 90% of rows
    hot = spark.range(900).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    rest = spark.range(100).select(
        F.concat(F.lit("k"), (F.col("id") % 10)).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(rest)


def test_salted_aggregate_matches_direct(spark, skewed_df):
    direct = {
        (r["k"]): (r["n"], r["total"], r["mx"])
        for r in skewed_df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["total"], r["mx"])
        for r in skew.salted_aggregate(
            skewed_df,
            ["k"],
            {"n": ("v", "count"), "total": ("v", "sum"), "mx": ("v", "max")},
            salt_buckets=8,
        ).collect()
    }
    assert salted == direct


def test_salted_join_matches_direct(spark, skewed_df):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k5", "B")], "k string, label string"
    )
    direct = sorted(
        (r["k"], r["v"], r["label"])
        for r in skewed_df.join(dim, "k", "inner").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["label"])
        for r in skew.salted_join(skewed_df, dim, "k", salt_buckets=8).collect()
    )
    assert salted == direct
    assert len(salted) == 900 + 100 // 10 * 2  # hot + k1 + k5 rows


def test_salted_aggregate_rejects_non_decomposable(spark, skewed_df):
    with pytest.raises(ValueError):
        skew.salted_aggregate(skewed_df, ["k"], {"a": ("v", "avg")})


def test_salted_join_rejects_right_and_full_outer(spark, skewed_df):
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError):
            skew.salted_join(skewed_df, dim, "k", how=how)


def test_skew_report_shares_and_ranks(spark):
    from pubg_data_pipeline_spark.operators.skew import skew_report

    df = spark.createDataFrame(
        [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1, "k string"
    )
    rows = sorted(skew_report(df, "k", top_n=2).collect(), key=lambda r: r["rank"])
    assert [(r["k"], r["n_rows"], r["rank"]) for r in rows] == [("hot", 6, 1), ("warm", 3, 2)]
    assert rows[0]["share_pct"] == 60.0
    assert rows[1]["cum_share_pct"] == 90.0
