"""Single-pass observation metrics (operators/observe.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import observe


def _df(spark):
    rows = [
        (1, 10.0, datetime.datetime(2024, 1, 1, 10, 0)),
        (2, None, datetime.datetime(2024, 1, 1, 11, 0)),
        (3, -4.5, datetime.datetime(2024, 1, 1, 12, 0)),
        (4, 2.0, datetime.datetime(2024, 1, 1, 9, 0)),
    ]
    return spark.createDataFrame(rows, "id long, value double, ts timestamp")


def test_observed_quality_metrics_single_pass(spark):
    df, obs = observe.observed(
        _df(spark), "guard", *observe.quality_metrics("value", "ts")
    )
    # one action drives BOTH the data and the metrics
    assert df.count() == 4
    got = obs.get
    assert got["n_rows"] == 4
    assert got["n_null_value"] == 1
    assert got["n_negative_value"] == 1
    assert got["min_ts"] == datetime.datetime(2024, 1, 1, 9, 0)
    assert got["max_ts"] == datetime.datetime(2024, 1, 1, 12, 0)


def test_observed_metrics_survive_transformations_downstream(spark):
    """Metrics observe the frame at the point of attachment — a
    downstream filter must not change them."""
    df, obs = observe.observed(_df(spark), "pre_filter", F.count(F.lit(1)).alias("n"))
    kept = df.where(F.col("value") > 0).count()
    assert kept == 2
    assert obs.get["n"] == 4
