"""Privacy release operators (operators/profile.py): suppression-based
k-anonymity and the l-diversity homogeneity audit."""

from __future__ import annotations

import pytest

from pubg_data_pipeline_spark.operators import profile


def _people(spark):
    # quasi = (zip, age_band); "alice/bob/carol" share a combo, "dave"
    # is unique and must be suppressed at k>=2
    rows = [
        ("alice", "12601", "20-30", "flu"),
        ("bob", "12601", "20-30", "flu"),
        ("carol", "12601", "20-30", "cold"),
        ("dave", "90210", "40-50", "flu"),
    ]
    return spark.createDataFrame(rows, "name string, zip string, age_band string, dx string")


def test_k_anonymize_suppresses_small_groups(spark):
    df = _people(spark)
    out = profile.k_anonymize(df, ["zip", "age_band"], k=2)
    assert sorted(r.name for r in out.collect()) == ["alice", "bob", "carol"]
    # k=1 is the identity release
    assert profile.k_anonymize(df, ["zip", "age_band"], k=1).count() == 4
    # k above the largest group suppresses everything
    assert profile.k_anonymize(df, ["zip", "age_band"], k=5).count() == 0


def test_k_anonymize_groups_nulls_together(spark):
    rows = [("a", None), ("b", None), ("c", "x")]
    df = spark.createDataFrame(rows, "name string, qi string")
    out = profile.k_anonymize(df, ["qi"], k=2)
    assert sorted(r.name for r in out.collect()) == ["a", "b"]


def test_l_diversity_flags_homogeneous_group(spark):
    rep = profile.l_diversity_report(
        _people(spark), ["zip", "age_band"], "dx", l=2
    )
    by_zip = {r.zip: r for r in rep.collect()}
    assert by_zip["12601"].l_diverse and by_zip["12601"].n_sensitive_values == 2
    assert not by_zip["90210"].l_diverse  # one person, one dx: homogeneous
    assert by_zip["12601"].group_size == 3


def test_parameter_validation(spark):
    df = _people(spark)
    with pytest.raises(ValueError):
        profile.k_anonymize(df, ["zip"], k=0)
    with pytest.raises(ValueError):
        profile.l_diversity_report(df, ["zip"], "dx", l=0)
