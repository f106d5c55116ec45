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


def test_t_closeness_distances(spark):
    """Hand-computed TVD: global dx distribution over the 4 people is
    flu 3/4, cold 1/4. Group 12601 (flu 2/3, cold 1/3):
    0.5*(|2/3-3/4| + |1/3-1/4|) = 1/12. Group 90210 (flu 1, cold
    absent): 0.5*(|1-3/4| + 1/4) = 1/4 — the absent value's global
    mass must count."""
    rep = profile.t_closeness_report(_people(spark), ["zip"], "dx", t=0.2)
    by_zip = {r.zip: r for r in rep.collect()}
    assert abs(by_zip["12601"].tvd - round(1 / 12, 4)) < 1e-9
    assert by_zip["12601"].t_close and by_zip["12601"].group_size == 3
    assert abs(by_zip["90210"].tvd - 0.25) < 1e-9
    assert not by_zip["90210"].t_close


def test_t_closeness_identical_distribution_is_zero(spark):
    rows = [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b")]
    df = spark.createDataFrame(rows, "grp string, s string")
    rep = profile.t_closeness_report(df, ["grp"], "s", t=0.1)
    assert all(r.tvd == 0.0 and r.t_close for r in rep.collect())


def test_t_closeness_parameter_validation(spark):
    with pytest.raises(ValueError):
        profile.t_closeness_report(_people(spark), ["zip"], "dx", t=0.0)
    with pytest.raises(ValueError):
        profile.t_closeness_report(_people(spark), ["zip"], "dx", t=1.5)
