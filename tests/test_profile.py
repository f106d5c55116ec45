"""Unit tests for operators/profile.py — null accounting, typed
min/max, single-job evaluation, and NULL-rule CHECK semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import profile


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", None), (3, None, 5.0), (4, "b", 5.0)],
        "id int, s string, v double",
    )
    rows = {r["column_name"]: r for r in profile.profile_columns(df, ["s", "v"]).collect()}
    assert rows["s"]["n_rows"] == 4
    assert rows["s"]["n_nulls"] == 1
    assert rows["s"]["null_frac"] == 0.25
    assert rows["s"]["n_distinct"] == 2          # nulls excluded
    assert rows["s"]["min_value"] == "a" and rows["s"]["max_value"] == "b"
    assert rows["v"]["n_nulls"] == 1
    assert rows["v"]["n_distinct"] == 2
    # typed (numeric) min/max, stringified after — not lexicographic
    assert rows["v"]["min_value"] == "5.0" and rows["v"]["max_value"] == "10.0"


def test_profile_numeric_ordering_not_lexicographic(spark):
    df = spark.createDataFrame([(9,), (10,), (100,)], "n int")
    row = profile.profile_columns(df, ["n"]).collect()[0]
    assert row["min_value"] == "9" and row["max_value"] == "100"  # lexicographic would say max='9'


def test_profile_approx_mode_drops_expand(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    )
    exact = profile.profile_columns(df, ["id", "m"])
    approx = profile.profile_columns(df, ["id", "m"], exact_distinct=False)
    # exact multi-distinct needs Expand; approx (HLL) must not
    assert "Expand" in exact._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in approx._jdf.queryExecution().executedPlan().toString()
    got = {r["column_name"]: r["n_distinct"] for r in approx.collect()}
    assert got["m"] == 7  # HLL is exact at tiny cardinality


def test_expectations_null_rule_is_violation(spark):
    df = spark.createDataFrame([(1.0,), (None,), (-2.0,)], "v double")
    rows = {
        r["rule_name"]: r
        for r in profile.expectations_report(
            df, [("v_nonneg", F.col("v") >= 0), ("v_present", F.col("v").isNotNull())]
        ).collect()
    }
    # -2.0 fails the predicate, NULL evaluates to NULL -> counted too
    assert rows["v_nonneg"]["n_violations"] == 2
    assert not rows["v_nonneg"]["passed"]
    assert rows["v_present"]["n_violations"] == 1
    assert rows["v_nonneg"]["n_rows"] == 3


def test_expectations_all_pass(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    out = profile.expectations_report(df, [("ok", F.col("v") > 0)]).collect()[0]
    assert out["passed"] and out["n_violations"] == 0


def test_profile_rejects_unsafe_names(spark):
    import pytest

    df = spark.range(3).selectExpr("id AS `weird name`")
    with pytest.raises(ValueError, match="alias it first"):
        profile.profile_columns(df, ["weird name"])
    with pytest.raises(ValueError, match="alias it first"):
        profile.expectations_report(spark.range(3), [("bad'rule", F.col("id") > 0)])


def test_distribution_drift_one_sided_category_and_reference_value(spark):
    import math

    from pyspark.sql import functions as F

    from pubg_data_pipeline_spark.operators import profile

    base = spark.createDataFrame([("a",)] * 8 + [("b",)] * 2, "c string")
    cur = spark.createDataFrame([("a",)] * 5 + [("z",)] * 5, "c string")  # b gone, z new
    out = {
        r["c"]: (r["n_base"], r["n_cur"], r["psi_contrib"])
        for r in profile.distribution_drift(base, cur, F.col("c"), key_name="c").collect()
    }
    assert set(out) == {"a", "b", "z"}
    assert out["b"][:2] == (2, 0) and out["z"][:2] == (0, 5)
    eps = 1e-6

    def psi(nb, nc):
        pb, pc = nb / 10 + eps, nc / 10 + eps
        return (pc - pb) * math.log(pc / pb)

    for c, (nb, nc, got) in out.items():
        assert math.isclose(got, psi(nb, nc), rel_tol=1e-12), (c, got, psi(nb, nc))
    # disappeared/new categories dominate the drift score, as PSI should
    assert out["z"][2] > out["a"][2] and out["b"][2] > out["a"][2]


def test_profile_empty_table_and_empty_inputs(spark):
    import pytest

    from pubg_data_pipeline_spark.operators import profile

    empty = spark.createDataFrame([], "v double")
    row = profile.profile_columns(empty, ["v"]).collect()[0]
    assert row["n_rows"] == 0 and row["n_nulls"] == 0
    assert row["null_frac"] == 0.0  # not NULL, not DIVIDE_BY_ZERO

    with pytest.raises(ValueError):
        profile.profile_columns(empty, [])
    with pytest.raises(ValueError):
        profile.expectations_report(empty, [])


def test_drift_with_empty_baseline_yields_null_not_crash(spark):
    from pyspark.sql import functions as F

    from pubg_data_pipeline_spark.operators import profile

    base = spark.createDataFrame([], "c string")
    cur = spark.createDataFrame([("a",), ("b",)], "c string")
    rows = profile.distribution_drift(base, cur, F.col("c")).collect()
    assert len(rows) == 2
    assert all(r["psi_contrib"] is None for r in rows)  # no ANSI crash


def test_train_logistic_null_rows_excluded_and_empty_raises(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pubg_data_pipeline_spark.operators import ml

    df = spark.createDataFrame(
        [(1.0, 1), (None, 0), (0.0, 0)], "x double, y int"
    )
    # one iteration, lr=1: gradient mean over the 2 usable rows
    w = ml.train_logistic(df, [F.col("x")], F.col("y"), iterations=1, lr=1.0)
    assert abs(w[1] - 0.25) < 1e-9  # was 1/6 when divided by all 3 rows

    empty = spark.createDataFrame([], "x double, y int")
    with _pytest.raises(ValueError, match="no usable training rows"):
        ml.train_logistic(empty, [F.col("x")], F.col("y"), iterations=1)
