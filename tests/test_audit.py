"""Plan-auditor tests: planted red-flag plans are caught, the benign
idioms pass, and — the real gate — EVERY registered query's plan is
scale-safe except the two documented exact-oracle baselines."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.audit import assert_scale_safe, audit_plan
from pubg_data_pipeline_spark.plans import all_specs
from tests.conftest import SMOKE_SF_DIR


def _crit(df, **kw):
    return {f.rule for f in audit_plan(df, **kw) if f.severity == "critical"}


def test_cartesian_between_row_sets_is_critical(spark):
    a = spark.range(100).select(F.col("id").alias("x"))
    b = spark.range(100).select(F.col("id").alias("y"))
    assert _crit(a.crossJoin(b)) == {"nested_loop_join"}
    assert _crit(a.join(b, a.x < b.y)) == {"nested_loop_join"}
    with pytest.raises(AssertionError, match="nested_loop_join"):
        assert_scale_safe(a.crossJoin(b))


def test_scalar_broadcast_crossjoin_is_clean(spark):
    # the standard z-score shape: broadcast one global-agg row
    a = spark.range(100).select(F.col("id").alias("x"))
    stats = a.agg(F.avg("x").alias("mu"), F.stddev("x").alias("sd"))
    joined = a.crossJoin(F.broadcast(stats)).filter(
        (F.col("x") - F.col("mu")) / F.col("sd") > 2
    )
    assert _crit(joined) == set()


def test_literal_dim_band_join_is_clean(spark):
    rows = spark.range(1000).select(F.col("id").cast("double").alias("v"))
    bands = spark.createDataFrame(
        [(0.0, 300.0, "low"), (300.0, 1e9, "high")], "lo double, hi double, band string"
    )
    joined = rows.join(
        F.broadcast(bands), (rows.v >= bands.lo) & (rows.v < bands.hi)
    )
    assert _crit(joined) == set()


def test_global_window_over_raw_rows_is_critical(spark):
    df = spark.range(1000).select(F.col("id").alias("x"))
    ranked = df.withColumn("r", F.row_number().over(Window.orderBy("x")))
    assert _crit(ranked) == {"single_partition_funnel"}


def test_global_window_over_aggregated_rows_is_info_only(spark):
    # tiny post-agg frame through one partition: normal idiom
    df = spark.range(1000).select((F.col("id") % 5).alias("g"))
    agged = df.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    share = agged.withColumn("tot", F.sum("n").over(Window.partitionBy()))
    assert _crit(share) == set()
    assert any(
        f.rule == "single_partition_funnel" and f.severity == "info"
        for f in audit_plan(share)
    )


def test_partitioned_window_is_clean(spark):
    df = spark.range(1000).select((F.col("id") % 5).alias("g"), F.col("id").alias("x"))
    w = Window.partitionBy("g").orderBy("x")
    assert _crit(df.withColumn("r", F.row_number().over(w))) == set()


def test_row_python_udf_is_critical_arrow_is_not(spark):
    from pyspark.sql.functions import pandas_udf, udf

    df = spark.range(100)
    row_f = udf(lambda v: v + 1, "long")
    assert _crit(df.select(row_f("id").alias("z"))) == {"python_row_udf"}

    @pandas_udf("long")
    def arrow_f(s):
        return s + 1

    assert _crit(df.select(arrow_f("id").alias("z"))) == set()


def test_global_final_aggregate_is_clean(spark):
    df = spark.range(1000)
    assert _crit(df.agg(F.sum("id").alias("s"))) == set()
    assert _crit(df.orderBy("id").limit(5)) == set()  # TakeOrderedAndProject


def test_allow_suppresses_rule(spark):
    a = spark.range(10).select(F.col("id").alias("x"))
    b = spark.range(10).select(F.col("id").alias("y"))
    assert _crit(a.crossJoin(b), allow={"nested_loop_join"}) == set()
    assert_scale_safe(a.crossJoin(b), allow={"nested_loop_join"})


# Documented exceptions live in audit.KNOWN_EXACT_BASELINES (shared
# with the CLI); anything else showing a critical finding fails the sweep.
from pubg_data_pipeline_spark.audit import KNOWN_EXACT_BASELINES as _ALLOWED_CRITICAL


def test_every_registered_query_plan_is_scale_safe(spark):
    """The registry-wide pre-flight gate: audit the physical plan of
    all ~150 registered queries (planning only, no execution)."""
    bad = {}
    for name, spec in sorted(all_specs().items()):
        df = spec.fn(spark, SMOKE_SF_DIR)
        crit = {f.rule for f in audit_plan(df) if f.severity == "critical"}
        unexpected = crit - _ALLOWED_CRITICAL.get(name, set())
        if unexpected:
            bad[name] = sorted(unexpected)
    assert not bad, f"scale-unsafe plans: {bad}"


def test_audit_handles_codegen_markers_with_aqe_off(spark):
    """With AQE disabled, plans print '*(n) ' codegen markers; depth
    must come from the tree prefix only, or a starred Sort parent
    would swallow its Exchange child and the funnel rule would miss."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = spark.range(1000).select(F.col("id").alias("x"))
        ranked = df.withColumn("r", F.row_number().over(Window.orderBy("x")))
        assert _crit(ranked) == {"single_partition_funnel"}
        a = spark.range(100).select(F.col("id").alias("x"))
        stats = a.agg(F.avg("x").alias("mu"))
        assert _crit(a.crossJoin(F.broadcast(stats))) == set()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_audit_cartesian_with_bounded_right_side_is_clean(spark):
    """A true CartesianProduct (no Build marker) whose RIGHT child is
    a scalar aggregate must not be flagged — boundedness of either
    side makes the product O(n)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(1000).select(F.col("id").alias("x"))
        stats = a.agg(F.avg("x").alias("mu"))
        joined = a.crossJoin(stats)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            assert _crit(joined) == set()
        # two real row sets stay critical even under this config
        b = spark.range(1000).select(F.col("id").alias("y"))
        assert _crit(a.crossJoin(b)) == {"nested_loop_join"}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_auditor_is_exported_at_package_root(spark):
    """The README-documented user API: the gate and the inspector are
    importable from the package root and behave like the audit module's
    own (doctest for the README example, including allow=)."""
    import pubg_data_pipeline_spark as pds

    a = spark.range(5)
    b = spark.range(5).withColumnRenamed("id", "jd")
    cross = a.crossJoin(b)
    with pytest.raises(AssertionError, match="nested_loop_join"):
        pds.assert_scale_safe(cross)
    pds.assert_scale_safe(cross, allow={"nested_loop_join"})
    findings = pds.audit_plan(cross)
    assert any(
        isinstance(f, pds.Finding) and f.rule == "nested_loop_join" for f in findings
    )
