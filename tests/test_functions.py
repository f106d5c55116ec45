"""Golden tests for the reference-semantics expressions.

The severity goldens are lifted from the reference's own alert
fixtures (reference: test/test_alerts.py:30-70 — 25 kills/4500 dmg →
HIGH, 16/2800 → MEDIUM, 5/800 → LOW, thresholds at
monitoring/alert_manager.py:387-396); KDA from
monitoring/metrics_collector.py:122-126; the z-score σ=0 guard is the
documented semantic difference of SURVEY.md §4.2 item 5.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.functions import metrics
from pubg_data_pipeline_spark.operators import dedup, zscore


def test_severity_reference_goldens(spark):
    rows = [
        ("high_kills", 25, 4500.0, 4.2),
        ("medium", 16, 2800.0, 3.1),
        ("low", 5, 800.0, 0.5),
        ("high_by_z_only", 1, 100.0, 4.0),
        ("medium_by_damage", 0, 2500.0, 0.0),
    ]
    df = spark.createDataFrame(rows, "name string, kills int, damage double, z double")
    out = {
        r["name"]: r["sev"]
        for r in df.select(
            "name", metrics.severity_expr(F.col("kills"), F.col("damage"), F.col("z")).alias("sev")
        ).collect()
    }
    assert out == {
        "high_kills": "HIGH",
        "medium": "MEDIUM",
        "low": "LOW",
        "high_by_z_only": "HIGH",
        "medium_by_damage": "MEDIUM",
    }


def test_kda_alive_special_case(spark):
    df = spark.createDataFrame(
        [(10, 5, "alive"), (10, 5, "byplayer"), (0, 0, "byzone")],
        "kills int, assists int, death_type string",
    )
    out = df.select(
        metrics.kda_expr(F.col("kills"), F.col("assists"), F.col("death_type")).alias("kda")
    ).collect()
    # alive -> deaths=0 -> divide by max(0,1)=1; else deaths=1
    assert [r["kda"] for r in out] == [15.0, 15.0, 0.0]


def test_ranking_score_polynomial(spark):
    # reference weights (spark_apps/advanced_analytics.py:122-130):
    # kills*10 + assists*5 + damage*0.01 + survival*0.005
    # + win_rate*100 + top10_rate*50 + headshot_ratio*30
    df = spark.createDataFrame(
        [(4.0, 2.0, 1000.0, 1200.0, 0.5, 0.8, 0.25)],
        "k double, a double, d double, s double, w double, t double, h double",
    )
    out = df.select(
        metrics.ranking_score_expr(
            F.col("k"), F.col("a"), F.col("d"), F.col("s"), F.col("w"), F.col("t"), F.col("h")
        ).alias("score")
    ).first()["score"]
    assert out == pytest.approx(40.0 + 10.0 + 10.0 + 6.0 + 50.0 + 40.0 + 7.5)


def test_difficulty_score(spark):
    df = spark.createDataFrame([(1.0, 3.0)], "k double, s double")
    out = df.select(
        metrics.difficulty_score_expr(F.col("k"), F.col("s")).alias("d")
    ).first()["d"]
    assert out == pytest.approx((1 / 2.0) * (1 / 4.0) * 100)


def test_zscore_sigma_zero_guard(spark):
    # constant column -> stddev 0 -> z must be 0.0, not null/NaN
    df = spark.createDataFrame([(i, 5.0) for i in range(10)], "id int, x double")
    out = zscore.with_zscores(df, ["x"]).select("x_zscore").collect()
    assert all(r["x_zscore"] == 0.0 for r in out)


def test_zscore_flags_outlier(spark):
    vals = [(i, 10.0) for i in range(30)] + [(99, 1000.0)]
    df = spark.createDataFrame(vals, "id int, x double")
    flagged = zscore.anomalies(df, ["x"], threshold=2.5).collect()
    assert [r["id"] for r in flagged] == [99]


def test_exact_dedup_keeps_min_order_key(spark):
    df = spark.createDataFrame(
        [(3, "a"), (1, "a"), (2, "a"), (7, "b")], "event_id int, key string"
    )
    out = dedup.exact_dedup(df, ["key"], "event_id").collect()
    assert {(r["key"], r["event_id"]) for r in out} == {("a", 1), ("b", 7)}


def test_explode_outer_preserves_empty_shingle_docs(spark):
    """explode_outer keeps rows whose shingle array is empty (docs
    shorter than the shingle width) — the null-safety variant
    SURVEY.md §2.3 J2 commits to."""
    from pubg_data_pipeline_spark.functions.text import word_shingles

    df = spark.createDataFrame(
        [(1, "only two"), (2, "three word doc here")], "doc_id int, text string"
    )
    sh = df.select("doc_id", F.explode_outer(word_shingles(F.col("text"))).alias("s"))
    rows = [(r["doc_id"], r["s"]) for r in sh.collect()]
    assert (1, None) in rows  # short doc survives with null shingle
    assert sum(1 for d, _ in rows if d == 2) == 2  # 4 tokens -> 2 shingles
    # plain explode would drop doc 1 entirely
    plain = df.select("doc_id", F.explode(word_shingles(F.col("text"))).alias("s"))
    assert {r["doc_id"] for r in plain.collect()} == {2}


def test_derived_performance_null_filter(spark):
    df = spark.createDataFrame(
        [
            ("p1", 5, 2, 1, 800.0, 600.0, 1),
            ("p2", None, 2, 1, 800.0, 600.0, 5),
        ],
        "player_name string, kills int, assists int, headshot_kills int,"
        " damage_dealt double, time_survived double, win_place int",
    )
    out = metrics.derived_performance_cols(df).collect()
    assert len(out) == 1  # null-kills row filtered (reference :89)
    r = out[0]
    assert r["ka_score"] == 7
    assert r["dps"] == pytest.approx(800.0 / 600.0)
    assert r["headshot_ratio"] == pytest.approx(0.2)
    assert r["is_winner"] == 1 and r["top10_finish"] == 1
