"""In-engine logistic-regression training (operators/ml.py): the
distributed AllReduce-style GD must agree with a pure-Python replay of
the identical training program (same rounding discipline), and the
quality-distillation query must actually learn (accuracy well above
the ~50% majority class)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.functions.text import text_stats_columns
from pubg_data_pipeline_spark.operators import ml
from pubg_data_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _features(spark):
    cols = text_stats_columns(F.col("text"))
    return load_table(spark, SF_DIR, "documents").select(
        (F.least(cols["n_tokens"].cast("double"), F.lit(200.0)) / F.lit(200.0)).alias(
            "x1"
        ),
        cols["stop_ratio"].alias("x2"),
        cols["punct_ratio"].alias("x3"),
        (cols["quality"] >= 0.6).cast("double").alias("y"),
    )


def test_train_logistic_matches_python_replay(spark):
    feats = _features(spark).localCheckpoint(eager=True)
    fx = [F.col("x1"), F.col("x2"), F.col("x3")]
    got = ml.train_logistic(feats, fx, F.col("y"), iterations=10, lr=2.0, round_dp=8)

    rows = [(r["x1"], r["x2"], r["x3"], r["y"]) for r in feats.collect()]
    n = len(rows)
    w = [0.0] * 4
    for _ in range(10):
        g = [0.0] * 4
        for x1, x2, x3, y in rows:
            z = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3
            e = 1.0 / (1.0 + math.exp(-z)) - y
            for j, x in enumerate((1.0, x1, x2, x3)):
                g[j] += e * x
        w = [round(wj - 2.0 * gj / n, 8) for wj, gj in zip(w, g)]
    # partial-sum reassociation differs between Spark's tree reduce and
    # the sequential replay; the per-round 8dp rounding bounds the gap
    # to at most the last retained decimal
    assert all(abs(a - b) <= 2e-8 for a, b in zip(got, w)), (got, w)


def test_quality_distillation_learns(spark):
    from pubg_data_pipeline_spark.plans.llm_queries import doc_quality_trained_model

    vals = {
        r["term"]: r["value"]
        for r in doc_quality_trained_model(spark, SF_DIR).collect()
    }
    assert vals["train_accuracy"] >= 0.8, vals
    # the length term dominates the heuristic's variance in this
    # corpus: its coefficient must come out decisively positive
    assert vals["w1"] > 1.0, vals


def test_train_accuracy_bounds(spark):
    feats = _features(spark).localCheckpoint(eager=True)
    fx = [F.col("x1"), F.col("x2"), F.col("x3")]
    # the zero model predicts z=0 -> class 1 everywhere: accuracy must
    # equal the positive-class rate exactly
    base = ml.train_accuracy(feats, [0.0] * 4, fx, F.col("y"))
    pos = feats.agg(F.round(F.avg("y"), 6)).first()[0]
    assert base == pos
