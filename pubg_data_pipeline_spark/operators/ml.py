"""In-engine distributed model training for quality filtering.

Completes the model-based-filtering loop the serving path
(plans/llm_queries.py:doc_quality_model_score — sigmoid(w·x) as a pure
column expression) left open: the coefficients themselves are trained
INSIDE the engine with full-batch gradient descent, where each
iteration is ONE distributed aggregate over the corpus (d+1 sums) and
a driver-side update of the d+1-float weight vector.

This is the textbook scale shape for linear-model training on massive
data (the "statistical query" / AllReduce pattern — e.g. Agarwal et
al., "A Reliable Effective Terascale Linear Learning System", JMLR
2014): the data never moves, gradients reduce tree-wise through
Spark's partial aggregation, and per-iteration driver traffic is d+1
doubles — independent of corpus size. 100 TB changes the per-pass
cost, not the architecture.

Determinism contract (the same rules as plans/base.py): weights are
ROUNDED to a fixed number of decimals after every update, so the
~1e-13 relative drift from partial-sum reassociation (Spark reduces
per-partition, a sequential engine left-to-right) cannot compound
across iterations — this is what lets a DuckDB oracle reproduce the
whole training run as a chained-CTE program (see
plans/llm_queries.py:_trained_model_sql).

The reference pipeline has no ML (reference: spark_apps/
advanced_analytics.py computes fixed-weight scores only); this module
is part of the LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logit(weights: list[float], feature_cols: list[Column]) -> Column:
    """w·x with an intercept at weights[0] — the serving expression;
    weights come from :func:`train_logistic` (or any external
    trainer)."""
    z = F.lit(float(weights[0]))
    for w, x in zip(weights[1:], feature_cols):
        z = z + F.lit(float(w)) * x
    return z


def train_logistic(
    df: DataFrame,
    feature_cols: list[Column],
    label_col: Column,
    iterations: int = 6,
    lr: float = 1.0,
    round_dp: int = 8,
) -> list[float]:
    """Full-batch logistic-regression GD: returns [w0 (intercept),
    w1..wd] after ``iterations`` rounds of

        w_j <- round(w_j - lr * mean((sigmoid(w·x) - y) * x_j), round_dp)

    One aggregate job per iteration (d+1 sums + the row count, all
    from a single scan); the input should be small-projected and
    materialized by the caller if its lineage is expensive — the
    trainer itself adds no persistence so it composes with whatever
    storage story the caller has (cached features, a parquet feature
    table, ...).

    The per-round driver collect is the scalar-convergence pattern
    already used by connected_components and train_bpe: O(d) floats
    per round, never data rows. Features should be roughly unit-scaled
    (the callers here use ratios in [0, 1]) — classic GD, no adaptive
    step."""
    d = len(feature_cols)
    weights = [0.0] * (d + 1)
    # Rows with ANY null feature or a null label are excluded up front:
    # F.sum skips them in every gradient term, so dividing by the full
    # row count would silently attenuate the weights toward zero (the
    # gradient mean must be over the rows that actually contributed).
    usable = df
    for c in [*feature_cols, label_col]:
        usable = usable.filter(c.isNotNull())
    xs = [F.lit(1.0)] + list(feature_cols)
    y = label_col.cast("double")
    for _ in range(iterations):
        err = sigmoid(logit(weights, feature_cols)) - y
        row = usable.agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(err * x).alias(f"g{j}") for j, x in enumerate(xs)],
        ).first()
        n = float(row["n"])
        if n == 0:
            raise ValueError(
                "train_logistic: no usable training rows "
                "(every row has a null feature or label)"
            )
        weights = [
            round(w - lr * float(row[f"g{j}"]) / n, round_dp)
            for j, w in enumerate(weights)
        ]
    return weights


def train_accuracy(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[Column],
    label_col: Column,
) -> float:
    """Training-set accuracy of the decision rule z >= 0 (⇔ sigmoid
    >= 0.5). The logit is rounded to 6dp BEFORE the sign test so the
    decision is reproducible cross-engine (plans/base.py determinism
    rules); one aggregate job."""
    z = F.round(logit(weights, feature_cols), 6)
    hit = ((z >= 0) == label_col.cast("boolean")).cast("double")
    return float(df.agg(F.round(F.avg(hit), 6).alias("acc")).first()["acc"])
