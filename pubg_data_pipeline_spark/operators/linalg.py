"""Distributed dense linear algebra over embedding columns.

The scale pattern here is the one Spark MLlib's ``RowMatrix`` uses for
``computeGramianMatrix``/PCA: second moments are ACCUMULATED
PARTITION-LOCALLY (one ``X.T @ X`` per Arrow batch — BLAS-3, no
per-element shuffle) and only the tiny ``d x d`` accumulators travel.
For d = 64 that is 4 KB per partition regardless of row count, so the
reduce is O(partitions), not O(rows) — at 100 TB the network carries
kilobytes while the scan does all the work. A naive
posexplode-self-join formulation would shuffle ``rows x d^2`` pairs
(~20 M rows at sf0.1, ~2e13 at 100 TB) for the same answer.

The reference pipeline has no vector surface at all (its analytics
stop at scalar aggregates — reference spark_apps/advanced_analytics.py);
this extends the LLM-pipeline suite's embedding operators
(operators/similarity.py) with the covariance/PCA diagnostics a
training-data pipeline runs before whitening or dimensionality
reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def second_moments(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One-row DataFrame with the corpus second moments of a dense
    ``array<float|double>`` column: ``n`` (row count), ``s`` (per-dim
    sums, length ``dim``) and ``g`` (row-major flattened Gram matrix
    ``sum x x^T``, length ``dim*dim``).

    One pass, no shuffle of row data: ``mapInPandas`` emits one
    accumulator row per task (numpy ``X.T @ X`` per batch, float64),
    then the element-wise array reduce folds the O(partitions)
    accumulator rows with ``zip_with`` — all JVM-side. Rows whose
    vector is NULL or of the wrong length are ignored (counted out of
    ``n``), matching aggregate NULL semantics.

    Float note: partial-sum order varies with partitioning, so repeated
    runs agree to ~1e-12 relative, not bitwise — downstream consumers
    round (covariance entries to 6dp) exactly like the stddev plans.
    """
    import pandas as pd  # noqa: F401 - Arrow lane dependency, baked in

    def _part(batches):
        import numpy as np
        import pandas as pd

        n = 0
        s = np.zeros(dim, dtype=np.float64)
        g = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None and len(v) == dim]
            if not vecs:
                continue
            x = np.asarray(vecs, dtype=np.float64)
            # A NULL ELEMENT inside a vector arrives from Arrow as NaN
            # and would poison whole dimensions of s/g (NaN sums ->
            # NULL on the way back -> silently masked to 0 downstream,
            # i.e. wrong statistics from one corrupt row). Such rows
            # are invalid exactly like NULL/wrong-length vectors:
            # counted out of n.
            ok = ~np.isnan(x).any(axis=1)
            x = x[ok]
            if x.shape[0] == 0:
                continue
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
        )

    parts = df.select(vec_col).mapInPandas(
        _part, "n long, s array<double>, g array<double>"
    )
    return reduce_moment_states(parts, dim)


def reduce_moment_states(states: DataFrame, dim: int) -> DataFrame:
    """Fold any number of ``(n, s, g)`` accumulator rows into one —
    moment states are element-wise sums, so per-partition, per-epoch,
    or per-stream accumulators merge associatively (the property the
    streaming twin `streaming/app.py:moments_epoch` stores epochs
    under).

    Shape: ONE pass over the states (the upstream is the full-corpus
    Gramian scan — it must not re-execute per output column):
    posexplode the concatenated s||g array to (pos, value) rows, SUM
    per pos as an ordinary distributed aggregation (partial combine
    map-side, so the reduce stays bounded at any state count), then
    assemble the final arrays from the d + d² summed rows. The
    previous collect_list-then-fold formulation concentrated EVERY
    state's full d² array into one aggregation row (O(states · d²)
    bytes on a single task: ~26 GB at 100 TB's ~800k scan partitions
    with d=64 — past executor memory and the 2 GB row limit); here the
    single-row stage only ever assembles the FINAL d²-length arrays."""
    exploded = states.select(
        "n", F.posexplode(F.concat(F.col("s"), F.col("g"))).alias("__p", "__v")
    )
    # each state contributes exactly one row per position, so group 0's
    # n-sum is the total row count — no second pass over the states
    per_pos = exploded.groupBy("__p").agg(
        F.sum("__v").alias("__v"),
        F.sum(F.when(F.col("__p") == 0, F.col("n"))).alias("__n"),
    )

    def _arr(cond, offset: int, length: int):
        picked = F.transform(
            F.array_sort(
                F.collect_list(F.when(cond, F.struct("__p", "__v")))
            ),
            lambda t: t["__v"],
        )
        # zero states (empty input) -> empty list: keep the documented
        # all-zeros identity state
        return (
            F.when(F.size(picked) == length, picked)
            .otherwise(F.array_repeat(F.lit(0.0), length))
        )

    return per_pos.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).alias("n"),
        _arr(F.col("__p") < dim, 0, dim).alias("s"),
        _arr(F.col("__p") >= dim, dim, dim * dim).alias("g"),
    )


def covariance_pairs(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Upper-triangle population covariance entries of a dense vector
    column: one row per (dim_i, dim_j), i <= j, 1-based, with
    ``covar = E[x_i x_j] - E[x_i] E[x_j]`` from :func:`second_moments`
    — the input to whitening / PCA / feature-redundancy pruning.

    The d(d+1)/2 output rows are generated by exploding index
    sequences over the ONE-ROW moments frame: no touch of row data
    after the single scan."""
    return covariance_pairs_from(second_moments(df, vec_col, dim), dim)


def covariance_pairs_from(moments: DataFrame, dim: int) -> DataFrame:
    """Covariance entries from an already-computed (or epoch-merged)
    1-row moments frame — the read side of the streaming moments
    state."""
    # n = 0 (empty/all-invalid corpus) -> zero output rows, matching a
    # grouped covar_pop over no input, instead of d(d+1)/2 NULL rows
    m = moments.filter(F.col("n") > 0)
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    mean = lambda i: F.element_at("s", i + 1) / F.col("n")  # noqa: E731
    pairs = (
        m.select("n", "s", "g", F.explode(idx).alias("__i"))
        .select("n", "s", "g", "__i", F.explode(idx).alias("__j"))
        .filter(F.col("__i") <= F.col("__j"))
    )
    cov = (
        F.element_at("g", F.col("__i") * dim + F.col("__j") + 1) / F.col("n")
        - mean(F.col("__i")) * mean(F.col("__j"))
    )
    return pairs.select(
        (F.col("__i") + 1).cast("int").alias("dim_i"),
        (F.col("__j") + 1).cast("int").alias("dim_j"),
        cov.alias("covar"),
    )


def pca_diagnostics(df: DataFrame, vec_col: str, dim: int, top_k: int = 8) -> DataFrame:
    """Top-``top_k`` principal-component diagnostics: eigenvalues of
    the population covariance matrix and cumulative explained-variance
    ratio. The distributed part is exactly :func:`second_moments` (one
    scan, kilobyte accumulators); the eigendecomposition runs driver-
    side on the d x d matrix — at d = 64 that is a 32 KB numpy ``eigh``,
    the same split MLlib uses (RowMatrix.computePrincipalComponents
    collects the Gramian). Not SQL-expressible (iterative eigensolver)
    — registered rows-only."""
    import numpy as np

    row = second_moments(df, vec_col, dim).collect()[0]  # 1 row, ~32 KB
    n = row["n"]
    spark = df.sparkSession
    if n == 0:  # empty/all-invalid corpus: no spectrum to report
        return spark.createDataFrame(
            [], "component int, eigenvalue double, cum_explained double"
        )
    s = np.asarray(row["s"])
    g = np.asarray(row["g"]).reshape(dim, dim)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals = np.linalg.eigvalsh(cov)[::-1]  # descending
    total = float(evals.sum())
    rows = [
        (
            i + 1,
            round(float(evals[i]), 6),
            round(float(evals[: i + 1].sum() / total), 6) if total > 0 else 0.0,
        )
        for i in range(min(top_k, dim))
    ]
    return spark.createDataFrame(
        rows, "component int, eigenvalue double, cum_explained double"
    )
