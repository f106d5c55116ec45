"""The shared materialize-once barrier (operators/ckpt.py): superseded
block release and the reliable-checkpoint cluster escape hatch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import ckpt


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_barrier_releases_superseded_site_blocks(spark):
    """Repeated executions of one query (the bench runs each 4+ times)
    must keep exactly ONE live copy per barrier site, not accumulate a
    corpus-scale checkpoint per call — DataFrame.unpersist() cannot
    release these blocks, only the site registry can."""
    df = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    before = _n_persistent(spark)
    for _ in range(4):
        out = ckpt.barrier(df.groupBy("k").count(), site="test:release")
        out.write.format("noop").mode("overwrite").save()  # materialize
    growth = _n_persistent(spark) - before
    assert growth <= 1, f"leaked {growth} checkpoint RDDs over 4 calls"
    # cleanup the final live copy so other tests see a clean registry
    ckpt.release_rdds(spark, ckpt._SITE_BLOCKS.pop("test:release", set()))


def test_barrier_sites_are_independent(spark):
    """Releasing is per-site: two sites used in one query must not
    release each other's live blocks mid-plan."""
    df = spark.range(100)
    a = ckpt.barrier(df.select((F.col("id") * 2).alias("x")), site="test:a")
    b = ckpt.barrier(df.select((F.col("id") * 3).alias("x")), site="test:b")
    assert a.unionAll(b).count() == 200  # both still computable
    for site in ("test:a", "test:b"):
        ckpt.release_rdds(spark, ckpt._SITE_BLOCKS.pop(site, set()))


def test_barrier_reliable_mode_preserves_results(spark, tmp_path, monkeypatch):
    """With SPARK_GRAFT_CHECKPOINT_DIR set (cluster deployments) the
    barrier routes through a reliable DataFrame.checkpoint: results
    identical, files written under the directory, and no executor-local
    blocks registered for the site."""
    df = spark.range(500).select(F.col("id"), (F.col("id") % 5).alias("k"))
    expected = sorted(
        (r["k"], r["n"]) for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()
    )
    ckpt_dir = str(tmp_path / "reliable_ckpt")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckpt_dir)
    assert ckpt.reliable_checkpoint_dir() == ckpt_dir
    out = ckpt.barrier(
        df.groupBy("k").agg(F.count("*").alias("n")), site="test:reliable", eager=True
    )
    got = sorted((r["k"], r["n"]) for r in out.collect())
    assert got == expected
    assert "test:reliable" not in ckpt._SITE_BLOCKS  # no local blocks registered
    # files land under the SESSION's checkpoint dir — ckpt_dir if this
    # test set it first, or an earlier test's dir the barrier correctly
    # reused (setCheckpointDir is once-per-session)
    import os

    actual_dir = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    assert any(os.scandir(actual_dir.replace("file:", ""))), (
        "reliable checkpoint wrote nothing"
    )


def test_connected_components_reliable_env_matches_local(spark, tmp_path, monkeypatch):
    """The CC loop picks up the session-level reliable-checkpoint dir
    when no explicit checkpoint_dir is passed, and the switch does not
    change the result."""
    from pubg_data_pipeline_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (9, 9)], "src long, dst long"
    )
    local = {
        (r["node"], r["component"])
        for r in graph.connected_components(edges).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "cc_ckpt"))
    reliable = {
        (r["node"], r["component"])
        for r in graph.connected_components(edges).collect()
    }
    assert reliable == local == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7), (9, 9)}
