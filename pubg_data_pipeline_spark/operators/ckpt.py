"""Materialize-once lineage barriers with bounded block lifetime.

A subtree referenced more than once in a query plan re-executes once
per reference: AQE in Spark 4.1.2 never emits ReusedExchange for
duplicated subtrees (verified with minimal repros in
scripts/probe_r08b_multiscans.py), so the standard fix is a
checkpoint barrier the first consumer's own action materializes.
This module centralizes that barrier and fixes its two lifecycle
problems:

1. **Block release.** ``DataFrame.unpersist()`` is a NO-OP for
   localCheckpoint blocks (they register at the RDD layer, not the
   Dataset cache manager), so every barrier call pins one
   corpus-scale copy of its subtree for the process lifetime. The
   bench executes each query 4+ times per run — without release the
   posting/scored/tokenized intermediates accumulate one copy per
   execution. ``barrier(site=...)`` releases the blocks the PREVIOUS
   call at the same site registered, bounding each site to exactly
   one live copy. (Callers must not reuse a frame returned by an
   earlier call after re-invoking the same site — true for every
   query path: each bench/oracle execution builds a fresh plan.)

2. **Cluster fault tolerance.** localCheckpoint blocks have no
   lineage fallback: on a real cluster an executor loss mid-query
   fails the job. Setting ``SPARK_GRAFT_CHECKPOINT_DIR`` (HDFS/S3
   path on cluster deployments) routes every barrier through a
   reliable ``DataFrame.checkpoint`` into that directory instead —
   executor-loss tolerant at the cost of one distributed write. The
   local default stays localCheckpoint: fastest, and executor loss
   does not exist in local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: RDD ids registered by the most recent barrier call, per site key.
_SITE_BLOCKS: dict[str, set[int]] = {}

_CHECKPOINT_DIR_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"


def persisted_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently registered with the block manager.
    localCheckpoint registers its backing RDD here at CALL time (even
    eager=False), so diffing before/after a checkpoint identifies
    exactly the blocks that checkpoint owns."""
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = m.keysIterator()
    out: set[int] = set()
    while it.hasNext():
        out.add(it.next())
    return out


def release_rdds(spark: SparkSession, ids: set[int]) -> None:
    """Unpersist the given RDD ids through the block manager's own
    registry (the only layer that can release checkpoint blocks)."""
    if not ids:
        return
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = m.valuesIterator()
    while it.hasNext():
        r = it.next()
        if r.id() in ids:
            r.unpersist(False)


def reliable_checkpoint_dir() -> str | None:
    """The configured reliable-checkpoint directory, or None (local
    mode default: executor-local checkpoints)."""
    return os.environ.get(_CHECKPOINT_DIR_ENV) or None


def barrier(df: DataFrame, site: str, eager: bool = False) -> DataFrame:
    """Checkpoint ``df`` as a materialize-once barrier.

    ``site`` is a stable caller-chosen key (module:function); the
    blocks registered by the previous call at the same site are
    released, so repeated executions of one query keep exactly one
    live copy of each barrier instead of accumulating per run.

    ``eager=False`` (default) rides the first consumer's own action —
    zero extra jobs; ``eager=True`` materializes now (use when the
    barrier must exist before fan-out to independently-executed
    consumers)."""
    spark = df.sparkSession
    ckpt_dir = reliable_checkpoint_dir()
    if ckpt_dir is not None:
        if spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
            spark.sparkContext.setCheckpointDir(ckpt_dir)
        # reliable checkpoints write to the fault-tolerant dir and
        # register no block-manager blocks — nothing to supersede
        return df.checkpoint(eager=eager)
    before = persisted_rdd_ids(spark)
    out = df.localCheckpoint(eager=eager)
    ids = persisted_rdd_ids(spark) - before
    stale = _SITE_BLOCKS.get(site)
    if stale:
        release_rdds(spark, stale)
    _SITE_BLOCKS[site] = ids
    return out
