#!/usr/bin/env python
"""Interleaved A/B: CC convergence seeded with the init-label sum (new)
vs prev_sum=None seeding (old, reconstructed inline). Same session,
alternating passes, min-of-N, noop sink; also row-identity check and
job counts per variant (statusTracker job groups).

Usage: python scripts/probe_r08b_cc.py [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pubg_data_pipeline_spark.operators import graph
from pubg_data_pipeline_spark.plans import all_specs
from pubg_data_pipeline_spark.session import get_spark

NEW_CC = graph.connected_components


def cc_old(edges, src="src", dst="dst", max_iter=25, checkpoint_dir=None):
    """The pre-change loop: identical except prev_sum starts at None
    (numeric convergence needs two in-loop sums to agree)."""
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df, eager):
        before = graph._persisted_rdd_ids(spark)
        out = df.checkpoint(eager=eager) if checkpoint_dir is not None else df.localCheckpoint(eager=eager)
        return out, graph._persisted_rdd_ids(spark) - before

    e0, e0_ids = _ckpt(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")), eager=True)
    sym, sym_ids = _ckpt(
        e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct(),
        eager=False,
    )
    n_edges = sym.count()
    n_parts = max(1, min(sym.sparkSession.sparkContext.defaultParallelism, n_edges // 500_000))
    e, _e_ids = _ckpt(sym.repartition(n_parts, "b"), eager=True)
    init = (
        e.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("__mn"))
        .select("node", F.least(F.col("node"), F.col("__mn")).alias("comp"))
    )
    loop_nodes = e.select(F.col("a").alias("node")).distinct()
    self_only = (
        e0.select(F.col("a").alias("node"))
        .union(e0.select(F.col("b").alias("node")))
        .distinct()
        .join(loop_nodes, "node", "left_anti")
        .select("node", F.col("node").alias("comp"))
    )
    labels, labels_ids = _ckpt(init.unionByName(self_only), eager=True)
    graph._release_rdds(spark, e0_ids | sym_ids)
    if n_edges == 0:
        graph._release_rdds(spark, _e_ids)
        return labels.select("node", F.col("comp").alias("component"))
    numeric_comp = dict(labels.dtypes)["comp"] in (
        "tinyint", "smallint", "int", "bigint",
    ) or dict(labels.dtypes)["comp"].startswith("decimal")
    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            e.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
            )
        )
        ptr = stepped.select(F.col("node").alias("comp"), F.col("comp").alias("comp2"))
        jumped, jumped_ids = _ckpt(
            stepped.join(ptr, "comp", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("comp2"), F.col("comp"))).alias("comp"),
            ),
            eager=False,
        )
        if numeric_comp:
            cur_sum = jumped.agg(F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")).collect()[0]["s"]
            converged = prev_sum is not None and cur_sum == prev_sum
            prev_sum = cur_sum
        else:
            converged = (
                jumped.join(labels.select("node", F.col("comp").alias("__prev")), "node")
                .filter(F.col("comp") != F.col("__prev"))
                .limit(1)
                .count()
                == 0
            )
        graph._release_rdds(spark, labels_ids)
        labels, labels_ids = jumped, jumped_ids
        if converged:
            break
    graph._release_rdds(spark, _e_ids)
    return labels.select("node", F.col("comp").alias("component"))


def run(spark, specs, name, sf_dir, variant):
    graph.connected_components = NEW_CC if variant == "new" else cc_old
    spark.sparkContext.setJobDescription(f"{variant}:{name}")
    t0 = time.perf_counter()
    specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def count_jobs(spark, specs, name, sf_dir, variant):
    graph.connected_components = NEW_CC if variant == "new" else cc_old
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    group = f"jobs:{variant}:{name}"
    sc.setJobGroup(group, name)
    specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    ids = tracker.getJobIdsForGroup(group) or []
    sc.setJobGroup(None, None)
    return len(ids)


def main():
    names = sys.argv[1:] or [
        "part_entity_resolution",
        "doc_dup_clusters",
        "incremental_neardup_ingest",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("TIME_PASSES", "4"))
    spark = get_spark(app_name="probe-cc-ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    for name in names:
        # row-identity first (also warms)
        graph.connected_components = cc_old
        old_rows = sorted(map(tuple, specs[name].fn(spark, sf_dir).collect()))
        graph.connected_components = NEW_CC
        new_rows = sorted(map(tuple, specs[name].fn(spark, sf_dir).collect()))
        ident = old_rows == new_rows
        jobs_old = count_jobs(spark, specs, name, sf_dir, "old")
        jobs_new = count_jobs(spark, specs, name, sf_dir, "new")
        ts = {"old": [], "new": []}
        for i in range(passes):
            for variant in ("old", "new") if i % 2 == 0 else ("new", "old"):
                ts[variant].append(run(spark, specs, name, sf_dir, variant))
        print(
            f"{name}: identical={ident} jobs {jobs_old}->{jobs_new} "
            f"old_min={min(ts['old']):.3f} new_min={min(ts['new']):.3f} "
            f"old_all={[round(t,2) for t in ts['old']]} new_all={[round(t,2) for t in ts['new']]}",
            flush=True,
        )
    graph.connected_components = NEW_CC


if __name__ == "__main__":
    main()
