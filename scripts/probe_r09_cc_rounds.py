#!/usr/bin/env python
"""Round/job decomposition of connected_components on the sf0.1
entity-resolution graph (round-9 optimization target: VERDICT says 49
serial single-task jobs). Counts CC rounds by patching the loop's sum
action, and job/stage totals via the status tracker."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubg_data_pipeline_spark.operators import relational
from pubg_data_pipeline_spark.operators.graph import connected_components
from pubg_data_pipeline_spark.session import get_spark
from pubg_data_pipeline_spark.sources.tables import load_table
from pyspark.sql import functions as F

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="cc-probe")
spark.sparkContext.setLogLevel("ERROR")

parts = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
named = parts.where(F.col("p_brand").isNotNull() & F.col("p_name").isNotNull())
reps = named.groupBy("p_brand", "p_name").agg(F.min("p_partkey").alias("rep_id"))
rep_pairs = relational.fuzzy_blocked_pairs(
    reps, id_col="rep_id", block_col="p_brand", text_col="p_name", max_dist=2
).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
pairs = rep_pairs.localCheckpoint(eager=True)  # isolate CC cost from pair gen
print("edges:", pairs.count())

tracker = spark.sparkContext.statusTracker()

def run(tag):
    spark.sparkContext.setJobGroup(tag, tag)
    t0 = time.perf_counter()
    comp = connected_components(pairs, src="src", dst="dst")
    comp.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    jobs = tracker.getJobIdsForGroup(tag) or []
    n_stages = n_tasks = 0
    for jid in jobs:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            si = tracker.getStageInfo(sid)
            if si is not None and si.numCompletedTasks > 0:
                n_stages += 1
                n_tasks += si.numCompletedTasks
    spark.sparkContext.setJobGroup(None, None)
    print(f"{tag}: {dt:.3f}s jobs={len(jobs)} stages={n_stages} tasks={n_tasks}")
    return comp

run("warm")
run("cc1")
run("cc2")

# count rounds: wrap the label-sum by monkeypatching F.sum? simpler —
# re-run the loop logic manually with prints
import pubg_data_pipeline_spark.operators.graph as g

orig = g.connected_components
import types, inspect
# quick manual reimplementation of the loop to count rounds
e0 = pairs.select(F.col("src").alias("a"), F.col("dst").alias("b")).localCheckpoint(eager=True)
sym = e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b"))).filter(F.col("a") != F.col("b")).distinct()
n_edges = sym.count()
e = sym.repartition(1, "b").localCheckpoint(eager=True)
init = (e.groupBy(F.col("a").alias("node")).agg(F.min("b").alias("__mn"))
        .select("node", F.least(F.col("node"), F.col("__mn")).alias("comp")))
labels = init.localCheckpoint(eager=False)
prev = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")).collect()[0]["s"]
rounds = 0
for i in range(25):
    nbr = (e.join(labels.withColumnRenamed("node", "b"), "b")
             .groupBy(F.col("a").alias("node")).agg(F.min("comp").alias("nc")))
    stepped = labels.join(nbr, "node", "left").select(
        "node", F.least(F.col("comp"), F.coalesce(F.col("nc"), F.col("comp"))).alias("comp"))
    ptr = stepped.select(F.col("node").alias("comp"), F.col("comp").alias("comp2"))
    jumped = stepped.join(ptr, "comp", "left").select(
        "node", F.least(F.col("comp"), F.coalesce(F.col("comp2"), F.col("comp"))).alias("comp")
    ).localCheckpoint(eager=False)
    cur = jumped.agg(F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")).collect()[0]["s"]
    rounds += 1
    moved = cur != prev
    print(f"round {rounds}: sum={cur} moved={moved}")
    labels = jumped
    if not moved:
        break
    prev = cur
print("rounds to converge (incl confirm):", rounds)
spark.stop()
