#!/usr/bin/env python
"""Interleaved same-session A/B of the round-9 connected_components
rewrite (self-edge fused rounds + pointer doubling + AQE-off loop for
single-partition graphs) against the round-8 implementation, on the
sf0.1 entity-resolution graph. min-of-N per variant, alternating, so
JIT warmth and host noise hit both sides equally.

The old implementation is loaded from a file dump of the previous
commit (pass its path as argv[1]; default /tmp/graph_old.py)."""
from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubg_data_pipeline_spark.operators import relational
from pubg_data_pipeline_spark.operators import graph as graph_new
from pubg_data_pipeline_spark.session import get_spark
from pubg_data_pipeline_spark.sources.tables import load_table
from pyspark.sql import functions as F

old_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graph_old.py"
spec = importlib.util.spec_from_file_location("graph_old", old_path)
graph_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(graph_old)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="cc-ab")
spark.sparkContext.setLogLevel("ERROR")

parts = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
named = parts.where(F.col("p_brand").isNotNull() & F.col("p_name").isNotNull())
reps = named.groupBy("p_brand", "p_name").agg(F.min("p_partkey").alias("rep_id"))
rep_pairs = relational.fuzzy_blocked_pairs(
    reps, id_col="rep_id", block_col="p_brand", text_col="p_name", max_dist=2
).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
pairs = rep_pairs.localCheckpoint(eager=True)
print("edges:", pairs.count())

tracker = spark.sparkContext.statusTracker()


def run(tag, fn):
    spark.sparkContext.setJobGroup(tag, tag)
    t0 = time.perf_counter()
    comp = fn(pairs, src="src", dst="dst")
    comp.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    jobs = len(tracker.getJobIdsForGroup(tag) or [])
    spark.sparkContext.setJobGroup(None, None)
    return dt, jobs


# warm both sides twice
for fn in (graph_old.connected_components, graph_new.connected_components):
    run("warm", fn)
    run("warm2", fn)

N = 7
olds, news = [], []
for i in range(N):
    dt_o, j_o = run(f"old{i}", graph_old.connected_components)
    dt_n, j_n = run(f"new{i}", graph_new.connected_components)
    olds.append(dt_o)
    news.append(dt_n)
    print(f"pass {i}: old {dt_o:.3f}s ({j_o} jobs)  new {dt_n:.3f}s ({j_n} jobs)")

olds.sort(), news.sort()
print(f"old min={olds[0]:.3f} med={olds[N // 2]:.3f}")
print(f"new min={news[0]:.3f} med={news[N // 2]:.3f}")
print(f"speedup min={olds[0] / news[0]:.2f}x med={olds[N // 2] / news[N // 2]:.2f}x")

# result parity on this graph
old_rows = sorted(
    (r["node"], r["component"])
    for r in graph_old.connected_components(pairs, src="src", dst="dst").collect()
)
new_rows = sorted(
    (r["node"], r["component"])
    for r in graph_new.connected_components(pairs, src="src", dst="dst").collect()
)
print("rows equal:", old_rows == new_rows, "n:", len(new_rows))
spark.stop()
