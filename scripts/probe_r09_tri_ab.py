#!/usr/bin/env python
"""VERDICT #4: isolated interleaved A/B of the round-8 triangles
refactor (claimed plan-identical, flagged 0.78x on the r8 closing
bench). Old implementation loaded from a file dump of the pre-refactor
commit (argv[1], default /tmp/graph_r7.py); both variants run over the
SAME eagerly-checkpointed 0.02-threshold near-dup pair table the
neardup_triangles query uses, alternating min-of-7."""
from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubg_data_pipeline_spark.operators import dedup
from pubg_data_pipeline_spark.operators import graph as graph_new
from pubg_data_pipeline_spark.session import get_spark
from pubg_data_pipeline_spark.sources.tables import load_table

old_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graph_r7.py"
spec = importlib.util.spec_from_file_location("graph_r7", old_path)
graph_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(graph_old)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="tri-ab")
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, sf_dir, "documents")
pairs = dedup.ngram_jaccard_pairs(
    docs, "text", "doc_id", shingle_n=3, threshold=0.02, max_doc_freq=8
).localCheckpoint(eager=True)
print("pairs:", pairs.count())

tracker = spark.sparkContext.statusTracker()


def run(tag, fn):
    spark.sparkContext.setJobGroup(tag, tag)
    t0 = time.perf_counter()
    fn(pairs, src="id_a", dst="id_b").write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    jobs = len(tracker.getJobIdsForGroup(tag) or [])
    spark.sparkContext.setJobGroup(None, None)
    return dt, jobs


for fn in (graph_old.triangles, graph_new.triangles):
    run("warm", fn)
    run("warm2", fn)

N = 7
olds, news = [], []
for i in range(N):
    dt_o, j_o = run(f"old{i}", graph_old.triangles)
    dt_n, j_n = run(f"new{i}", graph_new.triangles)
    olds.append(dt_o)
    news.append(dt_n)
    print(f"pass {i}: old {dt_o:.3f}s ({j_o} jobs)  new {dt_n:.3f}s ({j_n} jobs)")

olds.sort(), news.sort()
print(f"old min={olds[0]:.3f} med={olds[N // 2]:.3f}")
print(f"new min={news[0]:.3f} med={news[N // 2]:.3f}")
print(f"ratio med old/new = {olds[N // 2] / news[N // 2]:.2f}x")

old_rows = sorted(
    tuple(r) for r in graph_old.triangles(pairs, src="id_a", dst="id_b").collect()
)
new_rows = sorted(
    tuple(r) for r in graph_new.triangles(pairs, src="id_a", dst="id_b").collect()
)
print("rows equal:", old_rows == new_rows, "n:", len(new_rows))
spark.stop()
