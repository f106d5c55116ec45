#!/usr/bin/env python
"""Count Spark jobs/stages/tasks for ONE noop-sink execution of each
named query — a contention-immune structural metric (wall-clock on this
shared VM swings 3-5x; job and stage counts do not). Queries touching
per-process derived-artifact caches are warmed once first so the
counted execution reflects steady state, exactly like the bench's
timed passes.

Usage: python scripts/count_jobs.py name [name ...]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubg_data_pipeline_spark.plans import all_specs
from pubg_data_pipeline_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="count-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for name in names:  # warm: caches, JIT, Arrow workers
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        before_jobs = set(tracker.getJobIdsForGroup(None) or [])
        sc.setJobGroup(f"count:{name}", name)
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        job_ids = set(tracker.getJobIdsForGroup(f"count:{name}") or [])
        sc.setJobGroup(None, None)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numCompletedTasks
        print(json.dumps({"query": name, "jobs": len(job_ids),
                          "stages_executed": n_stages, "tasks": n_tasks}))
    spark.stop()


if __name__ == "__main__":
    main()
