#!/usr/bin/env python
"""VERDICT #6: SHJ safety evidence at the sf1 leg.

session.py sets spark.sql.join.preferSortMergeJoin=false globally —
justified as a cluster baseline (guide §3.1/§9) but flagged because
the STATIC planner path trusts estimated sizes: a misestimate builds
an oversized hash map with no sort fallback. This probe forces the
estimated-stats regime (AQE OFF, so no runtime re-planning bounds the
choice) on the queries whose static plans flip SMJ->SHJ under the
conf, runs them at sf1 (10x sf0.1), and reports per-stage spill and
peak execution memory from the status API plus completion/parity.

Pass criterion: every query completes, zero memory-related task
failures, zero spill. A hash build that is anywhere near memory
pressure at this scale would show disk/memory spill first."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubg_data_pipeline_spark.plans import all_specs
from pubg_data_pipeline_spark.session import get_spark

QUERIES = [
    "waiting_suppliers",
    "customer_snapshot_diff",
    "doc_hybrid_search",
    "embedding_semantic_dedup",
    "incident_window_purchases",
    "neardup_clustering_coefficients",
]

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sf1probe/sf1")
spark = get_spark(app_name="shj-safety-sf1", extra_conf={"spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.adaptive.enabled", "false")  # estimated-stats path only
specs = all_specs()
sc = spark.sparkContext

for name in QUERIES:
    status = sc.statusTracker()
    sc.setJobGroup(name, name)
    t0 = time.perf_counter()
    try:
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        err = None
    except Exception as exc:  # noqa: BLE001
        err = f"{type(exc).__name__}: {exc}"[:200]
    dt = time.perf_counter() - t0
    jobs = status.getJobIdsForGroup(name) or []
    n_failed = 0
    for jid in jobs:
        ji = status.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = status.getStageInfo(sid)
            if si is not None:
                n_failed += si.numFailedTasks
    # cumulative spill from the UI REST API (localhost; UI enabled in
    # this probe session only)
    import json
    import urllib.request

    app_id = sc.applicationId
    with urllib.request.urlopen(
        f"http://localhost:4040/api/v1/applications/{app_id}/stages"
    ) as resp:
        stages = json.load(resp)
    spill_mem = sum(st.get("memoryBytesSpilled", 0) for st in stages)
    spill_disk = sum(st.get("diskBytesSpilled", 0) for st in stages)
    sc.setJobGroup(None, None)
    print(
        f"{name}: {dt:.2f}s jobs={len(jobs)} failed_tasks={n_failed} "
        f"cum_spill_mem={spill_mem} cum_spill_disk={spill_disk} err={err}"
    )

# which joins actually planned as SHJ under the forced static path
from pyspark.sql import functions as F  # noqa: E402

for name in QUERIES:
    plan = specs[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    kinds = {k: plan.count(k) for k in ("ShuffledHashJoin", "SortMergeJoin", "BroadcastHashJoin")}
    print(f"{name}: {kinds}")
spark.stop()
