#!/usr/bin/env python
"""Isolated min-of-N noop-sink timing for named queries (guide §1.4).

Usage: python scripts/time_queries.py name [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), TIME_PASSES (3).
Warms each query at sf0.001 first (JIT/codegen/Arrow workers), then
times TIME_PASSES passes at the target SF and prints min/median.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubg_data_pipeline_spark.plans import all_specs
from pubg_data_pipeline_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("TIME_PASSES", "3"))
    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    warm_dir = sf_dir.rsplit("sf", 1)[0] + "sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        try:
            specs[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"query": name, "error": f"warm {type(exc).__name__}: {exc}"[:300]}))
    try:
        spark._jvm.System.gc()
    except Exception:
        pass
    out = {}
    for name in names:
        ts = []
        for i in range(passes):
            spark.sparkContext.setJobDescription(f"time:{name}:{i}")
            t0 = time.perf_counter()
            try:
                specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                print(json.dumps({"query": name, "error": f"{type(exc).__name__}: {exc}"[:300]}))
                break
            ts.append(time.perf_counter() - t0)
        if ts:
            out[name] = {
                "min": round(min(ts), 3),
                "median": round(statistics.median(ts), 3),
                "all": [round(t, 3) for t in ts],
            }
            print(json.dumps({"query": name, **out[name]}))
    print(json.dumps({"total_min": round(sum(v["min"] for v in out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
