#!/usr/bin/env python
"""A/B a set of SQL confs over named queries (min-of-N noop timings).

Usage: SPARK_CONF_JSON='{"spark.x":"y"}' python scripts/conf_probe.py q1 q2
Builds ONE session, times with confs OFF then ON (runtime-settable
confs only), printing per-query min for both. Order (off,on,off,on)
per pass interleaved to decorrelate host noise.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubg_data_pipeline_spark.plans import all_specs
from pubg_data_pipeline_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    confs = json.loads(os.environ["SPARK_CONF_JSON"])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("TIME_PASSES", "3"))
    spark = get_spark(app_name="conf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    base = {k: spark.conf.get(k, None) for k in confs}
    warm_dir = sf_dir.rsplit("sf", 1)[0] + "sf0.001"
    for name in names:
        specs[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for _ in range(passes):
        for mode in ("off", "on"):
            for k, v in (confs if mode == "on" else base).items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            for name in names:
                t0 = time.perf_counter()
                specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
                results[name][mode] = min(results[name].get(mode, el), el)
    for name in names:
        r = results[name]
        print(json.dumps({"query": name, "off": round(r["off"], 3), "on": round(r["on"], 3),
                          "ratio": round(r["on"] / r["off"], 3)}))
    tot_off = sum(r["off"] for r in results.values())
    tot_on = sum(r["on"] for r in results.values())
    print(json.dumps({"total_off": round(tot_off, 3), "total_on": round(tot_on, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
