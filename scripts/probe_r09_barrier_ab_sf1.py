#!/usr/bin/env python
"""VERDICT #5: re-probe the adopted materialize-once barriers at the
sf1 leg (sf0.1 hit its measurement floor — 8-core ~= 32-core totals).

A/B per query, interleaved min-of-N in one session: "off" monkeypatches
operators.ckpt.barrier to identity (the duplicated-subtree plan the
barrier exists to prevent), "on" is the current code. Queries cover
every adopted barrier site family: shingle posting (ngram pairs),
PPJoin sized (prefix pairs), scored (bigram ppl), token projections
(budget sample / window packing), per-part aggregate (important_stock),
rfm tiles."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubg_data_pipeline_spark.operators import ckpt
from pubg_data_pipeline_spark.plans import all_specs
from pubg_data_pipeline_spark.session import get_spark

QUERIES = [
    "doc_ngram_jaccard_pairs",
    "doc_prefix_jaccard_pairs",
    "doc_bigram_ppl_filter",
    "quality_token_budget_sample",
    "context_window_packing",
    "important_stock",
    "rfm_segments",
]

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sf1probe/sf1")
passes = int(os.environ.get("TIME_PASSES", "5"))
spark = get_spark(app_name="barrier-ab-sf1")
spark.sparkContext.setLogLevel("ERROR")
specs = all_specs()

real_barrier = ckpt.barrier


def no_barrier(df, site, eager=False):  # noqa: ARG001 - signature match
    return df


def run(name):
    t0 = time.perf_counter()
    specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


import pubg_data_pipeline_spark.operators.dedup as dedup_mod
import pubg_data_pipeline_spark.plans.behavior_queries as behavior_mod
import pubg_data_pipeline_spark.plans.curation_queries as curation_mod
import pubg_data_pipeline_spark.plans.llm_queries as llm_mod
import pubg_data_pipeline_spark.plans.tpch_queries as tpch_mod

MODS = (dedup_mod, behavior_mod, curation_mod, llm_mod, tpch_mod)


def set_barrier(fn):
    for m in MODS:
        m.barrier = fn


for name in QUERIES:
    # warm both variants
    for fn in (no_barrier, real_barrier):
        set_barrier(fn)
        try:
            run(name)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: warm error {type(exc).__name__}: {exc}"[:200])
    offs, ons = [], []
    for _ in range(passes):
        set_barrier(no_barrier)
        offs.append(run(name))
        set_barrier(real_barrier)
        ons.append(run(name))
    offs.sort(), ons.sort()
    print(
        f"{name}: OFF min={offs[0]:.3f} med={offs[passes // 2]:.3f} | "
        f"ON min={ons[0]:.3f} med={ons[passes // 2]:.3f} | "
        f"med speedup {offs[passes // 2] / ons[passes // 2]:.2f}x"
    )

set_barrier(real_barrier)
spark.stop()
