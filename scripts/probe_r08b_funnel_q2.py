#!/usr/bin/env python
"""Interleaved A/B: lazy checkpoints of the reused frames in
user_purchase_funnel (views & clicks per-user stage tables, each
referenced twice through the chained stages: 6 events scans -> 3) and
min_cost_supplier (`cand` partsupp join chain referenced by the
correlated-min aggregate AND the detail join: 24 scans -> ~12).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pubg_data_pipeline_spark.plans import all_specs
from pubg_data_pipeline_spark.session import get_spark
from pubg_data_pipeline_spark.sources.tables import load_table


def funnel_ckpt(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint(eager=False)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(views), "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=False)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(clicks), "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .select("user_id")
        .distinct()
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"), F.count(F.lit(1)).alias("n_users")
        )

    return (
        stage("1_view", views)
        .unionAll(stage("2_click_after_view", clicks))
        .unionAll(stage("3_purchase_after_click", purchases))
    )


def q2_ckpt(spark, sf_dir):
    from pubg_data_pipeline_spark.plans.tpch_queries import _partsupp

    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    ps = _partsupp(spark, sf_dir, part_keys=part.select("p_partkey"))
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe_supp = supp.join(
        F.broadcast(nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    cand = ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey).join(
        europe_supp, ps.ps_suppkey == F.col("s_suppkey")
    ).localCheckpoint(eager=False)
    min_cost = cand.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    best = cand.join(
        F.broadcast(min_cost),
        (cand.ps_partkey == min_cost.mk)
        & (cand.ps_supplycost == min_cost.min_cost),
    )
    return (
        best.select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            F.round("ps_supplycost", 2).alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("s_name").asc(), F.col("p_partkey").asc()
        )
        .limit(20)
    )


CASES = [
    ("user_purchase_funnel", funnel_ckpt),
    ("min_cost_supplier", q2_ckpt),
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("TIME_PASSES", "5"))
    spark = get_spark(app_name="probe-funnel-q2-ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    for name, variant in CASES:
        cur = specs[name].fn
        old_rows = sorted(map(tuple, cur(spark, sf_dir).collect()))
        new_rows = sorted(map(tuple, variant(spark, sf_dir).collect()))
        ident = old_rows == new_rows
        ts = {"cur": [], "ckpt": []}
        for i in range(passes):
            order = (("cur", cur), ("ckpt", variant)) if i % 2 == 0 else (("ckpt", variant), ("cur", cur))
            for label, fn in order:
                spark.sparkContext.setJobDescription(f"{label}:{name}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts[label].append(time.perf_counter() - t0)
        print(
            f"{name}: identical={ident} cur_min={min(ts['cur']):.3f} "
            f"ckpt_min={min(ts['ckpt']):.3f} cur_all={[round(t,2) for t in ts['cur']]} "
            f"ckpt_all={[round(t,2) for t in ts['ckpt']]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
