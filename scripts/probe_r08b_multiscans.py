#!/usr/bin/env python
"""Interleaved A/B: lazy localCheckpoint of the reused aggregate frame
in three multi-scan queries (AQE in Spark 4.1.2 does NOT reuse the
identical exchange between a broadcast-scalar leg and the main leg —
verified with a minimal repro — so duplicated subtrees really re-scan).

- important_stock: per_part (2 refs: total scalar + filter)
- user_value_gini: peruser (3 refs: range, stats, rank legs)
- part_basket_pairs: baskets (3 refs: pairs, part_orders, n_orders)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.plans import all_specs
from pubg_data_pipeline_spark.session import get_spark
from pubg_data_pipeline_spark.sources.tables import load_table


def important_stock_ckpt(spark, sf_dir):
    from pubg_data_pipeline_spark.plans.tpch_queries import _partsupp
    from pubg_data_pipeline_spark.plans.base import exact_scaled

    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = supp.join(
        F.broadcast(nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    ps = _partsupp(spark, sf_dir, supp_keys=asia_supp)
    value_cents = exact_scaled(F.col("ps_supplycost") * F.col("ps_availqty"), 2)
    scoped = ps.join(asia_supp, ps.ps_suppkey == F.col("s_suppkey")).select(
        "ps_partkey", value_cents.alias("v_cents")
    )
    per_part = (
        scoped.groupBy("ps_partkey")
        .agg(F.sum("v_cents").alias("part_cents"))
        .localCheckpoint(eager=False)
    )
    total = per_part.agg(F.sum("part_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_cents") > F.col("total_cents") * 0.001)
        .select(
            "ps_partkey",
            F.round(F.col("part_cents") / 100.0, 2).alias("stock_value"),
        )
    )


def user_value_gini_ckpt(spark, sf_dir):
    from pyspark.sql import Window
    from pubg_data_pipeline_spark.plans.base import exact_scaled

    ev = load_table(spark, sf_dir, "events")
    peruser = (
        ev.where(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.sum(exact_scaled(F.col("value"))).alias("x"))
        .localCheckpoint(eager=False)
    )
    n_buckets = 32
    rng = peruser.groupBy("event_type").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    bucketed = peruser.join(F.broadcast(rng), "event_type").withColumn(
        "bkt",
        F.when(F.col("mx") == F.col("mn"), F.lit(1)).otherwise(
            F.least(
                F.lit(n_buckets),
                (
                    F.floor(
                        (F.col("x") - F.col("mn"))
                        * n_buckets
                        / (F.col("mx") - F.col("mn") + 1)
                    )
                    + 1
                ).cast("int"),
            )
        ),
    )
    stats = bucketed.groupBy("event_type", "bkt").agg(
        F.count(F.lit(1)).alias("n_b"), F.sum("x").alias("sx")
    )
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offsets = stats.withColumn("off", F.sum("n_b").over(w_off) - F.col("n_b"))
    w_local = Window.partitionBy("event_type", "bkt").orderBy(
        F.col("x").asc(), F.col("user_id").asc()
    )
    per_bucket = (
        bucketed.withColumn("i", F.row_number().over(w_local))
        .groupBy("event_type", "bkt")
        .agg(
            F.sum(
                F.col("i").cast("decimal(12,0)") * F.col("x").cast("decimal(25,0)")
            ).alias("s1")
        )
    )
    per_type = (
        per_bucket.join(F.broadcast(offsets), ["event_type", "bkt"])
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("s1")
                + F.col("off").cast("decimal(12,0)")
                * F.col("sx").cast("decimal(25,0)")
            ).alias("s"),
            F.sum("n_b").alias("n_users"),
            F.sum("sx").alias("t"),
        )
    )
    gini = F.when(
        (F.col("t") > 0) & (F.col("n_users") > 0),
        F.round(
            2.0 * F.col("s").cast("double")
            / (F.col("n_users").cast("double") * F.col("t").cast("double"))
            - (F.col("n_users") + 1.0) / F.col("n_users"),
            6,
        ),
    )
    return per_type.select("event_type", "n_users", gini.alias("gini"))


def part_basket_pairs_ckpt(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .localCheckpoint(eager=False)
    )
    pair_structs = F.expr(
        "flatten(transform(parts, (x, i) -> "
        "transform(slice(parts, i + 2, size(parts)), "
        "y -> struct(x AS part_a, y AS part_b))))"
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    part_orders = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_orders_part"))
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    enriched = (
        pairs.join(
            F.broadcast(part_orders.select(F.col("l_partkey").alias("part_a"),
                                           F.col("n_orders_part").alias("cnt_a"))),
            "part_a",
        )
        .join(
            F.broadcast(part_orders.select(F.col("l_partkey").alias("part_b"),
                                           F.col("n_orders_part").alias("cnt_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    return (
        enriched.select(
            "part_a",
            "part_b",
            "support",
            F.round(
                F.col("support") * F.col("n_orders")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("support").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(20)
    )


CASES = [
    ("important_stock", important_stock_ckpt),
    ("part_basket_pairs", part_basket_pairs_ckpt),
    ("user_value_gini", user_value_gini_ckpt),
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("TIME_PASSES", "5"))
    only = sys.argv[1:]
    spark = get_spark(app_name="probe-multiscan-ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    for name, variant in CASES:
        if only and name not in only:
            continue
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
