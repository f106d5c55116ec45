#!/usr/bin/env python
"""Interleaved A/B: lazy localCheckpoint of doc_bigram_ppl_filter's
per-doc `scored` frame (referenced twice: median scalar + final
select), halving the train+score LM pipeline. Row-identity checked.
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


def variant(spark, sf_dir):
    k = 0.5
    docs = load_table(spark, sf_dir, "documents")
    arr = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    tokened = docs.select("doc_id", arr.alias("arr")).filter(F.size("arr") > 1)
    train = tokened.filter(F.col("doc_id") % 5 < 2)
    score = tokened.filter(F.col("doc_id") % 5 >= 2)

    def bigrams(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(arr, 1, size(arr) - 1)"),
                    F.expr("slice(arr, 2, size(arr) - 1)"),
                )
            ).alias("b"),
        ).select("doc_id", F.col("b.0").alias("w1"), F.col("b.1").alias("w2"))

    train_bi = bigrams(train)
    bi_c = train_bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx_c = train_bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = (
        train.select(F.explode("arr").alias("w"))
        .agg((F.count_distinct("w") + 1).alias("v"))
    )
    logp = F.log(
        (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.col("v"))
    )
    scored = (
        bigrams(score)
        .join(bi_c, ["w1", "w2"], "left")
        .join(ctx_c, ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum(logp).alias("__lp"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("__lp") / F.col("n_bigrams"), 4).alias("avg_logprob"),
            F.round(F.exp(-F.col("__lp") / F.col("n_bigrams")), 2).alias("bigram_ppl"),
        )
    ).localCheckpoint(eager=False)
    med = scored.agg(F.expr("percentile(bigram_ppl, 0.5)").alias("__m"))
    return scored.crossJoin(F.broadcast(med)).select(
        "doc_id",
        "n_bigrams",
        "avg_logprob",
        "bigram_ppl",
        F.when(F.col("bigram_ppl") <= F.col("__m"), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("TIME_PASSES", "5"))
    spark = get_spark(app_name="probe-scored-ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    name = "doc_bigram_ppl_filter"
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
