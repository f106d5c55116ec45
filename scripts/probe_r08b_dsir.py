#!/usr/bin/env python
"""Interleaved A/B: doc_importance_weights with ONE cell aggregate
(per-bucket raw + target counts in the same pass, totals summed from
the 64-row cell table) vs the current five token-stream passes.
Arithmetic inputs identical (integer counts), so doubles bit-match.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.plans import all_specs
from pubg_data_pipeline_spark.plans.corpus_queries import _dsir_bucket, _DSIR_BUCKETS
from pubg_data_pipeline_spark.session import get_spark
from pubg_data_pipeline_spark.sources.tables import load_table


def variant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.col("lang"),
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.length("w") > 0)
    b = toks.select("doc_id", "lang", _dsir_bucket(F.col("w")).alias("b"))

    cell = b.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count(F.when(F.col("lang") == "en", F.lit(1))).alias("n_tgt"),
    )
    tot = cell.agg(
        F.sum("n_raw").alias("t_raw"), F.sum("n_tgt").alias("t_tgt")
    )
    probs = cell.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            (F.coalesce(F.col("n_tgt"), F.lit(0)) + F.lit(1.0))
            / (F.col("t_tgt") + F.lit(float(_DSIR_BUCKETS)))
        ).alias("p_tgt"),
        (
            (F.col("n_raw") + F.lit(1.0))
            / (F.col("t_raw") + F.lit(float(_DSIR_BUCKETS)))
        ).alias("p_raw"),
    )
    return (
        b.join(F.broadcast(probs), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log(F.col("p_tgt") / F.col("p_raw"))).alias("__llr"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.round(F.col("__llr") / F.col("n_tokens"), 4) + F.lit(0.0)).alias(
                "avg_llr"
            ),
        )
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("TIME_PASSES", "5"))
    spark = get_spark(app_name="probe-dsir-ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    name = "doc_importance_weights"
    cur = specs[name].fn
    old_rows = sorted(map(tuple, cur(spark, sf_dir).collect()))
    new_rows = sorted(map(tuple, variant(spark, sf_dir).collect()))
    ident = old_rows == new_rows
    ts = {"cur": [], "new": []}
    for i in range(passes):
        order = (("cur", cur), ("new", variant)) if i % 2 == 0 else (("new", variant), ("cur", cur))
        for label, fn in order:
            spark.sparkContext.setJobDescription(f"{label}:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts[label].append(time.perf_counter() - t0)
    print(
        f"{name}: identical={ident} cur_min={min(ts['cur']):.3f} "
        f"new_min={min(ts['new']):.3f} cur_all={[round(t,2) for t in ts['cur']]} "
        f"new_all={[round(t,2) for t in ts['new']]}",
        flush=True,
    )


if __name__ == "__main__":
    main()
