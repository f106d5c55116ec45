#!/usr/bin/env python
"""Interleaved A/B for prefix_filtered_jaccard_pairs: lazy
localCheckpoint of the `sized` ordered-prefix table (computed once,
read by prefix and probe legs) vs the current duplicated-subtree form.
The round's earlier rejection used an EAGER checkpoint + round-robin
repartition (an explicit job barrier); the lazy form has no extra
action. Row-identity checked.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import dedup
from pubg_data_pipeline_spark.plans import all_specs
from pubg_data_pipeline_spark.session import get_spark


def prefix_pairs_ckpt(df, text_col, id_col, shingle_n, threshold, shingles):
    sh = shingles
    exploded = sh.select("__id", F.explode("__sh").alias("shingle"))
    doc_freq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    ordered = (
        exploded.join(doc_freq, "shingle")
        .groupBy("__id")
        .agg(F.array_sort(F.collect_list(F.struct("__df", "shingle"))).alias("__ord"))
    )
    n = F.size("__ord")
    sized = ordered.select(
        "__id",
        "__ord",
        n.alias("__n"),
        (n - F.ceil(F.lit(threshold) * n) + 1).cast("int").alias("__plen"),
    ).localCheckpoint(eager=False)
    prefix = sized.select(
        F.col("__id").alias("__pid"),
        F.col("__n").alias("__n_p"),
        "__plen",
        F.explode(F.slice("__ord", 1, F.col("__plen"))).alias("__p"),
    ).select("__pid", "__n_p", "__plen", F.col("__p.shingle").alias("shingle"))
    probe = sized.select(
        F.col("__id").alias("__qid"),
        F.col("__n").alias("__n_q"),
        F.explode("__ord").alias("__q"),
    ).select("__qid", "__n_q", F.col("__q.shingle").alias("shingle"))
    min_overlap = F.lit(threshold / (1.0 + threshold)) * (F.col("__n_p") + F.col("__n_q"))
    candidates = (
        prefix.join(probe, "shingle")
        .filter(F.col("__pid") < F.col("__qid"))
        .filter(
            F.least("__n_p", "__n_q")
            >= F.lit(threshold) * F.greatest("__n_p", "__n_q") - F.lit(1e-9)
        )
        .groupBy("__pid", "__qid", "__n_p", "__n_q", "__plen")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(
            F.col("__c") + (F.col("__n_p") - F.col("__plen")) >= min_overlap - F.lit(1e-9)
        )
        .select(F.col("__pid").alias("id_a"), F.col("__qid").alias("id_b"))
    )
    return dedup.jaccard_verify(
        df, candidates, text_col, id_col, shingle_n, threshold, shingles=sh
    )


def variant_query(spark, sf_dir):
    from pubg_data_pipeline_spark.plans.llm_queries import _shingles_cached
    from pubg_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles_cached(spark, sf_dir)
    pairs = prefix_pairs_ckpt(docs, "text", "doc_id", 3, 0.2, sh)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("TIME_PASSES", "5"))
    spark = get_spark(app_name="probe-ppjoin-ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    name = "doc_prefix_jaccard_pairs"
    cur = specs[name].fn
    old_rows = sorted(map(tuple, cur(spark, sf_dir).collect()))
    new_rows = sorted(map(tuple, variant_query(spark, sf_dir).collect()))
    ident = old_rows == new_rows
    ts = {"cur": [], "ckpt": []}
    for i in range(passes):
        order = (("cur", cur), ("ckpt", variant_query)) if i % 2 == 0 else (("ckpt", variant_query), ("cur", cur))
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
