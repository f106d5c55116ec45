#!/usr/bin/env python
"""Interleaved A/B: materializing the heavy scored projection once
before global_prefix_sum (whose plan references its input 3x: bounds
agg, bucket sums, probe) vs the current re-computed form, for the two
consumers whose upstream projection tokenizes text (token_count /
quality_score). Row-identity checked; min-of-N noop timing.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators.windows import global_prefix_sum
from pubg_data_pipeline_spark.plans import all_specs
from pubg_data_pipeline_spark.session import get_spark


def qtbs_ckpt(spark, sf_dir):
    from pubg_data_pipeline_spark.plans.llm_queries import _docs
    from pubg_data_pipeline_spark.functions.text import token_count, quality_score

    budget = 200_000
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("q"),
    ).localCheckpoint(eager=False)
    scanned = global_prefix_sum(
        docs, F.col("q"), tiebreak="doc_id", value_col="n_tokens",
        n_buckets=64, out_col="cum_tokens",
    )
    kept = scanned.filter(F.col("cum_tokens") <= budget)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("kept_tokens"),
        F.round(F.min("q"), 6).alias("min_quality"),
    )


def cwp_ckpt(spark, sf_dir):
    from pubg_data_pipeline_spark.plans.curation_queries import _CTX_TOKENS
    from pubg_data_pipeline_spark.functions.text import token_count
    from pubg_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    with_tok = docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    ).filter(F.col("n_tok") > 0).localCheckpoint(eager=False)
    scanned = global_prefix_sum(
        with_tok, F.col("doc_id").cast("double"), tiebreak="doc_id",
        value_col="n_tok", n_buckets=64, ascending=True, out_col="cum_tok",
    )
    c = F.lit(_CTX_TOKENS)
    off = (F.col("cum_tok") - F.col("n_tok")).cast("long")
    frag = scanned.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        off.alias("off"),
        F.explode(
            F.sequence(F.floor(off / c), F.floor((off + F.col("n_tok") - 1) / c))
        ).alias("window_id"),
    )
    start = F.greatest(F.lit(0).cast("long"), F.col("window_id") * c - F.col("off"))
    end = F.least(F.col("n_tok"), (F.col("window_id") + 1) * c - F.col("off"))
    return frag.select(
        F.col("window_id").cast("long").alias("window_id"),
        "doc_id",
        start.cast("long").alias("start_tok"),
        end.cast("long").alias("end_tok"),
        (end - start).cast("long").alias("frag_tokens"),
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("TIME_PASSES", "4"))
    spark = get_spark(app_name="probe-prefixsum-ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    cases = [
        ("quality_token_budget_sample", qtbs_ckpt),
        ("context_window_packing", cwp_ckpt),
    ]
    for name, variant_fn in cases:
        cur = specs[name].fn
        old_rows = sorted(map(tuple, cur(spark, sf_dir).collect()))
        new_rows = sorted(map(tuple, variant_fn(spark, sf_dir).collect()))
        ident = old_rows == new_rows
        ts = {"cur": [], "ckpt": []}
        for i in range(passes):
            order = (("cur", cur), ("ckpt", variant_fn)) if i % 2 == 0 else (("ckpt", variant_fn), ("cur", cur))
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
