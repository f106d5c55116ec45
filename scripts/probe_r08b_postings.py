#!/usr/bin/env python
"""Interleaved A/B for _shingle_pair_intersections: `posting` (groupBy
shingle + collect_list) is referenced twice (pair-gen + sizes), and AQE
does not reuse the exchange — so the inverted index builds twice.
Variant B derives per-doc sizes straight from `exploded` (one groupBy
on doc — no second collect_list build); variant C lazily checkpoints
`posting`. Tested through both consumers (cached-shingle uncapped +
inline capped).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import dedup
from pubg_data_pipeline_spark.operators.dedup import word_shingles, _spread
from pubg_data_pipeline_spark.plans import all_specs
from pubg_data_pipeline_spark.session import get_spark
from pubg_data_pipeline_spark.sources.tables import load_table


def _intersections_variant(df, text_col, id_col, shingle_n, max_doc_freq,
                           shingles, mode):
    if shingles is not None:
        exploded = shingles.select(
            F.col("__id").alias("doc"), F.explode("__sh").alias("shingle")
        )
    else:
        exploded = _spread(df, id_col).select(
            F.col(id_col).alias("doc"),
            F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
        )
    if max_doc_freq is not None:
        keep = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("shingle")
        )
        exploded = exploded.join(keep, "shingle", "left_semi")
    posting = exploded.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc")).alias("docs")
    )
    if mode == "ckpt":
        posting = posting.localCheckpoint(eager=False)
    if mode == "sizes_from_exploded":
        sizes = exploded.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    else:
        sizes = (
            posting.select(F.explode("docs").alias("doc"))
            .groupBy("doc")
            .agg(F.count(F.lit(1)).alias("n_sh"))
        )
    grouped = posting.filter(F.size("docs") > 1)
    pair_array = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    inter = (
        grouped.select(F.explode(pair_array).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return inter, sizes


def mk_query(name, mode):
    def q(spark, sf_dir):
        from pubg_data_pipeline_spark.plans.llm_queries import _shingles_cached

        docs = load_table(spark, sf_dir, "documents")
        if name == "doc_ngram_jaccard_pairs":
            sh, cap, thr = _shingles_cached(spark, sf_dir), None, 0.05
        else:
            sh, cap, thr = None, 4, 0.05
        inter, sizes = _intersections_variant(
            docs, "text", "doc_id", 3, cap, sh, mode
        )
        pairs = (
            inter.join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
            .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
            .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
            .filter(F.col("jaccard") >= thr)
            .select("id_a", "id_b", "jaccard")
        )
        return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))

    return q


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("TIME_PASSES", "4"))
    spark = get_spark(app_name="probe-postings-ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    for name in ("doc_ngram_jaccard_pairs", "doc_ngram_jaccard_pairs_capped"):
        cur = specs[name].fn
        variants = {"cur": cur}
        for mode in ("sizes_from_exploded", "ckpt"):
            variants[mode] = mk_query(name, mode)
        base_rows = sorted(map(tuple, cur(spark, sf_dir).collect()))
        ident = {
            m: sorted(map(tuple, fn(spark, sf_dir).collect())) == base_rows
            for m, fn in variants.items() if m != "cur"
        }
        ts = {m: [] for m in variants}
        order = list(variants.items())
        for i in range(passes):
            seq = order if i % 2 == 0 else order[::-1]
            for label, fn in seq:
                spark.sparkContext.setJobDescription(f"{label}:{name}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts[label].append(time.perf_counter() - t0)
        summary = " ".join(
            f"{m}_min={min(v):.3f} {m}_all={[round(t,2) for t in v]}" for m, v in ts.items()
        )
        print(f"{name}: identical={ident} {summary}", flush=True)


if __name__ == "__main__":
    main()
