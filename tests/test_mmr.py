"""MMR rerank: diversification behavior and determinism on a
constructed corpus where plain top-k returns near-copies."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.functions.vectors import as_double_vec, cosine
from pubg_data_pipeline_spark.operators import similarity


@pytest.fixture(scope="module")
def clustered_emb(spark):
    # query vec_id=0 at e1. ids 1-3: one near-copy block, rel ~0.95,
    # mutual sim ~1.0. ids 4-5: a second block at rel ~0.90 but only
    # ~0.72 similar to the first block (opposite e2 component), so at
    # lambda=0.7 the diversity penalty flips the second pick to it
    # (0.7*0.90 - 0.3*0.72 = 0.414 > 0.7*0.95 - 0.3*1.0 = 0.365).
    # id 6 is orthogonal: diverse but irrelevant, never picked.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.95, 0.312, 0.0, 0.0]),
        (2, [0.95, 0.3121, 0.0, 0.0]),
        (3, [0.95, 0.3122, 0.0, 0.0]),
        (4, [0.9, -0.436, 0.0, 0.0]),
        (5, [0.9, -0.4361, 0.0, 0.0]),
        (6, [0.0, 0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _pairs(spark, emb):
    top = similarity.brute_force_top_k(
        emb, emb.filter(F.col("vec_id") == 0), k=6, round_digits=6
    )
    cand = top.select(
        "query_id", F.col("neighbor_id").alias("cid"), F.col("cos_sim").alias("rel")
    )
    vecs = emb.select(
        F.col("vec_id").alias("cid"), as_double_vec(F.col("embedding")).alias("cv")
    )
    cv = cand.join(vecs, "cid")
    other = cv.select(F.col("cid").alias("b"), F.col("cv").alias("bv"))
    return cv.join(F.broadcast(other), F.col("cid") != F.col("b")).select(
        "query_id", "cid", "rel", "b",
        F.round(cosine(F.col("cv"), F.col("bv")), 6).alias("s"),
    )


def test_mmr_breaks_up_near_copy_block(spark, clustered_emb):
    pairs = _pairs(spark, clustered_emb)
    out = {
        r["mmr_rank"]: r["vec_id"]
        for r in similarity.mmr_rerank(pairs, lam=0.7, k=3).collect()
    }
    # rank 1 is the most relevant (a near-copy of the query)
    assert out[1] == 1
    # plain top-3 would be {1, 2, 3}; MMR must pull in the e2 cluster
    picked = set(out.values())
    assert picked & {4, 5}, f"no diversity pick in {picked}"
    # and not take all three near-copies
    assert not {1, 2, 3} <= picked


def test_mmr_is_deterministic_across_runs(spark, clustered_emb):
    pairs = _pairs(spark, clustered_emb)
    a = sorted(map(tuple, similarity.mmr_rerank(pairs, k=4).collect()))
    b = sorted(map(tuple, similarity.mmr_rerank(pairs, k=4).collect()))
    assert a == b


def test_mmr_k_exceeding_candidates_returns_all(spark, clustered_emb):
    pairs = _pairs(spark, clustered_emb)
    out = similarity.mmr_rerank(pairs, k=50).collect()
    assert len(out) == 6  # 6 candidates, ranks 1..6
    assert sorted(r["mmr_rank"] for r in out) == list(range(1, 7))


def test_mmr_single_candidate_still_ranks(spark):
    # a 1-candidate shortlist arrives as one row with b NULL (left
    # join); it must rank 1, not vanish from the grouped rerank
    pairs = spark.createDataFrame(
        [(0, 42, 0.9, None, None)],
        "query_id long, cid long, rel double, b long, s double",
    )
    out = similarity.mmr_rerank(pairs, lam=0.7, k=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["vec_id"], r["mmr_rank"]) == (42, 1)
    assert abs(r["mmr_score"] - 0.7 * 0.9) < 1e-12


def test_mmr_pruned_pairs_treated_as_diverse(spark):
    # caller pruned the (2 -> 1) sim row: scoring 2 after selecting 1
    # must treat the missing pair as sim 0, not raise KeyError
    pairs = spark.createDataFrame(
        [(0, 1, 0.9, 2, 0.5), (0, 2, 0.8, None, None)],
        "query_id long, cid long, rel double, b long, s double",
    )
    out = {r["mmr_rank"]: r for r in similarity.mmr_rerank(pairs, k=2).collect()}
    assert out[1]["vec_id"] == 1
    assert out[2]["vec_id"] == 2
    assert abs(out[2]["mmr_score"] - 0.7 * 0.8) < 1e-12  # diversity term 0
