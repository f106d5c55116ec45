"""Incremental top-k similarity maintenance: per-batch top-k merged
across epochs must equal brute force over the full corpus, and the
streaming twin maintains the state table across micro-batches."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import similarity
from pubg_data_pipeline_spark.streaming import app


def _vecs(spark, ids):
    rows = [
        (i, [math.sin(i * 0.7 + d) for d in range(8)]) for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _norm(rows):
    return sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in rows)


def test_merged_batch_topk_equals_full_scan(spark):
    corpus = _vecs(spark, range(60))
    queries = _vecs(spark, [100, 101])
    full = similarity.brute_force_top_k(corpus, queries, k=5, round_digits=6)

    parts = [
        similarity.brute_force_top_k(
            _vecs(spark, range(lo, lo + 20)), queries, k=5, round_digits=6
        )
        for lo in (0, 20, 40)
    ]
    merged = similarity.merge_topk_states(*parts, k=5)
    assert _norm(merged.collect()) == _norm(full.collect())


def test_streaming_topk_state_across_epochs(spark, tmp_path):
    queries = _vecs(spark, [100])
    state = tmp_path / "topk"

    # epoch 0: first 20 vectors; epoch 1: 40 more — state must end
    # identical to a full-corpus scan
    app.topk_search_epoch(_vecs(spark, range(20)), 0, queries, str(state), k=5)
    first = spark.read.parquet(str(state))
    assert first.count() == 5
    app.topk_search_epoch(_vecs(spark, range(20, 60)), 1, queries, str(state), k=5)

    got = spark.read.parquet(str(state))
    full = similarity.brute_force_top_k(_vecs(spark, range(60)), queries, k=5, round_digits=6)
    assert _norm(got.collect()) == _norm(full.collect())

    # replaying an epoch with the same batch leaves the state unchanged
    before = _norm(got.collect())
    app.topk_search_epoch(_vecs(spark, range(20, 60)), 1, queries, str(state), k=5)
    assert _norm(spark.read.parquet(str(state)).collect()) == before


def test_streaming_topk_query_end_to_end(spark, tmp_path):
    import json

    src = tmp_path / "stream"
    src.mkdir()
    rows = [
        {"vec_id": i, "embedding": [math.sin(i * 0.7 + d) for d in range(8)]}
        for i in range(30)
    ]
    (src / "b.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("vec_id long, embedding array<double>").json(str(src))
    q = app.streaming_topk_search(
        stream,
        _vecs(spark, [100]),
        str(tmp_path / "state"),
        k=3,
        available_now=True,
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    out = spark.read.parquet(str(tmp_path / "state"))
    assert out.count() == 3
    assert {r["rank"] for r in out.collect()} == {1, 2, 3}
