"""End-to-end retrieval-indexing composition: documents -> overlapping
chunks -> deterministic fake embeddings -> persisted cell-partitioned
IVF index -> top-k query serving. Each stage is individually
oracle/property-tested elsewhere; this pins that they COMPOSE — the
chunk ids survive indexing, the planted nearest chunk comes back
first, and serving agrees with the exact brute-force scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import similarity

DIM = 8


def _fake_embed(df, id_col, text_col):
    """Deterministic text embedding: 8 bucket-hash token-count features,
    L2-normalizable, engine-side (no UDF) — similar texts (shared
    tokens) get similar vectors."""
    toks = df.select(
        id_col, F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("t")
    )
    bucket = F.pmod(F.xxhash64("t"), F.lit(DIM))
    counts = toks.groupBy(id_col, bucket.alias("b")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    vec = counts.groupBy(id_col).agg(
        F.array(
            *[
                F.coalesce(
                    F.max(F.when(F.col("b") == i, F.col("c"))), F.lit(0.0)
                ).cast("float")
                for i in range(DIM)
            ]
        ).alias("embedding")
    )
    return vec


def test_chunk_embed_index_query_composes(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle join " * 30),
            (2, "window aggregate sort " * 30),
            (3, "parquet scan filter " * 30),
            (4, "spark shuffle join partition " * 30),  # near doc 1
        ],
        "doc_id long, text string",
    )
    # chunk: 10-token windows, stride 8 (engine-side expressions)
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("arr")
    )
    chunks = (
        toks.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor(F.greatest((F.size("arr") - 10), F.lit(0)) / 8).cast("int"),
                )
            ).alias("ci"),
            "arr",
        )
        .select(
            (F.col("doc_id") * 1000 + F.col("ci")).alias("chunk_id"),
            F.array_join(
                F.slice("arr", (F.col("ci") * 8 + 1).cast("int"), 10), " "
            ).alias("chunk_text"),
        )
    )
    corpus = _fake_embed(chunks, "chunk_id", "chunk_text")
    assert corpus.count() > 8  # chunking really expanded

    idx_path = str(tmp_path / "ivf_idx")
    similarity.write_ivf_index(
        corpus, idx_path, id_col="chunk_id", vec_col="embedding", nlist=4
    )

    query = _fake_embed(
        spark.createDataFrame(
            [(99, "spark shuffle join speed")], "doc_id long, text string"
        ),
        "doc_id",
        "text",
    ).withColumnRenamed("doc_id", "chunk_id")
    served = similarity.ivf_index_top_k(
        spark, idx_path, query, id_col="chunk_id", vec_col="embedding", k=5, nprobe=4
    ).collect()
    assert len(served) == 5
    # nearest chunks must come from the spark-shuffle-join docs (1 or 4)
    top = sorted(served, key=lambda r: r["rank"])[0]
    assert top["neighbor_id"] // 1000 in (1, 4), top

    # nprobe == nlist degenerates to exact: must agree with brute force
    exact = similarity.brute_force_top_k(
        corpus, query, id_col="chunk_id", vec_col="embedding", k=5
    ).collect()
    assert {r["neighbor_id"] for r in served} == {r["neighbor_id"] for r in exact}
