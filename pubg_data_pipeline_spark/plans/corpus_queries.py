"""Corpus-level curation queries, round 2 of the LLM-training-data
surface (complements plans/curation_queries.py, which covers splits,
sampling, packing, contamination, and repetition metrics).

This batch adds the corpus-GLOBAL operations of a dataset build:
vocabulary statistics (the canonical word-count-at-scale), temperature-
weighted source mixing (the how-much-of-each-source decision), and
duplicated-span removal (Dolma/RefinedWeb-style paragraph dedup across
the whole corpus, not just whole-document dedup). All content-derived,
RNG-free, and exactly mirrored by a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.plans.base import QuerySpec
from pubg_data_pipeline_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents spread across the session parallelism (single-row-group
    synthetic parquet; see llm_queries._docs)."""
    df = load_table(spark, sf_dir, "documents")
    return df.repartition(spark.sparkContext.defaultParallelism, "doc_id")


def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary table: top-50 terms by total occurrence count,
    with document frequency — the tokenizer-training / stopword-mining
    statistic of a corpus build (and the canonical word-count shape).

    Scale: explode fuses into the scan; the aggregate is hash-partial
    map-side so the shuffle carries one row per (partition, token), not
    one per occurrence. countDistinct(doc_id) plans as a two-phase
    expand+agg; the final top-50 is TakeOrderedAndProject (never a
    global sort). Tie-break on the token keeps cross-engine order
    deterministic."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(50)
    )


_VOCAB_SQL = r"""
WITH t AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
)
SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS doc_freq
FROM t GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT 50
"""


def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing: each source's sampling weight is
    count^alpha (alpha=0.7) normalized over all sources — the standard
    up-weighting of small high-quality sources when assembling a
    pretraining mixture. Output: per-source doc count, mixture weight,
    and expected docs under a 10k-document budget.

    Scale: one corpus-wide count aggregate reduces to |sources| rows;
    the normalizing total is a window over that tiny post-agg frame (a
    deliberate single-partition window over dimension-sized data, never
    over the corpus). Per-row pow() is IEEE-deterministic; outputs are
    rounded per base.py's determinism rules."""
    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w_raw = F.pow(F.col("n_docs").cast("double"), F.lit(0.7))
    total = F.sum(w_raw).over(Window.partitionBy())
    return counts.select(
        "source",
        "n_docs",
        F.round(w_raw / total, 6).alias("mix_weight"),
        F.round(w_raw / total * 10000, 0).cast("long").alias("expected_docs"),
    )


_MIXTURE_SQL = """
WITH c AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
)
SELECT source, n_docs,
       ROUND(pow(n_docs, 0.7) / SUM(pow(n_docs, 0.7)) OVER (), 6) AS mix_weight,
       CAST(ROUND(pow(n_docs, 0.7) / SUM(pow(n_docs, 0.7)) OVER () * 10000, 0)
            AS BIGINT) AS expected_docs
FROM c
"""


def paragraph_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span removal across the corpus (Dolma/RefinedWeb
    paragraph dedup): each document's token stream is cut into
    non-overlapping 20-token blocks ("paragraphs" — the synthetic corpus
    has no newlines), every block is fingerprinted, and only the
    globally FIRST occurrence of each block (min (doc_id, block_idx))
    survives. Output: per-document block counts and the kept fraction —
    the span-level dedup rate report of a corpus build.

    Scale: block explosion fuses into the scan (no shuffle); the keeper
    decision is one row_number window partitioned by block hash — a
    single shuffle on the fingerprint, exactly the exact-dedup plan
    shape, then a per-doc re-aggregate. No join-back, no second corpus
    scan."""
    block = 20
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks")
    )
    idx = docs.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.greatest(
                    F.ceil(F.size("toks") / F.lit(block)) - 1,
                    F.lit(0).cast("bigint"),
                ),
            )
        ).alias("block_idx"),
    )
    piece = F.slice(F.col("toks"), F.col("block_idx") * block + 1, block)
    blocks = idx.select(
        "doc_id", "block_idx", F.md5(F.array_join(piece, " ")).alias("bh")
    )
    w = Window.partitionBy("bh").orderBy("doc_id", "block_idx")
    flagged = blocks.withColumn(
        "kept", (F.row_number().over(w) == 1).cast("int")
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_blocks"),
        F.sum("kept").cast("int").alias("n_kept"),
        F.round(F.sum("kept") / F.count(F.lit(1)), 6).alias("kept_frac"),
    )


_BLOCK_DEDUP_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS arr
  FROM documents
), idx AS (
  SELECT doc_id, arr,
         unnest(generate_series(0,
           GREATEST(CAST(CEIL(len(arr) / 20.0) AS BIGINT) - 1, 0))) AS block_idx
  FROM toks
), b AS (
  SELECT doc_id, block_idx,
         md5(array_to_string(arr[(block_idx * 20 + 1):(block_idx * 20 + 20)], ' ')) AS bh
  FROM idx
), r AS (
  SELECT doc_id,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY bh ORDER BY doc_id, block_idx) = 1
              THEN 1 ELSE 0 END AS kept
  FROM b
)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_blocks,
       CAST(SUM(kept) AS INT) AS n_kept,
       ROUND(SUM(kept) * 1.0 / COUNT(*), 6) AS kept_frac
FROM r GROUP BY doc_id
"""


SPECS = [
    QuerySpec("corpus_vocabulary", corpus_vocabulary, _VOCAB_SQL, ("curation", "text")),
    QuerySpec(
        "source_mixture_weights", source_mixture_weights, _MIXTURE_SQL, ("curation",)
    ),
    QuerySpec(
        "paragraph_block_dedup", paragraph_block_dedup, _BLOCK_DEDUP_SQL, ("curation", "dedup")
    ),
]
