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

from pyspark.sql import Column, DataFrame, SparkSession, Window
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
    ).filter(F.col("token") != "")  # split('') -> [''] — not a vocabulary term
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
FROM t WHERE token <> '' GROUP BY token
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


def doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al., 2023) with a static
    reference-loss proxy: each source's EXCESS LOSS over the corpus
    baseline drives an exponentiated-gradient update of its sampling
    weight — domains the reference model finds harder than average get
    up-weighted, easy/boilerplate domains get down-weighted. The full
    DoReMi loop retrains a proxy model between updates; with a fixed
    reference model the multiplicative-weights iteration collapses to
    its closed one-step form used here:

        α_d ∝ p_d · exp(η · max(0, L_d − L̄)),  then
        α'_d = (1−c) · α_d / Σα + c / K        (uniform smoothing)

    where p_d is the domain's token share (the init distribution),
    L_d its mean per-token negative log-probability under the corpus
    unigram LM (the same oracle-reproducible scorer as
    doc_unigram_logprob), L̄ the corpus mean, η=1, c=0.1, K=#domains.
    Complements source_mixture_weights (temperature mixing by size
    only) with a loss-aware weighting.

    Determinism: L_d and L̄ are rounded to 4dp BEFORE the excess/exp
    (sum-of-ln agg-order noise ~1e-13 — the base.py stddev rule), so
    every softmax numerator is bit-equal across engines; the Σα
    denominator spans only K≈5 rows and lands under 6dp rounding.

    Scale: one vocab aggregate joined back to the token stream on the
    natural key (AQE broadcasts it at runtime when it fits — no static
    hint, since a web-scale vocab exceeds the 8GB broadcast cap), one
    per-source aggregate (K rows), then windows over the K-row frame.
    The token total derives from the vocab aggregate, so the corpus is
    tokenized exactly once. No UDF, no collect."""
    eta, c = 1.0, 0.1
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "source",
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")  # split('') -> [''] — not a real token
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    # n derives from the vocab aggregate — no third corpus tokenization
    # pass just to count rows. No static broadcast hint on the vocab
    # join: a web-scale corpus has billions of distinct tokens (past
    # the 8GB broadcast cap); AQE broadcasts at runtime when the vocab
    # actually fits, else this stays an equi-join on the natural key.
    n = vocab.agg(F.sum("c").alias("n"))
    per_source = (
        toks.join(vocab, "w")
        .crossJoin(F.broadcast(n))
        .groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(-F.log(F.col("c").cast("double") / F.col("n"))).alias("__nll"),
        )
    )
    w_all = Window.partitionBy()
    mean_nll = F.round(F.col("__nll") / F.col("n_tokens"), 4)
    corpus_nll = F.round(F.sum("__nll").over(w_all) / F.sum("n_tokens").over(w_all), 4)
    scored = per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        mean_nll.alias("mean_nll"),
        F.greatest(mean_nll - corpus_nll, F.lit(0.0)).alias("excess_loss"),
        (F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w_all)).alias("__p"),
    )
    alpha = F.col("__p") * F.exp(F.lit(eta) * F.col("excess_loss"))
    k = F.count(F.lit(1)).over(w_all)
    # 0.9 spelled as a LITERAL on both sides: the Python expression
    # `1.0 - 0.1` is one ulp off the double literal `0.9` the SQL
    # oracle parses (the round-4 IEEE-literal lesson).
    weight = F.lit(0.9) * alpha / F.sum(alpha).over(w_all) + F.lit(c) / k
    return scored.select(
        "source",
        "n_docs",
        "n_tokens",
        "mean_nll",
        F.round("excess_loss", 4).alias("excess_loss"),
        F.round(weight, 6).alias("doremi_weight"),
    )


_DOREMI_SQL = r"""
WITH toks0 AS (
  SELECT source, doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents
), toks AS (
  SELECT * FROM toks0 WHERE w <> ''
), vocab AS (
  SELECT w, COUNT(*) AS c FROM toks GROUP BY w
), n AS (
  SELECT SUM(c) AS n FROM vocab
), per_source AS (
  SELECT source, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_tokens,
         SUM(-LN(CAST(c AS DOUBLE) / n.n)) AS nll
  FROM toks JOIN vocab USING (w) CROSS JOIN n
  GROUP BY source
), scored AS (
  SELECT source, n_docs, n_tokens,
         ROUND(nll / n_tokens, 4) AS mean_nll,
         GREATEST(ROUND(nll / n_tokens, 4)
                  - ROUND(SUM(nll) OVER () / SUM(n_tokens) OVER (), 4),
                  0.0) AS excess_loss,
         CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS p
  FROM per_source
)
SELECT source, n_docs, n_tokens, mean_nll,
       ROUND(excess_loss, 4) AS excess_loss,
       ROUND(0.9 * (p * EXP(1.0 * excess_loss))
             / SUM(p * EXP(1.0 * excess_loss)) OVER ()
             + 0.1 / COUNT(*) OVER (), 6) AS doremi_weight
FROM scored
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


def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every pair of sources, how
    many distinct 20-token-block fingerprints appear in BOTH — the
    "is source B just a re-crawl of source A?" diagnostic of a corpus
    build at span granularity (whole-doc fingerprints miss re-crawls
    with edited boilerplate) — plus the Jaccard overlap of the two
    block-fingerprint sets.

    Scale: block explosion fuses into the scan; per-source DISTINCT
    fingerprints first (one shuffle on (source, fp), output ≤ corpus-
    distinct size), then the pair match is an equi-join ON THE
    FINGERPRINT (never a cross join) and the per-source set sizes come
    back via a broadcast join of a |sources|-row aggregate. Skewed
    boilerplate fingerprints surface as hot join keys — AQE skew-split
    handles them; the pair count itself stays |sources|² rows."""
    block = 20
    docs = _docs(spark, sf_dir).select(
        "source", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks")
    )
    idx = docs.select(
        "source",
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
    fps = idx.select(
        "source", F.md5(F.array_join(piece, " ")).alias("fp")
    ).distinct()
    sizes = fps.groupBy("source").agg(F.count(F.lit(1)).alias("n_fp"))
    shared = (
        fps.alias("a")
        .join(
            fps.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(sizes.withColumnRenamed("source", "source_a")
                        .withColumnRenamed("n_fp", "n_fp_a")),
            "source_a",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("source", "source_b")
                        .withColumnRenamed("n_fp", "n_fp_b")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            F.round(
                F.col("n_shared")
                / (F.col("n_fp_a") + F.col("n_fp_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


_OVERLAP_SQL = r"""
WITH toks AS (
  SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS arr
  FROM documents
), idx AS (
  SELECT source, arr,
         unnest(generate_series(0,
           GREATEST(CAST(CEIL(len(arr) / 20.0) AS BIGINT) - 1, 0))) AS block_idx
  FROM toks
), fps AS (
  SELECT DISTINCT source,
         md5(array_to_string(arr[(block_idx * 20 + 1):(block_idx * 20 + 20)], ' ')) AS fp
  FROM idx
), sizes AS (
  SELECT source, COUNT(*) AS n_fp FROM fps GROUP BY source
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT s.source_a, s.source_b, s.n_shared,
       sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
       ROUND(s.n_shared * 1.0 / (sa.n_fp + sb.n_fp - s.n_shared), 6) AS jaccard
FROM shared s
JOIN sizes sa ON sa.source = s.source_a
JOIN sizes sb ON sb.source = s.source_b
"""


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram in power-of-two token buckets — the
    context-length planning statistic of a corpus build (how much data
    fits a 2^k-token window). Bucket index is the binary digit count of
    the token count (floor(log2 n)+1) computed INTEGER-side via
    ``bin()`` string length, never floating log2 (whose last-ulp noise
    flips floor() across engines at exact powers of two).

    Scale: pure map + one hash aggregate to ~30 rows; the shuffle
    carries bucket partials only."""
    docs = _docs(spark, sf_dir)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sized = docs.select(n_tokens.alias("n_tokens"))
    bucket = F.length(F.bin(F.col("n_tokens")))
    agg = (
        sized.select("n_tokens", bucket.alias("b"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    total_docs = F.sum("n_docs").over(Window.partitionBy())
    return agg.select(
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT) - 1)").alias("bucket_lo"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) - CAST(1 AS BIGINT)").alias("bucket_hi"),
        "n_docs",
        "total_tokens",
        F.round(F.col("n_docs") / total_docs, 6).alias("doc_frac"),
    )


_LENGTH_HIST_SQL = r"""
WITH sized AS (
  SELECT len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
  FROM documents
), b AS (
  SELECT n_tokens, length(bin(n_tokens)) AS b FROM sized
), agg AS (
  SELECT b, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
  FROM b GROUP BY b
)
SELECT CAST((1::BIGINT << (b - 1)) AS BIGINT) AS bucket_lo,
       CAST((1::BIGINT << b) - 1 AS BIGINT) AS bucket_hi,
       n_docs, total_tokens,
       ROUND(n_docs * 1.0 / SUM(n_docs) OVER (), 6) AS doc_frac
FROM agg
"""


def long_doc_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-quantile length filter WITHOUT a driver collect: keep docs
    whose token count reaches the corpus-wide exact P75, report the
    per-source survival rate and the threshold. The reference's z-score
    pipeline collects global stats to the driver and re-embeds them as
    literals (advanced_analytics.py:181-191); this is the lazy
    broadcast-back form of the same global-stat-then-filter shape
    applied to the corpus-curation use case.

    Scale: the quantile is one exact-percentile aggregate to a 1-row
    frame, re-attached by crossJoin(broadcast) — no driver round-trip,
    the plan stays one job. P75 of integers interpolates on quarters
    (x.0/.25/.5/.75 — exactly representable doubles), so the >= filter
    compares identically across engines."""
    docs = _docs(spark, sf_dir)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sized = docs.select("source", n_tokens.alias("n_tokens"))
    thr = sized.agg(F.percentile("n_tokens", 0.75).alias("p75_tokens"))
    return (
        sized.crossJoin(F.broadcast(thr))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("n_tokens") >= F.col("p75_tokens")).cast("int")
            ).alias("n_kept"),
            F.round(
                F.sum((F.col("n_tokens") >= F.col("p75_tokens")).cast("int"))
                / F.count(F.lit(1)),
                6,
            ).alias("kept_frac"),
            F.round(F.first("p75_tokens"), 2).alias("p75_tokens"),
        )
    )


_QUANTILE_FILTER_SQL = r"""
WITH sized AS (
  SELECT source, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
  FROM documents
), thr AS (
  SELECT quantile_cont(n_tokens, 0.75) AS p75_tokens FROM sized
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_tokens >= p75_tokens THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(SUM(CASE WHEN n_tokens >= p75_tokens THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS kept_frac,
       ROUND(ANY_VALUE(p75_tokens), 2) AS p75_tokens
FROM sized CROSS JOIN thr
GROUP BY source
"""


def bigram_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information: bigram and
    unigram counts over the whole corpus, PMI computed from EXACT
    integer counts in one double expression (ln((c12*N1*N1)/(N2*c1*c2))
    — a single division then log, deterministic cross-engine), min
    bigram support 3, top 15 on the rounded score.

    Scale: token/bigram extraction is expression-only (split + slice +
    arrays_zip, JVM-side), the two counts are ordinary partial-agg
    groupBys, and the scalar totals join back via broadcast — linear
    in corpus tokens, no Python, no collect."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    # trim(text) != '' (not size(arr) > 0, which is vacuously true):
    # split('') yields [''], whose phantom '' unigram inflates N1
    tokened = docs.filter(F.trim(F.col("text")) != "").select(toks.alias("arr"))
    uni = (
        tokened.select(F.explode("arr").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n1 = uni.agg(F.sum("c").alias("n1"))
    bi = (
        tokened.select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(arr, 1, size(arr) - 1)"),
                    F.expr("slice(arr, 2, size(arr) - 1)"),
                )
            ).alias("b")
        )
        .select(F.col("b.0").alias("w1"), F.col("b.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    n2 = bi.agg(F.sum("c12").alias("n2"))
    scored = (
        bi.filter(F.col("c12") >= 3)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1",
            "w2",
            "c12",
            # cast to double BEFORE multiplying: n1² alone is ~4e14 at
            # a 20M-token corpus, so the integer product c12*n1*n1
            # would silently wrap long; the double product is exact
            # here (inputs < 2^53) and overflow-free, and the
            # left-assoc multiply order matches the oracle bit-for-bit
            F.round(
                F.log(
                    (
                        F.col("c12").cast("double")
                        * F.col("n1").cast("double")
                        * F.col("n1").cast("double")
                    )
                    / (
                        F.col("n2").cast("double")
                        * F.col("c1").cast("double")
                        * F.col("c2").cast("double")
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(15)


_PMI_SQL = r"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS arr
  FROM documents WHERE trim(text) <> ''
), uni AS (
  SELECT w, COUNT(*) AS c FROM (SELECT unnest(arr) AS w FROM toks) GROUP BY 1
), n1 AS (
  SELECT SUM(c) AS n1 FROM uni
), bi AS (
  SELECT u['w1'] AS w1, u['w2'] AS w2, COUNT(*) AS c12 FROM (
    SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
                                 i -> {'w1': arr[i], 'w2': arr[i+1]})) AS u
    FROM toks
  ) GROUP BY 1, 2
), n2 AS (
  SELECT SUM(c12) AS n2 FROM bi
)
SELECT w1, w2, c12,
       ROUND(LN((CAST(c12 AS DOUBLE) * CAST(n1.n1 AS DOUBLE) * CAST(n1.n1 AS DOUBLE))
                / (CAST(n2.n2 AS DOUBLE) * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 4) AS pmi
FROM bi
JOIN uni u1 ON u1.w = bi.w1
JOIN uni u2 ON u2.w = bi.w2
CROSS JOIN n1 CROSS JOIN n2
WHERE c12 >= 3
ORDER BY pmi DESC, w1, w2
LIMIT 15
"""


def token_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index slice: per token with document
    frequency >= 5, the df and the first 10 posting-list doc ids
    (sorted, joined) — the bounded-payload form of an index build.

    Scale shape: ONE shuffle on the token, then df and the 10 smallest
    doc ids both come from window functions over the sorted partition
    — a SORT-based pipeline that spills to disk on a stopword token's
    billion-row posting list. The previous collect_set formulation
    held every posting id in an in-memory aggregation array before
    slicing (a stopword = executor OOM; its df >= 5 filter ran AFTER
    aggregation and bounded nothing). The final per-token gather
    touches <= 10 rows and rides the same partitioning, no second
    exchange. (A full posting-list table at 100 TB would instead WRITE
    grouped-sorted parquet via sources/io.write_bucketed_table, same
    plan minus the row_number cap.)"""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    ex = docs.select("doc_id", F.explode(toks).alias("token"))
    w_all = Window.partitionBy("token")
    w_ord = Window.partitionBy("token").orderBy("doc_id")
    top = (
        ex.withColumn("df", F.count(F.lit(1)).over(w_all))
        .withColumn("__rn", F.row_number().over(w_ord))
        .filter((F.col("__rn") <= 10) & (F.col("df") >= 5))
    )
    return top.groupBy("token", "df").agg(
        F.expr(
            "concat_ws(',', transform(sort_array(collect_list(doc_id)),"
            " x -> cast(x as string)))"
        ).alias("sample_docs")
    )


_POSTING_SQL = r"""
WITH ex AS (
  SELECT DISTINCT doc_id, unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS token
  FROM documents
)
SELECT token, COUNT(*) AS df,
       array_to_string(list_sort(list(doc_id))[1:10], ',') AS sample_docs
FROM ex GROUP BY token
HAVING COUNT(*) >= 5
"""


# -------------------------------------------------- BM25 retrieval

_BM25_TERMS = ("spark", "window", "join")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_term_scores(docs: DataFrame) -> DataFrame:
    """Shared BM25 per-(term, doc) scorer — the ONE place the formula
    lives, consumed by both the shipped ranker (doc_bm25_search) and
    its eval harness (retrieval_eval_bm25), so a formula change cannot
    make the eval silently measure a different ranker than the one
    serving. Emits (term, doc_id, tf, term_score-unrounded); tokens
    are filtered to the query terms BEFORE any aggregation.
    Lucene-style IDF: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    from pubg_data_pipeline_spark.functions.text import token_count, word_tokens

    dl = docs.select("doc_id", token_count(F.col("text")).alias("dl"))
    toks = docs.select(
        "doc_id", F.explode(word_tokens(F.lower(F.col("text")))).alias("term")
    ).filter(F.col("term").isin(*_BM25_TERMS))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    return (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .select("term", "doc_id", "tf", "term_score")
    )


def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed keyword query — the relevance
    scoring a corpus-curation pipeline uses to pull topic-matched
    training documents (and the engine-side form of full-text search
    the reference's dashboards lack entirely).

    Scale shape: tokens are FILTERED to the query terms before any
    aggregation (the per-(doc,term) tf agg sees only matching tokens,
    not the corpus vocabulary), document-frequency and corpus stats
    are tiny aggregates broadcast back, and the final top-20 is a
    TakeOrderedAndProject on the rounded score with doc_id tie-break.
    Lucene-style IDF: ln(1 + (N - df + 0.5)/(df + 0.5)).
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = _bm25_term_scores(docs)
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# Shared CTE chain for every BM25 SQL oracle — one copy of the formula
# (mirrors _bm25_term_scores; bm25_scored emits term, doc_id, tf and
# the UNROUNDED per-term score).
_BM25_CTES_SQL = f"""dl AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS dl
  FROM documents
), toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN {_BM25_TERMS!r}
  GROUP BY 1, 2
), df_t AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
), bm25_scored AS (
  SELECT tf.term, tf.doc_id, tf.tf,
         ln(1.0 + (stats.n_docs - df_t.df + 0.5) / (df_t.df + 0.5))
         * (tf.tf * ({_BM25_K1} + 1.0))
         / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
           AS term_score
  FROM tf JOIN df_t USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
)"""

_BM25_SQL = f"""
WITH {_BM25_CTES_SQL}
SELECT doc_id, ROUND(SUM(term_score), 4) AS bm25
FROM bm25_scored GROUP BY 1
ORDER BY bm25 DESC, doc_id ASC LIMIT 20
"""


def retrieval_eval_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the BM25 ranker: per query term,
    MRR and NDCG@10 against a graded relevance oracle — the acceptance
    metrics a RAG/search pipeline gates an index or scorer change on
    (the eval-harness sibling of embedding_ann_recall, for the lexical
    leg). The synthetic corpus has no human judgments, so graded
    relevance is proxied deterministically: a document is relevant to
    a term iff it contains it at least twice, with gain = min(tf, 3) —
    the eval MACHINERY (rank windows, DCG/IDCG, reciprocal rank) is
    the deliverable, and judged-label tables drop in by replacing one
    CTE.

    Scale shape: the token scan filters to the query terms before any
    aggregation; rankings are per-term row_number windows over the
    (terms x matching docs) frame — WindowGroupLimit prunes at rank
    10; the DCG/IDCG/MRR reductions are per-term aggregates over <= 10
    rows each. Scores are rounded (6dp) before ranking with doc_id
    tie-breaks, so ranks are engine-stable; DCG sums of <= 10 terms
    land under 4dp output rounding."""
    docs = load_table(spark, sf_dir, "documents")
    scored = (
        _bm25_term_scores(docs)
        .withColumn("score", F.round(F.col("term_score"), 6))
        .withColumn(
            "rel",
            F.when(F.col("tf") >= 2, F.least(F.col("tf"), F.lit(3))).otherwise(F.lit(0)),
        )
    )
    w_rank = Window.partitionBy("term").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    w_ideal = Window.partitionBy("term").orderBy(F.col("rel").desc(), F.col("doc_id").asc())
    ranked = scored.withColumn("rank", F.row_number().over(w_rank)).withColumn(
        "irank", F.row_number().over(w_ideal)
    )
    gain = F.col("rel").cast("double") / F.log2(F.col("rank") + 1)
    igain = F.col("rel").cast("double") / F.log2(F.col("irank") + 1)
    per_term = ranked.groupBy("term").agg(
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("n_relevant"),
        F.sum(F.when(F.col("rank") <= 10, gain).otherwise(F.lit(0.0))).alias("__dcg"),
        F.sum(F.when(F.col("irank") <= 10, igain).otherwise(F.lit(0.0))).alias("__idcg"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("__first_rel"),
    )
    return per_term.select(
        "term",
        "n_relevant",
        F.round("__dcg", 4).alias("dcg10"),
        F.when(
            F.col("__idcg") > 0, F.round(F.col("__dcg") / F.col("__idcg"), 4)
        ).alias("ndcg10"),
        F.when(
            F.col("__first_rel") <= 10, F.round(F.lit(1.0) / F.col("__first_rel"), 4)
        ).otherwise(F.lit(0.0)).alias("rr"),
    )


_RETRIEVAL_EVAL_SQL = f"""
WITH {_BM25_CTES_SQL}, scored AS (
  SELECT term, doc_id, ROUND(term_score, 6) AS score,
         CASE WHEN tf >= 2 THEN LEAST(tf, 3) ELSE 0 END AS rel
  FROM bm25_scored
), ranked AS (
  SELECT term, rel,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rank,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY rel DESC, doc_id) AS irank
  FROM scored
), agg AS (
  SELECT term,
         CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant,
         SUM(CASE WHEN rank <= 10 THEN CAST(rel AS DOUBLE) / log2(rank + 1)
                  ELSE 0.0 END) AS dcg,
         SUM(CASE WHEN irank <= 10 THEN CAST(rel AS DOUBLE) / log2(irank + 1)
                  ELSE 0.0 END) AS idcg,
         MIN(CASE WHEN rel > 0 THEN rank END) AS first_rel
  FROM ranked GROUP BY term
)
SELECT term, n_relevant,
       ROUND(dcg, 4) AS dcg10,
       CASE WHEN idcg > 0 THEN ROUND(dcg / idcg, 4) END AS ndcg10,
       CASE WHEN first_rel <= 10 THEN ROUND(1.0 / first_rel, 4) ELSE 0.0 END AS rr
FROM agg
"""


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner-loop aggregation of BPE tokenizer training: corpus-
    weighted counts of adjacent symbol pairs (here: character bigrams
    inside words, the iteration-0 state where every symbol is one
    char). Distributed shape is the one that matters at 100 TB — the
    corpus collapses to DISTINCT (word, count) first (vocabulary-sized,
    orders smaller than the token stream), pairs explode off that tiny
    table, and the candidate ranking is a count-weighted sum + top-20
    TakeOrderedAndProject. An actual BPE trainer re-runs exactly this
    agg per merge step over its evolving symbol table.
    """
    from pubg_data_pipeline_spark.functions.text import word_tokens

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(word_tokens(F.lower(F.col("text")))).alias("w")
    ).filter(F.length("w") >= 2)
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    pairs = vocab.select(
        "n_w",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n_w").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(20)
    )


_BPE_SQL = r"""
WITH words AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w FROM documents
), vocab AS (
  SELECT w, COUNT(*) AS n_w FROM words WHERE length(w) >= 2 GROUP BY 1
), pairs AS (
  SELECT n_w, unnest(list_transform(generate_series(1, length(w) - 1),
                                    i -> substr(w, CAST(i AS INT), 2))) AS pair
  FROM vocab
)
SELECT pair, CAST(SUM(n_w) AS BIGINT) AS n_occurrences
FROM pairs GROUP BY 1
ORDER BY n_occurrences DESC, pair ASC LIMIT 20
"""


def doc_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenizer pass: learn a 12-merge table from the
    corpus's own vocabulary (functions.bpe.train_bpe — the iterative
    loop whose single-round aggregate is `bpe_merge_candidates`), then
    encode every document with it (functions.bpe.bpe_encode, Arrow
    mapInPandas) and report whitespace-vs-BPE token counts per doc —
    the budgeting numbers a tokenizer pass exists to produce.

    Rows-only spec: training is iterative (each merge reshapes the
    next round's pair counts), which no single SQL statement can
    express — correctness is pinned instead by tests/test_bpe.py
    (distributed trainer ≡ pure-Python reference, distributed encoder
    ≡ per-row reference, hypothesis property tests)."""
    from pubg_data_pipeline_spark.functions.bpe import bpe_encode, train_bpe
    from pubg_data_pipeline_spark.functions.text import word_tokens

    docs = _docs(spark, sf_dir)
    words = docs.select(
        F.explode(word_tokens(F.lower(F.col("text")))).alias("w")
    ).filter(F.length("w") >= 2)
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    merges = train_bpe(vocab, num_merges=12)
    return bpe_encode(docs, merges)


def source_vocab_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus diversity: token count, type count,
    type-token ratio, and Shannon entropy of the unigram distribution
    — the mixture-health metrics a dataset build tracks per source
    (low entropy/TTR = templated or boilerplate-heavy source).

    Scale shape: one (source, token) aggregate off the exploded
    stream, then a source-cardinality aggregate. Entropy uses the
    join-free algebraic form H = ln(t) - Σ c·ln(c) / t, so per-source
    totals never join back to the token table; everything after the
    first agg is O(vocabulary)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.length("w") > 0)
    per = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    return per.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 4).alias("ttr"),
        F.round(
            F.log(F.sum("c"))
            - F.sum(F.col("c") * F.log(F.col("c"))) / F.sum("c"),
            4,
        ).alias("entropy"),
    )


_DIVERSITY_SQL = r"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents
), per AS (
  SELECT source, w, COUNT(*) AS c FROM toks WHERE length(w) > 0 GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_types,
       ROUND(COUNT(*) * 1.0 / SUM(c), 4) AS ttr,
       ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 4) AS entropy
FROM per GROUP BY 1
"""


# -------------------------------------------------- hybrid retrieval (RRF)

_RRF_K = 60


def doc_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: the BM25 keyword list (doc_bm25_search) fused
    with an embedding-cosine list (query = vec 0's embedding, vec_id is
    the doc id in the synthetic corpus) by Reciprocal Rank Fusion,
    rrf = Σ 1/(60 + rank) — the standard lexical+dense fusion of a RAG
    retriever, entirely as relational algebra.

    Scale shape: each branch is already scale-right (BM25 filters to
    query terms before aggregating; the dense branch broadcasts the
    single query vector over the corpus — swap in the persisted-IVF
    probe at 100 TB). Fusion itself touches only the two top-20 lists:
    the re-rank windows and the full-outer join run on ≤40 rows, so the
    single-partition window is bounded by the upstream LIMITs, not by
    data size.
    """
    from pubg_data_pipeline_spark.operators import similarity

    bm25 = doc_bm25_search(spark, sf_dir)
    bw = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    b = bm25.withColumn("bm25_rank", F.row_number().over(bw)).select(
        "doc_id", "bm25_rank"
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vec = similarity.brute_force_top_k(
        emb,
        emb.filter(F.col("vec_id") == 0),
        id_col="vec_id",
        vec_col="embedding",
        k=20,
        round_digits=6,
        dim=64,
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("vec_rank"))

    fused = b.join(vec, "doc_id", "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("bm25_rank")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("vec_rank")), F.lit(0.0))
    return (
        fused.select(
            "doc_id",
            F.round(rrf, 6).alias("rrf"),
            "bm25_rank",
            "vec_rank",
        )
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(20)
    )


_HYBRID_SQL = f"""
WITH dl AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS dl
  FROM documents
), toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN {_BM25_TERMS!r}
  GROUP BY 1, 2
), df_t AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
), scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (stats.n_docs - df_t.df + 0.5) / (df_t.df + 0.5))
         * (tf.tf * ({_BM25_K1} + 1.0))
         / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
           AS term_score
  FROM tf JOIN df_t USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
), bm_top AS (
  SELECT doc_id, ROUND(SUM(term_score), 4) AS bm25
  FROM scored GROUP BY 1
  ORDER BY bm25 DESC, doc_id ASC LIMIT 20
), bm AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS bm25_rank
  FROM bm_top
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), vscored AS (
  SELECT vec_id AS doc_id,
         ROUND(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6)
           AS cos_sim
  FROM (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id != 0)
  CROSS JOIN q
), vr AS (
  SELECT doc_id, vec_rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id ASC) AS vec_rank
    FROM vscored
  ) WHERE vec_rank <= 20
)
SELECT doc_id,
       ROUND(COALESCE(1.0 / ({_RRF_K} + bm25_rank), 0.0)
             + COALESCE(1.0 / ({_RRF_K} + vec_rank), 0.0), 6) AS rrf,
       bm25_rank, vec_rank
FROM bm FULL OUTER JOIN vr USING (doc_id)
ORDER BY rrf DESC, doc_id ASC LIMIT 20
"""


# ------------------------------------- DSIR-style importance weights

_DSIR_BUCKETS = 64


def _dsir_bucket(w) -> Column:
    """Deterministic cheap feature hash shared verbatim with the DuckDB
    oracle: (len·31 + first-char·7 + last-char) mod 64. Production
    would use xxhash64(term) % 10⁴ buckets (Spark-side `F.xxhash64`);
    the oracle-checkable polynomial pins the algebra — the weights
    pipeline is hash-agnostic."""
    return (
        F.length(w) * F.lit(31)
        + F.ascii(F.substring(w, 1, 1)) * F.lit(7)
        + F.ascii(F.substring(w, -1, 1))
    ) % F.lit(_DSIR_BUCKETS)


def doc_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection weights (Xie et al. 2023): score every
    document by the mean log-ratio of hashed-unigram probabilities
    under a TARGET distribution (here: the English slice, the
    'looks-like-my-eval-domain' proxy) vs the RAW corpus — the
    importance weight that drives resampling toward the target domain.

    Scale shape: the token stream maps to a 64-bucket feature space
    in-scan (pure expressions); both distributions are 64-row
    aggregates with Laplace smoothing, broadcast back to the stream;
    one per-doc aggregate ends the pipeline. No UDF, no collect, no
    shuffle bigger than the doc-keyed agg. avg-of-ln agg-order noise
    ~1e-13, five orders under the 4dp rounding (base.py stddev rule).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.col("lang"),
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.length("w") > 0)
    b = toks.select("doc_id", "lang", _dsir_bucket(F.col("w")).alias("b"))

    # ONE cell aggregate carries both distributions (raw count + target
    # count per bucket via a conditional count), and both totals are
    # sums over the 64-row cell table — the token stream is scanned and
    # tokenized TWICE total (this aggregate + the per-doc probe below)
    # instead of the five passes the separate raw/raw_tot/tgt/tgt_tot
    # frames cost. Arithmetic inputs are the same integers, so the
    # smoothed probabilities are bit-identical (rows verified equal;
    # interleaved A/B at sf0.1: 1.13 -> 1.00 s median).
    cell = b.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count(F.when(F.col("lang") == "en", F.lit(1))).alias("n_tgt"),
    )
    # Totals via an unpartitioned window over the 64-row cell table —
    # NOT a crossJoin(broadcast(cell.agg(...))), which would reference
    # `cell` twice and re-run the whole token aggregate for the scalar.
    # (The single-partition window is over 64 rows, the whole point of
    # the bucketing.)
    w_all = Window.partitionBy()
    probs = cell.select(
        "b",
        (
            (F.coalesce(F.col("n_tgt"), F.lit(0)) + F.lit(1.0))
            / (F.sum("n_tgt").over(w_all) + F.lit(float(_DSIR_BUCKETS)))
        ).alias("p_tgt"),
        (
            (F.col("n_raw") + F.lit(1.0))
            / (F.sum("n_raw").over(w_all) + F.lit(float(_DSIR_BUCKETS)))
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
            # + 0.0 canonicalizes IEEE -0.0 → +0.0 (a doc whose tokens
            # all land in llr≈0 buckets rounds to zero from below on
            # one engine and above on the other; repr('-0.0') would
            # then hash-mismatch despite equal values)
            (F.round(F.col("__llr") / F.col("n_tokens"), 4) + F.lit(0.0)).alias(
                "avg_llr"
            ),
        )
    )


_DSIR_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents
), b AS (
  SELECT doc_id, lang,
         (length(w) * 31 + ascii(substr(w, 1, 1)) * 7 + ascii(substr(w, -1, 1))) % 64 AS b
  FROM toks WHERE length(w) > 0
), raw AS (
  SELECT b, COUNT(*) AS n_raw FROM b GROUP BY 1
), raw_tot AS (
  SELECT COUNT(*) AS t_raw FROM b
), tgt AS (
  SELECT b, COUNT(*) AS n_tgt FROM b WHERE lang = 'en' GROUP BY 1
), tgt_tot AS (
  SELECT COUNT(*) AS t_tgt FROM b WHERE lang = 'en'
), probs AS (
  SELECT raw.b,
         (COALESCE(tgt.n_tgt, 0) + 1.0) / (tgt_tot.t_tgt + 64.0) AS p_tgt,
         (raw.n_raw + 1.0) / (raw_tot.t_raw + 64.0) AS p_raw
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN raw_tot CROSS JOIN tgt_tot
)
SELECT b.doc_id,
       COUNT(*) AS n_tokens,
       ROUND(SUM(ln(p_tgt / p_raw)) / COUNT(*), 4) + 0.0 AS avg_llr
FROM b JOIN probs USING (b)
GROUP BY 1
"""




def corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release data card in one row — the summary table that ships
    with a dataset release (docs/sources/languages, size in chars and
    whitespace tokens, length distribution anchors, exact-dup rate).
    Everything a consumer reads before deciding to train on the corpus,
    produced by ONE aggregation pass over the scan (token counts and
    fingerprints are per-row expressions; the only second phase is the
    two distinct counters Spark plans as expand+partial-agg).

    Determinism: counts and sums are exact integers; mean derives from
    those sums with one double division; median interpolates the same
    way in both engines over exact integer n_chars; dup rate divides
    two exact counts. All rounded well above float noise."""
    from pubg_data_pipeline_spark.functions.text import token_count

    docs = _docs(spark, sf_dir)
    n_tok = token_count(F.col("text"))
    agged = docs.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("lang").alias("n_langs"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("n_en"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(n_tok.cast("long")).alias("total_ws_tokens"),
        F.median("n_chars").alias("med"),
        F.count_distinct(F.md5("text")).alias("n_unique_texts"),
    )
    return agged.select(
        "n_docs",
        "n_sources",
        "n_langs",
        F.round(100.0 * F.col("n_en") / F.col("n_docs"), 2).alias("pct_en"),
        "total_chars",
        F.round(F.col("total_chars") / F.col("n_docs"), 2).alias("mean_chars"),
        F.round(F.col("med"), 1).alias("median_chars"),
        "total_ws_tokens",
        F.round(1.0 - F.col("n_unique_texts") / F.col("n_docs"), 4).alias("exact_dup_rate"),
    )


_DATA_CARD_SQL = r"""
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       COUNT(DISTINCT lang) AS n_langs,
       ROUND(100.0 * COUNT(*) FILTER (lang = 'en') / COUNT(*), 2) AS pct_en,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 2) AS mean_chars,
       ROUND(MEDIAN(n_chars), 1) AS median_chars,
       CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT)
         AS total_ws_tokens,
       ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 4) AS exact_dup_rate
FROM documents
"""


SPECS = [
    QuerySpec("corpus_data_card", corpus_data_card, _DATA_CARD_SQL, ("llm", "curation", "agg")),
    QuerySpec("bpe_merge_candidates", bpe_merge_candidates, _BPE_SQL, ("llm", "tokenizer")),
    QuerySpec("doc_bpe_encode", doc_bpe_encode, None, ("llm", "tokenizer", "udf")),
    QuerySpec(
        "source_vocab_diversity", source_vocab_diversity, _DIVERSITY_SQL, ("curation", "text")
    ),
    QuerySpec(
        "doc_hybrid_search", doc_hybrid_search, _HYBRID_SQL, ("llm", "search", "vector")
    ),
    QuerySpec(
        "doc_importance_weights", doc_importance_weights, _DSIR_SQL, ("llm", "curation")
    ),
    QuerySpec("doc_bm25_search", doc_bm25_search, _BM25_SQL, ("llm", "search", "window")),
    QuerySpec(
        "retrieval_eval_bm25", retrieval_eval_bm25, _RETRIEVAL_EVAL_SQL, ("llm", "search", "eval")
    ),
    QuerySpec(
        "bigram_pmi_collocations", bigram_pmi_collocations, _PMI_SQL, ("curation", "text")
    ),
    QuerySpec(
        "token_posting_lists", token_posting_lists, _POSTING_SQL, ("curation", "text")
    ),
    QuerySpec("corpus_vocabulary", corpus_vocabulary, _VOCAB_SQL, ("curation", "text")),
    QuerySpec(
        "source_mixture_weights", source_mixture_weights, _MIXTURE_SQL, ("curation",)
    ),
    QuerySpec(
        "doremi_domain_weights", doremi_domain_weights, _DOREMI_SQL, ("curation", "llm")
    ),
    QuerySpec(
        "paragraph_block_dedup", paragraph_block_dedup, _BLOCK_DEDUP_SQL, ("curation", "dedup")
    ),
    QuerySpec(
        "cross_source_overlap", cross_source_overlap, _OVERLAP_SQL, ("curation", "dedup")
    ),
    QuerySpec(
        "doc_length_histogram", doc_length_histogram, _LENGTH_HIST_SQL, ("curation", "text")
    ),
    QuerySpec(
        "long_doc_quantile_filter",
        long_doc_quantile_filter,
        _QUANTILE_FILTER_SQL,
        ("curation", "text"),
    ),
]
