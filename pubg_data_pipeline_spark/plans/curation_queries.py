"""Dataset-curation queries for the LLM-training-data surface
(BASELINE.json north-star extension; complements plans/llm_queries.py).

These are the corpus-management operations a 100 TB training-data
build needs BEYOND per-document scoring/dedup: deterministic
train/val/test splits, stratified sampling, token-budget shard
packing, benchmark-contamination checks, Gopher-style repetition
metrics, and normalization/redaction. Everything is hash-derived and
content-deterministic (never RNG-based), so results are reproducible
across runs, engines, and repartitioning — each query has an exact
DuckDB oracle twin.

Scale notes per query are inline; the common pattern is: all
expressions are JVM-side Column trees (codegen), per-document work
carries no shuffle, and the only shuffles are the final keyed
aggregations (or, for contamination, one broadcast join against the
benchmark shingle set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators.ckpt import barrier

from pubg_data_pipeline_spark.functions.text import (
    clean_text,
    rolling_fingerprint,
    split_bucket,
    token_count,
    word_ngrams,
    word_shingles,
    word_tokens,
)
from pubg_data_pipeline_spark.plans.base import QuerySpec
from pubg_data_pipeline_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents spread across the session parallelism (the synthetic
    parquet is one row-group -> one scan partition; see
    llm_queries._docs)."""
    df = load_table(spark, sf_dir, "documents")
    return df.repartition(spark.sparkContext.defaultParallelism, "doc_id")


# DuckDB twin of functions.text.rolling_fingerprint (list_reduce
# polynomial fold — bit-identical, see _ROLLING_FP_SQL in llm_queries).
_FP_SQL = r"""
list_reduce(
  list_prepend(CAST(0 AS BIGINT),
    list_transform(regexp_split_to_array(trim(lower(text)), '\s+'),
                   t -> CAST(length(t) * 256 + ascii(substr(t, 1, 1)) AS BIGINT))),
  (acc, x) -> (acc * 131 + x) % 9007199254740881)
"""

# Salted variant for SAMPLING decisions: the unsalted fingerprint is
# what split_bucket assigns train/val/test from, so any keep-rule on
# the same `fp % k` buckets is deterministically CORRELATED with split
# membership (e.g. rate <= 80 would keep only train-split docs). A
# literal salt token prepended to the text gives sampling its own
# independent hash stream — the same discipline as the 'shuffle-' /
# 'cap-' md5 salts elsewhere in this file.
_FP_SAMPLE_SQL = _FP_SQL.replace("lower(text)", "lower('sample ' || text)")

# DuckDB twin of functions.text.word_shingles (distinct word 3-grams).
_SHINGLES_SQL = r"""
list_distinct(list_transform(
  generate_series(1, GREATEST(len(regexp_split_to_array(trim(lower(text)), '\s+')) - 2, 0)),
  i -> regexp_split_to_array(trim(lower(text)), '\s+')[i] || ' '
    || regexp_split_to_array(trim(lower(text)), '\s+')[i+1] || ' '
    || regexp_split_to_array(trim(lower(text)), '\s+')[i+2]))
"""


def corpus_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split from the rolling
    content fingerprint, aggregated to per-split doc and token counts.

    Hash-based assignment (never rand()) is the reproducibility
    contract of a dataset build: the same document lands in the same
    split on every run, on any cluster, at any partitioning. At 100 TB
    this is a single map-side projection plus a 3-group aggregate."""
    docs = _docs(spark, sf_dir)
    split = split_bucket(rolling_fingerprint(F.col("text")))
    return (
        docs.select(split.alias("split"), token_count(F.col("text")).alias("n_tok"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
    )


_SPLIT_SQL = rf"""
WITH f AS (
  SELECT CASE WHEN ({_FP_SQL}) % 100 < 80 THEN 'train'
              WHEN ({_FP_SQL}) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok
  FROM documents
)
SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM f GROUP BY split
"""


def stratified_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic downsampling (dataset mixing): source
    srcK keeps max(10, 100 - 5K) percent of its documents, selected by
    fingerprint bucket — the hash-based analog of sampleBy() that stays
    reproducible across engines. Output: per-source kept/total counts.

    At scale this is the mixture-weighting step of corpus assembly:
    one map-side keep-decision per row, one aggregate; no RNG state."""
    docs = _docs(spark, sf_dir)
    idx = F.substring(F.col("source"), 4, 10).cast("int")
    rate = F.greatest(F.lit(10), F.lit(100) - F.lit(5) * idx)
    # SALTED fingerprint: the unsalted stream is the split_bucket
    # assignment, so keep-buckets must not alias train/val/test buckets
    # (rate <= 80 on the unsalted hash keeps ONLY train-split docs).
    keep = (
        F.pmod(rolling_fingerprint(F.concat(F.lit("sample "), F.col("text"))), F.lit(100))
        < rate
    ).cast("int")
    return (
        docs.select("source", rate.alias("rate_pct"), keep.alias("keep"))
        .groupBy("source", "rate_pct")
        .agg(
            F.count(F.lit(1)).alias("total_docs"),
            F.sum("keep").cast("long").alias("kept_docs"),
        )
    )


_STRATIFIED_SQL = rf"""
SELECT source,
       GREATEST(10, 100 - 5 * CAST(substr(source, 4) AS INT)) AS rate_pct,
       COUNT(*) AS total_docs,
       CAST(SUM(CASE WHEN ({_FP_SAMPLE_SQL}) % 100
                     < GREATEST(10, 100 - 5 * CAST(substr(source, 4) AS INT))
                THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs
FROM documents
GROUP BY 1, 2
"""


def token_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """START-OFFSET shard packing: within each source, documents (in
    doc_id order) are assigned to shard floor(exclusive_token_offset /
    500) — every doc whose stream START falls in [500k, 500(k+1))
    lands in shard k. Output: per (source, shard) doc/token counts.

    The guarantee is on offsets, not totals: a shard's token count can
    exceed 500 by up to (last doc's length - 1), because a document
    straddling a boundary stays whole in the shard it started in —
    the standard closed-form layout (one prefix sum, no sequential
    state). TRUE close-when-full greedy packing needs a running reset
    (inherently sequential, not a window expression); the
    overflow-free splitting form is context_window_packing, which cuts
    documents AT the boundary. The DuckDB oracle encodes this same
    start-offset rule.

    Partitioning by source keeps the window distributed (one partition
    per source, never a global sort); at 100 TB the unit would be a
    finer path-like key, same plan shape."""
    docs = _docs(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = token_count(F.col("text"))
    with_tok = docs.select("source", "doc_id", n_tok.alias("n_tok"))
    cum_excl = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    sharded = with_tok.withColumn(
        "shard_id", F.floor(cum_excl / F.lit(500)).cast("int")
    )
    return sharded.groupBy("source", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("shard_tokens"),
    )


_SHARD_SQL = r"""
WITH t AS (
  SELECT source, doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok
  FROM documents
), s AS (
  SELECT source, n_tok,
         CAST(FLOOR(COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 500) AS INT)
           AS shard_id
  FROM t
)
SELECT source, shard_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS shard_tokens
FROM s GROUP BY source, shard_id
"""


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination check: treating source 'src0' as the
    held-out benchmark, report every other document that shares >=1
    word-3-gram shingle with ANY benchmark document, with its overlap
    rate. The benchmark shingle set is distinct-ed and broadcast; the
    candidate side streams through one hash join — at 100 TB the
    benchmark set (exam suites, eval corpora) stays dimension-sized, so
    this never shuffles the corpus."""
    docs = _docs(spark, sf_dir)
    with_sh = docs.select(
        "doc_id", "source", word_shingles(F.col("text")).alias("shingles")
    )
    bench = (
        with_sh.filter(F.col("source") == "src0")
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # One pass over the candidate side: explode, LEFT join the broadcast
    # benchmark set, and derive both the total shingle count (count(*))
    # and the shared count (non-null hits) from the same stream — the
    # shingle projection runs once per candidate doc instead of twice
    # (no join-back, no second documents scan).
    cand_ex = with_sh.filter(F.col("source") != "src0").select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    stats = (
        cand_ex.join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_shingles"),
            F.count("__hit").alias("n_shared"),
        )
    )
    return stats.filter(F.col("n_shared") > 0).select(
        "doc_id",
        "n_shingles",
        "n_shared",
        F.round(F.col("n_shared") / F.greatest(F.col("n_shingles"), F.lit(1)), 6).alias(
            "contamination"
        ),
    )


_CONTAMINATION_SQL = rf"""
WITH sh AS (
  SELECT doc_id, source, {_SHINGLES_SQL} AS shingles FROM documents
), bench AS (
  SELECT DISTINCT unnest(shingles) AS shingle FROM sh WHERE source = 'src0'
), cand AS (
  SELECT doc_id, CAST(len(shingles) AS INT) AS n_shingles, shingles
  FROM sh WHERE source != 'src0'
), ex AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM cand
), shared AS (
  SELECT doc_id, COUNT(*) AS n_shared
  FROM ex JOIN bench USING (shingle) GROUP BY doc_id
)
SELECT cand.doc_id, n_shingles, n_shared,
       ROUND(n_shared * 1.0 / GREATEST(n_shingles, 1), 6) AS contamination
FROM cand JOIN shared ON cand.doc_id = shared.doc_id
"""


def doc_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality metrics per document: distinct
    word ratio, mean word length, and the most-frequent-2-gram count
    and fraction (high top-2-gram fraction = boilerplate/spam signal).

    Entirely array-expression work fused into the scan projection — no
    shuffle at all. The most-frequent-2-gram count is computed as the
    longest run of equal adjacent elements in the SORTED gram array —
    one O(m log m) sort + one O(m) fold per document. (The naive form,
    `transform(distinct(grams), g -> size(filter(grams, = g)))`, is not
    just O(m²): Catalyst inlines the `grams` expression tree into the
    inner lambda, so the regexp tokenization itself re-ran per distinct
    gram — measured 19.6s vs <1s for the whole query at sf0.1.)"""
    docs = _docs(spark, sf_dir)
    toks = word_tokens(F.lower(F.col("text")))
    n_words = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    grams = word_ngrams(F.col("text"), 2)
    run_step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    top_count = F.aggregate(
        F.array_sort(grams),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        run_step,
        lambda acc: acc["best"],
    )
    non_ws_len = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct"),
        F.round(n_distinct / F.greatest(n_words, F.lit(1)), 6).alias("distinct_ratio"),
        F.round(non_ws_len / F.greatest(n_words, F.lit(1)), 6).alias("mean_word_len"),
        top_count.alias("top_2gram_count"),
        F.round(
            top_count / F.greatest(F.size(grams), F.lit(1)), 6
        ).alias("top_2gram_frac"),
    )


_REPETITION_SQL = r"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
         length(regexp_replace(trim(text), '\s+', '', 'g')) AS non_ws_len
  FROM documents
), g AS (
  SELECT doc_id, toks, non_ws_len,
         list_transform(generate_series(1, GREATEST(len(toks) - 1, 0)),
                        i -> toks[i] || ' ' || toks[i+1]) AS grams
  FROM t
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_words,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       ROUND(len(list_distinct(toks)) * 1.0 / GREATEST(len(toks), 1), 6) AS distinct_ratio,
       ROUND(non_ws_len * 1.0 / GREATEST(len(toks), 1), 6) AS mean_word_len,
       CAST(COALESCE(list_max(list_transform(list_distinct(grams),
              x -> len(list_filter(grams, y -> y = x)))), 0) AS INT) AS top_2gram_count,
       ROUND(CAST(COALESCE(list_max(list_transform(list_distinct(grams),
              x -> len(list_filter(grams, y -> y = x)))), 0) AS INT) * 1.0
             / GREATEST(len(grams), 1), 6) AS top_2gram_frac
FROM g
"""


def doc_clean_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization/redaction pass: lowercase, URL/email placeholder
    redaction, whitespace collapse — emitted as a content digest plus
    changed flag (the full cleaned text stays in the pipeline; the
    digest keeps the oracle row narrow). Pure regexp_replace chain,
    fused into the scan at any scale."""
    docs = _docs(spark, sf_dir)
    cleaned = clean_text(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(cleaned).alias("clean_md5"),
        F.length(cleaned).alias("clean_len"),
        (cleaned != F.col("text")).cast("int").alias("changed"),
    )


_CLEAN_SQL = r"""
SELECT doc_id,
       md5(cleaned) AS clean_md5,
       CAST(length(cleaned) AS INT) AS clean_len,
       CAST(cleaned != text AS INT) AS changed
FROM (
  SELECT doc_id, text,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(lower(trim(text)), 'https?://\S+', '<url>', 'g'),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<email>', 'g'),
           '\s+', ' ', 'g')) AS cleaned
  FROM documents
)
"""


def training_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: order the corpus by a
    content-independent hash (md5 of a salted id — NEVER an RNG, so
    the permutation is reproducible across runs/engines/partitioning),
    deal documents into 8 shards by hash prefix, and order within each
    shard by the hash. Emits per-shard stats incl. the hash-order
    first/last doc (min_by/max_by pins the within-shard ordering for
    the oracle).

    At 100 TB this is exactly a shuffled write: shard = repartition
    key, hash = sortWithinPartitions key — one shuffle, then a
    streaming-friendly ordered parquet write per shard
    (sources/io.py:write_partitioned_by_date is the same shape keyed
    by date instead of hash)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("shuffle-"), F.col("doc_id").cast("string")))
    sharded = docs.select(
        "doc_id",
        "n_chars",
        h.alias("h"),
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 8).alias("shard"),
    )
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min_by("doc_id", F.col("h")).alias("first_doc"),
        F.max_by("doc_id", F.col("h")).alias("last_doc"),
    )


_SHUFFLE_SQL = """
WITH s AS (
  SELECT doc_id, n_chars,
         md5('shuffle-' || doc_id) AS h,
         CAST(('0x' || substring(md5('shuffle-' || doc_id), 1, 8)) AS BIGINT) % 8 AS shard
  FROM documents
)
SELECT shard, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       min_by(doc_id, h) AS first_doc,
       max_by(doc_id, h) AS last_doc
FROM s GROUP BY shard
"""


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size training-sequence chunking with overlap: each
    document's token stream is cut into 64-token chunks at stride 48
    (16-token overlap, the standard long-document pretraining prep).
    Emits (doc_id, chunk_idx, n_tokens, chunk_md5) — the digest keeps
    oracle rows narrow while pinning exact chunk CONTENT, not just
    boundaries.

    Explode-then-slice: the chunk index sequence explodes first (its
    own projection — generators cannot nest), then each row slices its
    token window. Row expansion is ~len/stride per doc with no shuffle
    at all; at 100 TB this fuses into the scan and the output
    partitioning inherits the input's."""
    chunk, stride = 64, 48
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
                    F.ceil((F.size("toks") - F.lit(chunk)) / F.lit(stride)),
                    F.lit(0).cast("bigint"),
                ),
            )
        ).alias("chunk_idx"),
    )
    piece = F.slice(F.col("toks"), F.col("chunk_idx") * stride + 1, chunk)
    return idx.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(piece).alias("n_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    )


_CHUNK_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS arr
  FROM documents
), idx AS (
  SELECT doc_id, arr,
         unnest(generate_series(0,
           GREATEST(CAST(CEIL((len(arr) - 64) / 48.0) AS BIGINT), 0))) AS chunk_idx
  FROM toks
)
SELECT doc_id, chunk_idx,
       CAST(len(arr[(chunk_idx * 48 + 1):(chunk_idx * 48 + 64)]) AS INT) AS n_tokens,
       md5(array_to_string(arr[(chunk_idx * 48 + 1):(chunk_idx * 48 + 64)], ' ')) AS chunk_md5
FROM idx
"""


def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RNG-free WEIGHTED Bernoulli sampling: P(keep) = min(n_chars,
    1000)/1000 per document (longer docs up-weighted), decided by
    comparing the content hash mod 1000 against the weight — the
    deterministic form of weighted dataset mixing. Same reproducibility
    contract as the unweighted hash sampling (stratified_source_sample):
    identical keep-set on every run, engine, and partitioning; here
    aggregated to per-source totals. One map-side projection + one
    aggregate at any scale."""
    docs = _docs(spark, sf_dir)
    # salted like stratified_source_sample: fp % 1000 buckets contain
    # the split's fp % 100 buckets, so an unsalted weighted keep-rule
    # systematically under-samples the val/test splits.
    fp = rolling_fingerprint(F.concat(F.lit("sample "), F.col("text")))
    kept = (F.pmod(fp, F.lit(1000)) < F.least(F.col("n_chars"), F.lit(1000))).cast("long")
    return (
        docs.select("source", kept.alias("k"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("k").cast("long").alias("n_kept"),
        )
    )


_WEIGHTED_SAMPLE_SQL = rf"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN ({_FP_SAMPLE_SQL}) % 1000 < LEAST(n_chars, 1000)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents GROUP BY source
"""


def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring, the CCNet/Gopher perplexity
    signal in its exactly-reproducible unigram form: score every
    document by its mean token log-probability under the corpus's own
    unigram distribution (low = boilerplate-ish/rare-token soup, the
    tails a perplexity filter trims). The top-level shape of KenLM
    scoring with the n-gram model swapped for the oracle-checkable
    unigram one.

    Scale: one vocabulary aggregate (map-side partial), joined back to
    the exploded token stream on the natural key — AQE broadcasts it
    at runtime when it fits; no static hint, because a web-scale vocab
    (billions of distinct tokens) exceeds the 8GB broadcast cap. One
    per-doc aggregate; the corpus is tokenized once. avg of ln() is
    agg-order noise ~1e-13, five orders under the 4dp rounding (the
    base.py stddev rule)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")  # split('') -> [''] — a blank doc has no tokens
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    # n from the vocab aggregate (no second tokenization pass); no
    # static broadcast hint — a web-scale vocab exceeds the 8GB
    # broadcast cap, so AQE decides at runtime (see doremi twin).
    n = vocab.agg(F.sum("c").alias("n"))
    scored = (
        toks.join(vocab, "w")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log(F.col("c").cast("double") / F.col("n"))).alias("__lp"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("__lp") / F.col("n_tokens"), 4).alias("avg_logprob"),
        F.round(F.exp(-F.col("__lp") / F.col("n_tokens")), 2).alias("unigram_ppl"),
    )


_UNIGRAM_LP_SQL = r"""
WITH toks0 AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents
), toks AS (
  SELECT * FROM toks0 WHERE w <> ''
), vocab AS (
  SELECT w, COUNT(*) AS c FROM toks GROUP BY w
), n AS (
  SELECT SUM(c) AS n FROM vocab
), scored AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(LN(CAST(c AS DOUBLE) / n.n)) AS lp
  FROM toks JOIN vocab USING (w) CROSS JOIN n
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       ROUND(lp / n_tokens, 4) AS avg_logprob,
       ROUND(EXP(-lp / n_tokens), 2) AS unigram_ppl
FROM scored
"""


def doc_bigram_ppl_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filter with a TRAINED bigram LM: fit
    add-k-smoothed bigram probabilities on a deterministic 40% training
    slice (doc_id % 5 < 2), score every OTHER document by mean bigram
    log-probability, and keep the low-perplexity half (ppl <= corpus
    median). This is the cross-split structure the unigram scorer
    (doc_unigram_logprob) deliberately omits — the model is estimated
    on held-out data, so scoring is honest LM inference, not
    self-normalization.

    P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k*V), k = 0.5, V = distinct
    training unigrams + 1 (the unseen-word event); unseen contexts and
    bigrams fall out of the same formula via LEFT-join + coalesce(0),
    no special-casing.

    Scale: the bigram count table is O(unique bigrams) — far too big to
    broadcast — so scoring is a shuffle EQUI-join on (w1, w2), the
    natural key; the context join on w1 is the skewed one (stopword
    contexts), which AQE skew-join splitting handles (pinned on in the
    session factory). V and the median are scalar broadcasts. The
    median keep-gate is percentile over ROUNDED ppl (2dp) — a single
    partial-agg scalar, not a global sort/window — and the rounding
    makes the boundary comparison engine-stable."""
    k = 0.5
    docs = load_table(spark, sf_dir, "documents")
    arr = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    tokened = docs.select("doc_id", arr.alias("arr")).filter(F.size("arr") > 1)
    train = tokened.filter(F.col("doc_id") % 5 < 2)
    score = tokened.filter(F.col("doc_id") % 5 >= 2)

    def bigrams(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(arr, 1, size(arr) - 1)"),
                    F.expr("slice(arr, 2, size(arr) - 1)"),
                )
            ).alias("b"),
        ).select("doc_id", F.col("b.0").alias("w1"), F.col("b.1").alias("w2"))

    train_bi = bigrams(train)
    bi_c = train_bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx_c = train_bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = (
        train.select(F.explode("arr").alias("w"))
        .agg((F.count_distinct("w") + 1).alias("v"))
    )
    logp = F.log(
        (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.col("v"))
    )
    scored = (
        bigrams(score)
        .join(bi_c, ["w1", "w2"], "left")
        .join(ctx_c, ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum(logp).alias("__lp"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("__lp") / F.col("n_bigrams"), 4).alias("avg_logprob"),
            F.round(F.exp(-F.col("__lp") / F.col("n_bigrams")), 2).alias("bigram_ppl"),
        )
        # Lazy localCheckpoint: `scored` is referenced twice (median
        # scalar + final select), and without the barrier the whole
        # train+score LM pipeline is planned twice — exchange reuse
        # recovers some of it, but the per-doc scored frame is tiny and
        # caching it guarantees the pipeline runs once at any scale
        # (interleaved A/B at sf0.1: 1.00 -> 0.87 s median, rows equal).
    )
    scored = barrier(scored, site="curation:bigram_ppl_scored")
    med = scored.agg(F.expr("percentile(bigram_ppl, 0.5)").alias("__m"))
    return scored.crossJoin(F.broadcast(med)).select(
        "doc_id",
        "n_bigrams",
        "avg_logprob",
        "bigram_ppl",
        F.when(F.col("bigram_ppl") <= F.col("__m"), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    )


_BIGRAM_PPL_SQL = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS arr FROM documents
), tok AS (
  SELECT doc_id, arr FROM t WHERE len(arr) > 1
), train AS (
  SELECT * FROM tok WHERE doc_id % 5 < 2
), score AS (
  SELECT * FROM tok WHERE doc_id % 5 >= 2
), train_bi AS (
  SELECT doc_id, u['w1'] AS w1, u['w2'] AS w2 FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(arr) - 1),
                                         i -> {'w1': arr[i], 'w2': arr[i+1]})) AS u
    FROM train
  )
), score_bi AS (
  SELECT doc_id, u['w1'] AS w1, u['w2'] AS w2 FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(arr) - 1),
                                         i -> {'w1': arr[i], 'w2': arr[i+1]})) AS u
    FROM score
  )
), bi_c AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM train_bi GROUP BY 1, 2
), ctx_c AS (
  SELECT w1, COUNT(*) AS c1 FROM train_bi GROUP BY 1
), v AS (
  SELECT COUNT(DISTINCT w) + 1 AS v FROM (SELECT unnest(arr) AS w FROM train)
), sc AS (
  SELECT s.doc_id, COUNT(*) AS n_bigrams,
         SUM(LN((COALESCE(c12, 0) + 0.5) / (COALESCE(c1, 0) + 0.5 * v.v))) AS lp
  FROM score_bi s
  LEFT JOIN bi_c USING (w1, w2)
  LEFT JOIN ctx_c USING (w1)
  CROSS JOIN v
  GROUP BY 1
), agg AS (
  SELECT doc_id, n_bigrams,
         ROUND(lp / n_bigrams, 4) AS avg_logprob,
         ROUND(EXP(-lp / n_bigrams), 2) AS bigram_ppl
  FROM sc
), med AS (
  SELECT PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY bigram_ppl) AS m FROM agg
)
SELECT doc_id, n_bigrams, avg_logprob, bigram_ppl,
       CASE WHEN bigram_ppl <= m THEN 1 ELSE 0 END AS keep
FROM agg CROSS JOIN med
"""


# --------------------------- fixed-context sequence packing

_CTX_TOKENS = 512


def context_window_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: the corpus is laid out as one
    token stream (doc_id order) and cut into fixed 512-token context
    windows — the layout step that turns curated documents into
    training sequences. Documents SPAN window boundaries (no padding
    waste), so the output is one row per (window, doc-fragment) with
    the fragment's in-document token range — exactly the index a
    packed-dataset reader uses to materialize window w.

    Scale shape: the exclusive token offset comes from the exact
    distributed prefix sum (operators.windows.global_prefix_sum — no
    single-partition window), each doc explodes into only the windows
    it overlaps (ceil(n/512)+1 fragments, data-proportional), and all
    arithmetic is integer so the naive SUM-OVER oracle hash-matches
    exactly."""
    from pubg_data_pipeline_spark.operators.windows import global_prefix_sum

    docs = load_table(spark, sf_dir, "documents")
    # Materialize the token-count projection ONCE (lazy localCheckpoint,
    # computed by the prefix-sum's first action): global_prefix_sum
    # references its input three times, and each reference would re-run
    # the regex tokenization over the full corpus. The cached frame is
    # two columns per doc. Measured at sf0.1 (interleaved same-session
    # A/B, min-of-5, quiet host): 0.80 -> 0.64 s, rows identical.
    with_tok = docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    with_tok = barrier(with_tok, site="curation:prefix_with_tok")
    scanned = global_prefix_sum(
        with_tok,
        F.col("doc_id").cast("double"),
        tiebreak="doc_id",
        value_col="n_tok",
        n_buckets=64,
        ascending=True,
        out_col="cum_tok",
    )
    c = F.lit(_CTX_TOKENS)
    off = (F.col("cum_tok") - F.col("n_tok")).cast("long")
    frag = scanned.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        off.alias("off"),
        F.explode(
            F.sequence(
                F.floor(off / c), F.floor((off + F.col("n_tok") - 1) / c)
            )
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


_CTX_PACKING_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok
  FROM documents
), nz AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok FROM t WHERE n_tok > 0
), o AS (
  SELECT doc_id, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM nz
), frag AS (
  SELECT doc_id, n_tok, off,
         unnest(generate_series(off // 512, (off + n_tok - 1) // 512)) AS window_id
  FROM o
)
SELECT CAST(window_id AS BIGINT) AS window_id, doc_id,
       CAST(GREATEST(0, window_id * 512 - off) AS BIGINT) AS start_tok,
       CAST(LEAST(n_tok, (window_id + 1) * 512 - off) AS BIGINT) AS end_tok,
       CAST(LEAST(n_tok, (window_id + 1) * 512 - off)
            - GREATEST(0, window_id * 512 - off) AS BIGINT) AS frag_tokens
FROM frag
"""


def shard_output_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integrity manifest for the shuffled training write: one row per
    output shard (same md5 deal as `training_shuffle_shards`, so this
    IS that layout's manifest) with document count, distinct-id count
    (any gap = duplicate rows smuggled into a shard), char and byte
    totals, and an ORDER-INDEPENDENT content checksum — the sum of each
    row's rolling fingerprint folded mod 1e6+3 (sum, not hash-of-
    concat, so the value is invariant to row order and partitioning;
    60k-row shards sum to ~6e10, 100 TB shards to ~1e18 — still inside
    BIGINT).

    This is the validation artifact a 100 TB dataset build publishes
    next to the data: a consumer re-running the manifest query over the
    delivered shards and comparing checksums detects dropped, doubled,
    or corrupted rows without ever re-reading the build's inputs. One
    map-side projection + one 8-group aggregate."""
    docs = _docs(spark, sf_dir)
    h = F.md5(F.concat(F.lit("shuffle-"), F.col("doc_id").cast("string")))
    shard = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 8
    fp = rolling_fingerprint(F.col("text"))
    return (
        docs.select(
            shard.alias("shard"),
            "doc_id",
            "n_chars",
            F.octet_length("text").alias("__bytes"),
            F.pmod(fp, F.lit(1_000_003)).alias("__ck"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("doc_id").alias("n_distinct_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("__bytes").cast("long").alias("total_bytes"),
            F.sum("__ck").cast("long").alias("content_checksum"),
        )
    )


_MANIFEST_SQL = rf"""
WITH s AS (
  SELECT CAST(('0x' || substring(md5('shuffle-' || doc_id), 1, 8)) AS BIGINT) % 8 AS shard,
         doc_id, n_chars,
         octet_length(encode(text)) AS bytes,
         ({_FP_SQL}) % 1000003 AS ck
  FROM documents
)
SELECT shard, COUNT(*) AS n_docs,
       COUNT(DISTINCT doc_id) AS n_distinct_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(ck) AS BIGINT) AS content_checksum
FROM s GROUP BY shard
"""


def source_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (at most 20 docs per source, selected by
    a salted content-independent hash): the "no source dominates the
    mixture" guard of corpus assembly, deterministic across engines and
    partitioning (never RNG / never `LIMIT`-order dependent). Output:
    the kept documents with their within-source hash rank.

    Scale: one window partitioned by SOURCE — parallel across sources,
    and each source's partition sorts only its own rows (the corpus is
    never globally sorted). Spark plans this as WindowGroupLimit when
    the rank filter is pushed, so per-partition work is top-20, not a
    full sort."""
    docs = _docs(spark, sf_dir)
    h = F.md5(F.concat(F.lit("cap-"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h)
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("cap_rank"))
        .filter(F.col("cap_rank") <= 20)
    )


_CAPPED_SQL = """
SELECT doc_id, source, cap_rank FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5('cap-' || doc_id)) AS cap_rank
  FROM documents
) WHERE cap_rank <= 20
"""


def source_epoch_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch plan (the LLaMA-style data-mixing step):
    given per-source TOKEN counts and temperature-weighted targets
    (tokens^0.7, normalized — up-weights small high-quality sources),
    compute each source's share of the total token budget and the
    REPEAT FACTOR (epochs) its documents train for: factor > 1 means
    the source repeats; < 1 means it's subsampled. The budget here is
    the corpus's own token total, so factors express pure rebalancing.

    Scale: one corpus-wide (source) aggregate; the normalization
    window runs over the |sources|-row post-agg frame (dimension-sized
    by design). pow() is IEEE-deterministic; outputs rounded per
    base.py's determinism rules."""
    docs = _docs(spark, sf_dir)
    per_src = (
        docs.select("source", token_count(F.col("text")).alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
    w_raw = F.pow(F.col("n_tokens").cast("double"), F.lit(0.7))
    w_all = Window.partitionBy()
    weight = w_raw / F.sum(w_raw).over(w_all)
    budget = F.sum("n_tokens").over(w_all)
    target = weight * budget
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(weight, 6).alias("mix_weight"),
        F.round(target, 0).cast("long").alias("target_tokens"),
        F.round(target / F.col("n_tokens"), 4).alias("repeat_factor"),
    )


_EPOCH_MIX_SQL = r"""
WITH c AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\s+')) END)
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
       ROUND(pow(n_tokens, 0.7) / SUM(pow(n_tokens, 0.7)) OVER (), 6) AS mix_weight,
       CAST(ROUND(pow(n_tokens, 0.7) / SUM(pow(n_tokens, 0.7)) OVER ()
                  * SUM(n_tokens) OVER (), 0) AS BIGINT) AS target_tokens,
       ROUND(pow(n_tokens, 0.7) / SUM(pow(n_tokens, 0.7)) OVER ()
             * SUM(n_tokens) OVER () / n_tokens, 4) AS repeat_factor
FROM c
"""


SPECS = [
    QuerySpec("doc_unigram_logprob", doc_unigram_logprob, _UNIGRAM_LP_SQL, ("llm", "curation", "text")),
    QuerySpec(
        "doc_bigram_ppl_filter", doc_bigram_ppl_filter, _BIGRAM_PPL_SQL, ("llm", "curation", "text")
    ),
    QuerySpec(
        "context_window_packing", context_window_packing, _CTX_PACKING_SQL, ("curation", "window")
    ),
    QuerySpec("corpus_split_stats", corpus_split_stats, _SPLIT_SQL, ("curation",)),
    QuerySpec(
        "quality_weighted_sample", quality_weighted_sample, _WEIGHTED_SAMPLE_SQL, ("curation",)
    ),
    QuerySpec("doc_chunking", doc_chunking, _CHUNK_SQL, ("curation", "llm")),
    QuerySpec(
        "training_shuffle_shards", training_shuffle_shards, _SHUFFLE_SQL, ("curation",)
    ),
    QuerySpec(
        "stratified_source_sample", stratified_source_sample, _STRATIFIED_SQL, ("curation",)
    ),
    QuerySpec("token_shard_packing", token_shard_packing, _SHARD_SQL, ("curation", "window")),
    QuerySpec(
        "benchmark_contamination", benchmark_contamination, _CONTAMINATION_SQL, ("curation",)
    ),
    QuerySpec(
        "doc_repetition_metrics", doc_repetition_metrics, _REPETITION_SQL, ("curation", "text")
    ),
    QuerySpec("doc_clean_redact", doc_clean_redact, _CLEAN_SQL, ("curation", "text")),
    QuerySpec(
        "shard_output_manifest", shard_output_manifest, _MANIFEST_SQL, ("curation", "io")
    ),
    QuerySpec(
        "source_capped_sample", source_capped_sample, _CAPPED_SQL, ("curation",)
    ),
    QuerySpec(
        "source_epoch_mixing", source_epoch_mixing, _EPOCH_MIX_SQL, ("curation",)
    ),
]
