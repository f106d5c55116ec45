"""Deduplication kit: exact, fingerprint, MinHash-LSH, SimHash.

The reference's dedups are streaming ``dropDuplicates`` on key columns
(reference: spark_apps/pubg_streaming.py:247,250 — players on
(account_id, data_collected_at), matches on (match_id, account_id));
their batch forms live here, made DETERMINISTIC (dropDuplicates keeps
an arbitrary row; we keep the minimum of an explicit order key so the
DuckDB oracle can reproduce the choice). The near-dup family (MinHash,
SimHash, n-gram Jaccard) is the LLM-pipeline extension surface.

Scale design:
- exact_dedup is one hash-partition shuffle on the keys; at 100 TB
  pre-bucket storage on the dedup key to eliminate it.
- MinHash signatures are computed with JVM array ops (no explode of
  the shingle set per hash seed); only LSH band keys are exploded
  (b rows per doc, b ~ 4-8), so the shuffle is O(b·n), not O(shingles).
- Candidate pairs come from an equi-join on (band_idx, band_key) —
  never an O(n²) cross join; exact Jaccard verification then touches
  only the candidates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators.ckpt import barrier

from pubg_data_pipeline_spark.functions.text import doc_fingerprint, word_shingles


def guard_all_pairs(
    df: DataFrame, max_rows: int, op: str, scale_twin: str, allow_full: bool = False
) -> None:
    """Fail-fast scale guard for exact all-pairs baselines.

    The exact pair-generation baselines (uncapped n-gram Jaccard,
    embedding-cosine near-dup pairs) exist to pin semantics for the
    oracle; their cost grows quadratically with input size, so pointing
    one at a production-scale corpus is a silent cluster-killer.
    Probes at most ``max_rows + 1`` rows (``limit().count()`` — bounded
    work regardless of corpus size) and raises with a pointer at the
    scale-safe twin. ``allow_full=True`` is the explicit escape hatch
    for deliberate large exact runs.
    """
    if allow_full:
        return
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"{op}: input exceeds {max_rows} rows — this exact all-pairs "
            f"baseline is quadratic and exists only as an oracle anchor. "
            f"Use the scale-safe path ({scale_twin}), or pass "
            f"allow_full=True to run the exact form anyway."
        )


def exact_dedup(df: DataFrame, keys: Sequence[str], order_key: str) -> DataFrame:
    """Keep exactly one row per key group — the one with the smallest
    ``order_key`` (deterministic; plain dropDuplicates keeps an
    arbitrary row)."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_key).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_groups(df: DataFrame, fingerprint: Column, id_col: str) -> DataFrame:
    """Group rows by a content fingerprint; one row per group with the
    keeper id (min id), the group size, and the fingerprint."""
    return (
        df.groupBy(fingerprint.alias("fingerprint"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def exact_text_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact near-normalized text dedup: md5 of lowercased,
    whitespace-collapsed text as the group key."""
    return duplicate_groups(df, doc_fingerprint(F.col(text_col)), id_col)


# ---------------------------------------------------------------- MinHash

def _spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition to the session's default parallelism.

    The synthetic corpus tables arrive as a single parquet row-group,
    so without this the scan (and everything fused after it) runs on
    one task. At scale inputs arrive pre-partitioned and the keyed
    repartition doubles as co-location for the self-joins below.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *key_cols)


def shingle_table(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int = 3
) -> DataFrame:
    """(``__id``, ``__sh`` shingle-array) projection shared by the
    MinHash/Jaccard consumers.

    The repartition (before the projection) buys parallelism on
    single-row-group inputs. Callers that feed MULTIPLE consumers
    (e.g. minhash candidates + both sides of the verify join) should
    ``.persist()`` the result so the expensive tokenize/shingle
    projection is computed once and served from the block cache —
    measured 2-10x more stable than relying on AQE exchange reuse,
    whose stage replays re-ran the regex pipeline per consumer under
    session pressure. At 100 TB the equivalent is writing the shingle
    table out once and reusing it across dedup runs.
    """
    return _spread(df, id_col).select(
        F.col(id_col).alias("__id"),
        word_shingles(F.col(text_col), shingle_n).alias("__sh"),
    )


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature (array of longs) from a precomputed
    shingle-array column.

    Standard double-hashing family: h_i(s) = h1(s) + i*h2(s) over two
    xxhash64 hashes — 2 string hashes per shingle instead of
    num_hashes, the rest is long arithmetic (~6x faster than a
    per-seed string-hash family at 16 hashes). Exactness is checked
    against the exact-Jaccard oracle op (ngram_jaccard_pairs), not by
    reproducing signatures in SQL. Pass a MATERIALIZED shingle column
    (project the shingle array, then put an exchange between that
    projection and this one) — otherwise CollapseProject re-inlines
    the tokenizer into every signature branch.
    """
    # 32-bit masks keep h1 + i*h2 far from long overflow (ANSI mode
    # throws on wraparound); 32-bit minhash resolution is ample for
    # candidate generation — the exact-Jaccard verify stage restores
    # full precision.
    mask = F.lit((1 << 32) - 1).cast("long")
    hashed = F.transform(
        shingles,
        lambda s: F.struct(
            F.xxhash64(s).bitwiseAND(mask).alias("h1"),
            F.xxhash64(s, F.lit(1)).bitwiseAND(mask).alias("h2"),
        ),
    )
    sig = [
        F.array_min(
            F.transform(hashed, lambda p, i=i: p["h1"] + F.lit(i).cast("long") * p["h2"])
        )
        for i in range(num_hashes)
    ]
    return F.array(*sig)


def lsh_bands(sig: Column, bands: int, rows: int) -> Column:
    """Array of band keys: xxhash64 of each band's signature slice
    (hashed directly as longs, no string concat). len(sig) must equal
    bands*rows."""
    keys = []
    for b in range(bands):
        parts = [F.element_at(sig, b * rows + r + 1) for r in range(rows)]
        keys.append(F.xxhash64(*parts))
    return F.array(*keys)


def band_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(``doc``, ``band_idx``, ``band_key``) LSH bucket rows — the
    shared first half of every MinHash consumer (candidate pairs,
    the persisted near-dup index, streaming ingest): shingle →
    minhash signature → band keys, exploded to ``bands`` rows per
    document. Two docs are near-dup CANDIDATES iff they share a row's
    (band_idx, band_key). ``num_hashes`` must be divisible by
    ``bands``."""
    rows = num_hashes // bands
    sh = shingles if shingles is not None else shingle_table(df, text_col, id_col, shingle_n)
    sh = sh.select(F.col("__id").alias("doc"), "__sh")
    sig = sh.select("doc", minhash_signature(F.col("__sh"), num_hashes).alias("__sig"))
    return sig.select(
        "doc",
        F.posexplode(lsh_bands(F.col("__sig"), bands, rows)).alias("band_idx", "band_key"),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
    max_bucket_size: int | None = 1000,
    hot_bucket: str = "star",
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b): docs sharing ≥1 band key.

    shingle → minhash → band → bucket-join; the join on
    (band_idx, band_key) replaces the O(n²) all-pairs comparison.
    Pass ``shingles`` (a shingle_table result) to share one shingle
    computation with other consumers (e.g. jaccard_verify).

    ``max_bucket_size`` is the 100 TB hot-bucket guard: a band bucket
    with m members emits m(m-1)/2 pairs, so one viral boilerplate page
    (10⁶ near-identical docs hashing into one bucket) is a ~5·10¹¹-row
    single-key blow-up no partitioning can save — the LSH twin of the
    n-gram path's ``max_doc_freq``. The guarded form replaces the
    band self-join entirely: ONE aggregation collects each bucket's
    (distinct) member ids into a sorted array — a single shuffle of
    the band rows, vs two exchanges + a sort-merge join — and pairs
    are generated JVM-side inside each array row (measured ~2x faster
    than the unguarded join at sf0.1, besides being bounded). The
    membership array costs 8 bytes/member (8 MB for a 10⁶-member
    viral bucket — fine; the window/join formulations buffer the same
    bucket rows per-partition anyway). Buckets over the cap are
    handled per ``hot_bucket``:

    - ``"star"`` (default): collapse through the bucket-keeper rule —
      emit only (bucket-min doc, member) pairs, O(m) rows per bucket.
      Connectivity inside the bucket is preserved (every member links
      to the keeper), so connected-component clustering of an
      exact/near-exact dup avalanche is unchanged; a downstream
      pairwise verify may reject a star edge where some member-member
      edge would have passed, so borderline-threshold recall inside
      oversized buckets is approximate (documented trade, like
      stop-word removal).
    - ``"skip"``: drop oversized buckets before pairing (mirrors
      ``max_doc_freq``) — near-dups landing ONLY in a viral bucket are
      missed; most true pairs also collide in other bands.

    ``max_bucket_size=None`` restores the unguarded join (exact LSH
    semantics; only safe on corpora known to lack viral buckets).
    """
    if hot_bucket not in ("star", "skip"):
        raise ValueError(f"hot_bucket must be 'star' or 'skip', got {hot_bucket!r}")
    if max_bucket_size is not None and max_bucket_size < 2:
        raise ValueError(f"max_bucket_size must be >= 2, got {max_bucket_size}")
    banded = band_table(df, text_col, id_col, num_hashes, bands, shingle_n, shingles)
    if max_bucket_size is None:
        left = banded.alias("a")
        right = banded.alias("b")
        return (
            left.join(
                right,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
            .distinct()
        )
    # collect_SET, not collect_list: duplicate id rows in the input
    # must not create [x, x] bucket arrays, whose positional pair-gen
    # would emit (x, x) self-pairs the unguarded a.doc < b.doc join
    # never produces. size >= 2 BEFORE the pair expressions: the
    # overwhelming majority of buckets are singletons (they can't
    # pair), and the filter saves evaluating the quadratic
    # higher-order pair-gen on every one.
    buckets = (
        banded.groupBy("band_idx", "band_key")
        .agg(F.array_sort(F.collect_set("doc")).alias("m"))
        .filter(F.size("m") >= 2)
    )
    m = F.col("m")
    # all i<j pairs inside a small bucket (ascending ids, so id_a < id_b)
    all_pairs = F.flatten(
        F.transform(
            m,
            lambda x, i: F.transform(
                F.filter(m, lambda _, j: j > i),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    # fat bucket, "star": keeper (bucket min = m[0]) -> every other
    # member; size(m) - 1 >= 1 is guaranteed by the size filter above
    star_pairs = F.transform(
        F.slice(m, 2, F.size(m) - 1),
        lambda y: F.struct(m[0].alias("id_a"), y.alias("id_b")),
    )
    # "skip": an EMPTY array of the same struct type (filter-to-false
    # keeps the element type without spelling the doc id type)
    over_cap = (
        star_pairs if hot_bucket == "star" else F.filter(star_pairs, lambda _: F.lit(False))
    )
    return (
        buckets.select(
            F.explode(
                F.when(F.size(m) <= max_bucket_size, all_pairs).otherwise(over_cap)
            ).alias("p")
        )
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact word-shingle Jaccard on candidate pairs; keeps pairs with
    similarity ≥ threshold. Joins the (small) candidate set back to the
    corpus twice — cost O(|pairs|), independent of corpus size."""
    sh = shingles if shingles is not None else shingle_table(df, text_col, id_col, shingle_n)
    a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"))
    b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", inter / F.greatest(union, F.lit(1)))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    allow_full: bool = False,
    guard_max_rows: int = 100_000,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """All near-dup pairs by exact n-gram Jaccard, via an inverted
    shingle index (explode + self-equi-join on shingle) — exact but
    costlier than LSH; the oracle-checkable baseline.

    ``max_doc_freq`` is the 100 TB scale guard: a shingle appearing in
    k documents generates O(k²) candidate pairs, so one boilerplate
    phrase (license header, nav bar) shared by millions of docs is a
    single-key blow-up no partitioning can save. With the cap set,
    shingles whose document frequency exceeds it are dropped BEFORE
    pair generation, and per-doc sizes are computed over the same
    capped shingle universe — so the result is the exact Jaccard over
    the non-boilerplate shingles (a documented, self-consistent
    approximation, analogous to stop-word removal in IR; the
    scale-safe probabilistic alternative is the MinHash-LSH path).

    Without the cap the hot-shingle blow-up is unguarded, so the
    UNCAPPED form refuses inputs beyond ``guard_max_rows`` (override
    with ``allow_full=True``) — see :func:`guard_all_pairs`.
    """
    if max_doc_freq is None:
        guard_all_pairs(
            df,
            guard_max_rows,
            "ngram_jaccard_pairs(max_doc_freq=None)",
            "max_doc_freq cap (doc_ngram_jaccard_pairs_capped) or "
            "MinHash-LSH (minhash_near_dups)",
            allow_full,
        )
    inter, sizes = _shingle_pair_intersections(
        df, text_col, id_col, shingle_n, max_doc_freq, shingles=shingles
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 4,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """All pairs by exact n-gram OVERLAP COEFFICIENT
    |A∩B| / min(|A|, |B|) — the asymmetric containment metric that
    Jaccard misses: a short doc fully quoted inside a much longer one
    scores overlap 1.0 but Jaccard ≈ |A|/|B| → 0. This is the
    partial-duplication / quote-inclusion detector for corpus
    curation (the reference has no text dedup at all; this extends the
    LLM-pipeline suite alongside :func:`ngram_jaccard_pairs`).

    Shares the inverted-index pair generation (one shuffle posting-list
    group-then-generate + the hot-shingle doc-frequency cap) with the
    Jaccard path; defaults to ``max_doc_freq=4`` because containment is
    even more boilerplate-sensitive than Jaccard — a shared license
    header alone can push a short doc to overlap 1.0.
    """
    inter, sizes = _shingle_pair_intersections(
        df, text_col, id_col, shingle_n, max_doc_freq, shingles=shingles
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn("overlap", F.col("n_inter") / F.least("n_a", "n_b"))
        .filter(F.col("overlap") >= threshold)
        .select("id_a", "id_b", "n_inter", "overlap")
    )


def _shingle_pair_intersections(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    max_doc_freq: int | None,
    shingles: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Shared exact-pair machinery: explode word shingles, apply the
    optional hot-shingle doc-frequency cap, then generate ordered doc
    pairs from sorted posting lists. Returns ``(inter, sizes)`` —
    per-pair intersection counts (id_a < id_b) and per-doc shingle
    counts over the SAME (possibly capped) shingle universe, so any
    set-similarity metric derived from them is self-consistent."""
    if shingles is not None:
        # reuse a caller-materialized shingle_table (__id, __sh) — the
        # expensive tokenize/regex pass is served from its cache
        exploded = shingles.select(
            F.col("__id").alias("doc"), F.explode("__sh").alias("shingle")
        )
    else:
        exploded = _spread(df, id_col).select(
            F.col(id_col).alias("doc"),
            F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
        )
    if max_doc_freq is not None:
        # The cap must fire BEFORE any posting list is materialized: a
        # count aggregate has map-side partial aggregation (bounded
        # state per group even for a shingle in 10^9 docs), whereas
        # filtering on size(collect_list(...)) would build the full
        # multi-GB list in one aggregation buffer first. The
        # keep-filter join is an equi-join on the same key as the
        # downstream groupBy, so the extra pass shares partitioning.
        keep = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("shingle")
        )
        exploded = exploded.join(keep, "shingle", "left_semi")
    # Pair generation via group-then-generate (sorted posting list per
    # shingle, ordered pairs from each list) — one shuffle of the
    # exploded shingles instead of a self-join's two, ~1.5x faster at
    # sf0.1.
    # Lazy localCheckpoint: `posting` feeds BOTH the pair generation
    # and the per-doc sizes below, and AQE (Spark 4.1.2) does NOT
    # reuse the identical groupBy("shingle") exchange between two
    # consumers (verified with a minimal self-join repro: AQE off ->
    # ReusedExchange + 1 scan, AQE on -> 2 full builds) — without the
    # barrier the collect_list index build ran twice. Materializing the
    # inverted index once is the standard derived-index trade at scale;
    # measured at sf0.1 (interleaved 3-way A/B): uncapped 1.37 -> 0.86 s
    # median, capped 1.07 -> 0.91 s, rows identical for both.
    posting = barrier(
        exploded.groupBy("shingle").agg(
            F.sort_array(F.collect_list("doc")).alias("docs")
        ),
        site="dedup:shingle_posting",
    )
    # Per-doc shingle counts derived from the posting lists rather than
    # a second groupBy over `exploded`, so the tokenize/shingle
    # projection never runs a second time; the re-explode of the
    # checkpointed lists is cheap (no regex, reads the cache).
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


# ---------------------------------------------------------------- SimHash

def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """SimHash document fingerprint: per-shingle 64-bit hash, bitwise
    +1/-1 voting, sign → bit. Uses xxhash64 (JVM; no DuckDB twin, so
    this op is verified by property tests, not the SQL oracle).

    Explodes shingles once; the vote is a single groupBy with ``bits``
    conditional sums — one shuffle on the doc id.
    """
    exploded = _spread(df, id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col))).alias("__s"),
    ).select("doc", F.xxhash64("__s").alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    voted = exploded.groupBy("doc").agg(*votes)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long") * (2**b)).otherwise(0)
    return voted.select(F.col("doc").alias(id_col), sig.alias("simhash"))


def simhash_near_dups(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, LSH-style (see
    hamming_near_dups for the pigeonhole chunk-join)."""
    sigs = simhash(df, text_col, id_col, bits)
    return hamming_near_dups(sigs, id_col, "simhash", bits, max_hamming)


def hamming_near_dups(
    sigs: DataFrame, id_col: str, sig_col: str, bits: int, max_hamming: int = 3
) -> DataFrame:
    """All pairs within a Hamming radius over any integer signature
    column (SimHash text fingerprints, perceptual image hashes, ...),
    without a cross join: split the signature into (max_hamming+1)
    chunks — two signatures within the radius must agree on at least
    one chunk exactly (pigeonhole), so an equi-join on
    (chunk_idx, chunk_value) finds every true pair; the exact
    ``bit_count(xor)`` filter then drops false candidates. Exact
    result, O(n x chunks) shuffled rows instead of O(n^2)."""
    chunks = max_hamming + 1
    width = bits // chunks
    # When bits % chunks != 0, the last chunk takes the remainder bits so
    # every signature bit is covered — otherwise docs differing only in
    # the uncovered top bits would never become candidates (pigeonhole
    # guarantee needs a full partition of the bit range).
    widths = [width] * (chunks - 1) + [bits - width * (chunks - 1)]
    offsets = [width * i for i in range(chunks)]
    chunk_cols = F.array(
        *[
            F.shiftright(F.col(sig_col), off).bitwiseAND(F.lit((1 << w) - 1))
            for off, w in zip(offsets, widths)
        ]
    )
    banded = sigs.select(
        F.col(id_col).alias("doc"),
        F.col(sig_col).alias("__sig"),
        F.posexplode(chunk_cols).alias("chunk_idx", "chunk_val"),
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.__sig").alias("sig_a"),
            F.col("b.__sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------ duplicated substrings

def duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    gram_len: int = 5,
    min_span_tokens: int = 8,
) -> DataFrame:
    """ExactSubstr-style duplicated-SPAN detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): find
    every maximal run of tokens that also occurs elsewhere in the
    corpus — the within-document complement of whole-doc/paragraph
    dedup, which both miss a boilerplate footer pasted into otherwise
    unique pages.

    Method (the distributed re-expression of their suffix-array scan):
    every ``gram_len``-token window of every document is a gram; a gram
    whose corpus-wide occurrence count exceeds one is DUPLICATED (this
    includes a second occurrence inside the same document, matching
    ExactSubstr); consecutive duplicated gram positions within a
    document merge into maximal spans by gaps-and-islands
    (``pos - row_number()``), and spans shorter than
    ``min_span_tokens`` tokens are dropped. A shared run of L >=
    gram_len tokens yields L - gram_len + 1 consecutive duplicated
    grams, so the merged span recovers the full run exactly.

    Returns (id, span_start, span_end, span_tokens): token positions
    are 0-based inclusive of the last token of the last gram.

    Scale: grams stay as strings here because the DuckDB oracle must
    reproduce the keys byte-for-byte; at 100 TB hash each gram to 8
    bytes first (functions.text.rolling_fingerprint's base/modulus) —
    the plan is unchanged. Cost is one corpus-wide hash agg on gram
    (map-side combine collapses within-partition repeats), one
    semi-join of positions against the duplicated-gram set, and one
    per-document window sort (documents are small partitions); no
    self-join and no O(n²) pair generation anywhere.
    """
    from pubg_data_pipeline_spark.functions.text import _ngram_array, word_tokens

    toks = word_tokens(F.lower(F.col(text_col)))
    grams = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(_ngram_array(toks, gram_len)).alias("pos", "gram"),
    )
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("gram")
    )
    dup_pos = grams.join(dup_grams, "gram", "left_semi")
    w = Window.partitionBy("__id").orderBy("pos")
    islands = dup_pos.withColumn("__isl", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy("__id", "__isl")
        .agg(F.min("pos").alias("span_start"), F.max("pos").alias("__last_gram"))
        .select(
            F.col("__id").alias(id_col),
            "span_start",
            (F.col("__last_gram") + gram_len - 1).alias("span_end"),
            (F.col("__last_gram") - F.col("span_start") + gram_len).alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_span_tokens)
    )


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Apply a duplicated-span removal list (:func:`duplicate_spans`
    output) to the corpus: cut the flagged token ranges out of each
    document and re-join the survivors — the remediation half of
    ExactSubstr dedup (detect lists spans; this produces the training
    text). Returns one row PER INPUT DOCUMENT (documents whose every
    token was flagged survive with empty text): (id, clean_text,
    n_kept_tokens). Text is whitespace-normalized lowercase — the same
    canonical form the gram index was built on, so positions line up.

    Scale: tokens anti-join their doc's spans on the doc key with the
    position range as a residual predicate — per-doc fan-out is
    |spans per doc| (a handful), never a corpus-level range join; the
    rebuild is one hash agg collecting each doc's surviving tokens
    (``array_sort`` on the collected (pos, token) structs restores
    order without a window sort)."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("pos", "tok"),
    )
    sp = spans.select(
        F.col(id_col).alias("__id"), "span_start", "span_end"
    )
    kept = toks.join(
        sp,
        (toks["__id"] == sp["__id"])
        & F.col("pos").between(F.col("span_start"), F.col("span_end")),
        "left_anti",
    )
    rebuilt = kept.groupBy("__id").agg(
        F.concat_ws(
            " ",
            F.expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept_tokens"),
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(rebuilt, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept_tokens", F.lit(0)).alias("n_kept_tokens"),
        )
    )


# ------------------------------------------------- incremental ingestion

def write_fingerprint_index(df: DataFrame, path: str, text_col: str, id_col: str) -> None:
    """Persist the corpus's distinct content fingerprints (+ keeper id)
    as the dedup INDEX for incremental ingestion — the layout a rolling
    100 TB pipeline maintains so each new crawl batch dedups against
    history without rescanning the historical text: the index holds one
    md5 per distinct normalized document (32 bytes + id), orders
    smaller than the corpus. At full scale write it bucketed on
    fingerprint (sources/io.py:write_bucketed_table) so the per-batch
    anti-join is shuffle-free on the index side."""
    (
        df.select(
            doc_fingerprint(F.col(text_col)).alias("fingerprint"),
            F.col(id_col).alias("keeper_id"),
        )
        .groupBy("fingerprint")
        .agg(F.min("keeper_id").alias("keeper_id"))
        .write.mode("overwrite")
        .parquet(path)
    )


def incremental_ingest_dedup(
    spark, index_path: str, new_docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Dedup a NEW ingestion batch against the persisted fingerprint
    index AND within itself: rows whose fingerprint already exists in
    history are dropped (anti-join on the index), then one keeper (min
    id) survives per fingerprint inside the batch. Returns
    (id, fingerprint) of the surviving rows — the set to append to
    both the corpus and the index.

    Scale: the anti-join shuffles only the new batch and the (small)
    index, never historical text; within-batch keeper choice is one
    aggregate on the same key."""
    index = spark.read.parquet(index_path).select("fingerprint")
    batch = new_docs.select(
        F.col(id_col).alias("doc_id"), doc_fingerprint(F.col(text_col)).alias("fingerprint")
    )
    fresh = batch.join(index, "fingerprint", "left_anti")
    return (
        fresh.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "fingerprint")
    )


def write_band_index(
    df: DataFrame,
    path: str,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> None:
    """Persist the corpus's MinHash-LSH band keys as the NEAR-dup index
    for incremental ingestion — the fuzzy sibling of
    :func:`write_fingerprint_index` (which only catches byte-identical
    content after normalization). The index holds one
    (band_idx, band_key, keeper_id) row per kept document per band —
    ``bands`` longs + an id per doc, orders smaller than the text —
    so each new crawl batch can be near-dup-checked against ALL of
    history without rescanning or re-shingling historical text. At
    full scale use :func:`write_band_index_table` — the same rows as
    a catalog table bucketed on (band_idx, band_key), which makes the
    per-batch probe join shuffle-free on the index side
    (plan-asserted in tests/test_io.py)."""
    (
        band_table(df, text_col, id_col, num_hashes, bands, shingle_n)
        .select("band_idx", "band_key", F.col("doc").alias("keeper_id"))
        .write.mode("overwrite")
        .parquet(path)
    )


def write_band_index_table(
    df: DataFrame,
    table_name: str,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    num_buckets: int = 32,
) -> None:
    """The full-scale layout :func:`write_band_index`'s docstring
    promises: the same (band_idx, band_key, keeper_id) rows saved as a
    catalog table BUCKETED on (band_idx, band_key) — the index scan
    then already satisfies the probe join's hash distribution, so
    every per-batch probe is shuffle-free on the index side (only the
    O(bands·batch) probe rows are ever exchanged; the index, which is
    orders larger, is read in place). Plan-asserted in
    tests/test_io.py::test_bucketed_band_index_probe_is_shuffle_free_on_index_side."""
    from pubg_data_pipeline_spark.sources.io import write_bucketed_table

    bt = band_table(df, text_col, id_col, num_hashes, bands, shingle_n).select(
        "band_idx", "band_key", F.col("doc").alias("keeper_id")
    )
    write_bucketed_table(bt, table_name, ["band_idx", "band_key"], num_buckets)


def incremental_neardup_ingest_table(
    spark,
    index_table: str,
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """:func:`incremental_neardup_ingest` probing a BUCKETED catalog
    index (:func:`write_band_index_table`) instead of a parquet path —
    identical policy and results; the bucketed layout just drops the
    index-side shuffle from the probe join."""
    bt = band_table(new_docs, text_col, id_col, num_hashes, bands, shingle_n)
    index = spark.table(index_table).select("band_idx", "band_key")
    return neardup_survivor_bands(bt, index)


def incremental_neardup_ingest(
    spark,
    index_path: str,
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dedup a NEW ingestion batch against the persisted band
    index AND within itself; returns the surviving band rows
    (``doc``, ``band_idx``, ``band_key``) — ``doc`` distinct-ed is the
    set to append to the corpus, the rows as-is are the set to append
    to the index (a survivor's FULL band set must be indexed so future
    batches can collide with it on any band).

    Policy (deterministic, O(batch + probed index), no iteration):

    - HISTORY: a batch doc sharing ≥1 (band_idx, band_key) with the
      index is a near-dup of something already ingested — dropped
      (history always wins; the index row's keeper stays).
    - WITHIN BATCH, greedy-by-id: a doc sharing a bucket with ANY
      smaller-id batch doc is dropped — regardless of whether that
      smaller doc itself survives; i.e. a doc survives iff it is the
      bucket minimum in EVERY band bucket it occupies. This is
      STRICTER than sequential first-seen-wins on chains (1~2 and 2~3
      but not 1~3: sequential keeps {1, 3}; this rule keeps {1} —
      doc 3 is beaten by the already-dropped 2) and differs from
      single-linkage closure on forks (a~c and b~c but not a~b keeps
      {a, b}; the closure keeps {a}). For exact transitive clustering
      run the batch analytics path (minhash_candidate_pairs →
      graph.connected_components) instead; an ingest epoch must stay
      one-pass and single-aggregation.

    Scale: the history check shuffles only the batch's O(bands·n) band
    rows and the (semi-join-pruned) index — never historical text; the
    within-batch step is one aggregate + one join on the same
    (band_idx, band_key) key, so all three stages share partitioning."""
    bt = band_table(new_docs, text_col, id_col, num_hashes, bands, shingle_n)
    index = spark.read.parquet(index_path).select("band_idx", "band_key")
    return neardup_survivor_bands(bt, index)


def neardup_survivor_bands(bt: DataFrame, index_bands: DataFrame | None) -> DataFrame:
    """The policy core of :func:`incremental_neardup_ingest`, over an
    already-built band table (and an optional history band set — None
    on the very first ingest epoch, when no index exists yet).

    Shaped as a SINGLE-LINEAGE chain (one left join + window functions)
    on purpose: the band table's upstream is the expensive
    regex-shingle + MinHash projection, and the natural
    semi/anti-self-join formulation places that subtree in the DAG
    once per join branch — measured 4-5 executions per action (AQE
    exchange reuse does not cover it). Here ``bt`` appears exactly
    once, so the shingle pipeline runs once; the windows shuffle only
    the O(bands·n) long-typed band rows (~3x faster at sf0.1)."""
    if index_bands is not None:
        # (band_idx, band_key) may repeat in a bulk-built index (raw
        # history can contain internal near-dups), so distinct before
        # the LEFT join to keep bt's row multiplicity intact.
        idx = (
            index_bands.select("band_idx", "band_key")
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        w_doc = Window.partitionBy("doc")
        bt = (
            bt.join(idx, ["band_idx", "band_key"], "left")
            .withColumn("__hist", F.max(F.coalesce(F.col("__hit"), F.lit(0))).over(w_doc))
            .filter(F.col("__hist") == 0)
            .drop("__hit", "__hist")
        )
    w_bucket = Window.partitionBy("band_idx", "band_key")
    w_doc = Window.partitionBy("doc")
    return (
        bt.withColumn("__min_doc", F.min("doc").over(w_bucket))
        .withColumn(
            "__beaten", F.max((F.col("__min_doc") < F.col("doc")).cast("int")).over(w_doc)
        )
        .filter(F.col("__beaten") == 0)
        .select("doc", "band_idx", "band_key")
    )


def prefix_filtered_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """EXACT Jaccard all-pairs via prefix filtering (AllPairs/PPJoin
    family — Bayardo et al., WWW'07; Vernica et al., SIGMOD'10): the
    lossless scale path between the full inverted index (every posting
    list joined) and the df-cap (changes semantics) / MinHash
    (probabilistic).

    Shingles get a global canonical order (ascending document
    frequency, ties by value). A doc with n shingles indexes only its
    PREFIX — the first ``p = n - ceil(t*n) + 1`` shingles in that
    order. Completeness is one-sided and airtight: if a pair (x, y)
    shares no shingle from x's prefix, then the intersection lives in
    x's suffix, so |x∩y| <= n_x - p_x = ceil(t*n_x) - 1 < t*n_x <=
    t*|x∪y| — i.e. J < t. Hence joining PREFIX entries against FULL
    posting entries of the other side catches every qualifying pair;
    candidates are then exactly verified.

    Why it scales where the full index doesn't: a boilerplate shingle
    in k docs costs the full index O(k²) pairs, but ranks LAST in the
    canonical order, so it almost never lands in any prefix — its join
    fan-out is |prefix entries| * k ~= 0 * k. The hottest keys prune
    themselves, with zero semantic change (pinned equal to the uncapped
    baseline by oracle hash and tests).

    The shingle projection feeds FOUR consumers here (doc frequency,
    ranking, the full probe side, and the verify joins) — pass a
    ``.persist()``-ed :func:`shingle_table` via ``shingles`` so the
    regex tokenizer runs once per corpus scan, not four times (at
    100 TB: write the shingle table out and reuse it)."""
    sh = shingles if shingles is not None else shingle_table(df, text_col, id_col, shingle_n)
    exploded = sh.select("__id", F.explode("__sh").alias("shingle"))
    doc_freq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    # Rarest-first per-doc ordering as ONE hash aggregate + in-array
    # sort (small per-doc arrays, JVM-side) — cheaper than a
    # sort-based window over the whole exploded multiset (measured:
    # the COUNT-over-shingle-partition window form, which saves one
    # exchange on paper, is ~2x slower because WindowExec must SORT
    # every posting by shingle; the agg+join stays hash-based
    # end-to-end). array_sort on (df, shingle) structs is exactly the
    # canonical order.
    ordered = (
        exploded.join(doc_freq, "shingle")
        .groupBy("__id")
        .agg(F.array_sort(F.collect_list(F.struct("__df", "shingle"))).alias("__ord"))
    )
    n = F.size("__ord")
    # Lazy localCheckpoint: `sized` feeds BOTH join legs below (prefix
    # and full-probe), and without the barrier the whole rarest-first
    # ordering chain (doc_freq aggregate + join + collect_list +
    # array_sort over every posting) is planned and EXECUTED twice —
    # at 100 TB that duplicate is a second full-corpus aggregation.
    # Lazy (not eager): the first consumer's action computes and caches
    # it with no extra job barrier — the eager+repartition variant was
    # measured WORSE at sf0.1 (1.98 s vs 1.65 s, the barrier costing
    # more than the duplicate saves at 17 MB), while this lazy form is
    # a wash locally (8-pass interleaved A/B: 1.376 vs 1.394 s min)
    # and strictly halves the ordering work at scale.
    sized = ordered.select(
        "__id",
        "__ord",
        n.alias("__n"),
        (n - F.ceil(F.lit(threshold) * n) + 1).cast("int").alias("__plen"),
    )
    sized = barrier(sized, site="dedup:ppjoin_sized")
    prefix = sized.select(
        F.col("__id").alias("__pid"),
        F.col("__n").alias("__n_p"),
        "__plen",
        F.explode(F.slice("__ord", 1, F.col("__plen"))).alias("__p"),
    ).select("__pid", "__n_p", "__plen", F.col("__p.shingle").alias("shingle"))
    # Probe one direction only: for any qualifying pair the SMALLER
    # id's prefix must hit the other doc's full set (the one-sided
    # completeness bound above holds for either member), so
    # pid < qid keeps every true pair while halving candidate volume.
    # Two further LOSSLESS prunes (both standard in the AllPairs/PPJoin
    # family) collapse the candidate set BEFORE the expensive exact
    # verify — measured 835k -> ~1k survivors at sf0.1 (13.3s -> ~4s):
    #
    # 1. Size filter: J(x,y) >= t forces t*max(|x|,|y|) <= min(|x|,|y|)
    #    (the intersection can't exceed the smaller set). Applied on
    #    the per-match rows so mismatched-size pairs never reach the
    #    pair aggregate.
    # 2. Suffix (positional) bound: instead of DISTINCT-ing matches,
    #    COUNT them — c = |pref(x) ∩ y| — in the same shuffle a
    #    distinct would cost. The unseen part of the intersection lives
    #    in x's suffix, so |x∩y| <= c + (|x| - p_x); J >= t needs
    #    |x∩y| >= t/(1+t)*(|x|+|y|), so any pair whose upper bound
    #    misses that floor cannot qualify. 1e-9 slack keeps float
    #    rounding from dropping a boundary-true pair (prune-side slack
    #    only ever ADMITS extra candidates — exactness lives in the
    #    verify step).
    probe = sized.select(
        F.col("__id").alias("__qid"),
        F.col("__n").alias("__n_q"),
        F.explode("__ord").alias("__q"),
    ).select("__qid", "__n_q", F.col("__q.shingle").alias("shingle"))
    min_overlap = F.lit(threshold / (1.0 + threshold)) * (F.col("__n_p") + F.col("__n_q"))
    candidates = (
        prefix.join(probe, "shingle")
        .filter(F.col("__pid") < F.col("__qid"))
        .filter(
            F.least("__n_p", "__n_q")
            >= F.lit(threshold) * F.greatest("__n_p", "__n_q") - F.lit(1e-9)
        )
        .groupBy("__pid", "__qid", "__n_p", "__n_q", "__plen")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(
            F.col("__c") + (F.col("__n_p") - F.col("__plen")) >= min_overlap - F.lit(1e-9)
        )
        .select(F.col("__pid").alias("id_a"), F.col("__qid").alias("id_b"))
    )
    return jaccard_verify(
        df, candidates, text_col, id_col, shingle_n, threshold, shingles=sh
    )
