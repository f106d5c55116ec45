"""Property tests for the hash-family LLM-pipeline operators that have
no SQL-expressible oracle (MinHash-LSH, SimHash, vector LSH): planted
duplicates must be recovered, and approximate results must be
consistent with the exact brute-force baseline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import dedup, similarity

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
    (4, "completely different words describing an unrelated subject matter entirely"),
    (5, "spark engines shuffle partitions across executors while catalyst optimizes plans"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_minhash_finds_planted_duplicates(spark, docs_df):
    pairs = dedup.minhash_candidate_pairs(docs_df, "text", "doc_id", num_hashes=16, bands=4)
    verified = dedup.jaccard_verify(docs_df, pairs, "text", "doc_id", threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert got[(1, 2)] == 1.0  # exact dup: identical shingle sets
    assert (1, 3) in got and got[(1, 3)] > 0.5  # near dup survives banding
    assert all(4 not in p and 5 not in p for p in got)  # unrelated docs excluded


def test_minhash_hot_bucket_guard_bounds_viral_buckets(spark):
    # 100 TB design gate (r4 verdict finding #1): a viral page — here
    # 2000 byte-identical docs, so every band bucket holds all 2000 —
    # must NOT emit m(m-1)/2 pairs per bucket. With the default star
    # collapse the candidate set is exactly the (keeper, member) star:
    # O(m) rows, and connectivity (hence CC clustering) is preserved.
    m = 2000
    viral = spark.createDataFrame(
        [(i, "the same viral boilerplate page text repeated everywhere online") for i in range(m)]
        + [(m, "an unrelated document about spark physical plans and shuffles")],
        "doc_id int, text string",
    )
    pairs = dedup.minhash_candidate_pairs(
        viral, "text", "doc_id", num_hashes=16, bands=4, max_bucket_size=100
    )
    rows = pairs.collect()
    assert len(rows) == m - 1  # star: keeper 0 -> each of 1..m-1, not ~2e6 pairs
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(0, i) for i in range(1, m)}
    # skip mode drops the viral bucket entirely
    skipped = dedup.minhash_candidate_pairs(
        viral, "text", "doc_id", num_hashes=16, bands=4, max_bucket_size=100, hot_bucket="skip"
    )
    assert skipped.count() == 0


def test_minhash_guard_is_inert_below_cap(spark, docs_df):
    # Buckets at or below the cap must produce the identical pair set
    # as the unguarded join (the guard only rewrites oversized buckets).
    guarded = dedup.minhash_candidate_pairs(docs_df, "text", "doc_id", max_bucket_size=5)
    unguarded = dedup.minhash_candidate_pairs(docs_df, "text", "doc_id", max_bucket_size=None)
    assert {tuple(r) for r in guarded.collect()} == {tuple(r) for r in unguarded.collect()}


def test_minhash_guard_rejects_bad_args(spark, docs_df):
    with pytest.raises(ValueError, match="hot_bucket"):
        dedup.minhash_candidate_pairs(docs_df, "text", "doc_id", hot_bucket="nope")
    # a typo'd mode must raise even when the guard itself is opted out
    with pytest.raises(ValueError, match="hot_bucket"):
        dedup.minhash_candidate_pairs(
            docs_df, "text", "doc_id", max_bucket_size=None, hot_bucket="nope"
        )
    with pytest.raises(ValueError, match="max_bucket_size"):
        dedup.minhash_candidate_pairs(docs_df, "text", "doc_id", max_bucket_size=1)


def test_minhash_guard_emits_no_self_pairs_on_duplicate_id_rows(spark):
    # Duplicate id rows (upstream union without dedupe) must not
    # produce (x, x) pairs from the bucket member arrays — the
    # unguarded a.doc < b.doc join never emits them, and guarded mode
    # must agree.
    text = "the quick brown fox jumps over the lazy dog near the river bank"
    df = spark.createDataFrame(
        [(1, text), (1, text), (2, text), (3, text)], "doc_id int, text string"
    )
    # small-bucket path: distinct member set {1,2,3} -> all i<j pairs
    got = {tuple(r) for r in dedup.minhash_candidate_pairs(
        df, "text", "doc_id", max_bucket_size=1000
    ).collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}, got
    # star path (cap=2 < 3 distinct members): keeper star, still no (1,1)
    got = {tuple(r) for r in dedup.minhash_candidate_pairs(
        df, "text", "doc_id", max_bucket_size=2
    ).collect()}
    assert got == {(1, 2), (1, 3)}, got


def test_ngram_jaccard_matches_minhash_on_dups(spark, docs_df):
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs_df, "text", "doc_id", threshold=0.5).collect()
    }
    assert exact[(1, 2)] == 1.0
    assert (1, 3) in exact


def test_ensure_index_cache_rejects_partial_builds(tmp_path):
    # A crash mid-build leaves a directory without Spark's _SUCCESS
    # marker; ensure_index_cache must rebuild instead of silently
    # trusting it (r4 ADVICE: wrong survivor sets until hand-deleted).
    import os

    from pubg_data_pipeline_spark.plans.base import ensure_index_cache

    path = tmp_path / "idx"
    calls = []

    def build():
        calls.append(1)
        os.makedirs(path, exist_ok=True)
        (path / "part-00000.parquet").write_bytes(b"x")
        (path / "_SUCCESS").write_bytes(b"")

    # partial leftover: data file but no _SUCCESS
    os.makedirs(path)
    (path / "part-00000.parquet").write_bytes(b"stale-partial")
    ensure_index_cache(str(path), build)
    assert calls == [1]  # rebuilt
    assert (path / "part-00000.parquet").read_bytes() == b"x"  # stale file gone
    ensure_index_cache(str(path), build)
    assert calls == [1]  # complete index trusted, no rebuild

    # multi-component index: marker checked in the LAST-written subdir
    path2 = tmp_path / "ivf"
    os.makedirs(path2 / "cells")
    (path2 / "cells" / "_SUCCESS").write_bytes(b"")  # cells done, centers missing

    def build2():
        calls.append(2)
        os.makedirs(path2 / "centers", exist_ok=True)
        (path2 / "centers" / "_SUCCESS").write_bytes(b"")

    ensure_index_cache(str(path2), build2, marker_subdir="centers")
    assert calls == [1, 2]


def test_uncapped_ngram_jaccard_guard_trips_and_escapes(spark, docs_df):
    # The uncapped exact baseline is quadratic in the worst case; it
    # must refuse oversized inputs with a message naming the scale twin,
    # and allow_full=True must be the only escape.
    with pytest.raises(ValueError, match="minhash_near_dups"):
        dedup.ngram_jaccard_pairs(docs_df, "text", "doc_id", guard_max_rows=3)
    got = dedup.ngram_jaccard_pairs(
        docs_df, "text", "doc_id", guard_max_rows=3, allow_full=True
    )
    assert {(r["id_a"], r["id_b"]) for r in got.collect()} >= {(1, 2)}
    # Capped form is the scale path — never guarded.
    dedup.ngram_jaccard_pairs(
        docs_df, "text", "doc_id", max_doc_freq=10, guard_max_rows=3
    ).collect()


def test_cosine_near_dups_guard_trips(spark):
    from pubg_data_pipeline_spark.plans.llm_queries import embedding_cosine_near_dups

    with pytest.raises(ValueError, match="embedding_lsh_topk"):
        embedding_cosine_near_dups(spark, "/root/testdata/sf0.001", guard_max_rows=10)
    ok = embedding_cosine_near_dups(
        spark, "/root/testdata/sf0.001", guard_max_rows=10, allow_full=True
    )
    assert ok.limit(1).count() >= 0


def test_ngram_jaccard_hot_shingle_cap(spark):
    # Plant one boilerplate shingle ("standard license header text")
    # shared by ALL docs — the O(k²) blow-up shape. With the cap below
    # the corpus size, it contributes no pairs: docs related ONLY
    # through the boilerplate must not pair, while genuine near-dups
    # still do (their Jaccard now computed over non-hot shingles only).
    boiler = "standard license header text"
    docs = [
        (1, f"{boiler} alpha beta gamma delta epsilon"),
        (2, f"{boiler} alpha beta gamma delta zeta"),  # near dup of 1
        (3, f"{boiler} one two three four five"),
        (4, f"{boiler} six seven eight nine ten"),
        (5, f"{boiler} eleven twelve thirteen fourteen fifteen"),
        (6, f"{boiler} sixteen seventeen eighteen nineteen twenty"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=0.1, max_doc_freq=3
        ).collect()
    }
    assert (1, 2) in capped  # genuine near dup survives the cap
    assert all(p == (1, 2) for p in capped), (
        f"boilerplate-only pairs leaked through the cap: {sorted(capped)}"
    )
    # Uncapped control: the planted hot shingles pair EVERY doc with
    # every other — the blow-up the cap exists to prevent.
    uncapped = dedup.ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.1).collect()
    assert len(uncapped) == 15  # C(6,2): all-pairs


def test_overlap_coefficient_catches_contained_doc(spark):
    # Doc 2 is a verbatim excerpt of doc 1: every shingle of 2 appears
    # in 1, so overlap == 1.0 while Jaccard is diluted to |A|/|B|.
    long_text = " ".join(f"w{i}" for i in range(40))
    short_text = " ".join(f"w{i}" for i in range(10, 18))  # 8 words inside
    docs = [(1, long_text), (2, short_text), (3, "totally different words here now")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["overlap"])
        for r in dedup.ngram_overlap_pairs(
            df, "text", "doc_id", threshold=0.9, max_doc_freq=None
        ).collect()
    }
    assert got == {(1, 2): (6, 1.0)}  # 8 words -> 6 trigram shingles, all contained
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.0).collect()
    }
    assert jac[(1, 2)] < 0.2  # Jaccard misses the containment


def test_overlap_pairs_respect_doc_freq_cap(spark):
    boiler = "shared footer line text"
    docs = [(i, f"{boiler} unique{i} only{i} words{i} here{i}") for i in range(1, 7)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    capped = dedup.ngram_overlap_pairs(df, "text", "doc_id", threshold=0.1, max_doc_freq=3)
    assert capped.count() == 0  # boilerplate-only relations pruned


def test_prefix_filtered_jaccard_equals_exact_baseline(spark, docs_df):
    # Prefix filtering is LOSSLESS: at every threshold the result must
    # be identical (pairs AND similarity values) to the uncapped
    # inverted-index baseline — that is the whole point of the
    # AllPairs/PPJoin family vs the semantics-changing df-cap.
    for t in (0.1, 0.5, 0.9):
        base = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in dedup.ngram_jaccard_pairs(
                docs_df, "text", "doc_id", threshold=t
            ).collect()
        }
        pref = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in dedup.prefix_filtered_jaccard_pairs(
                docs_df, "text", "doc_id", threshold=t
            ).collect()
        }
        assert pref == base, f"threshold {t}: {pref} != {base}"


def test_prefix_filtered_jaccard_survives_boilerplate_corpus(spark):
    # The corpus that blows up the full inverted index: one shingle in
    # every doc. The hot shingle ranks LAST in the rarest-first
    # canonical order, so at threshold 0.5 it never enters any prefix —
    # yet the result stays exact (the boilerplate-only pairs are below
    # threshold anyway, and genuine near-dups keep their true Jaccard
    # computed over ALL shingles including the hot one).
    boiler = "standard license header text"
    docs = [
        (1, f"{boiler} alpha beta gamma delta epsilon"),
        (2, f"{boiler} alpha beta gamma delta zeta"),
        (3, f"{boiler} one two three four five"),
        (4, f"{boiler} six seven eight nine ten"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    base = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in dedup.ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.5).collect()
    }
    pref = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in dedup.prefix_filtered_jaccard_pairs(
            df, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert pref == base
    assert (1, 2) in pref  # the genuine near dup, exact similarity


def test_incremental_ingest_dedup_against_persisted_index(spark, tmp_path):
    # history indexed once; the new batch drops rows already in history
    # (even under whitespace/case normalization), keeps one keeper per
    # within-batch duplicate group, and passes genuinely new docs.
    hist = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "something old here")],
        "doc_id int, text string",
    )
    path = str(tmp_path / "fp_index")
    dedup.write_fingerprint_index(hist, path, "text", "doc_id")
    batch = spark.createDataFrame(
        [
            (10, "THE  quick   BROWN fox"),  # dup of history doc 1 after normalize
            (11, "a genuinely new document"),
            (12, "a genuinely new document"),  # within-batch dup of 11
            (13, "another brand new one"),
        ],
        "doc_id int, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup.incremental_ingest_dedup(spark, path, batch, "text", "doc_id").collect()
    )
    assert kept == [11, 13]


def test_simhash_identical_docs_hamming_zero(spark, docs_df):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs_df, "text", "doc_id").collect()}
    assert sigs[1] == sigs[2]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dups(docs_df, "text", "doc_id", max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0


def test_simhash_uneven_chunks_cover_all_bits(spark, docs_df):
    # bits=30, max_hamming=3 → 4 chunks of 7/7/7/9 bits; the widened
    # last chunk must still cover the top bits so exact dups (hamming 0,
    # which agree on EVERY chunk) are always candidates.
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dups(
            docs_df, "text", "doc_id", bits=30, max_hamming=3
        ).collect()
    }
    assert pairs[(1, 2)] == 0


def test_lsh_topk_agrees_with_brute_force_on_same_bucket(spark):
    # identical vectors always share a bucket; rank-1 neighbor of a
    # duplicated vector must be its twin under both exact and LSH search
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    queries = df.filter(F.col("vec_id") == 0)
    exact = similarity.brute_force_top_k(df, queries, k=2).collect()
    approx = similarity.lsh_bucketed_top_k(df, queries, dim=4, k=2, n_planes=4).collect()
    assert exact[0]["neighbor_id"] == 1 and exact[0]["cos_sim"] == pytest.approx(1.0)
    assert approx[0]["neighbor_id"] == 1 and approx[0]["cos_sim"] == pytest.approx(1.0)
    # LSH returns a subset of the exact candidate set, never new ids
    assert {r["neighbor_id"] for r in approx} <= {r["neighbor_id"] for r in exact} | {1}


def test_ivf_finds_duplicate_vector_and_recall(spark):
    # planted twin: the duplicated vector must be its query's rank-1
    # neighbor (they always land in the same k-means cell); and with
    # nprobe == nlist the IVF search degenerates to exact search, so
    # its result set must equal brute force
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),  # exact twin of 0
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
        (5, [0.0, 0.9, 0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    queries = df.filter(F.col("vec_id") == 0)
    out = similarity.ivf_top_k(df, queries, dim=4, k=2, nlist=2, nprobe=1).collect()
    assert out[0]["neighbor_id"] == 1 and out[0]["cos_sim"] == pytest.approx(1.0)
    exact = similarity.brute_force_top_k(df, queries, k=3).collect()
    full = similarity.ivf_top_k(df, queries, dim=4, k=3, nlist=2, nprobe=2).collect()
    assert [r["neighbor_id"] for r in full] == [r["neighbor_id"] for r in exact]


def test_ivf_quantizes_in_normalized_space(spark):
    """r5 review fix (execution-confirmed bug): cells must be assigned
    on L2-NORMALIZED vectors. With raw-space cells, a corpus mixing
    small-norm orthogonal vectors and large-norm parallel ones routed
    every query away from its true cosine neighbors (total recall
    collapse); normalized-space cells must recover the exact answer."""
    rows = [(i, [0.01, 0.0, 0.0, 0.0]) for i in range(20)]  # small norm, || query
    rows += [(100 + i, [0.0, 120.0 + i, 0.0, 0.0]) for i in range(20)]  # big norm, orthogonal
    rows.append((999, [1.0, 0.0, 0.0, 0.0]))  # the query itself
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    queries = df.filter(F.col("vec_id") == 999)
    exact = similarity.brute_force_top_k(df, queries, k=3).collect()
    approx = similarity.ivf_top_k(df, queries, dim=4, k=3, nlist=4, nprobe=1).collect()
    assert [r["neighbor_id"] for r in approx] == [r["neighbor_id"] for r in exact]
    assert approx[0]["cos_sim"] == pytest.approx(1.0)  # found the parallel family
    pq = similarity.ivfpq_top_k(
        df, queries, dim=4, k=3, nlist=4, nprobe=1, m=2, ksub=4, refine=4
    ).collect()
    assert pq[0]["cos_sim"] == pytest.approx(1.0)


def test_ivf_empty_corpus_returns_empty_not_crash(spark, tmp_path):
    empty = spark.createDataFrame([], "vec_id int, embedding array<double>")
    queries = spark.createDataFrame([(0, [1.0, 0.0, 0.0, 0.0])], "vec_id int, embedding array<double>")
    assert similarity.ivf_top_k(empty, queries, dim=4, k=2, nlist=2).count() == 0
    assert similarity.ivfpq_top_k(empty, queries, dim=4, k=2, nlist=2, m=2, ksub=4).count() == 0
    path = str(tmp_path / "empty_ivf")
    assert similarity.write_ivf_index(empty, path, nlist=2) == []
    assert similarity.ivf_index_top_k(spark, path, queries, k=2).count() == 0


def test_ivfpq_rejects_indivisible_subspaces(spark):
    df = spark.createDataFrame([(0, [1.0] * 10)], "vec_id int, embedding array<double>")
    with pytest.raises(ValueError, match="must divide dim"):
        similarity.ivfpq_top_k(df, df, dim=10, m=4)


def test_balanced_ivf_splits_fat_cells_and_keeps_recall(spark):
    """A clustered corpus (80% of points in one tight blob) makes plain
    k-means concentrate occupancy in a few cells; the balanced trainer
    must split until every cell fits capacity_factor * N / nlist, and
    the balanced index must still serve the planted twin + agree with
    brute force at full probe width."""
    import math

    import numpy as np

    rng = np.random.default_rng(7)
    n_blob, n_rest, nlist = 800, 200, 8
    blob = rng.normal(loc=[10.0, 0.0, 0.0, 0.0], scale=0.05, size=(n_blob, 4))
    rest = rng.normal(loc=0.0, scale=5.0, size=(n_rest, 4))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(np.vstack([blob, rest]))]
    rows.append((1000, rows[0][1]))  # exact twin of vec 0, inside the blob
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    c = df.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    n_total = len(rows)
    capacity = math.ceil(2.0 * n_total / nlist)

    def max_occupancy(centers):
        sizes = (
            c.withColumn("cell", similarity._cell_ranking(centers, F.col("cv"))[0]["cell"])
            .groupBy("cell")
            .count()
            .collect()
        )
        return max(r["count"] for r in sizes)

    plain = similarity.train_ivf_centers(c, nlist, seed=42)
    balanced = similarity.train_ivf_centers_balanced(c, nlist, seed=42)
    assert max_occupancy(plain) > capacity  # the skew is real
    assert max_occupancy(balanced) <= capacity, (
        f"balanced trainer left a cell above capacity={capacity}"
    )
    assert len(balanced) > len(plain)  # splitting grew the center set

    queries = df.filter(F.col("vec_id") == 0)
    got = similarity.ivf_top_k(
        df, queries, dim=4, k=2, nlist=nlist, nprobe=2, balanced=True
    ).collect()
    assert got[0]["neighbor_id"] == 1000 and got[0]["cos_sim"] == pytest.approx(1.0)
    # full probe width over the balanced center set == exact search
    wide = similarity.ivf_top_k(
        df, queries, dim=4, k=5, nlist=nlist, nprobe=len(balanced), balanced=True
    ).collect()
    exact = similarity.brute_force_top_k(df, queries, k=5).collect()
    assert [r["neighbor_id"] for r in wide] == [r["neighbor_id"] for r in exact]


def test_balanced_ivf_duplicate_point_terminates(spark):
    """All-identical corpus: the fat cell is ONE duplicated point —
    splitting cannot help; the trainer must terminate (no-progress
    break) and return a usable center set."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    c = df.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    centers = similarity.train_ivf_centers_balanced(c, nlist=4, seed=1)
    assert 1 <= len(centers) <= 8  # converged, no blow-up


def test_ivf_persisted_index_matches_inmemory_and_prunes_partitions(spark, tmp_path):
    # the on-storage layout (write_ivf_index: cell-partitioned parquet
    # + centers metadata) must serve the same results as the in-memory
    # path at nprobe == nlist, and the probe join must prune the scan
    # to probed cell directories (dynamic partition pruning).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),  # exact twin of 0
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
        (5, [0.0, 0.9, 0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    queries = df.filter(F.col("vec_id") == 0)
    path = str(tmp_path / "ivf")
    centers = similarity.write_ivf_index(df, path, nlist=2, seed=42)
    assert len(centers) == 2

    served = similarity.ivf_index_top_k(spark, path, queries, k=3, nprobe=2).collect()
    exact = similarity.brute_force_top_k(df, queries, k=3).collect()
    assert [r["neighbor_id"] for r in served] == [r["neighbor_id"] for r in exact]

    # narrow probe: rank-1 is still the planted twin
    narrow = similarity.ivf_index_top_k(spark, path, queries, k=2, nprobe=1).collect()
    assert narrow[0]["neighbor_id"] == 1

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = (
        similarity.ivf_index_top_k(spark, path, queries, k=2, nprobe=1)
        ._jdf.queryExecution()
        .explainString(mode)
    )
    assert "PartitionFilters" in plan
    assert "dynamicpruning" in plan.lower(), plan


def test_ivfpq_codes_shape_and_duplicate_vector(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    rows.append((999, list(rows[0][1])))  # exact duplicate of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # codes are m ints, each < ksub
    vecs = df.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    books = similarity.train_pq_codebooks(vecs, dim=16, m=4, ksub=8, seed=1)
    assert len(books) == 4 and all(len(b) <= 8 for b in books)
    coded = df.select(similarity.pq_codes(books, F.col("embedding")).alias("codes")).first()
    assert len(coded["codes"]) == 4
    assert all(0 <= c < 8 for c in coded["codes"])
    # the exact duplicate must be found at rank 1 with cos_sim 1.0:
    # identical vectors share cell AND codes, and the exact re-rank
    # restores full precision
    res = similarity.ivfpq_top_k(
        df, df.filter(F.col("vec_id") == 0), dim=16, k=3,
        nlist=4, nprobe=2, m=4, ksub=8, refine=4,
    )
    top = [r for r in res.collect() if r["rank"] == 1][0]
    assert top["neighbor_id"] == 999
    assert abs(top["cos_sim"] - 1.0) < 1e-9


def test_ivfpq_agrees_with_ivf_routing(spark):
    # With a generous refine budget the ADC shortlist must recover
    # nearly everything plain IVF (same coarse routing, exact in-cell
    # scoring) finds — PQ adds compression, not routing loss.
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = df.filter(F.col("vec_id") < 5)
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_top_k(df, qs, dim=16, k=5, nlist=4, nprobe=2).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivfpq_top_k(
            df, qs, dim=16, k=5, nlist=4, nprobe=2, m=4, ksub=16, refine=16
        ).collect()
    }
    assert len(ivf & pq) / len(ivf) >= 0.8, (ivf - pq, pq - ivf)


def test_ml_lsh_finds_duplicate_vector(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),  # exact twin of 0 -> distance 0
        (2, [0.5, 0.5, 0.0, 0.0]),
        (3, [0.0, 0.0, 5.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    queries = df.filter(F.col("vec_id") == 0)
    out = similarity.ml_euclidean_lsh_top_k(
        df, queries, k=2, max_distance=10.0, bucket_length=1.0
    ).collect()
    assert out[0]["neighbor_id"] == 1 and out[0]["dist"] == pytest.approx(0.0)


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "HELLO\tWORLD"), (4, "other text")],
        "doc_id int, text string",
    )
    groups = dedup.exact_text_dedup(df, "text", "doc_id").collect()
    sizes = sorted(r["group_size"] for r in groups)
    assert sizes == [1, 3]
    keeper = next(r for r in groups if r["group_size"] == 3)
    assert keeper["keeper_id"] == 1


def test_duplicate_spans_recovers_planted_boilerplate(spark):
    # Docs 1 and 2 share a 10-token footer pasted after unique bodies;
    # doc 3 is fully unique. gram_len=5 -> the shared run yields 6
    # consecutive duplicated grams that must merge into ONE maximal
    # span of exactly 10 tokens at the right positions.
    footer = "this content is copyright of the example site network"  # 9 tokens
    rows = [
        (1, "alpha beta gamma delta epsilon " + footer),          # footer at pos 5..13
        (2, "one two three four five six seven " + footer),       # footer at pos 7..15
        (3, "entirely unique words that never repeat anywhere in corpus"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = dedup.duplicate_spans(df, "text", "doc_id", gram_len=5, min_span_tokens=9).collect()
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in out}
    assert got == {(1, 5, 13, 9), (2, 7, 15, 9)}


def test_duplicate_spans_drops_short_and_counts_within_doc(spark):
    # A 5-token run repeated INSIDE one document is duplicated (matches
    # ExactSubstr's any-second-occurrence rule) but each span is only 5
    # tokens, so min_span_tokens=8 drops it; lowering the floor keeps it.
    rows = [
        (1, "aa bb cc dd ee xx yy zz ww vv aa bb cc dd ee"),
        (2, "totally different filler words with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    assert dedup.duplicate_spans(df, "text", "doc_id", gram_len=5, min_span_tokens=8).count() == 0
    kept = dedup.duplicate_spans(df, "text", "doc_id", gram_len=5, min_span_tokens=5).collect()
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in kept}
    assert got == {(1, 0, 4, 5), (1, 10, 14, 5)}


def test_remove_spans_cuts_planted_footer_and_keeps_unique_docs(spark):
    footer = "this content is copyright of the example site network"
    rows = [
        (1, "alpha beta gamma delta epsilon " + footer),
        (2, "one two three four five six seven " + footer),
        (3, "entirely unique words that never repeat anywhere in corpus"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    spans = dedup.duplicate_spans(df, "text", "doc_id", gram_len=5, min_span_tokens=9)
    out = {r.doc_id: r for r in dedup.remove_spans(df, spans, "text", "doc_id").collect()}
    assert out[1].clean_text == "alpha beta gamma delta epsilon"
    assert out[1].n_kept_tokens == 5
    assert out[2].clean_text == "one two three four five six seven"
    assert out[3].clean_text == rows[2][1]  # untouched, already lowercase
    assert out[3].n_kept_tokens == 9


def test_ann_recall_query_bounds_and_exact_identity(spark):
    from tests.conftest import SF_DIR
    from pubg_data_pipeline_spark.plans.llm_queries import embedding_ann_recall
    from pubg_data_pipeline_spark.sources.tables import load_table

    rows = embedding_ann_recall(spark, SF_DIR).collect()
    assert len(rows) == 5  # one row per query vector
    for r in rows:
        assert r["k"] == 5
        assert 0 <= r["n_hit"] <= 5
        assert 0.0 <= r["recall_at_5"] <= 1.0
        assert r["recall_at_5"] == round(r["n_hit"] / r["k"], 4)

    # exact-vs-exact sanity: recall of brute force against itself is 1
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    exact = similarity.brute_force_top_k(
        emb, q, id_col="vec_id", vec_col="embedding", k=5, round_digits=6
    )
    self_join = exact.alias("a").join(
        exact.alias("b"),
        (F.col("a.query_id") == F.col("b.query_id"))
        & (F.col("a.neighbor_id") == F.col("b.neighbor_id")),
        "left_semi",
    )
    assert self_join.count() == exact.count()


def test_minhash_dedup_recall_subset_and_range(spark):
    from tests.conftest import SF_DIR
    from pubg_data_pipeline_spark.plans.llm_queries import minhash_dedup_recall

    row = minhash_dedup_recall(spark, SF_DIR).collect()[0]
    # verified-LSH pairs are a subset of exact pairs: found <= exact,
    # missed is their exact difference, recall in [0, 1]
    assert row["n_found"] <= row["n_exact"]
    assert row["n_missed"] == row["n_exact"] - row["n_found"]
    assert 0.0 <= row["recall"] <= 1.0
    # on the synthetic corpus with planted near-dups the LSH config
    # (16 hashes / 4 bands) should catch most exact pairs
    assert row["n_exact"] > 0
    assert row["recall"] >= 0.5
