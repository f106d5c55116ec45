"""Opt-in scale stress probe (set SPARK_GRAFT_SCALE_PROBE=1).

The strongest available evidence for the 100×-scale claims short of a
real cluster: (1) the most expensive headline queries' physical plans
must contain no CartesianProduct and no unplanned nested-loop join at
sf0.1; (2) the events-based heavy queries must complete on a
synthesized ~6M-row events table (60× the sf0.1 row count) without
plan degradation or OOM on local[32].

Excluded from the default suite because the 6M-row leg takes minutes;
run explicitly:

    SPARK_GRAFT_SCALE_PROBE=1 python -m pytest tests/test_scale_probe.py -q
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.plans import all_specs

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_PROBE") != "1",
    reason="opt-in scale probe: set SPARK_GRAFT_SCALE_PROBE=1",
)

SF_DIR = "/root/testdata/sf0.1"

# The expensive tail of bench.HEADLINE (r03 timings). part_name_fuzzy_pairs
# and incident_window_purchases intentionally plan broadcast range joins
# (documented banded big-big strategy) — they're asserted cartesian-free
# but exempt from the nested-loop check.
EXPENSIVE = [
    "doc_dup_clusters",
    "doc_ngram_jaccard_pairs",
    "minhash_near_dups",
    "embedding_topk_cosine",
    "corpus_curation_pipeline",
    "token_shard_packing",
    "benchmark_contamination",
    "curriculum_shard_packing",
    "lineitem_running_totals",
    "doc_length_global_rank",
    "image_phash_near_dups",
    "neardup_pagerank",
    "doc_bm25_search",
    "event_user_heavy_hitters",
    "doc_prefix_jaccard_pairs",
    "incremental_neardup_ingest",
    "minhash_dedup_recall",
    "user_conversation_examples",
    "embedding_covariance",
    "order_price_bootstrap_ci",
    "event_user_cms_frequency",
]
NESTED_LOOP_OK = {"part_name_fuzzy_pairs", "incident_window_purchases"}


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_no_join_degradation(plan: str, name: str) -> None:
    """CartesianProduct is always a failure. BroadcastNestedLoopJoin is
    a failure only in its implicit-fallback forms: the engine's scalar
    broadcast pattern — ``crossJoin(F.broadcast(<1-row aggregate>))``
    for global-rank bounds / z-score stats — deliberately plans as
    ``BroadcastNestedLoopJoin BuildRight, Cross`` with a single-row
    build side and is O(n); an Inner/Outer BNLJ with a join condition
    is the non-equi big-big fallback that dies at scale."""
    assert "CartesianProduct" not in plan, f"{name} planned a cartesian product"
    bad = [
        line
        for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line
        and "BuildRight, Cross" not in line
        and "BuildLeft, Cross" not in line
    ]
    assert not bad, f"{name} fell back to a nested-loop join: {bad[:2]}"


@pytest.mark.parametrize("name", EXPENSIVE)
def test_expensive_headline_plan_shape(spark, name):
    plan = _executed_plan(all_specs()[name].fn(spark, SF_DIR))
    if name in NESTED_LOOP_OK:
        assert "CartesianProduct" not in plan, f"{name} planned a cartesian product"
    else:
        _assert_no_join_degradation(plan, name)


@pytest.fixture(scope="module")
def big_events_dir(spark, tmp_path_factory):
    """~6M-row events table with the real schema and realistic key
    cardinalities (50k users, 5 hot event types — the skew shape),
    60× the sf0.1 events row count."""
    d = tmp_path_factory.mktemp("sf_probe")
    types = F.array(*[F.lit(t) for t in ("kill", "death", "assist", "purchase", "error")])
    (
        spark.range(6_000_000)
        .select(
            F.col("id").alias("event_id"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=(F.col("id") % 2_592_000).cast("double"))
            ).alias("ts"),
            F.pmod(F.hash(F.col("id") * 7919), F.lit(50_000)).alias("user_id"),
            types.getItem(F.pmod(F.hash("id"), F.lit(5)).cast("int")).alias("event_type"),
            (F.pmod(F.hash(F.col("id") + 13), F.lit(100_000)) / 100.0).alias("value"),
            F.concat(F.lit('{"k":'), (F.col("id") % 100).cast("string"), F.lit("}")).alias("props"),
        )
        .write.mode("overwrite")
        .parquet(str(d / "events.parquet"))
    )
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "hourly_event_aggregates",
        "zscore_anomalies",
        "moving_avg_trend",
        "event_type_salted_agg",
        "event_enrich_salted_join",
        "last_event_per_user",
        "first_event_per_user_type",
        # round-5 additions over events
        "session_incident_overlap",
        "preference_pairs",
        "user_value_gini",
        "event_hour_chi2",
        "events_t_closeness",
        "daily_spine_rcte",
        # round-6 addition: row-pattern recognition (session fold + regex)
        "session_pattern_match",
    ],
)
def test_events_heavy_queries_survive_6m_rows(spark, big_events_dir, name):
    plan = _executed_plan(all_specs()[name].fn(spark, big_events_dir))
    _assert_no_join_degradation(plan, name)


# ---------------------------------------------------------------------------
# Planted viral corpus: the dedup family's hot-bucket guards at volume.
#
# The round-5 MinHash hot-bucket guard (operators/dedup.py:
# minhash_candidate_pairs) claims O(bucket*cap) candidate generation where
# the unguarded band self-join is O(m^2) per bucket. The 6M-row events
# probe never exercised it — this corpus does: ~1M documents of which a
# 10^5-copy boilerplate page lands every copy in the SAME band bucket in
# all 4 bands. Unguarded that is m(m-1)/2 ~ 5e9 candidate rows from one
# key (a single-task blow-up no partitioning saves); the star guard must
# emit exactly the m-1 keeper edges instead, and the whole pipeline —
# pairing, transitive closure, incremental ingest against a persisted
# band index — must complete on local[32] with candidate counts linear
# in the corpus, not quadratic in the viral page.
#
# Everything here is hash-deterministic (xxhash64 band keys, no RNG), so
# exact-count assertions are stable run to run.
# ---------------------------------------------------------------------------

N_VIRAL_DOCS = 1_000_000
N_COPIES = 100_000  # doc_id % 10 == 0 -> the boilerplate page


@pytest.fixture(scope="module")
def viral_docs(spark):
    boiler = (
        "terms of service all rights reserved contact us privacy policy "
        "cookie settings site map newsletter signup follow us copyright"
    )
    # 12 pseudo-random tokens per distinct doc from a 40k vocabulary:
    # two docs share a 3-gram shingle only if THREE consecutive slots
    # coincide (~1e-13 per pair-position) — cross-doc band collisions
    # outside the planted page are effectively impossible, so counts
    # below isolate the guard's behavior.
    words = [
        F.concat(
            F.lit(f"w{k}x"),
            F.pmod(F.hash(F.col("id") * F.lit(p) + F.lit(k)), F.lit(40_000)).cast(
                "string"
            ),
        )
        for k, p in enumerate((31, 131, 631, 1231, 2131, 3571, 4231, 5531, 6131, 7219, 8317, 9413))
    ]
    return (
        spark.range(N_VIRAL_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 == 0, F.lit(boiler))
            .otherwise(F.concat_ws(" ", *words))
            .alias("text"),
        )
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def viral_star_pairs(spark, viral_docs):
    from pubg_data_pipeline_spark.operators import dedup

    return dedup.minhash_candidate_pairs(
        viral_docs, "text", "doc_id", num_hashes=16, bands=4,
        max_bucket_size=1000, hot_bucket="star",
    ).localCheckpoint(eager=True)


def test_viral_star_guard_candidates_are_linear_not_quadratic(viral_star_pairs):
    """The O(bucket*cap) claim, measured: the 10^5-member bucket must
    contribute its m-1 star edges (keeper doc 0 -> every copy), not
    m(m-1)/2 ~ 5e9 pairs. Total candidates stay O(corpus)."""
    n = viral_star_pairs.count()
    assert n >= N_COPIES - 1
    assert n < 2 * N_VIRAL_DOCS, f"candidate count {n} is not linear in the corpus"
    boiler_pairs = viral_star_pairs.filter(
        (F.col("id_a") % 10 == 0) & (F.col("id_b") % 10 == 0)
    )
    assert boiler_pairs.count() == N_COPIES - 1  # exactly the star, no quadratic leak
    # every star edge anchors at the bucket-min keeper
    assert boiler_pairs.filter(F.col("id_a") != 0).count() == 0


def test_viral_skip_guard_drops_the_bucket(spark, viral_docs):
    from pubg_data_pipeline_spark.operators import dedup

    pairs = dedup.minhash_candidate_pairs(
        viral_docs, "text", "doc_id", num_hashes=16, bands=4,
        max_bucket_size=1000, hot_bucket="skip",
    )
    assert (
        pairs.filter((F.col("id_a") % 10 == 0) & (F.col("id_b") % 10 == 0)).count() == 0
    )


def test_viral_cluster_closure_resolves_one_cluster(spark, viral_star_pairs):
    """Connected components over the star edges: the avalanche closes
    into ONE cluster of exactly the 10^5 copies, keeper = min id = 0 —
    the guard's connectivity-preservation contract, at volume."""
    from pubg_data_pipeline_spark.operators import graph

    clusters = graph.dedup_clusters(viral_star_pairs)
    big = clusters.filter(F.col("n_members") >= 1000).collect()
    assert len(big) == 1
    assert big[0]["cluster_id"] == 0
    assert big[0]["n_members"] == N_COPIES


def test_viral_incremental_ingest_drops_known_boilerplate(spark, viral_docs, tmp_path_factory):
    """A new crawl batch probed against the persisted band index of
    900k history docs: every incoming boilerplate copy collides with
    history and is dropped; the distinct docs survive. The probe join
    touches O(bands*batch) rows — it completes at volume because the
    index carries band keys, never historical text."""
    from pubg_data_pipeline_spark.operators import dedup

    idx = str(tmp_path_factory.mktemp("viral") / "band_index")
    hist = viral_docs.filter(F.col("doc_id") < 900_000)
    batch = viral_docs.filter(F.col("doc_id") >= 900_000)
    dedup.write_band_index(hist, idx, "text", "doc_id")
    survivors = (
        dedup.incremental_neardup_ingest(spark, idx, batch, "text", "doc_id")
        .select("doc")
        .distinct()
    )
    assert survivors.filter(F.col("doc") % 10 == 0).count() == 0
    n = survivors.count()
    assert 85_000 <= n <= 90_000  # the ~90k distinct batch docs survive


# ---------------------------------------------------------------------------
# 1M-vector ANN probe: balanced IVF end-to-end at volume.
#
# The embeddings family's scale claims were previously plan-shaped only
# (sf0.1 = 10k vectors). This corpus makes them empirical: 1M 16-dim
# vectors of which one third form a TIGHT dominant cluster around a
# fixed anchor (the near-dup/one-hot-domain shape that makes a plain
# k-means quantizer dump ~333k vectors into one cell — the skewed-cell
# tail-latency failure train_ivf_centers_balanced exists to fix), plus
# 40 planted query duplicates (query = corpus vector + ~1e-4 jitter).
#
# Proven at volume, not by plan shape:
#   - the planted duplicate IS the global exact top-1 (brute force over
#     all 1M — validates the plant before trusting the ANN number);
#   - balanced IVF (nlist=64, nprobe=8) recalls >= 90% of the planted
#     duplicates end-to-end through train -> assign -> probe -> re-rank;
#   - the balanced quantizer's fattest cell respects the capacity bound
#     (2 * N / nlist), i.e. the 333k-member mega-cell actually got split.
#
# Deterministic: hash-generated vectors, fixed k-means seed on a fixed
# eager checkpoint.
# ---------------------------------------------------------------------------

N_ANN_VECS = 1_000_000
ANN_DIM = 16
ANN_NLIST = 64
ANN_PLANTED = [i * 23_456 + 7 for i in range(40)]  # mixed: ~1/3 in the skew cluster
_ANN_ANCHOR = [math.cos(0.7 * k + 0.25) for k in range(ANN_DIM)]
_QUERY_ID_OFFSET = 10_000_000


def _ann_vec(idc):
    """Deterministic per-id 16-dim vector: uniform-ish in [-1, 1]^16
    from hash bits, except ids % 3 == 0 collapse to anchor + 0.02-scale
    jitter — a third of the corpus inside one tight ball."""
    comps = []
    for k in range(ANN_DIM):
        rnd = (
            F.pmod(F.hash(idc * F.lit(7919) + F.lit(k * 104_729)), F.lit(2001)).cast("double")
            - F.lit(1000.0)
        ) / F.lit(1000.0)
        comps.append(
            F.when(idc % 3 == 0, F.lit(_ANN_ANCHOR[k]) + rnd * F.lit(0.02)).otherwise(rnd)
        )
    return F.array(*comps)


@pytest.fixture(scope="module")
def ann_corpus(spark):
    return (
        spark.range(N_ANN_VECS)
        .select(F.col("id").alias("vec_id"), _ann_vec(F.col("id")).alias("embedding"))
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def ann_queries(spark):
    """40 probes, each a near-exact copy of one planted corpus vector
    (component jitter ~2e-4 — an order tighter than the skew cluster's
    own 0.02 spread, so the plant is unambiguously the nearest point).
    Query ids live in a disjoint range so the self-match filter can't
    hide the planted neighbor."""
    ids = spark.createDataFrame([(int(i),) for i in ANN_PLANTED], "ref_id bigint")
    jittered = F.transform(
        _ann_vec(F.col("ref_id")),
        lambda x, i: x
        + (
            F.pmod(F.hash(F.col("ref_id") * F.lit(13) + i), F.lit(201)).cast("double")
            - F.lit(100.0)
        )
        / F.lit(500_000.0),
    )
    return ids.select(
        (F.col("ref_id") + F.lit(_QUERY_ID_OFFSET)).alias("vec_id"),
        jittered.alias("embedding"),
    ).localCheckpoint(eager=True)


def test_ann_planted_duplicates_are_exact_top1_at_1m(spark, ann_corpus, ann_queries):
    from pubg_data_pipeline_spark.operators import similarity

    rows = similarity.brute_force_top_k(
        ann_corpus, ann_queries, k=1, dim=ANN_DIM
    ).collect()
    assert len(rows) == len(ANN_PLANTED)
    for r in rows:
        assert r["neighbor_id"] == r["query_id"] - _QUERY_ID_OFFSET
        assert r["cos_sim"] > 0.999


def test_ann_balanced_ivf_recalls_planted_duplicates_at_1m(spark, ann_corpus, ann_queries):
    from pubg_data_pipeline_spark.operators import similarity

    res = similarity.ivf_top_k(
        ann_corpus,
        ann_queries,
        dim=ANN_DIM,
        k=1,
        nlist=ANN_NLIST,
        nprobe=8,
        balanced=True,
        cache_key="scale_probe_ann_1m",
    )
    hits = res.filter(
        (F.col("rank") == 1)
        & (F.col("neighbor_id") == F.col("query_id") - F.lit(_QUERY_ID_OFFSET))
    ).count()
    assert hits >= int(0.9 * len(ANN_PLANTED)), f"IVF recall {hits}/{len(ANN_PLANTED)}"


def test_ann_balanced_quantizer_bounds_the_skew_cell_at_1m(spark, ann_corpus):
    from pubg_data_pipeline_spark.operators import similarity

    c = similarity._l2_normalized(
        ann_corpus.select(
            F.col("vec_id").alias("neighbor_id"),
            similarity.as_double_vec(F.col("embedding")).alias("cv"),
        ),
        "cv",
    )
    centers = similarity.train_ivf_centers_balanced(c, nlist=ANN_NLIST, seed=42)
    assert len(centers) > ANN_NLIST  # the mega-cell forced extra sub-centers
    assigned = c.withColumn("cell", similarity._cell_ranking(centers, F.col("cv"))[0]["cell"])
    max_cell = assigned.groupBy("cell").count().agg(F.max("count")).first()[0]
    capacity = math.ceil(2.0 * N_ANN_VECS / ANN_NLIST)
    assert max_cell <= capacity, (
        f"fattest cell holds {max_cell} vectors > capacity {capacity}: "
        "the skewed third survived the balanced split"
    )


# ---------------------------------------------------------------------------
# Streaming row-pattern twin at volume (round 7): match_event_pattern_stream
# was drained end-to-end only on toy data (tests/test_sequence.py). This
# replays a 6M-row, event-time-ORDERED burst corpus (600k sessions of 10
# events) through the watermarked session_window fold via availableNow and
# asserts (a) every emitted session agrees CELL-EXACTLY with the batch twin
# run from the same expressions, (b) every session comfortably older than
# the watermark was emitted (no silent loss), and (c) the state store's
# peak row count stayed bounded by the open-session population, not the
# stream length. One ts-sorted file keeps the file-source ordering
# deterministic (ts = burst*3600 + i*60 — monotone in id, no wrap).


@pytest.fixture(scope="module")
def burst_events_file(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_probe")
    types = F.array(*[F.lit(t) for t in ("kill", "death", "assist", "purchase", "error")])
    (
        spark.range(6_000_000)
        .select(
            F.col("id").alias("event_id"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(
                    secs=((F.col("id") / 10).cast("long") * 3600
                          + (F.col("id") % 10) * 60).cast("double")
                )
            ).alias("ts"),
            ((F.col("id") / 10).cast("long") % 50_000).alias("user_id"),
            types.getItem(F.pmod(F.hash("id"), F.lit(5)).cast("int")).alias("event_type"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(d / "events"))
    )
    return str(d / "events")


def test_streaming_pattern_twin_matches_batch_at_6m(spark, burst_events_file, tmp_path_factory):
    from pubg_data_pipeline_spark.operators import sequence

    pat = sequence.subsequence_pattern("kill", "purchase")
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    out_dir = tmp_path_factory.mktemp("stream_probe_out")
    sink = str(out_dir / "flags")
    ckpt = str(out_dir / "ckpt")
    stream = spark.readStream.schema(schema).parquet(burst_events_file)
    q = (
        sequence.match_event_pattern_stream(stream, pat, watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    peak_state = max(
        (op["numRowsTotal"] for p in q.recentProgress for op in p["stateOperators"]),
        default=0,
    )

    got = spark.read.parquet(sink)
    # batch twin: the SAME operator over the same file — withWatermark
    # is a no-op on a batch frame, so expressions are plan-identical
    batch = sequence.match_event_pattern_stream(
        spark.read.schema(schema).parquet(burst_events_file), pat, watermark="2 hours"
    )
    n_stream = got.count()
    assert n_stream > 500_000  # volume actually flowed

    # (a) cell-exact agreement for every emitted session
    cols = ["user_id", "session_start", "session_end", "n_events", "seq", "truncated", "matched"]
    mismatched = got.select(cols).exceptAll(batch.select(cols)).count()
    assert mismatched == 0, f"{mismatched} emitted sessions disagree with the batch twin"

    # (b) no silent loss: sessions ending well before the final
    # watermark (max event time - 2h delay - 2h margin) must ALL have
    # emitted
    max_ts = spark.read.parquet(burst_events_file).agg(F.max("ts")).first()[0]
    import datetime

    cutoff = max_ts - datetime.timedelta(hours=4)
    must_emit = batch.filter(F.col("session_end") < F.lit(cutoff)).count()
    emitted_early = got.filter(F.col("session_end") < F.lit(cutoff)).count()
    assert emitted_early == must_emit, (
        f"{must_emit - emitted_early} watermark-safe sessions never emitted"
    )

    # matches really occur at volume (kill..purchase inside 10-event bursts)
    assert got.filter("matched").count() > 100_000
    # the 10k default cap never fires on 10-event sessions
    assert got.filter("truncated").count() == 0

    # (c) bounded state: peak state rows stay in the same order as the
    # session population (no unbounded per-event state); 2x slack for
    # windows awaiting the watermark across batch boundaries
    assert 0 < peak_state <= 2 * 600_000, f"peak state rows {peak_state}"


def test_snapshot_cdf_tails_millions_of_rows_in_arrow_batches(spark, tmp_path_factory):
    """The CDF source at volume: two ~1.5M-row commits (32 files each)
    tailed across two availableNow restarts — the Arrow-record-batch
    read path must move millions of rows through executor tasks (one
    per file) without a driver bottleneck, and the version-offset
    resume must emit each commit exactly once."""
    from pyspark.sql import functions as F  # noqa: F811 - probe-local alias

    from pubg_data_pipeline_spark.sources import snapshot_cdf, snapshots

    snapshot_cdf.register(spark)
    d = tmp_path_factory.mktemp("cdf_probe")
    table = str(d / "tbl")
    sink = str(d / "sink")
    ckpt = str(d / "ckpt")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=(F.col("id") % 86_400).cast("double"))
            ).alias("ts"),
            F.pmod(F.hash("id"), F.lit(1000)).alias("bucket"),
        )

    def drain():
        q = (
            spark.readStream.format("snapshot_cdf")
            .option("path", table)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    snapshots.snapshot_commit(batch(0, 1_500_000).repartition(32), table)
    drain()
    assert spark.read.parquet(sink).count() == 1_500_000
    snapshots.snapshot_commit(batch(1_500_000, 3_000_000).repartition(32), table)
    drain()
    out = spark.read.parquet(sink)
    assert out.count() == 3_000_000  # exactly once per commit, no replays
    agg = out.agg(
        F.min("id").alias("lo"), F.max("id").alias("hi"), F.countDistinct("id").alias("n")
    ).first()
    assert (agg["lo"], agg["hi"], agg["n"]) == (0, 2_999_999, 3_000_000)
    # timestamps survived the arrow unit/tz relabel end-to-end
    ts_bounds = out.agg(F.min("ts").cast("string"), F.max("ts").cast("string")).first()
    assert ts_bounds[0] == "2024-01-01 00:00:00"
    assert ts_bounds[1] == "2024-01-01 23:59:59"


def test_cdf_rewrite_propagation_at_volume(spark, tmp_path_factory):
    """Round-8 CDC at volume: a 2M-row snapshot table maintained into a
    retraction-aware hourly rollup through a DELETE WHERE rewrite. The
    delete epoch must be served from the commit's RECORDED change files
    (O(deleted rows) = ~286k, never a table diff), and the maintained
    state must equal the batch recompute cell-exactly after the delete
    and a subsequent append."""
    import json
    import os as _os

    from pubg_data_pipeline_spark.operators import incremental
    from pubg_data_pipeline_spark.sources import snapshots
    from pubg_data_pipeline_spark.streaming import app

    d = tmp_path_factory.mktemp("cdc_volume")
    src = str(d / "src")
    dst = str(d / "dst")
    ckpt = str(d / "ckpt")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=(F.col("id") % 86_400).cast("double"))
            ).alias("ts"),
            ((F.col("id") % 997).cast("double") / 10.0).alias("value"),
        )

    snapshots.snapshot_commit(batch(0, 2_000_000).repartition(32), src)

    def run():
        q = app.maintain_rollup_table(
            spark, src, dst, app_id="rollup_vol",
            available_now=True, checkpoint=ckpt,
        )
        q.awaitTermination(600)
        q.stop()

    def recompute():
        return {
            tuple(r)
            for r in incremental.finalize_hourly(
                incremental.partial_hourly_state(snapshots.snapshot_read(spark, src))
            ).collect()
        }

    run()
    rep = snapshots.snapshot_delete_where(spark, src, F.col("id") % 7 == 0)
    assert rep["deleted_rows"] == 285_715
    # the rewrite recorded exactly its deleted rows as change data
    m = snapshots._read_manifest(src, rep["version"])
    cfiles = m["change"]["files"]
    assert cfiles and m["change"]["op_hint"] == "delete"
    recorded = spark.read.parquet(
        *[_os.path.join(src, f) for f in cfiles]
    )
    assert recorded.count() == 285_715
    snapshots.snapshot_commit(batch(2_000_000, 2_200_000).repartition(8), src)
    run()  # drains the delete epoch (change files only) + the append
    maintained = {
        tuple(r)
        for r in incremental.finalize_hourly(
            snapshots.snapshot_read(spark, dst)
        ).collect()
    }
    assert maintained == recompute()
