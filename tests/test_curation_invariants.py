"""Structural invariants of the curation/behavior additions that the
cell-hash oracle can't express directly: the packing output must be a
partition of the token stream, and attribution must agree with a
pure-Python replay of each user's event sequence."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.plans.behavior_queries import purchase_attribution
from pubg_data_pipeline_spark.plans.curation_queries import (
    _CTX_TOKENS,
    context_window_packing,
)
from pubg_data_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_context_packing_partitions_the_token_stream(spark):
    frags = context_window_packing(spark, SF_DIR).collect()

    # per-doc: fragments tile [0, n_tok) contiguously, in window order
    by_doc = defaultdict(list)
    for r in frags:
        by_doc[r["doc_id"]].append(r)
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.when(F.trim("text") == "", 0)
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .alias("n_tok"),
    )
    n_tok = {r["doc_id"]: r["n_tok"] for r in docs.collect()}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["window_id"])
        assert rows[0]["start_tok"] == 0
        for a, b in zip(rows, rows[1:]):
            assert a["end_tok"] == b["start_tok"]  # contiguous
            assert b["window_id"] == a["window_id"] + 1  # no window gaps
        assert rows[-1]["end_tok"] == n_tok[doc_id]
        assert all(r["frag_tokens"] == r["end_tok"] - r["start_tok"] for r in rows)

    # per-window: every window except the last carries exactly 512 tokens
    by_win = defaultdict(int)
    for r in frags:
        by_win[r["window_id"]] += r["frag_tokens"]
    last = max(by_win)
    assert set(by_win) == set(range(last + 1))  # dense window ids
    for w, tok in by_win.items():
        if w != last:
            assert tok == _CTX_TOKENS, (w, tok)
    assert 0 < by_win[last] <= _CTX_TOKENS


def test_attribution_matches_python_replay(spark):
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    want = defaultdict(int)
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        first = last = None
        for r in rows:
            if r["event_type"] == "purchase":
                want[(first or "none", last or "none")] += 1
            else:
                last = r["event_type"]
                if first is None:
                    first = r["event_type"]
    got = {
        (r["first_touch"], r["last_touch"]): r["n_purchases"]
        for r in purchase_attribution(spark, SF_DIR).collect()
    }
    assert got == dict(want)


def test_leakage_safe_split_never_splits_a_cluster(spark):
    """The property the oracle hash proves only indirectly: every
    near-dup cluster lands wholly inside ONE split, and the overall
    proportions are in the 80/10/10 ballpark."""
    from pubg_data_pipeline_spark.plans.graph_queries import doc_leakage_safe_split

    rows = doc_leakage_safe_split(spark, SF_DIR).collect()
    by_cluster = defaultdict(set)
    by_split = defaultdict(int)
    for r in rows:
        by_cluster[r["cluster_id"]].add(r["split"])
        by_split[r["split"]] += 1
    assert all(len(s) == 1 for s in by_cluster.values())
    # at least one real (multi-doc) cluster exists in the corpus, so
    # the test exercises the non-trivial path
    n_docs = len(rows)
    assert len(by_cluster) < n_docs
    assert by_split["train"] > by_split["val"] + by_split["test"]


def test_source_capped_sample_plan_and_determinism(spark):
    """Per-source cap must plan a WindowGroupLimit (top-20 per
    partition, not a full per-source sort) and be invariant to input
    partitioning."""
    from pubg_data_pipeline_spark.plans.curation_queries import source_capped_sample

    df = source_capped_sample(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    a = {(r["doc_id"], r["cap_rank"]) for r in df.collect()}
    b = {
        (r["doc_id"], r["cap_rank"])
        for r in source_capped_sample(spark, SF_DIR).repartition(17).collect()
    }
    assert a == b
    counts = defaultdict(int)
    for r in df.select("source").collect():
        counts[r["source"]] += 1
    assert all(c <= 20 for c in counts.values())


def test_conversation_examples_truncate_at_budget(spark):
    from pubg_data_pipeline_spark.plans.behavior_queries import (
        user_conversation_examples,
    )

    rows = user_conversation_examples(spark, SF_DIR).collect()
    assert rows, "expected at least one assembled example"
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for user, turns in by_user.items():
        turns.sort(key=lambda r: r["turn_idx"])
        # contiguous prefix of turn indices starting at 1
        assert [t["turn_idx"] for t in turns] == list(range(1, len(turns) + 1))
        # within budget, and the NEXT turn (if the user had more events)
        # would have exceeded it — i.e. the prefix is maximal
        cum = sum(t["turn_tokens"] for t in turns)
        assert cum <= 64
        # every kept turn cost is positive (budget logic relies on it)
        assert all(t["turn_tokens"] > 0 for t in turns)


def test_conversation_examples_prefix_is_maximal(spark):
    from pubg_data_pipeline_spark.plans.behavior_queries import (
        user_conversation_examples,
    )

    ev = load_table(spark, SF_DIR, "events")
    n_events = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = user_conversation_examples(spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    # Every event cost is at least 6 (+2 over the shortest type 'view'),
    # so any user with spare budget >= 14 (longest type 'purchase' + 2)
    # and unconsumed events would have kept another turn.
    for user, turns in by_user.items():
        cum = sum(t["turn_tokens"] for t in turns)
        if len(turns) < n_events[user]:
            assert cum + 14 > 64, f"user {user} stopped early with budget to spare"


def test_softdedup_weight_mass_equals_deduped_corpus_size(spark):
    from pubg_data_pipeline_spark.plans.graph_queries import (
        doc_corpus_after_dedup,
        doc_softdedup_weights,
    )

    w = doc_softdedup_weights(spark, SF_DIR)
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert w.count() == n_docs  # soft dedup keeps every doc
    # total sampling mass == number of clusters (hard-dedup corpus size)
    mass = w.agg(F.sum(F.col("weight")).alias("m")).collect()[0]["m"]
    hard = doc_corpus_after_dedup(spark, SF_DIR).agg(
        F.sum("n_docs").alias("n")
    ).collect()[0]["n"]
    assert abs(mass - hard) < 0.01  # 6dp-rounded weights, summed


def test_signup_latency_counts_purchase_before_signup_users(spark, tmp_path):
    # a user whose EARLIEST purchase predates their first signup must
    # still convert via a later purchase (min-then-filter dropped them)
    import pandas as pd

    rows = [
        # user 1: purchase BEFORE signup, then one after -> converts, lat 60s
        (1, "purchase", "2024-01-01 09:59:00"),
        (1, "signup", "2024-01-01 10:00:00"),
        (1, "purchase", "2024-01-01 10:01:00"),
        # user 2: only a pre-signup purchase -> no conversion
        (2, "purchase", "2024-01-01 09:00:00"),
        (2, "signup", "2024-01-01 11:00:00"),
    ]
    d = tmp_path / "mini"
    d.mkdir()
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime([r[2] for r in rows]),
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(d / "events.parquet")
    from pubg_data_pipeline_spark.plans.behavior_queries import (
        signup_purchase_latency,
    )

    row = signup_purchase_latency(spark, str(d)).collect()[0]
    assert row["n_converters"] == 1
    assert abs(row["p50_sec"] - 60.0) < 1e-6


def test_sampling_decisions_are_independent_of_split_buckets(spark):
    """The r5 review fix: sampling keep-rules hash a SALTED fingerprint,
    so kept documents must span all three train/val/test splits (the
    unsalted rule kept ONLY train-split docs whenever rate <= 80)."""
    from pubg_data_pipeline_spark.functions.text import (
        rolling_fingerprint,
        split_bucket,
    )

    docs = load_table(spark, SF_DIR, "documents")
    idx = F.substring(F.col("source"), 4, 10).cast("int")
    rate = F.greatest(F.lit(10), F.lit(100) - F.lit(5) * idx)
    keep = (
        F.pmod(rolling_fingerprint(F.concat(F.lit("sample "), F.col("text"))), F.lit(100))
        < rate
    )
    split = split_bucket(rolling_fingerprint(F.col("text")))
    kept_splits = {
        r["split"]
        for r in docs.filter(keep & (rate <= 80))
        .select(split.alias("split"))
        .distinct()
        .collect()
    }
    assert kept_splits == {"train", "val", "test"}, (
        f"sampled docs collapsed onto splits {kept_splits} — sampling is "
        "correlated with the split assignment again"
    )
