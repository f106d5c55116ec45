"""Event-sequence pattern matching (operators/sequence.py): semantics
of the fold + the two pattern builders, ordering determinism, and
parity of the registered query with its oracle (the full-gate replica
in test_oracle_parity.py covers it too; the focused case here pins the
EDGE semantics small data can show precisely)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import sequence


@pytest.fixture()
def events(spark):
    rows = [
        # user 1, session A: view .. click .. purchase (subsequence,
        # NOT adjacent — an error sits between click and purchase)
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:05:00", 1, "click"),
        (3, "2024-01-01 10:06:00", 1, "error"),
        (4, "2024-01-01 10:10:00", 1, "purchase"),
        # user 1, session B (>30 min later): click immediately then
        # purchase (adjacent) but no view -> funnel must NOT match
        (5, "2024-01-01 12:00:00", 1, "click"),
        (6, "2024-01-01 12:01:00", 1, "purchase"),
        # user 2, one session: purchase BEFORE view/click — order matters,
        # neither pattern matches
        (7, "2024-01-01 09:00:00", 2, "purchase"),
        (8, "2024-01-01 09:10:00", 2, "click"),
        (9, "2024-01-01 09:20:00", 2, "view"),
        # user 3: same-timestamp tie broken by event_id (20 before 21)
        (21, "2024-01-01 08:00:00", 3, "purchase"),
        (20, "2024-01-01 08:00:00", 3, "click"),
    ]
    return spark.createDataFrame(
        [(i, ts, u, t) for i, ts, u, t in rows],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_session_sequences_fold_is_ordered_and_delimited(spark, events):
    seqs = {
        (r["user_id"], r["session_id"]): r["seq"]
        for r in sequence.session_sequences(events).collect()
    }
    assert seqs[(1, 1)] == ">view>click>error>purchase"
    assert seqs[(1, 2)] == ">click>purchase"
    assert seqs[(2, 1)] == ">purchase>click>view"
    # tie on ts: event_id 20 (click) sorts before 21 (purchase)
    assert seqs[(3, 1)] == ">click>purchase"


def test_subsequence_vs_adjacency_semantics(spark, events):
    funnel = sequence.subsequence_pattern("view", "click", "purchase")
    adjacent = sequence.adjacency_pattern("click", "purchase")
    m = sequence.match_event_pattern(events, funnel)
    got = {(r["user_id"], r["session_id"]): r["matched"] for r in m.collect()}
    assert got == {(1, 1): True, (1, 2): False, (2, 1): False, (3, 1): False}
    seqs = sequence.session_sequences(events)
    adj = {
        (r["user_id"], r["session_id"]): r["m"]
        for r in seqs.select(
            "user_id", "session_id",
            sequence.matches_pattern(F.col("seq"), adjacent).alias("m"),
        ).collect()
    }
    # session A has error between click and purchase -> adjacency fails
    assert adj == {(1, 1): False, (1, 2): True, (2, 1): False, (3, 1): True}


def test_token_boundaries_cannot_false_match(spark):
    """Steps must match WHOLE tokens: 'view' must not match inside
    'view_item' (middle steps are guarded by the next step's leading
    '>', the final step by the builders' (?:>|$) terminator)."""
    df = spark.createDataFrame(
        [
            # middle-step prefix trap: view_item then purchase
            (1, "2024-01-01 10:00:00", 1, "view_item"),
            (2, "2024-01-01 10:01:00", 1, "purchase"),
            # final-step prefix trap: view then purchase_intl
            (3, "2024-01-01 10:00:00", 2, "view"),
            (4, "2024-01-01 10:01:00", 2, "purchase_intl"),
            # true match at end of sequence ($ branch of the terminator)
            (5, "2024-01-01 10:00:00", 3, "view"),
            (6, "2024-01-01 10:01:00", 3, "purchase"),
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    pat = sequence.subsequence_pattern("view", "purchase")
    got = {r["user_id"]: r["matched"] for r in sequence.match_event_pattern(df, pat).collect()}
    assert got == {1: False, 2: False, 3: True}


def test_pattern_builders_validate():
    with pytest.raises(ValueError):
        sequence.subsequence_pattern()
    with pytest.raises(ValueError):
        sequence.adjacency_pattern()


def test_streaming_pattern_match_agrees_with_batch(spark, tmp_path):
    """match_event_pattern_stream: watermarked session_window + the
    same canonical fold + regex, drained with availableNow into a
    memory sink. Flags must agree with the batch form on
    boundary-free data (native/batch session twins diverge only on
    exact prev_ts + gap ties, pinned elsewhere)."""
    import json as _json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from pubg_data_pipeline_spark.streaming import sources

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    rows = [
        (1, "2024-01-01T10:00:00", 1, "view"),
        (2, "2024-01-01T10:05:00", 1, "click"),
        (3, "2024-01-01T10:06:00", 1, "error"),
        (4, "2024-01-01T10:10:00", 1, "purchase"),   # funnel matches
        (5, "2024-01-01T12:00:00", 1, "click"),
        (6, "2024-01-01T12:01:00", 1, "purchase"),   # no view -> no match
        (7, "2024-01-01T09:00:00", 2, "purchase"),
        (8, "2024-01-01T09:10:00", 2, "view"),       # wrong order -> no match
        (99, "2024-01-02T12:00:00", 999, "view"),    # watermark sentinel
    ]
    src = tmp_path / "seq_events"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for eid, ts, uid, et in rows:
            f.write(
                _json.dumps(
                    {"event_id": eid, "ts": ts, "user_id": uid, "event_type": et}
                )
                + "\n"
            )
    pat = sequence.subsequence_pattern("view", "click", "purchase")
    out = sequence.match_event_pattern_stream(
        sources.json_file_stream(spark, str(src), schema), pat
    )
    q = (
        out.writeStream.format("memory")
        .queryName("seq_pattern_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["session_start"]), r["matched"])
        for r in spark.sql("SELECT * FROM seq_pattern_stream").collect()
        if r["user_id"] != 999
    }
    assert got == {
        (1, "2024-01-01 10:00:00", True),
        (1, "2024-01-01 12:00:00", False),
        (2, "2024-01-01 09:00:00", False),
    }
    # batch twin agrees on this boundary-free data
    batch = spark.createDataFrame(
        [(e, t.replace("T", " "), u, et) for e, t, u, et in rows if u != 999],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got_batch = {
        (r["user_id"], r["matched"])
        for r in sequence.match_event_pattern(batch, pat).collect()
    }
    assert got_batch == {(u, m) for u, _, m in got}


def test_pattern_match_property_vs_python_reference(spark):
    """Hypothesis: for random event sequences and random step lists,
    the engine's subsequence/adjacency verdicts equal a trivial Python
    reference over the same ordered tokens."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.sampled_from(["view", "click", "purchase", "error", "view_item"])
    seqs = st.lists(token, min_size=1, max_size=8)
    steps = st.lists(token, min_size=1, max_size=3)

    def ref_subsequence(tokens, want):
        i = 0
        for t in tokens:
            if i < len(want) and t == want[i]:
                i += 1
        return i == len(want)

    def ref_adjacent(tokens, want):
        n, m = len(tokens), len(want)
        return any(tokens[i : i + m] == want for i in range(n - m + 1))

    @settings(max_examples=200, deadline=None)
    @given(tokens=seqs, want=steps)
    def check(tokens, want):
        seq = sequence.SEQ_SEP + sequence.SEQ_SEP.join(tokens)
        sub = re.search(sequence.subsequence_pattern(*want), seq) is not None
        adj = re.search(sequence.adjacency_pattern(*want), seq) is not None
        assert sub == ref_subsequence(tokens, want), (tokens, want)
        assert adj == ref_adjacent(tokens, want), (tokens, want)

    check()
