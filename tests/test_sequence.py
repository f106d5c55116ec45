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


def test_pattern_builders_escape_and_reject_delimiter():
    """Advice r6: step tokens are escaped (metacharacters match
    themselves literally in both dialects) and delimiter-bearing
    tokens are rejected — 'a+b' must match only the literal token."""
    import re

    pat = sequence.subsequence_pattern("a+b", "c.d")
    assert re.search(pat, ">a+b>c.d") is not None
    assert re.search(pat, ">aab>cxd") is None  # '+'/'.' are NOT regex ops
    adj = sequence.adjacency_pattern("x(y)", "z|w")
    assert re.search(adj, ">x(y)>z|w") is not None
    assert re.search(adj, ">xy>z") is None
    for builder in (
        sequence.subsequence_pattern,
        sequence.adjacency_pattern,
        lambda s: sequence.repetition_pattern(s, 2),
    ):
        with pytest.raises(ValueError):
            builder("x>y")
        with pytest.raises(ValueError):
            builder("")


def test_fold_raises_on_delimiter_in_event_type(spark):
    """An event type containing '>' would silently change match
    semantics on BOTH engines (parity could not catch it) — the fold
    must fail loud instead."""
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1, "bad>type")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(Exception, match="sequence delimiter"):
        sequence.session_sequences(df).collect()


def test_repetition_pattern_semantics():
    import re

    pat = sequence.repetition_pattern("error", 2)
    assert re.search(pat, ">error>error") is not None
    assert re.search(pat, ">a>error>error>b") is not None
    assert re.search(pat, ">error") is None
    assert re.search(pat, ">error>a>error") is None  # not consecutive
    assert re.search(pat, ">errorx>error") is None  # whole tokens only
    assert re.search(sequence.repetition_pattern("error", 3), ">error>error") is None
    with pytest.raises(ValueError):
        sequence.repetition_pattern("error", 0)
    with pytest.raises(ValueError):
        sequence.repetition_pattern("error", 3, 2)


def test_repetition_property_vs_python_reference():
    """Hypothesis: repetition_pattern(step, m) == 'some run of step has
    length >= m' on random token sequences."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.sampled_from(["a", "b", "error"])

    def ref_run(tokens, step, m):
        run = best = 0
        for t in tokens:
            run = run + 1 if t == step else 0
            best = max(best, run)
        return best >= m

    @settings(max_examples=200, deadline=None)
    @given(
        tokens=st.lists(token, min_size=1, max_size=10),
        step=token,
        m=st.integers(min_value=1, max_value=4),
    )
    def check(tokens, step, m):
        seq = sequence.SEQ_SEP + sequence.SEQ_SEP.join(tokens)
        got = re.search(sequence.repetition_pattern(step, m), seq) is not None
        assert got == ref_run(tokens, step, m), (tokens, step, m)

    check()


def test_max_events_per_session_bounds_fold(spark):
    """Round-7 enforcement of the pathological-session bound: a
    never-breaking single-key stream (events 1s apart, gap 30 min)
    concentrates into ONE session; with the cap, the fold keeps only
    the first N events in canonical order, flags `truncated`, and
    reports the TRUE n_events."""
    rows = [(i, f"2024-01-01 10:{i // 60:02d}:{i % 60:02d}", 1, f"e{i:03d}") for i in range(90)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sequence.session_sequences(df, max_events_per_session=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 90 and r["truncated"]
    toks = r["seq"].split(sequence.SEQ_SEP)[1:]
    assert toks == [f"e{i:03d}" for i in range(10)]  # keep-FIRST, canonical order
    # under-cap session: untruncated, full sequence
    small = sequence.session_sequences(
        df.limit(5), max_events_per_session=10
    ).collect()[0]
    assert small["n_events"] == 5 and not small["truncated"]
    assert len(small["seq"].split(sequence.SEQ_SEP)) - 1 == 5
    with pytest.raises(ValueError):
        sequence.session_sequences(df, max_events_per_session=0)


def test_max_events_cap_property(spark):
    """Hypothesis over session sizes and caps: token count ==
    min(n, cap), truncated == (n > cap), prefix == first min(n, cap)
    event types in canonical order. One Spark job per example, many
    users per job (each user is an independent case)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=6),
        cap=st.integers(min_value=1, max_value=12),
    )
    def check(sizes, cap):
        rows = [
            (u * 1000 + i, f"2024-01-01 10:{i // 60:02d}:{i % 60:02d}", u, f"t{i:02d}")
            for u, n in enumerate(sizes)
            for i in range(n)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {
            r["user_id"]: r
            for r in sequence.session_sequences(df, max_events_per_session=cap).collect()
        }
        assert len(got) == len(sizes)
        for u, n in enumerate(sizes):
            r = got[u]
            toks = r["seq"].split(sequence.SEQ_SEP)[1:]
            assert r["n_events"] == n
            assert r["truncated"] == (n > cap)
            assert toks == [f"t{i:02d}" for i in range(min(n, cap))]

    check()


def test_funnel_step_times_semantics(spark, events):
    """Cross-row measures: first-match skip-to-next binding. Session
    (1,1) completes view->click->purchase with the error skipped;
    session (1,2) lacks view so NOTHING binds (later steps require the
    earlier slot); user 2's out-of-order session binds only 'view'
    (its click precedes it, its purchase precedes both)."""
    ft = {
        (r["user_id"], r["session_id"]): r
        for r in sequence.funnel_step_times(
            events, ["view", "click", "purchase"]
        ).collect()
    }
    r11 = ft[(1, 1)]
    assert r11["completed"]
    assert [str(t) for t in r11["step_ts"]] == [
        "2024-01-01 10:00:00",
        "2024-01-01 10:05:00",
        "2024-01-01 10:10:00",
    ]
    r12 = ft[(1, 2)]
    assert not r12["completed"] and r12["step_ts"] == [None, None, None]
    r21 = ft[(2, 1)]
    assert not r21["completed"]
    assert str(r21["step_ts"][0]) == "2024-01-01 09:20:00"
    assert r21["step_ts"][1] is None and r21["step_ts"][2] is None


def test_funnel_step_times_repeated_step_and_whole_history(spark):
    """steps may repeat ('click','click' needs two distinct clicks —
    one event can never fill two slots); gap_seconds=None binds across
    session boundaries (whole-journey funnels)."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click"),
        # >30 min later: a second session — whole-history mode must
        # still bind it as step 2
        (2, "2024-01-01 11:00:00", 1, "click"),
        (3, "2024-01-01 09:00:00", 2, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["user_id"]: r
        for r in sequence.funnel_step_times(
            df, ["click", "click"], gap_seconds=None
        ).collect()
    }
    assert got[1]["completed"]
    assert [str(t) for t in got[1]["step_ts"]] == [
        "2024-01-01 10:00:00",
        "2024-01-01 11:00:00",
    ]
    assert not got[2]["completed"]  # single click cannot fill both slots
    assert str(got[2]["step_ts"][0]) == "2024-01-01 09:00:00"
    # sessionized mode: the two clicks are in DIFFERENT sessions -> no
    # session completes
    sess = sequence.funnel_step_times(df, ["click", "click"]).collect()
    assert all(not r["completed"] for r in sess)


def test_streaming_cap_flags_truncated(spark, tmp_path):
    """The streaming twin's cap: emitted seq sliced to the first N
    events in canonical order, truncated flag set, true n_events."""
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
    rows = [(i, f"2024-01-01T10:00:{i:02d}", 1, f"e{i}") for i in range(15)]
    rows.append((99, "2024-01-02T12:00:00", 999, "view"))  # watermark sentinel
    src = tmp_path / "cap_events"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for eid, ts, uid, et in rows:
            f.write(
                _json.dumps({"event_id": eid, "ts": ts, "user_id": uid, "event_type": et})
                + "\n"
            )
    out = sequence.match_event_pattern_stream(
        sources.json_file_stream(spark, str(src), schema),
        sequence.adjacency_pattern("e0", "e1"),
        max_events_per_session=5,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("seq_cap_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        r
        for r in spark.sql("SELECT * FROM seq_cap_stream").collect()
        if r["user_id"] != 999
    ]
    assert len(got) == 1
    r = got[0]
    assert r["n_events"] == 15 and r["truncated"] and r["matched"]
    assert r["seq"].split(sequence.SEQ_SEP)[1:] == [f"e{i}" for i in range(5)]


def test_funnel_step_times_stream_agrees_with_batch(spark, tmp_path):
    """funnel_step_times_stream: the same measures fold under a
    watermarked session_window — emitted step timestamps must equal
    the batch form's on boundary-free data."""
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
        (4, "2024-01-01T10:10:00", 1, "purchase"),   # completes
        (5, "2024-01-01T12:00:00", 1, "click"),
        (6, "2024-01-01T12:01:00", 1, "purchase"),   # no view: nothing binds
        (99, "2024-01-02T12:00:00", 999, "view"),    # watermark sentinel
    ]
    src = tmp_path / "funnel_events"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for eid, ts, uid, et in rows:
            f.write(
                _json.dumps({"event_id": eid, "ts": ts, "user_id": uid, "event_type": et})
                + "\n"
            )
    out = sequence.funnel_step_times_stream(
        sources.json_file_stream(spark, str(src), schema),
        ["view", "click", "purchase"],
    )
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["session_start"])): (
            [str(t) if t else None for t in r["step_ts"]],
            r["completed"],
            r["n_events"],
        )
        for r in spark.sql("SELECT * FROM funnel_stream").collect()
        if r["user_id"] != 999
    }
    assert got == {
        (1, "2024-01-01 10:00:00"): (
            ["2024-01-01 10:00:00", "2024-01-01 10:05:00", "2024-01-01 10:10:00"],
            True,
            4,
        ),
        (1, "2024-01-01 12:00:00"): ([None, None, None], False, 2),
    }
    # batch twin binds identically on this boundary-free data
    batch = spark.createDataFrame(
        [(e, t.replace("T", " "), u, et) for e, t, u, et in rows if u != 999],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got_batch = {
        r["session_id"]: ([str(t) if t else None for t in r["step_ts"]], r["completed"])
        for r in sequence.funnel_step_times(batch, ["view", "click", "purchase"]).collect()
    }
    assert got_batch == {
        1: (["2024-01-01 10:00:00", "2024-01-01 10:05:00", "2024-01-01 10:10:00"], True),
        2: ([None, None, None], False),
    }


def test_funnel_fold_buffer_holds_only_step_relevant_events(spark):
    """The measures fold collects ONLY events whose type is a funnel
    step (irrelevant types can never bind a slot) while n_events still
    counts every row — binding identical under a flood of noise."""
    rows = [(i, f"2024-01-01 10:{i // 60:02d}:{i % 60:02d}", 1, f"noise{i}") for i in range(200)]
    rows += [
        (900, "2024-01-01 10:00:30", 1, "view"),
        (901, "2024-01-01 10:01:30", 1, "click"),
        (902, "2024-01-01 10:02:30", 1, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sequence.funnel_step_times(df, ["view", "click", "purchase"]).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_events"] == 203  # full session size, not just the 3 steps
    assert r["completed"]
    assert [str(t) for t in r["step_ts"]] == [
        "2024-01-01 10:00:30",
        "2024-01-01 10:01:30",
        "2024-01-01 10:02:30",
    ]


def test_funnel_binding_property_vs_python_reference(spark):
    """Hypothesis: the measures fold's first-match skip-to-next binding
    equals a trivial Python walker on random event sequences and random
    step lists. Many users per example -> one Spark job checks a whole
    batch of cases."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.sampled_from(["view", "click", "purchase", "error"])

    def ref_bind(tokens, steps):
        """Walk tokens in order; slot i binds the first token equal to
        steps[i] strictly after slot i-1's binding."""
        out = [None] * len(steps)
        i = 0
        for pos, t in enumerate(tokens):
            if i < len(steps) and t == steps[i]:
                out[i] = pos
                i += 1
        return out

    @settings(max_examples=10, deadline=None)
    @given(
        cases=st.lists(
            st.lists(token, min_size=1, max_size=12), min_size=1, max_size=8
        ),
        steps=st.lists(token, min_size=1, max_size=4),
    )
    def check(cases, steps):
        rows = [
            (u * 100 + pos, f"2024-01-01 10:{pos:02d}:00", u, t)
            for u, tokens in enumerate(cases)
            for pos, t in enumerate(tokens)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {
            r["user_id"]: r["step_ts"]
            for r in sequence.funnel_step_times(
                df, list(steps), gap_seconds=None
            ).collect()
        }
        for u, tokens in enumerate(cases):
            want = ref_bind(tokens, list(steps))
            got_ts = got[u]
            for i, pos in enumerate(want):
                if pos is None:
                    assert got_ts[i] is None, (tokens, steps, i)
                else:
                    assert got_ts[i] is not None, (tokens, steps, i)
                    assert got_ts[i].minute == pos, (tokens, steps, i)

    check()


def test_funnel_step_times_non_timestamp_ts_dtypes(spark):
    """The t{i} accumulator slots derive their dtype from the actual ts
    column (round-7 ADVICE): a numeric-epoch or timestamp_ntz ts column
    must plan and bind, not fail F.aggregate analysis on a hardcoded
    'timestamp' init."""
    rows = [(1, 10, 7, "a"), (2, 20, 7, "b"), (3, 30, 7, "c")]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string"
    )
    out = sequence.funnel_step_times(df, ["a", "c"], gap_seconds=None).collect()
    assert out[0]["step_ts"] == [10, 30] and out[0]["completed"]

    ntz = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7, "a"), (2, "2024-01-01 10:05:00", 7, "b")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = sequence.funnel_step_times(ntz, ["a", "b"], gap_seconds=None).collect()
    assert got[0]["completed"] and got[0]["step_ts"][0].minute == 0
