"""Event-sequence pattern matching over sessions (MATCH_RECOGNIZE class).

The SQL-standard row-pattern-recognition feature (Trino/Flink
MATCH_RECOGNIZE, Flink CEP) asks "does this ordered event sequence
contain pattern P?" — funnels with arbitrary noise between steps,
adjacency rules, repetition. Spark has no MATCH_RECOGNIZE; this module
re-expresses the bounded-per-group form of it as pure DataFrame ops:

1. sessionize (the shared gaps-and-islands construction,
   operators/timeseries.py:sessionize — same break rule as every other
   session consumer);
2. fold each session's events into ONE delimited string in
   deterministic (ts, tiebreak) order — ``array_sort`` over structs
   sorts by field order, so the sequence is reproducible cross-engine
   and cross-partitioning;
3. match with a regular expression over the delimited string
   (``rlike``). Subsequence steps are spelled ``(>[^>]+)*`` ("any
   events between"), adjacency is spelled directly (``>kill>error``).

This covers the dominant analytics use (per-session funnel/adjacency/
repetition predicates) with plans that scale: one shuffle to sessions,
one aggregation to sequences, regex in whole-stage codegen. What it
deliberately does NOT cover is MATCH_RECOGNIZE's cross-row measures
(per-step timestamps inside a match); those need applyInPandas, and no
registered query requires them.

Scale note: a session's sequence must fit in one string — bounded by
the session gap, not the corpus (the synthetic 30-min sessions hold
tens of events). A pathological single-key stream that never breaks
sessions would concentrate into one group — the same caveat as any
per-session aggregate, surfaced by the skew tooling, not hidden here.

Regex dialect: patterns here use only the RE2-compatible subset
(character classes, ``*``/``+``, groups) so Spark's Java regex and the
DuckDB oracle's RE2 agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators.timeseries import sessionize

#: Delimiter prefixed to every event type in the folded sequence. A
#: LEADING delimiter means every token is addressable as ``>token``
#: (no special case for the first event), and ``[^>]+`` can never match
#: across token boundaries.
SEQ_SEP = ">"


def _seq_fold_expr(ts_col: str, tiebreak: str, type_col: str) -> Column:
    """The shared sequence fold: event types in (ts, tiebreak) order as
    one ``>``-delimited string with a leading delimiter. Sorting
    struct(ts, tiebreak, type) AFTER collect makes the order canonical
    — collect_list order is partition-dependent (batch) and
    arrival-dependent (streaming), array_sort fixes both."""
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col), F.col(tiebreak), F.col(type_col)))
    )
    return F.concat(
        F.lit(SEQ_SEP),
        F.array_join(F.transform(ordered, lambda s: s[type_col]), SEQ_SEP),
    )


def session_sequences(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """One row per (key, session_id) carrying ``seq`` (the canonical
    fold, see :func:`_seq_fold_expr`) plus ``n_events``."""
    sessioned = sessionize(
        df, ts_col=ts_col, key=key, tiebreak=tiebreak, gap_seconds=gap_seconds
    )
    return sessioned.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        _seq_fold_expr(ts_col, tiebreak, type_col).alias("seq"),
    )


#: Every built pattern ends with this terminator so the FINAL step
#: matches a whole token, not a prefix ('>view' alone would match
#: inside '>view_item'; middle steps are already safe because the next
#: step's leading '>' is required). Alternation-with-$ instead of a
#: lookahead because the DuckDB oracle's RE2 has no lookahead.
_END = f"(?:{SEQ_SEP}|$)"


def subsequence_pattern(*steps: str) -> str:
    """Regex for "these steps occur in this order, any events between"
    — the funnel shape. ``subsequence_pattern('kill', 'purchase')`` →
    ``>kill(>[^>]+)*>purchase(?:>|$)``. Steps match whole tokens."""
    if not steps:
        raise ValueError("subsequence_pattern needs at least one step")
    body = f"({SEQ_SEP}[^{SEQ_SEP}]+)*{SEQ_SEP}".join(steps)
    return f"{SEQ_SEP}{body}{_END}"


def adjacency_pattern(*steps: str) -> str:
    """Regex for "these steps occur immediately back-to-back" —
    ``adjacency_pattern('kill', 'error')`` → ``>kill>error(?:>|$)``.
    Steps match whole tokens."""
    if not steps:
        raise ValueError("adjacency_pattern needs at least one step")
    return SEQ_SEP + SEQ_SEP.join(steps) + _END


def match_event_pattern(
    df: DataFrame,
    pattern: str,
    ts_col: str = "ts",
    key: str = "user_id",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Session-level row-pattern recognition: sessions of ``df`` with a
    boolean ``matched`` column — True where the session's ordered
    event-type sequence contains ``pattern`` (an unanchored regex over
    the ``>``-delimited sequence; build it with
    :func:`subsequence_pattern` / :func:`adjacency_pattern` or write a
    raw RE2-compatible expression)."""
    seqs = session_sequences(
        df,
        ts_col=ts_col,
        key=key,
        type_col=type_col,
        tiebreak=tiebreak,
        gap_seconds=gap_seconds,
    )
    return seqs.withColumn("matched", F.col("seq").rlike(pattern))


def matches_pattern(seq: Column, pattern: str) -> Column:
    """The bare match predicate, for composing several patterns over
    one `session_sequences` pass (cheaper than one pass per pattern)."""
    return seq.rlike(pattern)


def match_event_pattern_stream(
    stream: DataFrame,
    pattern: str,
    ts_col: str = "ts",
    key: str = "user_id",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of :func:`match_event_pattern`: a watermarked
    ``F.session_window`` aggregation builds the SAME canonical sequence
    fold per closed session and applies the regex — per-session pattern
    flags emitted incrementally as the watermark closes sessions
    (append mode), with state bounded by the watermark instead of the
    batch form's full-history shuffle.

    Session-boundary semantics follow the native operator (an event at
    exactly prev_ts + gap MERGES — the inclusive rule pinned by
    tests/test_streaming_session_window.py), so flags agree with the
    batch sessionize form except on exact-boundary ties, same as every
    other batch/native session twin in this engine. Returns the
    streaming DataFrame (key, session_start, session_end, n_events,
    seq, matched); the caller attaches the sink."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sw"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _seq_fold_expr(ts_col, tiebreak, type_col).alias("seq"),
        )
        .select(
            key,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "seq",
            F.col("seq").rlike(pattern).alias("matched"),
        )
    )
