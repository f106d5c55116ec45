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
   events between"), adjacency is spelled directly (``>kill>error``),
   consecutive repetition as a quantifier (``(?:>kill){2,}``).

This covers the dominant analytics use (per-session funnel/adjacency/
repetition predicates) with plans that scale: one shuffle to sessions,
one aggregation to sequences, regex in whole-stage codegen.
MATCH_RECOGNIZE's cross-row MEASURES (per-step timestamps inside a
match) are served by :func:`funnel_step_times` — the same canonical
ordering folded through a struct accumulator instead of a string, so
step deltas (time-to-convert) come out as columns with no Python in
the path. (Reference contrast: advanced_analytics.py:141-161 computes
exactly such per-step trend deltas, imperatively per ranking batch.)

Scale note: a session's sequence must fit in one string — bounded by
the session gap, not the corpus (the synthetic 30-min sessions hold
tens of events). ``max_events_per_session`` makes that bound CODE
rather than prose: the fold keeps the first N events in canonical
order and flags the session ``truncated`` (batch form also bounds the
collected array itself, so a never-breaking single-key stream cannot
concentrate unbounded state into one aggregation buffer).

Regex dialect: patterns here use only the RE2-compatible subset
(character classes, ``*``/``+``/``{m,n}``, groups) so Spark's Java
regex and the DuckDB oracle's RE2 agree. The pattern builders escape
regex metacharacters in step tokens (backslash-punctuation is literal
in BOTH dialects) and reject tokens containing the ``>`` delimiter;
the sequence fold itself fail-louds on event types containing ``>``
(a delimiter inside a token would silently change match semantics on
both engines — wrong answers that still pass oracle parity).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators.timeseries import sessionize

#: Delimiter prefixed to every event type in the folded sequence. A
#: LEADING delimiter means every token is addressable as ``>token``
#: (no special case for the first event), and ``[^>]+`` can never match
#: across token boundaries.
SEQ_SEP = ">"

#: The regex metacharacters shared by Java regex and RE2; backslash
#: before any of them is a literal in both dialects. Letters/digits are
#: NEVER escaped (``\d``/``\w`` would change meaning, asymmetrically
#: between dialects).
_REGEX_META = re.compile(r"([.^$*+?()\[\]{}|\\])")


def _escape_step(step: str) -> str:
    """Validate + escape one pattern step token: reject empties and
    tokens containing the sequence delimiter (un-spellable — the fold
    would split them), backslash-escape regex metacharacters so the
    token always matches itself literally in both regex dialects."""
    if not isinstance(step, str) or not step:
        raise ValueError("pattern step must be a non-empty string")
    if SEQ_SEP in step:
        raise ValueError(
            f"pattern step {step!r} contains the sequence delimiter {SEQ_SEP!r}; "
            "such an event type can never appear as one token in the fold"
        )
    return _REGEX_META.sub(r"\\\1", step)


def _checked_type(type_col: str) -> Column:
    """The event-type column, fail-loud on values containing the
    delimiter: a ``>`` inside a token silently changes what every
    pattern means (on Spark AND the oracle — parity would not catch
    it), so it must be an error, not a semantics drift. One codegen
    branch per row."""
    return F.when(
        F.col(type_col).contains(SEQ_SEP),
        F.raise_error(
            F.concat(
                F.lit(
                    f"session_sequences: event type contains the sequence "
                    f"delimiter {SEQ_SEP!r}: "
                ),
                F.col(type_col),
            )
        ),
    ).otherwise(F.col(type_col))


def _seq_fold_expr(
    ts_col: str,
    tiebreak: str,
    type_col: str,
    item: Column | None = None,
    max_events: int | None = None,
) -> Column:
    """The shared sequence fold: event types in (ts, tiebreak) order as
    one ``>``-delimited string with a leading delimiter. Sorting
    struct(ts, tiebreak, type) AFTER collect makes the order canonical
    — collect_list order is partition-dependent (batch) and
    arrival-dependent (streaming), array_sort fixes both.

    ``item`` overrides the collected struct (the batch cap path passes
    a when-NULL struct so collect_list skips beyond-cap rows — NULLs
    are dropped by collect_list, bounding the aggregation buffer
    itself). ``max_events`` slices the sorted array before joining —
    keep-FIRST policy in canonical order (the streaming cap, where no
    pre-filter is possible)."""
    if item is None:
        item = F.struct(
            F.col(ts_col), F.col(tiebreak), _checked_type(type_col).alias(type_col)
        )
    ordered = F.array_sort(F.collect_list(item))
    if max_events is not None:
        ordered = F.slice(ordered, 1, max_events)
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
    max_events_per_session: int | None = None,
) -> DataFrame:
    """One row per (key, session_id) carrying ``seq`` (the canonical
    fold, see :func:`_seq_fold_expr`) plus ``n_events`` and
    ``session_start``.

    ``max_events_per_session`` enforces the pathological-session bound:
    only the first N events (canonical order, keep-first) enter the
    fold, a ``truncated`` column flags sessions that overflowed, and —
    unlike a post-hoc string cut — the beyond-cap rows are nulled out
    BEFORE collect_list, so the aggregation buffer is bounded too (a
    never-breaking single-key stream costs O(cap), not O(session)).
    ``n_events`` always counts the TRUE session size. The per-session
    row_number rides the existing (key)-hash distribution ([key] is a
    subset of [key, session_id]), so the cap adds a local sort, not a
    shuffle."""
    sessioned = sessionize(
        df, ts_col=ts_col, key=key, tiebreak=tiebreak, gap_seconds=gap_seconds
    )
    if max_events_per_session is None:
        return sessioned.groupBy(key, "session_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            _seq_fold_expr(ts_col, tiebreak, type_col).alias("seq"),
        )
    if max_events_per_session < 1:
        raise ValueError("max_events_per_session must be >= 1")
    wn = Window.partitionBy(key, "session_id").orderBy(
        F.col(ts_col).asc(), F.col(tiebreak).asc()
    )
    capped_item = F.when(
        F.col("__rn") <= max_events_per_session,
        F.struct(F.col(ts_col), F.col(tiebreak), _checked_type(type_col).alias(type_col)),
    )
    return (
        sessioned.withColumn("__rn", F.row_number().over(wn))
        .groupBy(key, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            _seq_fold_expr(ts_col, tiebreak, type_col, item=capped_item).alias("seq"),
        )
        .withColumn("truncated", F.col("n_events") > max_events_per_session)
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
    ``>kill(>[^>]+)*>purchase(?:>|$)``. Steps match whole tokens;
    metacharacters in step names are escaped, delimiter-bearing names
    rejected (see :func:`_escape_step`)."""
    if not steps:
        raise ValueError("subsequence_pattern needs at least one step")
    esc = [_escape_step(s) for s in steps]
    body = f"({SEQ_SEP}[^{SEQ_SEP}]+)*{SEQ_SEP}".join(esc)
    return f"{SEQ_SEP}{body}{_END}"


def adjacency_pattern(*steps: str) -> str:
    """Regex for "these steps occur immediately back-to-back" —
    ``adjacency_pattern('kill', 'error')`` → ``>kill>error(?:>|$)``.
    Steps match whole tokens; escaped/validated like every builder."""
    if not steps:
        raise ValueError("adjacency_pattern needs at least one step")
    esc = [_escape_step(s) for s in steps]
    return SEQ_SEP + SEQ_SEP.join(esc) + _END


def repetition_pattern(step: str, min_count: int, max_count: int | None = None) -> str:
    """Regex for "this step occurs at least ``min_count`` times
    CONSECUTIVELY" — ``repetition_pattern('error', 2)`` →
    ``(?:>error){2,}(?:>|$)``, the MATCH_RECOGNIZE quantified-pattern
    shape (``A{m,n}``).

    ``max_count`` bounds the matched SPAN, not the run length: without
    lookahead (absent from the RE2-common subset) a longer run still
    contains a max_count-sized match whose terminator is the next
    repetition's own ``>``. For "at least m" semantics — the common
    burst-detection ask — leave ``max_count`` None."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if max_count is not None and max_count < min_count:
        raise ValueError("max_count must be >= min_count")
    esc = _escape_step(step)
    quant = f"{{{min_count},}}" if max_count is None else f"{{{min_count},{max_count}}}"
    return f"(?:{SEQ_SEP}{esc}){quant}{_END}"


def match_event_pattern(
    df: DataFrame,
    pattern: str,
    ts_col: str = "ts",
    key: str = "user_id",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    gap_seconds: float = 1800.0,
    max_events_per_session: int | None = None,
) -> DataFrame:
    """Session-level row-pattern recognition: sessions of ``df`` with a
    boolean ``matched`` column — True where the session's ordered
    event-type sequence contains ``pattern`` (an unanchored regex over
    the ``>``-delimited sequence; build it with
    :func:`subsequence_pattern` / :func:`adjacency_pattern` /
    :func:`repetition_pattern` or write a raw RE2-compatible
    expression)."""
    seqs = session_sequences(
        df,
        ts_col=ts_col,
        key=key,
        type_col=type_col,
        tiebreak=tiebreak,
        gap_seconds=gap_seconds,
        max_events_per_session=max_events_per_session,
    )
    return seqs.withColumn("matched", F.col("seq").rlike(pattern))


def matches_pattern(seq: Column, pattern: str) -> Column:
    """The bare match predicate, for composing several patterns over
    one `session_sequences` pass (cheaper than one pass per pattern)."""
    return seq.rlike(pattern)


def funnel_step_times(
    df: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    key: str = "user_id",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    gap_seconds: float | None = 1800.0,
    measure_cols: list[str] | None = None,
) -> DataFrame:
    """MATCH_RECOGNIZE cross-row MEASURES for the subsequence funnel:
    per (key, session_id), the timestamp of each matched step under
    first-match skip-to-next semantics — step i+1 binds to the first
    qualifying event STRICTLY AFTER step i in canonical (ts, tiebreak)
    order, exactly the subsequence the ``(>[^>]+)*`` pattern tests,
    but with the matched rows' timestamps extracted so per-step deltas
    (time-to-convert) are computable downstream.

    ``gap_seconds=None`` binds over the WHOLE per-key history instead
    of 30-min sessions (MATCH_RECOGNIZE's plain PARTITION BY form —
    the right shape for lifetime conversion funnels, where the steps
    span days; ``session_id`` is constant 0). NULL keys are dropped in
    both modes, matching sessionize's default.

    ``measure_cols`` adds, per named column m, a ``step_m`` array with
    that column's value AT each bound event (``A.value`` in
    MATCH_RECOGNIZE MEASURES terms) — element i is NULL until step i
    matched, same convention as ``step_ts``. Still one fold, one
    aggregation.

    Pure Column plan: the same sorted struct array as the string fold,
    folded through an ``F.aggregate`` struct accumulator (slot i fills
    only when slot i-1 was filled by an EARLIER event — the
    pre-update accumulator in each condition gives the strict
    ordering). One shuffle to sessions, one aggregation; the per-
    element lambda is a handful of comparisons, no Python.

    Returns (key, session_id, n_events, session_start, step_ts
    array<timestamp> — element i NULL until step i matched — and
    ``completed`` = all steps matched). Reference contrast:
    advanced_analytics.py:141-161 derives such per-step deltas
    imperatively per batch."""
    if not steps:
        raise ValueError("funnel_step_times needs at least one step")
    for s in steps:
        _escape_step(s)  # same validation: delimiter-bearing names are un-foldable
    n = len(steps)
    if gap_seconds is None:
        sessioned = df.where(F.col(key).isNotNull()).withColumn(
            "session_id", F.lit(0).cast("long")
        )
    else:
        sessioned = sessionize(
            df, ts_col=ts_col, key=key, tiebreak=tiebreak, gap_seconds=gap_seconds
        )
    dtypes = dict(df.dtypes)
    measures = [(m, dtypes[m]) for m in (measure_cols or [])]
    folded = _step_fold_exprs(
        steps, ts_col, tiebreak, type_col, measures, ts_dtype=dtypes[ts_col]
    )
    return (
        sessioned.groupBy(key, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            folded.alias("__steps"),
        )
        .select(
            key,
            "session_id",
            "n_events",
            "session_start",
            F.array(*[F.col(f"__steps.t{i}") for i in range(n)]).alias("step_ts"),
            *[
                F.array(*[F.col(f"__steps.m{i}_{m}") for i in range(n)]).alias(
                    f"step_{m}"
                )
                for m, _ in measures
            ],
            F.col(f"__steps.t{n - 1}").isNotNull().alias("completed"),
        )
    )


def _step_fold_exprs(
    steps: list[str],
    ts_col: str,
    tiebreak: str,
    type_col: str,
    measures: list[tuple[str, str]] = (),
    ts_dtype: str = "timestamp",
):
    """The shared measures fold (batch + streaming twins): sorted
    struct array -> struct accumulator whose slot i fills only when
    slot i-1 was filled by an EARLIER event (the pre-update accumulator
    in each condition gives first-match skip-to-next binding).

    ``measures`` is ``[(column, dtype), ...]``: besides the timestamp,
    each slot captures those columns' values AT the bound event — the
    full MATCH_RECOGNIZE MEASURES surface (``A.value``), still one fold.
    The measure columns ride at the END of the collected struct, after
    the unique tiebreak, so they can never perturb the canonical
    array_sort order.

    Only STEP-RELEVANT events enter the collected array (when-NULL
    before collect_list, the same buffer-bounding trick as the capped
    string fold): an event whose type is not in ``steps`` can never
    bind a slot, so a whole-journey binding over a heavy user costs
    O(step events), not O(lifetime events) — while the caller's
    ``count(1)`` still counts every row. No delimiter check here: the
    measures fold never builds a delimited string, so ``>`` in an
    irrelevant type is harmless (step names themselves are validated
    by the callers via _escape_step)."""
    n = len(steps)
    relevant = F.when(
        F.col(type_col).isin(list(steps)),
        F.struct(
            F.col(ts_col),
            F.col(tiebreak),
            F.col(type_col),
            *[F.col(m) for m, _ in measures],
        ),
    )
    ordered = F.array_sort(F.collect_list(relevant))
    fields = []
    for i in range(n):
        # the t{i} slot dtype must match the actual ts column (it may
        # be timestamp_ntz or a numeric epoch, not just timestamp) —
        # a mismatched accumulator dtype fails F.aggregate at analysis
        fields.append((f"t{i}", ts_dtype, ts_col))
        for m, dtype in measures:
            fields.append((f"m{i}_{m}", dtype, m))
    init = F.struct(*[F.lit(None).cast(dtype).alias(slot) for slot, dtype, _ in fields])

    def fill(acc: Column, x: Column) -> Column:
        slots = []
        for i, step in enumerate(steps):
            prev_done = acc[f"t{i - 1}"].isNotNull() if i else F.lit(True)
            take = prev_done & acc[f"t{i}"].isNull() & (x[type_col] == F.lit(step))
            slots.append(F.when(take, x[ts_col]).otherwise(acc[f"t{i}"]).alias(f"t{i}"))
            for m, _ in measures:
                slot = f"m{i}_{m}"
                slots.append(F.when(take, x[m]).otherwise(acc[slot]).alias(slot))
        return F.struct(*slots)

    return F.aggregate(ordered, init, fill)


def funnel_step_times_stream(
    stream: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    key: str = "user_id",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    measure_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming twin of :func:`funnel_step_times`: the same measures
    fold under a watermarked ``F.session_window`` — per-session step
    timestamps (and ``measure_cols`` values at the bound events)
    emitted incrementally as the watermark closes sessions (append
    mode). Session-boundary semantics follow the native operator
    (inclusive merge at exactly prev_ts + gap), same as
    :func:`match_event_pattern_stream`. Returns (key, session_start,
    session_end, n_events, step_ts, step_<m>..., completed); the
    caller attaches the sink."""
    if not steps:
        raise ValueError("funnel_step_times_stream needs at least one step")
    for s in steps:
        _escape_step(s)
    n = len(steps)
    dtypes = dict(stream.dtypes)
    measures = [(m, dtypes[m]) for m in (measure_cols or [])]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sw"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _step_fold_exprs(
                steps, ts_col, tiebreak, type_col, measures, ts_dtype=dtypes[ts_col]
            ).alias("__steps"),
        )
        .select(
            key,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            F.array(*[F.col(f"__steps.t{i}") for i in range(n)]).alias("step_ts"),
            *[
                F.array(*[F.col(f"__steps.m{i}_{m}") for i in range(n)]).alias(
                    f"step_{m}"
                )
                for m, _ in measures
            ],
            F.col(f"__steps.t{n - 1}").isNotNull().alias("completed"),
        )
    )


def match_event_pattern_stream(
    stream: DataFrame,
    pattern: str,
    ts_col: str = "ts",
    key: str = "user_id",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    max_events_per_session: int | None = 10_000,
) -> DataFrame:
    """Streaming twin of :func:`match_event_pattern`: a watermarked
    ``F.session_window`` aggregation builds the SAME canonical sequence
    fold per closed session and applies the regex — per-session pattern
    flags emitted incrementally as the watermark closes sessions
    (append mode), with state bounded by the watermark instead of the
    batch form's full-history shuffle.

    ``max_events_per_session`` (DEFAULT 10k — a stream is by definition
    unbounded, so the pathological never-breaking session must be
    capped here, not documented) slices the canonical fold to the first
    N events and flags ``truncated``; pass None only when the source is
    known-bounded. The collect_list state behind the fold still grows
    with the open session until the watermark closes it — the cap
    bounds the EMITTED sequence; watermark+gap bound the state's
    lifetime.

    Session-boundary semantics follow the native operator (an event at
    exactly prev_ts + gap MERGES — the inclusive rule pinned by
    tests/test_streaming_session_window.py), so flags agree with the
    batch sessionize form except on exact-boundary ties, same as every
    other batch/native session twin in this engine. Returns the
    streaming DataFrame (key, session_start, session_end, n_events,
    seq, truncated, matched); the caller attaches the sink."""
    seq_expr = _seq_fold_expr(
        ts_col, tiebreak, type_col, max_events=max_events_per_session
    )
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sw"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            seq_expr.alias("seq"),
        )
    )
    truncated = (
        F.lit(False)
        if max_events_per_session is None
        else F.col("n_events") > max_events_per_session
    )
    return agg.select(
        key,
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        "n_events",
        "seq",
        truncated.alias("truncated"),
        F.col("seq").rlike(pattern).alias("matched"),
    )
