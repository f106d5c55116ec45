"""Hypothesis property tests for operators/cdc.py: for ARBITRARY
changelogs, the SCD2 build must satisfy its structural invariants —
a pure-Python reference implementation agrees row-for-row, intervals
chain per key, and compaction is idempotent. These catch ordering and
null-handling edge cases the fixed oracle corpus can't."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pubg_data_pipeline_spark.operators import cdc

_BASE = datetime.datetime(2024, 1, 1)

# (key, ts-offset-hours, tracked-value-or-None); small alphabets force
# collisions: duplicate timestamps, repeated values, None runs
_ROW = st.tuples(
    st.sampled_from(["k1", "k2"]),
    st.integers(min_value=0, max_value=10),
    st.sampled_from(["a", "b", None]),
)
_CHANGELOG = st.lists(_ROW, min_size=1, max_size=20)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _reference_scd2(rows):
    """Pure-Python model: per key, order by (ts, seq), drop null-safe
    consecutive duplicates, emit (key, value, version, from, to, cur)."""
    out = []
    by_key = {}
    for seq, (k, off, v) in enumerate(rows):
        by_key.setdefault(k, []).append((_BASE + datetime.timedelta(hours=off), seq, v))
    for k, items in by_key.items():
        items.sort(key=lambda t: (t[0], t[1]))
        kept = []
        for ts, seq, v in items:
            if kept and kept[-1][1] == v:
                continue
            kept.append((ts, v))
        for i, (ts, v) in enumerate(kept):
            nxt = kept[i + 1][0] if i + 1 < len(kept) else None
            out.append((k, v, i + 1, ts, nxt, nxt is None))
    return sorted(out, key=lambda t: (t[0], t[2]))


@given(rows=_CHANGELOG)
@_SETTINGS
def test_scd2_matches_pure_python_reference(spark, rows):
    data = [
        (k, _BASE + datetime.timedelta(hours=off), seq, v)
        for seq, (k, off, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "k string, ts timestamp, seq long, v string")
    got = sorted(
        (
            (r["k"], r["v"], r["version"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in cdc.scd2_from_changelog(
                df, ["k"], "ts", ["v"], order_cols=["seq"]
            ).collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert got == _reference_scd2(rows)


@given(rows=_CHANGELOG)
@_SETTINGS
def test_scd2_intervals_chain_and_recompaction_is_identity(spark, rows):
    data = [
        (k, _BASE + datetime.timedelta(hours=off), seq, v)
        for seq, (k, off, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "k string, ts timestamp, seq long, v string")
    hist = cdc.scd2_from_changelog(df, ["k"], "ts", ["v"], order_cols=["seq"]).collect()

    by_key = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: r["version"])
        # versions are dense 1..n; exactly one open current interval
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        assert [r["is_current"] for r in rs] == [False] * (len(rs) - 1) + [True]
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"]   # gap-free chain
            # consecutive versions differ null-safely (collapse worked)
            assert (a["v"] is None, a["v"]) != (b["v"] is None, b["v"])

    # compacting the history's own (valid_from, value) changelog again
    # changes nothing: compaction is idempotent
    again_src = [(r["k"], r["valid_from"], r["version"], r["v"]) for r in hist]
    df2 = spark.createDataFrame(again_src, "k string, ts timestamp, seq long, v string")
    again = cdc.scd2_from_changelog(df2, ["k"], "ts", ["v"], order_cols=["seq"]).collect()
    norm = lambda rs: sorted(
        (r["k"], r["version"], r["v"] or "", r["v"] is None, r["valid_from"]) for r in rs
    )
    assert norm(again) == norm(hist)
