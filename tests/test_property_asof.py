"""Hypothesis property test: as_of_join agrees with pandas
merge_asof (the de-facto reference semantics) on arbitrary inputs —
backward and forward directions, with and without tolerance.

Right-side (key, ts) pairs are deduplicated before comparison:
merge_asof's pick among equal timestamps is positional while the
distributed operator needs an explicit tiebreak column, so equal-ts
behavior is pinned separately in test_asof.py."""

from __future__ import annotations

import datetime

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pubg_data_pipeline_spark.operators.timeseries import as_of_join

_BASE = datetime.datetime(2024, 1, 1)

_LEFT_ROW = st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 50))
_RIGHT_ROW = st.tuples(
    st.sampled_from(["a", "b"]), st.integers(0, 50), st.integers(-100, 100)
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _ts(minutes: int) -> datetime.datetime:
    return _BASE + datetime.timedelta(minutes=minutes)


@given(
    lefts=st.lists(_LEFT_ROW, min_size=1, max_size=15),
    rights=st.lists(_RIGHT_ROW, min_size=1, max_size=15),
    direction=st.sampled_from(["backward", "forward"]),
    tol_minutes=st.sampled_from([None, 0, 5, 20]),
)
@_SETTINGS
def test_asof_matches_pandas_merge_asof(spark, lefts, rights, direction, tol_minutes):
    # dedup right (key, ts) — equal-ts picks are tiebreak-defined, not
    # positional (see module docstring)
    seen = set()
    rights = [r for r in rights if not (r[:2] in seen or seen.add(r[:2]))]

    left_rows = [(i, k, _ts(m)) for i, (k, m) in enumerate(lefts)]
    right_rows = [(k, _ts(m), v) for (k, m, v) in rights]
    ldf = spark.createDataFrame(left_rows, "lid int, k string, ts timestamp")
    rdf = spark.createDataFrame(right_rows, "k string, ts timestamp, v long")

    got = {
        r["lid"]: r["right_v"]
        for r in as_of_join(
            ldf,
            rdf,
            keys=["k"],
            right_cols=["v"],
            direction=direction,
            tolerance_seconds=None if tol_minutes is None else tol_minutes * 60,
        ).collect()
    }

    lpd = pd.DataFrame(left_rows, columns=["lid", "k", "ts"]).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts", kind="stable")
    merged = pd.merge_asof(
        lpd,
        rpd,
        on="ts",
        by="k",
        direction=direction,
        allow_exact_matches=True,
        tolerance=None if tol_minutes is None else pd.Timedelta(minutes=tol_minutes),
    )
    want = {
        int(row.lid): (None if pd.isna(row.v) else int(row.v))
        for row in merged.itertuples()
    }
    assert got == want
