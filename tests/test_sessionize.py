"""Shared gaps-and-islands sessionize (operators/timeseries.py) —
the construction behind user_sessions / session_conversion_rate /
session_incident_overlap."""

from __future__ import annotations

import datetime

from pubg_data_pipeline_spark.operators.timeseries import sessionize


def _ev(spark):
    base = datetime.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, 10, base),
        (2, 10, base + datetime.timedelta(minutes=29)),   # same session (<=30m)
        (3, 10, base + datetime.timedelta(minutes=60)),   # 31m gap: new session
        (4, None, base),                                  # NULL key
        (5, 20, base),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_strict_gap_break_and_numbering(spark):
    out = {r.event_id: r.session_id for r in sessionize(_ev(spark)).collect()}
    assert out[1] == 1 and out[2] == 1  # 29m gap merges
    assert out[3] == 2                  # >30m gap breaks
    assert out[5] == 1                  # independent key restarts at 1


def test_null_keys_dropped_by_default_kept_on_request(spark):
    ev = _ev(spark)
    assert sessionize(ev).where("user_id IS NULL").count() == 0
    kept = sessionize(ev, drop_null_keys=False).where("user_id IS NULL").collect()
    assert len(kept) == 1 and kept[0].session_id == 1


def test_exact_boundary_merges(spark):
    """A gap of exactly gap_seconds does NOT break (strict >) —
    matches F.session_window's inclusive merge, pinned in
    user_sessions_native's oracle."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(1, 1, base), (2, 1, base + datetime.timedelta(seconds=1800))]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = sessionize(ev).collect()
    assert {r.session_id for r in out} == {1}
