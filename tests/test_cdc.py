"""Unit tests for operators/cdc.py — snapshot diff classification,
SCD2 changelog compaction, and point-in-time slicing edge cases the
oracle queries can't isolate (nulls, collapse on/off, ties)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators import cdc


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_snapshot_diff_classifies_all_four(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (4, None, "D")],
        "k int, bal double, seg string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 25.0, "B"), (4, 40.0, "D"), (5, 50.0, "E")],
        "k int, bal double, seg string",
    )
    rows = {
        r["k"]: r["change_type"]
        for r in cdc.snapshot_diff(
            old, new, ["k"], ["bal", "seg"], include_unchanged=True
        ).collect()
    }
    assert rows == {
        1: "unchanged",
        2: "update",          # bal changed
        3: "delete",          # gone from new
        4: "update",          # NULL -> 40.0 is an update (null-safe)
        5: "insert",          # new key
    }


def test_snapshot_diff_null_to_null_is_unchanged(spark):
    old = spark.createDataFrame([(1, None)], "k int, v string")
    new = spark.createDataFrame([(1, None)], "k int, v string")
    out = cdc.snapshot_diff(old, new, ["k"], ["v"], include_unchanged=True).collect()
    assert out[0]["change_type"] == "unchanged"
    # and the default excludes it entirely
    assert cdc.snapshot_diff(old, new, ["k"], ["v"]).count() == 0


def test_scd2_collapses_noop_reemissions(spark):
    ch = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01T00:00:00"), 1, "bronze"),
            ("u", _ts("2024-01-02T00:00:00"), 2, "bronze"),  # no-op re-poll
            ("u", _ts("2024-01-03T00:00:00"), 3, "silver"),
            ("u", _ts("2024-01-04T00:00:00"), 4, "silver"),  # no-op
            ("u", _ts("2024-01-05T00:00:00"), 5, "gold"),
        ],
        "k string, ts timestamp, seq int, tier string",
    )
    hist = cdc.scd2_from_changelog(ch, ["k"], "ts", ["tier"], order_cols=["seq"]).collect()
    assert [(r["version"], r["tier"], r["is_current"]) for r in sorted(hist, key=lambda r: r["version"])] == [
        (1, "bronze", False),
        (2, "silver", False),
        (3, "gold", True),
    ]
    # intervals chain exactly: valid_to(n) == valid_from(n+1)
    ordered = sorted(hist, key=lambda r: r["version"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["valid_to"] == b["valid_from"]
    assert ordered[-1]["valid_to"] is None


def test_scd2_without_collapse_keeps_every_row(spark):
    ch = spark.createDataFrame(
        [("u", _ts("2024-01-01T00:00:00"), 1, "x"), ("u", _ts("2024-01-02T00:00:00"), 2, "x")],
        "k string, ts timestamp, seq int, v string",
    )
    hist = cdc.scd2_from_changelog(
        ch, ["k"], "ts", ["v"], order_cols=["seq"], collapse=False
    )
    assert hist.count() == 2


def test_scd2_null_tracked_values_collapse_null_safely(spark):
    ch = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01T00:00:00"), 1, None),
            ("u", _ts("2024-01-02T00:00:00"), 2, None),   # NULL==NULL -> collapse
            ("u", _ts("2024-01-03T00:00:00"), 3, "a"),
        ],
        "k string, ts timestamp, seq int, v string",
    )
    hist = cdc.scd2_from_changelog(ch, ["k"], "ts", ["v"], order_cols=["seq"])
    assert [(r["version"], r["v"]) for r in sorted(hist.collect(), key=lambda r: r["version"])] == [
        (1, None),
        (2, "a"),
    ]


def test_scd2_same_ts_ties_break_on_order_cols(spark):
    ch = spark.createDataFrame(
        [("u", _ts("2024-01-01T00:00:00"), 2, "later"), ("u", _ts("2024-01-01T00:00:00"), 1, "earlier")],
        "k string, ts timestamp, seq int, v string",
    )
    hist = sorted(
        cdc.scd2_from_changelog(ch, ["k"], "ts", ["v"], order_cols=["seq"]).collect(),
        key=lambda r: r["version"],
    )
    assert [r["v"] for r in hist] == ["earlier", "later"]
    assert hist[1]["is_current"]


def test_point_in_time_slices_open_and_closed_intervals(spark):
    ch = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T00:00:00"), 1, "a"),
            ("u1", _ts("2024-01-10T00:00:00"), 2, "b"),
            ("u2", _ts("2024-01-08T00:00:00"), 3, "z"),
        ],
        "k string, ts timestamp, seq int, v string",
    )
    hist = cdc.scd2_from_changelog(ch, ["k"], "ts", ["v"], order_cols=["seq"])
    at = {
        r["k"]: r["v"]
        for r in cdc.scd2_point_in_time(hist, "2024-01-09 00:00:00").collect()
    }
    assert at == {"u1": "a", "u2": "z"}
    # exactly on a boundary: the NEW version wins (valid_from <= t < valid_to)
    at_boundary = {
        r["k"]: r["v"]
        for r in cdc.scd2_point_in_time(hist, "2024-01-10 00:00:00").collect()
    }
    assert at_boundary["u1"] == "b"
    # before any history: empty for that key
    before = cdc.scd2_point_in_time(hist, "2023-12-31 00:00:00")
    assert before.count() == 0


def test_scd2_single_shuffle_plan(spark):
    """The collapse pass and the interval pass must share one exchange:
    the whole history build costs a single shuffle of the changelog."""
    ch = spark.createDataFrame(
        [("u", _ts("2024-01-01T00:00:00"), 1, "x")], "k string, ts timestamp, seq int, v string"
    )
    hist = cdc.scd2_from_changelog(ch, ["k"], "ts", ["v"], order_cols=["seq"])
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_snapshot_diff_requires_compare_cols(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="compare column"):
        cdc.snapshot_diff(df, df, ["k"], [])


def test_point_in_time_accepts_datetime_literal(spark):
    ch = spark.createDataFrame(
        [("u", _ts("2024-01-01T00:00:00"), 1, "a")],
        "k string, ts timestamp, seq int, v string",
    )
    hist = cdc.scd2_from_changelog(ch, ["k"], "ts", ["v"], order_cols=["seq"])
    got = cdc.scd2_point_in_time(hist, _ts("2024-06-01T00:00:00")).collect()
    assert len(got) == 1 and got[0]["v"] == "a"


def test_temporal_join_matches_one_version_and_never_duplicates(spark):
    from pyspark.sql import functions as F

    from pubg_data_pipeline_spark.operators import cdc

    hist = spark.createDataFrame(
        [
            ("u1", "gold", 1, "2024-01-01 00:00:00", "2024-01-10 00:00:00", False),
            ("u1", "plat", 2, "2024-01-10 00:00:00", None, True),
            ("u2", "iron", 1, "2024-01-05 00:00:00", None, True),
        ],
        "user_id string, tier string, version int, valid_from string, valid_to string, is_current boolean",
    ).select(
        "user_id", "tier", "version",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "is_current",
    )
    facts = spark.createDataFrame(
        [
            (1, "u1", "2024-01-03 12:00:00"),  # gold era
            (2, "u1", "2024-01-10 00:00:00"),  # boundary: new version wins
            (3, "u1", "2024-02-01 00:00:00"),  # open-ended current
            (4, "u2", "2024-01-01 00:00:00"),  # before first version -> null
            (5, "u3", "2024-01-01 00:00:00"),  # unknown key -> null
        ],
        "fact_id long, user_id string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = cdc.temporal_join(facts, hist, ["user_id"], "ts")
    rows = {r["fact_id"]: (r["tier"], r["version"]) for r in out.collect()}
    assert out.count() == facts.count()  # never duplicates, never drops
    assert rows[1] == ("gold", 1)
    assert rows[2] == ("plat", 2)  # valid_from <= ts < valid_to boundary rule
    assert rows[3] == ("plat", 2)
    assert rows[4] == (None, None)
    assert rows[5] == (None, None)
