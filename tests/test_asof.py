"""Edge-case tests for operators.timeseries.as_of_join: inclusive
match at equal timestamps, null-padding before any right row, key
isolation, and the tiebreak rule for duplicate right timestamps."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators.timeseries import as_of_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_inclusive_null_and_key_isolation(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:05:00")),  # after r1 -> matches r1
            (2, 10, _ts("2024-01-01T00:10:00")),  # equal ts -> inclusive match r2
            (3, 10, _ts("2024-01-01T00:00:30")),  # before any right -> null
            (4, 20, _ts("2024-01-01T09:00:00")),  # other key: only its own rights
        ],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 10, _ts("2024-01-01T00:01:00")),
            (102, 10, _ts("2024-01-01T00:10:00")),
            (201, 20, _ts("2024-01-01T08:00:00")),
        ],
        "rid int, user_id int, ts timestamp",
    )
    out = {
        r["event_id"]: r["right_rid"]
        for r in as_of_join(left, right, keys=["user_id"], right_cols=["rid"]).collect()
    }
    assert out == {1: 101, 2: 102, 3: None, 4: 201}


def test_asof_tiebreak_picks_largest(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T01:00:00"))], "event_id int, user_id int, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (5, 1, _ts("2024-01-01T00:30:00")),
            (9, 1, _ts("2024-01-01T00:30:00")),  # duplicate ts: larger rid wins
        ],
        "rid int, user_id int, ts timestamp",
    )
    out = as_of_join(
        left, right, keys=["user_id"], right_cols=["rid"], tiebreak="rid"
    ).collect()
    assert out[0]["right_rid"] == 9


def test_asof_single_shuffle_plan(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T01:00:00"))], "event_id int, user_id int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, 1, _ts("2024-01-01T00:30:00"))], "rid int, user_id int, ts timestamp"
    )
    plan = (
        as_of_join(left, right, keys=["user_id"], right_cols=["rid"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union-tag-window: no join operator at all, exactly one exchange
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01T00:05:00")),  # next right at 00:30 -> 101
            (2, 1, _ts("2024-01-01T00:30:00")),  # equal ts -> inclusive 101
            (3, 1, _ts("2024-01-01T09:00:00")),  # nothing after -> null
        ],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(101, 1, _ts("2024-01-01T00:30:00"))], "rid int, user_id int, ts timestamp"
    )
    out = {
        r["event_id"]: r["right_rid"]
        for r in as_of_join(
            left, right, keys=["user_id"], right_cols=["rid"], direction="forward"
        ).collect()
    }
    assert out == {1: 101, 2: 101, 3: None}


def test_asof_tolerance_masks_stale_matches(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:05:00")),  # 4 min after r1 -> within 10 min
            (2, 10, _ts("2024-01-01T01:00:00")),  # 59 min after r1 -> masked
        ],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(101, 10, _ts("2024-01-01T00:01:00"))],
        "rid int, user_id int, ts timestamp",
    )
    out = {
        r["event_id"]: r["right_rid"]
        for r in as_of_join(
            left, right, keys=["user_id"], right_cols=["rid"], tolerance_seconds=600
        ).collect()
    }
    assert out == {1: 101, 2: None}


def test_asof_forward_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:00:00"))], "event_id int, user_id int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(201, 10, _ts("2024-01-01T00:30:00"))], "rid int, user_id int, ts timestamp"
    )
    hit = as_of_join(
        left, right, keys=["user_id"], right_cols=["rid"],
        direction="forward", tolerance_seconds=3600,
    ).collect()[0]
    assert hit["right_rid"] == 201
    miss = as_of_join(
        left, right, keys=["user_id"], right_cols=["rid"],
        direction="forward", tolerance_seconds=60,
    ).collect()[0]
    assert miss["right_rid"] is None


def test_asof_null_field_on_matched_row_stays_null(spark):
    """Row-wise semantics: the matched row's NULL field must come
    through as NULL — not fall through to an older row's value (the
    per-column forward-fill bug; pandas merge_asof matches rows)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:10:00"))], "event_id int, user_id int, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (101, 10, _ts("2024-01-01T00:00:00"), "old-value"),
            (102, 10, _ts("2024-01-01T00:09:00"), None),  # nearest match, NULL payload
        ],
        "rid int, user_id int, ts timestamp, payload string",
    )
    row = as_of_join(
        left, right, keys=["user_id"], right_cols=["rid", "payload"]
    ).collect()[0]
    assert row["right_rid"] == 102          # matched the nearest row...
    assert row["right_payload"] is None     # ...and kept ITS null, not 'old-value'


def test_asof_null_timestamps_and_keys_never_match(spark):
    """ASOF/equi-join NULL semantics (r5 review fix): a NULL right
    timestamp or NULL key matches nothing; a NULL-ts left row is kept
    null-padded (left-join contract) in BOTH directions — previously
    NULLS-FIRST ordering handed such rows spurious matches."""
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:10:00")),
            (2, 10, None),          # NULL left ts: kept, never matched
            (3, None, _ts("2024-01-01T00:10:00")),  # NULL key: kept, never matched
        ],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 10, None, "null-ts"),          # can never match
            (102, None, _ts("2024-01-01T00:00:00"), "null-key"),  # can never match
            (103, 10, _ts("2024-01-01T00:05:00"), "real"),
        ],
        "rid int, user_id int, ts timestamp, payload string",
    )
    for direction in ("backward", "forward"):
        rows = {
            r["event_id"]: r
            for r in as_of_join(
                left, right, keys=["user_id"], right_cols=["rid", "payload"],
                direction=direction,
            ).collect()
        }
        assert set(rows) == {1, 2, 3}  # every left row survives
        assert rows[2]["right_rid"] is None, direction
        assert rows[3]["right_rid"] is None, direction
    back = {
        r["event_id"]: r
        for r in as_of_join(
            left, right, keys=["user_id"], right_cols=["rid", "payload"]
        ).collect()
    }
    assert back[1]["right_rid"] == 103  # the real row, not the NULL-ts one


def test_asof_string_tiebreak_no_ansi_crash(spark):
    """The tiebreak column keeps its own type: the old cast-to-long
    ANSI-crashed on string tiebreaks and truncated fractional ones."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:10:00"))], "event_id int, user_id int, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:05:00"), "uuid-aaa", "first"),
            (10, _ts("2024-01-01T00:05:00"), "uuid-zzz", "second"),
        ],
        "user_id int, ts timestamp, rid string, payload string",
    )
    row = as_of_join(
        left, right, keys=["user_id"], right_cols=["rid", "payload"], tiebreak="rid"
    ).collect()[0]
    # backward: largest tiebreak among equal-ts rows wins the carry
    assert row["right_rid"] == "uuid-zzz"
