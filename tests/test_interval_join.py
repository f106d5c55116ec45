"""Banded interval join (operators.timeseries.interval_join).

Semantics under test: inclusive bounds, exactly-once pair production
for intervals spanning multiple buckets, key matching, and the plan
shape — the time-band key must drive a real equi-join, never a
BroadcastNestedLoopJoin/cartesian over points x intervals.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators.timeseries import interval_join


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 12, minute, second)


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, _ts(0)),    # on interval start boundary (inclusive)
            (2, _ts(5)),    # mid-interval
            (3, _ts(30)),   # on interval end boundary (inclusive)
            (4, _ts(31)),   # 1 min past the end: no match
            (5, _ts(59)),   # matches only the late interval
        ],
        "point_id long, pts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts(0), _ts(30)),   # spans 4 ten-minute buckets
            (200, _ts(50), _ts(59)),
        ],
        "interval_id long, ws timestamp, we timestamp",
    )
    return points, intervals


def test_inclusive_bounds_and_exactly_once(spark):
    points, intervals = _frames(spark)
    got = sorted(
        (r["point_id"], r["interval_id"])
        for r in interval_join(points, intervals, "pts", "ws", "we", bucket_seconds=600).collect()
    )
    # interval 100 spans buckets 0..3; points 1-3 each appear EXACTLY
    # once despite the interval's 4-bucket fan-out; both boundary
    # points (start and end) are included; point 4 excluded.
    assert got == [(1, 100), (2, 100), (3, 100), (5, 200)]


def test_keyed_interval_join(spark):
    points = spark.createDataFrame(
        [(1, "a", _ts(5)), (2, "b", _ts(5))], "point_id long, k string, pts timestamp"
    )
    intervals = spark.createDataFrame(
        [(100, "a", _ts(0), _ts(30))], "interval_id long, k string, ws timestamp, we timestamp"
    )
    got = [
        (r["point_id"], r["interval_id"])
        for r in interval_join(
            points, intervals, "pts", "ws", "we", keys=["k"], bucket_seconds=600
        ).collect()
    ]
    assert got == [(1, 100)]  # same window, wrong key -> no match


def test_overlapping_intervals_all_matched(spark):
    # a point inside two overlapping intervals pairs with both
    points = spark.createDataFrame([(1, _ts(10))], "point_id long, pts timestamp")
    intervals = spark.createDataFrame(
        [(100, _ts(0), _ts(20)), (200, _ts(5), _ts(15))],
        "interval_id long, ws timestamp, we timestamp",
    )
    got = sorted(
        r["interval_id"]
        for r in interval_join(points, intervals, "pts", "ws", "we", bucket_seconds=600).collect()
    )
    assert got == [100, 200]


def test_interval_join_plans_equi_join_not_nested_loop(spark):
    points, intervals = _frames(spark)
    plan = (
        interval_join(points, intervals, "pts", "ws", "we", bucket_seconds=600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    )


# ---- interval_overlap_join (interval x interval) ----

from pubg_data_pipeline_spark.operators.timeseries import interval_overlap_join


def _overlap_frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(0), _ts(30)),    # long: spans 4 ten-min buckets
            (2, _ts(45), _ts(48)),   # short, isolated
            (3, _ts(58), _ts(59)),   # inside the late right interval
        ],
        "l_id long, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts(5), _ts(25)),   # nested inside left 1, shares 3 buckets
            (200, _ts(30), _ts(40)),  # touches left 1 exactly at its end
            (300, _ts(50), _ts(59)),  # overlaps left 3 only
        ],
        "r_id long, rs timestamp, re timestamp",
    )
    return left, right


def test_overlap_exactly_once_and_touching_bounds(spark):
    left, right = _overlap_frames(spark)
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_seconds=600
        ).collect()
    )
    # (1,100) shares 3 buckets but must appear once; (1,200) touch at a
    # single instant (closed intervals) counts as overlap; (2,*) none.
    assert got == [(1, 100), (1, 200), (3, 300)]


def test_overlap_matches_naive_nested_loop(spark):
    """Property: banded result == brute-force cross-join filter, on
    intervals engineered to hit same-bucket, cross-bucket, touching,
    and disjoint cases."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    lrows = [
        (i, base + datetime.timedelta(minutes=7 * i), base + datetime.timedelta(minutes=7 * i + 11))
        for i in range(40)
    ]
    rrows = [
        (100 + i, base + datetime.timedelta(minutes=13 * i + 3), base + datetime.timedelta(minutes=13 * i + 5))
        for i in range(25)
    ]
    left = spark.createDataFrame(lrows, "l_id long, ls timestamp, le timestamp")
    right = spark.createDataFrame(rrows, "r_id long, rs timestamp, re timestamp")
    banded = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_seconds=300
        ).collect()
    )
    naive = sorted(
        (r["l_id"], r["r_id"])
        for r in left.crossJoin(right)
        .where((F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")))
        .collect()
    )
    assert banded == naive and len(banded) > 0


def test_overlap_keyed_and_plan_shape(spark):
    left, right = _overlap_frames(spark)
    lk = left.withColumn("k", F.col("l_id") % 3)
    rk = right.withColumn("k", F.col("r_id") % 3)
    out = interval_overlap_join(
        lk, rk, "ls", "le", "rs", "re", keys=["k"], bucket_seconds=600
    )
    # key match keeps (1,100) [k=1] and (3,300) [k=0]; filters (1,200)
    # [k 1 vs 2]
    got = sorted((r["l_id"], r["r_id"]) for r in out.collect())
    assert got == [(1, 100), (3, 300)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    )
