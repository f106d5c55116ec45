"""Out-of-engine collectors (SURVEY.md §2.10 X4-X6) — see
streaming/monitor.py for the reference mapping."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pubg_data_pipeline_spark.streaming import monitor


def test_spark_cluster_metrics_statustracker_fallback(spark):
    # Test sessions run with spark.ui.enabled=false: the collector must
    # still emit the application point from the public StatusTracker API.
    points = monitor.spark_cluster_metrics(spark, ts=1000.0)
    apps = [p for p in points if p["measurement"] == "spark_application"]
    assert len(apps) == 1
    p = apps[0]
    assert p["tags"]["application_id"] == spark.sparkContext.applicationId
    assert p["tags"]["master"].startswith("local")
    assert p["fields"]["default_parallelism"] >= 1
    assert p["time"] == 1000.0


def test_executor_rest_parse_is_pure():
    payload = [
        {
            "id": "driver",
            "hostPort": "10.0.0.1:40000",
            "isActive": True,
            "totalCores": 32,
            "activeTasks": 3,
            "completedTasks": 120,
            "failedTasks": 1,
            "memoryUsed": 1024,
            "maxMemory": 4096,
            "diskUsed": 0,
            "totalShuffleRead": 55,
            "totalShuffleWrite": 66,
            "totalInputBytes": 77,
        },
        {"id": "1", "totalCores": 8},
    ]
    pts = monitor.executor_points_from_rest(payload, "app-123", ts=5.0)
    assert [p["tags"]["executor_id"] for p in pts] == ["driver", "1"]
    assert pts[0]["fields"]["cores_total"] == 32.0
    assert pts[0]["fields"]["total_shuffle_write"] == 66.0
    assert pts[0]["tags"]["is_active"] == "true"
    # Missing REST keys default to 0, not KeyError (API versions drift).
    assert pts[1]["fields"]["memory_used"] == 0.0
    assert all(p["tags"]["application_id"] == "app-123" for p in pts)


def test_system_metrics_proc_path():
    # The container has no psutil, so this exercises the /proc reader.
    points = monitor.system_metrics(ts=42.0)
    if not points:  # non-Linux without psutil — nothing to assert
        pytest.skip("no /proc and no psutil on this platform")
    (p,) = points
    assert p["measurement"] == "system_performance"
    f = p["fields"]
    # Reference field names, exactly (performance_monitor.py:183-196).
    for name in (
        "cpu_percent", "memory_percent", "memory_available", "memory_total",
        "disk_percent", "disk_free", "disk_total",
        "network_bytes_sent", "network_bytes_recv",
        "network_packets_sent", "network_packets_recv",
    ):
        assert name in f
    assert 0.0 <= f["cpu_percent"] <= 100.0
    assert 0.0 <= f["memory_percent"] <= 100.0
    assert 0.0 <= f["disk_percent"] <= 100.0
    assert f["memory_available"] <= f["memory_total"]


def test_synthetic_metrics_deterministic_and_in_reference_ranges():
    a = monitor.synthetic_insight_metrics(seed=7, ts=1.0)
    b = monitor.synthetic_insight_metrics(seed=7, ts=1.0)
    assert a == b  # seeded: reproducible, unlike the reference
    assert a != monitor.synthetic_insight_metrics(seed=8, ts=1.0)
    by_name = {p["measurement"]: p["fields"] for p in a}
    assert set(by_name) == {
        "system_resources", "performance_trends", "game_balance", "competition_metrics",
    }
    assert 40 <= by_name["system_resources"]["memory_usage_percent"] <= 80
    assert 1200 <= by_name["performance_trends"]["avg_skill_level"] <= 1800
    tap = by_name["performance_trends"]["total_active_players"]
    assert 500 <= tap <= 2000 and tap == int(tap)
    assert 0.6 <= by_name["game_balance"]["weapon_diversity_index"] <= 0.9
    assert 200 <= by_name["competition_metrics"]["skill_gap_variance"] <= 500


def test_points_to_df_wide_and_tall(spark):
    points = monitor.synthetic_insight_metrics(seed=1, ts=100.0) + monitor.spark_cluster_metrics(
        spark, ts=100.0
    )
    wide = monitor.points_to_df(spark, points)
    assert wide.count() == len(points)
    assert [f.name for f in wide.schema.fields] == ["measurement", "tags", "fields", "time"]

    tall = monitor.points_to_df(spark, points, tall=True)
    n_fields = sum(len(p["fields"]) for p in points)
    assert tall.count() == n_fields
    # The tall shape feeds ordinary engine queries — e.g. a per-
    # measurement field census, the dashboard's discovery query.
    census = (
        tall.groupBy("measurement")
        .agg(F.countDistinct("field").alias("n_fields"))
        .orderBy("measurement")
        .collect()
    )
    got = {r["measurement"]: r["n_fields"] for r in census}
    assert got["game_balance"] == 4
    assert got["spark_application"] == 3
