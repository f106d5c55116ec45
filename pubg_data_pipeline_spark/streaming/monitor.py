"""Out-of-engine resource collectors (SURVEY.md §2.10 X4-X6).

The reference's performance monitor scrapes the Spark master web UI
(reference: monitoring/performance_monitor.py:126-168), reads host
resources through psutil (:170-211), and fabricates "insight" metrics
with ``random.uniform`` (monitoring/advanced_metrics_collector.py:
194-243 — the comments say "실제로는 데이터베이스 쿼리", i.e. fake on
purpose). These are side-channel collectors, not query semantics, so
the Spark-first re-expression keeps them OUT of the engine: each
collector returns plain metric points (measurement/tags/fields/time —
the same shape the reference writes to InfluxDB), and
:func:`points_to_df` turns any batch of points into a DataFrame so the
ordinary sink plumbing (S9 fan-out, foreachBatch TSDB writers) can
carry them.

Spark-first substitutions:

- X4: the standalone-master ``:8080/json`` endpoint does not exist in
  local or YARN/K8s deployments, so the collector targets the
  *documented, deployment-independent* monitoring surfaces instead —
  the application UI REST API (``/api/v1/applications/<id>/executors``,
  Spark monitoring docs) when the UI is up, with a pure-public
  SparkContext/StatusTracker fallback that works even with
  ``spark.ui.enabled=false`` (the test default here).
- X5: psutil is not in this container; the collector reads the public
  Linux ``/proc`` interface (``/proc/stat``, ``/proc/meminfo``,
  ``/proc/net/dev``) plus ``shutil.disk_usage`` directly, and upgrades
  to psutil via import-try when available.
- X6: the synthetic generator is deterministic (seeded
  ``random.Random``) so tests can pin it, with the reference's exact
  measurement families and value ranges.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import urllib.request
from random import Random
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MetricPoint = dict[str, Any]  # {"measurement", "tags", "fields", "time"}


def _point(
    measurement: str,
    fields: dict[str, float],
    tags: dict[str, str] | None = None,
    ts: float | None = None,
) -> MetricPoint:
    return {
        "measurement": measurement,
        "tags": dict(tags or {}),
        "fields": {k: float(v) for k, v in fields.items()},
        "time": time.time() if ts is None else float(ts),
    }


# ---------------------------------------------------------------------------
# X4 — Spark cluster/application resource metrics
# ---------------------------------------------------------------------------


def executor_points_from_rest(payload: list[dict], app_id: str, ts: float | None = None) -> list[MetricPoint]:
    """Pure transform: the ``/api/v1/applications/<id>/executors`` JSON
    array -> one ``spark_executors`` point per executor (driver row
    included, as the REST API reports it). Split out from the HTTP
    fetch so the parse is unit-testable without a live UI."""
    points = []
    for ex in payload:
        points.append(
            _point(
                "spark_executors",
                {
                    "cores_total": ex.get("totalCores", 0),
                    "active_tasks": ex.get("activeTasks", 0),
                    "completed_tasks": ex.get("completedTasks", 0),
                    "failed_tasks": ex.get("failedTasks", 0),
                    "memory_used": ex.get("memoryUsed", 0),
                    "max_memory": ex.get("maxMemory", 0),
                    "disk_used": ex.get("diskUsed", 0),
                    "total_shuffle_read": ex.get("totalShuffleRead", 0),
                    "total_shuffle_write": ex.get("totalShuffleWrite", 0),
                    "total_input_bytes": ex.get("totalInputBytes", 0),
                },
                tags={
                    "application_id": app_id,
                    "executor_id": str(ex.get("id", "unknown")),
                    "host_port": str(ex.get("hostPort", "unknown")),
                    "is_active": str(bool(ex.get("isActive", True))).lower(),
                },
                ts=ts,
            )
        )
    return points


def spark_cluster_metrics(spark: SparkSession, ts: float | None = None) -> list[MetricPoint]:
    """X4 twin (reference: monitoring/performance_monitor.py:126-168).

    Always emits one ``spark_application`` point from the public
    SparkContext/StatusTracker API (works with the UI disabled); when
    the application UI is reachable, adds per-executor
    ``spark_executors`` points from the monitoring REST API — the
    cores/memory/executors content of the reference's master scrape.
    """
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    active_jobs = tracker.getActiveJobsIds() or []
    active_stages = tracker.getActiveStageIds() or []
    points = [
        _point(
            "spark_application",
            {
                "default_parallelism": sc.defaultParallelism,
                "active_jobs": len(active_jobs),
                "active_stages": len(active_stages),
            },
            tags={
                "application_id": sc.applicationId,
                "application_name": sc.appName,
                "master": sc.master,
            },
            ts=ts,
        )
    ]
    ui = sc.uiWebUrl  # None when spark.ui.enabled=false
    if ui:
        try:
            url = f"{ui}/api/v1/applications/{sc.applicationId}/executors"
            with urllib.request.urlopen(url, timeout=10) as resp:
                payload = json.loads(resp.read().decode("utf-8"))
            points.extend(executor_points_from_rest(payload, sc.applicationId, ts=ts))
        except Exception:
            # The REST scrape is best-effort exactly like the
            # reference's (it swallows to logger.error) — the
            # StatusTracker point above is the guaranteed signal.
            pass
    return points


# ---------------------------------------------------------------------------
# X5 — host system metrics
# ---------------------------------------------------------------------------


def _proc_cpu_percent(sample_sec: float = 0.1) -> float:
    """Two-sample utilisation from /proc/stat (public Linux ABI):
    1 - Δidle/Δtotal over the sample window — what psutil.cpu_percent
    computes under the hood."""

    def snap() -> tuple[int, int]:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(v) for v in parts[1:]]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
        # guest/guest_nice (fields 9-10) are ALREADY included in
        # user/nice per the /proc/stat ABI; summing them again inflates
        # the denominator and underreports utilisation on VM hosts
        # (psutil subtracts them for the same reason)
        return idle, sum(vals[:8])

    idle0, total0 = snap()
    time.sleep(sample_sec)
    idle1, total1 = snap()
    dt = total1 - total0
    if dt <= 0:
        return 0.0
    return round(100.0 * (1.0 - (idle1 - idle0) / dt), 2)


def _proc_meminfo() -> tuple[float, float, float]:
    """(percent_used, available_bytes, total_bytes) from /proc/meminfo."""
    kv: dict[str, int] = {}
    with open("/proc/meminfo") as f:
        for line in f:
            name, _, rest = line.partition(":")
            kv[name] = int(rest.split()[0]) * 1024  # kB -> bytes
    total = kv.get("MemTotal", 0)
    avail = kv.get("MemAvailable", kv.get("MemFree", 0))
    pct = 100.0 * (1.0 - avail / total) if total else 0.0
    return round(pct, 2), float(avail), float(total)


def _proc_net_io() -> tuple[int, int, int, int]:
    """(bytes_sent, bytes_recv, packets_sent, packets_recv) summed over
    non-loopback interfaces from /proc/net/dev."""
    sent = recv = psent = precv = 0
    with open("/proc/net/dev") as f:
        for line in f.readlines()[2:]:
            name, _, rest = line.partition(":")
            if name.strip() == "lo":
                continue
            cols = rest.split()
            recv += int(cols[0])
            precv += int(cols[1])
            sent += int(cols[8])
            psent += int(cols[9])
    return sent, recv, psent, precv


def system_metrics(path: str = "/", ts: float | None = None) -> list[MetricPoint]:
    """X5 twin (reference: monitoring/performance_monitor.py:170-211):
    one ``system_performance`` point with the reference's exact field
    names. psutil when importable, /proc + shutil otherwise; returns
    ``[]`` on platforms with neither (non-Linux without psutil)."""
    try:
        import psutil  # type: ignore[import-not-found]

        cpu = psutil.cpu_percent(interval=0.1)
        mem = psutil.virtual_memory()
        mem_pct, mem_avail, mem_total = mem.percent, mem.available, mem.total
        net = psutil.net_io_counters()
        sent, recv, psent, precv = net.bytes_sent, net.bytes_recv, net.packets_sent, net.packets_recv
    except ImportError:
        if not os.path.exists("/proc/stat"):
            return []
        cpu = _proc_cpu_percent()
        mem_pct, mem_avail, mem_total = _proc_meminfo()
        sent, recv, psent, precv = _proc_net_io()
    disk = shutil.disk_usage(path)
    return [
        _point(
            "system_performance",
            {
                "cpu_percent": cpu,
                "memory_percent": mem_pct,
                "memory_available": mem_avail,
                "memory_total": mem_total,
                "disk_percent": round(100.0 * disk.used / disk.total, 2),
                "disk_free": disk.free,
                "disk_total": disk.total,
                "network_bytes_sent": sent,
                "network_bytes_recv": recv,
                "network_packets_sent": psent,
                "network_packets_recv": precv,
            },
            ts=ts,
        )
    ]


# ---------------------------------------------------------------------------
# X6 — synthetic insight metrics (explicitly fake in the reference)
# ---------------------------------------------------------------------------


def synthetic_insight_metrics(seed: int = 0, ts: float | None = None) -> list[MetricPoint]:
    """X6 twin (reference: monitoring/advanced_metrics_collector.py:
    194-243). The reference fabricates these with module-global
    ``random`` — unreproducible by construction. This twin keeps the
    exact measurement families and value ranges but derives them from a
    seeded ``random.Random`` so a pipeline test can pin the stream."""
    rng = Random(seed)
    return [
        _point(
            "system_resources",
            {
                "memory_usage_percent": rng.uniform(40, 80),
                "cpu_usage_percent": rng.uniform(20, 60),
                "disk_usage_percent": rng.uniform(30, 70),
            },
            ts=ts,
        ),
        _point(
            "performance_trends",
            {
                "avg_skill_level": rng.uniform(1200, 1800),
                "total_active_players": float(rng.randint(500, 2000)),
                "new_player_ratio": rng.uniform(0.05, 0.15),
                "veteran_retention_rate": rng.uniform(0.7, 0.9),
            },
            ts=ts,
        ),
        _point(
            "game_balance",
            {
                "weapon_diversity_index": rng.uniform(0.6, 0.9),
                "map_preference_variance": rng.uniform(0.1, 0.3),
                "game_mode_popularity": rng.uniform(0.4, 0.8),
                "match_duration_stability": rng.uniform(0.8, 0.95),
            },
            ts=ts,
        ),
        _point(
            "competition_metrics",
            {
                "skill_gap_variance": rng.uniform(200, 500),
                "match_competitiveness": rng.uniform(0.6, 0.9),
                "comeback_possibility": rng.uniform(0.2, 0.4),
            },
            ts=ts,
        ),
    ]


# ---------------------------------------------------------------------------
# Points -> DataFrame bridge
# ---------------------------------------------------------------------------

POINTS_SCHEMA = T.StructType(
    [
        T.StructField("measurement", T.StringType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("fields", T.MapType(T.StringType(), T.DoubleType()), False),
        T.StructField("time", T.TimestampType(), False),
    ]
)


def points_to_df(spark: SparkSession, points: list[MetricPoint], tall: bool = False) -> DataFrame:
    """Collector points -> DataFrame. The driver-side list is tiny (a
    handful of points per poll — the reference writes them one HTTP
    call at a time), so createDataFrame here is metadata-sized, not a
    data move; at that point the rows join the ordinary distributed
    sink path (S9 families / foreachBatch writers).

    ``tall=True`` explodes fields into (measurement, tags, field,
    value, time) rows — the narrow shape TSDB/JDBC sinks and pivot
    dashboards want."""
    from datetime import datetime, timezone

    rows = [
        (
            p["measurement"],
            p["tags"],
            p["fields"],
            datetime.fromtimestamp(p["time"], tz=timezone.utc),
        )
        for p in points
    ]
    df = spark.createDataFrame(rows, POINTS_SCHEMA)
    if not tall:
        return df
    return df.select(
        "measurement",
        "tags",
        F.explode("fields").alias("field", "value"),
        "time",
    )
