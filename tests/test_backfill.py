"""Fingerprint-driven partition backfill (sources/io.py:
backfill_stale_partitions): late data rebuilds only its own day."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from pubg_data_pipeline_spark.sources.io import backfill_stale_partitions


@pytest.fixture(params=["replace", "log"])
def backend(request):
    """Run every backfill scenario on BOTH manifest commit backends:
    'replace' (last-writer-wins single JSON) and 'log' (versioned
    transactional log, commitproto.TxnLog)."""
    return request.param


@pytest.fixture
def bf(backend):
    import functools

    return functools.partial(backfill_stale_partitions, backend=backend)


def _source(spark, rows):
    return spark.createDataFrame(rows, "day string, user_id long, value double")


def _rollup(df):
    return df.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


_BASE = [
    ("2024-01-01", 1, 10.0),
    ("2024-01-01", 2, 5.0),
    ("2024-01-02", 1, 7.0),
    ("2024-01-03", 3, 1.0),
]


def _read_rollup(spark, path):
    # partition inference types day= values as DATE; normalize to str
    return {
        str(r["day"]): (r["n"], r["total"])
        for r in spark.read.parquet(path).collect()
    }


def test_first_run_backfills_everything_then_noop(spark, tmp_path, bf):
    target = str(tmp_path / "daily")
    src = _source(spark, _BASE)
    rep = bf(spark, src, target, "day", _rollup)
    assert rep["stale"] == ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert _read_rollup(spark, target)["2024-01-01"] == (2, 15.0)

    rep2 = bf(spark, src, target, "day", _rollup)
    assert rep2["stale"] == [] and rep2["pruned"] == []
    assert len(rep2["unchanged"]) == 3


def test_late_row_rebuilds_only_its_day(spark, tmp_path, bf):
    target = str(tmp_path / "daily")
    bf(spark, _source(spark, _BASE), target, "day", _rollup)
    untouched = sorted(glob.glob(os.path.join(target, "day=2024-01-02", "*.parquet")))

    late = _BASE + [("2024-01-01", 9, 100.0)]
    rep = bf(spark, _source(spark, late), target, "day", _rollup)
    assert rep["stale"] == ["2024-01-01"]
    assert rep["unchanged"] == ["2024-01-02", "2024-01-03"]
    assert _read_rollup(spark, target)["2024-01-01"] == (3, 115.0)
    # the unchanged day's files were not rewritten
    assert sorted(glob.glob(os.path.join(target, "day=2024-01-02", "*.parquet"))) == untouched


def test_duplicate_row_insertion_is_detected(spark, tmp_path, bf):
    """xor alone cancels on an identical-row pair; the decimal hash-sum
    leg must still flag the day stale."""
    target = str(tmp_path / "daily")
    bf(spark, _source(spark, _BASE), target, "day", _rollup)
    dup = _BASE + [("2024-01-02", 1, 7.0), ("2024-01-02", 1, 7.0)]
    rep = bf(spark, _source(spark, dup), target, "day", _rollup)
    assert rep["stale"] == ["2024-01-02"]
    assert _read_rollup(spark, target)["2024-01-02"] == (3, 21.0)


def test_vanished_partition_is_pruned(spark, tmp_path, bf):
    target = str(tmp_path / "daily")
    bf(spark, _source(spark, _BASE), target, "day", _rollup)
    shrunk = [r for r in _BASE if r[0] != "2024-01-03"]
    rep = bf(spark, _source(spark, shrunk), target, "day", _rollup)
    assert rep["pruned"] == ["2024-01-03"]
    assert not os.path.exists(os.path.join(target, "day=2024-01-03"))
    assert "2024-01-03" not in _read_rollup(spark, target)


def test_crash_before_manifest_is_idempotent(spark, tmp_path, bf, backend):
    """A run that died after the data write but before the manifest
    publish re-runs the same stale days; the overwrite converges."""
    target = str(tmp_path / "daily")
    bf(spark, _source(spark, _BASE), target, "day", _rollup)
    # simulate the crash: revert the manifest to the pre-run state
    if backend == "log":
        import shutil

        shutil.rmtree(os.path.join(target, "_backfill_log"))
    else:
        os.remove(os.path.join(target, "_backfill_manifest.json"))
    rep = bf(spark, _source(spark, _BASE), target, "day", _rollup)
    assert rep["stale"] == ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert _read_rollup(spark, target)["2024-01-01"] == (2, 15.0)


def test_guards(spark, tmp_path, bf):
    with pytest.raises(ValueError, match="remote URI"):
        bf(
            spark, _source(spark, _BASE), "s3://bucket/x", "day", _rollup
        )
    with pytest.raises(ValueError, match="more than 1 partitions"):
        bf(
            spark, _source(spark, _BASE), str(tmp_path / "t"), "day", _rollup,
            max_partitions=1,
        )
    with pytest.raises(ValueError, match="must keep"):
        bf(
            spark,
            _source(spark, _BASE),
            str(tmp_path / "t2"),
            "day",
            lambda df: df.groupBy().agg(F.count(F.lit(1)).alias("n")),
        )


def test_zero_row_recompute_prunes_and_stays_settled(spark, tmp_path, bf):
    """A correction that empties a day's rollup must remove the old
    directory (not serve pre-correction data), and the 'legitimately
    empty' state must not re-stale forever."""
    target = str(tmp_path / "daily")

    def positive_rollup(df):
        return _rollup(df.where(F.col("value") > 0))

    bf(spark, _source(spark, _BASE), target, "day", positive_rollup)
    assert "2024-01-03" in _read_rollup(spark, target)

    corrected = [r if r[0] != "2024-01-03" else ("2024-01-03", 3, -1.0) for r in _BASE]
    rep = bf(
        spark, _source(spark, corrected), target, "day", positive_rollup
    )
    assert rep["stale"] == ["2024-01-03"]
    assert not os.path.exists(os.path.join(target, "day=2024-01-03"))
    assert "2024-01-03" not in _read_rollup(spark, target)
    # settled: the empty day does not loop back to stale
    rep2 = bf(
        spark, _source(spark, corrected), target, "day", positive_rollup
    )
    assert rep2["stale"] == []


def test_vanished_target_dir_self_repairs(spark, tmp_path, bf):
    import shutil

    target = str(tmp_path / "daily")
    bf(spark, _source(spark, _BASE), target, "day", _rollup)
    shutil.rmtree(os.path.join(target, "day=2024-01-02"))  # /tmp sweeper
    rep = bf(spark, _source(spark, _BASE), target, "day", _rollup)
    assert rep["stale"] == ["2024-01-02"]
    assert _read_rollup(spark, target)["2024-01-02"] == (1, 7.0)


def test_logic_version_bump_rebuilds_everything(spark, tmp_path, bf):
    target = str(tmp_path / "daily")
    src = _source(spark, _BASE)
    bf(spark, src, target, "day", _rollup, logic_version="v1")
    rep = bf(spark, src, target, "day", _rollup, logic_version="v2")
    assert len(rep["stale"]) == 3
    rep2 = bf(spark, src, target, "day", _rollup, logic_version="v2")
    assert rep2["stale"] == []


def test_null_partition_value_fails_fast(spark, tmp_path, bf):
    rows = _BASE + [(None, 7, 3.0)]
    with pytest.raises(ValueError, match="NULL"):
        bf(
            spark, _source(spark, rows), str(tmp_path / "t"), "day", _rollup
        )


def test_compute_spelling_drift_fails_fast(spark, tmp_path, bf):
    """compute() must emit partition values verbatim — a re-derived
    spelling would silently mark real partitions 'empty' and disable
    their self-repair."""

    def drifting_rollup(df):
        return _rollup(df).withColumn(
            "day", F.concat(F.lit("D"), F.col("day"))
        )

    with pytest.raises(ValueError, match="spelling drift"):
        bf(
            spark, _source(spark, _BASE), str(tmp_path / "t"), "day", drifting_rollup
        )
    # the guard must fire BEFORE publishing: no drifted day=D... (nor
    # any other) partition directory may exist — a post-write raise
    # would leave untracked directories the manifest prune can never
    # remove but a direct reader would see
    target = tmp_path / "t"
    published = (
        [e for e in os.listdir(target) if e.startswith("day=")]
        if target.is_dir()
        else []
    )
    assert published == []


def test_partition_named_like_version_key_does_not_collide(spark, tmp_path, bf):
    rows = [("__logic_version__", 1, 2.0), ("2024-01-01", 2, 3.0)]
    target = str(tmp_path / "weird")
    rep = bf(spark, _source(spark, rows), target, "day", _rollup)
    assert sorted(rep["stale"]) == ["2024-01-01", "__logic_version__"]
    rep2 = bf(spark, _source(spark, rows), target, "day", _rollup)
    assert rep2["stale"] == []  # no perpetual re-staleness


def test_entity_resolution_keeps_null_name_rows(spark):
    """part_entity_resolution: NULL brand/name rows canonicalize to
    themselves (the oracle's levenshtein(NULL, x) pairs nothing) —
    they must not vanish at the dictionary join."""
    from pubg_data_pipeline_spark.plans.analytic_queries import part_entity_resolution
    import pubg_data_pipeline_spark.sources.tables as tables

    rows = [
        (1, "B1", "alpha widget"),
        (2, "B1", "alpha widgel"),  # dist 1 -> clusters with 1
        (3, "B1", None),
        (4, None, "alpha widget"),
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_brand string, p_name string")
    orig = tables.load_table
    try:
        tables.load_table = lambda s, d, name: df
        # plans module imported load_table by reference at module level
        import pubg_data_pipeline_spark.plans.analytic_queries as aq

        orig_aq = aq.load_table
        aq.load_table = lambda s, d, name: df
        try:
            out = {r.p_partkey: (r.canonical_id, r.cluster_size)
                   for r in part_entity_resolution(spark, "/ignored").collect()}
        finally:
            aq.load_table = orig_aq
    finally:
        tables.load_table = orig
    assert out[1] == (1, 2) and out[2] == (1, 2)
    assert out[3] == (3, 1) and out[4] == (4, 1)


def test_log_backend_versions_every_run(spark, tmp_path):
    """backend='log': each backfill run appends ONE immutable manifest
    version (auditable history, snapshot isolation); the latest version
    is the state the next run diffs against."""
    from pubg_data_pipeline_spark.sources.commitproto import TxnLog

    target = str(tmp_path / "daily")
    backfill_stale_partitions(
        spark, _source(spark, _BASE), target, "day", _rollup, backend="log"
    )
    late = _BASE + [("2024-01-01", 9, 100.0)]
    backfill_stale_partitions(
        spark, _source(spark, late), target, "day", _rollup, backend="log"
    )
    log = TxnLog(os.path.join(target, "_backfill_log"))
    assert log.versions() == [1, 2]
    # no replace-backend artifact was written
    assert not os.path.exists(os.path.join(target, "_backfill_manifest.json"))
    # a reader pinned to v1 still sees the pre-late-row fingerprints
    v1 = log.read(1)["partitions"]
    v2 = log.read(2)["partitions"]
    assert v1["2024-01-01"]["fp"] != v2["2024-01-01"]["fp"]
    assert v1["2024-01-02"] == v2["2024-01-02"]


def test_unknown_backend_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="backend"):
        backfill_stale_partitions(
            spark, _source(spark, _BASE), str(tmp_path / "t"), "day", _rollup,
            backend="iceberg",
        )
