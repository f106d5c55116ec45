"""Streaming PSI drift monitor: per-epoch scores equal the batch
operator (operators.profile.distribution_drift) on the same data,
replays are idempotent, shifted batches alert, and the end-to-end
availableNow stream drives the same epoch body."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pubg_data_pipeline_spark.operators.profile import distribution_drift
from pubg_data_pipeline_spark.streaming import app

def _key():  # integer-valued buckets keep it exact (lazy: .cast needs a JVM)
    return F.col("v").cast("int")


def _df(spark, values):
    return spark.createDataFrame([(float(v),) for v in values], "v double")


def test_read_drift_matches_batch_operator(spark, tmp_path):
    base_path = tmp_path / "base"
    state = tmp_path / "state"
    base_rows = [1] * 50 + [2] * 30 + [3] * 20
    cur_rows = [1] * 20 + [2] * 30 + [4] * 50  # bucket 3 gone, 4 new
    base_df, cur_df = _df(spark, base_rows), _df(spark, cur_rows)

    app.save_drift_baseline(base_df, _key(), "bucket", str(base_path))
    app.drift_epoch(cur_df, 0, str(state), _key(), "bucket")
    got = app.read_drift(spark, str(state), str(base_path), "bucket").collect()
    assert len(got) == 1

    want_psi = (
        distribution_drift(base_df, cur_df, _key(), "bucket")
        .agg(F.sum("psi_contrib"))
        .collect()[0][0]
    )
    assert abs(got[0]["psi"] - want_psi) < 1e-12
    assert got[0]["n_rows"] == len(cur_rows)
    assert got[0]["alert"]  # a 50-point swap is far past 0.2


def test_same_distribution_does_not_alert_and_replay_is_idempotent(spark, tmp_path):
    base_path = tmp_path / "base"
    state = tmp_path / "state"
    rows = [1] * 50 + [2] * 30 + [3] * 20
    app.save_drift_baseline(_df(spark, rows), _key(), "bucket", str(base_path))

    app.drift_epoch(_df(spark, rows), 0, str(state), _key(), "bucket")
    app.drift_epoch(_df(spark, [1] * 5 + [2] * 3 + [3] * 2), 1, str(state), _key(), "bucket")
    before = {
        r["__epoch"]: (r["n_rows"], r["psi"], r["alert"])
        for r in app.read_drift(spark, str(state), str(base_path), "bucket").collect()
    }
    assert set(before) == {0, 1}
    for eid in (0, 1):
        assert before[eid][1] < 1e-6  # same shape -> PSI ~ 0
        assert not before[eid][2]

    # at-least-once replay of epoch 1 must not change anything
    app.drift_epoch(_df(spark, [1] * 5 + [2] * 3 + [3] * 2), 1, str(state), _key(), "bucket")
    after = {
        r["__epoch"]: (r["n_rows"], r["psi"], r["alert"])
        for r in app.read_drift(spark, str(state), str(base_path), "bucket").collect()
    }
    assert after == before


def test_streaming_drift_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    base_path = tmp_path / "base"
    state = tmp_path / "state"
    ckpt = tmp_path / "ckpt"
    app.save_drift_baseline(
        _df(spark, [1] * 50 + [2] * 50), _key(), "bucket", str(base_path)
    )
    (src / "b1.jsonl").write_text(
        "\n".join(json.dumps({"v": 9.0}) for _ in range(40))
        + "\n"
        + "\n".join(json.dumps({"v": 1.0}) for _ in range(10))
    )
    stream = spark.readStream.schema("v double").json(str(src))
    q = app.streaming_drift_monitor(
        stream, str(state), _key(), "bucket", available_now=True, checkpoint=str(ckpt)
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    out = app.read_drift(spark, str(state), str(base_path), "bucket").collect()
    assert len(out) == 1
    assert out[0]["alert"]  # 80% of mass moved to an unseen bucket
