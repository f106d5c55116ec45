"""Mergeable Misra-Gries states: merge associativity, the
no-overestimate + bounded-undercount guarantees, and the streaming
epoch store (idempotent replay, cross-epoch merge at read)."""

from __future__ import annotations

import json

from pubg_data_pipeline_spark.streaming import app


def _truth(rows):
    from collections import Counter

    return Counter(r[0] for r in rows)


def test_mg_states_merge_matches_single_pass_guarantees(spark):
    from pubg_data_pipeline_spark.operators import incremental as inc

    k = 10
    part1 = [(f"heavy{i}",) for i in range(3) for _ in range(300)] + [
        (f"n1_{i}",) for i in range(800)
    ]
    part2 = [(f"heavy{i}",) for i in range(3) for _ in range(200)] + [
        (f"n2_{i}",) for i in range(700)
    ]
    df1 = spark.createDataFrame(part1, "k string").repartition(3)
    df2 = spark.createDataFrame(part2, "k string").repartition(3)
    s1 = inc.partial_mg_state(df1, ["k"], k)
    s2 = inc.partial_mg_state(df2, ["k"], k)
    merged = {r["k"]: r["weight"] for r in inc.merge_mg_states([s1, s2], k).collect()}

    truth = _truth(part1 + part2)
    n = len(part1) + len(part2)
    assert len(merged) <= k
    for key, w in merged.items():
        assert w <= truth[key], f"{key} overestimated: {w} > {truth[key]}"
    # every planted heavy key (500 each, >> N/(k+1)) must survive with a
    # weight within the mergeable-summaries undercount bound
    bound = (n - sum(merged.values())) / (k + 1)
    for i in range(3):
        key = f"heavy{i}"
        assert key in merged, f"{key} lost by the merged summary"
        assert truth[key] - merged[key] <= bound + 1e-9


def test_streaming_heavy_hitters_epochs_and_replay(spark, tmp_path):
    state = tmp_path / "hh_state"
    b1 = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [(f"x{i}",) for i in range(40)], "k string"
    )
    b2 = spark.createDataFrame(
        [("a",)] * 40 + [("c",)] * 35 + [(f"y{i}",) for i in range(30)], "k string"
    )
    app.heavy_hitters_epoch(b1, 0, str(state), ["k"], counters=8)
    app.heavy_hitters_epoch(b2, 1, str(state), ["k"], counters=8)
    out = {
        r["k"]: (r["weight"], r["max_undercount"])
        for r in app.read_heavy_hitters(spark, str(state), ["k"], counters=8).collect()
    }
    assert "a" in out and out["a"][0] <= 90  # never overestimates
    assert out["a"][0] + out["a"][1] >= 90  # bound covers the true count
    assert "b" in out and "c" in out

    # at-least-once replay of epoch 1 must not change the answer
    app.heavy_hitters_epoch(b2, 1, str(state), ["k"], counters=8)
    out2 = {
        r["k"]: (r["weight"], r["max_undercount"])
        for r in app.read_heavy_hitters(spark, str(state), ["k"], counters=8).collect()
    }
    assert out2 == out


def test_streaming_heavy_hitters_end_to_end(spark, tmp_path):
    src = tmp_path / "hh_src"
    src.mkdir()
    state = tmp_path / "hh_state2"
    ckpt = tmp_path / "hh_ckpt"
    (src / "b1.jsonl").write_text(
        "\n".join(json.dumps({"k": "hot"}) for _ in range(60))
        + "\n"
        + "\n".join(json.dumps({"k": f"cold{i}"}) for i in range(30))
    )
    stream = spark.readStream.schema("k string").json(str(src))
    q = app.streaming_heavy_hitters(
        stream, str(state), ["k"], counters=8,
        available_now=True, checkpoint=str(ckpt),
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    out = {r["k"]: r["weight"] for r in
           app.read_heavy_hitters(spark, str(state), ["k"], counters=8).collect()}
    assert "hot" in out and out["hot"] <= 60


def test_compact_heavy_hitters_preserves_answers(spark, tmp_path):
    state = tmp_path / "hh_compact"
    for eid in range(4):
        batch = spark.createDataFrame(
            [("hot",)] * (20 + eid) + [(f"e{eid}_{i}",) for i in range(15)], "k string"
        )
        app.heavy_hitters_epoch(batch, eid, str(state), ["k"], counters=6)
    before = {
        r["k"]: (r["weight"], r["max_undercount"])
        for r in app.read_heavy_hitters(spark, str(state), ["k"], counters=6).collect()
    }
    app.compact_heavy_hitters(spark, str(state), ["k"], counters=6)
    after = {
        r["k"]: (r["weight"], r["max_undercount"])
        for r in app.read_heavy_hitters(spark, str(state), ["k"], counters=6).collect()
    }
    assert after == before
    # physically one epoch now
    import os
    dirs = [d for d in os.listdir(state / "summary") if d.startswith("__epoch=")]
    assert dirs == ["__epoch=0"]
