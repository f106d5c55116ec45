"""Unit coverage for bench.py's per-query regression tracker: it must
flag >factor slowdowns vs the most recent recorded BENCH_r{N}.json
(including the driver's tail-wrapped format), skip crashed rounds, and
ignore sub-noise-floor queries. No Spark involved."""

from __future__ import annotations

import json

import bench


def _write(path, payload):
    with open(path, "w") as f:
        json.dump(payload, f)


def test_flags_only_real_regressions(tmp_path):
    _write(
        tmp_path / "BENCH_r05.json",
        {"queries": {"q_slow": 1.0, "q_ok": 1.0, "q_tiny": 0.1}},
    )
    out = bench._regressions_vs_last_recorded(
        {"q_slow": 2.0, "q_ok": 1.2, "q_tiny": 0.5, "q_new": 9.9}, root=str(tmp_path)
    )
    assert set(out) == {"q_slow"}  # 2x > 1.5x; q_tiny below noise floor; q_new has no prior
    assert out["q_slow"] == {"prev": 1.0, "now": 2.0, "ratio": 2.0}


def test_uses_latest_round_and_skips_crashed(tmp_path):
    _write(tmp_path / "BENCH_r03.json", {"queries": {"q": 1.0}})
    _write(tmp_path / "BENCH_r04.json", {"tail": "no metric line here"})  # crashed round
    out = bench._regressions_vs_last_recorded({"q": 2.0}, root=str(tmp_path))
    assert "q" in out  # fell back past r04 to r03


def test_parses_driver_tail_format(tmp_path):
    metric = json.dumps({"metric": "x", "queries": {"q": 1.0}})
    _write(tmp_path / "BENCH_r06.json", {"tail": f"spark noise...\n{metric}"})
    out = bench._regressions_vs_last_recorded({"q": 3.0}, root=str(tmp_path))
    assert out["q"]["ratio"] == 3.0


def test_no_history_no_flags(tmp_path):
    assert bench._regressions_vs_last_recorded({"q": 5.0}, root=str(tmp_path)) == {}
