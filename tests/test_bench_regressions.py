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


def test_prefers_detail_file_over_round_artifacts(tmp_path):
    # BENCH_DETAIL.json is the previous completed run's full per-query
    # map (the driver tail no longer carries one); it wins over any
    # BENCH_r{N}.json.
    _write(tmp_path / "BENCH_r09.json", {"queries": {"q": 10.0}})
    _write(tmp_path / "BENCH_DETAIL.json", {"queries": {"q": 1.0}})
    out = bench._regressions_vs_last_recorded({"q": 2.0}, root=str(tmp_path))
    assert out["q"]["prev"] == 1.0  # vs detail, not the r09 artifact


def test_compact_round_tail_falls_back_to_older_queries(tmp_path):
    # From round 5 on the driver tail ends with the compact summary
    # line (no "queries") — the tracker must fall back past it.
    compact = json.dumps({"metric": "headline_queries_total", "value": 90.0, "n_queries": 121})
    _write(tmp_path / "BENCH_r05.json", {"tail": f"...truncated...\n{compact}"})
    _write(tmp_path / "BENCH_r03.json", {"queries": {"q": 1.0}})
    out = bench._regressions_vs_last_recorded({"q": 3.0}, root=str(tmp_path))
    assert out["q"]["prev"] == 1.0


def test_skips_baselines_recorded_at_a_different_sf(tmp_path):
    # A dev bench run at sf0.01 must not be compared against (or
    # poison) an sf0.1 baseline — per-query times differ by the data
    # scale, not by regressions.
    _write(tmp_path / "BENCH_DETAIL.json", {"sf": 0.01, "queries": {"q": 0.1}})
    _write(tmp_path / "BENCH_r03.json", {"sf": 0.1, "queries": {"q": 1.0}})
    out = bench._regressions_vs_last_recorded({"q": 2.0}, root=str(tmp_path), sf=0.1)
    assert out["q"]["prev"] == 1.0  # skipped the sf0.01 detail file
    # sf-less legacy records still compare (backward compatible)
    _write(tmp_path / "BENCH_DETAIL.json", {"queries": {"q": 0.5}})
    out = bench._regressions_vs_last_recorded({"q": 2.0}, root=str(tmp_path), sf=0.1)
    assert out["q"]["prev"] == 0.5


def test_compact_summary_line_fits_any_tail_window():
    # The driver records only the last 2000 chars of stdout; the final
    # compact line must always be complete inside that window.
    compact = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 12345.678,
            "unit": "sec",
            "sf": 0.1,
            "n_queries": 9999,
            "n_errors": 9999,
            "n_regressions": 9999,
            "detail": "BENCH_DETAIL.json",
        },
        separators=(",", ":"),
    )
    assert len(compact) < 200
    parsed = json.loads(compact)
    assert parsed["metric"] == "headline_queries_total"
    assert "value" in parsed and "queries" not in parsed


def test_core_suffix_isolates_low_core_baselines(tmp_path):
    # A low-core run (SPARK_GRAFT_CPUS != 32) must compare only against
    # low-core baselines: round-8 postmortem — an 8-core detail file
    # written between two 32-core runs fabricated a cross-core "stands"
    # flag on an untouched query.
    _write(tmp_path / "BENCH_DETAIL.json", {"queries": {"q": 0.4}})      # 32-core
    _write(tmp_path / "BENCH_DETAIL_c8.json", {"queries": {"q": 1.0}})   # 8-core
    out = bench._regressions_vs_last_recorded(
        {"q": 1.2}, root=str(tmp_path), core_suffix="_c8"
    )
    assert out == {}  # 1.2 vs the 8-core 1.0 baseline: no flag
    out = bench._regressions_vs_last_recorded({"q": 1.2}, root=str(tmp_path))
    assert out["q"]["prev"] == 0.4  # the 32-core track is unchanged


def test_core_suffix_falls_back_to_matching_round_artifacts(tmp_path):
    # With no _c8 detail file, an 8-core run falls back to the driver's
    # own low-core artifacts (BENCH_r{N}_c8.json) — never to the
    # 32-core BENCH_r{N}.json files.
    _write(tmp_path / "BENCH_r08.json", {"queries": {"q": 0.4}})
    _write(tmp_path / "BENCH_r08_c8.json", {"queries": {"q": 1.0}})
    out = bench._regressions_vs_last_recorded(
        {"q": 1.7}, root=str(tmp_path), core_suffix="_c8"
    )
    assert out["q"]["prev"] == 1.0
    # and the 32-core track ignores the _c8 artifact
    out = bench._regressions_vs_last_recorded({"q": 1.7}, root=str(tmp_path))
    assert out["q"]["prev"] == 0.4
