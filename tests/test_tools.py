"""Tests for the repo tools that don't need a SparkSession:
bench-comparison parsing and regression thresholds."""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "compare_bench",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "compare_bench.py"))
compare_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(compare_bench)


def test_load_queries_raw_bench_line(tmp_path):
    p = tmp_path / "b.json"
    p.write_text(json.dumps({
        "metric": "m", "value": 9.9, "unit": "sec",
        "queries": {"q1": 1.5, "q2": 0.25}, "sf": 0.1}))
    assert compare_bench.load_queries(str(p)) == {"q1": 1.5, "q2": 0.25}


def test_load_queries_truncated_driver_tail(tmp_path):
    """Driver BENCH files wrap a truncated tail that starts mid-pair
    and never contains the literal "queries" key."""
    p = tmp_path / "r.json"
    p.write_text(json.dumps({
        "n": 1, "rc": 0, "sf": 0.1,
        "tail": '": 0.375, "repetition_signals": 0.486, "epoch_mix": 0.177}'}))
    got = compare_bench.load_queries(str(p))
    assert got["repetition_signals"] == 0.486
    assert got["epoch_mix"] == 0.177
    assert "rc" not in got and "sf" not in got


def test_load_queries_tail_keeps_headline_block(tmp_path):
    """r6 bench format: the headline22 block and totals ride at the
    END of the JSON line so driver truncation keeps them. The scraper
    must pick up the headline per-query pairs and never mistake the
    subtotal/total meta keys for queries."""
    p = tmp_path / "r.json"
    p.write_text(json.dumps({
        "n": 6, "rc": 0, "sf": 0.1,
        "tail": ('": 0.375, "vocab_coverage": 0.499}, "sf": 0.1, '
                 '"headline22": {"q1_pricing_summary": 1.2, '
                 '"dedup_exact": 0.8}, "headline22_total": 12.33, '
                 '"total_sec": 49.2}')}))
    got = compare_bench.load_queries(str(p))
    assert got["q1_pricing_summary"] == 1.2
    assert got["dedup_exact"] == 0.8
    assert got["vocab_coverage"] == 0.499
    assert "headline22_total" not in got and "total_sec" not in got


def test_regression_threshold_needs_ratio_and_floor(tmp_path, capsys):
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps({"queries": {
        "big": 2.0, "small": 0.10, "fine": 1.0}}))
    new.write_text(json.dumps({"queries": {
        "big": 3.5,     # 1.75x and +1.5s -> regression
        "small": 0.25,  # 2.5x but only +0.15s -> noise, below floor
        "fine": 1.1}}))
    import sys
    argv, sys.argv = sys.argv, ["compare_bench", str(old), str(new)]
    try:
        rc = compare_bench.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert rc == 1
    assert "REGRESSION big" in out
    assert "small" not in out.replace("1 regression", "")
    assert "1 regression(s)" in out
