"""Perf-band regression check (dataclod_spark.bands)."""

from __future__ import annotations

import json

from dataclod_spark.bands import _steady_block, check, load_floors


def test_load_floors_takes_min_across_rounds(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(
        {"parsed": {"steady": {"q1": 2.0, "q2": 0.5}}}
    ))
    # raw bench.py shape (no "parsed" wrapper) must also count
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(
        {"steady": {"q1": 1.5, "q2": 0.9, "q3": 3.0}}
    ))
    # unreadable file is skipped, not fatal
    (tmp_path / "BENCH_r03.json").write_text("{not json")
    floors = load_floors(str(tmp_path))
    assert floors == {"q1": (1.5, 2), "q2": (0.5, 1), "q3": (3.0, 2)}


def test_check_flags_above_factor():
    floors = {"q1": (1.0, 7), "q2": (2.0, 8)}
    rows = {r["query"]: r for r in check(
        {"q1": 1.29, "q2": 2.7, "q9": 0.4}, floors
    )}
    assert not rows["q1"]["flag"]          # 1.29x <= 1.3
    assert rows["q2"]["flag"]              # 1.35x > 1.3
    assert rows["q2"]["floor_round"] == 8
    assert not rows["q9"]["flag"] and rows["q9"]["floor"] is None  # no history


def test_steady_block_both_shapes():
    assert _steady_block({"steady": {"a": 1.0}}) == {"a": 1.0}
    assert _steady_block({"parsed": {"steady": {"a": 1.0}}}) == {"a": 1.0}
    assert _steady_block({"parsed": {"value": 3}}) is None
