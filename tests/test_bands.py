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


def test_cli_exit_codes_distinguish_crash_from_flag(tmp_path):
    """Exit 2 (unusable input) must be distinct from exit 1 (perf flag):
    a gating script reads 1 as 'regression'; a crashed bench is not one."""
    import subprocess
    import sys

    env_dir = "/root/repo"
    r = subprocess.run(
        [sys.executable, "-m", "dataclod_spark.bands", "-"],
        input="", capture_output=True, text=True, cwd=env_dir,
    )
    assert r.returncode == 2 and "no steady block" in r.stderr
    r2 = subprocess.run(
        [sys.executable, "-m", "dataclod_spark.bands", "-"],
        input="[1, 2]", capture_output=True, text=True, cwd=env_dir,
    )
    assert r2.returncode == 2
    # a valid run with no history flags nothing -> exit 0
    f = tmp_path / "b.json"
    f.write_text('{"steady": {"zz_nonexistent_query": 1.0}}')
    r3 = subprocess.run(
        [sys.executable, "-m", "dataclod_spark.bands", str(f)],
        capture_output=True, text=True, cwd=env_dir,
    )
    assert r3.returncode == 0 and "no history" in r3.stdout


def test_iter_round_files_shared_scanner(tmp_path):
    from dataclod_spark.rotation import iter_round_files

    (tmp_path / "BENCH_r03.json").write_text('{"a": 1}')
    (tmp_path / "BENCH_r11.json").write_text('{"a": 2}')
    (tmp_path / "BENCH_rX.json").write_text('{"a": 3}')   # no round number
    (tmp_path / "BENCH_r04.json").write_text('{oops')     # unreadable: skipped
    got = list(iter_round_files(str(tmp_path), "BENCH"))
    assert got == [(3, {"a": 1}), (11, {"a": 2})]
    assert list(iter_round_files(str(tmp_path), "CORRECTNESS")) == []
