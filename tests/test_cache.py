"""Lifecycle tests for cache.materialize_once (the shared materialization
used by p2_partition_pruning and c5_scan_orc)."""

from __future__ import annotations

import os
import tempfile
import threading


def _writer(calls, delay=0.0):
    import time

    def write_fn(staged):
        calls.append(staged)
        time.sleep(delay)
        os.makedirs(staged)
        with open(os.path.join(staged, "part-0"), "w") as f:
            f.write("data")
        with open(os.path.join(staged, "_SUCCESS"), "w") as f:
            f.write("")

    return write_fn


def test_materialize_once_single_writer_under_contention():
    """N racing threads produce exactly one write; every thread sees the
    complete directory afterward."""
    from dataclod_spark.cache import materialize_once

    base = os.path.join(tempfile.mkdtemp(), "m")
    calls: list[str] = []
    errors: list[Exception] = []

    def run():
        try:
            out = materialize_once(base, _writer(calls, delay=0.05))
            assert os.path.exists(os.path.join(out, "_SUCCESS"))
            assert open(os.path.join(out, "part-0")).read() == "data"
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=run) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(calls) == 1, f"{len(calls)} writers ran; expected exactly 1"


def test_materialize_once_recovers_stale_partial():
    """A markerless partial directory (pre-lock layout) is replaced by a
    complete copy."""
    from dataclod_spark.cache import materialize_once

    base = os.path.join(tempfile.mkdtemp(), "m")
    os.makedirs(base)
    with open(os.path.join(base, "part-junk"), "w") as f:
        f.write("partial")
    calls: list[str] = []
    materialize_once(base, _writer(calls))
    assert len(calls) == 1
    assert os.path.exists(os.path.join(base, "_SUCCESS"))
    assert not os.path.exists(os.path.join(base, "part-junk"))


def test_materialize_once_skips_when_complete():
    from dataclod_spark.cache import materialize_once

    base = os.path.join(tempfile.mkdtemp(), "m")
    calls: list[str] = []
    materialize_once(base, _writer(calls))
    materialize_once(base, _writer(calls))
    assert len(calls) == 1


def test_source_key_changes_with_mtime(tmp_path):
    from dataclod_spark.cache import source_key

    p = tmp_path / "f.parquet"
    p.write_text("x")
    k1 = source_key(str(p))
    os.utime(p, (1_700_000_000, 1_700_000_000))
    k2 = source_key(str(p))
    assert k1 != k2
    assert source_key(str(p)) == k2
