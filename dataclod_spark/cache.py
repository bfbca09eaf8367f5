"""Cached on-disk materialization with a race-free lifecycle.

Several gate queries materialize a derived copy of a source table once per
(source, mtime) and then read it repeatedly (p2's hive-partitioned events,
c5's ORC export).  Concurrent sessions — the pgwire server is thread-per-
connection over one shared EngineSession, and multiple driver processes may
run on one host — must never observe a partial directory or delete a
complete one mid-read.

``materialize_once`` gives that lifecycle:

* complete directories are identified ONLY by their ``_SUCCESS`` marker and,
  once complete, are never deleted;
* the write path runs under an exclusive ``flock`` on a sibling lock file,
  so exactly one writer stages (into a private scratch dir) and atomically
  renames into place; stale markerless partials (from pre-lock layouts) are
  cleared inside the same critical section;
* readers that see the marker can read forever — nothing revokes a
  complete copy (a regenerated source changes the mtime-derived key and
  lands at a different path).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Callable


def source_key(src_path: str) -> str:
    """Cache key for a source file: md5 of absolute path + mtime, so a
    regenerated source never hits a stale materialization."""
    import hashlib

    try:
        stamp = f"{os.path.abspath(src_path)}:{os.path.getmtime(src_path)}"
    except OSError:
        stamp = os.path.abspath(src_path)
    return hashlib.md5(stamp.encode()).hexdigest()[:12]


def materialize_once(base: str, write_fn: Callable[[str], None]) -> str:
    """Ensure ``base`` holds a complete materialization; returns ``base``.

    ``write_fn(staged_path)`` must produce a directory containing a
    ``_SUCCESS`` marker (any Spark ``DataFrameWriter`` does)."""
    marker = os.path.join(base, "_SUCCESS")
    if os.path.exists(marker):
        return base
    import fcntl

    lock_path = base + ".lock"
    with open(lock_path, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            if not os.path.exists(marker):
                # stage on the SAME filesystem as base — os.rename cannot
                # cross mounts (EXDEV), and tempfile.gettempdir() may be a
                # different device (tmpfs) than the caller's base
                scratch = tempfile.mkdtemp(
                    dir=os.path.dirname(os.path.abspath(base)),
                    prefix=os.path.basename(base) + "_w",
                )
                try:
                    staged = os.path.join(scratch, "data")
                    write_fn(staged)
                    if os.path.isdir(base):
                        # markerless partial from a pre-lock layout; safe to
                        # clear under the lock (complete dirs have markers
                        # and never reach this branch)
                        shutil.rmtree(base, ignore_errors=True)
                    os.rename(staged, base)
                finally:
                    shutil.rmtree(scratch, ignore_errors=True)
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)
    return base
