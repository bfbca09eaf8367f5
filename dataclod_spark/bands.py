"""Perf-band regression check for ``bench.py`` output (VERDICT r9 #5).

The driver's per-round bench numbers are host-noise-prone (r9: driver
steady 20.08 s vs judge idle re-run 14.76 s on identical code), so
per-query regressions are judged against a BAND, not a single number:

* the **floor** for each query is the best (minimum) steady time ever
  recorded for it across ``BENCH_r*.json`` — the cleanest observed run
  is the closest thing to the query's true cost on this box;
* a run is flagged when a query exceeds ``factor`` × its floor
  (default 1.3, the bar the r9 verdict graded with).

Usage (the COVERAGE ledger step)::

    python bench.py 2>/dev/null | tail -1 | python -m dataclod_spark.bands -
    python -m dataclod_spark.bands BENCH_r09.json

Prints one line per headline query — floor, current, ratio, flag — and
exits nonzero when any query is flagged, so the closing battery can
gate on it.  Noise on a single flagged query is distinguished from a
real regression the same way the r9 judge did: re-run best-of-N on an
idle box; a regression reproduces, contention does not.
"""

from __future__ import annotations

import json
import os
import sys

from dataclod_spark.rotation import iter_round_files


def _steady_block(data: dict) -> dict[str, float] | None:
    """Extract the steady per-query timings from one BENCH_r*.json.

    The driver wraps the bench line in ``{"parsed": {...}}``; a raw
    ``bench.py`` line has the keys at top level.  ``steady`` (warm) is
    the comparable number; one-shot includes JVM/codegen warmup."""
    parsed = data.get("parsed") if isinstance(data.get("parsed"), dict) else data
    steady = parsed.get("steady")
    return steady if isinstance(steady, dict) else None


def load_floors(repo_dir: str) -> dict[str, tuple[float, int]]:
    """query -> (best steady seconds ever recorded, round it came from)."""
    floors: dict[str, tuple[float, int]] = {}
    for rnd, data in iter_round_files(repo_dir, "BENCH"):
        steady = _steady_block(data) if isinstance(data, dict) else None
        if not steady:
            continue
        for name, sec in steady.items():
            if not isinstance(sec, (int, float)) or sec <= 0:
                continue
            if name not in floors or sec < floors[name][0]:
                floors[name] = (float(sec), rnd)
    return floors


def check(
    current: dict[str, float],
    floors: dict[str, tuple[float, int]],
    factor: float = 1.3,
) -> list[dict]:
    """One report row per query in ``current``; ``flag`` marks > factor×floor."""
    rows = []
    for name in sorted(current):
        sec = current[name]
        floor = floors.get(name)
        if floor is None:
            rows.append({"query": name, "steady": sec, "floor": None,
                         "ratio": None, "flag": False, "note": "no history"})
            continue
        ratio = sec / floor[0]
        rows.append({
            "query": name, "steady": sec, "floor": floor[0],
            "floor_round": floor[1], "ratio": round(ratio, 2),
            "flag": ratio > factor,
        })
    return rows


def _main() -> int:  # pragma: no cover - CLI convenience
    # exit codes: 0 = no flags, 1 = a query flagged, 2 = unusable input.
    # A crashed/empty bench run must land on 2, NOT 1 — a gating script
    # reads 1 as "perf regression", and a crash is not a regression.
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arg = sys.argv[1] if len(sys.argv) > 1 else "-"
    raw = sys.stdin.read() if arg == "-" else open(arg).read()
    # accept a whole JSON document (BENCH_r*.json is pretty-printed) or a
    # stream whose LAST line is the bench JSON (piped `bench.py` output)
    try:
        data = json.loads(raw)
    except ValueError:
        lines = raw.strip().splitlines()
        try:
            data = json.loads(lines[-1]) if lines else None
        except ValueError:
            data = None
    steady = _steady_block(data) if isinstance(data, dict) else None
    if not steady:
        print("no steady block found (empty or malformed bench output)",
              file=sys.stderr)
        return 2
    floors = load_floors(repo_dir)
    rows = check(steady, floors)
    any_flag = False
    for r in rows:
        if r.get("floor") is None:
            print(f"  {r['query']:<36} {r['steady']:>6.2f}s  (no history)")
            continue
        mark = " <-- FLAG (>1.3x floor)" if r["flag"] else ""
        any_flag = any_flag or r["flag"]
        print(f"  {r['query']:<36} {r['steady']:>6.2f}s  floor {r['floor']:.2f}s"
              f" (r{r['floor_round']})  x{r['ratio']}{mark}")
    total = sum(steady.values())
    print(f"steady_total {total:.2f}s over {len(steady)} queries;"
          f" flags={'YES' if any_flag else 'none'}")
    return 1 if any_flag else 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(_main())
