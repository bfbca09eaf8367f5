"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (Q1 pricing summary) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the
LLM-pipeline extensions), as ``(spark, sf_dir) -> DataFrame`` callables.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents for the
SQL-expressible subset; non-SQL-expressible ops get rows-only checks.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataclod_spark.registry import load_all_queries
from dataclod_spark.rotation import load_history, rotation_order

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all_queries()
    return registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


# Queries whose RESULT VALUES may differ from their latest driver row
# because this round's tree changed the implementation or the oracle —
# they jump to the very front of the correctness window.  Reset this
# list at the start of each round; entries left over from a prior round
# only waste window slots (never produce a wrong check).
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    # round 11 (rotation-and-measurement round; r10's 45 entries banked
    # green in CORRECTNESS_r10 and are reset per the contract above):
    # g23's ORACLE moved to the position-space walk (row-identical at
    # sf0.001/sf0.01 by direct DuckDB comparison, but the text changed,
    # so a fresh driver row should prove the new oracle).  The r11
    # ADVICE fixes (_budget_expr NULL-stratum eqNullSafe, _jdbc_url
    # credential parsing, _sqlite_coerce error) change NO registry
    # values — sf test data has zero NULL lang/source strata — so they
    # consume no window slots; the freed window drains the r5-stale
    # backlog (d2, d3, d5, d11, e3, st10, x2-x6) the r10 verdict flagged.
    "g23_dbscan_clusters",
)

# The driver samples a bounded window (50 in r2-r5) of the registry in
# dict order.  The order is GENERATED from the CORRECTNESS_r*.json
# history (changed-this-round first, then never-driver-checked, then
# non-green, then stalest-first) — see dataclod_spark/rotation.py for
# the policy and tests/test_rotation.py for the window guarantees.
_PRIORITY = rotation_order(
    list(load_all_queries()),
    load_history(_REPO_DIR),
    _CHANGED_THIS_ROUND,
)


def _ordered() -> dict[str, object]:
    registry = load_all_queries()
    out = {}
    for name in _PRIORITY:
        if name in registry:
            out[name] = registry[name]
    for name, qd in registry.items():
        if name not in out:
            out[name] = qd
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
