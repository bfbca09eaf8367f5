"""Differential tests: every registered query with an oracle must match
DuckDB on sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from dataclod_spark.registry import load_all_queries
from dataclod_spark.testing import compare_query

from conftest import SF_SMOKE

_REGISTRY = load_all_queries()
_WITH_ORACLE = sorted(name for name, qd in _REGISTRY.items() if qd.oracle)
_ROWS_ONLY = sorted(name for name, qd in _REGISTRY.items() if not qd.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, name):
    # strict=True is the driver-grade comparator (zero-sign-bit
    # sensitive): the lenient mode masked v15's -0.0 driver-red in r9,
    # so the standing gate runs at least as strict as the driver's hash
    qd = _REGISTRY[name]
    ok, detail = compare_query(spark, SF_SMOKE, qd.fn, qd.oracle, strict=True)
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    qd = _REGISTRY[name]
    df = qd.fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
