"""DuckDB-oracle differential test utilities.

Mimics the driver's correctness gate: run the Spark implementation and the
oracle SQL on the same parquet tables, then compare row count, column names,
and order-insensitive normalized values (SURVEY.md §5 test plan).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math
from typing import Any

import duckdb

from dataclod_spark.session import TABLES

FLOAT_DIGITS = 6


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """Fresh DuckDB connection with the driver tables registered as views."""
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        except duckdb.Error:
            pass
    return con


def _norm_value(v: Any) -> Any:
    """Normalize one cell.

    Numeric values carry a type tag ("i" int / "f" float / "d" decimal) so
    that an integer on the Spark side never compares equal to a
    Decimal/float on the oracle side — the driver's value-hash is
    dtype-sensitive (DuckDB widens sum(BIGINT) to HUGEINT, which hashes
    differently even when values are identical), and Python's 123 == 123.0
    used to mask exactly that class locally (VERDICT r3 finding #1)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, _dec.Decimal):
        f = float(v)
        if math.isnan(f):
            return ("d", "NaN")
        r = round(f, FLOAT_DIGITS)
        return ("d", 0.0 if r == 0 else r)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        r = round(v, FLOAT_DIGITS)
        return ("f", 0.0 if r == 0 else r)  # normalize -0.0
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm_value(x) for x in v)
    return v


def normalize_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(row[i]) for i in order) for row in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare_query(spark, sf_dir: str, spark_fn, oracle: str) -> tuple[bool, str]:
    """Run spark_fn and oracle side by side; return (match, detail)."""
    sdf = spark_fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(oracle)
        d_cols = [d[0].lower() for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    sn = normalize_rows(s_cols, s_rows)
    dn = normalize_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
