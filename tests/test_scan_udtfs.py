"""SQL table-function scans (reference udtf/mod.rs:10-15 parity):
``SELECT * FROM duckdb_scan(...)`` / ``sqlite_scan(...)`` with plan-time
schema derivation from the database file's own metadata."""

from __future__ import annotations

import os
import sqlite3
import tempfile

import duckdb
import pytest


@pytest.fixture(scope="module")
def dbfiles():
    dpath = os.path.join(tempfile.gettempdir(), "udtf_scan_test.duckdb")
    spath = os.path.join(tempfile.gettempdir(), "udtf_scan_test.sqlite")
    for p in (dpath, spath):
        if os.path.exists(p):
            os.remove(p)
    con = duckdb.connect(dpath)
    con.execute(
        "CREATE TABLE t AS SELECT i AS id, 'n' || i AS name, CAST(i AS DOUBLE) * 1.5 AS val "
        "FROM range(5) tbl(i)"
    )
    con.close()
    sc = sqlite3.connect(spath)
    sc.execute("CREATE TABLE s (id INTEGER, name TEXT, val REAL)")
    sc.executemany("INSERT INTO s VALUES (?,?,?)", [(i, f"n{i}", i * 1.5) for i in range(5)])
    sc.commit()
    sc.close()
    return dpath, spath


def test_duckdb_scan_sql(engine, dbfiles):
    dpath, _ = dbfiles
    df = engine.sql(f"SELECT * FROM duckdb_scan('{dpath}', 'main', 't') ORDER BY id")
    assert dict(df.dtypes) == {"id": "bigint", "name": "string", "val": "double"}
    assert [tuple(r) for r in df.collect()] == [
        (i, f"n{i}", i * 1.5) for i in range(5)
    ]


def test_sqlite_scan_sql_with_filter(engine, dbfiles):
    _, spath = dbfiles
    df = engine.sql(
        f"SELECT id, val FROM sqlite_scan('{spath}', 's') WHERE id >= 3 ORDER BY id"
    )
    assert [tuple(r) for r in df.collect()] == [(3, 4.5), (4, 6.0)]


def test_sqlite_scan_missing_table_errors(engine, dbfiles):
    _, spath = dbfiles
    with pytest.raises(Exception, match="no such table"):
        engine.sql(f"SELECT * FROM sqlite_scan('{spath}', 'nope')").collect()
