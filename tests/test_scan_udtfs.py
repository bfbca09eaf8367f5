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


# ---------- round 10: declared-type coercion & DSN/bounds hygiene ------------


@pytest.fixture(scope="module")
def typed_sqlite():
    path = os.path.join(tempfile.gettempdir(), "udtf_scan_typed.sqlite")
    if os.path.exists(path):
        os.remove(path)
    sc = sqlite3.connect(path)
    sc.execute(
        "CREATE TABLE typed (b BOOLEAN, n NUMERIC, i INTEGER, s TEXT)"
    )
    # SQLite stores booleans/NUMERIC as INTEGER; i gets a NULL (pandas
    # inference used to widen the whole column to double); s stores an int
    # (dynamic typing)
    sc.executemany(
        "INSERT INTO typed VALUES (?,?,?,?)",
        [(1, 5, 10, "x"), (0, 7, None, 42)],
    )
    sc.execute("CREATE TABLE empty_t (id INTEGER, s TEXT)")
    sc.commit()
    sc.close()
    return path


def test_sqlite_udtf_coerces_declared_types(engine, typed_sqlite):
    """BOOLEAN/NUMERIC stored as INTEGER must come back as true/5.0, not
    NULL (Spark's row conversion nulls type-mismatched values)."""
    df = engine.sql(
        f"SELECT * FROM sqlite_scan('{typed_sqlite}', 'typed') ORDER BY i NULLS LAST"
    )
    assert dict(df.dtypes) == {
        "b": "boolean", "n": "double", "i": "bigint", "s": "string"
    }
    assert [tuple(r) for r in df.collect()] == [
        (True, 5.0, 10, "x"),
        (False, 7.0, None, "42"),
    ]


def test_scan_sqlite_api_matches_udtf_types(spark, typed_sqlite):
    """scan_sqlite (the API path) uses the same declared-type mapping as
    the UDTF — pandas inference used to widen NULL-bearing INTEGER to
    double and diverge between the two paths."""
    from dataclod_spark.sources.scans import scan_sqlite

    df = scan_sqlite(spark, typed_sqlite, "typed")
    assert dict(df.dtypes) == {
        "b": "boolean", "n": "double", "i": "bigint", "s": "string"
    }
    got = sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: (t[2] is None, t[2] or 0),
    )
    assert got == [(True, 5.0, 10, "x"), (False, 7.0, None, "42")]


def test_scan_sqlite_empty_table(spark, typed_sqlite):
    """Empty table: explicit declared schema, no inference crash."""
    from dataclod_spark.sources.scans import scan_sqlite

    df = scan_sqlite(spark, typed_sqlite, "empty_t")
    assert df.count() == 0
    assert dict(df.dtypes) == {"id": "bigint", "s": "string"}


def test_jdbc_url_normalization():
    from dataclod_spark.sources.scans import _jdbc_url

    # ready JDBC URL passes through
    assert _jdbc_url("jdbc:postgresql://h:5432/db", "x", "postgresql") == (
        "jdbc:postgresql://h:5432/db",
        {},
    )
    # URI DSN (the reference's form) gets the jdbc: prefix, db appended
    # only when the DSN carries no path; inline credentials move to JDBC
    # options (the JDBC drivers reject userinfo in the authority)
    assert _jdbc_url("postgresql://u:p@h:5432", "db", "postgresql") == (
        "jdbc:postgresql://h:5432/db",
        {"user": "u", "password": "p"},
    )
    assert _jdbc_url("postgresql://u:p@h:5432/mydb", "ignored", "postgresql") == (
        "jdbc:postgresql://h:5432/mydb",
        {"user": "u", "password": "p"},
    )
    assert _jdbc_url("postgres://h", "db", "postgresql") == (
        "jdbc:postgresql://h/db",
        {},
    )
    # bare host:port keeps the old behavior
    assert _jdbc_url("h:5432", "db", "mysql") == ("jdbc:mysql://h:5432/db", {})


def test_jdbc_url_credential_edge_cases():
    from dataclod_spark.sources.scans import _jdbc_url

    # user with no password
    assert _jdbc_url("postgresql://alice@h/db", "x", "postgresql") == (
        "jdbc:postgresql://h/db",
        {"user": "alice"},
    )
    # percent-encoded special characters decode (URI form requires
    # encoding @ : / inside credentials)
    assert _jdbc_url("postgresql://u%40corp:p%3Aw@h:5432/db", "x", "postgresql") == (
        "jdbc:postgresql://h:5432/db",
        {"user": "u@corp", "password": "p:w"},
    )


def test_jdbc_partition_bounds_required(spark):
    from dataclod_spark.sources.scans import scan_postgres

    with pytest.raises(ValueError, match="lower_bound/upper_bound"):
        scan_postgres(
            spark, "h:5432", "db", "t", partition_column="id"
        )


def test_scan_sqlite_nonintegral_float_in_integer_column(spark):
    """A column declared INTEGER storing a non-integral float (SQLite
    dynamic typing) is unrepresentable under the declared schema — the
    scan must raise a clear error naming the column, not let Spark's row
    verifier throw an opaque TypeError (ADVICE r10)."""
    from dataclod_spark.sources.scans import _sqlite_coerce, scan_sqlite

    path = os.path.join(tempfile.gettempdir(), "udtf_scan_badfloat.sqlite")
    if os.path.exists(path):
        os.remove(path)
    sc = sqlite3.connect(path)
    sc.execute("CREATE TABLE bad (id INTEGER, v INTEGER)")
    sc.execute("INSERT INTO bad VALUES (1, 2.5)")
    sc.commit()
    sc.close()
    with pytest.raises(ValueError, match="column 'v'.*non-integral float 2.5"):
        scan_sqlite(spark, path, "bad")
    # integral floats still narrow losslessly
    assert _sqlite_coerce(3.0, "long", "v") == 3
