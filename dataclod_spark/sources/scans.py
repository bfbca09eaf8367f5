"""Federated scan functions — SURVEY.md §2.A.2 (UDTF scans).

Reimplements the reference's four scan table-functions
(``src/core/src/expr/udtf/{duckdb,postgres,mysql,sqlite}_scan.rs``) as
engine API functions returning DataFrames:

* ``scan_duckdb(spark, db_path, database, table)``  (duckdb_scan.rs:14-45)
* ``scan_sqlite(spark, db_path, table)``            (sqlite_scan.rs:16-55)
* ``scan_postgres(spark, dsn, database, table)``    (postgres_scan.rs:16-52)
* ``scan_mysql(spark, dsn, database, table)``       (mysql_scan.rs:16-52)

DuckDB/SQLite read through their embedded engines via Arrow and are fully
functional here.  Postgres/MySQL require a network database: they ride
Spark's JDBC source (the scalable path — predicate pushdown + partitioned
reads) and raise a clear error when no JDBC driver is on the classpath.

Scale note: the embedded-file scans materialize through the driver (an
embedded file is driver-local by definition — same as the reference, which
opens the file in-process).  For large federated tables use the JDBC path
with ``partition_column/num_partitions`` so executors read in parallel.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def _quote_ident(name: str) -> str:
    """Safely double-quote a SQL identifier (embedded quotes doubled), so a
    table/database name can never escape its quoting (identifier injection)."""
    return '"' + name.replace('"', '""') + '"'


def scan_duckdb(
    spark: SparkSession, db_path: str, database: str = "main", table: str = ""
) -> DataFrame:
    """Mount a table of a DuckDB database file as a DataFrame."""
    import duckdb

    con = duckdb.connect(db_path, read_only=True)
    try:
        qualified = (
            f"{_quote_ident(database)}.{_quote_ident(table)}"
            if database not in ("", "main")
            else _quote_ident(table)
        )
        tbl = con.execute(f"SELECT * FROM {qualified}").fetch_arrow_table()
    finally:
        con.close()
    # hand Arrow straight to Spark — avoids the pandas round-trip that
    # loses Arrow types (dates/decimals → object) and doubles memory
    try:
        return spark.createDataFrame(tbl)
    except Exception:  # older Spark without Arrow-table support
        return spark.createDataFrame(tbl.to_pandas())


def scan_sqlite(spark: SparkSession, db_path: str, table: str) -> DataFrame:
    """Mount a table of a SQLite database file as a DataFrame."""
    import sqlite3

    import pandas as pd

    con = sqlite3.connect(db_path)
    try:
        pdf = pd.read_sql_query(f"SELECT * FROM {_quote_ident(table)}", con)
    finally:
        con.close()
    return spark.createDataFrame(pdf)


def _jdbc_scan(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: Optional[str] = None,
    num_partitions: int = 8,
    lower_bound: Optional[int] = None,
    upper_bound: Optional[int] = None,
    **options: str,
) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - driver-dependent
        raise RuntimeError(
            f"JDBC scan of {table} failed — a JDBC driver for this database "
            f"must be on spark.jars (none is bundled in this container): {exc}"
        ) from exc


def scan_postgres(
    spark: SparkSession, dsn: str, database: str, table: str, **options: str
) -> DataFrame:
    """Mount a PostgreSQL table via Spark's JDBC source (partitionable)."""
    url = dsn if dsn.startswith("jdbc:") else f"jdbc:postgresql://{dsn}/{database}"
    return _jdbc_scan(spark, url, table, **options)


def scan_mysql(
    spark: SparkSession, dsn: str, database: str, table: str, **options: str
) -> DataFrame:
    """Mount a MySQL table via Spark's JDBC source (partitionable)."""
    url = dsn if dsn.startswith("jdbc:") else f"jdbc:mysql://{dsn}/{database}"
    return _jdbc_scan(spark, url, table, **options)


# -- SQL table functions ------------------------------------------------------
#
# The reference registers its scans as SQL table functions
# (``register_udtf``, src/core/src/expr/udtf/mod.rs:10-15) so users write
# ``SELECT * FROM duckdb_scan('file.db', 'main', 't')``.  Spark 4's
# polymorphic Python UDTFs give the same surface: ``analyze`` runs at plan
# time on the literal arguments and derives the result schema from the
# database file's own metadata; ``eval`` streams the rows.  Executors must
# see the file path (embedded files are driver-local by definition — same
# in-process model as the reference; the JDBC scans remain the scalable
# federation path).


def _arrow_to_spark_schema(arrow_schema):
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(arrow_schema)


class _DuckdbScanUDTF:
    @staticmethod
    def analyze(db_path, database, table):
        import duckdb

        from pyspark.sql.udtf import AnalyzeResult

        con = duckdb.connect(db_path.value, read_only=True)
        try:
            qualified = (
                f"{_quote_ident(database.value)}.{_quote_ident(table.value)}"
                if database.value not in ("", "main")
                else _quote_ident(table.value)
            )
            empty = con.execute(f"SELECT * FROM {qualified} LIMIT 0").fetch_arrow_table()
        finally:
            con.close()
        return AnalyzeResult(schema=_arrow_to_spark_schema(empty.schema))

    def eval(self, db_path: str, database: str, table: str):
        import duckdb

        con = duckdb.connect(db_path, read_only=True)
        try:
            qualified = (
                f"{_quote_ident(database)}.{_quote_ident(table)}"
                if database not in ("", "main")
                else _quote_ident(table)
            )
            tbl = con.execute(f"SELECT * FROM {qualified}").fetch_arrow_table()
        finally:
            con.close()
        names = tbl.schema.names
        for rec in tbl.to_pylist():
            yield tuple(rec[n] for n in names)


_SQLITE_TYPE_MAP = [
    ("INT", "long"),
    ("CHAR", "string"),
    ("CLOB", "string"),
    ("TEXT", "string"),
    ("BLOB", "binary"),
    ("REAL", "double"),
    ("FLOA", "double"),
    ("DOUB", "double"),
    ("NUMERIC", "double"),
    ("DECIMAL", "double"),
    ("BOOLEAN", "boolean"),
]


def _sqlite_spark_type(declared: str) -> str:
    up = (declared or "").upper()
    for frag, spark_t in _SQLITE_TYPE_MAP:
        if frag in up:
            return spark_t
    return "string"  # SQLite dynamic typing fallback (TEXT affinity)


class _SqliteScanUDTF:
    @staticmethod
    def analyze(db_path, table):
        import sqlite3

        from pyspark.sql.types import StructType
        from pyspark.sql.udtf import AnalyzeResult

        con = sqlite3.connect(db_path.value)
        try:
            info = con.execute(
                f"PRAGMA table_info({_quote_ident(table.value)})"
            ).fetchall()
        finally:
            con.close()
        if not info:
            raise ValueError(f"sqlite_scan: no such table {table.value!r}")
        schema = StructType()
        for _cid, name, decl, _notnull, _dflt, _pk in info:
            schema = schema.add(name, _sqlite_spark_type(decl))
        return AnalyzeResult(schema=schema)

    def eval(self, db_path: str, table: str):
        import sqlite3

        con = sqlite3.connect(db_path)
        try:
            info = con.execute(f"PRAGMA table_info({_quote_ident(table)})").fetchall()
            types = [_sqlite_spark_type(r[2]) for r in info]
            for row in con.execute(f"SELECT * FROM {_quote_ident(table)}"):
                yield tuple(
                    (str(v) if t == "string" and v is not None else v)
                    for v, t in zip(row, types)
                )
        finally:
            con.close()


def register_scan_udtfs(spark: SparkSession) -> None:
    """Register ``duckdb_scan``/``sqlite_scan`` as SQL table functions
    (mod.rs:10-15 parity).  ``postgres_scan``/``mysql_scan`` stay Python-API
    (JDBC) — a UDTF that funnels a network table through one Python worker
    would defeat Spark's partitioned JDBC reads."""
    if getattr(spark, "_dataclod_scan_udtfs_registered", False):
        return
    spark._dataclod_scan_udtfs_registered = True
    from pyspark.sql.functions import udtf

    spark.udtf.register("duckdb_scan", udtf(_DuckdbScanUDTF))
    spark.udtf.register("sqlite_scan", udtf(_SqliteScanUDTF))
