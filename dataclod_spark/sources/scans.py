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
