"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (Q1 pricing summary) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the
LLM-pipeline extensions), as ``(spark, sf_dir) -> DataFrame`` callables.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents for the
SQL-expressible subset; non-SQL-expressible ops get rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataclod_spark.registry import load_all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all_queries()
    return registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return {
        name: qd.oracle for name, qd in load_all_queries().items() if qd.oracle is not None
    }
