"""Central query registry — the engine's operator inventory surface.

Every implemented operator/query from SURVEY.md §2 registers here as a
``QueryDef``: a Spark implementation ``(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) an ANSI-SQL oracle string that DuckDB can run on the
same parquet tables.  ``__spark_entry__.py`` exposes this registry to the
driver; ``bench.py`` times a headline subset.

Column-name discipline: every computed column is aliased identically in the
Spark plan and the oracle SQL (the driver's compare sorts columns by name
before value-hashing).  Floating aggregates are rounded on BOTH sides to make
the value-hash robust to summation order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QueryDef"] = {}


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: SparkQuery
    oracle: Optional[str]
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


def query(
    name: str,
    oracle: Optional[str] = None,
    doc: str = "",
    bench: bool = False,
) -> Callable[[SparkQuery], SparkQuery]:
    """Register a query implementation under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver parquet table (column-pruned, filter-pushdown capable).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark does
    not read natively — the loader sets ``legacy.parquet.nanosAsLong``
    (defensively: the driver may call queries with its own SparkSession,
    not one from ``get_spark``) and converts nanos → micros (matching
    DuckDB's truncation).  Session timezone is pinned to UTC for the same
    reason — timestamp semantics must not depend on the host timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for f in df.schema.fields:
        if isinstance(f.dataType, T.LongType) and f.name == "ts" and table == "events":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def dsum(col, scale: int = 6):
    """Order-independent double sum: accumulate as exact DECIMAL, cast back.

    FP addition is not associative — Spark and DuckDB sum partitions in
    different orders, so ``round(sum(double), 2)`` can land on opposite sides
    of a cent boundary.  Casting each addend to DECIMAL(18,scale) makes the
    sum exact and order-independent; both engines then produce bit-identical
    doubles.  (The per-addend cast is itself deterministic: at scale 6 the
    products of 2-decimal source values are exactly representable, so the
    cast never sits on a rounding boundary.)
    The matching oracle spelling is
    ``CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE)``.
    """
    from pyspark.sql import functions as F

    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def davg(col, scale: int = 6):
    """Order-independent double average (see dsum): exact sum / count."""
    from pyspark.sql import functions as F

    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double") / F.count(col)


def load_all_queries() -> dict[str, QueryDef]:
    """Import all query modules (populating REGISTRY) and return it."""
    import dataclod_spark.queries  # noqa: F401  (imports register queries)

    return REGISTRY
