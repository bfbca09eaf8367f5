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

import functools
import os
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


# Tables whose pipelines are dominated by NARROW per-row compute (shingling/
# hashing, vector math) — for these, an unsplittable scan serializes seconds
# of work onto one core and the spread's extra exchange pays for itself many
# times over (measured: d2 3.85 s → 0.62 s steady; full 88-query A/B in
# plans/r11/ab_registry_full.log).  Relational/event tables shuffle or
# broadcast right after the scan, so the spread's extra exchange is pure
# stage overhead there (measured: blanket spread regressed
# q3/q5/q9/q13/q18/w1/e1/j2/a2 by 1.3–2×).  Call sites override either way
# where the A/B measured the opposite of their table's default (25
# ``spread=False`` opt-outs — sampling gates, media mapInArrow pipelines,
# profile/merge-loop queries — and the q1/q18 ``spread=True`` opt-ins).
_SPREAD_TABLES = frozenset({"documents", "embeddings"})


def load(
    spark: SparkSession, sf_dir: str, table: str, spread: bool | None = None
) -> DataFrame:
    """Read one driver parquet table (column-pruned, filter-pushdown capable).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark does
    not read natively — the loader sets ``legacy.parquet.nanosAsLong``
    (defensively: the driver may call queries with its own SparkSession,
    not one from ``get_spark``) and converts nanos → micros (matching
    DuckDB's truncation).  Session timezone is pinned to UTC for the same
    reason — timestamp semantics must not depend on the host timezone.

    ``spread`` — repartition an unsplittable small scan to the session's
    core count (see :func:`_spread_unsplittable_scan`).  ``None`` applies
    the measured per-table default (payload tables yes, relational no);
    call sites override either way where they measured differently.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{table}.parquet"
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for f in df.schema.fields:
        if isinstance(f.dataType, T.LongType) and f.name == "ts" and table == "events":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # session override: "false" = never spread, "always" = every table,
    # "auto" (default) = per-table default + call-site overrides
    try:
        mode = spark.conf.get("spark.dataclod.spreadSmallScans", "auto")
    except Exception:
        mode = "auto"
    if mode == "false":
        spread = False
    elif mode == "always":
        spread = True
    elif spread is None:
        spread = table in _SPREAD_TABLES
    if spread:
        df = _spread_unsplittable_scan(spark, df, path)
    return df


def _parse_bytes(v: str) -> int:
    """Spark byte-string (``134217728`` / ``128m`` / ``1g``) → bytes."""
    s = v.strip().lower().removesuffix("b")
    for suf, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40)):
        if s.endswith(suf):
            return int(float(s[:-1]) * mult)
    return int(s)


@functools.lru_cache(maxsize=1024)
def _parquet_layout(path: str) -> tuple[int, int, int]:
    """(bytes, row_groups, rows) for one parquet FILE, from the footer only.

    Cached: the driver data is immutable and ``load`` runs per query
    construction — re-reading the same footer hundreds of times per bench
    would be driver-side waste (guide §5).  Planning metadata, not results.
    """
    size = os.path.getsize(path)
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(path).metadata
        return size, meta.num_row_groups, meta.num_rows
    except Exception:
        return size, 1 << 30, 1 << 62  # unknown: assume splittable/large


def _spread_unsplittable_scan(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Repartition a scan whose parquet layout caps its parallelism below the
    session's core count (optimization guide §2.5 "input skew: one huge
    unsplittable file ... repartition immediately after the read").

    A parquet ROW GROUP is the unit of split assignment: a task reads a row
    group iff the group's start offset falls inside its byte-range split, so
    a file with fewer row groups than the session has cores runs its whole
    scan-side pipeline on that few tasks no matter what
    ``spark.sql.files.maxPartitionBytes`` says.  The driver test data is
    written as ONE row group per table — measured on d2 (5000 docs, 1.36M
    md5 calls): the entire signature pass ran on 1 of 32 cores.

    Scale-adaptive, not a local-mode constant: the decision compares the
    file's effective parallelism ``min(byte_splits, row_groups)`` against
    ``defaultParallelism`` (which follows ``local[$SPARK_GRAFT_CPUS]`` and,
    on a cluster, the executor count), so production-sized inputs — many
    files, many row groups — never take the extra exchange, and the shuffle
    this adds for small inputs moves at most ``cores × maxPartitionBytes``
    bytes.  ``spark.dataclod.spreadSmallScans=false`` disables it.
    """
    try:
        cores = spark.sparkContext.defaultParallelism
        if cores <= 1 or not os.path.isfile(path):
            return df
        size, row_groups, rows = _parquet_layout(path)
        max_bytes = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
        byte_splits = max(1, -(-size // max_bytes))
        effective = min(byte_splits, row_groups)
        if effective >= cores:
            return df
        # fewer rows than ~4/core: the exchange costs more than it feeds
        if rows < 4 * cores:
            return df
    except Exception:
        return df
    return df.repartition(max(cores, byte_splits))


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
