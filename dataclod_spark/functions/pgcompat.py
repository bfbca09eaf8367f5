"""pg-compat scalar functions — SURVEY.md §2.A.4.

Reimplements the reference's sqlbuiltin/pg_catalog UDFs
(``src/datafusion-extra/sqlbuiltin/src/udf/mod.rs:9-15``,
``catalog/src/postgres/mod.rs:41-42``) as Spark SQL functions.  All are
either pure SQL expressions registered via ``spark.udf.register`` on tiny
lookup logic, or constants — none sit in a hot path, so plain Python UDFs
are acceptable here (they run once per introspection query row).

Functions: ``array_upper`` (array_upper.rs:15-131), ``current_schema``
(current_schema.rs:37-41), ``current_schemas`` (current_schemas.rs),
``version`` (version.rs:9: 'PostgreSQL 14.10 on dataclod'), ``format_type``
(format_type.rs:44-136), ``pg_get_expr`` / ``pg_get_partkeydef`` stubs
(pg_get_expr_udf.rs:151-165).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import types as T

DATACLOD_VERSION = "PostgreSQL 14.10 on dataclod"

# oid → (base name, kind) where kind selects the typemod formatting rule,
# mirroring format_type.rs:44-136.
_FORMAT_TYPE: dict[int, str] = {
    16: "boolean",
    17: "bytea{m}",
    18: "character{m}",
    20: "bigint",
    21: "smallint",
    23: "integer",
    700: "real",
    701: "double precision",
    1000: "boolean[]",
    1001: "bytea{m}[]",
    1002: "character{m}[]",
    1005: "smallint[]",
    1007: "integer[]",
    1015: "character varying{m}[]",
    1016: "bigint[]",
    1021: "real[]",
    1022: "double precision[]",
    1043: "character varying{m}",
    1082: "date{m}",
    1083: "time{m} without time zone",
    1114: "timestamp{m} without time zone",
    1115: "timestamp{m} without time zone[]",
    1182: "date{m}[]",
    1183: "time{m} without time zone[]",
    1184: "timestamp{m} with time zone",
    1185: "timestamp{m} with time zone[]",
    1186: "interval",
    1187: "interval[]",
}
# varchar/char family subtracts 4 from typemod (VARHDRSZ), format_type.rs:49-58
_VARLEN_OIDS = {1043, 1015, 18, 1002}
_INTERVAL_OIDS = {1186, 1187}


def format_type(oid: Optional[int], typemod: Optional[int]) -> Optional[str]:
    if oid is None:
        return None
    template = _FORMAT_TYPE.get(int(oid))
    if template is None:
        return "???"
    if int(oid) in _INTERVAL_OIDS:
        # interval with an explicit typemod renders '-' (format_type.rs:113-124)
        if typemod is not None and typemod >= 0:
            return "-"
        return template
    if int(oid) in _VARLEN_OIDS:
        m = f"({typemod - 4})" if typemod is not None and typemod >= 5 else ""
    else:
        m = f"({typemod})" if typemod is not None and typemod >= 0 else ""
    return template.replace("{m}", m)


def array_upper(arr, dim: Optional[int]):
    """Upper bound of the given array dimension (array_upper.rs:15-131).

    dim 1 → length; dim < 1 → NULL; dim > 1 → NULL (the reference errors on
    multidim — Spark UDFs can't raise per-row plan errors, so NULL).
    """
    if arr is None or dim is None:
        return None
    if dim == 1:
        # PG: array_upper('{}'::int[], 1) IS NULL — an empty array has no
        # dimensions, and `array_upper(a,1) IS NULL` is the idiomatic
        # emptiness guard (returning 0 broke it)
        return len(arr) if len(arr) else None
    return None


def register_pgcompat_functions(spark: SparkSession) -> None:
    if getattr(spark, "_dataclod_pgcompat_registered", False):
        return
    spark.udf.register("array_upper", array_upper, T.IntegerType())
    spark.udf.register("format_type", format_type, T.StringType())
    spark.udf.register("dataclod_version", lambda: DATACLOD_VERSION, T.StringType())
    spark.udf.register(
        "current_schemas",
        lambda implicit: (["pg_catalog", "public"] if implicit else ["public"])
        if implicit is not None
        else None,
        T.ArrayType(T.StringType()),
    )
    # pg clients qualify function calls (`pg_catalog.pg_get_expr(...)`),
    # and the catalog rewrite maps pg_catalog.pg_X → pg_catalog_pg_X —
    # register the pg_-prefixed functions under BOTH spellings so the
    # qualified form resolves after the rewrite
    for fname, fn in (
        ("pg_get_expr", lambda *args: ""),
        ("pg_get_partkeydef", lambda oid: ""),
    ):
        spark.udf.register(fname, fn, T.StringType())
        spark.udf.register(f"pg_catalog_{fname}", fn, T.StringType())
    # current_schema() exists natively in Spark 3.4+ (returns 'default');
    # the reference returns the constant 'public' (current_schema.rs:37-41) —
    # expose the pg-compat spelling under a distinct name to avoid clobbering
    # the builtin.  Bare version()/current_schema() calls are mapped to
    # these by plans.rewrites.rewrite_pgcompat_calls (the builtin wins the
    # resolution race otherwise, returning Spark's version string that
    # breaks client probes like SQLAlchemy's 'PostgreSQL X.Y' regex).
    spark.udf.register("pg_current_schema", lambda: "public", T.StringType())
    # flag AFTER success so a failed registration retries next session
    spark._dataclod_pgcompat_registered = True
