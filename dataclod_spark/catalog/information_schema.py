"""information_schema emulation over ``spark.catalog``.

The reference enables DataFusion's information_schema
(``core/src/context.rs:33`` — ``with_information_schema(true)``), serving
``information_schema.tables`` / ``columns`` / ``schemata`` to BI-tool
introspection over pgwire.  Spark has catalog APIs but no SQL-visible
information_schema, so this module materializes the standard views from
``spark.catalog`` and ``EngineSession.sql`` rewrites schema-qualified
references to them.

The views are rebuilt on use (see ``EngineSession.sql``): unlike the
reference's lazily-computed provider, Spark temp views are snapshots, so a
just-registered table must trigger a refresh to appear — refresh-on-use
gives the same observable behavior.  The row volume is catalog metadata
(tiny); rebuild cost is driver-side listing only.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_TABLES_SCHEMA = (
    "table_catalog string, table_schema string, table_name string, table_type string"
)
_COLUMNS_SCHEMA = (
    "table_catalog string, table_schema string, table_name string, "
    "column_name string, ordinal_position bigint, column_default string, "
    "is_nullable string, data_type string"
)
_SCHEMATA_SCHEMA = (
    "catalog_name string, schema_name string, schema_owner string"
)


def register_information_schema(spark: SparkSession) -> None:
    """(Re)build information_schema_{tables,columns,schemata} temp views
    from the live catalog state (DataFusion column layout)."""
    from dataclod_spark.catalog.pg_catalog import PG_CATALOG_TABLE_NAMES

    cat = "datafusion"  # the reference's default catalog name
    tables = []
    columns = []
    for t in spark.catalog.listTables():
        ttype = "VIEW" if t.tableType in ("TEMPORARY", "VIEW") else "BASE TABLE"
        name = t.name
        if name.startswith("information_schema_") or name.startswith("__"):
            continue
        if name.startswith("pg_catalog_"):
            # our implementation spelling of a pg_catalog view (Spark temp
            # views can't be schema-qualified): surface it the way the
            # reference does — under table_schema='pg_catalog' with the
            # real name.  The bare pg_* alias below stays under 'public'
            # (the reference registers both, catalog mod.rs:22-48).
            bare = name[len("pg_catalog_"):]
            if bare in PG_CATALOG_TABLE_NAMES:
                schema, listed = "pg_catalog", bare
            else:
                schema, listed = t.database or "public", name
        else:
            schema = t.database or "public"
            if schema == "default":
                # Spark's default database: PG clients expect 'public'
                schema = "public"
            listed = name
        tables.append((cat, schema, listed, ttype))
        try:
            for i, c in enumerate(spark.catalog.listColumns(name), start=1):
                columns.append(
                    (
                        cat,
                        schema,
                        listed,
                        c.name,
                        i,
                        None,
                        "YES" if c.nullable else "NO",
                        c.dataType,
                    )
                )
        except Exception:
            continue  # view with unresolvable deps — still listed in tables
    # every schema a table row references must exist in schemata, or a
    # tables-to-schemata join drops rows in BI tools
    schemata_names = {"public", "information_schema", "pg_catalog"} | {
        s for _, s, _, _ in tables
    }
    schemata = [(cat, s, None) for s in sorted(schemata_names)]
    spark.createDataFrame(tables, _TABLES_SCHEMA).createOrReplaceTempView(
        "information_schema_tables"
    )
    spark.createDataFrame(columns, _COLUMNS_SCHEMA).createOrReplaceTempView(
        "information_schema_columns"
    )
    spark.createDataFrame(schemata, _SCHEMATA_SCHEMA).createOrReplaceTempView(
        "information_schema_schemata"
    )
