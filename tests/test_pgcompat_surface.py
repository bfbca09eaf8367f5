"""pg-compat function reachability under the spellings pg clients use
(round 10 review findings): qualified ``pg_catalog.fn(...)`` calls,
bare ``version()``/``current_schema()``, array_upper's NULL-on-empty,
and the information_schema listing shape."""

from __future__ import annotations


def test_qualified_pgcompat_function_calls(engine):
    """psql/BI tools schema-qualify every call; the catalog rewrite must
    leave each one resolvable."""
    r = engine.sql(
        "SELECT pg_catalog.format_type(23, NULL) AS int_t, "
        "       pg_catalog.format_type(1043, 36) AS vc_t, "
        "       pg_catalog.pg_get_expr('x', 1) AS expr, "
        "       pg_catalog.pg_get_partkeydef(1) AS pk, "
        "       pg_catalog.array_upper(array(1, 2, 3), 1) AS up"
    ).collect()[0]
    assert r.int_t == "integer"
    assert r.vc_t == "character varying(32)"
    assert r.expr == "" and r.pk == ""
    assert r.up == 3


def test_version_and_current_schema_pg_parity(engine):
    """version() must return the reference's PostgreSQL string (clients
    regex-parse 'PostgreSQL X.Y'), and current_schema() 'public' — the
    Spark builtins win name resolution, so the rewrite maps the bare
    calls to the compat UDFs."""
    r = engine.sql(
        "SELECT version() AS v, current_schema() AS cs, "
        "       pg_catalog.version() AS qv"
    ).collect()[0]
    assert r.v.startswith("PostgreSQL ")
    assert r.qv == r.v
    assert r.cs == "public"
    # a dotted/suffixed spelling is NOT rewritten (only the bare call
    # collides with the builtin)
    from dataclod_spark.plans.rewrites import rewrite_pgcompat_calls

    assert rewrite_pgcompat_calls("SELECT x.version() FROM t x") == (
        "SELECT x.version() FROM t x"
    )
    assert rewrite_pgcompat_calls("SELECT my_version() FROM t") == (
        "SELECT my_version() FROM t"
    )
    assert "'version()'" in rewrite_pgcompat_calls("SELECT 'version()'")


def test_array_upper_empty_is_null(engine):
    """PG: array_upper('{}', 1) IS NULL — the emptiness-guard idiom."""
    r = engine.sql(
        "SELECT array_upper(array(), 1) AS e, "
        "       array_upper(array(1), 1) AS one, "
        "       array_upper(CAST(NULL AS array<int>), 1) AS n"
    ).collect()[0]
    assert r.e is None and r.one == 1 and r.n is None


def test_information_schema_hides_alias_spellings(engine):
    """The pg_catalog views appear under table_schema='pg_catalog' with
    their real names (and under 'public' as the reference's public
    aliases) — the pg_catalog_* implementation spellings must not leak."""
    rows = engine.sql(
        "SELECT table_schema, table_name FROM information_schema.tables"
    ).collect()
    listed = {(r.table_schema, r.table_name) for r in rows}
    assert ("pg_catalog", "pg_type") in listed
    assert ("public", "pg_type") in listed  # reference registers both
    assert not any(n.startswith("pg_catalog_") for _, n in listed)
    # every schema referenced by tables exists in schemata
    schemas = {
        r.schema_name
        for r in engine.sql(
            "SELECT schema_name FROM information_schema.schemata"
        ).collect()
    }
    assert {s for s, _ in listed} <= schemas
    assert {"public", "information_schema", "pg_catalog"} <= schemas
