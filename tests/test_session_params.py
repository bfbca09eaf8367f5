"""EngineSession SQL shims: positional $n parameters (parser.rs:31-44)."""

from __future__ import annotations

import pytest

from dataclod_spark.plans.rewrites import rewrite_dollar_params


def test_rewrite_basic():
    sql, used = rewrite_dollar_params("SELECT * FROM t WHERE a > $1 AND b = $2")
    assert sql == "SELECT * FROM t WHERE a > :__p1 AND b = :__p2"
    assert used == [1, 2]


def test_rewrite_repeated_and_out_of_order():
    sql, used = rewrite_dollar_params("SELECT $2, $1, $2")
    assert sql == "SELECT :__p2, :__p1, :__p2"
    assert used == [1, 2]


def test_quoted_regions_untouched():
    sql, used = rewrite_dollar_params(
        "SELECT '$1', 'it''s $2', \"$3\" FROM t WHERE x = $4"
    )
    assert sql == "SELECT '$1', 'it''s $2', \"$3\" FROM t WHERE x = :__p4"
    assert used == [4]


def test_positional_execution(engine):
    engine.spark.range(10).createOrReplaceTempView("params_t")
    rows = engine.sql(
        "SELECT count(*) AS n FROM params_t WHERE id >= $1 AND id < $2", [3, 8]
    ).collect()
    assert rows[0].n == 5


def test_positional_repeated_execution(engine):
    engine.spark.range(10).createOrReplaceTempView("params_t")
    rows = engine.sql(
        "SELECT count(*) AS n FROM params_t WHERE id BETWEEN $1 AND $1 + 2", [4]
    ).collect()
    assert rows[0].n == 3


def test_missing_positional_raises(engine):
    with pytest.raises(ValueError, match=r"\$2"):
        engine.sql("SELECT $1 + $2 AS s", [1])


def test_named_args_still_work(engine):
    engine.spark.range(10).createOrReplaceTempView("params_t")
    rows = engine.sql(
        "SELECT count(*) AS n FROM params_t WHERE id > :lo", {"lo": 6}
    ).collect()
    assert rows[0].n == 3


def test_ddl_roundtrip_through_session(engine, tmp_path):
    """CREATE TABLE USING parquet + INSERT + SELECT through EngineSession
    (the reference inherits CREATE EXTERNAL TABLE/CTAS/INSERT from
    DataFusion; Spark SQL provides the same statements natively)."""
    loc = tmp_path / "ddl_tbl"
    engine.sql(f"CREATE TABLE ddl_t (id BIGINT, name STRING) USING parquet LOCATION '{loc}'")
    try:
        engine.sql("INSERT INTO ddl_t VALUES (1, 'a'), (2, 'b')")
        engine.sql("INSERT INTO ddl_t SELECT 3, 'c'")
        rows = engine.sql("SELECT id, name FROM ddl_t ORDER BY id").collect()
        assert [tuple(r) for r in rows] == [(1, "a"), (2, "b"), (3, "c")]
        # CTAS
        engine.sql("CREATE TABLE ddl_t2 USING parquet AS SELECT id * 10 AS id10 FROM ddl_t")
        assert {r.id10 for r in engine.sql("SELECT id10 FROM ddl_t2").collect()} == {10, 20, 30}
    finally:
        engine.sql("DROP TABLE IF EXISTS ddl_t")
        engine.sql("DROP TABLE IF EXISTS ddl_t2")


def test_sql_fragment_param_spliced_outside_literals(engine):
    """SqlFragmentParam values (typed empty arrays from the wire) splice
    into the query text at parameter sites only — a string literal that
    happens to contain the marker text is untouched, matching Spark's
    parser-level named-parameter binding."""
    from dataclod_spark.plans.rewrites import SqlFragmentParam

    rows = engine.sql(
        "SELECT ':__p1' AS s, $1 AS a, typeof($1) AS t",
        args=[SqlFragmentParam("CAST(array() AS array<int>)")],
    ).collect()
    assert rows[0].s == ":__p1"
    assert rows[0].a == []
    assert rows[0].t == "array<int>"


def test_splice_named_params_scanner():
    from dataclod_spark.plans.rewrites import splice_named_params

    frags = {"__p1": "CAST(array() AS array<int>)"}
    assert (
        splice_named_params("SELECT :__p1, ':__p1', \":__p1\", :__p12", frags)
        == "SELECT (CAST(array() AS array<int>)), ':__p1', \":__p1\", :__p12"
    )
    # backslashes in fragments pass through verbatim (no regex templates)
    assert splice_named_params("SELECT :f", {"f": r"'a\g<0>b'"}) == r"SELECT ('a\g<0>b')"
