"""explode_nonnull / posexplode_nonnull: semantics + the inferred-filter pin.

Catalyst's InferFiltersFromGenerate rewrites ``explode(e)`` into
``Filter(size(e) > 0 AND isnotnull(e)) → Generate`` and pushes that filter
below the projection chain with ``e`` inlined — an expensive array
expression (tokenize→gram chains) is then evaluated up to 3× per source
row.  The helpers use OUTER generates (the rule skips them) plus an
explicit filter on the generator output.
"""

import pytest
from pyspark.sql import functions as F

from dataclod_spark.functions.text import explode_nonnull, posexplode_nonnull


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, ["a", "b"]),
            (2, []),            # empty array: no rows from explode
            (3, None),          # null array: no rows from explode
            (4, ["c"]),
        ],
        "id bigint, arr array<string>",
    )


def test_explode_nonnull_matches_explode(spark, df):
    want = df.select("id", F.explode("arr").alias("v")).collect()
    got = explode_nonnull(df, ["id"], F.col("arr"), "v").collect()
    assert sorted(got) == sorted(want)


def test_posexplode_nonnull_matches_posexplode_with_null_elements(spark):
    # a null ELEMENT must survive, exactly as posexplode keeps it
    df = spark.createDataFrame(
        [(1, ["a", None, "b"]), (2, []), (3, None)],
        "id bigint, arr array<string>",
    )
    want = df.select("id", F.posexplode("arr").alias("p", "v")).collect()
    got = posexplode_nonnull(df, ["id"], F.col("arr"), "p", "v").collect()
    assert sorted(got, key=str) == sorted(want, key=str)


def test_no_inferred_filter_duplication(spark, tmp_path):
    """The expensive array expression must appear exactly ONCE in the
    physical plan — plain explode of a STAGED column (the repo's staging
    idiom) triggers InferFiltersFromGenerate, whose pre-filter is pushed
    below the projection with the chain inlined 2 more times."""
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1, "a b"), (2, "")], "id bigint, t string").write.parquet(p)
    src = spark.read.parquet(p)
    expensive = F.array_distinct(F.split(F.col("t"), " "))

    staged = src.withColumn("arr", expensive)
    plain = staged.select("id", F.explode("arr").alias("v"))
    fixed = explode_nonnull(staged, ["id"], F.col("arr"), "v")
    plan_plain = plain._jdf.queryExecution().executedPlan().toString()
    plan_fixed = fixed._jdf.queryExecution().executedPlan().toString()
    assert plan_plain.count("array_distinct") >= 3  # the trap this pins
    assert plan_fixed.count("array_distinct") == 1
