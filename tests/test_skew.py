"""Skew-mitigation joins must return exactly the plain join's rows, with
the intended physical shape (broadcast for the hot slice, salted key for
the spread join)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dataclod_spark.operators.skew import salted_join, skew_split_join


@pytest.fixture(scope="module")
def skewed_data(spark):
    # 90% of fact rows hit key 7 (the hot key), the rest spread over 1..50
    fact = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    return fact, dim


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain(spark, skewed_data):
    fact, dim = skewed_data
    plain = fact.join(dim, "k")
    salted = salted_join(fact, dim, "k", n_salts=4)
    assert _sorted_rows(salted.select("k", "payload", "name")) == _sorted_rows(
        plain.select("k", "payload", "name")
    )


def test_salted_join_left(spark, skewed_data):
    fact, dim = skewed_data
    small_dim = dim.filter(F.col("k") < 10)
    plain = fact.join(small_dim, fact["k"] == small_dim["k"], "left").select(
        fact["k"], "payload", "name"
    )
    salted = salted_join(fact, small_dim, "k", n_salts=4, how="left").select(
        fact["k"], "payload", "name"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_spreads_hot_key(spark, skewed_data):
    fact, dim = skewed_data
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(4))
    used = (
        fact.filter(F.col("k") == 7)
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert used == 4  # the hot key occupies every salt bucket


def test_skew_split_join_matches_plain(spark, skewed_data):
    fact, dim = skewed_data
    plain = fact.join(dim, "k")
    split = skew_split_join(fact, dim, "k", hot_threshold=1000)
    assert _sorted_rows(split.select("k", "payload", "name")) == _sorted_rows(
        plain.select("k", "payload", "name")
    )


def test_skew_split_join_broadcasts_hot_slice(spark, skewed_data):
    fact, dim = skewed_data
    split = skew_split_join(fact, dim, "k", hot_threshold=1000)
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_skew_split_join_explicit_hot_keys(spark, skewed_data):
    fact, dim = skewed_data
    plain = fact.join(dim, "k")
    split = skew_split_join(fact, dim, "k", hot_keys=[7])
    assert _sorted_rows(split.select("k", "payload", "name")) == _sorted_rows(
        plain.select("k", "payload", "name")
    )


def test_skew_split_join_left_keeps_unmatched(spark, skewed_data):
    fact, dim = skewed_data
    small_dim = dim.filter(F.col("k") < 10)
    plain = fact.join(small_dim, "k", "left")
    split = skew_split_join(fact, small_dim, "k", hot_threshold=1000, how="left")
    assert _sorted_rows(split.select("k", "payload", "name")) == _sorted_rows(
        plain.select("k", "payload", "name")
    )
