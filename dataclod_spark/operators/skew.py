"""Skew-mitigation join strategies (100 TB design surface).

The reference relies on DataFusion's repartitioning; on Spark the first
line of defense is AQE (``skewJoin.enabled``, on in ``get_spark``), which
splits oversized sort-merge partitions at runtime.  These operators cover
the cases AQE cannot:

* :func:`salted_join` — pre-shuffle salting for a shuffle join whose build
  side can be replicated: the skewed (probe) side gets a deterministic
  salt in ``[0, n)``, the build side is exploded ×n, and the join key
  becomes ``(key, salt)`` so one hot key spreads over n reducers.
  Deterministic salt (xxhash64 of the whole row, not ``rand()``) keeps
  task retries and speculative execution consistent.
* :func:`skew_split_join` — hot/cold split: hot keys (frequency above a
  threshold, found with one cheap aggregation) join via broadcast (no
  shuffle touches the hot rows), cold keys take the normal shuffle join;
  results union.  This is the classic mitigation when the dim side is too
  big to broadcast wholesale but the hot slice of it is tiny.

Both return exactly the same rows as the plain equi-join (asserted in
tests/test_skew.py); only the physical distribution differs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``n_salts``
    reducers.

    ``other`` is exploded ×``n_salts`` (choose n so that
    ``|other| * n_salts`` stays shuffle-friendly); ``skewed`` rows get
    ``salt = pmod(xxhash64(<all columns>), n)`` — deterministic per row, so
    retries reproduce the same placement.  Supported ``how``: inner /
    left (semantics preserved because every skewed row keeps exactly one
    salt and every ``other`` row exists for all salts).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    l = skewed.withColumn("__salt", salt)
    r = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumnRenamed(on, "__rk")
    out = l.join(
        r,
        (F.col(on) == F.col("__rk")) & (l["__salt"] == r["__salt"]),
        how,
    )
    return out.drop("__salt", "__rk")


def skew_split_join(
    big: DataFrame,
    dim: DataFrame,
    on: str,
    hot_threshold: int = 100_000,
    hot_keys: Optional[Sequence] = None,
    how: str = "inner",
) -> DataFrame:
    """Hot/cold split join: keys whose frequency in ``big`` exceeds
    ``hot_threshold`` join via broadcast of the matching ``dim`` slice; the
    rest take the normal shuffle join.

    One extra aggregation over ``big``'s key column finds the hot set
    (tiny result: #hot keys ≤ |big| / threshold ≤ a few thousand by
    construction, so collecting it is bounded).  Pass ``hot_keys``
    explicitly to skip the discovery scan when the skew is known.
    """
    if how not in ("inner", "left"):
        raise ValueError("skew_split_join supports inner/left joins")
    if hot_keys is None:
        hot_keys = [
            r[0]
            for r in (
                big.groupBy(on)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > hot_threshold)
                .select(on)
                .collect()
            )
        ]
    if not hot_keys:
        return big.join(dim, on, how)
    hot_big = big.filter(F.col(on).isin(list(hot_keys)))
    cold_big = big.filter(
        ~F.col(on).isin(list(hot_keys)) | F.col(on).isNull()
    )
    hot_dim = dim.filter(F.col(on).isin(list(hot_keys)))
    hot = hot_big.join(F.broadcast(hot_dim), on, how)
    cold = cold_big.join(dim, on, how)
    return hot.unionByName(cold)
