"""Similarity search over embedding columns — brute-force and LSH-bucketed.

Large-scale training-data pipeline operators (driver north-star).  The
embedding column is ``array<float>``; all math is JVM-side array expressions
(``zip_with`` + ``aggregate``) in double precision — no Python UDF, no
collect.

Scale design:
* ``knn_bruteforce`` — broadcast the (small) query set, linear scan of the
  corpus, per-query top-k via window.  This is the exact baseline: one pass
  over the corpus, no corpus shuffle, O(|Q|·|C|) flops in codegen.
* ``knn_lsh`` — random-hyperplane (sign) LSH: 8 deterministic hyperplanes
  bucket the corpus; candidates are same-bucket rows only.  At 100 TB the
  bucket join replaces the full scan; recall is tunable by planes/tables.
* label-blocked cosine pairs (see queries.dedup d5) is the IVF-style coarse
  quantizer: block by a cluster id, compare within blocks.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

N_PLANES = 8
N_DIMS = 64


def hyperplane_weights(n_planes: int = N_PLANES, n_dims: int = N_DIMS) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix derived from md5 — reproducible in
    any engine (the DuckDB oracle embeds the same literals)."""
    return [
        [
            1.0 if hashlib.md5(f"{p}-{d}".encode()).hexdigest()[0] >= "8" else -1.0
            for d in range(n_dims)
        ]
        for p in range(n_planes)
    ]


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two array columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: concatenated sign bits."""
    bits = []
    for w in planes:
        wcol = F.array(*[F.lit(v) for v in w])
        bits.append(F.when(dot(emb, wcol) > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query (broadcast × scan).

    Returns (query_id, neighbor_id, cosine_sim, rank); self-pairs excluded.
    Ranking is on round(sim, 6) with neighbor-id tiebreak so results are
    deterministic under any parallelism.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
    w = W.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    planes = planes or hyperplane_weights()
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sign_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        sign_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
    w = W.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "bucket", "cosine_sim", "rank")
    )
