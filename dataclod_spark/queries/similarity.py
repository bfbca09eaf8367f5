"""Similarity-search queries over ``embeddings`` (driver north-star).

v1 is the exact brute-force baseline (broadcast queries × corpus scan);
v2 is the scale path (random-hyperplane LSH buckets).  Both carry full
DuckDB oracles — the hyperplanes are deterministic md5-derived literals
shared between the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataclod_spark.operators import similarity as SIM
from dataclod_spark.registry import load, query

_DOT_QC = (
    "list_sum(list_transform(range(1, len(q.q_vec) + 1), "
    "i -> CAST(q.q_vec[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
)
_NORM_Q = (
    "sqrt(list_sum(list_transform(range(1, len(q.q_vec) + 1), "
    "i -> CAST(q.q_vec[i] AS DOUBLE) * CAST(q.q_vec[i] AS DOUBLE))))"
)
_NORM_C = (
    "sqrt(list_sum(list_transform(range(1, len(c.embedding) + 1), "
    "i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))"
)


@query(
    "v1_knn_bruteforce",
    bench=True,
    doc="exact cosine top-5 neighbors for 10 query vectors (broadcast × scan)",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
sims AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_DOT_QC} / ({_NORM_Q} * {_NORM_C}), 6) AS cosine_sim
  FROM q CROSS JOIN embeddings c
  WHERE c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine_sim, rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM sims) ranked
WHERE rank <= 5
ORDER BY query_id, rank
""",
)
def v1_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    out = SIM.knn_bruteforce(e, e.filter(F.col("vec_id") < 10), k=5)
    return out.orderBy("query_id", "rank")


def _bucket_sql(alias: str) -> str:
    """DuckDB spelling of the 8-plane sign bucket for table alias `alias`."""
    planes = SIM.hyperplane_weights()
    bits = []
    for w in planes:
        lits = ", ".join(str(v) for v in w)
        dot = (
            f"list_sum(list_transform(range(1, len({alias}.embedding) + 1), "
            f"i -> CAST({alias}.embedding[i] AS DOUBLE) * ([{lits}]::DOUBLE[])[i]))"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits)


@query(
    "v2_knn_lsh",
    doc="ANN top-3 via random-hyperplane LSH buckets (deterministic planes)",
    oracle=f"""
WITH sigs AS (
  SELECT e.vec_id, e.embedding, {_bucket_sql('e')} AS bucket
  FROM embeddings e
),
q AS (SELECT vec_id AS query_id, embedding AS q_vec, bucket FROM sigs WHERE vec_id < 10),
sims AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, c.bucket AS bucket,
         round({_DOT_QC.replace('c.embedding', 'c.embedding')} / ({_NORM_Q} * {_NORM_C}), 6) AS cosine_sim
  FROM q JOIN sigs c ON q.bucket = c.bucket AND c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, bucket, cosine_sim, rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM sims) ranked
WHERE rank <= 3
ORDER BY query_id, rank
""",
)
def v2_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    out = SIM.knn_lsh(e, e.filter(F.col("vec_id") < 10), k=3)
    return out.orderBy("query_id", "rank")
