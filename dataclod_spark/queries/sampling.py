"""Deterministic-sampling gate queries (wraps operators.sampling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataclod_spark.operators import sampling as SMP
from dataclod_spark.registry import load, query

_H = "(doc_id * 2654435761) % 4294967296"


@query(
    "sp1_stratified_sample",
    doc="exact per-language quota sample (ceil(20%·n) per stratum) via "
    "deterministic-hash ranking — one window shuffle, reproducible across "
    "engines and repartitionings",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY {_H}, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang, count(*) AS n_sampled, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM ranked
WHERE rn <= CAST(ceil(n * 20 / 100.0) AS BIGINT)
GROUP BY lang
ORDER BY lang
""",
)
def sp1_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    s = SMP.stratified_sample(d, key="doc_id", stratum="lang", rate_pct=20)
    return (
        s.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.sum("doc_id").alias("id_sum"))
        .orderBy("lang")
    )


@query(
    "sp2_hash_sample",
    doc="fixed-rate Bernoulli-style sample by deterministic key hash — a "
    "zero-shuffle filter projection, stable under repartitioning (the "
    "100 TB holdout-split shape)",
    oracle=f"""
SELECT count(*) AS n_sampled,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       count(DISTINCT lang) AS n_langs
FROM documents
WHERE ({_H}) % 100 < 15
""",
)
def sp2_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    s = SMP.hash_sample(d, key="doc_id", rate_pct=15)
    return s.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("id_sum"),
        F.countDistinct("lang").alias("n_langs"),
    )


@query(
    "sp3_language_rebalance",
    doc="corpus rebalancing: every language downsampled to the smallest "
    "language's size by deterministic-hash ranking — the multilingual "
    "training-mix equalizer (operators/sampling.rebalance_to_min); one "
    "window shuffle, min size as a 1-row broadcast",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY {_H}, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
), m AS (
  SELECT min(n) AS min_n FROM (SELECT lang, max(n) AS n FROM ranked GROUP BY lang)
)
SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM ranked, m
WHERE rn <= m.min_n
GROUP BY lang
ORDER BY lang
""",
)
def sp3_language_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    r = SMP.rebalance_to_min(d, key="doc_id", stratum="lang")
    return (
        r.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").cast("bigint").alias("id_sum"))
        .orderBy("lang")
    )
