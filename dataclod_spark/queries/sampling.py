"""Deterministic-sampling gate queries (wraps operators.sampling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataclod_spark.operators import sampling as SMP
from dataclod_spark.queries.text import _NTOK  # shared DuckDB token-count macro
from dataclod_spark.queries.text import _TOKS as _TOKS_SP7  # shared tokenizer macro
from dataclod_spark.registry import load, query

# Split-multiply bigint mirror of operators.sampling.row_hash (r11):
# k = key mod 2^32 (positive), then (k*K) mod 2^32 computed over 16-bit
# halves so no intermediate exceeds 2^49 — overflow-free plain BIGINT on
# both engines, bit-identical to the r10 DECIMAL(38,0) form on the full
# bigint domain (property-tested)
_HK = "(((doc_id % 4294967296) + 4294967296) % 4294967296)"
_H = (f"(((({_HK} // 65536) * 2654435761) % 65536) * 65536\n"
      f"      + ({_HK} % 65536) * 2654435761) % 4294967296")


@query(
    "sp1_stratified_sample",
    doc="exact per-language quota sample (ceil(20%·n) per stratum) via "
    "deterministic-hash ranking — the rank window sees only a verified "
    "boundary band (never a whole stratum: window partitions are "
    "one-task sorts Spark/AQE cannot split); reproducible across engines "
    "and repartitionings",
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
    d = load(spark, sf_dir, "documents", spread=False)
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
    d = load(spark, sf_dir, "documents", spread=False)
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
    "training-mix equalizer (operators/sampling.rebalance_to_min); min "
    "size as a 1-row broadcast, rank window over the boundary band only",
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
    d = load(spark, sf_dir, "documents", spread=False)
    r = SMP.rebalance_to_min(d, key="doc_id", stratum="lang")
    return (
        r.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").cast("bigint").alias("id_sum"))
        .orderBy("lang")
    )


@query(
    "sp4_token_budget_mixture",
    doc="token-budget mixture sampling: each language filled to its "
    "token target (en 5000 / de 2000 / es 2000 / fr 1000, zh excluded) "
    "by deterministic-hash greedy fill — the LM data-mixture op proper "
    "(mixes are specified in tokens, not document counts)",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         greatest(coalesce(CAST({_NTOK} AS BIGINT), 0), 0) AS tok,
         {_H} AS h
  FROM documents
), ranked AS (
  SELECT lang, doc_id, tok,
         sum(tok) OVER (PARTITION BY lang ORDER BY h, doc_id
                        ROWS UNBOUNDED PRECEDING) - tok AS strt
  FROM toks
), kept AS (
  SELECT * FROM ranked
  WHERE strt < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000
                         WHEN 'es' THEN 2000 WHEN 'fr' THEN 1000 ELSE 0 END
)
SELECT lang, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM kept GROUP BY lang ORDER BY lang
""",
)
def sp4_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.sampling.token_budget_sample: greedy fill so the
    boundary doc is included and no stratum is starved; the cumsum
    window runs over the verified budget-boundary band only (the keep
    set is a prefix of the hash order, so the bulk is a pure filter);
    the mixture spec is a closed list (zh is deliberately absent —
    unspecified strata contribute nothing)."""
    from dataclod_spark.functions import text as TX

    d = load(spark, sf_dir, "documents", spread=False)
    s = SMP.token_budget_sample(
        d, key="doc_id", stratum="lang",
        token_col=TX.token_count(F.col("text")),
        budgets={"en": 5000, "de": 2000, "es": 2000, "fr": 1000},
    )
    # same null/negative clamp as the operator (token_count is -1 for
    # NULL text) — the oracle's toks CTE mirrors it
    tok = F.greatest(
        F.coalesce(TX.token_count(F.col("text")).cast("bigint"), F.lit(0)), F.lit(0)
    )
    return (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tok).alias("n_tokens"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("lang")
    )


@query(
    "sp5_temperature_mixture",
    doc="temperature-scaled (alpha=0.5) mixture sampling: per-source "
    "token budgets b_i = floor(B * sqrt(n_i) / sum_j sqrt(n_j)) derived "
    "from corpus token counts, then greedy token fill — the multilingual "
    "up-sampling scheme of mBERT/XLM-R (alpha-smoothing)",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, source,
         greatest(coalesce(CAST({_NTOK} AS BIGINT), 0), 0) AS tok,
         {_H} AS h
  FROM documents
), tot AS (
  SELECT source, sum(tok) AS n FROM tk GROUP BY source
), aw AS (
  SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS w FROM tot
), den AS (
  SELECT list_sum(list(w ORDER BY source)) AS d FROM aw
), bud AS (
  SELECT source, n, CAST(floor(50000 * w / d) AS BIGINT) AS budget
  FROM aw, den
), ranked AS (
  SELECT t.source, t.doc_id, t.tok, b.n, b.budget,
         sum(t.tok) OVER (PARTITION BY t.source ORDER BY t.h, t.doc_id
                          ROWS UNBOUNDED PRECEDING) - t.tok AS strt
  FROM tk t JOIN bud b USING (source)
), kept AS (
  SELECT * FROM ranked WHERE strt < budget
)
SELECT source,
       CAST(max(n) AS BIGINT) AS corpus_tokens,
       CAST(max(budget) AS BIGINT) AS budget,
       count(*) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS n_tokens,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM kept GROUP BY source ORDER BY source
""",
)
def sp5_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.sampling.temperature_mixture: the budget derivation is
    one |strata|-row aggregate + driver-side IEEE math in a DEFINED order
    (sorted strata, left fold — the oracle mirrors it with
    list_sum(list(w ORDER BY source))); the fill itself is sp4's
    band-bracketed cumsum plan.  alpha=0.5 up-samples small sources —
    the report shows each source's corpus tokens vs its granted budget."""
    from dataclod_spark.functions import text as TX

    d = load(spark, sf_dir, "documents", spread=False)
    tokc = TX.token_count(F.col("text"))
    budgets = SMP.temperature_budgets(
        d, stratum="source", token_col=tokc, total_budget=50_000, alpha=0.5
    )
    s = SMP.temperature_mixture(
        d, key="doc_id", stratum="source", token_col=tokc,
        total_budget=50_000, alpha=0.5,
    )
    tok = F.greatest(F.coalesce(tokc.cast("bigint"), F.lit(0)), F.lit(0))
    # per-source corpus totals (same clamp as the operator)
    corpus = d.groupBy("source").agg(F.sum(tok).alias("corpus_tokens"))
    # null-safe like the operator's _budget_expr: temperature_budgets may
    # return a None key on a corpus with NULL sources (not these tables,
    # but the report must not crash or zero that stratum's display)
    bud = F.lit(0).cast("bigint")
    for src, b in sorted(budgets.items(), key=lambda kv: (kv[0] is not None, kv[0])):
        bud = F.when(
            F.col("source").eqNullSafe(F.lit(src)), F.lit(int(b)).cast("bigint")
        ).otherwise(bud)
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tok).alias("n_tokens"),
            F.sum("doc_id").alias("id_sum"),
        )
        .join(F.broadcast(corpus), "source")
        .select(
            "source",
            "corpus_tokens",
            bud.alias("budget"),
            "n_docs",
            "n_tokens",
            "id_sum",
        )
        .orderBy("source")
    )


@query(
    "sp6_hash_split",
    doc="deterministic train/val/test split manifest (80/10/10 by Knuth "
    "hash bands): disjoint by construction, reproducible across engines "
    "and repartitionings, and stable under corpus growth — a document's "
    "split never changes when others are added (the property that keeps "
    "val/test uncontaminated across crawl refreshes)",
    oracle=f"""
WITH b AS (
  SELECT doc_id, lang, ({_H}) % 100 AS h FROM documents
), lab AS (
  SELECT doc_id, lang,
         CASE WHEN h < 80 THEN 'train'
              WHEN h < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM b
)
SELECT split, lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM lab
GROUP BY split, lang
ORDER BY split, lang
""",
)
def sp6_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.sampling.hash_split: a zero-shuffle projection; the
    report is one small groupBy.  Band order is the dict's declaration
    order, mirrored by the oracle's CASE chain."""
    d = load(spark, sf_dir, "documents", spread=False)
    s = SMP.hash_split(d, key="doc_id", splits={"train": 80, "val": 10, "test": 10})
    return (
        s.groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("id_sum"))
        .orderBy("split", "lang")
    )


@query(
    "sp7_dsir_weights",
    doc="DSIR importance weights (Xie et al. 2023): per-document "
    "log-likelihood ratio of a hashed-unigram profile under the target "
    "slice (lang='en') vs the raw corpus, add-one smoothed over 256 "
    "buckets — the data-selection scorer that reweights a crawl toward "
    "an in-domain reference before sampling; per-bucket weights are "
    "fixed as DECIMAL(18,6) so the per-doc sum is order- and "
    "libm-independent",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS is_t,
         CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 256 AS b
  FROM (SELECT doc_id, lang, unnest({_TOKS_SP7}) AS t FROM documents)
  WHERE t <> ''
), bt AS (
  SELECT b, count(*) AS n_r, count(*) FILTER (WHERE is_t) AS n_t
  FROM toks GROUP BY b
), tot AS (
  SELECT sum(n_r) AS tr, sum(n_t) AS tt FROM bt
), w AS (
  SELECT b, CAST(round(ln(CAST(n_t + 1 AS DOUBLE))
                 - ln(CAST(tt + 256 AS DOUBLE))
                 - ln(CAST(n_r + 1 AS DOUBLE))
                 + ln(CAST(tr + 256 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS wgt
  FROM bt CROSS JOIN tot
), db AS (
  SELECT doc_id, b, count(*) AS c FROM toks GROUP BY doc_id, b
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
       CAST(sum(c * wgt) AS DOUBLE) AS log_weight
FROM db JOIN w USING (b)
GROUP BY doc_id
ORDER BY doc_id
""",
)
def sp7_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.sampling.dsir_weights over documents with the English
    slice as the target domain.  Plan: one explode feeding two uniform
    hash-keyed aggregates (bucket profile, doc×bucket counts), the
    256-row weight table broadcast back, decimal-exact doc rollup."""
    d = load(spark, sf_dir, "documents", spread=False)
    return SMP.dsir_weights(d, target=F.col("lang") == "en").orderBy("doc_id")


@query(
    "sp8_dsir_select",
    doc="DSIR selection: top 25% of documents by importance weight "
    "WITHIN each language (stratified, so one in-domain-looking slice "
    "cannot crowd out the rest — the known failure mode of global "
    "top-N) — the select step between sp7's scorer and the sp4/sp5 "
    "mixture builders",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS is_t,
         CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 256 AS b
  FROM (SELECT doc_id, lang, unnest({_TOKS_SP7}) AS t FROM documents)
  WHERE t <> ''
), bt AS (
  SELECT b, count(*) AS n_r, count(*) FILTER (WHERE is_t) AS n_t
  FROM toks GROUP BY b
), tot AS (
  SELECT sum(n_r) AS tr, sum(n_t) AS tt FROM bt
), w AS (
  SELECT b, CAST(round(ln(CAST(n_t + 1 AS DOUBLE))
                 - ln(CAST(tt + 256 AS DOUBLE))
                 - ln(CAST(n_r + 1 AS DOUBLE))
                 + ln(CAST(tr + 256 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS wgt
  FROM bt CROSS JOIN tot
), db AS (
  SELECT doc_id, b, count(*) AS c FROM toks GROUP BY doc_id, b
), dw AS (
  SELECT doc_id, CAST(sum(c * wgt) AS DOUBLE) AS log_weight
  FROM db JOIN w USING (b) GROUP BY doc_id
), sel AS (
  SELECT d.doc_id, d.lang, dw.log_weight,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY dw.log_weight DESC, d.doc_id) AS rk,
         count(*) OVER (PARTITION BY d.lang) AS n
  FROM documents d JOIN dw USING (doc_id)
)
SELECT doc_id, lang, log_weight
FROM sel
WHERE rk <= ceil(n * 25 / 100)
ORDER BY doc_id
""",
)
def sp8_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.sampling.dsir_select over dsir_weights — the scorer's
    aggregates plus a percentile-banded exact rank (the window sees only
    the verified score-boundary band, never a whole language); per-doc
    output (no cross-doc double sums, which would be FP-order-dependent)."""
    d = load(spark, sf_dir, "documents", spread=False)
    wts = SMP.dsir_weights(d, target=F.col("lang") == "en")
    return (
        SMP.dsir_select(d, wts, stratum="lang", top_pct=25)
        .select("doc_id", "lang", "log_weight")
        .orderBy("doc_id")
    )


@query(
    "sp9_weighted_sample",
    doc="deterministic weighted sampling without replacement (Efraimidis-"
    "Spirakis): sample 200 documents proportional to byte mass via "
    "u^(1/w) scores from the Knuth hash — the 'sample docs by token "
    "share' op a uniform doc sample gets wrong; pure projection + "
    "global top-k (per-partition heaps), ZERO shuffles and no window",
    oracle=f"""
WITH w AS (
  SELECT doc_id, lang, n_chars,
         CAST(round(ln((({_H}) + 0.5) / 4294967296.0) / n_chars, 6)
              AS DECIMAL(18,6)) AS es_key
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(es_key AS DOUBLE) AS es_key
FROM w
ORDER BY es_key DESC, doc_id
LIMIT 200
""",
)
def sp9_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.sampling.weighted_sample with n_chars as the weight:
    u = (hash+0.5)/2^32 is exact binary64 on both engines; the score
    ranks as round(ln(u)/w, 6) DECIMAL(18,6) with doc_id tiebreak (the
    sp7 ln-ULP discipline) so the selected set is engine-identical.
    TakeOrderedAndProject plan — no shuffle, no window."""
    d = load(spark, sf_dir, "documents", spread=False)
    s = SMP.weighted_sample(d, key="doc_id", weight_col=F.col("n_chars"), k=200)
    return s.select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("es_key").cast("double").alias("es_key"),
    ).orderBy(F.col("es_key").desc(), "doc_id")


@query(
    "x27_source_drift",
    doc="per-source distribution drift: Jensen-Shannon divergence (nats, "
    "add-one smoothed, 64 md5 buckets) between each source's hashed-"
    "unigram profile and the rest of the corpus — the crawl-refresh "
    "monitor that flags a feed whose content distribution moved; one "
    "corpus scan into a (source x bucket)-bounded aggregate, JS terms "
    "fixed as DECIMAL(18,6) before summing (the sp7 ln-ULP discipline)",
    oracle=f"""
WITH toks AS (
  SELECT source AS g,
         CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 64 AS b
  FROM (SELECT source, unnest({_TOKS_SP7}) AS t FROM documents)
  WHERE t <> ''
), gb AS (
  SELECT g, b, count(*) AS c FROM toks GROUP BY g, b
), tb AS (SELECT b, sum(c) AS cb FROM gb GROUP BY b),
tg AS (SELECT g, sum(c) AS cg FROM gb GROUP BY g),
tt AS (SELECT sum(c) AS ct FROM gb),
grid AS (SELECT g, cg, b, cb, ct FROM tg CROSS JOIN tb CROSS JOIN tt),
filled AS (
  SELECT grid.g, grid.cg, grid.cb, grid.ct, coalesce(gb.c, 0) AS c
  FROM grid LEFT JOIN gb ON grid.g = gb.g AND grid.b = gb.b
), pq AS (
  SELECT g, cg,
         CAST(c + 1 AS DOUBLE) / CAST(cg + 64 AS DOUBLE) AS p,
         CAST(cb - c + 1 AS DOUBLE) / CAST(ct - cg + 64 AS DOUBLE) AS q
  FROM filled
), terms AS (
  SELECT g, cg,
         CAST(round((p * ln(p / ((p + q) / 2))
                     + q * ln(q / ((p + q) / 2))) / 2, 6)
              AS DECIMAL(18,6)) AS term
  FROM pq
)
SELECT g AS source, CAST(max(cg) AS BIGINT) AS n_tok,
       CAST(sum(term) AS DOUBLE) AS js_divergence
FROM terms GROUP BY g
ORDER BY source
""",
)
def x27_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.sampling.source_drift over documents grouped by source.
    Plan: one explode into a (source, bucket)-keyed count — uniform keys,
    partial-aggregable, output bounded at |sources|*64 rows no matter the
    corpus size — then tiny broadcast rollups onto the grid and a
    decimal-exact per-source sum.  No window, no driver state."""
    from dataclod_spark.operators.sampling import source_drift

    d = load(spark, sf_dir, "documents", spread=False)
    return source_drift(d).orderBy("source")


@query(
    "sp10_mixture_epochs",
    doc="data-constrained mixture planning (Muennighoff et al. 2023): "
    "per-language available tokens vs requested budget -> epochs = "
    "ceil(budget/available) as the INTEGER (b+a-1) div a (no FP "
    "boundary) and repeated_tokens = max(budget-available, 0) — how "
    "much the trainer would repeat each stratum; one bounded aggregate",
    oracle=f"""
WITH toks AS (
  SELECT lang, greatest(coalesce(CAST({_NTOK} AS BIGINT), 0), 0) AS tok
  FROM documents
), avail AS (
  SELECT lang, CAST(sum(tok) AS BIGINT) AS available_tokens
  FROM toks GROUP BY lang
), plan AS (
  SELECT lang, available_tokens,
         CAST(CASE lang WHEN 'en' THEN 8000 WHEN 'de' THEN 30000
                        WHEN 'es' THEN 9000 WHEN 'fr' THEN 120000
                        ELSE 0 END AS BIGINT) AS budget
  FROM avail
)
SELECT lang, available_tokens, budget,
       CAST(CASE WHEN budget <= 0 THEN 0
                 WHEN available_tokens > 0
                 THEN (budget + available_tokens - 1) // available_tokens
            END AS BIGINT) AS epochs,
       CAST(greatest(budget - available_tokens, 0) AS BIGINT) AS repeated_tokens
FROM plan
ORDER BY lang
""",
)
def sp10_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.sampling.mixture_epochs over per-language token counts
    with a mixture spec that exercises all regimes: under-subscribed
    (en fits in one pass), oversubscribed (de/es/fr repeat), and an
    excluded stratum (zh, budget 0 — the closed-list rule)."""
    from dataclod_spark.functions import text as TX

    d = load(spark, sf_dir, "documents")
    return SMP.mixture_epochs(
        d, "lang", TX.token_count(F.col("text")),
        {"en": 8000, "de": 30000, "es": 9000, "fr": 120000},
    ).orderBy("lang")
