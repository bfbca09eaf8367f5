"""Text-analysis queries over the ``documents`` table (driver north-star).

Every query here is a thin registry wrapper over the column builders in
``dataclod_spark.functions.text``; the oracle SQL spells the identical
expressions in DuckDB dialect (regexp_replace needs the 'g' flag there;
``size``→``len``, ``split``→``string_split_regex``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataclod_spark.functions import text as TX
from dataclod_spark.registry import load, query

# DuckDB spellings of the shared text expressions
_NORM = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
_TOKS = rf"string_split_regex({_NORM}, '\s+')"
_NTOK = rf"CASE WHEN len({_NORM}) = 0 THEN 0 ELSE len({_TOKS}) END"
_STOPS = ",".join(f"'{s}'" for s in TX.STOPWORDS)
_STOP_RATIO = (
    rf"CASE WHEN len({_TOKS}) = 0 THEN 0.0 ELSE "
    rf"CAST(len(list_filter({_TOKS}, t -> t IN ({_STOPS}))) AS DOUBLE) / len({_TOKS}) END"
)
_ALPHA_RATIO = (
    rf"CASE WHEN len({_NORM}) = 0 THEN 0.0 ELSE "
    rf"CAST(len(regexp_replace({_NORM}, '[^a-z ]', '', 'g')) AS DOUBLE) / len({_NORM}) END"
)
# integer-exact quality formula (see functions.text.quality_score): one final
# division over BIGINT counts → bit-identical doubles across engines.
_NT = rf"len({_TOKS})"
_ST = rf"len(list_filter({_TOKS}, t -> t IN ({_STOPS})))"
_AL = rf"len(regexp_replace({_NORM}, '[^a-z ]', '', 'g'))"
_NC = rf"len({_NORM})"
_QUALITY = (
    rf"CASE WHEN len({_NORM}) = 0 OR {_NT} = 0 THEN 0.0 ELSE "
    rf"CAST(4 * least({_NT}, 50) * {_NT} * {_NC} "
    rf"+ 3 * ({_NT} - {_ST}) * 50 * {_NC} "
    rf"+ 3 * {_AL} * 50 * {_NT} AS DOUBLE) / (500 * {_NT} * {_NC}) END"
)


def _marker_count(markers: tuple[str, ...]) -> str:
    inlist = ",".join(f"'{m}'" for m in markers)
    return rf"len(list_filter({_TOKS}, t -> t IN ({inlist})))"


# ONE spelling of the marker-word lang-ID for every oracle (x3/x7/x17/x22
# used to carry four hand-synced copies of the argmax CASE — the oracle-
# side twin of TX.langid's tie-break, which must never drift per site).
# Both the score columns and the WHEN order iterate TX.LANG_PRIORITY
# itself, so reordering/extending the language set cannot desync them.
_LANG_SCORE_COLS = ",\n         ".join(
    f"{_marker_count(TX.LANG_MARKERS[lang])} AS s_{lang}"
    for lang in TX.LANG_PRIORITY
)
_G4 = f"greatest({', '.join(f's_{lang}' for lang in TX.LANG_PRIORITY)})"
_LANG_CASE = (
    "CASE "
    + " ".join(f"WHEN s_{lang} = {_G4} AND {_G4} > 0 THEN '{lang}'" for lang in TX.LANG_PRIORITY)
    + " ELSE 'und' END"
)


@query(
    "x1_token_stats",
    bench=True,
    doc="token counting + fingerprinting per document (whitespace tokenizer)",
    oracle=rf"""
SELECT doc_id,
       {_NTOK} AS n_tokens,
       len({_NORM}) AS n_chars_norm,
       md5({_NORM}) AS fp
FROM documents
ORDER BY doc_id
""",
)
def x1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=False (r12): the plan is scan→project→sort — the spread
    # exchange added a node to a query with no narrow compute to feed
    # (r11 A/B logged the loss; cold one-shot 0.60-1.38 s spread vs
    # 0.56-0.65 s unspread, and the driver's headline is the cold path).
    d = load(spark, sf_dir, "documents", spread=False)
    return (
        d.select(
            "doc_id",
            TX.token_count(F.col("text")).alias("n_tokens"),
            F.length(TX.normalize_text(F.col("text"))).alias("n_chars_norm"),
            TX.fingerprint(F.col("text")).alias("fp"),
        )
        .orderBy("doc_id")
    )


@query(
    "x2_quality_score",
    doc="document quality scoring: length/stopword/alphabetic components",
    oracle=rf"""
SELECT doc_id,
       {_STOP_RATIO}  AS stop_ratio,
       {_ALPHA_RATIO} AS alpha_ratio,
       {_QUALITY}     AS quality
FROM documents
ORDER BY doc_id
""",
)
def x2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ratios/score are single integer divisions → bit-identical doubles on
    # both engines; no rounding needed (rounding would ADD boundary risk).
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            TX.stopword_ratio(F.col("text")).alias("stop_ratio"),
            TX.alpha_ratio(F.col("text")).alias("alpha_ratio"),
            TX.quality_score(F.col("text")).alias("quality"),
        )
        .orderBy("doc_id")
    )


@query(
    "x3_langid",
    doc="marker-word language ID, distribution over the corpus",
    oracle=rf"""
WITH scored AS (
  SELECT doc_id,
         {_LANG_SCORE_COLS}
  FROM documents
), detected AS (
  SELECT doc_id, {_LANG_CASE} AS lang_detected
  FROM scored
)
SELECT lang_detected, count(*) AS n_docs
FROM detected
GROUP BY lang_detected
ORDER BY lang_detected
""",
)
def x3_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(TX.langid(F.col("text")).alias("lang_detected"))
        .groupBy("lang_detected")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_detected")
    )


@query(
    "x4_lang_quality_rollup",
    doc="per-language corpus statistics (chars, tokens, quality)",
    oracle=rf"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(CAST(sum(CAST({_QUALITY} AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_quality
FROM documents
GROUP BY lang
ORDER BY lang
""",
)
def x4_lang_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    q = TX.quality_score(F.col("text"))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(
                F.sum(q.cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_quality"),
        )
        .orderBy("lang")
    )


@query(
    "x5_bpe_tokens",
    doc="BPE-ish pre-tokenizer counts (GPT-2-style pattern, lookahead-free "
    "so Java regex and RE2 tokenize identically)",
    oracle=r"""
SELECT doc_id,
       len(regexp_extract_all(lower(text),
           '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+')) AS n_bpe_tokens
FROM documents
ORDER BY doc_id
""",
)
def x5_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", TX.bpe_token_count(F.col("text")).alias("n_bpe_tokens")
    ).orderBy("doc_id")


@query(
    "x6_rolling_fingerprint",
    doc="winnowing-style rolling-hash document fingerprint (min polynomial "
    "hash over token 3-grams)",
    oracle=rf"""
WITH v AS (
  SELECT doc_id,
         list_transform({_TOKS},
           t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)) AS vals
  FROM documents
)
SELECT doc_id,
       CASE WHEN len(vals) >= 3 THEN
         list_min(list_transform(generate_series(1, len(vals) - 2),
           i -> (vals[i] * 961 + vals[i+1] * 31 + vals[i+2])))
       ELSE NULL END AS fp
FROM v
ORDER BY doc_id
""",
)
def x6_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", TX.rolling_fingerprint(F.col("text")).alias("fp")
    ).orderBy("doc_id")


@query(
    "x7_quality_filter_pipeline",
    doc="end-to-end training-data filter pipeline: lang-ID gate + quality "
    "threshold + token-length band + exact-dedup survivor count, per "
    "language — the composed shape a corpus-prep job runs",
    oracle=rf"""
WITH scored AS (
  SELECT doc_id, text,
         {_NTOK} AS n_tokens,
         {_QUALITY} AS quality,
         md5({_NORM}) AS fp,
         {_LANG_SCORE_COLS}
  FROM documents
), detected AS (
  SELECT *, {_LANG_CASE} AS lang
  FROM scored
), kept AS (
  SELECT * FROM detected
  WHERE lang <> 'und' AND quality >= 0.5 AND n_tokens BETWEEN 5 AND 500
)
SELECT lang,
       count(*) AS n_kept,
       count(DISTINCT fp) AS n_unique,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM kept
GROUP BY lang
ORDER BY lang
""",
)
def x7_quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan, zero Python: every stage (lang-ID, quality, token count,
    fingerprint) is a codegen expression, the filters compose into the
    scan predicate, and the per-language rollup is a partial+final hash
    aggregate.  At 100 TB this whole pipeline is a single pass."""
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.quality_score(F.col("text")).alias("quality"),
        TX.fingerprint(F.col("text")).alias("fp"),
        TX.langid(F.col("text")).alias("lang"),
    )
    kept = scored.filter(
        (F.col("lang") != "und")
        & (F.col("quality") >= 0.5)
        & F.col("n_tokens").between(5, 500)
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.countDistinct("fp").alias("n_unique"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("lang")
    )


def _tri_score(lang: str) -> str:
    inlist = ",".join("'" + t.replace("'", "''") + "'" for t in TX.LANG_TRIGRAMS[lang])
    return (
        rf"len(list_filter(list_transform(range(1, len(' ' || {_NORM} || ' ') - 1), "
        rf"i -> substr(' ' || {_NORM} || ' ', i, 3)), t -> t IN ({inlist})))"
    )


@query(
    "x8_langid_ngram",
    doc="character-trigram language-ID (Cavnar-Trenkle-style n-gram "
    "profile heuristic), corpus distribution vs the marker-word variant",
    oracle=rf"""
WITH scored AS (
  SELECT doc_id,
         {_tri_score('en')} AS s_en,
         {_tri_score('de')} AS s_de,
         {_tri_score('es')} AS s_es,
         {_tri_score('fr')} AS s_fr
  FROM documents
), detected AS (
  SELECT doc_id,
         CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr) AND greatest(s_en, s_de, s_es, s_fr) > 0 THEN 'en'
              WHEN s_de = greatest(s_en, s_de, s_es, s_fr) AND greatest(s_en, s_de, s_es, s_fr) > 0 THEN 'de'
              WHEN s_es = greatest(s_en, s_de, s_es, s_fr) AND greatest(s_en, s_de, s_es, s_fr) > 0 THEN 'es'
              WHEN s_fr = greatest(s_en, s_de, s_es, s_fr) AND greatest(s_en, s_de, s_es, s_fr) > 0 THEN 'fr'
              ELSE 'und' END AS lang_detected
  FROM scored
)
SELECT lang_detected, count(*) AS n_docs
FROM detected
GROUP BY lang_detected
ORDER BY lang_detected
""",
)
def x8_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping char-trigram counts against per-language profiles —
    pure JVM array expressions, one scan; the frequency-weighted profile
    membership is the n-gram heuristic proper (the marker-word x3 variant
    stays as the cheap fallback)."""
    d = load(spark, sf_dir, "documents")
    return (
        TX.with_langid_ngram(d, "text")
        .groupBy("lang_detected")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_detected")
    )


@query(
    "x9_vocab_topk",
    doc="corpus vocabulary build: explode tokens, global term frequency + "
    "document frequency, deterministic top-15 (partial+final hash agg; at "
    "100 TB this is the standard one-shuffle vocab pass)",
    oracle=rf"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS term
  FROM documents
  WHERE len({_NORM}) > 0
)
SELECT term,
       count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs
FROM tok
GROUP BY term
ORDER BY n_occurrences DESC, term
LIMIT 15
""",
)
def x9_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # explode_nonnull: token elements are split output (never null); a
    # plain explode's inferred pre-filter inlines the tokenize chain 2×
    tok = TX.explode_nonnull(
        d.filter(F.length(TX.normalize_text(F.col("text"))) > 0),
        ["doc_id"],
        TX.tokens(F.col("text")),
        "term",
    )
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "term")
        .limit(15)
    )


@query(
    "x10_repetition_ratio",
    doc="intra-document repetition (1 − distinct/total tokens) — the "
    "boilerplate signal of training-data quality filters; exact integer "
    "ratio keeps the double bit-identical across engines",
    oracle=rf"""
WITH r AS (
  SELECT doc_id,
         {_NTOK} AS n_tokens,
         CASE WHEN len({_NORM}) = 0 THEN 0
              ELSE len(list_distinct({_TOKS})) END AS n_distinct
  FROM documents
)
SELECT doc_id, n_tokens, n_distinct,
       CASE WHEN n_tokens = 0 THEN 0.0
            ELSE CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens END AS repetition
FROM r
ORDER BY doc_id
""",
)
def x10_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.distinct_token_count(F.col("text")).alias("n_distinct"),
        TX.repetition_ratio(F.col("text")).alias("repetition"),
    ).orderBy("doc_id")


@query(
    "x11_tfidf_top_terms",
    doc="TF-IDF-style term salience (ratio form tf·N/df — exact integer "
    "division keeps doubles bit-identical): two hash aggs + one broadcast "
    "join of the df table; global top-20",
    oracle=rf"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS term
  FROM documents
  WHERE len({_NORM}) > 0
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM tok GROUP BY term
), n AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM tok
)
SELECT tf.doc_id, tf.term,
       CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS salience
FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
ORDER BY salience DESC, tf.term, tf.doc_id
LIMIT 20
""",
)
def x11_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan, one tokenize (VERDICT r3 #3): the tf aggregate is
    materialized once via localCheckpoint and df / n_docs both derive from
    it — tf rows are distinct (doc, term) pairs, so df(term) is a plain
    row count and n_docs a distinct doc_id count.  Catalyst specializes
    each branch (distinct-elimination drops the partial count, pruning
    differs), which defeats ReuseExchange on the shared subtree, so
    checkpointing is the reliable way to scan+tokenize the corpus exactly
    once (same pattern as d3/d7 per SCALE.md; on a real cluster swap
    localCheckpoint for persist(DISK_ONLY) or a reliable checkpoint dir).
    n_docs is folded in as a 1-row broadcast crossJoin instead of a
    driver-side count() action.  At 100 TB the tf agg is the only
    corpus-sized shuffle and it is partial-aggregated; df (|vocab| rows)
    and n_docs (1 row) broadcast back onto the checkpointed tf."""
    d = load(spark, sf_dir, "documents")
    base = d.filter(F.length(TX.normalize_text(F.col("text"))) > 0)
    # explode_nonnull: see x9 (inferred-filter duplication of the chain)
    tok = TX.explode_nonnull(base, ["doc_id"], TX.tokens(F.col("text")), "term")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint()
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    return (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias("salience"),
        )
        .orderBy(F.desc("salience"), "term", "doc_id")
        .limit(20)
    )


@query(
    "x13_column_profile",
    doc="single-pass column profiling (deequ/dbt-test shape): null rate, "
    "distinct count, min/max per documents column, one aggregate + unpivot",
    oracle="""
SELECT 'doc_id' AS col, count(*) AS n_rows,
       count(*) - count(doc_id) AS n_null,
       count(DISTINCT doc_id) AS n_distinct,
       CAST(min(doc_id) AS VARCHAR) AS min_val, CAST(max(doc_id) AS VARCHAR) AS max_val
FROM documents
UNION ALL
SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang),
       min(lang), max(lang) FROM documents
UNION ALL
SELECT 'source', count(*), count(*) - count(source), count(DISTINCT source),
       min(source), max(source) FROM documents
UNION ALL
SELECT 'n_chars', count(*), count(*) - count(n_chars), count(DISTINCT n_chars),
       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents
ORDER BY col
""",
)
def x13_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline-health primitive: every metric for every column in ONE
    partial+final aggregate over one scan (the oracle spells it as four
    scans for clarity; Catalyst computes ours in a single pass), then a
    zero-shuffle unpivot to rows."""
    d = load(spark, sf_dir, "documents", spread=False)
    cols = ["doc_id", "lang", "source", "n_chars"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    p = d.agg(*aggs)
    rows = None
    for c in cols:
        r = p.select(
            F.lit(c).alias("col"),
            F.col("n_rows"),
            F.col(f"{c}__null").alias("n_null"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows.orderBy("col")


@query(
    "x14_integrity_checks",
    doc="referential/uniqueness constraint checks (dbt-test shape): "
    "key-uniqueness and foreign-key orphan counts across the star schema",
    oracle="""
SELECT 'orders_pk_dupes' AS chk,
       (SELECT count(*) FROM
         (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)) AS n_bad
UNION ALL
SELECT 'customer_pk_dupes',
       (SELECT count(*) FROM
         (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1))
UNION ALL
SELECT 'orders_fk_orphans',
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'lineitem_fk_orphans',
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
ORDER BY chk
""",
)
def x14_integrity_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation as anti-joins and grouped-having counts —
    each check is one shuffle (broadcast for the dim-sized sides); a
    pipeline gates on all-zero results before publishing."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")

    def one(name, df):
        return df.agg(F.count(F.lit(1)).alias("n_bad")).select(
            F.lit(name).alias("chk"), "n_bad"
        )

    pk_o = one(
        "orders_pk_dupes",
        o.groupBy("o_orderkey").count().filter(F.col("count") > 1),
    )
    pk_c = one(
        "customer_pk_dupes",
        c.groupBy("c_custkey").count().filter(F.col("count") > 1),
    )
    fk_o = one(
        "orders_fk_orphans",
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti"),
    )
    fk_l = one(
        "lineitem_fk_orphans",
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti"),
    )
    return pk_o.unionByName(pk_c).unionByName(fk_o).unionByName(fk_l).orderBy("chk")


@query(
    "x15_pmi_cooccurrence",
    doc="association lift n_both·N/(n_1·n_2) of token pairs co-occurring "
    "in documents — corpus association mining over the distinct-token "
    "inverted index, apriori-pruned to frequent tokens",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok
  FROM documents
  WHERE len({_NORM}) > 0
), df AS (
  SELECT tok, count(*) AS n_docs FROM toks GROUP BY tok
), total AS (
  SELECT count(DISTINCT doc_id) AS n FROM toks
), ftoks AS (
  SELECT t.doc_id, t.tok
  FROM toks t JOIN df ON df.tok = t.tok
  WHERE df.n_docs >= 50
), pairs AS (
  SELECT a.tok AS tok_1, b.tok AS tok_2, count(*) AS n_both
  FROM ftoks a JOIN ftoks b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY tok_1, tok_2
)
SELECT tok_1, tok_2, n_both,
       round((CAST(n_both AS DOUBLE) * t.n)
             / (CAST(d1.n_docs AS DOUBLE) * d2.n_docs), 6) AS lift
FROM pairs
JOIN df d1 ON d1.tok = pairs.tok_1
JOIN df d2 ON d2.tok = pairs.tok_2
CROSS JOIN total t
WHERE n_both >= 50
ORDER BY tok_1, tok_2
""",
)
def x15_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining: exact lift n_both·N/(n_1·n_2), the ratio of a
    pair's observed document co-occurrence count to its expectation under
    token independence (integer counts in, one multiplication chain on
    doubles, round(6) — no log anywhere).

    Scale shape (VERDICT r3 #2/#3):
    - **Apriori prune**: n_both <= min(df(tok_1), df(tok_2)), so tokens
      with df < min_support can never reach the n_both >= 50 gate — the
      inverted index is filtered to frequent tokens BEFORE the doc-keyed
      self-join, shrinking the candidate-pair space from
      |doc|·|vocab_doc|² to pairs of frequent tokens only.
    - **One scan**: the exploded distinct-token index is materialized once
      via localCheckpoint and every consumer (df, N, prune, both self-join
      sides) reads the materialization — the corpus is scanned and
      tokenized exactly once (Catalyst's per-branch specialization defeats
      ReuseExchange otherwise; asserted in tests/test_pipeline_ops.py),
      and the corpus total N is a 1-row broadcast crossJoin instead of a
      driver-side count() action.  Downstream exchanges move only the
      pruned (doc_id, token) index, never the corpus."""
    d = load(spark, sf_dir, "documents", spread=False)
    min_support = 50
    base = d.filter(F.length(TX.normalize_text(F.col("text"))) > 0)
    # explode_nonnull: see x9 (inferred-filter duplication of the chain)
    toks = TX.explode_nonnull(
        base, ["doc_id"], F.array_distinct(TX.tokens(F.col("text"))), "tok"
    ).localCheckpoint()
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_docs"))
    total = toks.agg(F.countDistinct("doc_id").alias("n"))
    freq_set = dfreq.filter(F.col("n_docs") >= min_support).select("tok")
    ftoks = toks.join(F.broadcast(freq_set), "tok")
    a = ftoks.select("doc_id", F.col("tok").alias("tok_1"))
    b = ftoks.select(F.col("doc_id").alias("doc_id_b"), F.col("tok").alias("tok_2"))
    pairs = (
        a.join(b, (a["doc_id"] == b["doc_id_b"]) & (F.col("tok_1") < F.col("tok_2")))
        .groupBy("tok_1", "tok_2")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_support)
    )
    d1 = dfreq.select(F.col("tok").alias("tok_1"), F.col("n_docs").alias("n_1"))
    d2 = dfreq.select(F.col("tok").alias("tok_2"), F.col("n_docs").alias("n_2"))
    return (
        pairs.join(F.broadcast(d1), "tok_1")
        .join(F.broadcast(d2), "tok_2")
        .crossJoin(F.broadcast(total))
        .select(
            "tok_1",
            "tok_2",
            "n_both",
            F.round(
                (F.col("n_both").cast("double") * F.col("n"))
                / (F.col("n_1").cast("double") * F.col("n_2")),
                6,
            ).alias("lift"),
        )
        .orderBy("tok_1", "tok_2")
    )


@query(
    "x16_contamination_check",
    doc="benchmark decontamination scan (Dolma/C4 shape): training docs "
    "whose word-3-gram overlap with the doc_id%97==0 benchmark slice is "
    ">= 5% — broadcast benchmark gram set, one groupBy(doc) shuffle, "
    "never pairwise (operators/dedup.contamination_check)",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ts
  FROM documents
), grams AS (
  SELECT doc_id, list_distinct(list_transform(
      generate_series(1, greatest(len(ts) - 2, 0)),
      i -> array_to_string(ts[i:i+2], ' '))) AS gs
  FROM toks
), bench AS (
  SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 97 = 0
), ex AS (
  SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 97 <> 0
), hits AS (
  SELECT ex.doc_id, count(*) AS n_grams, count(b.g) AS n_hits
  FROM ex LEFT JOIN bench b ON ex.g = b.g
  GROUP BY ex.doc_id
)
SELECT doc_id, n_grams, n_hits,
       round(CAST(n_hits AS DOUBLE) / n_grams, 6) AS contamination
FROM hits
WHERE CAST(n_hits AS DOUBLE) / n_grams >= 0.05
ORDER BY doc_id
""",
)
def x16_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination gate for training pipelines: the doc_id%97==0
    slice stands in for a held-out benchmark; any other document sharing
    >= 5% of its distinct word trigrams with that slice is flagged.  The
    benchmark gram set broadcasts; the training side's only shuffle is
    the per-doc hit count."""
    from dataclod_spark.operators.dedup import contamination_check

    d = load(spark, sf_dir, "documents")
    return contamination_check(
        d, F.col("doc_id") % 97 == 0, n=3, threshold=0.05
    )


@query(
    "x17_lang_confusion",
    doc="declared-vs-detected language confusion matrix (marker-word "
    "language ID against the corpus labels) — the QA report a corpus "
    "labeling pass publishes",
    oracle=rf"""
WITH scored AS (
  SELECT lang AS declared,
         {_LANG_SCORE_COLS}
  FROM documents
), detected AS (
  SELECT declared, {_LANG_CASE} AS detected
  FROM scored
)
SELECT declared, detected, count(*) AS n_docs
FROM detected
GROUP BY declared, detected
ORDER BY declared, detected
""",
)
def x17_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab of the corpus's declared lang column against the
    marker-word detector (same scorer as x3) — one aggregate, the
    label-quality diagnostic."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.col("lang").alias("declared"), TX.langid(F.col("text")).alias("detected"))
        .groupBy("declared", "detected")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("declared", "detected")
    )


_SCRUB_DENY = ("customer",)
# DuckDB spelling of functions.text.scrub_text's replace chain (the 'g'
# flag is implicit in Spark's regexp_replace, explicit in DuckDB's)
_SCRUBBED = "text"
for _, _pat, _repl in TX.PII_PATTERNS:
    _SCRUBBED = f"regexp_replace({_SCRUBBED}, '{_pat}', '{_repl}', 'g')"
for _term in _SCRUB_DENY:
    _SCRUBBED = (
        rf"regexp_replace({_SCRUBBED}, '{TX.denylist_pattern(_term)}', "
        rf"'{TX.denylist_replacement(_term, dialect='duckdb')}', 'g')"
    )


@query(
    "x18_pii_redaction",
    doc="PII / denylist scrub report: per-source match counts for email, "
    "IPv4, phone and denylist-term patterns plus post-scrub corpus size "
    "— the redaction pass every training pipeline runs before tokenizing",
    oracle=rf"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '{TX.PII_PATTERNS[0][1]}'))) AS BIGINT) AS n_email,
       CAST(sum(len(regexp_extract_all(text, '{TX.PII_PATTERNS[1][1]}'))) AS BIGINT) AS n_ipv4,
       CAST(sum(len(regexp_extract_all(text, '{TX.PII_PATTERNS[2][1]}'))) AS BIGINT) AS n_phone,
       CAST(sum(len(regexp_extract_all(text, '{TX.denylist_pattern(_SCRUB_DENY[0])}'))) AS BIGINT) AS n_term,
       CAST(sum(len({_SCRUBBED})) AS BIGINT) AS scrubbed_chars
FROM documents
GROUP BY source
ORDER BY source
""",
)
def x18_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern scrubbing is pure chained ``regexp_replace``/``regexp_count``
    — whole-stage codegen, one scan, one small groupBy(source) shuffle;
    at 100 TB the scrub itself is embarrassingly parallel map work.  The
    synthetic corpus carries no real PII (the email/ip/phone counts
    legitimately aggregate to 0 — the patterns are exercised non-trivially
    by unit tests), while the denylist term hits throughout."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(TX.pii_count(t, TX.PII_PATTERNS[0][1])).alias("n_email"),
            F.sum(TX.pii_count(t, TX.PII_PATTERNS[1][1])).alias("n_ipv4"),
            F.sum(TX.pii_count(t, TX.PII_PATTERNS[2][1])).alias("n_phone"),
            F.sum(TX.pii_count(t, TX.denylist_pattern(_SCRUB_DENY[0]))).alias("n_term"),
            F.sum(F.length(TX.scrub_text(t, denylist=_SCRUB_DENY))).alias("scrubbed_chars"),
        )
        .orderBy("source")
    )


@query(
    "x19_sequence_packing",
    doc="concat-and-chunk sequence packing report (ctx=64 whitespace "
    "tokens, 8 shards per source): sequences produced, boundary-straddling "
    "documents — LM pretraining batch-prep accounting",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, source, CAST({_NTOK} AS BIGINT) AS tok, doc_id % 8 AS shard
  FROM documents
), cum AS (
  SELECT source, shard, tok,
         sum(tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - tok AS strt
  FROM toks
), per_shard AS (
  SELECT source, shard, count(*) AS n_docs, sum(tok) AS toks,
         sum(CASE WHEN tok > 0 AND (strt + tok - 1) // 64 != strt // 64
                  THEN 1 ELSE 0 END) AS n_straddle
  FROM cum GROUP BY source, shard
)
SELECT source,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS n_tokens,
       CAST(sum(CAST(floor((toks + 63) / 64.0) AS BIGINT)) AS BIGINT) AS n_sequences,
       CAST(sum(n_straddle) AS BIGINT) AS n_straddle_docs
FROM per_shard
GROUP BY source
ORDER BY source
""",
)
def x19_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See operators.packing: one (source, shard) window cumsum shuffle,
    codegen arithmetic after it; the shard column bounds window-partition
    size so a few-source 100 TB corpus still fans out."""
    from dataclod_spark.operators.packing import packing_report

    d = load(spark, sf_dir, "documents")
    return packing_report(
        d, TX.token_count(F.col("text")), id_col="doc_id",
        group_col="source", ctx_len=64, n_shards=8,
    )


@query(
    "x20_gopher_repetition",
    doc="Gopher-style intra-document repetition report (Rae et al. 2021 "
    "§A1.1): per-source character coverage of the top word-2-gram and of "
    "duplicate word-5-grams, plus docs flagged by the 0.20 / 0.15 "
    "thresholds — the repetition-removal quality gate",
    oracle=rf"""
WITH base AS (
  SELECT doc_id, source, len({_NORM}) AS n_chars, {_TOKS} AS t
  FROM documents
), grams AS (
  SELECT doc_id, source, n_chars,
         list_transform(generate_series(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1]) AS g2,
         list_transform(generate_series(1, len(t) - 4),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]) AS g5
  FROM base
), c2 AS (
  SELECT doc_id, gram, count(*) AS cnt
  FROM (SELECT doc_id, unnest(g2) AS gram FROM grams) GROUP BY doc_id, gram
), s2 AS (
  SELECT doc_id, max(cnt * len(gram)) AS top2 FROM c2 GROUP BY doc_id
), c5 AS (
  SELECT doc_id, gram, count(*) AS cnt
  FROM (SELECT doc_id, unnest(g5) AS gram FROM grams) GROUP BY doc_id, gram
), s5 AS (
  SELECT doc_id,
         CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt * len(gram) END), 0) AS BIGINT) AS dup5
  FROM c5 GROUP BY doc_id
), per_doc AS (
  SELECT g.source, g.n_chars,
         coalesce(s2.top2, 0) AS top2, coalesce(s5.dup5, 0) AS dup5
  FROM grams g LEFT JOIN s2 USING (doc_id) LEFT JOIN s5 USING (doc_id)
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS norm_chars,
       CAST(sum(top2) AS BIGINT) AS top2_chars,
       CAST(sum(dup5) AS BIGINT) AS dup5_chars,
       CASE WHEN sum(n_chars) = 0 THEN 0.0
            ELSE CAST(sum(top2) AS DOUBLE) / CAST(sum(n_chars) AS BIGINT) END AS top2_frac,
       CASE WHEN sum(n_chars) = 0 THEN 0.0
            ELSE CAST(sum(dup5) AS DOUBLE) / CAST(sum(n_chars) AS BIGINT) END AS dup5_frac,
       CAST(sum(CASE WHEN top2 * 100 > 20 * n_chars
                       OR dup5 * 100 > 15 * n_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM per_doc
GROUP BY source
ORDER BY source
""",
)
def x20_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher repetition signals computed with ZERO shuffle —
    ``functions.text.ngram_repetition_from`` folds a run-length pass over
    the sorted in-row gram array (no explode, no per-gram groupBy), so at
    100 TB the only exchange is the final tiny groupBy(source).  The
    DuckDB oracle spells the equivalent unnest+GROUP BY formulation.
    ``top_cover`` is the deterministic "characters covered by the
    most-covering gram" form of Gopher's top-n-gram fraction (count·len
    max, where "most frequent" alone is tie-ambiguous); flags use exact
    integer cross-multiplication, fractions are one bigint/bigint
    division — bit-identical across engines."""
    d = load(spark, sf_dir, "documents")
    staged = d.select(
        "source",
        F.length(TX.normalize_text(F.col("text"))).alias("n_chars"),
        TX.tokens(F.col("text")).alias("__toks"),
    )
    reps = staged.select(
        "source",
        "n_chars",
        TX.ngram_repetition_from(
            TX.word_ngram_stream_from(F.col("__toks"), 2)
        )["top_cover"].alias("top2"),
        TX.ngram_repetition_from(
            TX.word_ngram_stream_from(F.col("__toks"), 5)
        )["dup_cover"].alias("dup5"),
    )
    agg = reps.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("norm_chars"),
        F.sum("top2").alias("top2_chars"),
        F.sum("dup5").alias("dup5_chars"),
        F.sum(
            F.when(
                (F.col("top2") * 100 > 20 * F.col("n_chars"))
                | (F.col("dup5") * 100 > 15 * F.col("n_chars")),
                1,
            ).otherwise(0)
        ).alias("n_flagged"),
    )
    frac = lambda num: F.when(F.col("norm_chars") == 0, F.lit(0.0)).otherwise(
        F.col(num).cast("double") / F.col("norm_chars")
    )
    return agg.select(
        "source", "n_docs", "norm_chars", "top2_chars", "dup5_chars",
        frac("top2_chars").alias("top2_frac"),
        frac("dup5_chars").alias("dup5_frac"),
        "n_flagged",
    ).orderBy("source")


@query(
    "x21_ngram_lm_score",
    doc="corpus-trained character-trigram LM familiarity score (the CCNet "
    "perplexity-filter shape, kept log-free for engine-exact doubles): "
    "bottom-20 least-corpus-typical documents",
    oracle=rf"""
WITH padded AS (
  SELECT doc_id, ' ' || {_NORM} || ' ' AS p FROM documents
), tri AS (
  SELECT doc_id, unnest(list_transform(range(1, len(p) - 1),
                                       i -> substr(p, i, 3))) AS g
  FROM padded
), per AS (
  SELECT doc_id, g, count(*) AS cnt FROM tri GROUP BY doc_id, g
), vocab AS (
  SELECT g, CAST(sum(cnt) AS BIGINT) AS corpus_cnt FROM per GROUP BY g
), tot AS (
  SELECT CAST(sum(corpus_cnt) AS BIGINT) AS total FROM vocab
)
SELECT per.doc_id,
       CAST(sum(per.cnt) AS BIGINT) AS n_grams,
       CAST(sum(CAST(per.cnt AS HUGEINT) * vocab.corpus_cnt) AS DOUBLE)
         / CAST(sum(per.cnt) AS BIGINT) / tot.total AS familiarity
FROM per JOIN vocab USING (g) CROSS JOIN tot
GROUP BY per.doc_id, tot.total
ORDER BY familiarity ASC, per.doc_id
LIMIT 20
""",
)
def x21_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-on-corpus / score-on-corpus fluency filter: the "LM" is the
    corpus's own trigram occurrence table, a document's familiarity is its
    mean trigram corpus-frequency (sum cnt·corpus_cnt / n_grams / total —
    all-bigint numerators, two IEEE divisions, no log, so the double and
    its ORDER BY cut are bit-identical across engines).  Same
    single-scan shape as x11: the (doc, gram) counts are materialized
    once via localCheckpoint, the vocab and grand total both derive from
    them, and vocab (bounded: ≤ charset³ rows) + total (1 row) broadcast
    back — at 100 TB the one corpus-sized shuffle is the partial-agged
    (doc, gram) count."""
    d = load(spark, sf_dir, "documents")
    return (
        _lm_familiarity(d)
        .orderBy(F.asc("familiarity"), "doc_id")
        .limit(20)
    )


def _lm_familiarity(d: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
    """Per-doc corpus-trigram familiarity ``(doc_id, *extra, n_grams,
    familiarity)`` — the shared scoring core of x21 (bottom-k report) and
    x23 (CCNet head/middle/tail bucketing).  ``extra`` columns (doc-level
    attributes like lang) ride through the (doc, gram) aggregate so no
    second corpus join is needed."""
    padded = d.select(
        "doc_id",
        *extra,
        F.concat(F.lit(" "), TX.normalize_text(F.col("text")), F.lit(" ")).alias("__p"),
    )
    # explode_nonnull: trigram elements are substrings (never null); kills
    # the inferred pre-filter's 2× inline of the trigram chain
    tri = TX.explode_nonnull(
        padded, ["doc_id", *extra], TX._char_trigrams_from(F.col("__p")), "g"
    )
    per = (
        tri.groupBy("doc_id", *extra, "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    vocab = per.groupBy("g").agg(F.sum("cnt").alias("corpus_cnt"))
    tot = vocab.agg(F.sum("corpus_cnt").alias("total"))
    # the familiarity numerator Σ cnt·corpus_cnt reaches ~1e19 at the
    # 100 TB target (corpus_cnt ~ total/|vocab| ~ 1e12 × a large doc's
    # 1e7 grams) — past int64, where Spark's bigint sum would silently
    # wrap while DuckDB widens to HUGEINT.  DECIMAL(38,0) keeps the
    # product and sum exact on the Spark side (the oracle casts the
    # product to HUGEINT for the same reason); the double conversion at
    # the end rounds the same exact integer on both engines.
    doc = (
        per.join(F.broadcast(vocab), "g")
        .groupBy("doc_id", *extra)
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(
                F.col("cnt").cast("decimal(19,0)")
                * F.col("corpus_cnt").cast("decimal(19,0)")
            ).alias("__fam"),
        )
    )
    return doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        *extra,
        "n_grams",
        (F.col("__fam").cast("double") / F.col("n_grams") / F.col("total")).alias(
            "familiarity"
        ),
    )


_X22_SCORED = rf"""
  SELECT doc_id, source,
         {_NTOK} AS n_tokens,
         {_QUALITY} AS quality,
         md5({_NORM}) AS fp,
         {_LANG_SCORE_COLS}
  FROM documents
"""


@query(
    "x22_curation_funnel",
    doc="end-to-end curation funnel per source: raw docs → x7's quality/"
    "lang filter → global exact dedup (min-id winner per fingerprint) → "
    "x19's per-shard ctx-64 sequence packing — the whole pipeline's "
    "stage-by-stage accounting in one DAG",
    oracle=rf"""
WITH scored AS ({_X22_SCORED}
), flg AS (
  SELECT doc_id, source, n_tokens, fp,
         ({_LANG_CASE}) <> 'und'
         AND quality >= 0.5 AND n_tokens BETWEEN 5 AND 500 AS pass
  FROM scored
), raw AS (
  SELECT source, count(*) AS n_raw,
         CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
  FROM flg GROUP BY source
), win AS (
  SELECT * FROM (
    SELECT source, doc_id, n_tokens,
           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM flg WHERE pass
  ) WHERE rn = 1
), uniq AS (
  SELECT source, count(*) AS n_unique,
         CAST(sum(n_tokens) AS BIGINT) AS unique_tokens
  FROM win GROUP BY source
), shards AS (
  SELECT source, doc_id % 8 AS shard, sum(n_tokens) AS toks
  FROM win GROUP BY source, shard
), packed AS (
  SELECT source,
         CAST(sum(CAST(floor((toks + 63) / 64.0) AS BIGINT)) AS BIGINT) AS n_sequences
  FROM shards GROUP BY source
)
SELECT r.source, r.n_raw, r.n_quality,
       CAST(coalesce(u.n_unique, 0) AS BIGINT) AS n_unique,
       CAST(coalesce(u.unique_tokens, 0) AS BIGINT) AS unique_tokens,
       CAST(coalesce(p.n_sequences, 0) AS BIGINT) AS n_sequences
FROM raw r LEFT JOIN uniq u ON r.source = u.source
           LEFT JOIN packed p ON r.source = p.source
ORDER BY r.source
""",
)
def x22_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stages a corpus actually flows through, composed in one DAG:
    the scored projection (token count, quality, fingerprint, lang-ID —
    all codegen) is localCheckpoint-ed so the funnel's two branches (raw
    per-source counts; the dedup→pack chain) read ONE corpus scan
    instead of re-scanning per branch (x11's discipline, SCALE.md
    pitfall #6).  Downstream of the checkpoint: one fp shuffle for the
    global min-id dedup, then per-(source, shard) partial aggregates —
    the same shapes x7/d1/x19 carry individually, here chained.  Empty
    sources coalesce to 0 rather than dropping out."""
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.quality_score(F.col("text")).alias("quality"),
        TX.fingerprint(F.col("text")).alias("fp"),
        TX.langid(F.col("text")).alias("lang"),
    ).localCheckpoint()
    flg = scored.withColumn(
        "pass",
        (F.col("lang") != "und")
        & (F.col("quality") >= 0.5)
        & F.col("n_tokens").between(5, 500),
    )
    raw = flg.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("pass"), 1).otherwise(0)).alias("n_quality"),
    )
    win = (
        flg.filter(F.col("pass"))
        .groupBy("fp")
        .agg(
            F.min_by(
                F.struct("source", "doc_id", "n_tokens"), F.col("doc_id")
            ).alias("__w")
        )
        .select(
            F.col("__w.source").alias("source"),
            F.col("__w.doc_id").alias("doc_id"),
            F.col("__w.n_tokens").alias("n_tokens"),
        )
    )
    uniq = win.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("n_tokens").alias("unique_tokens"),
    )
    packed = (
        win.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(8)))
        .groupBy("source", "shard")
        .agg(F.sum("n_tokens").alias("toks"))
        .groupBy("source")
        .agg(
            F.sum(F.floor((F.col("toks") + 63) / F.lit(64.0)).cast("bigint")).alias(
                "n_sequences"
            )
        )
    )
    return (
        raw.join(uniq, "source", "left")
        .join(packed, "source", "left")
        .select(
            "source",
            "n_raw",
            "n_quality",
            F.coalesce(F.col("n_unique"), F.lit(0)).cast("bigint").alias("n_unique"),
            F.coalesce(F.col("unique_tokens"), F.lit(0)).cast("bigint").alias("unique_tokens"),
            F.coalesce(F.col("n_sequences"), F.lit(0)).cast("bigint").alias("n_sequences"),
        )
        .orderBy("source")
    )


@query(
    "x23_lm_quality_buckets",
    doc="CCNet-style head/middle/tail quality bucketing: per-language "
    "ntile(3) over the corpus-trigram LM familiarity score (head = most "
    "corpus-typical) — the bucketing CCNet publishes its corpus in "
    "(Wenzek et al. 2020 §4.3, perplexity terciles per language)",
    oracle=rf"""
WITH padded AS (
  SELECT doc_id, lang, ' ' || {_NORM} || ' ' AS p FROM documents
), tri AS (
  SELECT doc_id, lang, unnest(list_transform(range(1, len(p) - 1),
                                             i -> substr(p, i, 3))) AS g
  FROM padded
), per AS (
  SELECT doc_id, lang, g, count(*) AS cnt FROM tri GROUP BY doc_id, lang, g
), vocab AS (
  SELECT g, CAST(sum(cnt) AS BIGINT) AS corpus_cnt FROM per GROUP BY g
), tot AS (
  SELECT CAST(sum(corpus_cnt) AS BIGINT) AS total FROM vocab
), scored AS (
  SELECT per.doc_id, per.lang,
         CAST(sum(per.cnt) AS BIGINT) AS n_grams,
         CAST(sum(CAST(per.cnt AS HUGEINT) * vocab.corpus_cnt) AS DOUBLE)
           / CAST(sum(per.cnt) AS BIGINT) / tot.total AS familiarity
  FROM per JOIN vocab USING (g) CROSS JOIN tot
  GROUP BY per.doc_id, per.lang, tot.total
), bucketed AS (
  SELECT lang, n_grams, familiarity,
         ntile(3) OVER (PARTITION BY lang
                        ORDER BY familiarity DESC, doc_id) AS bkt
  FROM scored
)
SELECT lang,
       CASE bkt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       CAST(sum(n_grams) AS BIGINT) AS n_grams,
       round(CAST(sum(CAST(familiarity AS DECIMAL(18,12))) AS DOUBLE)
             / count(*), 8) AS avg_familiarity
FROM bucketed
GROUP BY lang, bkt
ORDER BY lang, bucket
""",
)
def x23_lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes x21's familiarity core (_lm_familiarity, lang carried
    through the gram aggregate — no second corpus join) with an exact
    per-language tercile cut over (familiarity DESC, doc_id) — ntile(3)
    semantics, but WITHOUT windowing whole strata: a window partition is
    a one-task sort in Spark (AQE never splits window partitions), so on
    a real crawl the dominant language would serialize through one
    thread.  See :func:`_bucket_terciles` for the banded-boundary plan;
    the bit-identical doubles + doc_id tiebreak keep the cut
    engine-exact, and per-bucket mean familiarity still accumulates as
    DECIMAL (order-free)."""
    d = load(spark, sf_dir, "documents")
    scored = _lm_familiarity(d, extra=("lang",)).localCheckpoint(eager=True)
    return _bucket_terciles(scored)


def _tercile_ok() -> Column:
    """Per-stratum band verification: both approx value bands provably
    bracket their exact tercile boundary rank (conditional counts are
    exact, so this is a proof, not a probability)."""
    return (
        (F.col("__chi1") <= F.col("__r1"))
        & (F.col("__clo1") >= F.col("__r1"))
        & (F.col("__chi2") <= F.col("__r2"))
        & (F.col("__clo2") >= F.col("__r2"))
    )


def _tercile_thresholds(scored: DataFrame) -> DataFrame:
    """One row per lang: exact tercile boundary ranks ``__r1``/``__r2``
    (ntile(3) bucket sizes from the stratum count), approx value bands
    ``[__lo_i, __hi_i]`` around each boundary (percentile_approx with
    slack wider than Greenwald-Khanna's n/accuracy rank error), exact
    verification counts against them, and the conditional bucket sums
    the assembler needs.  Two bounded aggregates over ``scored``; the
    result is |langs| rows.  Exported for the scale tests."""
    from dataclod_spark.operators import sampling as SMP

    acc = SMP._PCT_ACC
    s = 5.0 / acc
    pct = F.percentile_approx(
        "familiarity",
        [
            max(0.0, 1.0 / 3.0 - s),
            min(1.0, 1.0 / 3.0 + s),
            max(0.0, 2.0 / 3.0 - s),
            min(1.0, 2.0 / 3.0 + s),
        ],
        acc,
    )
    st = scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("__n"), pct.alias("__pa")
    )
    q3 = F.floor(F.col("__n") / 3).cast("bigint")
    r3 = F.col("__n") % 3
    st = st.select(
        "lang",
        "__n",
        (q3 + (r3 >= 1).cast("bigint")).alias("__r1"),
        (
            q3 * 2 + (r3 >= 1).cast("bigint") + (r3 >= 2).cast("bigint")
        ).alias("__r2"),
        F.col("__pa")[2].alias("__lo1"),
        F.col("__pa")[3].alias("__hi1"),
        F.col("__pa")[0].alias("__lo2"),
        F.col("__pa")[1].alias("__hi2"),
    )
    jt = SMP._join_stratum(scored, st, "lang")
    fam = F.col("familiarity")
    dec = fam.cast("decimal(18,12)")
    z = F.lit(0).cast("decimal(18,12)")
    chk = jt.groupBy("lang").agg(
        F.count(F.when(fam > F.col("__hi1"), 1)).alias("__chi1"),
        F.count(F.when(fam >= F.col("__lo1"), 1)).alias("__clo1"),
        F.count(F.when(fam > F.col("__hi2"), 1)).alias("__chi2"),
        F.count(F.when(fam >= F.col("__lo2"), 1)).alias("__clo2"),
        F.sum(
            F.when(fam > F.col("__hi1"), F.col("n_grams")).otherwise(F.lit(0))
        ).alias("__ghi1"),
        F.sum(F.when(fam > F.col("__hi1"), dec).otherwise(z)).alias("__fhi1"),
        F.sum(
            F.when(fam > F.col("__hi2"), F.col("n_grams")).otherwise(F.lit(0))
        ).alias("__ghi2"),
        F.sum(F.when(fam > F.col("__hi2"), dec).otherwise(z)).alias("__fhi2"),
        F.count(F.lit(1)).alias("__cn"),
        F.sum("n_grams").alias("__gall"),
        F.sum(dec).alias("__fall"),
    )
    return SMP._join_stratum(st, chk, "lang")


def _bucket_terciles(scored: DataFrame) -> DataFrame:
    """Exact CCNet tercile bucketing of ``(doc_id, lang, n_grams,
    familiarity)`` rows to ``(lang, bucket, n_docs, n_grams,
    avg_familiarity)`` — identical to a per-lang ``ntile(3)`` over
    (familiarity DESC, doc_id), but the only rank windows run over the
    verified BOUNDARY BANDS (~2·n/accuracy rows per boundary), never a
    whole stratum:

    * head  = {fam > hi1} sums (plain conditional aggregate)
              + band-1 rows whose exact rank lands ≤ R1;
    * ranks-≤R2 analogously with band 2; middle/tail follow by exact
      subtraction (counts and DECIMAL sums both distribute).

    A stratum whose band verification fails (possible only if the GK
    sketch bound were violated — belt and braces) falls back to the full
    ntile window for that stratum alone.  Degenerate tie mass AT a
    boundary value widens that band to the tie group — any exact rank
    must order those ties.  ``scored`` should be checkpointed by the
    caller (several bounded aggregates re-read it)."""
    from dataclod_spark.operators import sampling as SMP

    thr = _tercile_thresholds(scored).localCheckpoint(eager=True)
    jt = SMP._join_stratum(scored, thr, "lang")
    fam = F.col("familiarity")
    dec = fam.cast("decimal(18,12)")
    ok = _tercile_ok()
    wdesc = Window.partitionBy("lang").orderBy(fam.desc(), F.col("doc_id"))

    def _band(lo: str, hi: str, chi: str, r: str) -> DataFrame:
        return (
            jt.filter(ok & (fam >= F.col(lo)) & (fam <= F.col(hi)))
            .withColumn("__rk", F.row_number().over(wdesc))
            .filter(F.col(chi) + F.col("__rk") <= F.col(r))
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("__bn"),
                F.sum("n_grams").alias("__bg"),
                F.sum(dec).alias("__bf"),
            )
        )

    band1 = _band("__lo1", "__hi1", "__chi1", "__r1").select(
        "lang",
        F.col("__bn").alias("__b1n"),
        F.col("__bg").alias("__b1g"),
        F.col("__bf").alias("__b1f"),
    )
    band2 = _band("__lo2", "__hi2", "__chi2", "__r2").select(
        "lang",
        F.col("__bn").alias("__b2n"),
        F.col("__bg").alias("__b2g"),
        F.col("__bf").alias("__b2f"),
    )
    per = SMP._join_stratum(SMP._join_stratum(thr, band1, "lang"), band2, "lang")
    zn = F.lit(0).cast("bigint")
    zf = F.lit(0).cast("decimal(38,12)")
    f38 = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    u1n = F.col("__chi1") + F.coalesce(F.col("__b1n"), zn)
    u1g = F.col("__ghi1") + F.coalesce(F.col("__b1g"), zn)
    u1f = f38(F.col("__fhi1")) + F.coalesce(f38(F.col("__b1f")), zf)
    u2n = F.col("__chi2") + F.coalesce(F.col("__b2n"), zn)
    u2g = F.col("__ghi2") + F.coalesce(F.col("__b2g"), zn)
    u2f = f38(F.col("__fhi2")) + F.coalesce(f38(F.col("__b2f")), zf)

    def _row(name: str, n, g, f) -> Column:
        return F.struct(
            F.lit(name).alias("bucket"),
            n.cast("bigint").alias("n_docs"),
            g.cast("bigint").alias("n_grams"),
            f.cast("decimal(38,12)").alias("__fsum"),
        )

    ok_rows = (
        per.filter(ok)
        .select(
            "lang",
            F.explode(
                F.array(
                    _row("head", u1n, u1g, u1f),
                    _row("middle", u2n - u1n, u2g - u1g, u2f - u1f),
                    _row("tail", F.col("__cn") - u2n, F.col("__gall") - u2g,
                         f38(F.col("__fall")) - u2f),
                )
            ).alias("__b"),
        )
        .select("lang", "__b.*")
        .filter(F.col("n_docs") > 0)
    )
    fb = (
        jt.filter(~ok)
        .select(
            "lang", "n_grams", dec.alias("__dec"),
            F.ntile(3).over(wdesc).alias("__bkt"),
        )
        .groupBy(
            "lang",
            F.when(F.col("__bkt") == 1, "head")
            .when(F.col("__bkt") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_grams").alias("n_grams"),
            F.sum("__dec").cast("decimal(38,12)").alias("__fsum"),
        )
    )
    return (
        ok_rows.unionByName(fb)
        .select(
            "lang",
            "bucket",
            "n_docs",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.round(
                F.col("__fsum").cast("double") / F.col("n_docs"), 8
            ).alias("avg_familiarity"),
        )
        .orderBy("lang", "bucket")
    )


_BPE_N = 8
_BPE_MERGE = """CASE WHEN len(syms) <= 1 THEN syms ELSE
      reduce(list_prepend([syms[1]], list_transform(syms[2:], s -> [s])),
             (acc, x) -> CASE WHEN acc[len(acc)] = m.a AND x[1] = m.b
                         THEN list_concat(acc[1:len(acc)-1], [m.a || m.b])
                         ELSE list_concat(acc, x) END) END"""


def _bpe_round_cte(r: int) -> str:
    return f"""p{r} AS (
  SELECT u.pr.a AS a, u.pr.b AS b, CAST(sum(freq) AS BIGINT) AS c
  FROM (SELECT freq, unnest(CASE WHEN len(syms) >= 2
          THEN list_transform(range(1, len(syms)), i -> {{'a': syms[i], 'b': syms[i+1]}})
          ELSE [] END) AS pr FROM w{r}) u
  GROUP BY u.pr.a, u.pr.b
), m{r} AS (
  SELECT a, b, c, {r + 1} AS merge_rank FROM p{r} ORDER BY c DESC, a, b LIMIT 1
), w{r + 1} AS (
  SELECT freq, {_BPE_MERGE} AS syms
  FROM w{r}, m{r} m
)"""


_BPE_ORACLE = (
    f"""
WITH toks AS (
  SELECT unnest(list_filter({_TOKS}, t -> t != '')) AS word
  FROM documents
), w0 AS (
  SELECT list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms,
         count(*) AS freq
  FROM toks GROUP BY word
), """
    + ",\n".join(_bpe_round_cte(r) for r in range(_BPE_N))
    + f"""
SELECT merge_rank, a AS left_sym, b AS right_sym, c AS pair_freq
FROM ({" UNION ALL ".join(f"SELECT * FROM m{r}" for r in range(_BPE_N))})
ORDER BY merge_rank
"""
)


@query(
    "x24_bpe_merges",
    doc="BPE vocabulary induction (Sennrich et al. 2016): the first 8 "
    "merges learned from the corpus — iterative argmax-pair merging over "
    "the DISTINCT-WORD frequency table (one corpus shuffle up front, "
    "then |vocab|-bounded rounds); the tokenizer-training stage of an "
    "LLM data pipeline",
    oracle=_BPE_ORACLE,
)
def x24_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.bpe.bpe_train: pair counts are one partial+final
    aggregate per round over the word table, the merge rewrite is a pure
    JVM array fold, ties break lexicographically so the merge sequence is
    fully deterministic — the oracle replays all 8 rounds as chained CTEs
    with DuckDB's reduce() spelling the identical greedy fold."""
    from dataclod_spark.operators.bpe import bpe_train

    d = load(spark, sf_dir, "documents", spread=False)
    return bpe_train(d, "text", n_merges=_BPE_N, min_freq=2).orderBy("merge_rank")


_BPE_ENCODE_ORACLE = (
    f"""
WITH toks AS (
  SELECT unnest(list_filter({_TOKS}, t -> t != '')) AS word
  FROM documents
), w0 AS (
  SELECT list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms,
         count(*) AS freq
  FROM toks GROUP BY word
), """
    + ",\n".join(_bpe_round_cte(r) for r in range(_BPE_N))
    # ONE reference to the final word table (multi-reference scalar
    # subqueries re-expand the whole 8-round CTE chain per reference —
    # measured exponential): unnest each word's symbols with a
    # first-symbol flag so word-level and symbol-level aggregates come
    # out of a single scan
    + f"""
SELECT CAST(count(*) FILTER (WHERE u.f) AS BIGINT) AS n_words,
       CAST(sum(freq) FILTER (WHERE u.f) AS BIGINT) AS total_freq,
       CAST(sum(freq) AS BIGINT) AS total_tokens,
       CAST(sum(freq * len(u.s)) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT u.s) AS BIGINT) AS vocab_size,
       round(CAST(sum(freq) AS DOUBLE) / sum(freq * len(u.s)), 6) AS compression
FROM (SELECT freq, unnest(list_transform(range(1, len(syms) + 1),
        i -> {{'s': syms[i], 'f': i = 1}})) AS u FROM w{_BPE_N})
"""
)


@query(
    "x26_bpe_encode_stats",
    doc="BPE ENCODE report: the learned 8-merge vocabulary applied back "
    "to the corpus — frequency-weighted token count, character count, "
    "resulting symbol vocabulary and tokens/chars compression (the "
    "fertility number a tokenizer-training loop watches); encoding runs "
    "on the distinct-word table, so corpus-level totals cost |vocab|, "
    "not corpus bytes",
    oracle=_BPE_ENCODE_ORACLE,
)
def x26_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.bpe.bpe_encode_stats — trains the same 8 merges as x24,
    replays them in rank order over the word table with the same greedy
    JVM fold, and rolls the weighted stats into one row; the oracle
    extends x24's proven round-CTE chain with the stats select over the
    final word table."""
    from dataclod_spark.operators.bpe import bpe_encode_stats

    d = load(spark, sf_dir, "documents")
    return bpe_encode_stats(d, "text", n_merges=_BPE_N, min_freq=2)


@query(
    "x29_source_calibration",
    doc="per-source percentile calibration of quality scores (the "
    "cross-source normalization before mixed-corpus thresholding: raw "
    "scores are not comparable across sources) — each doc's score maps "
    "to its position in its OWN source's exact quantile grid; bounded "
    "|sources|x20 grid broadcast + per-row array filter, never a "
    "per-row percent_rank window",
    oracle=rf"""
WITH scored AS (
  SELECT doc_id, source, {_QUALITY} AS quality FROM documents
), r AS (
  SELECT source, quality AS x,
         row_number() OVER (PARTITION BY source ORDER BY quality) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM scored WHERE quality IS NOT NULL
), grid AS (
  SELECT source, x AS v
  FROM r CROSS JOIN (SELECT unnest(range(1, 21)) AS i) t
  WHERE rn = greatest((i * n + 19) // 20, 1)
)
SELECT s.doc_id, s.source, s.quality,
       CASE WHEN s.quality IS NULL THEN NULL
            ELSE CAST(sum(CASE WHEN g.v <= s.quality THEN 1 ELSE 0 END) AS INT)
       END AS cal_bucket,
       CASE WHEN s.quality IS NULL THEN NULL
            ELSE round(sum(CASE WHEN g.v <= s.quality THEN 1 ELSE 0 END) / 20.0, 6)
       END AS calibrated
FROM scored s LEFT JOIN grid g USING (source)
GROUP BY s.doc_id, s.source, s.quality
ORDER BY s.doc_id
""",
)
def x29_source_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.quantiles.percentile_calibrate(group=source) over x2's
    bit-identical integer-ratio quality score; grid ranks are EXACT
    integer ``(i*n + 19) div 20`` on both engines (r10: the earlier
    double ``ceil((i/20.0)*n)`` overshot by one wherever i·n/20 was an
    exact integer with i/20 binary-inexact, e.g. i=11, n=100)."""
    from dataclod_spark.operators.quantiles import percentile_calibrate

    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", TX.quality_score(F.col("text")).alias("quality")
    )
    return percentile_calibrate(scored, "source", "quality", n_buckets=20).orderBy(
        "doc_id"
    )


_BPE_FERTILITY_ORACLE = (
    f"""
WITH toks AS (
  SELECT unnest(list_filter({_TOKS}, t -> t != '')) AS word
  FROM documents
), w0 AS (
  SELECT list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms,
         count(*) AS freq
  FROM toks GROUP BY word
), """
    + ",\n".join(_bpe_round_cte(r) for r in range(_BPE_N))
    # the word string survives encoding as concat(syms) (merges only join
    # adjacent symbols), so ONE reference to the final table re-keys it
    # for the per-(lang, word) frequency join
    + f"""
, enc AS (
  SELECT array_to_string(syms, '') AS word, len(syms) AS nt FROM w{_BPE_N}
), lw AS (
  SELECT lang, unnest(list_filter({_TOKS}, t -> t != '')) AS word
  FROM documents
), lwf AS (
  SELECT lang, word, count(*) AS lfreq FROM lw GROUP BY lang, word
)
SELECT lwf.lang,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(lwf.lfreq) AS BIGINT) AS total_freq,
       CAST(sum(lwf.lfreq * enc.nt) AS BIGINT) AS total_tokens,
       CAST(sum(lwf.lfreq * len(lwf.word)) AS BIGINT) AS total_chars,
       round(CAST(sum(lwf.lfreq * enc.nt) AS DOUBLE)
             / sum(lwf.lfreq * len(lwf.word)), 6) AS fertility,
       round(CAST(sum(lwf.lfreq * enc.nt) AS DOUBLE)
             / sum(lwf.lfreq), 6) AS tokens_per_word
FROM lwf JOIN enc USING (word)
GROUP BY lwf.lang
ORDER BY lwf.lang
"""
)


@query(
    "x30_bpe_fertility_by_lang",
    doc="per-language tokenizer fertility under the globally-learned BPE "
    "merges (the vocabulary-coverage / tokenizer-fairness meter a "
    "multilingual mixture is tuned against): encode once over the "
    "|vocab|-bounded word table, re-key by concat(syms) (= the original "
    "word), join per-(lang, word) frequencies — encoding cost never "
    "touches corpus bytes",
    oracle=_BPE_FERTILITY_ORACLE,
)
def x30_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.bpe.bpe_fertility_by(group=lang): x26's corpus-level
    compression broken out per language — the number that shows which
    languages the vocabulary under-serves."""
    from dataclod_spark.operators.bpe import bpe_fertility_by

    d = load(spark, sf_dir, "documents", spread=False)
    return bpe_fertility_by(d, "lang", "text", n_merges=_BPE_N, min_freq=2).orderBy(
        "lang"
    )
