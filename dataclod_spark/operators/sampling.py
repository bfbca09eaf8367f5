"""Deterministic sampling operators for large-scale pipeline curation.

Training-data pipelines sample constantly — per-source quotas, stratified
class balance, fixed-rate holdouts — and at 100 TB the sample must be (a)
computable in one pass with no driver state and (b) reproducible across
reruns and engines.  Both operators here key off a deterministic integer
hash of a row key (Knuth multiplicative hash — engine-portable exact BIGINT
arithmetic, standing in for ``xxhash64(seed, key)`` which DuckDB cannot
mirror), so the "random" order is a pure projection:

* :func:`hash_sample` — Bernoulli-style fixed-rate sample: keep rows whose
  hashed key lands in the accept window.  Zero shuffle, composes with any
  downstream plan, the sample is stable under repartitioning.
* :func:`stratified_sample` — exact per-stratum quota (``ceil(rate·n)``):
  rank rows within each stratum by hashed key and keep the first quota.
  One shuffle (the window partition); at 100 TB the stratum key is the
  partition key, so skewed strata parallelize via AQE skew-split.

Reference parity: the reference engine has no sampling surface beyond SQL
``USING SAMPLE`` delegation; these are extension operators (SURVEY §2
LLM-pipeline tier), kept deterministic the same way the reference seeds its
spatial-join sampling (``option.rs:102-103``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth 32-bit multiplicative hash constants — exact in BIGINT on any engine
_KNUTH = 2654435761
_MOD = 4294967296


def row_hash(key: Column) -> Column:
    """Deterministic pseudo-random BIGINT in [0, 2^32) from an integer key."""
    return (key.cast("bigint") * F.lit(_KNUTH)) % F.lit(_MOD)


def hash_sample(df: DataFrame, key: str, rate_pct: int) -> DataFrame:
    """Keep ~rate_pct% of rows: hash(key) mod 100 < rate_pct.  A pure
    filter projection — no shuffle, reproducible, partition-independent."""
    return df.filter(row_hash(F.col(key)) % 100 < rate_pct)


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rate_pct: int
) -> DataFrame:
    """Exact per-stratum quota sample: within each ``stratum``, rank rows by
    ``hash(key)`` (ties broken by key — total order) and keep
    ``ceil(rate_pct% · n_stratum)`` rows."""
    w = Window.partitionBy(stratum).orderBy(row_hash(F.col(key)), F.col(key))
    n = Window.partitionBy(stratum)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(n))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * rate_pct / 100))
        .drop("__rn", "__n")
    )


def rebalance_to_min(df: DataFrame, key: str, stratum: str) -> DataFrame:
    """Downsample every stratum to the size of the SMALLEST stratum —
    the corpus-rebalancing pass a multilingual training mix runs so no
    language dominates.  Deterministic: within each stratum rows rank by
    ``hash(key)`` (ties by key) and the first ``min_n`` survive, so the
    result is stable across engines and repartitionings.

    Plan shape: ONE window shuffle on the stratum key for the ranking;
    the global ``min_n`` comes from a separate count-only aggregate over
    a column-pruned scan (not from the ranked branch — deriving it there
    would re-run the window sort, SCALE.md pitfall #6) and folds in as a
    1-row broadcast crossJoin, no driver action."""
    w = Window.partitionBy(stratum).orderBy(row_hash(F.col(key)), F.col(key))
    ranked = df.withColumn("__rn", F.row_number().over(w))
    min_n = (
        df.groupBy(stratum)
        .agg(F.count(F.lit(1)).alias("__sn"))
        .agg(F.min("__sn").alias("__min_n"))
    )
    return (
        ranked.crossJoin(F.broadcast(min_n))
        .filter(F.col("__rn") <= F.col("__min_n"))
        .drop("__rn", "__min_n")
    )


def token_budget_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    token_col: Column,
    budgets: int | dict,
) -> DataFrame:
    """Sample each stratum up to a TOKEN budget — the LM data-mixture op
    proper (a training mix is specified in tokens per source/language,
    not document counts, because document length varies wildly across
    strata; sp1/sp3 are the doc-count variants).

    Within each stratum rows rank by ``hash(key)`` (ties by key — total
    order), and a row survives while the tokens BEFORE it are inside the
    stratum's budget — greedy fill: the boundary document is included, so
    every non-empty stratum with a positive budget contributes at least
    one document and reaches its target (a ≤-budget rule would silently
    undershoot and can starve a stratum whose first document alone
    exceeds the budget).

    ``budgets``: one int for every stratum, or a ``{stratum: budget}``
    mixture spec — the spec is exhaustive, unspecified strata contribute
    NOTHING (a mixture is a closed list; silently passing unknown strata
    through would change the mix).  Null/negative token counts count 0.

    ``key`` must be unique per row (a doc id): the cumsum window is
    pinned to a ROWS frame (Spark's default is RANGE, under which rows
    tied on the sort key SHARE an inclusive sum — two same-key docs at
    the budget edge would both see each other's tokens and both drop,
    starving the stratum), and with a ROWS frame duplicate keys would
    make the tie order, hence the sample, partition-dependent.

    Plan shape: ONE window shuffle on the stratum key (cumsum, same
    ranking window as the quota samplers), codegen arithmetic after it —
    no driver state, reproducible across engines and repartitionings.
    """
    tok = F.greatest(F.coalesce(token_col.cast("bigint"), F.lit(0)), F.lit(0))
    if isinstance(budgets, dict):
        budget = F.lit(0).cast("bigint")
        for s, b in sorted(budgets.items()):
            budget = F.when(F.col(stratum) == s, F.lit(int(b)).cast("bigint")).otherwise(budget)
    else:
        budget = F.lit(int(budgets)).cast("bigint")
    w = (
        Window.partitionBy(stratum)
        .orderBy(row_hash(F.col(key)), F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum(tok).over(w) - tok
    return (
        df.withColumn("__before", before)
        .filter(F.col("__before") < budget)
        .drop("__before")
    )


def temperature_budgets(
    df: DataFrame,
    stratum: str,
    token_col: Column,
    total_budget: int,
    alpha: float = 0.5,
) -> dict:
    """Per-stratum token budgets under temperature-scaled (α-smoothed)
    mixture weighting — the multilingual sampling scheme of mBERT/XLM-R
    (Conneau et al. 2020 §3.1): w_i = n_i^α / Σ_j n_j^α over corpus token
    counts, b_i = floor(B · w_i).  α=1 reproduces natural proportions;
    α→0 flattens toward uniform, up-sampling low-resource strata.

    The per-stratum totals aggregate is one partial+final pass and the
    result is |strata| rows (sources/languages — bounded), so the weight
    math runs driver-side in plain IEEE doubles with a DEFINED order
    (strata sorted by name, left-to-right fold) — bit-reproducible in the
    SQL oracle via ``list_sum(list(w ORDER BY stratum))``.  α=0.5 uses
    ``math.sqrt`` (correctly rounded, engine-identical); other α use
    ``pow`` (last-ulp identical on one host's libm, the usual caveat).
    """
    tok = F.greatest(F.coalesce(token_col.cast("bigint"), F.lit(0)), F.lit(0))
    totals = {
        r["__s"]: r["__n"]
        for r in df.groupBy(F.col(stratum).alias("__s"))
        .agg(F.sum(tok).alias("__n"))
        .collect()
    }
    import math

    weight = (
        (lambda n: math.sqrt(float(n)))
        if alpha == 0.5
        else (lambda n: float(n) ** alpha)
    )
    den = 0.0
    ws = {}
    for s in sorted(totals):
        ws[s] = weight(totals[s])
        den += ws[s]
    if den == 0.0:
        return {s: 0 for s in totals}
    return {s: math.floor(total_budget * ws[s] / den) for s in sorted(totals)}


def temperature_mixture(
    df: DataFrame,
    key: str,
    stratum: str,
    token_col: Column,
    total_budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture sampling: derive per-stratum token
    budgets with :func:`temperature_budgets`, then greedy-fill each
    stratum with :func:`token_budget_sample` (same one-window-shuffle
    plan; the budget derivation adds one |strata|-row aggregate)."""
    budgets = temperature_budgets(df, stratum, token_col, total_budget, alpha)
    return token_budget_sample(df, key, stratum, token_col, budgets)


def hash_split(df: DataFrame, key: str, splits: dict) -> DataFrame:
    """Deterministic disjoint dataset split — the train/val/test manifest:
    ``splits`` maps split name → integer percent (in declaration order;
    must sum to ≤ 100), and a row lands in the split whose cumulative
    band contains ``hash(key) % 100``.  Adds a ``split`` column (NULL for
    the remainder when the bands sum under 100 — a holdout you haven't
    allocated yet).

    Pure zero-shuffle projection on the same Knuth hash as
    :func:`hash_sample`, so splits are reproducible across engines, runs
    and repartitionings, disjoint by construction (bands cannot overlap),
    and STABLE under corpus growth: a document's split never changes when
    other documents are added/removed — the property that keeps val/test
    uncontaminated across crawl refreshes.

    The bucket is ``pmod(hash, 100)`` (non-negative even for negative
    keys) and the key column must be an integral type with no NULLs
    (non-integral types raise here; a NULL key raises at execution) —
    together these guarantee that when the bands sum to exactly 100 the
    manifest is a DISJOINT FULL assignment: an unassigned (NULL-split)
    row can only come from bands summing under 100.
    """
    total = 0
    for name, pct in splits.items():
        if pct < 0:
            raise ValueError(f"hash_split: negative percent for {name!r}")
        total += pct
    if total > 100:
        raise ValueError(f"hash_split: split percents sum to {total} > 100")
    ktype = dict(df.dtypes).get(key)
    if ktype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"hash_split: key column {key!r} must be integral, got {ktype}"
        )
    bucket = F.pmod(row_hash(F.col(key)), F.lit(100))
    bucket = F.when(
        F.col(key).isNull(),
        F.raise_error(F.lit(f"hash_split: NULL key in column {key!r}")),
    ).otherwise(bucket)
    expr = F.lit(None).cast("string")
    lo = 0
    conds = []
    for name, pct in splits.items():
        conds.append((name, lo, lo + pct))
        lo += pct
    for name, a, b in reversed(conds):
        expr = F.when((bucket >= a) & (bucket < b), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def dsir_weights(
    df: DataFrame,
    text_col: str = "text",
    target: Column | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every document by how much more likely its hashed-unigram
    profile is under a TARGET distribution than under the raw corpus —
    the data-selection step that reweights a web crawl toward a
    high-quality / in-domain reference before sampling.

    ``target`` is a boolean Column marking the target-domain rows (the
    paper's reference corpus; here typically a language or quality
    slice of the same table).  Returns ``(doc_id, n_tok, log_weight)``
    where ``log_weight = Σ_tokens ln(p_target(bucket)/p_raw(bucket))``
    under add-one smoothing over ``n_buckets`` hashed-token buckets.

    Engine-parity note: Spark's and DuckDB's ``ln`` differ in the last
    ulp on ~1% of inputs (measured), so the per-BUCKET weight is rounded
    to 6 decimals and fixed as DECIMAL(18,6) before the per-document
    sum — which is then integer-exact decimal arithmetic, immune to both
    summation order and libm drift (the dsum discipline applied to log
    space).

    100 TB shape: two corpus-scan aggregates (token→bucket counts, then
    doc×bucket counts — both uniform hash keys), one ``n_buckets``-row
    weight table broadcast back, and a per-doc rollup.  Driver state is
    zero; the bucket table is bounded by construction.  Mirrors the
    paper's own scaling story (hashed n-grams exist precisely so the
    profile is a fixed-width vector regardless of corpus size)."""
    wtab = dsir_bucket_weights(df, text_col, target, n_buckets)
    return dsir_score(df, wtab, text_col, n_buckets)


def _dsir_bucket(tok: Column, n_buckets: int) -> Column:
    """Hashed-token bucket: md5-hex-slice → BIGINT → mod (engine-portable
    exact arithmetic, the d2/x-family hash discipline)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint")
        % F.lit(n_buckets)
    )


def _dsir_tokens(df: DataFrame, text_col: str, extra: list[Column]) -> DataFrame:
    from dataclod_spark.functions.text import tokens

    return df.select(
        "doc_id", *extra, F.explode(tokens(F.col(text_col))).alias("__t")
    ).filter(F.col("__t") != "")


def dsir_bucket_weights(
    df: DataFrame,
    text_col: str = "text",
    target: Column | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """Train the DSIR weight table: ``(__b, __w)`` with one row per hash
    bucket, ``__w = round(ln(p_target(b)/p_raw(b)), 6)`` as
    DECIMAL(18,6).  One corpus-scan aggregate + a 1-row totals
    cross-join; the output is ``n_buckets`` rows — the fixed-width model
    a streaming scorer holds static while micro-batches arrive."""
    if target is None:
        target = F.col("lang") == "en"
    toks = _dsir_tokens(df, text_col, [target.alias("__is_t")])
    tb = (
        toks.select(_dsir_bucket(F.col("__t"), n_buckets).alias("__b"), "__is_t")
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).alias("__n_r"),
            F.count(F.when(F.col("__is_t"), F.lit(1))).alias("__n_t"),
        )
    )
    tot = tb.agg(F.sum("__n_r").alias("__tr"), F.sum("__n_t").alias("__tt"))
    ln = lambda c: F.log(c.cast("double"))  # noqa: E731
    return tb.crossJoin(F.broadcast(tot)).select(
        "__b",
        F.round(
            ln(F.col("__n_t") + 1)
            - ln(F.col("__tt") + n_buckets)
            - ln(F.col("__n_r") + 1)
            + ln(F.col("__tr") + n_buckets),
            6,
        )
        .cast("decimal(18,6)")
        .alias("__w"),
    )


def dsir_score(
    df: DataFrame,
    wtab: DataFrame,
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Score documents against a trained DSIR weight table:
    ``(doc_id, n_tok, log_weight)``.  One doc×bucket aggregate + the
    broadcast weight join + a decimal-exact doc rollup; a bucket absent
    from ``wtab`` (possible when scoring NEW text against an old table)
    contributes weight 0 — the smoothed prior's neutral element."""
    toks = _dsir_tokens(df, text_col, [])
    db = (
        toks.select("doc_id", _dsir_bucket(F.col("__t"), n_buckets).alias("__b"))
        .groupBy("doc_id", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = F.coalesce(F.col("__w"), F.lit(0).cast("decimal(18,6)"))
    return (
        db.join(F.broadcast(wtab), "__b", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("__c").alias("n_tok"),
            F.sum(F.col("__c") * w).cast("double").alias("log_weight"),
        )
        .select("doc_id", "n_tok", "log_weight")
    )


def dsir_select(
    df: DataFrame,
    weights: DataFrame,
    stratum: str = "lang",
    top_pct: int = 25,
) -> DataFrame:
    """DSIR selection: keep the top ``top_pct`` percent of documents BY
    importance weight WITHIN each stratum — the step after
    :func:`dsir_weights` in the paper's pipeline, stratified so one
    in-domain-looking slice cannot crowd out every other language/source
    (the known failure mode of global top-N selection).

    Deterministic: rank by ``(log_weight DESC, doc_id)`` inside each
    stratum, keep ``ceil(top_pct% · n)`` (the stratified_sample quota
    rule applied to a learned score instead of a hash).  One window
    shuffle on the stratum key; skewed strata parallelize via AQE
    skew-split, same as stratified_sample."""
    if not (0 < top_pct <= 100):
        raise ValueError(f"dsir_select: top_pct must be in (0, 100], got {top_pct}")
    j = df.join(weights.select("doc_id", "log_weight"), "doc_id")
    w = Window.partitionBy(stratum).orderBy(
        F.col("log_weight").desc(), F.col("doc_id")
    )
    n = Window.partitionBy(stratum)
    return (
        j.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(n))
        .filter(F.col("__rk") <= F.ceil(F.col("__n") * top_pct / 100))
        .drop("__rk", "__n")
    )
