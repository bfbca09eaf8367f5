"""Deterministic sampling operators for large-scale pipeline curation.

Training-data pipelines sample constantly — per-source quotas, stratified
class balance, fixed-rate holdouts — and at 100 TB the sample must be (a)
computable with no driver state and (b) reproducible across reruns and
engines.  The quota/budget operators here key off a deterministic integer
hash of a row key (Knuth multiplicative hash — engine-portable exact BIGINT
arithmetic, standing in for ``xxhash64(seed, key)`` which DuckDB cannot
mirror), so the "random" order is a pure projection:

* :func:`hash_sample` — Bernoulli-style fixed-rate sample: keep rows whose
  hashed key lands in the accept window.  Zero shuffle, composes with any
  downstream plan, the sample is stable under repartitioning.
* :func:`stratified_sample` / :func:`rebalance_to_min` /
  :func:`token_budget_sample` — exact per-stratum quota / budget fills.

Scale note (the one that matters): a naive ``Window.partitionBy(stratum)``
rank is a ONE-TASK sort of each stratum — Spark pins a window partition to
a single task and AQE's skew mitigation splits only join/rebalance
partitions, never window partitions, so on a real crawl the dominant
language (~half the corpus) would serialize through one executor thread.
The operators here never window a whole stratum.  Instead each stratum's
selection boundary is bracketed by a narrow CANDIDATE BAND in hash (or
score) space, derived from one bounded aggregate; rows below the band are
kept by a pure filter, rows above are dropped by a pure filter, and only
the ~O(sqrt(quota)) band rows go through the exact rank window.  A second
bounded aggregate VERIFIES the band exactly (prefix counts/sums against
the quota); any stratum whose band misses the boundary — possible only if
the key hash is grossly non-uniform — falls back to the full-stratum
window for that stratum alone, so results are exact by construction, never
probabilistic.  See SCALE.md (round 8) for the measured skew fixture.

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

# Candidate-band sizing: sigmas of binomial slack + an absolute row floor
# (tiny strata band whole — the window there is trivially small anyway).
# Exactness never depends on these: the band is verified with exact counts
# and a failed verification falls back to the full-stratum window.
_SLACK_SIGMA = 8.0
_SLACK_ROWS = 64.0

# percentile_approx accuracy for score-ranked boundaries: Greenwald-Khanna
# guarantees rank error <= n/accuracy, so the value band around a requested
# quantile +- _PCT_SLACK is wider than the sketch's error by construction.
_PCT_ACC = 10000
_PCT_SLACK = 4.0 / _PCT_ACC


def row_hash(key: Column) -> Column:
    """Deterministic pseudo-random BIGINT in [0, 2^32) from an integer key.

    Split-multiply bigint form (r11): ``(key·K) mod 2³²`` computed in
    exact mod-2³² algebra over 16-bit halves — ``k = key mod 2³²``
    (pmod: negative keys land in [0, 2³²); plain ``%`` went negative,
    which made ``hash_sample`` keep negative-key rows at ANY rate and
    silently starved them in ``weighted_sample``), then with
    ``k = hi·2¹⁶ + lo``:

        (k·K) mod 2³² = ((hi·K mod 2¹⁶)·2¹⁶ + lo·K) mod 2³²

    Every intermediate is < 2⁴⁹, so nothing overflows bigint for ANY
    64-bit key (the r10 straight multiply ANSI-aborted above ~3.47e9 and
    its DECIMAL(38,0) fix cost 1.1–1.3× in every sp-gate/st14 hot path —
    measured r11, SCALE.md).  Bit-identical to the DECIMAL(38,0) form on
    the full bigint domain (property-tested incl. ±2⁶³ edges), so every
    oracle mirror moved in lockstep with no value change."""
    k = F.pmod(key.cast("bigint"), F.lit(_MOD))
    hi = F.shiftright(k, 16)
    lo = k.bitwiseAND(F.lit(0xFFFF))
    return (
        F.shiftleft((hi * F.lit(_KNUTH)).bitwiseAND(F.lit(0xFFFF)), 16)
        + lo * F.lit(_KNUTH)
    ).bitwiseAND(F.lit(0xFFFFFFFF))


def hash_sample(df: DataFrame, key: str, rate_pct: int) -> DataFrame:
    """Keep ~rate_pct% of rows: hash(key) mod 100 < rate_pct.  A pure
    filter projection — no shuffle, reproducible, partition-independent."""
    return df.filter(row_hash(F.col(key)) % 100 < rate_pct)


def _join_stratum(df: DataFrame, small: DataFrame, stratum: str) -> DataFrame:
    """Broadcast-join per-stratum constants onto ``df``, null-safely (a
    NULL stratum is one rank group, so it must be one join group too)."""
    s2 = small.withColumnRenamed(stratum, "__stratum")
    j = df.join(
        F.broadcast(s2), F.col(stratum).eqNullSafe(F.col("__stratum")), "left"
    )
    return j.drop("__stratum")


def _quota_thresholds(quotas: DataFrame, stratum: str) -> DataFrame:
    """Per-stratum candidate band ``[__lo, __hi)`` in hash space around the
    quota boundary.  ``quotas``: one row per stratum with ``__n`` (stratum
    size) and ``__q`` (row quota).  The boundary hash of an exact
    first-``__q`` take sits near ``(__q/__n)·2^32`` for a uniform hash;
    the band widens it by ``_SLACK_SIGMA`` binomial sigmas plus an
    absolute ``_SLACK_ROWS`` floor.  Exported for the scale tests."""
    nd = F.col("__n").cast("double")
    frac = F.least(F.col("__q").cast("double") / nd, F.lit(1.0))
    delta = (
        F.lit(_SLACK_SIGMA)
        * F.sqrt(F.greatest(frac * (F.lit(1.0) - frac), F.lit(0.0)) / nd)
        + F.lit(_SLACK_ROWS) / nd
    )
    lo = (
        F.floor(F.greatest(frac - delta, F.lit(0.0)) * F.lit(float(_MOD)))
        .cast("bigint")
    )
    # clamp the upper fraction BEFORE the bigint cast (ANSI overflow
    # safety when delta blows up on degenerate strata; >=1 means "band
    # reaches the top of hash space" anyway)
    hi = F.least(
        F.greatest(
            F.ceil(F.least(frac + delta, F.lit(1.0)) * F.lit(float(_MOD))).cast(
                "bigint"
            ),
            F.lit(0),
        ),
        F.lit(_MOD),
    )
    return quotas.select(stratum, "__q", lo.alias("__lo"), hi.alias("__hi"))


def _take_first_by_hash(
    df: DataFrame, key: str, stratum: str, quotas: DataFrame
) -> DataFrame:
    """Keep exactly the first ``__q`` rows of every stratum in
    ``(row_hash(key), key)`` order WITHOUT sorting whole strata.

    Plan shape: two bounded per-stratum aggregates (quota thresholds, then
    exact prefix counts under them — both |strata|-row results, broadcast
    back and lineage-truncated with a localCheckpoint), then a three-way
    union of pure filters: rows under ``__lo`` keep (their rank is
    provably <= quota), rows past ``__hi`` drop, and only the band rows in
    between take the exact rank window — O(sigma·sqrt(q)) rows per
    stratum.  Strata whose exact prefix counts show the band missed the
    boundary (grossly non-uniform hash) fall back to the full window for
    that stratum alone, so the result equals the full-sort semantics
    bit-for-bit in every case."""
    h = row_hash(F.col(key))
    qt = _quota_thresholds(quotas, stratum).localCheckpoint(eager=True)
    j = _join_stratum(df, qt, stratum)
    # __c_null: a NULL key hashes to NULL, which satisfies NEITHER band
    # predicate (h < lo and h >= lo are both NULL → filtered out), so a
    # stratum containing any NULL-hash row must take the fallback window
    # (which ranks NULLs first, per the full-sort contract) — otherwise
    # those rows would silently land in no branch at all.
    chk = (
        j.groupBy(stratum)
        .agg(
            F.count(F.when(h < F.col("__lo"), 1)).alias("__c_lo"),
            F.count(F.when(h < F.col("__hi"), 1)).alias("__c_hi"),
            F.count(F.when(h.isNull(), 1)).alias("__c_null"),
        )
        .localCheckpoint(eager=True)
    )
    j2 = _join_stratum(j, chk, stratum)
    ok = (
        (F.col("__c_lo") <= F.col("__q"))
        & (F.col("__c_hi") >= F.col("__q"))
        & (F.col("__c_null") == 0)
    )
    helpers = ["__q", "__lo", "__hi", "__c_lo", "__c_hi", "__c_null"]
    # NULLS FIRST is spelled out rather than inherited from Spark's ASC
    # default: DuckDB's ASC default is NULLS LAST, so any oracle-paired
    # query feeding NULL sample keys must pin NULLS FIRST in its SQL to
    # match this contract (ADVICE r9 — cross-engine NULL-ordering caveat)
    w = Window.partitionBy(stratum).orderBy(
        h.asc_nulls_first(), F.col(key).asc_nulls_first()
    )
    pre = j2.filter(ok & (h < F.col("__lo"))).drop(*helpers)
    band = (
        j2.filter(ok & (h >= F.col("__lo")) & (h < F.col("__hi")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__c_lo") + F.col("__rn") <= F.col("__q"))
        .drop("__rn", *helpers)
    )
    fb = (
        j2.filter(~ok)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__q"))
        .drop("__rn", *helpers)
    )
    return pre.unionByName(band).unionByName(fb)


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rate_pct: int
) -> DataFrame:
    """Exact per-stratum quota sample: within each ``stratum``, rank rows by
    ``hash(key)`` (ties broken by key — total order) and keep
    ``ceil(rate_pct% · n_stratum)`` rows.  The rank window sees only the
    verified boundary band, never a whole stratum — see
    :func:`_take_first_by_hash` for the plan shape."""
    quotas = (
        df.groupBy(stratum)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__q", F.ceil(F.col("__n") * rate_pct / 100).cast("bigint"))
    )
    return _take_first_by_hash(df, key, stratum, quotas)


def rebalance_to_min(df: DataFrame, key: str, stratum: str) -> DataFrame:
    """Downsample every stratum to the size of the SMALLEST stratum —
    the corpus-rebalancing pass a multilingual training mix runs so no
    language dominates.  Deterministic: within each stratum rows rank by
    ``hash(key)`` (ties by key) and the first ``min_n`` survive, so the
    result is stable across engines and repartitionings.

    The global ``min_n`` comes from one count-only aggregate over a
    column-pruned scan and folds into the per-stratum quota table; the
    dominant stratum's boundary is then bracketed and windowed band-only
    (:func:`_take_first_by_hash`) — the big stratum never sorts whole,
    which matters most here because rebalance-to-min quotas make the
    largest stratum's keep-fraction the SMALLEST."""
    counts = df.groupBy(stratum).agg(F.count(F.lit(1)).alias("__n"))
    min_n = counts.agg(F.min("__n").alias("__q"))
    quotas = counts.crossJoin(F.broadcast(min_n))
    return _take_first_by_hash(df, key, stratum, quotas)


def _budget_expr(stratum: str, budgets: int | dict) -> Column:
    """Per-stratum token budget as a column over ``stratum``: a closed
    ``{stratum: budget}`` mixture spec (unspecified strata get 0 — a
    mixture is a closed list) or one integer for every stratum."""
    if isinstance(budgets, dict):
        budget = F.lit(0).cast("bigint")
        for s, b in sorted(budgets.items(), key=lambda kv: (kv[0] is not None, kv[0])):
            # eqNullSafe, not ==: a None key (NULL stratum — in-contract
            # module-wide, and produced by temperature_budgets) compares
            # SQL NULL under ==, so the when-branch never fired and
            # NULL-stratum rows silently got the default 0 budget
            budget = F.when(
                F.col(stratum).eqNullSafe(F.lit(s)), F.lit(int(b)).cast("bigint")
            ).otherwise(budget)
        return budget
    return F.lit(int(budgets)).cast("bigint")


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

    Plan shape: one per-stratum token-stats aggregate sizes a candidate
    band around the budget boundary in hash space (the greedy-fill keep
    set is a PREFIX of the hash order, so a band bracketing the prefix
    end suffices); a second aggregate verifies it with exact prefix token
    sums; rows under the band keep by pure filter (their running sum is
    provably under budget), rows past it drop, and only band rows run the
    exact cumsum window.  Understrata whose band misses the boundary fall
    back to the full cumsum window for that stratum alone — exact in
    every case, and the dominant stratum never single-task-sorts."""
    tok = F.greatest(F.coalesce(token_col.cast("bigint"), F.lit(0)), F.lit(0))
    h = row_hash(F.col(key))
    stats = (
        df.groupBy(stratum)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(tok).alias("__s1"),
            F.sum(tok.cast("double") * tok.cast("double")).alias("__s2"),
            F.max(tok).alias("__mx"),
        )
        .withColumn("__b", _budget_expr(stratum, budgets))
    )
    s1d = F.col("__s1").cast("double")
    frac = F.when(
        F.col("__s1") <= 0,
        F.when(F.col("__b") > 0, F.lit(1.0)).otherwise(F.lit(0.0)),
    ).otherwise(
        F.greatest(F.least(F.col("__b").cast("double") / s1d, F.lit(1.0)), F.lit(0.0))
    )
    delta = F.when(F.col("__s1") <= 0, F.lit(0.0)).otherwise(
        (
            F.lit(_SLACK_SIGMA) * F.sqrt(F.greatest(frac * F.col("__s2"), F.lit(0.0)))
            + F.lit(_SLACK_ROWS) * (F.col("__mx").cast("double") + F.lit(1.0))
        )
        / s1d
    )
    lo = (
        F.floor(F.greatest(frac - delta, F.lit(0.0)) * F.lit(float(_MOD)))
        .cast("bigint")
    )
    hi = F.least(
        F.greatest(
            F.ceil(F.least(frac + delta, F.lit(1.0)) * F.lit(float(_MOD))).cast(
                "bigint"
            ),
            F.lit(0),
        ),
        F.lit(_MOD),
    )
    qt = stats.select(
        stratum, "__n", "__b", lo.alias("__lo"), hi.alias("__hi")
    ).localCheckpoint(eager=True)
    j = _join_stratum(df, qt, stratum)
    chk = (
        j.groupBy(stratum)
        .agg(
            F.count(F.when(h < F.col("__lo"), 1)).alias("__c_lo"),
            F.count(F.when(h < F.col("__hi"), 1)).alias("__c_hi"),
            F.sum(F.when(h < F.col("__lo"), tok).otherwise(F.lit(0))).alias("__pt_lo"),
            F.sum(F.when(h < F.col("__hi"), tok).otherwise(F.lit(0))).alias("__pt_hi"),
            F.count(F.when(h.isNull(), 1)).alias("__c_null"),
        )
        .localCheckpoint(eager=True)
    )
    j2 = _join_stratum(j, chk, stratum)
    # exact band verification: every prefix row's running sum stays under
    # budget (strict — a zero-token row at the prefix edge must still be
    # inside), and everything past the band is provably at/over budget.
    # A NULL key hashes to NULL, satisfying neither band predicate, so a
    # stratum with any NULL-hash row forces the fallback cumsum window
    # (NULLs rank first there, per the full-sort contract).
    ok = (
        ((F.col("__pt_lo") < F.col("__b")) | (F.col("__c_lo") == 0))
        & ((F.col("__pt_hi") >= F.col("__b")) | (F.col("__c_hi") == F.col("__n")))
        & (F.col("__c_null") == 0)
    )
    helpers = [
        "__n", "__b", "__lo", "__hi", "__c_lo", "__c_hi",
        "__pt_lo", "__pt_hi", "__c_null",
    ]
    w = (
        Window.partitionBy(stratum)
        .orderBy(h, F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = j2.filter(ok & (h < F.col("__lo"))).drop(*helpers)
    band = (
        j2.filter(ok & (h >= F.col("__lo")) & (h < F.col("__hi")))
        .withColumn("__bef", F.col("__pt_lo") + F.sum(tok).over(w) - tok)
        .filter(F.col("__bef") < F.col("__b"))
        .drop("__bef", *helpers)
    )
    fb = (
        j2.filter(~ok)
        .withColumn("__bef", F.sum(tok).over(w) - tok)
        .filter(F.col("__bef") < F.col("__b"))
        .drop("__bef", *helpers)
    )
    return pre.unionByName(band).unionByName(fb)


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
    weight = (
        (lambda n: math.sqrt(float(n)))
        if alpha == 0.5
        else (lambda n: float(n) ** alpha)
    )
    import math

    # NULL strata are in-contract module-wide (_join_stratum is
    # eqNullSafe); sorted() over a dict with a None key raises TypeError,
    # so order NULL first explicitly
    _skey = lambda x: (x is not None, x)
    den = 0.0
    ws = {}
    for s in sorted(totals, key=_skey):
        ws[s] = weight(totals[s])
        den += ws[s]
    if den == 0.0:
        return {s: 0 for s in totals}
    return {s: math.floor(total_budget * ws[s] / den) for s in sorted(totals, key=_skey)}


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
    stratum with :func:`token_budget_sample` (same band-bracketed plan;
    the budget derivation adds one |strata|-row aggregate)."""
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

    # explode_outer: the inferred pre-filter of a plain explode inlines the
    # tokenize chain 2× per source row (functions.text.explode_nonnull);
    # the existing ``__t != ''`` filter already drops the null row an
    # empty/null token array emits under the OUTER generate
    return df.select(
        "doc_id", *extra, F.explode_outer(tokens(F.col(text_col))).alias("__t")
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
    rule applied to a learned score instead of a hash).

    Plan shape: the quota boundary VALUE is bracketed per stratum with a
    ``percentile_approx`` band (Greenwald-Khanna rank error ≤ n/accuracy,
    band slack ``_PCT_SLACK`` > that), verified with exact conditional
    counts; rows scoring above the band keep by pure filter, below it
    drop, and only the band rows take the exact rank window — the
    dominant stratum never single-task-sorts.  A stratum whose band
    misses the boundary (including the degenerate case where the quota
    reaches into NULL scores) falls back to its full window, so the
    result is exact in every case.  Caveat: a massive tie mass AT the
    boundary value widens the band to the tie group — any exact rank
    must order those ties, there is no cheaper shape."""
    if not (0 < top_pct <= 100):
        raise ValueError(f"dsir_select: top_pct must be in (0, 100], got {top_pct}")
    j = df.join(weights.select("doc_id", "log_weight"), "doc_id")
    p = 1.0 - top_pct / 100.0
    plo = max(0.0, p - _PCT_SLACK)
    phi = min(1.0, p + _PCT_SLACK)
    stats = (
        j.groupBy(stratum)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.percentile_approx("log_weight", [plo, phi], _PCT_ACC).alias("__pa"),
        )
        .select(
            stratum,
            F.ceil(F.col("__n") * top_pct / 100).cast("bigint").alias("__q"),
            F.col("__pa")[0].alias("__vlo"),
            F.col("__pa")[1].alias("__vhi"),
        )
        .localCheckpoint(eager=True)
    )
    jq = _join_stratum(j, stats, stratum)
    lw = F.col("log_weight")
    chk = (
        jq.groupBy(stratum)
        .agg(
            F.count(F.when(lw > F.col("__vhi"), 1)).alias("__c_hi"),
            F.count(F.when(lw >= F.col("__vlo"), 1)).alias("__c_lo"),
        )
        .localCheckpoint(eager=True)
    )
    j2 = _join_stratum(jq, chk, stratum)
    ok = (F.col("__c_hi") <= F.col("__q")) & (F.col("__c_lo") >= F.col("__q"))
    helpers = ["__q", "__vlo", "__vhi", "__c_hi", "__c_lo"]
    w = Window.partitionBy(stratum).orderBy(lw.desc(), F.col("doc_id"))
    pre = j2.filter(ok & (lw > F.col("__vhi"))).drop(*helpers)
    band = (
        j2.filter(ok & (lw >= F.col("__vlo")) & (lw <= F.col("__vhi")))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__c_hi") + F.col("__rk") <= F.col("__q"))
        .drop("__rk", *helpers)
    )
    fb = (
        j2.filter(~ok)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.col("__q"))
        .drop("__rk", *helpers)
    )
    return pre.unionByName(band).unionByName(fb)


def weighted_sample(
    df: DataFrame, key: str, weight_col: Column, k: int
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row draws a uniform ``u`` from the Knuth hash of
    its key and competes with score ``u^(1/w)``; the ``k`` largest scores
    win, which realizes exactly the sequential weighted draw (heavier
    rows proportionally likelier, no duplicates).  The curation use is
    "sample documents proportional to token/byte mass" — a uniform doc
    sample under-represents long documents' share of the training mix.

    Engine parity: ``u = (hash + 0.5) / 2^32`` is exact in binary64 on
    any engine (half-integer over a power of two); the score compares in
    log space as ``ln(u)/w`` rounded to 6 decimals and fixed as
    DECIMAL(18,6) with the row key as tiebreak — the sp7 ln-ULP
    discipline, so the selected set is reproducible across engines.

    100 TB shape: a pure projection + global top-k
    (TakeOrderedAndProject: per-partition heaps, driver merges
    k·partitions rows) — ZERO shuffles, no window.  Rows with NULL or
    non-positive weight never sample (E-S requires w > 0).  The score
    column rides out as ``es_key`` for auditability."""
    u = (row_hash(F.col(key)).cast("double") + F.lit(0.5)) / F.lit(float(_MOD))
    es = F.round(F.log(u) / weight_col.cast("double"), 6).cast("decimal(18,6)")
    return (
        df.filter(weight_col.isNotNull() & (weight_col.cast("double") > 0))
        .withColumn("es_key", es)
        .orderBy(F.col("es_key").desc(), F.col(key))
        .limit(k)
    )


def source_drift(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-source distribution drift report: Jensen-Shannon divergence (in
    nats) between each source's hashed-unigram bucket profile and the REST
    of the corpus, add-one smoothed over ``n_buckets`` buckets — the
    corpus-monitoring op a pipeline runs per crawl refresh to flag a feed
    whose content distribution moved (spam influx, language flip, template
    change) before it pollutes the training mix.  JS rather than KL: it is
    symmetric, bounded by ln 2, and defined even where one side has zero
    mass (smoothing makes both sides strictly positive anyway).

    Engine parity: bucket profiles use the sp7 md5 bucket; counts-to-
    probability divisions are single correctly-rounded double ops
    (identical on any IEEE engine); the only libm call is ``ln``, so each
    bucket's JS term is rounded to 6 decimals and fixed as DECIMAL(18,6)
    before the per-source sum — order- and libm-independent (the sp7
    discipline).

    100 TB shape: ONE corpus scan feeding a (source × bucket)-keyed
    aggregate — uniform keys, partial-aggregable, output bounded by
    |sources|·n_buckets regardless of corpus size.  Everything after runs
    on that bounded table (two tiny rollups broadcast back onto the
    grid); no window, no driver state beyond plan constants.

    Split into :func:`source_bucket_counts` (the additive bounded state —
    counts merge by summation, which is what the streaming monitor
    accumulates across micro-batches) and :func:`drift_from_counts`
    (the pure finalizer over that bounded table).
    """
    return drift_from_counts(
        source_bucket_counts(df, text_col, group_col, n_buckets),
        group_col=group_col,
        n_buckets=n_buckets,
    )


def source_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n_buckets: int = 64,
) -> DataFrame:
    """The (``__g``, ``__b``, ``__c``) hashed-unigram bucket profile —
    one (source × bucket)-keyed count over a single corpus scan; the
    output is bounded at |sources|·n_buckets rows and ADDITIVE (profiles
    of disjoint corpus slices merge by summing ``__c``), which makes it
    the streaming monitor's bounded state."""
    from dataclod_spark.functions.text import tokens

    # explode_outer: see _dsir_tokens (inferred-filter duplication; the
    # ``__t != ''`` filter drops the outer-emitted null row)
    toks = df.select(
        F.col(group_col).alias("__g"),
        F.explode_outer(tokens(F.col(text_col))).alias("__t"),
    ).filter(F.col("__t") != "")
    return (
        toks.select("__g", _dsir_bucket(F.col("__t"), n_buckets).alias("__b"))
        .groupBy("__g", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def drift_from_counts(
    gb: DataFrame,
    group_col: str = "source",
    n_buckets: int = 64,
) -> DataFrame:
    """Finalize :func:`source_bucket_counts` state into the per-source JS
    report — pure arithmetic over the bounded profile table (see
    :func:`source_drift` for the parity discipline)."""
    tot_b = gb.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    tot_g = gb.groupBy("__g").agg(F.sum("__c").alias("__cg"))
    total = gb.agg(F.sum("__c").alias("__ct"))
    grid = tot_g.crossJoin(F.broadcast(tot_b)).crossJoin(F.broadcast(total))
    full = grid.join(gb, ["__g", "__b"], "left").withColumn(
        "__c", F.coalesce(F.col("__c"), F.lit(0))
    )
    kb = F.lit(n_buckets)
    p = (F.col("__c") + 1).cast("double") / (F.col("__cg") + kb).cast("double")
    q = (F.col("__cb") - F.col("__c") + 1).cast("double") / (
        F.col("__ct") - F.col("__cg") + kb
    ).cast("double")
    m = (p + q) / F.lit(2.0)
    term = (
        F.round((p * F.log(p / m) + q * F.log(q / m)) / F.lit(2.0), 6)
        .cast("decimal(18,6)")
    )
    return (
        full.groupBy("__g")
        .agg(
            F.max("__cg").cast("bigint").alias("n_tok"),
            F.sum(term).cast("double").alias("js_divergence"),
        )
        .select(F.col("__g").alias(group_col), "n_tok", "js_divergence")
    )


def mixture_epochs(
    df: DataFrame,
    stratum: str,
    token_col: Column,
    budgets: int | dict,
) -> DataFrame:
    """Data-constrained mixture planning (Muennighoff et al. 2023,
    arXiv:2305.16264): when a stratum's requested token budget exceeds
    its AVAILABLE unique tokens, the trainer repeats data — this report
    says how much.  Per stratum: available tokens, requested budget,
    ``epochs = ceil(budget/available)`` (how many passes over the
    stratum the budget implies) and ``repeated_tokens = max(budget −
    available, 0)`` (the mass trained on more than once — the paper's
    diminishing-returns axis).

    Engine parity: ``ceil(b/a)`` is computed as the INTEGER
    ``(b + a − 1) div a`` — no FP division, no boundary risk at exact
    multiples.  A stratum with zero available tokens gets NULL epochs
    (no number of passes reaches a positive budget).

    100 TB shape: one |strata|-row token aggregate over a column-pruned
    scan; everything else is arithmetic on that bounded table."""
    tok = F.greatest(F.coalesce(token_col.cast("bigint"), F.lit(0)), F.lit(0))
    avail = df.groupBy(stratum).agg(F.sum(tok).alias("available_tokens"))
    a = F.col("available_tokens")
    return (
        avail.withColumn("budget", _budget_expr(stratum, budgets))
        .select(
            stratum,
            "available_tokens",
            "budget",
            F.when(F.col("budget") <= 0, F.lit(0))
            .when(
                a > 0,
                F.expr("(budget + available_tokens - 1) div available_tokens"),
            )
            .cast("bigint")
            .alias("epochs"),
            F.greatest(F.col("budget") - a, F.lit(0))
            .cast("bigint")
            .alias("repeated_tokens"),
        )
    )
