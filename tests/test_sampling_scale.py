"""Scale-safety tests for the banded stratum samplers (round 8).

A ``Window.partitionBy(stratum)`` rank is a ONE-TASK sort of each stratum
(Spark pins window partitions to single tasks; AQE skew-split applies to
joins/rebalance only, never windows), so the samplers bracket each
stratum's selection boundary with a verified candidate band and window
ONLY the band rows.  These tests pin:

* exact equivalence with the full-sort semantics (randomized, incl. the
  forced-fallback path when the band is degenerate);
* boundedness: under a 90 %-one-stratum skew fixture the band — the only
  window input — stays ≪ the dominant stratum's size;
* the verification flags actually pass on realistic data (the fallback
  is belt-and-braces, not the common path).
"""

from __future__ import annotations

import math
import random
from collections import defaultdict

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from dataclod_spark.operators import sampling as SMP

_MOD = 2**32
_K = 2654435761


def _h(key: int) -> int:
    return (key * _K) % _MOD


def _mk_rows(seed: int, sizes: dict) -> list[Row]:
    """Unique non-negative keys, random token counts, per-stratum sizes."""
    rng = random.Random(seed)
    keys = rng.sample(range(10_000_000), sum(sizes.values()))
    rows, i = [], 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append(Row(doc_id=keys[i], lang=s, tok=rng.randrange(0, 200)))
            i += 1
    return rows


def _ref_first_by_hash(rows, quota_of) -> set:
    """Python full-sort reference: first quota rows per stratum in
    (knuth_hash, key) order."""
    groups = defaultdict(list)
    for r in rows:
        groups[r.lang].append(r)
    keep = set()
    for s, g in groups.items():
        g.sort(key=lambda r: (_h(r.doc_id), r.doc_id))
        keep |= {r.doc_id for r in g[: quota_of(s, len(g))]}
    return keep


def _ref_token_budget(rows, budgets) -> set:
    groups = defaultdict(list)
    for r in rows:
        groups[r.lang].append(r)
    keep = set()
    for s, g in groups.items():
        b = budgets.get(s, 0)
        g.sort(key=lambda r: (_h(r.doc_id), r.doc_id))
        before = 0
        for r in g:
            if before < b:
                keep.add(r.doc_id)
            before += max(r.tok, 0)
    return keep


@pytest.mark.parametrize("seed,rate", [(1, 20), (2, 1), (3, 50), (4, 100)])
def test_stratified_band_matches_full_sort(spark, seed, rate):
    rows = _mk_rows(seed, {"en": 700, "de": 60, "fr": 9, "zz": 1})
    df = spark.createDataFrame(rows)
    got = {
        r.doc_id
        for r in SMP.stratified_sample(df, "doc_id", "lang", rate)
        .select("doc_id")
        .collect()
    }
    want = _ref_first_by_hash(rows, lambda s, n: math.ceil(n * rate / 100))
    assert got == want


def test_rebalance_band_matches_full_sort(spark):
    rows = _mk_rows(7, {"en": 900, "de": 80, "fr": 17})
    df = spark.createDataFrame(rows)
    got = {
        r.doc_id
        for r in SMP.rebalance_to_min(df, "doc_id", "lang").select("doc_id").collect()
    }
    want = _ref_first_by_hash(rows, lambda s, n: 17)
    assert got == want
    # every stratum exactly min_n
    sizes = defaultdict(int)
    by_lang = {r.doc_id: r.lang for r in rows}
    for k in got:
        sizes[by_lang[k]] += 1
    assert sizes == {"en": 17, "de": 17, "fr": 17}


@pytest.mark.parametrize("seed", [11, 12])
def test_token_budget_band_matches_full_sort(spark, seed):
    rows = _mk_rows(seed, {"en": 600, "de": 50, "fr": 3})
    budgets = {"en": 5_000, "de": 900, "fr": 0}
    df = spark.createDataFrame(rows)
    got = {
        r.doc_id
        for r in SMP.token_budget_sample(
            df, "doc_id", "lang", F.col("tok"), budgets
        )
        .select("doc_id")
        .collect()
    }
    assert got == _ref_token_budget(rows, budgets)


def test_token_budget_band_zero_token_edge(spark):
    """Zero-token rows at the prefix edge: the strict pt_lo < b check
    keeps the 'running sum exactly at budget' row out, matching greedy."""
    rows = [Row(doc_id=i, lang="a", tok=t) for i, t in enumerate([50, 50, 0, 7])]
    df = spark.createDataFrame(rows)
    got = {
        r.doc_id
        for r in SMP.token_budget_sample(df, "doc_id", "lang", F.col("tok"), 100)
        .select("doc_id")
        .collect()
    }
    assert got == _ref_token_budget(rows, {"a": 100})


def test_dsir_select_band_matches_full_sort(spark):
    rng = random.Random(5)
    docs, wts = [], []
    for i in range(800):
        lang = "en" if i < 720 else "de"
        docs.append(Row(doc_id=i, lang=lang, text="x"))
        # duplicate weights on purpose: boundary ties break on doc_id
        wts.append(Row(doc_id=i, log_weight=float(rng.randrange(0, 200)) / 10.0))
    got = sorted(
        r.doc_id
        for r in SMP.dsir_select(
            spark.createDataFrame(docs), spark.createDataFrame(wts),
            stratum="lang", top_pct=25,
        )
        .select("doc_id")
        .collect()
    )
    by_lang = defaultdict(list)
    w_of = {w.doc_id: w.log_weight for w in wts}
    for d in docs:
        by_lang[d.lang].append(d.doc_id)
    want = []
    for s, ids in by_lang.items():
        ids.sort(key=lambda i: (-w_of[i], i))
        want += ids[: math.ceil(len(ids) * 25 / 100)]
    assert got == sorted(want)


def test_forced_fallback_still_exact(spark, monkeypatch):
    """Degenerate band (zero slack) makes verification fail for most
    strata — the per-stratum full-window fallback must keep results
    exact, so correctness never rests on the hash being uniform."""
    monkeypatch.setattr(SMP, "_SLACK_SIGMA", 0.0)
    monkeypatch.setattr(SMP, "_SLACK_ROWS", 0.0)
    rows = _mk_rows(21, {"en": 300, "de": 40})
    df = spark.createDataFrame(rows)
    got = {
        r.doc_id
        for r in SMP.stratified_sample(df, "doc_id", "lang", 20)
        .select("doc_id")
        .collect()
    }
    assert got == _ref_first_by_hash(rows, lambda s, n: math.ceil(n * 20 / 100))
    budgets = {"en": 2_000, "de": 700}
    got_t = {
        r.doc_id
        for r in SMP.token_budget_sample(df, "doc_id", "lang", F.col("tok"), budgets)
        .select("doc_id")
        .collect()
    }
    assert got_t == _ref_token_budget(rows, budgets)


def test_band_window_input_bounded_under_skew(spark):
    """The 100 TB story: 90 % of rows in one stratum, and the only rows
    a rank window ever sees (the band) stay a small fraction of that
    stratum — bounded by sigma·sqrt(q), not by the stratum size."""
    sizes = {"en": 18_000, "de": 1_000, "fr": 600, "es": 400}
    rows = _mk_rows(33, sizes)
    df = spark.createDataFrame(rows)
    quotas = (
        df.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__q", F.ceil(F.col("__n") * 20 / 100).cast("bigint"))
    )
    qt = SMP._quota_thresholds(quotas, "lang")
    h = SMP.row_hash(F.col("doc_id"))
    j = SMP._join_stratum(df, qt, "lang")
    band_sizes = {
        r.lang: r.n
        for r in j.filter((h >= F.col("__lo")) & (h < F.col("__hi")))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # verification passes for every stratum (no fallback window anywhere)
    chk = (
        j.groupBy("lang")
        .agg(
            F.count(F.when(h < F.col("__lo"), 1)).alias("c_lo"),
            F.count(F.when(h < F.col("__hi"), 1)).alias("c_hi"),
            F.first("__q").alias("q"),
        )
        .collect()
    )
    for r in chk:
        assert r.c_lo <= r.q <= r.c_hi, f"band missed boundary for {r.lang}"
    # dominant stratum: window input ≪ stratum size AND ≪ its own quota
    assert band_sizes["en"] < 0.1 * sizes["en"], band_sizes
    # and the result itself stays exact
    got = {
        r.doc_id
        for r in SMP.stratified_sample(df, "doc_id", "lang", 20)
        .select("doc_id")
        .collect()
    }
    assert got == _ref_first_by_hash(rows, lambda s, n: math.ceil(n * 20 / 100))


def test_x23_terciles_band_bounded_and_exact(spark):
    """The banded tercile assembler equals a literal per-lang ntile(3)
    reference on a skewed frame (ties included), and its band — the only
    window input — is ≪ the dominant stratum."""
    from dataclod_spark.queries.text import _bucket_terciles, _tercile_thresholds

    rng = random.Random(9)
    rows = []
    for i in range(12_000):
        lang = "en" if i < 10_800 else ("de" if i < 11_600 else "fr")
        # coarse grid of doubles → plenty of exact ties at tercile cuts
        fam = rng.randrange(0, 500) / 1000.0
        rows.append(Row(doc_id=i, lang=lang, n_grams=rng.randrange(1, 50), familiarity=fam))
    scored = spark.createDataFrame(rows).localCheckpoint(eager=True)

    got = _bucket_terciles(scored)
    w = Window.partitionBy("lang").orderBy(F.desc("familiarity"), F.asc("doc_id"))
    ref = (
        scored.select(
            "lang", "n_grams", "familiarity", F.ntile(3).over(w).alias("bkt")
        )
        .groupBy(
            "lang",
            F.when(F.col("bkt") == 1, "head")
            .when(F.col("bkt") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_grams").cast("bigint").alias("n_grams"),
            F.round(
                F.sum(F.col("familiarity").cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1)),
                8,
            ).alias("avg_familiarity"),
        )
        .orderBy("lang", "bucket")
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in ref.collect()]

    thr = _tercile_thresholds(scored)
    jt = SMP._join_stratum(scored, thr, "lang")
    fam = F.col("familiarity")
    in_band = ((fam >= F.col("__lo1")) & (fam <= F.col("__hi1"))) | (
        (fam >= F.col("__lo2")) & (fam <= F.col("__hi2"))
    )
    band_n = {
        r.lang: r.n
        for r in jt.filter(in_band).groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # the 500-value grid gives tie groups of ~n/500 ≈ 22 rows per value;
    # two bands of a few values each must stay far under the stratum
    assert band_n.get("en", 0) < 0.1 * 10_800, band_n
    # and every stratum verified (no full-window fallback fired)
    for r in thr.collect():
        assert r["__chi1"] <= r["__r1"] <= r["__clo1"]
        assert r["__chi2"] <= r["__r2"] <= r["__clo2"]


def test_weighted_sample_matches_reference_and_props(spark):
    """E-S weighted sampling: selected set equals the python reference
    (same u, same rounded ln score, doc_id tiebreak), excludes
    non-positive/NULL weights, and never returns duplicates."""
    import math as _math

    rows = [Row(doc_id=i, w=(i % 7) * 10 if i % 11 else 0) for i in range(500)]
    df = spark.createDataFrame(rows)
    got = [r.doc_id for r in SMP.weighted_sample(df, "doc_id", F.col("w"), 50).collect()]
    assert len(got) == len(set(got)) == 50

    def es_key(i, w):
        u = (_h(i) + 0.5) / _MOD
        # mirror round-half-up to 6 decimals on the ln score
        from decimal import ROUND_HALF_UP, Decimal

        return Decimal(_math.log(u) / w).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )

    cand = [(es_key(r.doc_id, r.w), -r.doc_id, r.doc_id) for r in rows if r.w > 0]
    cand.sort(reverse=True)
    want = [i for _, _, i in cand[:50]]
    assert got == want


def test_weighted_sample_plan_no_shuffle(spark):
    """Global top-k must plan as TakeOrderedAndProject — per-partition
    heaps, zero exchanges before the take."""
    rows = [Row(doc_id=i, w=i + 1) for i in range(100)]
    df = spark.createDataFrame(rows)
    plan = (
        SMP.weighted_sample(df, "doc_id", F.col("w"), 5)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_ngram_containment_directionality(spark):
    """A short doc quoted inside a long one: containment 1.0 in the
    contained->container direction, low the other way (the case Jaccard
    misses); equal docs contain each other both ways at 1.0."""
    from dataclod_spark.operators.dedup import ngram_containment_pairs

    quote = "the quick brown fox jumps over the lazy dog"
    rows = [
        Row(doc_id=1, text=quote),
        Row(
            doc_id=2,
            text="padding words one two three four five six seven eight "
            + quote
            + " nine ten eleven twelve thirteen fourteen fifteen sixteen",
        ),
        Row(doc_id=3, text=quote),
        Row(doc_id=4, text="entirely unrelated content about databases"),
    ]
    df = spark.createDataFrame(rows)
    out = {
        (r.contained_id, r.container_id): r.containment
        for r in ngram_containment_pairs(
            df, containment_threshold=0.9
        ).collect()
    }
    assert out[(1, 2)] == 1.0 and (2, 1) not in out
    assert out[(3, 2)] == 1.0
    assert out[(1, 3)] == 1.0 and out[(3, 1)] == 1.0
    assert not any(4 in p for p in out)


@pytest.mark.parametrize("seed", [3, 4])
def test_group_quantiles_exact_matches_reference(spark, seed):
    """Banded exact quantiles equal the sorted-multiset definition
    (value at ASC rank ceil(q*n)) on random data with heavy ties."""
    from dataclod_spark.operators.quantiles import group_quantiles_exact

    rng = random.Random(seed)
    rows = []
    for g, n in (("a", 3000), ("b", 200), ("c", 1), ("d", 2)):
        for i in range(n):
            # coarse value grid -> tie groups straddle quantile cuts
            rows.append(Row(grp=g, x=float(rng.randrange(0, 50))))
    rows.append(Row(grp="e", x=None))  # NULL-only group: excluded entirely
    df = spark.createDataFrame(rows, "grp string, x double")
    qs = [0.25, 0.5, 0.9, 1.0]
    got = {
        (r.grp, r.q): r.value
        for r in group_quantiles_exact(df, "grp", "x", qs).collect()
    }
    by_g = defaultdict(list)
    for r in rows:
        if r.x is not None:
            by_g[r.grp].append(r.x)
    want = {}
    for g, xs in by_g.items():
        xs.sort()
        for q in qs:
            want[(g, q)] = xs[max(1, math.ceil(q * len(xs))) - 1]
    assert got == want


def test_group_quantiles_fallback_exact(spark, monkeypatch):
    """Invert the band (negative slack → lo above hi, empty band, failed
    verification) so the per-group full-rank fallback MUST fire — and
    results stay exact."""
    import dataclod_spark.operators.quantiles as QT

    monkeypatch.setattr(QT, "_Q_SLACK", -0.2)
    rng = random.Random(11)
    rows = [Row(grp="a", x=float(rng.randrange(0, 5))) for _ in range(500)]
    df = spark.createDataFrame(rows)
    got = {
        (r.grp, r.q): r.value
        for r in QT.group_quantiles_exact(df, "grp", "x", [0.5]).collect()
    }
    xs = sorted(r.x for r in rows)
    assert got == {("a", 0.5): xs[math.ceil(0.5 * len(xs)) - 1]}


# ---------- round 9: stop-gram guard (groupBy+join, not a window) -----------


def _py_gram_sets(texts: dict, n: int = 3) -> dict:
    """Python reference: distinct lowercase word n-gram sets."""
    import re as _re

    out = {}
    for i, t in texts.items():
        ts = [w for w in _re.split(r"[^a-z0-9]+", t.lower()) if w]
        out[i] = {" ".join(ts[j : j + n]) for j in range(len(ts) - n + 1)}
    return out


def test_stop_gram_guard_semantics_match_reference(spark):
    """Guard-on results equal the definition: drop grams whose document
    frequency exceeds max_doc_freq, then score pairs on surviving grams
    (Jaccard denominator = full distinct-gram counts — the documented
    conservative lower bound)."""
    from dataclod_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved contact us for details"
    texts = {
        1: "alpha beta gamma delta epsilon " + boiler,
        2: "alpha beta gamma delta zeta " + boiler,
        3: "unrelated words entirely different content here " + boiler,
        4: "alpha beta gamma delta epsilon " + boiler,
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    gs = _py_gram_sets(texts)
    dfreq = defaultdict(int)
    for s in gs.values():
        for g in s:
            dfreq[g] += 1
    max_df = 3  # boilerplate grams (df=4) drop; content grams survive
    kept = {i: {g for g in s if dfreq[g] <= max_df} for i, s in gs.items()}
    want = {}
    ids = sorted(texts)
    for a in ids:
        for b in ids:
            if a < b and kept[a] & kept[b]:
                inter = len(kept[a] & kept[b])
                jac = inter / (len(gs[a]) + len(gs[b]) - inter)
                if jac >= 0.1:
                    want[(a, b)] = round(jac, 6)
    got = {
        (r.id_1, r.id_2): r.jaccard
        for r in ngram_jaccard_pairs(
            df, jaccard_threshold=0.1, max_doc_freq=max_df
        ).collect()
    }
    assert got == want
    # the guard actually bit: guard-off pairs 3 with everyone via boiler
    off = {
        (r.id_1, r.id_2)
        for r in ngram_jaccard_pairs(df, jaccard_threshold=0.1).collect()
    }
    assert any(3 in p for p in off) and not any(3 in p for p in got)


def test_containment_guard_marker_n_kept_grams(spark):
    """VERDICT r8 'what's wrong' #3: guard-on containment output carries
    n_kept_grams (the contained doc's surviving gram count) so a
    truncated score is distinguishable from a true one; guard-off keeps
    the original 3-column schema."""
    from dataclod_spark.operators.dedup import ngram_containment_pairs

    boiler = "all rights reserved contact us for details"
    texts = {
        1: "alpha beta gamma delta epsilon " + boiler,
        2: "alpha beta gamma delta epsilon zeta eta theta " + boiler,
        3: "totally different content about engines here " + boiler,
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    off = ngram_containment_pairs(df, containment_threshold=0.1)
    assert off.columns == ["contained_id", "container_id", "containment"]
    on = ngram_containment_pairs(
        df, containment_threshold=0.1, max_doc_freq=2
    )
    assert on.columns == [
        "contained_id", "container_id", "containment", "n_kept_grams",
    ]
    gs = _py_gram_sets(texts)
    dfreq = defaultdict(int)
    for s in gs.values():
        for g in s:
            dfreq[g] += 1
    kept = {i: {g for g in s if dfreq[g] <= 2} for i, s in gs.items()}
    rows = {r.contained_id: r for r in on.collect() if r.container_id == 2}
    r1 = rows[1]
    # marker equals the surviving gram count; denominator stays full
    assert r1.n_kept_grams == len(kept[1])
    assert r1.containment == round(len(kept[1] & kept[2]) / len(gs[1]), 6)
    assert r1.n_kept_grams < len(gs[1])  # visibly truncated


# ---------- round 9: NULL sample keys force the fallback window -------------


def test_stratified_sample_null_keys_take_fallback(spark):
    """ADVICE r8: a NULL key hashes to NULL, which satisfies neither band
    predicate — without the __c_null check such rows vanish from every
    branch.  The contract (full-sort semantics: NULL hashes rank FIRST)
    must hold: strata containing NULL keys fall back to the full window
    and keep their NULL-key rows at the head of the prefix."""
    rows = [Row(doc_id=None, grp="a"), Row(doc_id=None, grp="a")] + [
        Row(doc_id=i, grp="a") for i in range(1, 99)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = SMP.stratified_sample(df, key="doc_id", stratum="grp", rate_pct=50)
    got = out.collect()
    assert len(got) == 50  # exact quota: ceil(0.5 * 100)
    assert sum(1 for r in got if r.doc_id is None) == 2  # NULLs rank first
    # reference: full-window semantics over (hash NULLS FIRST, key)
    keep = sorted(
        (r.doc_id for r in rows),
        key=lambda k: (k is not None, _h(k) if k is not None else 0, k or 0),
    )[:50]
    norm = lambda xs: sorted(xs, key=lambda x: (x is not None, x or 0))
    assert norm(r.doc_id for r in got) == norm(keep)


def test_token_budget_sample_null_keys_take_fallback(spark):
    """Same NULL-key contract for the token-budget band path."""
    rows = [Row(doc_id=None, grp="a", tok=5)] + [
        Row(doc_id=i, grp="a", tok=5) for i in range(1, 60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, tok int")
    out = SMP.token_budget_sample(
        df, key="doc_id", stratum="grp", token_col=F.col("tok"), budgets=100
    )
    got = out.collect()
    # greedy fill: rows while tokens-before < 100 -> 20 docs of 5 tokens
    assert len(got) == 20
    assert any(r.doc_id is None for r in got)  # the NULL-hash row is first


# ---------- round 9: per-group percentile calibration ------------------------


def test_percentile_calibrate_matches_reference(spark):
    """cal_bucket = #{exact grid values <= score}: randomized check vs a
    Python reference over skewed groups with ties; NULL scores and
    all-NULL groups calibrate to NULL."""
    from dataclod_spark.operators.quantiles import percentile_calibrate

    rng = random.Random(9)
    rows = []
    for g, n in (("a", 997), ("b", 40), ("c", 1)):
        for i in range(n):
            rows.append(Row(grp=g, sc=float(rng.randrange(0, 25))))
    rows.append(Row(grp="a", sc=None))
    rows.append(Row(grp="z", sc=None))  # all-NULL group
    df = spark.createDataFrame(rows, "grp string, sc double")
    nb = 20
    got = percentile_calibrate(df, "grp", "sc", n_buckets=nb).collect()

    grids = {}
    by_g = defaultdict(list)
    for r in rows:
        if r.sc is not None:
            by_g[r.grp].append(r.sc)
    for g, xs in by_g.items():
        xs.sort()
        grids[g] = [xs[max(1, math.ceil((i / nb) * len(xs))) - 1] for i in range(1, nb + 1)]
    for r in got:
        if r.sc is None:
            assert r.cal_bucket is None and r.calibrated is None
        else:
            want = sum(1 for v in grids[r.grp] if v <= r.sc)
            assert r.cal_bucket == want, (r.grp, r.sc)
            assert r.calibrated == round(want / nb, 6)
    # monotone within group, max score hits 1.0
    amax = max(by_g["a"])
    assert all(r.calibrated == 1.0 for r in got if r.grp == "a" and r.sc == amax)


def test_percentile_calibrate_plan_broadcasts_grid(spark):
    """Assignment is a BROADCAST join of the bounded grid + array filter
    — never a per-row percent_rank window over the group (the grid
    computation's own band windows are bounded by construction)."""
    from dataclod_spark.operators.quantiles import percentile_calibrate

    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") % 97).cast("double").alias("sc"),
    )
    out = percentile_calibrate(df, "grp", "sc", n_buckets=10)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BroadcastHashJoin" in plan
    assert "percent_rank" not in plan


def test_row_hash_split_multiply_matches_decimal_form(spark):
    """r11: row_hash moved from DECIMAL(38,0) (1.1-1.3x slower in every
    sp-gate/st14 hot path — SCALE.md r11) to the split-multiply bigint
    form ((hi*K mod 2^16)*2^16 + lo*K) mod 2^32.  Prove bit-identity to
    the DECIMAL form AND the exact Python reference on the full bigint
    domain, edges included — no overflow, no sign leak."""
    import random as _random

    edges = [
        0, 1, -1, -7, 123, 65535, 65536, 2**31 - 1, 2**31, 2**32 - 1,
        2**32, 2**32 + 1, 3_470_000_000, 5_000_000_000, 2**48, 2**62,
        2**63 - 1, -(2**63), -(2**63) + 1, -5_000_000_000,
    ]
    rng = _random.Random(11)
    keys = edges + [rng.randrange(-(2**63), 2**63) for _ in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    dec = (
        F.pmod(F.col("k").cast("decimal(38,0)") * F.lit(_K), F.lit(_MOD))
        .cast("bigint")
        .alias("dec")
    )
    out = df.select(
        "k", SMP.row_hash(F.col("k")).alias("split"), dec
    ).collect()
    for r in out:
        want = (r.k * _K) % _MOD  # Python ints: exact, nonneg %
        assert r.split == want == r.dec, (r.k, r.split, r.dec, want)
