"""Unit tests for the Gopher repetition stats (x20) and the trigram-LM
familiarity score (x21): hand-checked values, a python reference over
random docs, the blank/short-doc trigram regression, and a parity run of
the affected queries on a crafted corpus WITH blank documents (the sf
tables have none, which is exactly how the descending-sequence trigram
bug stayed latent)."""

from __future__ import annotations

import collections
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from dataclod_spark.functions.text import (
    char_trigrams,
    ngram_repetition_from,
    tokens,
    word_ngram_stream_from,
)


def _rep_reference(words: list[str], n: int) -> tuple[int, int]:
    """(top_cover, dup_cover) over space-joined word n-grams."""
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    counts = collections.Counter(grams)
    top = max((c * len(g) for g, c in counts.items()), default=0)
    dup = sum(c * len(g) for g, c in counts.items() if c > 1)
    return top, dup


def _stats(spark, texts: list[str], n: int) -> list[tuple[int, int]]:
    df = spark.createDataFrame(
        [Row(i=i, text=t) for i, t in enumerate(texts)]
    ).select("i", tokens(F.col("text")).alias("__toks"))
    out = df.select(
        "i", ngram_repetition_from(word_ngram_stream_from(F.col("__toks"), n)).alias("s")
    ).collect()
    return [(r.s.top_cover, r.s.dup_cover) for r in sorted(out, key=lambda r: r.i)]


def test_ngram_repetition_hand_checked(spark):
    got = _stats(spark, ["a b c a b", "x x x x x x", "a", "", "one two"], 2)
    # "a b c a b": 'a b'×2 (len 3) → top 6 dup 6; "x x"×5 → 15/15;
    # <2 tokens → 0/0; "one two": single gram len 7, count 1 → 7/0
    assert got == [(6, 6), (15, 15), (0, 0), (0, 0), (7, 0)]


def test_ngram_repetition_matches_python_reference(spark):
    # vocab includes multi-byte unicode and regex-special tokens: length()
    # counts codepoints on both engines, and gram construction must treat
    # tokens as opaque strings, never patterns
    rng = random.Random(11)
    vocab = ["a", "bb", "ccc", "dd", "e", "über", "漢字", "a.b*", "x'y"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for _ in range(60)
    ]
    for n in (2, 5):
        want = [_rep_reference(t.split() if t else [], n) for t in texts]
        # tokens('') is [''] (one empty token) — no n≥2 grams either way
        assert _stats(spark, texts, n) == want


def test_char_trigrams_blank_and_short(spark):
    """Regression: blank text pads to two spaces; sequence(1, 0) is the
    DESCENDING [1, 0] in Spark, which used to fabricate two '  ' trigrams
    where the DuckDB oracle's range(1, len-1) yields none."""
    df = spark.createDataFrame(
        [Row(i=1, text=""), Row(i=2, text="   "), Row(i=3, text="a"), Row(i=4, text="ab")]
    )
    got = {r.i: r.t for r in df.select("i", char_trigrams(F.col("text")).alias("t")).collect()}
    assert got[1] == [] and got[2] == []
    assert got[3] == [" a "]
    assert got[4] == [" ab", "ab "]


def test_x20_plan_has_no_explode(spark):
    """The 100 TB contract of x20: per-doc repetition never leaves its row
    — no Generate (explode) anywhere; the only exchanges are the final
    groupBy(source) + orderBy."""
    from dataclod_spark.registry import load_all_queries

    from conftest import SF_SMOKE

    df = load_all_queries()["x20_gopher_repetition"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" not in plan, plan


def test_blank_doc_corpus_parity(spark, tmp_path):
    """x8/x20/x21 stay oracle-green on a corpus that CONTAINS blank and
    single-word documents (the latent-trigram-bug shape)."""
    from dataclod_spark.registry import load_all_queries
    from dataclod_spark.testing import compare_query

    rng = random.Random(3)
    vocab = ["the", "sort", "table", "agg", "la", "et", "de"]
    rows = [
        Row(
            doc_id=i,
            text=" ".join(rng.choice(vocab) for _ in range(rng.choice([0, 0, 1, 2, 8, 40]))),
            lang=rng.choice(["en", "de", "fr"]),
            source=f"s{i % 3}",
            n_chars=0,
        )
        for i in range(80)
    ]
    # NULL text rows: md5/split/concat all null-propagate — both engines
    # must agree (the m4/sp4 oracles carry explicit NULL branches)
    rows += [
        Row(doc_id=100, text=None, lang="en", source="s0", n_chars=0),
        Row(doc_id=101, text=None, lang="fr", source="s1", n_chars=0),
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    # single parquet FILE (Spark's .write makes a directory, which the
    # DuckDB oracle view can't open as '<dir>/documents.parquet')
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r.doc_id for r in rows], pa.int64()),
                "text": [r.text for r in rows],
                "lang": [r.lang for r in rows],
                "source": [r.source for r in rows],
                "n_chars": pa.array([r.n_chars for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    reg = load_all_queries()
    for name in (
        "x8_langid_ngram",
        "x20_gopher_repetition",
        "x21_ngram_lm_score",
        "m4_media_resize",
        "sp4_token_budget_mixture",
    ):
        ok, detail = compare_query(spark, str(tmp_path), reg[name].fn, reg[name].oracle)
        assert ok, f"{name}: {detail}"
