"""BPE vocabulary induction — the tokenizer-training stage of an LLM data
pipeline (Sennrich et al. 2016: iteratively merge the most frequent
adjacent symbol pair).

The scalable formulation trains on the DISTINCT-WORD frequency table, not
the corpus: one corpus-sized tokenize+count shuffle up front, then every
merge round runs over |vocab| rows (bounded by the language, not the
corpus — the classic trick that makes BPE training tractable at any
scale).  Each round is:

* **pair count** — explode adjacent symbol pairs per word, weighted by
  word frequency; one partial+final aggregate over the word table;
* **argmax** — highest count, ties broken lexicographically on
  (left, right) so the merge sequence is fully deterministic (the DuckDB
  oracle and the Python reference reproduce it exactly);
* **merge** — greedy left-to-right non-overlapping rewrite of every
  word's symbol array as a pure JVM ``F.aggregate`` fold (no Python, no
  shuffle; the fold's accumulator is the rebuilt array).

Driver state is one (left, right, freq) triple per round — bounded by
``n_merges``.  The word table is localCheckpoint-ed per round (it is
small; the checkpoint truncates the per-round lineage like the
connected-components loop does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataclod_spark.functions.text import tokens

__all__ = ["bpe_train", "merge_pair_fold"]


def merge_pair_fold(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of every adjacent (a, b) occurrence in a
    symbol array — the BPE merge step as one index-ordered JVM fold.
    Non-overlapping by construction: a merged symbol never re-matches as
    the LEFT side within the same round ('aaa' + (a,a) -> [aa, a])."""
    rest = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    init = F.slice(syms, 1, 1)
    return F.when(F.size(syms) <= 1, syms).otherwise(
        F.aggregate(
            rest,
            init,
            lambda acc, s: F.when(
                (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_freq: int = 2,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a document corpus.

    Returns ``(merge_rank, left_sym, right_sym, pair_freq)`` — one row
    per executed merge, in training order; stops early when the best
    remaining pair falls under ``min_freq`` (or no pairs remain)."""
    spark = df.sparkSession
    w = F.col("__w")
    chars = F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, F.lit(1))
    )
    cur = (
        df.select(F.explode(tokens(F.col(text_col))).alias("__w"))
        .filter(w != "")
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(chars.alias("syms"), "freq")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        idx = F.when(
            F.size("syms") >= 2, F.sequence(F.lit(1), F.size("syms") - 1)
        ).otherwise(F.array().cast("array<int>"))
        prs = F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("a"),
                F.element_at(F.col("syms"), i + 1).alias("b"),
            ),
        )
        top = (
            cur.select(F.explode(prs).alias("pr"), "freq")
            .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_freq:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append((r + 1, a, b, c))
        cur = cur.select(
            merge_pair_fold(F.col("syms"), a, b).alias("syms"), "freq"
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank int, left_sym string, right_sym string, pair_freq long"
    )
