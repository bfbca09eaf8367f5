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
* **select** — rank pairs by (count desc, left, right) and take the
  maximal rank-order PREFIX (≤ ``batch_size``) whose pairs are pairwise
  symbol-disjoint — the distributed-BPE batching trick (a candidate that
  shares a symbol with an earlier selection ends the round, because the
  earlier merge may have changed its count);
* **merge** — greedy left-to-right non-overlapping rewrite of every
  word's symbol array applying ALL selected pairs in one pure JVM
  ``F.aggregate`` fold (no Python, no shuffle; a map literal keyed on
  ``left || '\\x00' || right`` routes each adjacency to its merged
  symbol).

Driver state is ``batch_size`` (left, right, freq) triples per round, so
the driver round-trip count is ~``n_merges / batch_size`` — one Spark
job plus one word-table localCheckpoint per ROUND, not per merge, which
is what lets training reach real tokenizer vocab sizes (30k–50k merges
at batch 256 is ~150 rounds, vs 30k sequential jobs).  ``batch_size=1``
is exactly classic sequential BPE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataclod_spark.functions.text import explode_nonnull, tokens

__all__ = [
    "batch_merge_sequence",
    "bpe_train",
    "bpe_encode_stats",
    "merge_pair_fold",
    "merge_pairs_fold",
    "replay_merges",
    "select_batch",
    "word_table",
]


def merge_pairs_fold(syms: Column, pairs: list[tuple[str, str]]) -> Column:
    """Greedy left-to-right merge of every adjacent occurrence of any
    pair in ``pairs`` — the BPE merge step for a whole symbol-disjoint
    batch as ONE index-ordered JVM fold.  Non-overlapping by
    construction: a merged symbol never re-matches as the LEFT side
    within the same round ('aaa' + (a,a) -> [aa, a]), and because batch
    members share no symbols, the single combined pass produces exactly
    the same arrays as applying each pair's own full greedy pass in rank
    order.  The lookup key is a (left, right) STRUCT — a delimited-string
    key would collide on symbols containing the delimiter (tokens() only
    collapses whitespace, so a literal NUL in input text survives into
    symbols: ('a','\\x00b') vs ('a\\x00','b'))."""
    if not pairs:
        return syms
    lut = F.create_map(
        *[
            lit
            for a, b in pairs
            for lit in (
                F.struct(F.lit(a).alias("l"), F.lit(b).alias("r")),
                F.lit(a + b),
            )
        ]
    )
    rest = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    init = F.slice(syms, 1, 1)

    def step(acc: Column, s: Column) -> Column:
        merged = F.element_at(
            lut, F.struct(F.element_at(acc, -1).alias("l"), s.alias("r"))
        )
        return F.when(
            merged.isNotNull(),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.when(F.size(syms) <= 1, syms).otherwise(
        F.aggregate(rest, init, step)
    )


def merge_pair_fold(syms: Column, a: str, b: str) -> Column:
    """Single-pair greedy merge fold (the ``batch_size=1`` case)."""
    return merge_pairs_fold(syms, [(a, b)])


def select_batch(
    candidates: list[tuple[str, str, int]], batch_size: int, min_freq: int
) -> list[tuple[str, str, int]]:
    """The round's merge selection: the maximal prefix (≤ ``batch_size``)
    of the ranked candidate list that is pairwise symbol-disjoint and
    above ``min_freq``.  Selection STOPS (rather than skips) at the first
    conflicting candidate: a pair sharing a symbol — including the
    just-created merged symbol — with an earlier selection may have had
    its true count changed by that merge, so honoring its round-start
    rank would diverge from sequential BPE.  Pure driver logic on a
    ≤ batch_size list; exposed for the Python-reference property tests."""
    selected: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for a, b, c in candidates[:batch_size]:
        if c < min_freq:
            break
        if a in used or b in used or (a + b) in used:
            break
        selected.append((a, b, c))
        used.update((a, b, a + b))
    return selected


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_freq: int = 2,
    batch_size: int = 1,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a document corpus.

    Returns ``(merge_rank, left_sym, right_sym, pair_freq)`` — one row
    per executed merge, in training order; stops early when the best
    remaining pair falls under ``min_freq`` (or no pairs remain).
    ``pair_freq`` is the pair's count at its ROUND start.

    ``batch_size=1`` (default) is classic sequential BPE: recount after
    every merge, argmax with lexicographic tie-breaks — the DuckDB oracle
    and the Python reference reproduce the sequence exactly.
    ``batch_size=m`` applies up to m symbol-disjoint merges per recount
    (see :func:`select_batch`); the result equals the sequential sequence
    whenever no newly-created pair (one involving a just-merged symbol)
    out-ranks a later batch member — newly-created pair counts are
    bounded by the triggering merge's count, so well-separated (Zipf-ish)
    pair distributions batch safely; the property tests pin both the
    exact batched semantics and prefix-agreement with sequential."""
    spark = df.sparkSession
    cur = word_table(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        m = min(batch_size, n_merges - len(merges))
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
        # explode_nonnull (struct elements, never null): the inferred
        # pre-filter would inline the adjacent-pair transform 2× per word
        # row on EVERY merge iteration
        top = (
            explode_nonnull(cur, ["freq"], prs, "pr")
            .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(m)
            .collect()
        )
        selected = select_batch(
            [(r["a"], r["b"], int(r["c"])) for r in top], m, min_freq
        )
        if not selected:
            # the first candidate can never conflict, so an empty
            # selection means no pair remains at/above min_freq on a
            # FRESH count — the sequential stopping condition
            break
        for a, b, c in selected:
            merges.append((len(merges) + 1, a, b, c))
        cur = cur.select(
            merge_pairs_fold(F.col("syms"), [(a, b) for a, b, _ in selected]).alias(
                "syms"
            ),
            "freq",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank int, left_sym string, right_sym string, pair_freq long"
    )


def word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(syms, freq)`` distinct-word frequency table — ONE corpus
    shuffle; every BPE round (train or encode) after this runs on the
    vocabulary, whose size is bounded by language, not corpus bytes (the
    GPT-2-style whitespace-pretokenized BPE contract that makes 100 TB
    tokenizer work affordable)."""
    w = F.col("__w")
    chars = F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, F.lit(1))
    )
    return (
        # explode_outer: the inferred pre-filter of a plain explode inlines
        # the tokenize chain 2×; the ``!= ''`` filter drops the null row
        df.select(F.explode_outer(tokens(F.col(text_col))).alias("__w"))
        .filter(w != "")
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(chars.alias("syms"), "freq")
    )


def batch_merge_sequence(
    merges: list[tuple[str, str]], batch_size: int
) -> list[list[tuple[str, str]]]:
    """Greedily split a FIXED learned merge sequence into consecutive
    symbol-disjoint batches (each ≤ ``batch_size``) — the encode-time
    twin of :func:`select_batch`.  A batch closes at the first pair that
    shares a symbol (including the merged product) with an earlier batch
    member, so within every batch :func:`merge_pairs_fold`'s one combined
    greedy pass equals applying each pair's own full greedy pass in
    sequence order — the same disjointness argument the trainer makes,
    minus the count-reordering concern (the sequence here is already
    fixed).  Pure driver logic on the learned (bounded) merge list."""
    batches: list[list[tuple[str, str]]] = []
    cur: list[tuple[str, str]] = []
    used: set[str] = set()
    for a, b in merges:
        if cur and (
            len(cur) >= batch_size or a in used or b in used or (a + b) in used
        ):
            batches.append(cur)
            cur, used = [], set()
        cur.append((a, b))
        used.update((a, b, a + b))
    if cur:
        batches.append(cur)
    return batches


def replay_merges(
    words: DataFrame, merges: list[tuple[str, str]], batch_size: int = 64
) -> DataFrame:
    """Apply a learned merge sequence to a ``(syms, freq)`` word table in
    training order, batching symbol-disjoint consecutive prefixes through
    :func:`merge_pairs_fold` — one Spark job + one localCheckpoint per
    BATCH, not per merge (the same round-trip economics as the trainer;
    replaying a production 30k-merge sequence is ~500 jobs at batch 64,
    not 30k sequential ones).  ``batch_size=1`` is the per-merge replay;
    the batched result is bit-identical because each batch is
    symbol-disjoint by construction.  Columns other than ``syms`` pass
    through unchanged."""
    cur = words
    others = [c for c in words.columns if c != "syms"]
    for batch in batch_merge_sequence(merges, batch_size):
        cur = cur.select(
            merge_pairs_fold(F.col("syms"), batch).alias("syms"), *others
        ).localCheckpoint(eager=True)
    return cur


def bpe_encode_stats(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_freq: int = 2,
    batch_size: int = 64,
) -> DataFrame:
    """The ENCODE half of the tokenizer: apply the learned merge sequence
    back to the vocabulary and report corpus tokenization stats — one row
    ``(n_words, total_freq, total_tokens, total_chars, vocab_size,
    compression)`` where ``total_tokens`` weights each word's final
    symbol count by its corpus frequency and ``compression`` is
    tokens/chars (the fertility a tokenizer-training loop watches).

    Because whitespace-pretokenized BPE encodes each distinct WORD
    independently, encoding the word table and weighting by ``freq`` is
    exactly corpus-level encoding at |vocab| cost — the per-document
    scan never re-runs the merge loop.  The learned sequence replays in
    training rank order through :func:`replay_merges` (symbol-disjoint
    consecutive batches, one job + one checkpoint per BATCH — the
    trainer's round-trip economics, not one job per merge), and the
    greedy JVM fold keeps the symbols bit-identical to sequential BPE
    (and to the DuckDB oracle's reduce() replay)."""
    merges = sorted(
        bpe_train(df, text_col, n_merges, min_freq).collect(),
        key=lambda r: r.merge_rank,
    )
    cur = replay_merges(
        word_table(df, text_col).localCheckpoint(eager=True),
        [(r.left_sym, r.right_sym) for r in merges],
        batch_size,
    )
    sym_len = F.aggregate(
        F.col("syms"), F.lit(0), lambda acc, s: acc + F.length(s)
    )
    stats = cur.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("freq").alias("total_freq"),
        F.sum(F.col("freq") * F.size("syms")).alias("total_tokens"),
        F.sum(F.col("freq") * sym_len).alias("total_chars"),
    )
    vocab = cur.select(F.explode("syms").alias("__s")).agg(
        F.countDistinct("__s").alias("vocab_size")
    )
    return stats.crossJoin(F.broadcast(vocab)).select(
        "n_words",
        "total_freq",
        "total_tokens",
        "total_chars",
        "vocab_size",
        F.round(
            F.col("total_tokens").cast("double") / F.col("total_chars"), 6
        ).alias("compression"),
    )


def bpe_fertility_by(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    n_merges: int = 8,
    min_freq: int = 2,
    batch_size: int = 64,
) -> DataFrame:
    """Per-group tokenizer FERTILITY under the learned BPE vocabulary —
    the vocabulary-coverage meter a multilingual mixture is tuned
    against: a language the merges never learned encodes near 1
    token/char (no compression), a well-covered one sits far below, and
    mixture weights / vocab budgets move on exactly this table (the
    XLM-R-style tokenizer-fairness diagnostic).

    The merge sequence trains GLOBALLY (same contract as the x24/x26
    gates) and replays ONCE over the |vocab|-bounded word table; the
    encoded row re-keys by ``concat(syms)`` — merges only ever join
    adjacent symbols, so the concatenation IS the original word — and
    joins the per-(group, word) frequency table.  Encoding cost stays
    |vocab|, never corpus bytes; the join is word-keyed (uniform); the
    rollup is one partial-aggregable hash agg per group.

    Returns per group: ``(group, n_words, total_freq, total_tokens,
    total_chars, fertility, tokens_per_word)`` with ``fertility`` =
    tokens/chars and ``tokens_per_word`` = tokens/occurrences, both
    frequency-weighted and rounded to 6 from exact integer sums."""
    merges = sorted(
        bpe_train(df, text_col, n_merges, min_freq).collect(),
        key=lambda r: r.merge_rank,
    )
    enc = replay_merges(
        word_table(df, text_col).localCheckpoint(eager=True),
        [(r.left_sym, r.right_sym) for r in merges],
        batch_size,
    ).select(
        F.concat_ws("", F.col("syms")).alias("__w"),
        F.size("syms").alias("__nt"),
    )
    lw = (
        # explode_outer: see word_freqs (inferred-filter duplication; the
        # ``!= ''`` filter drops the outer-emitted null row)
        df.select(
            F.col(group_col).alias("__grp"),
            F.explode_outer(tokens(F.col(text_col))).alias("__w"),
        )
        .filter(F.col("__w") != "")
        .groupBy("__grp", "__w")
        .agg(F.count(F.lit(1)).alias("__freq"))
    )
    return (
        lw.join(enc, "__w")
        .groupBy("__grp")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__freq").alias("total_freq"),
            F.sum(F.col("__freq") * F.col("__nt")).alias("total_tokens"),
            F.sum(F.col("__freq") * F.length("__w")).alias("total_chars"),
        )
        .select(
            F.col("__grp").alias(group_col),
            "n_words",
            "total_freq",
            "total_tokens",
            "total_chars",
            F.round(
                F.col("total_tokens").cast("double") / F.col("total_chars"), 6
            ).alias("fertility"),
            F.round(
                F.col("total_tokens").cast("double") / F.col("total_freq"), 6
            ).alias("tokens_per_word"),
        )
    )
