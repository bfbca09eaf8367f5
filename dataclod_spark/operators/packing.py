"""Sequence packing — concat-and-chunk documents into fixed training
context windows (large-scale training-data pipeline operator; driver
north-star, beyond the reference's own surface).

The standard LM pretraining batch-prep step: order documents
deterministically, concatenate their token streams, and cut the stream
into ``ctx_len``-token sequences.  A document is assigned to the sequence
where its first token lands; a document whose token span crosses a
sequence boundary "straddles" (its loss is split across two training
rows — pipelines track this as packing waste).

Spark-first design: one window cumsum per (group, shard) — a single
narrow shuffle — and pure-codegen arithmetic after it.  The shard column
caps window-partition size: a 100 TB corpus with a handful of sources
would otherwise serialize each source through one task (SCALE.md skew
pitfall); ``doc_id % n_shards`` keeps determinism AND an exact DuckDB
oracle (unlike xxhash64, modulo is engine-portable).  Each shard packs
its own token stream independently — at cluster scale that is exactly
how packing is sharded in practice (per input file / worker), since a
globally contiguous stream would force a total order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CTX_LEN = 64
DEFAULT_N_SHARDS = 8


def pack_contiguous(
    df: DataFrame,
    token_col: Column | str,
    id_col: str = "doc_id",
    group_col: str = "source",
    ctx_len: int = DEFAULT_CTX_LEN,
    n_shards: int = DEFAULT_N_SHARDS,
) -> DataFrame:
    """Per-document packing assignment.

    Adds ``n_tok`` (the evaluated token count), ``shard``
    (``id % n_shards``), ``seq_id`` (0-based sequence index within the
    (group, shard) token stream), ``start_offset`` (token offset of the
    document's first token inside its sequence) and ``straddles``
    (document's tokens cross a sequence boundary).

    One shuffle: the cumsum window on (group, shard) ordered by id.
    Empty documents (0 tokens) start at the running position and never
    straddle.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    # null token counts would poison the running sum downstream of their
    # position — treat missing as 0 tokens (document contributes nothing)
    out = df.withColumn("n_tok", F.coalesce(tok.cast("bigint"), F.lit(0))).withColumn(
        "shard", F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    )
    # ROWS frame pinned: Spark's default RANGE frame gives rows tied on
    # id_col a SHARED inclusive sum (the oracle spells ROWS UNBOUNDED
    # PRECEDING); ids are unique in practice, but the frames must agree
    # by construction, not by data shape
    w = (
        Window.partitionBy(group_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tok").over(w)          # inclusive running token count
    out = out.withColumn("__start", cum - F.col("n_tok"))
    return (
        out.withColumn("seq_id", F.floor(F.col("__start") / ctx_len))
        .withColumn("start_offset", F.col("__start") % ctx_len)
        .withColumn(
            "straddles",
            (F.col("n_tok") > 0)
            & (F.floor((F.col("__start") + F.col("n_tok") - 1) / ctx_len) != F.col("seq_id")),
        )
        .drop("__start")
    )


def packing_report(
    df: DataFrame,
    token_col: Column | str,
    id_col: str = "doc_id",
    group_col: str = "source",
    ctx_len: int = DEFAULT_CTX_LEN,
    n_shards: int = DEFAULT_N_SHARDS,
) -> DataFrame:
    """Per-group packing summary: documents, total tokens, sequences
    produced (ceil of each shard's stream length), boundary-straddling
    documents.  The aggregate after :func:`pack_contiguous` reuses the
    window shuffle's partitioning (group, shard) for its partial combine,
    so the summary costs no extra wide exchange of document rows."""
    packed = pack_contiguous(df, token_col, id_col, group_col, ctx_len, n_shards)
    per_shard = packed.groupBy(group_col, "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("toks"),
        F.sum(F.col("straddles").cast("bigint")).alias("n_straddle"),
    )
    return (
        per_shard.groupBy(group_col)
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("toks").alias("n_tokens"),
            # ceil(toks/ctx) via floor((toks+ctx-1)/ctx): exact for token
            # counts < 2^52, and spelled identically in the DuckDB oracle
            F.sum(
                F.floor((F.col("toks") + F.lit(ctx_len - 1)) / F.lit(float(ctx_len)))
            ).alias("n_sequences"),
            F.sum("n_straddle").alias("n_straddle_docs"),
        )
        .orderBy(group_col)
    )
