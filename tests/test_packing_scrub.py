"""Unit tests for sequence packing (operators.packing) and PII scrubbing
(functions.text.scrub_text/pii_count) — the synthetic corpus has no real
PII, so the pattern semantics are pinned here on crafted rows."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from dataclod_spark.functions.text import PII_PATTERNS, pii_count, scrub_text
from dataclod_spark.operators.packing import pack_contiguous, packing_report


def test_pack_contiguous_matches_python_reference(spark):
    rng = random.Random(7)
    rows = [
        Row(doc_id=i, source=f"s{i % 3}", tok=rng.choice([0, 1, 5, 17, 63, 64, 65, 200]))
        for i in range(120)
    ]
    ctx, shards = 64, 4
    df = spark.createDataFrame(rows)
    got = {
        r.doc_id: (r.shard, r.seq_id, r.start_offset, r.straddles)
        for r in pack_contiguous(
            df, "tok", id_col="doc_id", group_col="source", ctx_len=ctx, n_shards=shards
        ).collect()
    }
    # python reference: contiguous stream per (source, shard) ordered by id
    streams: dict[tuple, int] = {}
    for r in sorted(rows, key=lambda r: r.doc_id):
        key = (r.source, r.doc_id % shards)
        start = streams.get(key, 0)
        streams[key] = start + r.tok
        seq = start // ctx
        straddle = r.tok > 0 and (start + r.tok - 1) // ctx != seq
        assert got[r.doc_id] == (r.doc_id % shards, seq, start % ctx, straddle), r


def test_pack_contiguous_invariants(spark):
    rows = [Row(doc_id=i, source="s", tok=13) for i in range(100)]
    out = pack_contiguous(
        spark.createDataFrame(rows), "tok", group_col="source", ctx_len=64, n_shards=1
    ).collect()
    # offsets always inside the context window; straddle iff span crosses it
    for r in out:
        assert 0 <= r.start_offset < 64
        assert r.straddles == (r.start_offset + r.tok > 64)
    # sequence ids per shard are dense from 0
    seqs = sorted({r.seq_id for r in out})
    assert seqs == list(range(seqs[-1] + 1))


def test_packing_report_totals(spark):
    rows = [Row(doc_id=i, source=f"s{i % 2}", tok=10) for i in range(40)]
    rep = {
        r.source: r
        for r in packing_report(
            spark.createDataFrame(rows), "tok", group_col="source", ctx_len=64, n_shards=2
        ).collect()
    }
    for src in ("s0", "s1"):
        r = rep[src]
        assert r.n_docs == 20 and r.n_tokens == 200
        # 2 shards x 100 tokens => ceil(100/64) = 2 sequences each
        assert r.n_sequences == 4


def test_scrub_text_redacts_and_counts(spark):
    doc = (
        "contact alice.smith+spam@example.co.uk or 10.0.255.1 "
        "or call +1 (555) 123-4567 about the customer account"
    )
    df = spark.createDataFrame([Row(text=doc)])
    row = df.select(
        scrub_text(F.col("text"), denylist=("customer",)).alias("scrubbed"),
        *[pii_count(F.col("text"), pat).alias(name) for name, pat, _ in PII_PATTERNS],
        pii_count(F.col("text"), r"\bcustomer\b").alias("n_term"),
    ).collect()[0]
    assert row.email == 1 and row.ipv4 == 1 and row.phone == 1 and row.n_term == 1
    assert "<EMAIL>" in row.scrubbed and "<IP>" in row.scrubbed
    assert "<PHONE>" in row.scrubbed and "<TERM>" in row.scrubbed
    assert "example.co.uk" not in row.scrubbed and "555" not in row.scrubbed
    assert "customer" not in row.scrubbed


def test_scrub_patterns_match_duckdb_semantics(spark):
    """The oracle counts with DuckDB regexp_extract_all; the engine with
    Java regexp_count.  Pin dialect agreement on adversarial strings
    (boundary digits, dotted runs, greedy phone tails)."""
    import duckdb

    texts = [
        "a@b.co 1.2.3.4 9999999999",
        "x 255.255.255.255.255 y",        # 5 octets: \b boundaries decide
        "+44 20 7946 0958 and 020 7946 0958",
        "no pii here at all",
        "semi@addr.x semi@addr.xy 1.2.3",  # tld too short / octets too few
    ]
    df = spark.createDataFrame([Row(text=t) for t in texts])
    con = duckdb.connect()
    for name, pat, _ in PII_PATTERNS:
        got = [r[0] for r in df.select(pii_count(F.col("text"), pat)).collect()]
        want = [
            con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [t, pat]
            ).fetchone()[0]
            for t in texts
        ]
        assert got == want, (name, got, want)
