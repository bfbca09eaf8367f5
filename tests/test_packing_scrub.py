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


def test_scrub_case_insensitive_email_and_escaped_denylist(spark):
    """Round-5 review finds: uppercase emails leaked (case-sensitive
    pattern), unescaped denylist terms became live regex ('c++' →
    possessive quantifier redacting bare 'c'), and dates were eaten as
    phone numbers."""
    from dataclod_spark.functions.text import denylist_pattern

    doc = (
        "mail John.Doe@Example.COM and MIXED@case.Org; "
        "uses c++ heavily; c is fine; a.b stays; "
        "released 2023-01-01, call 9999999999"
    )
    df = spark.createDataFrame([Row(text=doc)])
    row = df.select(
        scrub_text(F.col("text"), denylist=("c++",)).alias("scrubbed")
    ).collect()[0]
    s = row.scrubbed
    assert "Example.COM" not in s and "MIXED@case.Org" not in s   # (?i) email
    assert s.count("<EMAIL>") == 2
    assert "<TERM> heavily" in s and "c is fine" in s             # escaped c++
    assert "a.b stays" in s
    assert "2023-01-01" in s                                      # date survives
    assert "9999999999" not in s and "<PHONE>" in s               # 10 digits redacted
    # pattern helper semantics
    assert denylist_pattern("customer") == r"\bcustomer\b"
    assert denylist_pattern("c++") == r"\bc\+\+([^\w]|$)"
    assert denylist_pattern("a.b") == r"\ba\.b\b"


def test_denylist_nonword_end_boundary(spark):
    """ADVICE r5: a non-word-char-terminal term used to prefix-match
    inside unrelated tokens ('c++x' → '<TERM>x').  The capturing
    ([^\\w]|$) boundary emulation fixes that — and the consumed boundary
    char must be re-emitted via the dialect backreference."""
    import duckdb

    from dataclod_spark.functions.text import (
        denylist_pattern,
        denylist_replacement,
        pii_count,
    )

    doc = "c++x stays; uses c++, often; ends with c++"
    df = spark.createDataFrame([Row(text=doc)])
    s = df.select(
        scrub_text(F.col("text"), patterns=(), denylist=("c++",)).alias("s")
    ).collect()[0].s
    assert "c++x stays" in s                      # boundary respected
    assert "<TERM>, often" in s                   # comma re-emitted
    assert s.endswith("<TERM>")                   # end-of-string boundary
    assert "c++," not in s and not s.endswith("c++")

    # count parity + replacement parity with the DuckDB dialect
    pat = denylist_pattern("c++")
    got_n = df.select(pii_count(F.col("text"), pat)).collect()[0][0]
    con = duckdb.connect()
    want_n = con.execute(
        "SELECT len(regexp_extract_all(?, ?))", [doc, pat]
    ).fetchone()[0]
    assert got_n == want_n == 2
    want_s = con.execute(
        "SELECT regexp_replace(?, ?, ?, 'g')",
        [doc, pat, denylist_replacement("c++", dialect="duckdb")],
    ).fetchone()[0]
    assert s == want_s
    # word-char-terminal terms keep the plain replacement (no backref)
    assert denylist_replacement("customer") == "<TERM>"
    assert denylist_replacement("c++") == "<TERM>$1"
    assert denylist_replacement("c++", dialect="duckdb") == "<TERM>\\1"


def test_scrub_new_patterns_match_duckdb(spark):
    """Dialect agreement for the (?i) email and ≥9-digit phone patterns."""
    import duckdb

    from dataclod_spark.functions.text import PII_PATTERNS, pii_count

    texts = [
        "John.Doe@Example.COM x@Y.ZW lower@case.com",
        "2023-01-01 and 2024-12-31",          # single dates: no phone
        "+1 (555) 123-4567 or 020 7946 0958",  # real phone shapes
        "12345678 123456789",                  # 8 digits no, 9 digits yes
    ]
    df = spark.createDataFrame([Row(text=t) for t in texts])
    con = duckdb.connect()
    for name, pat, _ in PII_PATTERNS:
        got = [r[0] for r in df.select(pii_count(F.col("text"), pat)).collect()]
        want = [
            con.execute("SELECT len(regexp_extract_all(?, ?))", [t, pat]).fetchone()[0]
            for t in texts
        ]
        assert got == want, f"{name}: spark={got} duckdb={want}"
    # and the intended semantics, not just agreement
    phone = PII_PATTERNS[2][1]
    counts = [r[0] for r in df.select(pii_count(F.col("text"), phone)).collect()]
    assert counts[1] == 0            # dates are not phones anymore
    assert counts[2] == 2            # both phone shapes caught
    assert counts[3] == 1            # 9-digit floor
