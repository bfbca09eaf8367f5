"""Driver-strict comparator semantics (VERDICT r9 #2) and the v15
zero-sign bucket fix (VERDICT r9 #1).

The driver's correctness gate hashes STRINGIFIED cell values, so IEEE
``-0.0`` and ``0.0`` hash differently there.  The local harness's
lenient mode deliberately coerces ``-0.0 → 0.0`` (exploratory
tolerance), which in round 9 masked exactly the mismatch that made
v15_distance_profile driver-red: DuckDB's GROUP BY keeps a
negative-zero representative for the merged zero bucket while Spark
normalizes grouping keys to ``+0.0``.  ``strict=True`` preserves the
sign bit; the closing battery and the standing pytest gate both run
strict now.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from dataclod_spark.testing import _norm_value, normalize_rows


def test_lenient_coerces_negative_zero():
    assert _norm_value(-0.0) == ("f", 0.0)
    assert not math.copysign(1.0, _norm_value(-0.0)[1]) < 0


def test_strict_preserves_zero_sign_bit():
    # negative zero becomes the "-0.0" sentinel (the sign must live in
    # the VALUE: Python's -0.0 == 0.0 would defeat a float-typed carry)
    assert _norm_value(-0.0, strict=True) == ("f", "-0.0")
    assert _norm_value(0.0, strict=True) == ("f", 0.0)
    # a small negative that ROUNDS to zero keeps its sign under strict
    assert _norm_value(-1e-9, strict=True) == ("f", "-0.0")
    assert _norm_value(-1e-9) == ("f", 0.0)  # lenient collapses it
    # nonzero values are untouched by the sentinel path
    assert _norm_value(-0.5, strict=True) == ("f", -0.5)


def test_strict_rows_distinguish_zero_signs():
    """The exact r9 failure shape: numerically identical histograms whose
    zero-bucket keys differ only in sign must MISMATCH under strict
    (driver parity) and match under lenient."""
    spark_rows = [(0.0, 161)]
    duck_rows = [(-0.0, 161)]
    cols = ["bucket", "n_pairs"]
    assert normalize_rows(cols, spark_rows) == normalize_rows(cols, duck_rows)
    assert normalize_rows(cols, spark_rows, strict=True) != normalize_rows(
        cols, duck_rows, strict=True
    )


def test_strict_zero_sign_inside_arrays():
    a = _norm_value([0.0, 1.5], strict=True)
    b = _norm_value([-0.0, 1.5], strict=True)
    assert a != b
    assert _norm_value([0.0, 1.5]) == _norm_value([-0.0, 1.5])


def test_oracle_sign_normalization_formula():
    """The fix on the oracle side is ``round(x, 2) + 0.0``: IEEE addition
    of +0.0 maps -0.0 → +0.0 and is the identity elsewhere.  Prove it on
    the actual oracle engine."""
    con = duckdb.connect()
    try:
        # CAST to DOUBLE: the real oracle rounds a double expression
        # (dot/norm arithmetic); a bare -0.002 literal is DECIMAL in
        # DuckDB and decimals carry no signed zero
        neg, fixed = con.execute(
            "SELECT round(CAST(-0.002 AS DOUBLE), 2),"
            "       round(CAST(-0.002 AS DOUBLE), 2) + 0.0"
        ).fetchone()
        assert neg == 0.0 and math.copysign(1.0, neg) < 0  # the hazard is real
        assert math.copysign(1.0, fixed) > 0  # the fix kills it
        # identity away from zero
        (v,) = con.execute(
            "SELECT round(CAST(-0.456 AS DOUBLE), 2) + 0.0"
        ).fetchone()
        assert v == -0.46
    finally:
        con.close()


def test_cosine_profile_zero_bucket_sign(spark):
    """cosine_profile's bucket is sign-normalized on the Spark side too
    (``+ F.lit(0.0)``): engineer a pair whose cosine rounds to -0.0 and
    pin signbit == False on the collected bucket."""
    from dataclod_spark.operators.similarity import cosine_profile

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-0.002, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    rows = cosine_profile(df, df, decimals=2).collect()
    # two ordered pairs, both cosine ≈ -0.002 → one bucket of 2 pairs
    assert [(r.bucket, r.n_pairs) for r in rows] == [(0.0, 2)]
    assert not math.copysign(1.0, rows[0].bucket) < 0


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_v15_both_engines_emit_positive_zero(spark, sf_dir):
    """End-to-end pin for the r9 driver-red: run v15's Spark query AND its
    oracle, and assert NO bucket on either side carries a negative sign
    bit on a zero value (the driver-hash mismatch class)."""
    from dataclod_spark.registry import load_all_queries
    from dataclod_spark.testing import duckdb_connection

    qd = load_all_queries()["v15_distance_profile"]
    s_buckets = [r.bucket for r in qd.fn(spark, sf_dir).collect()]
    con = duckdb_connection(sf_dir)
    try:
        d_buckets = [r[0] for r in con.execute(qd.oracle).fetchall()]
    finally:
        con.close()
    for side, buckets in (("spark", s_buckets), ("duckdb", d_buckets)):
        for b in buckets:
            if b == 0.0:
                assert not math.copysign(1.0, b) < 0, f"{side} emitted -0.0"
