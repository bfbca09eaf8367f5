"""As-of join operator: semantics (backward/forward/tolerance/ties/outer)
against a brute-force pandas reference, plus plan-shape scale guards."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dataclod_spark.operators.asof_join import asof_join


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(10), lid=100),
            Row(k=1, ts=_ts(20), lid=101),
            Row(k=1, ts=_ts(5), lid=102),   # before any right row
            Row(k=2, ts=_ts(15), lid=200),
            Row(k=3, ts=_ts(50), lid=300),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(8), rid=1, v=0.5),
            Row(k=1, ts=_ts(10), rid=2, v=1.5),   # equal-ts: inclusive match
            Row(k=1, ts=_ts(10), rid=3, v=2.5),   # tie at same ts → max rid wins
            Row(k=1, ts=_ts(18), rid=4, v=3.5),
            Row(k=2, ts=_ts(40), rid=5, v=4.5),   # only after left ts
        ]
    )
    return left, right


def test_backward_semantics(frames):
    left, right = frames
    out = {
        r["lid"]: r
        for r in asof_join(left, right, on="ts", by="k", tiebreak="rid").collect()
    }
    assert len(out) == 5  # every left row survives (left-outer)
    assert out[100]["rid"] == 3          # equal-ts inclusive, tie → max rid
    assert out[101]["rid"] == 4          # latest at-or-before 20 is ts=18
    assert out[102]["rid"] is None       # nothing at-or-before 5
    assert out[200]["rid"] is None       # right rows only after left ts
    assert out[300]["rid"] is None       # key absent from right
    assert out[100]["v"] == 2.5


def test_forward_semantics(frames):
    left, right = frames
    out = {
        r["lid"]: r
        for r in asof_join(
            left, right, on="ts", by="k", direction="forward", tiebreak="rid"
        ).collect()
    }
    assert out[100]["rid"] == 3          # equal-ts inclusive going forward too
    assert out[102]["rid"] == 1          # next right row after 5 is ts=8
    assert out[101]["rid"] is None       # nothing at-or-after 20 for k=1? ts=18<20 → None
    assert out[200]["rid"] == 5          # ts=40 ≥ 15
    assert out[300]["rid"] is None


def test_tolerance(frames):
    left, right = frames
    out = {
        r["lid"]: r
        for r in asof_join(
            left, right, on="ts", by="k", tolerance_sec=2, tiebreak="rid"
        ).collect()
    }
    assert out[100]["rid"] == 3          # gap 0 ≤ 2
    assert out[101]["rid"] == 4          # gap 2 ≤ 2 (inclusive)
    assert out[102]["rid"] is None
    # left row survives with NULLed match under tolerance
    assert len(out) == 5


def test_column_collision_suffix(frames):
    left, right = frames
    cols = asof_join(left, right, on="ts", by="k", tiebreak="rid").columns
    # right's ts collides with left's → suffixed; payloads keep their names
    assert cols == ["k", "ts", "lid", "ts_r", "rid", "v"]


def test_asof_against_bruteforce(spark):
    """Randomized differential check vs an O(n·m) SQL formulation."""
    left = spark.range(0, 300).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_micros((F.col("id") * 1_700_000 + 13) % 100_000_000).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(0, 500).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_micros((F.col("id") * 990_001 + 7) % 100_000_000).alias("ts"),
        F.col("id").alias("rid"),
    )
    got = (
        asof_join(left, right, on="ts", by="k", tiebreak="rid")
        .select("lid", "rid")
        .collect()
    )
    left.createOrReplaceTempView("asof_l")
    right.createOrReplaceTempView("asof_r")
    exp = spark.sql(
        """
        SELECT l.lid,
               max_by(r.rid, struct(r.ts, r.rid)) AS rid
        FROM asof_l l LEFT JOIN asof_r r
          ON l.k = r.k AND r.ts <= l.ts
        GROUP BY l.lid, l.k, l.ts
        """
    ).collect()
    assert sorted((r["lid"], r["rid"]) for r in got) == sorted(
        (r["lid"], r["rid"]) for r in exp
    )


def test_single_shuffle_plan(frames):
    """Scale guard: ONE exchange (the key hash partition), no join node —
    the whole as-of is a window over a union."""
    left, right = frames
    plan = asof_join(left, right, on="ts", by="k", tiebreak="rid")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_tolerance_subsecond_exact(spark):
    """Tolerance must be microsecond-exact: a 2.9 s gap exceeds a 2 s
    tolerance even though second-truncated deltas would say 2 <= 2."""
    left = spark.createDataFrame([Row(k=1, ts=_ts(10.9), lid=1)])
    right = spark.createDataFrame([Row(k=1, ts=_ts(8.0), rid=7)])
    out = asof_join(left, right, on="ts", by="k", tolerance_sec=2, tiebreak="rid").collect()
    assert out[0]["rid"] is None
    # and an exactly-2 s gap is inclusive
    right2 = spark.createDataFrame([Row(k=1, ts=_ts(8.9), rid=8)])
    out2 = asof_join(left, right2, on="ts", by="k", tolerance_sec=2, tiebreak="rid").collect()
    assert out2[0]["rid"] == 8


def test_string_tiebreak_stays_deterministic(spark):
    """Non-numeric tiebreak columns keep their native ordering (a double
    cast would NULL them out and lose the determinism contract)."""
    left = spark.createDataFrame([Row(k=1, ts=_ts(10), lid=1)])
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(10), rid="aaa", v=1.0),
            Row(k=1, ts=_ts(10), rid="zzz", v=2.0),
            Row(k=1, ts=_ts(10), rid="mmm", v=3.0),
        ]
    )
    out = asof_join(left, right, on="ts", by="k", tiebreak="rid").collect()
    assert out[0]["rid"] == "zzz"  # lexicographically largest wins


def test_asof_matches_pandas_merge_asof(spark):
    """Third-implementation differential: on tie-free data (unique
    timestamps per key/side) our as-of join must agree with
    pandas.merge_asof row for row, including tolerance handling."""
    import pandas as pd

    rng_l = [(i % 5, (i * 7919 + 3) % 100_000, i) for i in range(200)]
    rng_r = [(i % 5, (i * 104729 + 11) % 100_000, 1000 + i) for i in range(300)]
    # de-dup timestamps per (key, side) so tie semantics can't differ
    seen = set()
    lrows = [(k, t, v) for k, t, v in rng_l if not ((k, t) in seen or seen.add((k, t)))]
    seen = set()
    rrows = [(k, t, v) for k, t, v in rng_r if not ((k, t) in seen or seen.add((k, t)))]

    ldf = spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), v) for k, t, v in lrows],
        "k long, ts timestamp, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), v) for k, t, v in rrows],
        "k long, ts timestamp, rid long",
    )
    for tol in (None, 500):
        got = {
            r["lid"]: r["rid"]
            for r in asof_join(
                ldf, rdf, on="ts", by="k", tolerance_sec=tol, tiebreak="rid"
            ).collect()
        }
        lp = pd.DataFrame(lrows, columns=["k", "t", "lid"]).sort_values("t")
        rp = pd.DataFrame(rrows, columns=["k", "t", "rid"]).sort_values("t")
        exp_df = pd.merge_asof(
            lp, rp, on="t", by="k", direction="backward",
            tolerance=tol if tol is None else tol,
        )
        exp = {
            int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
            for row in exp_df.itertuples()
        }
        assert got == exp, f"tolerance={tol}"
