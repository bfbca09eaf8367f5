"""As-of (point-in-time) join — the time-series join Spark lacks natively.

For each left row, attach the single right row with the largest (backward)
or smallest (forward) timestamp on the matching side of the left timestamp,
per key — ``pandas.merge_asof`` / kdb+ ``aj`` / DuckDB ``ASOF JOIN``
semantics.  The reference engine exposes no as-of join (its custom join
subsystem is spatial — ``spatial/src/join/exec.rs:47-131``); this operator
extends the engine the same way the spatial join does: a join shape the
planner can't express as pure equi-join, implemented as a composition of
native operators.

Implementation — union + running ``last(ignorenulls)`` window, NOT a range
join:

* left rows become ``(key, t, payload_l, NULL)``, right rows
  ``(key, t, NULL, payload_r)``;
* one hash shuffle on ``key`` sorts each key group by
  ``(t, side, tiebreak)`` with right rows ordered *before* left rows at
  equal ``t`` (backward joins are at-or-before inclusive);
* ``last(payload_r, ignorenulls=True)`` over
  ``rowsBetween(unboundedPreceding, currentRow)`` carries the most recent
  right payload forward onto every left row;
* left rows are filtered back out and the payload struct is unpacked.

Scale: exactly ONE shuffle (hash partition by key + in-partition sort) and
zero Python — the window is whole-stage-codegen'd, state per key is one
struct.  A naive range join (``l.t BETWEEN r.t - tol AND r.t``) explodes to
|matches-per-window| rows before deduplication and breaks at 100 TB; this
shape streams.  Skewed keys (one user with millions of events) sort within
one task — for pathological skew, pre-split by time range and stitch, or
use ``operators.skew`` salting on the union key.

Ties: when several right rows share the boundary timestamp the winner is
the largest ``tiebreak`` column (deterministic — required for the
differential oracle; pandas ``merge_asof`` takes the last row in input
order, which is not reproducible under shuffle).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | str = (),
    *,
    right_on: Optional[str] = None,
    direction: str = "backward",
    tolerance_sec: Optional[int] = None,
    tiebreak: Optional[str] = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the closest right row at or
    before (``backward``) / at or after (``forward``) its ``on`` time,
    matching on the ``by`` key columns.  Unmatched left rows keep NULL
    right columns (left-outer semantics, like ``merge_asof``).

    ``tolerance_sec`` drops matches farther than the tolerance from the
    left timestamp (the matched row's columns become NULL, the left row
    survives).  ``tiebreak`` names a right column that deterministically
    orders equal-timestamp candidates (highest wins); default is the
    right ``on`` column itself.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    r_on = right_on or on

    l_payload = [c for c in left.columns if c not in by]
    r_payload = [c for c in right.columns if c not in by]
    # right columns arriving in the output (keys come from the left row)
    out_right = {c: (c + suffix if c in set(left.columns) else c) for c in r_payload}

    tb = tiebreak or r_on
    if tb not in right.columns:
        raise ValueError(f"tiebreak column {tb!r} not in right side")
    tb_type = right.schema[tb].dataType.simpleString()

    lu = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in l_payload]).alias("__l"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in r_payload)
            + ">"
        )
        .alias("__r"),
    )
    # NULL-timestamp semantics match merge_asof / SQL ASOF: a right row
    # with no event time can never be "the closest at-or-before/after"
    # (it would otherwise sort NULLS FIRST asc / LAST desc and be carried
    # by last(ignorenulls) onto real rows as a spurious match)
    ru = right.filter(F.col(r_on).isNotNull()).select(
        *[F.col(c) for c in by],
        F.col(r_on).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in l_payload)
            + ">"
        )
        .alias("__l"),
        # native-typed tiebreak: a double cast would NULL out string ids
        # (losing the determinism the tiebreak exists for) and collide
        # int64 ids above 2^53
        F.col(tb).alias("__tb"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__r"),
    )
    u = lu.unionByName(ru)

    if direction == "backward":
        # right-before-left at equal t → inclusive at-or-before match;
        # among equal-t right rows the largest tiebreak sorts last and wins
        order: list[Column] = [F.col("__t").asc(), F.col("__is_left").asc(), F.col("__tb").asc()]
        frame = (W.unboundedPreceding, W.currentRow)
    else:
        # forward: scan time descending so `last` carries the *next* right
        # row backward; right still sorts before left at equal t
        order = [F.col("__t").desc(), F.col("__is_left").asc(), F.col("__tb").asc()]
        frame = (W.unboundedPreceding, W.currentRow)

    # NOTE keyless scale hazard: an empty `by` makes this ONE window
    # partition — a single-task sort of both sides (the scale-killer
    # shape this repo bans elsewhere).  Keyless as-of joins of large
    # frames should pre-bucket by a coarse time range instead.
    w = W.partitionBy(*[F.col(c) for c in by]).orderBy(*order).rowsBetween(*frame)
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__is_left") == 1
    )
    # a left row with no event time likewise matches nothing (its frame
    # position under NULLS FIRST/LAST ordering is an artifact, not a time)
    matched = matched.withColumn(
        "__m",
        F.when(F.col("__t").isNotNull(), F.col("__m")).otherwise(
            F.lit(None).cast(matched.schema["__m"].dataType)
        ),
    )

    if tolerance_sec is not None:
        # microsecond-exact delta: unix_timestamp truncates to seconds,
        # which would admit matches up to ~1 s beyond the tolerance on
        # sub-second data (cast to instant is exact under a pinned zone)
        mt = F.unix_micros(F.col("__m").getField(r_on).cast("timestamp"))
        lt = F.unix_micros(F.col("__t").cast("timestamp"))
        delta = lt - mt if direction == "backward" else mt - lt
        matched = matched.withColumn(
            "__m",
            F.when(delta <= F.lit(int(tolerance_sec * 1_000_000)), F.col("__m")).otherwise(
                F.lit(None).cast(matched.schema["__m"].dataType)
            ),
        )

    out_cols = [F.col(c) for c in by]
    out_cols += [F.col("__l").getField(c).alias(c) for c in l_payload]
    out_cols += [F.col("__m").getField(c).alias(a) for c, a in out_right.items()]
    return matched.select(*out_cols)
