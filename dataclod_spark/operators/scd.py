"""Slowly-changing-dimension (SCD type 2) maintenance — the versioned-
dimension merge every warehouse pipeline runs.

``scd2_apply(current, changes, key, version)`` produces the full version
history: every row gains ``valid_from`` (its own version stamp),
``valid_to`` (the next version's stamp for the same key, NULL while
current) and ``is_current``.  Pure DataFrame ops:

* union the current dimension and the change batch (same schema + a
  version column);
* ONE window over ``(key ORDER BY version)``: ``lead(version)`` is the
  row's expiry — no self-join, no per-key loops;
* unchanged keys keep their single open row; changed keys close the old
  row at exactly the new row's stamp (no gaps, no overlaps — the SCD2
  invariant).

Scale: one hash shuffle on the dimension key (both inputs union first,
so the window sees each key's full history once); at 100 TB dimension
scale the shuffle is the unavoidable minimum for versioning, and skewed
hot keys are bounded by version count, not row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["scd2_apply"]


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    version: str = "valid_from",
) -> DataFrame:
    """Merge a change batch into an SCD2 dimension.

    ``current`` and ``changes`` must share the payload schema plus a
    ``version`` column (monotonic per key — ingestion timestamp or batch
    id).  Returns all rows with ``valid_from``/``valid_to``/``is_current``;
    multiple changes for one key in a single batch version-chain in
    ``version`` order.
    """
    cols = current.columns
    if set(cols) != set(changes.columns):
        raise ValueError(
            f"schema mismatch: current={sorted(cols)} changes={sorted(changes.columns)}"
        )
    u = current.select(*cols).unionByName(changes.select(*cols))
    w = W.partitionBy(key).orderBy(F.col(version).asc())
    out = (
        u.withColumn("valid_from", F.col(version))
        .withColumn("valid_to", F.lead(version).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    if version != "valid_from":
        out = out.drop(version)
    return out


def scd2_enrich(
    facts: DataFrame,
    hist: DataFrame,
    fact_key: str,
    fact_ts: str,
    hist_key: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time fact enrichment: join every fact row to the dimension
    VERSION that was valid at the fact's OWN timestamp — the per-row
    as-of read (u2 is the global AS-OF snapshot; this is what a fact
    pipeline actually runs: each order sees the customer as they were on
    the order date).  A fact before the key's first version (or with no
    dimension key at all) keeps NULL attributes under the default left
    join.

    Join predicate: equi on the key plus interval membership
    ``valid_from <= ts < valid_to`` (NULL ``valid_to`` = still current).
    Because SCD2 history is gap-free and non-overlapping per key, at most
    one version matches — the join is 1:≤1 by construction, no dedup
    needed.

    Scale: Catalyst plans the EQUI key as the join key (broadcast when
    the history is small, sort-merge otherwise) with the interval as a
    post-join filter; the per-key fan-out before filtering is bounded by
    the key's VERSION COUNT, not its fact count, so this never degrades
    into a true range-join blowup.  Both join strategies AQE-skew-split —
    valid for joins."""
    cond = (
        (facts[fact_key] == hist[hist_key])
        & (facts[fact_ts] >= hist[valid_from])
        & (hist[valid_to].isNull() | (facts[fact_ts] < hist[valid_to]))
    )
    # the history key is redundant with the fact key after the equi join;
    # keeping it produced a DUPLICATE column name whenever
    # fact_key == hist_key (every later select of the key raised
    # AMBIGUOUS_REFERENCE)
    return facts.join(hist, cond, how).drop(hist[hist_key])


__all__.append("scd2_enrich")
