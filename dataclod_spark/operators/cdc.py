"""CDC merge-apply — the batch MERGE INTO every ingestion pipeline runs
(apply an insert/update/delete change batch to a snapshot table).

``apply_changes(base, changes, key, op_col)`` returns the post-merge
snapshot:

* ``D`` rows delete the base row for that key;
* ``U``/``I`` rows upsert: the change row's payload replaces (or adds)
  the row for that key;
* base keys untouched by the batch pass through unchanged.

If the batch carries several rows for one key, the highest ``seq`` wins
(a CDC stream's log order) — resolved with ONE window over
``(key ORDER BY seq DESC)``, never a per-key loop.

Plan shape (the 100 TB story): the deduped change batch is typically a
tiny fraction of the snapshot, so the merge is one left join of base
against the batch keys (broadcast when small, shuffle hash otherwise —
AQE decides) plus a union of the surviving upserts.  The snapshot
streams through exactly once; only the batch shuffles for its own
dedup.  This is the same join-then-reconcile shape Delta/Iceberg MERGE
compiles to, minus the transactional file rewrite (Spark-side table
formats handle that layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["apply_changes"]


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply an I/U/D change batch to a snapshot; returns the new snapshot
    with ``base``'s columns.

    ``changes`` must carry ``key``, ``op_col`` ('I' | 'U' | 'D') and, for
    upserts, every ``base`` payload column.  ``seq_col`` (optional) orders
    multiple changes per key — highest wins; without it the batch must be
    key-unique.
    """
    payload = [c for c in base.columns]
    if seq_col is not None:
        w = W.partitionBy(key).orderBy(F.col(seq_col).desc())
        changes = (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    # runtime guard: an unrecognized op would otherwise silently act as a
    # delete (its key lands in `touched` but never in `upserts`).  The check
    # is folded into the op column itself — a dropped assert column would be
    # pruned away by Catalyst and never evaluate (SCALE.md pitfall #5)
    changes = changes.withColumn(
        op_col,
        F.when(F.col(op_col).isin("I", "U", "D"), F.col(op_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("unknown CDC op: "),
                    F.coalesce(F.col(op_col), F.lit("NULL")),
                )
            )
        ),
    )
    # materialize the deduped batch once: the anti-join and union branches
    # would otherwise each re-run the change derivation (and, in the
    # streaming caller, re-read the prior snapshot for the ordering guard)
    # — SCALE.md pitfall #6; the batch is small by the merge's own 100 TB
    # story, so the checkpoint is cheap
    changes = changes.localCheckpoint(eager=True)
    upserts = changes.filter(F.col(op_col).isin("I", "U")).select(*payload)
    survivors = base.join(changes.select(key), key, "left_anti")
    return survivors.unionByName(upserts)
