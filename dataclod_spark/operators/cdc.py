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

__all__ = ["apply_changes", "compact_changes", "snapshot_diff"]


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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list,
    compare_cols: list | None = None,
) -> DataFrame:
    """Diff two table snapshots by key: one row per difference with
    ``change_type`` ('added' | 'removed' | 'changed') and ``changed_cols``
    (comma-joined sorted column names whose values differ, NULL-safe) —
    the regression-diff primitive between two pipeline runs / corpus
    versions, and the audit view behind a CDC MERGE (u3 applies changes;
    this derives them).

    Unchanged rows are dropped, so the output is bounded by change
    volume, not table size.  One full-outer equi-join on the keys (the
    single shuffle; both sides partial-project to keys+compared columns
    first, so wide snapshots don't move dead columns through the
    shuffle).  Comparison is ``eqNullSafe`` per column — NULL→value and
    value→NULL both count as changes, NULL→NULL does not.
    """
    from pyspark.sql import functions as F

    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    missing = [c for c in compare_cols + keys if c not in old.columns]
    if missing:
        raise ValueError(f"snapshot_diff: columns missing from old: {missing}")

    # side-marker literals, not key null-ness, decide row presence — and
    # the join is null-SAFE on the keys — so NULL-key rows pair up like
    # any other key value instead of an old-side NULL-key row being
    # misreported as 'added' (the equi-join would never match it and its
    # old-side key columns are indistinguishable from an absent row)
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")

    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        )
        for c in sorted(compare_cols)
    ]
    changed_cols = F.array_join(
        F.filter(F.array(*diffs), lambda x: x.isNotNull()), ","
    )
    out_keys = [
        F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k) for k in keys
    ]
    return (
        j.select(
            *out_keys,
            F.when(~in_old, F.lit("added"))
            .when(~in_new, F.lit("removed"))
            .when(changed_cols != "", F.lit("changed"))
            .alias("change_type"),
            F.when(in_old & in_new, changed_cols).otherwise(F.lit("")).alias(
                "changed_cols"
            ),
        )
        .filter(F.col("change_type").isNotNull())
    )


def compact_changes(
    log: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Collapse a CDC change LOG to its net effect per key — the
    compaction a MERGE target requires when one batch window carries
    several changes for the same key (Delta CDF / Debezium "last change
    wins, insert-then-delete cancels").

    Per key: the highest-``seq_col`` row's payload survives, and the net
    op derives from the (first, last) ops —

    * last ``D``, first ``I`` → the key lived only inside the window:
      NO output row (a MERGE must not see a delete for a row the target
      never had);
    * last ``D`` otherwise → net ``D``;
    * first ``I`` → net ``I`` (whatever updates followed, the target
      gains one new row with the final payload);
    * else → net ``U``.

    ``seq_col`` must be unique per key (a log sequence number) — the
    same contract :func:`apply_changes` resolves its intra-batch ties
    with.  ONE aggregate (``max_by``/``min_by`` carry the payload and
    the boundary ops through a single partial+final pass — no window
    sort, no self-join); the log shuffles once on the key."""
    value_cols = [c for c in log.columns if c not in (*keys, seq_col)]
    last = F.max_by(
        F.struct(*[F.col(c) for c in value_cols]), F.col(seq_col)
    )
    g = log.groupBy(*[F.col(k) for k in keys]).agg(
        last.alias("__last"),
        F.min_by(F.col(op_col), F.col(seq_col)).alias("__first_op"),
    )
    last_op = F.col(f"__last.{op_col}")
    first_op = F.col("__first_op")
    net = (
        F.when((last_op == "D") & (first_op == "I"), F.lit(None).cast("string"))
        .when(last_op == "D", F.lit("D"))
        .when(first_op == "I", F.lit("I"))
        .otherwise(F.lit("U"))
    )
    return (
        g.withColumn("__net", net)
        .filter(F.col("__net").isNotNull())
        .select(
            *keys,
            *[
                F.col(f"__last.{c}").alias(c)
                for c in value_cols
                if c != op_col
            ],
            F.col("__net").alias("net_op"),
        )
    )
