"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (Q1 pricing summary) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the
LLM-pipeline extensions), as ``(spark, sf_dir) -> DataFrame`` callables.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents for the
SQL-expressible subset; non-SQL-expressible ops get rows-only checks.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataclod_spark.registry import load_all_queries
from dataclod_spark.rotation import load_history, rotation_order

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all_queries()
    return registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


# Queries whose RESULT VALUES may differ from their latest driver row
# because this round's tree changed the implementation or the oracle —
# they jump to the very front of the correctness window.  Reset this
# list at the start of each round; entries left over from a prior round
# only waste window slots (never produce a wrong check).
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    # round 10 (hygiene + review fixes): v15's zero-sign bucket fix
    # (round(...)+0.0 on both sides — the r9 driver-red); the GROUPS
    # inliner's comment-tail re-alias (w9/w10); st19's broadcast hint +
    # the shared _drain_sink tail (st12/st13/st14/st16/st17/st18 ride
    # it too); the EXACT integer quantile rank (a8 — a latent red whose
    # oracle was already exact — and x29/st18 whose oracles moved to
    # (i*n+19)//20); as-of NULL-timestamp semantics (e4/e10/st7); the
    # media feature pass id typing + feats reuse (m6/m7/m8); scd2_enrich
    # key dedup (u6)
    "v15_distance_profile",
    "a8_exact_group_quantiles",
    "x29_source_calibration",
    "st18_stream_calibration",
    "e4_asof_join",
    "e10_asof_tolerance",
    "st7_stream_asof_join",
    "u6_scd2_enrich",
    "m6_media_near_dedup",
    "m7_media_probe_pairs",
    "m8_media_recall",
    "w9_groups_frame_join_sql",
    "w10_groups_frame_join_qualified_sql",
    "st12_stream_incremental_dedup",
    "st13_stream_media_dedup",
    "st14_stream_dsir_score",
    "st16_stream_source_drift",
    "st17_stream_contamination",
    "st19_stream_span_decontamination",
    # sessionize out-of-order rewrite (st1), tumbling->sliding delegate
    # (st2), weighted-topk arg wrap (st15), cdc_apply drain contract
    # (st9/st11)
    "st1_stream_sessionization",
    "st2_stream_tumbling",
    "st15_stream_weighted_topk",
    "st9_stream_cdc_upsert",
    "st11_stream_cdc_multibatch",
    # sixth pass: row_hash DECIMAL widening (every sp gate + st14; oracles
    # moved in lockstep), knn zero-norm guards (v1-v4, v14; v15 again),
    # dim_sign F.get (d4/d8), kmeans NULL-element gate (v7, d13),
    # scalar_quantize NULL codes (v6), contamination NULL pred (x16),
    # exact_dedup id_col (d1)
    "sp1_stratified_sample",
    "sp2_hash_sample",
    "sp6_hash_split",
    "sp9_weighted_sample",
    "v1_knn_bruteforce",
    "v2_knn_lsh",
    "v3_knn_multiprobe",
    "v4_knn_ivf",
    "v6_scalar_quantize",
    "v7_kmeans_clusters",
    "v14_ann_recall",
    "d1_exact_dedup",
    "d4_simhash",
    "d8_embedding_sign_lsh",
    "d13_semantic_dedup",
    "x16_contamination_check",
)

# The driver samples a bounded window (50 in r2-r5) of the registry in
# dict order.  The order is GENERATED from the CORRECTNESS_r*.json
# history (changed-this-round first, then never-driver-checked, then
# non-green, then stalest-first) — see dataclod_spark/rotation.py for
# the policy and tests/test_rotation.py for the window guarantees.
_PRIORITY = rotation_order(
    list(load_all_queries()),
    load_history(_REPO_DIR),
    _CHANGED_THIS_ROUND,
)


def _ordered() -> dict[str, object]:
    registry = load_all_queries()
    out = {}
    for name in _PRIORITY:
        if name in registry:
            out[name] = registry[name]
    for name, qd in registry.items():
        if name not in out:
            out[name] = qd
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
