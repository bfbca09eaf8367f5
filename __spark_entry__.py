"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (Q1 pricing summary) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the
LLM-pipeline extensions), as ``(spark, sf_dir) -> DataFrame`` callables.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents for the
SQL-expressible subset; non-SQL-expressible ops get rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataclod_spark.registry import load_all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all_queries()
    return registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


# The driver samples a bounded window (50 in r2-r4) of the registry in dict
# order, so present the queries most in need of a correctness row first.
# Round-5 rotation (VERDICT r4 "Next round" #1): the window can hold 50 of
# the 48 r2-era stale queries + the queries changed/added this round, so:
# 1-39 are the r2-era queries NOT in bench.py's per-round headline set,
# 40-42 are d11 (broadcast-hint removal, re-prove hash-green) and the two
# new multi-batch streaming gates (st10/st11), 43-50 are the r2-era
# bench-set queries (q5/q13/q18/a2/j2/w1/e1/x1).  q1 sits at 51: it is the
# driver's own entry() smoke check every round, the only registry query
# with standing per-round evidence outside this window.  d7/g23 (changed
# by the connected-components rewrite) follow — they are r3-green, within
# the two-round freshness bar, and locally parity-proven this round — then
# the rest of the r3-era set (the r6 rotation), then the r4-green set.
_PRIORITY = [
    # 1-39: last driver row is round 2, not in the bench headline set
    "q3_top_orders", "q4_order_priority", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_profit",
    "q10_returned_items", "q12_priority_by_flag", "q14_promo_revenue",
    "q15_top_supplier", "q17_small_qty_revenue", "q19_discounted_revenue",
    "q21_waiting_supplier", "q22_idle_customers",
    "a1_rollup", "a3_grouping_sets", "a4_distinct_aggs",
    "s1_setops", "s2_exists_in", "s3_scalar_subquery",
    "j1_semi_anti", "p1_pivot", "r1_cte_values_rangejoin",
    "r2_parameterized", "t1_topk",
    "w2_rank_parts", "w3_lag_lead", "w4_ntile_moving_avg",
    "e2_tumbling_window", "e3_json_extract",
    "x2_quality_score", "x3_langid", "x4_lang_quality_rollup",
    "x5_bpe_tokens", "x6_rolling_fingerprint",
    "d3_lsh_pairs", "d4_simhash", "d5_embedding_dups", "d6_ngram_jaccard",
    # 40-43: changed or added in round 5 (d2's minhash switched to the
    # single-digest slice scheme — its r4 hash row describes old values,
    # so it re-enters the window; d3's oracle moved in lockstep and is
    # already at position 37)
    "d11_dedup_reduction_report", "d2_minhash_signatures",
    "st10_stream_heavy_hitters_multibatch", "st11_stream_cdc_multibatch",
    # 44-50: r2-era bench-set queries (also timed every round by
    # bench.py); x1 is the one bench query displaced to 51+ by d2's
    # re-entry — it is the lowest-risk member (pure projection, md5
    # fingerprint, impl unchanged since r2) and is first in line for r6
    "q5_local_supplier", "q13_customer_distribution",
    "q18_large_volume_customer", "a2_cube", "j2_brand_supplier_revenue",
    "w1_running_total", "e1_sessionization",
    # 51+: q1 = the driver entry() smoke check; x1 as above; the round-5
    # additions x18-x21, d12, st12, sp4, m4 (each locally parity-proven
    # at sf0.001 + sf0.01 AND in a hostile session, driver-gated in r6);
    # then the queries touched by the round-5 connected-components
    # rewrite (r3-green + locally parity-proven); then the r3-era set,
    # first in line for round 6
    "q1_pricing_summary", "x1_token_stats",
    "x18_pii_redaction", "x19_sequence_packing",
    "x20_gopher_repetition", "x21_ngram_lm_score", "d12_incremental_dedup",
    "st12_stream_incremental_dedup", "sp4_token_budget_mixture",
    "m4_media_resize", "x22_curation_funnel", "v9_embedding_dim_health",
    "d7_dedup_clusters", "g23_dbscan_clusters",
    "s4_setops_all", "b1_bucketed_join", "a6_percentiles",
    "w5_groups_frame", "w6_distribution_ranks",
    "e4_asof_join", "e5_hypertable_rollup",
    "x7_quality_filter_pipeline", "x8_langid_ngram",
    "d8_embedding_sign_lsh", "d9_winnow_pairs",
    "v3_knn_multiprobe", "v4_knn_ivf", "v5_centroid_cosine",
    "v6_scalar_quantize",
    "g4_translate_bounds", "g5_wkt_roundtrip",
    "g6_spatial_join_points_in_boxes", "g7_dwithin_join",
    "g8_rect_within_join", "g9_sql_spatial_join", "g10_geo_statistics",
    "g11_sql_outer_spatial_join", "g12_sql_cte_spatial_join",
    "g13_mvt_points", "g14_sql_multi_join_spatial",
    "g18_sql_chain_spatial_second",
    "c1_scan_duckdb", "c2_scan_sqlite", "c3_scan_csv", "c4_scan_json",
    "m1_multimodal_decode", "m2_frame_sampling", "m3_byte_histogram",
    "pg1_pg_type",
    "st1_stream_sessionization", "st2_stream_tumbling",
    "st3_stream_sliding", "st4_stream_interval_join", "st5_stream_dedup",
    "st6_stream_static_join",
]


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
