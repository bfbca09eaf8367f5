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


# The driver samples a bounded window (50 in r2/r3) of the registry in dict
# order, so present the queries most in need of a correctness row first.
# Round-4 rotation (VERDICT r3 "Next round" #2): the 18 round-3 queries that
# have never had a driver row go first, then the 7 whose oracles got the
# CAST(sum(...) AS BIGINT) fix this round (re-verify hash-green), then the
# queries whose implementations changed in round 4 (x11 single-scan) and the
# only-r1-green set (g1-g3, v1, v2), then a freshness refill of r1/r2-era
# relational/text/dedup queries.  Every query stays registered either way.
_PRIORITY = [
    # 1-18: never driver-verified (no row in CORRECTNESS_r01/r02/r03)
    "st7_stream_asof_join", "e6_session_window", "a7_stat_aggregates",
    "p2_partition_pruning", "g21_zorder_layout", "u1_scd2_merge",
    "p3_unpivot", "x12_name_resolution", "u2_scd2_snapshot", "e7_funnel",
    "e8_cohort_retention", "w7_cumulative_distinct", "r3_recursive_cte",
    "x13_column_profile", "x14_integrity_checks", "x15_pmi_cooccurrence",
    "x9_vocab_topk", "x10_repetition_ratio",
    # 19-25: r3 hash-miss set — oracle casts fixed in round 4, re-verify
    "g15_sql_exists_spatial", "g16_sql_not_exists_spatial",
    "g17_sql_region_query", "g19_sql_dwithin_join",
    "g20_sql_distance_lt_join", "sp1_stratified_sample", "sp2_hash_sample",
    # then: new in round 4 (k-means, contamination check, CDC merge,
    # embedding outliers, event-gap profile, dedup reduction report, the
    # derived-partsupp TPC-H closures, streaming heavy hitters, tile
    # heatmap) and implementation changed in round 4 (single-scan TF-IDF)
    "v7_kmeans_clusters", "x16_contamination_check", "u3_cdc_merge",
    "v8_embedding_outliers", "e9_event_gap_profile",
    "d11_dedup_reduction_report",
    "q2_min_cost_supplier", "q11_important_stock",
    "q16_parts_supplier_counts", "q20_potential_promotion",
    "st8_stream_heavy_hitters", "g22_tile_heatmap", "c5_scan_orc",
    "sp3_language_rebalance", "x17_lang_confusion", "st9_stream_cdc_upsert",
    "g23_dbscan_clusters",
    "x11_tfidf_top_terms",
    # then: last verified in round 1 — refresh
    "g1_covers_count", "g2_dwithin_count", "g3_envelope_area_sum",
    "v1_knn_bruteforce", "v2_knn_lsh",
    # freshness refill to the window edge (r1/r2-green, unchecked since)
    "d1_exact_dedup", "d2_minhash_signatures", "d3_lsh_pairs", "d4_simhash",
    "d5_embedding_dups", "d6_ngram_jaccard",
    "x1_token_stats", "x2_quality_score", "x3_langid",
    "x4_lang_quality_rollup", "x5_bpe_tokens", "x6_rolling_fingerprint",
    "q1_pricing_summary", "q5_local_supplier", "q13_customer_distribution",
    "q18_large_volume_customer", "j2_brand_supplier_revenue",
    "a2_cube", "w1_running_total",
    # below the driver window: r3-green custom operators (spatial SQL
    # dispatch, streaming, scans, multimodal, ANN) — all hash-green in
    # CORRECTNESS_r03, rotated down to make room
    "g4_translate_bounds", "g5_wkt_roundtrip",
    "g6_spatial_join_points_in_boxes", "g7_dwithin_join",
    "g8_rect_within_join", "g9_sql_spatial_join", "g10_geo_statistics",
    "g11_sql_outer_spatial_join", "g12_sql_cte_spatial_join",
    "g13_mvt_points", "g14_sql_multi_join_spatial",
    "g18_sql_chain_spatial_second",
    "v3_knn_multiprobe", "v4_knn_ivf",
    "c1_scan_duckdb", "c2_scan_sqlite", "c3_scan_csv", "c4_scan_json",
    "m1_multimodal_decode", "m2_frame_sampling", "m3_byte_histogram",
    "pg1_pg_type",
    "st1_stream_sessionization", "st2_stream_tumbling",
    "st3_stream_sliding", "st4_stream_interval_join", "st5_stream_dedup",
    "st6_stream_static_join",
    "d7_dedup_clusters", "d8_embedding_sign_lsh",
    "w5_groups_frame",
    "x7_quality_filter_pipeline", "x8_langid_ngram",
    "s4_setops_all",
    "b1_bucketed_join", "w6_distribution_ranks", "a6_percentiles",
    "e4_asof_join", "e5_hypertable_rollup",
    "v5_centroid_cosine", "v6_scalar_quantize", "d9_winnow_pairs",
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
