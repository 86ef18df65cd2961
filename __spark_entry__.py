"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``iceberg_kafka_playgroud_spark`` (SURVEY.md §2
inventory); this module only aggregates the per-module registries.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from iceberg_kafka_playgroud_spark.operators import (  # noqa: E402
    advanced,
    audit,
    curation,
    dedup,
    multimodal,
    relational,
    scalar_funcs,
    similarity,
    temporal,
    text,
)
from iceberg_kafka_playgroud_spark import catalog, snapshots  # noqa: E402
from iceberg_kafka_playgroud_spark.sources import kafka_avro, python_datasource  # noqa: E402
from iceberg_kafka_playgroud_spark.streaming import ingest  # noqa: E402

_MODULES = [
    relational,
    audit,
    scalar_funcs,
    temporal,
    text,
    dedup,
    curation,
    similarity,
    multimodal,
    advanced,
    ingest,
    kafka_avro,
    python_datasource,
    catalog,
    snapshots,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-shaped
    snowflake join + aggregation (SURVEY §7 phase 1)."""
    return relational.q5_region_revenue(spark, "/root/testdata/sf0.001")


# The driver's correctness harness checks the FIRST 50 registry
# entries per round.  Round 9 ordering (per the r8 verdict task #1):
# the 25 queries that have never received a driver row (4 r7
# stragglers + the 21 round-8 operators, all judge-verified at sf0.01
# in r8) lead; the remaining 25 window slots are the stalest greens
# (rows last checked in round 1), then everything else in ascending
# last-checked-round order.  New round-9 operators append after the
# never-checked block as they land.
_PRIORITY = [
    "events_activity_powerlaw", "multimodal_aspect_bucket", "graph_bfs_reachability",
    "source_xml_roundtrip", "text_pmi_bigrams", "text_zipf_slope",
    "sample_systematic_pps", "basket_diversity_simpson", "embedding_dbscan_core",
    "graph_label_propagation", "cogroup_asof_attribution", "snapshot_file_size_audit",
    "multimodal_color_histogram", "stream_stream_left_outer", "ann_mmr_rerank",
    "text_feature_hashing", "text_collated_terms", "sql_parameterized_query",
    "orders_survival_hazard", "dedup_chunk_stitch_audit", "dedup_weighted_jaccard",
    "ann_ivfpq_residual_topk", "udtf_table_arg_deltas", "sketch_misra_gries_heavy",
    "graph_kcore_peel", "text_bpe_token_count", "text_quality_score",
    "text_lang_id", "text_fingerprint", "doc_stats_by_source",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "ann_topk_bruteforce", "ann_topk_blocked",
    "embedding_near_dup_pairs", "embedding_near_dup_lsh", "multimodal_features",
    "multimodal_resize", "multimodal_frame_sample", "dedup_connected_components",
    "ann_topk_ivf", "snapshot_time_travel", "agg_salted_skew",
    "sample_hash_bucket", "grouping_sets_agg", "percentile_exact",
    "union_by_name", "intersect_all_keys", "pandas_udf_scalar",
    "pandas_udf_grouped_agg", "applyinpandas_rank", "ann_topk_lsh",
    "snapshot_files", "confluent_roundtrip", "catalog_table_columns",
    "catalog_write_read_roundtrip", "array_hof", "agg_approx_distinct",
    "dedup_simhash_hamming", "schema_evolution_roundtrip", "join_bucketed_colocated",
    "stream_rate_limited_ingest", "stream_snapshot_ingest", "events_zscore_normalize",
    "snapshot_expire", "snapshot_incremental_read", "sort_nulls_ordering",
    "str_format_functions", "join_salted_skew", "null_safe_functions",
    "explode_outer_tokens", "regex_functions", "bit_functions",
    "agg_stats_moments", "window_cume_dist", "embedding_centroids",
    "q4_order_priority", "q7_volume_shipping", "q8_market_share",
    "q13_customer_distribution", "q22_idle_customers", "q2_min_cost_supplier",
    "q9_product_profit", "q11_important_parts", "q15_top_supplier",
    "q16_supplier_counts", "q17_small_qty_revenue", "q20_dominant_suppliers",
    "q21_last_shipper", "stratified_sample_per_source", "vocab_top_terms",
    "contamination_ngram_overlap", "date_functions", "purchase_event_fabric",
    "event_sessionize_batch", "interval_join_events", "stream_tumbling_counts",
    "stream_sessionize", "stream_stream_join", "stream_dual_sink",
    "stream_sliding_counts", "q12_ship_priority_class", "split_train_val_test",
    "sequence_pack_contiguous", "quality_filter_funnel", "dedup_keep_canonical",
    "curation_pipeline_end_to_end", "user_behavior_features", "array_set_functions",
    "agg_collect_list_set", "text_repetition_filter", "pii_scrub_stats",
    "decontaminate_exact", "token_length_histogram", "embedding_quantize_int8",
    "vocab_oov_rate", "dedup_incremental_minhash", "session_funnel",
    "stream_windowed_topk", "embedding_top_component", "ann_recall_eval",
    "text_langid_confusion", "stream_anomaly_zscore", "udtf_char_ngrams",
    "agg_approx_percentile", "multimodal_payload_dedup", "text_char_entropy_proxy",
    "orders_rfm_segmentation", "events_cohort_retention", "event_time_tumbling",
    "asof_last_purchase", "stream_exact_dedup", "stream_stateful_user_totals",
    "stream_upsert_latest", "stream_dim_enrichment", "math_functions",
    "json_functions", "conditional_case", "nested_types",
    "explode_unnest", "table_stats", "text_token_count",
    "dedup_cluster_stats", "text_ngram_novelty", "join_asof_nearest",
    "stream_incremental_dedup", "multimodal_phash_near_dup", "graph_pagerank",
    "embedding_kmeans_lloyd", "stream_quality_gate", "merge_scd1_apply",
    "dedup_cluster_canonical", "embedding_cluster_components", "embedding_cluster_canonical",
    "snapshot_delete_rows", "multimodal_scene_changes", "winsorize_event_values",
    "order_reconciliation_audit", "dq_constraint_suite", "graph_triangle_count",
    "item_item_cosine", "sketch_kmv_distinct", "text_bm25_retrieval",
    "events_last_touch_attribution", "stream_session_window_native", "snapshot_changelog_diff",
    "hybrid_rrf_retrieval", "dedup_lexical_semantic_eval", "bloom_filter_probe",
    "events_rolling_distinct_users", "snapshot_partition_evolution", "bpe_train_merges",
    "chunk_exact_dedup", "source_python_datasource", "basket_association_rules",
    "multimodal_audio_fingerprint", "recursive_cte_hierarchy", "lateral_join_topk",
    "corpus_report_card", "ann_matryoshka_recall", "scd2_history_build",
    "dedup_similarity_histogram", "quality_dup_calibration", "stream_windowed_approx_users",
    "ann_incremental_assign", "source_vocab_divergence", "orders_rapid_repeat_audit",
    "bpe_encode_corpus", "curation_shard_write", "snapshot_orphan_audit",
    "snapshot_wap_publish", "dq_star_schema_ri_audit", "basket_pair_frequency",
    "ann_index_persist_probe", "time_gapfill_locf", "events_median_abs_deviation",
    "orders_open_concurrency", "window_range_time", "user_activity_streaks",
    "events_trend_slope", "events_changepoint_cusum", "fuzzy_join_levenshtein",
    "scd2_dimension_join", "dedup_containment_pairs", "embedding_norm_outliers",
    "snapshot_rollback", "sketch_countmin_terms", "zorder_layout_audit",
    "mixture_resample_balanced", "text_unigram_logprob", "orders_abc_analysis",
    "quality_weighted_sample", "events_throttle_dedup", "text_bigram_logprob",
    "rollup_serving_equivalence", "doc_chunking", "text_keyword_extraction",
    "source_csv_roundtrip", "source_jsonl_roundtrip", "events_moving_average",
    "unpivot_part_measures", "table_profile_orders", "events_daily_growth",
    "events_time_rollup", "text_sentence_stats", "conversion_latency_quantiles",
    "curation_global_shuffle", "dedup_semantic_semdedup", "decontaminate_fuzzy_minhash",
    "source_orc_roundtrip", "dedup_minhash_band_skew_audit", "events_seasonality_dow",
    "curation_epoch_repeat_plan", "curation_packing_efficiency_audit", "snapshot_branch_tag",
    "join_asof_forward", "text_readability_score", "orders_ltv_cohort_matrix",
    "stream_ann_cell_assign", "time_gapfill_interpolate", "sink_python_datasource",
    "dedup_cross_lingual_pairs", "sketch_hll_rollup_merge", "vocab_fertility_by_lang",
    "snapshot_upsert_rows", "stream_decontaminate_gate", "events_markov_transitions",
    "graph_link_prediction", "split_largest_remainder", "mixture_token_waterfill",
    "text_boilerplate_coverage", "stream_dedup_within_watermark", "source_python_stream_reader",
    "snapshot_mor_read", "ann_pq_adc_topk", "events_autocorr_lag7",
    "dedup_minhash_calibration", "sketch_theta_set_ops", "sketch_kll_quantiles",
    "batch_session_window_native", "json_variant_shred", "arrow_map_batches",
    "events_m4_downsample", "snapshot_sorted_rewrite", "batch_observe_metrics",
    "write_dynamic_partition_overwrite", "dq_benford_audit", "events_bot_regularity",
    "source_json_corrupt_records", "session_top_paths", "catalog_view_roundtrip",
    "ann_ivf_nprobe_curve", "multimodal_silence_trim", "stat_crosstab_contingency",
    "rollup_grouping_id", "snapshot_incremental_view_maintenance", "snapshot_metadata_only_count",
    "orders_gini_concentration", "events_peak_detection", "dedup_cluster_cohesion",
    "dedup_loss_by_source", "orders_reorder_intervals", "vocab_coverage_curve",
    "events_dow_adjusted_anomaly", "embedding_dim_variance", "text_gopher_quality_rules",
    "text_ttr_lexical_diversity", "mixture_temperature_weights", "dedup_prefix_template",
    "ann_radius_count", "embedding_knn_label_eval", "stream_chained_windows",
]


def _ordered(merged: dict) -> dict:
    front = {n: merged[n] for n in _PRIORITY if n in merged}
    back = {n: v for n, v in merged.items() if n not in front}
    return {**front, **back}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return _ordered(out)
