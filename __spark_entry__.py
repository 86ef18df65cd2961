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
    curation,
    dedup,
    multimodal,
    relational,
    scalar_funcs,
    similarity,
    text,
)
from iceberg_kafka_playgroud_spark import catalog, snapshots  # noqa: E402
from iceberg_kafka_playgroud_spark.sources import kafka_avro  # noqa: E402
from iceberg_kafka_playgroud_spark.streaming import ingest  # noqa: E402

_MODULES = [
    relational,
    scalar_funcs,
    text,
    dedup,
    curation,
    similarity,
    multimodal,
    advanced,
    ingest,
    kafka_avro,
    catalog,
    snapshots,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-shaped
    snowflake join + aggregation (SURVEY §7 phase 1)."""
    return relational.q5_region_revenue(spark, "/root/testdata/sf0.001")


# The driver's correctness harness checks the FIRST 50 registry
# entries per round.  Rounds 1+2 covered 100 distinct entries (98
# green); the 47 below had never earned a driver row as of round 3,
# so they sort first.  Slots 48-50 are this round's fixes/re-checks:
# array_hof (r2 red: raw-array cell, now serialized),
# agg_approx_distinct (r2 "no_oracle", now a within-5%-bound boolean
# with an exact TRUE oracle), and dedup_simhash_hamming (green in r2
# but its signature widened 32->64 bits this round).  Previously-green
# entries follow.  Keep newly added queries inside _PRIORITY until
# they earn a driver row.
_PRIORITY = [
    # -- 47 never-driver-checked (rounds 1-2) --
    "schema_evolution_roundtrip", "join_bucketed_colocated",
    "stream_rate_limited_ingest",
    "q4_order_priority", "q7_volume_shipping", "q8_market_share",
    "q13_customer_distribution", "q22_idle_customers",
    "q2_min_cost_supplier", "q9_product_profit", "q11_important_parts",
    "q12_ship_priority_class", "q15_top_supplier", "q16_supplier_counts",
    "q17_small_qty_revenue", "q20_dominant_suppliers", "q21_last_shipper",
    "split_train_val_test", "stratified_sample_per_source",
    "sequence_pack_contiguous", "vocab_top_terms",
    "contamination_ngram_overlap", "quality_filter_funnel",
    "dedup_keep_canonical", "embedding_centroids",
    "event_sessionize_batch", "stream_upsert_latest",
    "agg_stats_moments", "window_cume_dist",
    "regex_functions", "bit_functions", "array_set_functions",
    "multimodal_audio_rms", "curation_pipeline_end_to_end",
    "events_zscore_normalize", "user_behavior_features",
    "snapshot_expire", "snapshot_incremental_read",
    "stream_snapshot_ingest", "stream_dim_enrichment",
    "sort_nulls_ordering", "agg_collect_list_set", "str_format_functions",
    "stream_sliding_counts", "join_salted_skew",
    "null_safe_functions", "explode_outer_tokens",
    # -- slots 48-50: round-3 fixes / changed-semantics re-checks --
    "array_hof", "agg_approx_distinct", "dedup_simhash_hamming",
    # -- previously driver-green (rounds 1-2) --
    "nested_types", "explode_unnest", "table_stats",
    "purchase_event_fabric", "event_time_tumbling",
    "text_token_count", "text_bpe_token_count", "text_quality_score",
    "text_lang_id", "text_fingerprint", "doc_stats_by_source",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "ann_topk_bruteforce", "ann_topk_blocked",
    "embedding_near_dup_pairs", "embedding_near_dup_lsh",
    "multimodal_features", "multimodal_resize",
    "multimodal_frame_sample", "asof_last_purchase", "agg_salted_skew",
    "sample_hash_bucket", "grouping_sets_agg", "percentile_exact",
    "union_by_name", "intersect_all_keys", "pandas_udf_scalar",
    "pandas_udf_grouped_agg", "applyinpandas_rank", "ann_topk_lsh",
    "stream_tumbling_counts", "stream_stream_join", "stream_exact_dedup",
    "stream_sessionize", "stream_dual_sink", "stream_stateful_user_totals",
    "confluent_roundtrip", "catalog_table_columns",
    "catalog_write_read_roundtrip",
    "dedup_connected_components", "ann_topk_ivf",
    "interval_join_events", "snapshot_time_travel", "snapshot_files",
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
