"""Central query registry — the single source of truth behind
`__spark_entry__.queries()` / `oracle_sql()`.

Each operator from SURVEY.md §2 registers a named builder
`(spark, sf_dir) -> DataFrame` and (when SQL-expressible) a DuckDB oracle
string. Column names are aliased identically on both sides because the
driver's comparator sorts columns by name before hashing values.

Determinism contract for oracle-checked queries (this is what makes the
value-hash gate pass bit-for-bit):
  * money/double aggregation goes through exact DECIMAL arithmetic
    (`exact.py`) and is cast back to double at the end;
  * every window/limit/top-k order has a unique tie-breaker column;
  * float embeddings are integer-quantized before dot products;
  * no approximate sketches on the oracle path (HLL etc. are rows-only).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

# Module import order (alphabetical-ish; actual registration order is set
# by _SAMPLE_PRIORITY below, which load_all() applies after importing).
_OPERATOR_MODULES = (
    "blockchain2graphdb_spark.operators.graphops",
    "blockchain2graphdb_spark.operators.windows",
    "blockchain2graphdb_spark.operators.textops",
    "blockchain2graphdb_spark.operators.pipeline",
    "blockchain2graphdb_spark.operators.behavior",
    "blockchain2graphdb_spark.operators.sqlsuite",
    "blockchain2graphdb_spark.operators.scalars",
    "blockchain2graphdb_spark.operators.maintenance",
    "blockchain2graphdb_spark.operators.udfs",
    "blockchain2graphdb_spark.operators.dedup",
    "blockchain2graphdb_spark.operators.multimodal",
    "blockchain2graphdb_spark.operators.similarity",
    "blockchain2graphdb_spark.operators.ann_ivf",
    "blockchain2graphdb_spark.operators.ann_pq",
    "blockchain2graphdb_spark.operators.ingestion",
    "blockchain2graphdb_spark.streaming.queries",
    "blockchain2graphdb_spark.operators.relational",
    "blockchain2graphdb_spark.operators.timeseries",
    "blockchain2graphdb_spark.operators.linkage",
    "blockchain2graphdb_spark.operators.mlprep",
    "blockchain2graphdb_spark.operators.spatial",
    "blockchain2graphdb_spark.operators.walks",
    "blockchain2graphdb_spark.operators.evalrank",
    "blockchain2graphdb_spark.operators.experiments",
)

# The driver's correctness gate samples the FIRST ~50 keys in queries()
# order, so registration order is the sampling schedule. Round-10 policy
# (continues the witness-age rotation from VERDICT r6 #4 / r9 #1): keys
# with NO driver witness in any CORRECTNESS_r01..r09 lead (oracle keys
# before rows-only ones — oracle evidence is worth more per gate slot),
# new round-10 keys follow, then oracle keys ordered stalest-witness
# first, then the round-9 block (freshest witnesses), then the already-
# witnessed rows-only keys. The list is COMPLETE — every registry key
# appears (pinned by tests/test_round8_ops.py::
# test_sample_priority_is_complete, since load_all() silently ignores
# missing keys) — so module order no longer matters for sampling.
_SAMPLE_PRIORITY = (
    # --- never-driver-sampled ORACLE keys (VERDICT r9 #1): these 22 must
    # head the r10 gate sample so every oracle key gains a driver witness.
    "target_encode",
    "auc_exact",
    "dbscan_core",
    "dedup_embedding_cosine",
    "lift_gain_table",
    "onehot_encode",
    "quantile_bucketize",
    "confusion_threshold",
    "woe_iv",
    "mutual_information",
    "corr_pairs",
    "iqr_outliers",
    "acf_lags",
    "trend_ols",
    "window_lead_nth",
    "dedup_containment",
    "embedding_outlier_topk",
    "text_readability",
    "scan_partition_prune",
    "feature_hashing",
    "group_kfold",
    "session_path_topk",
    # --- round-10 new keys are inserted here as they land ---
    "join_skew_salted",
    # --- never-driver-sampled rows-only keys (weaker check, still a witness)
    "dedup_embedding_lsh",
    "dedup_minhash",
    "dedup_simhash",
    "kmeans_embeddings",
    "similarity_bruteforce",
    "similarity_ivf",
    "similarity_lsh",
    "similarity_pq",
    "stream_dedup",
    "stream_late_data",
    "stream_session",
    "stream_stateful_agg",
    "stream_watermark",
    "taint_flow",
    # --- oracle keys with r1-r8 witnesses, stalest-witness-first (order kept)
    "random_walk_sample",
    "hypertable_rollup",
    "gap_fill_locf",
    "record_linkage",
    "label_propagation",
    "degree_histogram",
    "text_surprisal",
    "doc_length_band",
    "join_skew_report",
    "dedup_embedding_exact",
    "stream_stateful_agg_exact",
    "session_funnel",
    "join_asof_tolerance",
    "tokenize_to_ids",
    "rolling_dau",
    "stream_hypertable_rollup",
    "ktruss_edges",
    "community_modularity",
    "multimodal_patchify",
    "feature_scale_minmax",
    "chi2_association",
    "split_drift_psi",
    "spatial_radius_join",
    "spatial_knn",
    "seasonality_profile",
    "cusum_drift",
    "week_over_week",
    "two_hop_join",
    "anomaly_daily_zscore",
    "bfs_distance",
    "chain_tip",
    "chain_validity",
    "clustering_coefficient",
    "cohort_retention",
    "contamination_check",
    "copurchase_weights",
    "corpus_mixture",
    "curation_pipeline",
    "degree_stats",
    "dup_rate_by_source",
    "event_transitions",
    "funnel_conversion",
    "graph_assortativity",
    "khop_neighborhood",
    "layout_zorder",
    "neighbor_jaccard",
    "pack_sequences",
    "parent_lookup",
    "sample_hash_topk",
    "sessionize_batch",
    "split_assign",
    "text_clean",
    "text_fingerprint",
    "text_lang_id",
    "text_ngram_freq",
    "text_quality_score",
    "text_repetition",
    "text_tfidf",
    "text_token_stats",
    "token_count",
    "topo_order",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "triangle_count",
    "vocab_coverage",
    "wallet_components",
    "window_first_seen",
    "window_lag",
    "window_ntile",
    "window_range_frame",
    "window_rank",
    "window_row_number",
    "window_running_sum",
    "window_topk_per_group",
    "blockfile_ingest",
    "cascade_delete",
    "dedup_embedding",
    "dedup_exact",
    "dedup_keep_best",
    "dedup_minhash_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash_exact",
    "doc_chunk",
    "embedding_centroids",
    "kcore_membership",
    "kmeans_exact",
    "multimodal_audio_windows",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "pagerank_exact",
    "personalized_pagerank_exact",
    "reorg_rollback",
    "resume_anti_join",
    "scd2_history",
    "similarity_range",
    "similarity_topk",
    "sketch_countmin",
    "snapshot_reorg_overwrite",
    "snapshot_time_travel",
    "str_concat",
    "str_regexp_extract",
    "stream_events",
    "stream_file_tail",
    "stream_merge_sink",
    "stream_parse",
    "stream_rate_source",
    "stream_sliding",
    "stream_static_join",
    "stream_stream_join",
    "stream_tumbling",
    "taint_flow_exact",
    "text_phrase_search",
    "text_pii_mask",
    "text_search",
    "text_search_bm25",
    "udaf_grouped",
    "udf_scalar",
    "udf_with_fallback",
    "udtf_flatmap",
    "update_columns",
    "upsert_insert_if_absent",
    "upsert_merge",
    "utxo_balances",
    "agg_mode",
    "array_explode",
    "array_ops",
    "bpe_merge_pairs",
    "chunk_embed_retrieve",
    "conditional_flag",
    "date_compare",
    "date_parts",
    "date_trunc_group",
    "dedup_cluster_keep_best",
    "dedup_incremental",
    "dedup_substring",
    "embedding_quantize",
    "hits_exact",
    "json_extract",
    "link_prediction_aa",
    "map_ops",
    "math_ops",
    "motif_find",
    "null_coalesce",
    "orders_rfm",
    "profile_table",
    "scan_csv",
    "scan_jsonl",
    "sssp_weighted",
    "str_cast",
    "str_edit_distance",
    "str_format",
    "str_split",
    "stream_dedup_exact",
    "tpch_q10",
    "tpch_q11",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q2",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "tpch_q4",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "unpivot_stack",
    "window_percent_rank",
    "agg_argmax",
    "agg_collect_set",
    "agg_conditional_count",
    "agg_count",
    "agg_count_distinct",
    "agg_cube",
    "agg_first_seen_count",
    "agg_grouping_sets",
    "agg_min_max",
    "agg_percentile",
    "agg_rollup",
    "agg_salted",
    "agg_self_transfer",
    "agg_signed_sum",
    "agg_stats",
    "agg_sum",
    "agg_sum_coalesce",
    "anti_join",
    "counterparties",
    "distinct_rows",
    "expand_children",
    "export_edges",
    "filter_conjunctive",
    "filter_point",
    "histogram_bins",
    "join_anti",
    "join_asof",
    "join_asof_pandas",
    "join_full",
    "join_inner",
    "join_left",
    "join_range",
    "join_salted",
    "join_semi",
    "limit_n",
    "one_hop_join",
    "pivot_table",
    "sample_hash_stratified",
    "scan_parquet",
    "self_transfer_flag",
    "semi_join",
    "set_except",
    "set_intersect",
    "set_union",
    "sort_by_key",
    "stream_session_exact",
    "topk_global",
    "tpch_q12_shape",
    "wallet_components_dist",
    "wallet_ids_incremental",
    # --- round-9 keys: freshest witnesses (all green in CORRECTNESS_r09)
    "inventory_clamped_balance",
    "attribution_linear",
    "gap_detect",
    "stickiness_dau_mau",
    "stream_cdc_apply",
    "scan_orc",
    "weighted_median",
    "udtf_lateral",
    "join_interval_overlap",
    "cdc_apply",
    "ivm_join_delta",
    "variant_extract",
    "recursive_cte_hierarchy",
    "embedding_covariance",
    "subtree_rollup",
    "join_partition_prune_runtime",
    "cuped_adjustment",
    "funnel_time_to_convert",
    "ols_multi",
    "winsorized_mean",
    "impute_group_median",
    "time_weighted_avg",
    "zipf_fit",
    "scan_zonemap_skip",
    "ks_statistic",
    "scan_corrupt_quarantine",
    "weighted_sample_topk",
    "dq_expectations",
    "percentile_summary",
    "ab_test_zscore",
    "snapshot_cdc_diff",
    "kaplan_meier",
    "skyline_pareto",
    "association_rules",
    "mad_robust",
    "entropy_profile",
    "rrf_fusion",
    "dedup_cluster_histogram",
    "ngram_novelty",
    "scan_schema_evolution",
    "concurrent_sessions_max",
    "attribution_last_touch",
    "ndcg_at_k",
    "gini_concentration",
    "cohens_kappa",
    "calibration_bins",
    "resample_ohlc",
    "ewma_trailing",
    "skipgram_pairs",
    # --- rows-only keys already driver-witnessed
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "agg_hll_merge",
    "pagerank",
    "personalized_pagerank",
    "sample_stratified",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query builder under `name`."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    global _LOADED
    if not _LOADED:
        for mod in _OPERATOR_MODULES:
            importlib.import_module(mod)
        # reorder so _SAMPLE_PRIORITY keys come first (driver gate samples
        # registration order); remaining keys keep module order
        prioritized = {k: _REGISTRY.pop(k) for k in _SAMPLE_PRIORITY if k in _REGISTRY}
        prioritized.update(_REGISTRY)
        _REGISTRY.clear()
        _REGISTRY.update(prioritized)
        _LOADED = True
    return dict(_REGISTRY)


def queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
