"""Rotation tail: _PRIOR_VERIFIED/_LAST_GREEN bookkeeping, pins, and
the all_queries()/all_oracles()/run_entry() driver surface.
"""

from __future__ import annotations

from ._p11 import *  # noqa: F401,F403

# Rotation schedule for the driver's bounded correctness window.
#
# The driver's CORRECTNESS gate checks the first N registered queries in
# `all_queries()` order (N=50 observed in rounds 2-12). To get driver
# verdicts onto every query, `all_queries()` emits not-yet-verified
# queries first (registration order preserved) and already-green ones
# last, oldest green first; freshly-verified names move into
# _PRIOR_VERIFIED each round via ``python tools/rotate.py
# CORRECTNESS_rNN.json`` (which prints these literals — the counts
# below are generated, not hand-maintained). Round-14 state: 378
# registered at round start, 378 driver-green (union r2-r13; r13 was
# 50/50, including all four r13 additions and the wav_vad re-pin).
# No pins pending at round start: the r14 window = round-14 additions
# (_NEW_PARITY_ONLY) + the oldest greens first.
_PRIOR_VERIFIED: frozenset[str] = frozenset({
    "ab_test_cuped", "ab_test_welch", "ann_dpp_pruned_topk",
    "ann_int8_topk", "annotator_agreement_kappa",
    "anova_order_value_by_segment", "anti_join_inactive_customers",
    "approx_quantile_report", "approx_sketches", "asof_last_purchase",
    "balanced_lang_mix", "basket_part_lift", "benford_order_totals",
    "best_of_n_selection", "bh_fdr_nation_tests",
    "binary_file_media_ingest", "bloom_prefilter_orders", "bm25_topk",
    "bmp_feature_report", "bmp_resize_dhash_clusters",
    "bpe_encode_stats", "bpe_merge_table", "bpe_token_estimate",
    "bradley_terry_strengths", "brier_calibration_report",
    "bucketed_colocated_revenue", "bucketize_acctbal",
    "canonical_part_names", "cdc_chunk_dedup_histogram",
    "cdc_order_changes", "changepoint_revenue_report",
    "chat_format_lint", "chunk_dup_profile", "cleaning_corners",
    "cluster_aware_split", "cms_width_error_sweep",
    "coerce_missing_markers", "cohort_ltv_curve",
    "column_histogram_orders", "column_profile_lineitem",
    "compaction_bin_plan", "conformal_coverage_report",
    "conjunctive_slice", "consistent_user_sample", "containment_pairs",
    "contrastive_pairs_dataset", "corpus_bigram_lift",
    "corpus_build_e2e", "corpus_build_v2_e2e", "corpus_build_v3_e2e",
    "corpus_build_v4_e2e", "corpus_mix_apply", "corpus_mix_plan",
    "corpus_ngram_diversity", "corpus_release_readiness",
    "corpus_vocabulary_topk", "corpus_zipf_slope",
    "country_alias_normalize", "cross_source_ngram_overlap",
    "csv_corrupt_record_audit", "cube_orders_status_year",
    "cube_status_priority", "curation_pipeline_stats",
    "curriculum_order_docs", "customer_activity_islands",
    "customer_order_count_histogram", "customer_rfm_segments",
    "cv_fold_stats", "daily_revenue_acf", "daily_revenue_momentum",
    "data_profile_orders", "decontaminate_docs",
    "dedup_cluster_size_histogram", "dedup_clusters",
    "dedup_embedding_cosine", "dedup_embedding_cosine_srp",
    "dedup_exact_docs", "dedup_jaccard_df_capped", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_survivors_by_quality",
    "deletion_propagation_audit", "deterministic_slice",
    "disjunctive_pushdown_revenue", "distinct_rollup_hierarchy",
    "doc_bigram_logprob", "doc_char_entropy", "doc_chunks_512",
    "doc_fingerprint", "doc_quality_score", "doc_repetition_stats",
    "doc_winnowing", "domain_crawl_profile", "dominant_part_suppliers",
    "dp_nation_order_stats", "dr_policy_value_report",
    "dsir_selection_report", "dup_rate_by_source",
    "eb_shrunk_source_quality", "ece_calibration_report",
    "embedding_cosine_topk", "embedding_coverage_audit",
    "embedding_drift_report", "embedding_gram_power",
    "embedding_int8_quantization", "embedding_lloyd_step",
    "embedding_lsh_buckets", "embedding_norms", "epoch_mixing_apply",
    "epoch_mixing_plan", "event_gap_slo_report",
    "event_trigram_patterns", "events_anomaly_mad", "events_hourly",
    "events_moving_sum", "events_range_frame_sum",
    "events_resample_ffill", "events_sliding_windows",
    "events_zscore_outliers", "ewma_daily_revenue",
    "exists_late_shipments", "expectations_orders_report",
    "export_manifest_report", "fd_discovery_audit",
    "feature_hash_embeddings", "feature_information_gain",
    "fingerprint_diff_report", "fk_and_null_audit",
    "flagship_nation_year_rate", "forecast_backtest_mase",
    "forecast_revenue_change", "fs_em_weight_estimation",
    "fs_linkage_score_histogram", "funnel_view_click_purchase",
    "fuzzy_name_matching", "fuzzy_part_name_pairs", "gif_header_report",
    "global_rank_orders", "gopher_quality_rules",
    "grouping_sets_revenue", "hard_negative_mining",
    "hash_bootstrap_revenue_ci", "hash_sample_docs",
    "having_large_volume_orders", "heaps_law_fit", "heavy_hitters_cms",
    "hll_register_distinct", "holt_forecast_region_revenue",
    "hot_key_share_report", "hybrid_rrf_topk", "image_dhash_clusters",
    "important_parts_share", "incremental_agg_maintenance",
    "incremental_dedup_assign", "incremental_join_maintenance",
    "int8_recall_report", "interval_bucket_join",
    "inverse_scaling_fit_report", "inverted_index_postings",
    "ips_policy_value_report", "isotonic_calibration_bins",
    "ivf_incremental_assign", "ivf_nprobe_recall_sweep",
    "ivf_recall_report", "ivf_topk", "ivfpq_topk",
    "jaccard_threshold_sweep", "jackknife_ratio_ci",
    "jdbc_roundtrip_report", "join_size_estimate_report",
    "jpeg_sof_report", "json_corrupt_record_audit",
    "json_props_extract", "jsonl_roundtrip_report",
    "k_anonymity_report", "kaplan_meier_user_lifetime",
    "keyed_dedup_first_wins", "kmv_theta_intersection",
    "knn_beam_search_recall", "knn_graph_delta_delete",
    "knn_graph_delta_merge", "krippendorff_alpha_report",
    "ks_chars_by_lang", "l_diversity_report", "label_centroids",
    "label_noise_confident_report", "lang_confusion_matrix",
    "lang_id_predict", "lang_source_chisq_cells", "late_arrival_audit",
    "length_bucketed_batching", "lineitem_corr_matrix",
    "lookup_join_fallback", "lsh_band_sweep", "lsh_recall_report",
    "mannwhitney_value_by_event_type", "markov_event_stationary",
    "maxsim_late_interaction_topk", "mde_power_analysis",
    "median_imputation_report", "merge_orders_full",
    "merkle_partition_proof", "min_cost_supplier_per_part",
    "mmr_diverse_topk", "mp4_mvhd_report", "mulaw_codec_report",
    "multiformat_join_report", "multimodal_audio_chunks",
    "multimodal_binary_meta", "multimodal_frame_sample",
    "multimodal_shard_plan", "naive_bayes_langid_report",
    "nation_market_share", "nation_pair_volume",
    "nation_price_qty_corr", "nation_revenue_cusum",
    "nation_revenue_trend", "nation_trade_bfs_hops",
    "nation_trade_cheapest_route", "nation_trade_communities",
    "nation_trade_hits", "nation_trade_k_core", "nation_trade_pagerank",
    "nation_trade_triangles", "nation_value_share",
    "nation_year_profit", "nelson_aalen_hazard",
    "not_exists_rich_inactive", "ntile_customer_quartiles",
    "ols_leverage_outliers", "orc_roundtrip_report",
    "order_gaps_lead_lag", "order_total_reconciliation",
    "order_window_overlap", "orders_above_customer_avg",
    "orders_equidepth_deciles", "orders_seasonality_yoy",
    "outer_join_order_counts", "pack_payloads_per_seq",
    "pack_sequences", "pack_stats_per_lang", "packing_length_sweep",
    "parquet_schema_merge_report", "partitioned_warehouse_prune",
    "parts_supplier_breadth", "permutation_test_nation_revenue",
    "perplexity_buckets", "pii_redaction_report", "pivot_event_matrix",
    "png_header_report", "ppjoin_rare_shingle_pairs",
    "ppjoin_word_set_pairs", "ppm_feature_report", "pps_doc_sample",
    "pq_adc_topk", "pq_codes_embeddings", "pq_recall_report",
    "preference_pair_audit", "prefix_cache_hit_report",
    "pricing_summary", "priority_lines_matrix", "promo_revenue_share",
    "props_variant_histogram", "psi_price_drift",
    "pyds_reader_roundtrip_e2e", "quality_classifier_filter",
    "quality_quantile_align", "quality_weighted_sample",
    "quantile_treatment_effect", "quantiles_order_value",
    "quota_sample_per_lang", "range_violations", "raw_text_log_parse",
    "readability_report", "region_revenue", "region_revenue_quad_trend",
    "retrieval_ranking_metrics", "returned_item_customers",
    "revenue_gini_by_nation", "roc_auc_length_vs_dup",
    "rolling_corr_nation_global", "rolling_distinct_users",
    "rolling_median_daily_revenue", "rollup_region_nation",
    "rounding_contract", "salted_event_totals",
    "salted_join_user_enrichment", "sample_scaling_curve_report",
    "scattergeo_trace_specs", "scd2_point_in_time_join",
    "scd2_price_history", "schema_evolution_union",
    "self_join_blowup_events", "semantic_packing_order_report",
    "semdedup_verdicts", "semdedup_verdicts_scaled",
    "semi_join_active_customers", "session_gap_sensitivity",
    "session_pattern_match", "sessionize_events", "set_ops_customers",
    "shipping_delay_profile", "shipping_priority", "simhash_near_pairs",
    "simhash_signatures", "skyline_customers", "small_quantity_orders",
    "snm_part_name_pairs", "source_frequency_cap",
    "source_lang_simpson", "source_loo_value_report",
    "source_mix_report", "source_term_kl", "spatial_grid_nn",
    "spearman_price_qty_by_nation", "split_leakage_audit",
    "sprt_conversion_monitor", "sql_api_revenue_rank",
    "srm_check_report", "stl_daily_revenue", "stratified_lang_sample",
    "stratified_uplift_report", "streaming_ann_index_e2e",
    "streaming_attribution_e2e", "streaming_batch_parity_e2e",
    "streaming_curate_e2e", "streaming_dedup_e2e",
    "streaming_enrich_e2e", "streaming_lsh_dedup_e2e",
    "streaming_pyds_sink_e2e", "streaming_rest_poll_e2e",
    "streaming_sessionize_e2e", "streaming_stateful_totals_e2e",
    "string_normalize_profile", "strip_boilerplate_tokens",
    "supplier_adamic_adar_links", "supplier_nation_volume",
    "suppliers_kept_orders_waiting", "synthetic_sku_profile",
    "t_closeness_report", "table_fingerprint_orders",
    "temperature_mixing_plan", "tfidf_cosine_pairs", "tfidf_top_terms",
    "theil_sen_region_trend", "token_count_profile",
    "tokenizer_fertility_by_lang", "top3_orders_per_priority",
    "top_k_orders", "top_orders_with_ties", "top_revenue_supplier",
    "trade_community_modularity", "train_holdout_split",
    "training_shuffle_order", "two_stage_rerank_topk",
    "uncertainty_sampling_batch", "union_fold_by_year",
    "uniqueness_violations", "unpivot_event_matrix",
    "upsert_conflict_ignore", "upsert_delete_keys",
    "upsert_history_report", "upsert_replace_orders",
    "upsert_time_travel", "upsert_version_diff", "url_canonical_dedup",
    "user_cooccurrence_pairs", "user_feature_store",
    "user_inactivity_gaps", "user_journey_prefixes",
    "validated_m2o_join", "verbatim_window_pairs", "viz_hover_points",
    "viz_point_specs", "vocab_coverage_report", "wav_autocorr_report",
    "wav_header_report", "wav_pcm_stats", "wav_vad_segments_report",
    "webdataset_shard_index", "weekly_retention_cohorts",
    "weighted_priority_sample", "wilcoxon_signed_rank_purchase_vs_view",
    "window_running_total", "winsorized_event_stats",
    "worst_group_metric_report", "zone_map_skipping_report",
    "zorder_clustering_report"
})

_LAST_GREEN: dict[str, int] = {}
_LAST_GREEN.update(dict.fromkeys([  # round 5: 29 greens
    "bloom_prefilter_orders", "bucketed_colocated_revenue",
    "chunk_dup_profile", "corpus_bigram_lift", "corpus_build_e2e",
    "corpus_ngram_diversity", "corpus_zipf_slope", "doc_bigram_logprob",
    "doc_char_entropy", "embedding_gram_power", "embedding_lloyd_step",
    "events_range_frame_sum", "ewma_daily_revenue", "heavy_hitters_cms",
    "holt_forecast_region_revenue", "inverted_index_postings",
    "lang_source_chisq_cells", "nation_price_qty_corr",
    "nation_revenue_trend", "nation_trade_pagerank",
    "props_variant_histogram", "quality_quantile_align",
    "revenue_gini_by_nation", "rolling_median_daily_revenue",
    "salted_join_user_enrichment", "scd2_point_in_time_join",
    "schema_evolution_union", "upsert_version_diff",
    "winsorized_event_stats"
], 5))
_LAST_GREEN.update(dict.fromkeys([  # round 6: 42 greens
    "basket_part_lift", "bpe_encode_stats", "bpe_merge_table",
    "canonical_part_names", "corpus_release_readiness",
    "cube_orders_status_year", "curriculum_order_docs", "cv_fold_stats",
    "daily_revenue_acf", "embedding_drift_report", "epoch_mixing_apply",
    "epoch_mixing_plan", "event_gap_slo_report",
    "expectations_orders_report", "export_manifest_report",
    "fd_discovery_audit", "feature_information_gain",
    "fuzzy_part_name_pairs", "hard_negative_mining",
    "jsonl_roundtrip_report", "k_anonymity_report",
    "median_imputation_report", "merge_orders_full",
    "multiformat_join_report", "perplexity_buckets",
    "quality_classifier_filter", "self_join_blowup_events",
    "session_gap_sensitivity", "source_frequency_cap", "source_term_kl",
    "split_leakage_audit", "stl_daily_revenue", "streaming_curate_e2e",
    "streaming_enrich_e2e", "strip_boilerplate_tokens",
    "table_fingerprint_orders", "tokenizer_fertility_by_lang",
    "upsert_delete_keys", "upsert_history_report",
    "user_cooccurrence_pairs", "vocab_coverage_report",
    "zorder_clustering_report"
], 6))
_LAST_GREEN.update(dict.fromkeys([  # round 8: 43 greens
    "ab_test_cuped", "ab_test_welch", "anova_order_value_by_segment",
    "approx_quantile_report", "benford_order_totals", "bm25_topk",
    "cohort_ltv_curve", "column_histogram_orders",
    "corpus_build_v2_e2e", "country_alias_normalize",
    "distinct_rollup_hierarchy", "dsir_selection_report",
    "embedding_coverage_audit", "event_trigram_patterns",
    "fingerprint_diff_report", "global_rank_orders", "ivf_topk",
    "jdbc_roundtrip_report", "kaplan_meier_user_lifetime",
    "ks_chars_by_lang", "late_arrival_audit", "lineitem_corr_matrix",
    "multimodal_shard_plan", "nation_revenue_cusum",
    "nation_trade_k_core", "order_total_reconciliation",
    "order_window_overlap", "orders_equidepth_deciles",
    "pps_doc_sample", "pq_adc_topk", "pq_codes_embeddings",
    "pq_recall_report", "psi_price_drift", "region_revenue_quad_trend",
    "rolling_corr_nation_global", "semdedup_verdicts",
    "session_pattern_match", "snm_part_name_pairs", "spatial_grid_nn",
    "synthetic_sku_profile", "temperature_mixing_plan",
    "tfidf_cosine_pairs", "user_feature_store"
], 8))
_LAST_GREEN.update(dict.fromkeys([  # round 9: 44 greens
    "brier_calibration_report", "cdc_chunk_dedup_histogram",
    "cluster_aware_split", "cms_width_error_sweep", "conjunctive_slice",
    "corpus_build_v3_e2e", "domain_crawl_profile",
    "dp_nation_order_stats", "fk_and_null_audit",
    "flagship_nation_year_rate", "forecast_backtest_mase",
    "gif_header_report", "image_dhash_clusters",
    "incremental_dedup_assign", "ivf_incremental_assign", "ivfpq_topk",
    "jpeg_sof_report", "keyed_dedup_first_wins", "l_diversity_report",
    "lookup_join_fallback", "mannwhitney_value_by_event_type",
    "maxsim_late_interaction_topk", "mp4_mvhd_report",
    "packing_length_sweep", "png_header_report", "pricing_summary",
    "range_violations", "readability_report",
    "retrieval_ranking_metrics", "roc_auc_length_vs_dup",
    "semi_join_active_customers", "source_lang_simpson",
    "spearman_price_qty_by_nation", "streaming_rest_poll_e2e",
    "streaming_sessionize_e2e", "theil_sen_region_trend",
    "uniqueness_violations", "url_canonical_dedup",
    "validated_m2o_join", "viz_point_specs", "wav_header_report",
    "wav_pcm_stats", "wilcoxon_signed_rank_purchase_vs_view",
    "zone_map_skipping_report"
], 9))
_LAST_GREEN.update(dict.fromkeys([  # round 10: 43 greens
    "asof_last_purchase", "bmp_feature_report",
    "bmp_resize_dhash_clusters", "bucketize_acctbal",
    "chat_format_lint", "coerce_missing_markers", "corpus_build_v4_e2e",
    "csv_corrupt_record_audit", "customer_activity_islands",
    "data_profile_orders", "dedup_clusters", "dedup_exact_docs",
    "deterministic_slice", "doc_quality_score", "embedding_norms",
    "events_moving_sum", "feature_hash_embeddings",
    "forecast_revenue_change", "fuzzy_name_matching",
    "jaccard_threshold_sweep", "json_corrupt_record_audit",
    "lang_id_predict", "lsh_band_sweep", "lsh_recall_report",
    "pivot_event_matrix", "preference_pair_audit",
    "quantiles_order_value", "region_revenue", "rollup_region_nation",
    "rounding_contract", "scattergeo_trace_specs", "sessionize_events",
    "shipping_priority", "small_quantity_orders",
    "string_normalize_profile", "supplier_nation_volume",
    "token_count_profile", "top3_orders_per_priority", "top_k_orders",
    "union_fold_by_year", "viz_hover_points", "wav_autocorr_report",
    "window_running_total"
], 10))
_LAST_GREEN.update(dict.fromkeys([  # round 11: 38 greens
    "annotator_agreement_kappa", "approx_sketches",
    "best_of_n_selection", "changepoint_revenue_report",
    "cleaning_corners", "conformal_coverage_report",
    "cube_status_priority", "deletion_propagation_audit",
    "doc_winnowing", "dr_policy_value_report",
    "eb_shrunk_source_quality", "ece_calibration_report",
    "events_zscore_outliers", "fs_linkage_score_histogram",
    "interval_bucket_join", "inverse_scaling_fit_report",
    "ips_policy_value_report", "isotonic_calibration_bins",
    "krippendorff_alpha_report", "merkle_partition_proof",
    "mmr_diverse_topk", "naive_bayes_langid_report",
    "nation_trade_bfs_hops", "nelson_aalen_hazard",
    "ppm_feature_report", "scd2_price_history", "set_ops_customers",
    "skyline_customers", "source_loo_value_report",
    "sprt_conversion_monitor", "sql_api_revenue_rank",
    "streaming_dedup_e2e", "streaming_pyds_sink_e2e",
    "supplier_adamic_adar_links", "t_closeness_report",
    "uncertainty_sampling_batch", "webdataset_shard_index",
    "weighted_priority_sample"
], 11))
_LAST_GREEN.update(dict.fromkeys([  # round 12: 50 greens
    "bh_fdr_nation_tests", "binary_file_media_ingest",
    "bpe_token_estimate", "bradley_terry_strengths",
    "cdc_order_changes", "contrastive_pairs_dataset",
    "dedup_embedding_cosine", "disjunctive_pushdown_revenue",
    "doc_repetition_stats", "events_sliding_windows",
    "exists_late_shipments", "fs_em_weight_estimation",
    "grouping_sets_revenue", "hash_sample_docs",
    "having_large_volume_orders", "heaps_law_fit", "jackknife_ratio_ci",
    "join_size_estimate_report", "json_props_extract",
    "label_centroids", "label_noise_confident_report",
    "markov_event_stationary", "multimodal_binary_meta",
    "multimodal_frame_sample", "nation_trade_cheapest_route",
    "nation_trade_communities", "nation_trade_triangles",
    "nation_value_share", "ntile_customer_quartiles",
    "ols_leverage_outliers", "orc_roundtrip_report",
    "orders_above_customer_avg", "outer_join_order_counts",
    "parquet_schema_merge_report", "permutation_test_nation_revenue",
    "ppjoin_word_set_pairs", "prefix_cache_hit_report",
    "priority_lines_matrix", "promo_revenue_share",
    "pyds_reader_roundtrip_e2e", "quantile_treatment_effect",
    "quota_sample_per_lang", "raw_text_log_parse",
    "sample_scaling_curve_report", "srm_check_report",
    "stratified_lang_sample", "stratified_uplift_report",
    "trade_community_modularity", "train_holdout_split",
    "worst_group_metric_report"
], 12))
_LAST_GREEN.update(dict.fromkeys([  # round 13: 49 greens
    "ann_int8_topk", "containment_pairs", "corpus_vocabulary_topk",
    "curation_pipeline_stats", "customer_order_count_histogram",
    "daily_revenue_momentum", "decontaminate_docs",
    "dedup_cluster_size_histogram", "dedup_jaccard_df_capped",
    "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_survivors_by_quality", "doc_chunks_512", "doc_fingerprint",
    "dup_rate_by_source", "embedding_int8_quantization",
    "funnel_view_click_purchase", "gopher_quality_rules",
    "incremental_agg_maintenance", "lang_confusion_matrix",
    "mde_power_analysis", "min_cost_supplier_per_part",
    "multimodal_audio_chunks", "nation_market_share",
    "nation_pair_volume", "nation_trade_hits", "order_gaps_lead_lag",
    "pack_payloads_per_seq", "pack_sequences", "pack_stats_per_lang",
    "parts_supplier_breadth", "pii_redaction_report",
    "quality_weighted_sample", "returned_item_customers",
    "salted_event_totals", "simhash_near_pairs", "simhash_signatures",
    "source_mix_report", "streaming_attribution_e2e",
    "streaming_stateful_totals_e2e", "suppliers_kept_orders_waiting",
    "tfidf_top_terms", "top_revenue_supplier", "training_shuffle_order",
    "two_stage_rerank_topk", "unpivot_event_matrix",
    "user_journey_prefixes", "wav_vad_segments_report",
    "weekly_retention_cohorts"
], 13))
_LAST_GREEN.update(dict.fromkeys([  # round 14: 50 greens
    "ann_dpp_pruned_topk", "anti_join_inactive_customers",
    "balanced_lang_mix", "column_profile_lineitem",
    "compaction_bin_plan", "consistent_user_sample", "corpus_mix_apply",
    "corpus_mix_plan", "cross_source_ngram_overlap",
    "customer_rfm_segments", "dedup_embedding_cosine_srp",
    "dominant_part_suppliers", "embedding_cosine_topk",
    "embedding_lsh_buckets", "events_anomaly_mad", "events_hourly",
    "events_resample_ffill", "hash_bootstrap_revenue_ci",
    "hll_register_distinct", "hot_key_share_report", "hybrid_rrf_topk",
    "important_parts_share", "incremental_join_maintenance",
    "int8_recall_report", "ivf_nprobe_recall_sweep",
    "ivf_recall_report", "kmv_theta_intersection",
    "knn_beam_search_recall", "knn_graph_delta_delete",
    "knn_graph_delta_merge", "length_bucketed_batching",
    "mulaw_codec_report", "nation_year_profit",
    "not_exists_rich_inactive", "orders_seasonality_yoy",
    "partitioned_warehouse_prune", "ppjoin_rare_shingle_pairs",
    "rolling_distinct_users", "semantic_packing_order_report",
    "semdedup_verdicts_scaled", "shipping_delay_profile",
    "streaming_ann_index_e2e", "streaming_batch_parity_e2e",
    "streaming_lsh_dedup_e2e", "top_orders_with_ties",
    "upsert_conflict_ignore", "upsert_replace_orders",
    "upsert_time_travel", "user_inactivity_gaps",
    "verbatim_window_pairs"
], 14))


# Queries whose implementation changed this round AFTER their last
# driver verdict — pinned to the front of the window so the stale green
# is replaced. Pins must be backed by an actual diff to the named
# query's plan or oracle. Round 15 (optimization 2/2): the re-planned
# set — doc_repetition_stats (single-pass gram explode, 6→2
# Exchanges), verbatim_window_pairs (char-gram keys unhex'd to 16-byte
# BINARY + the df-cap NULL-item guard), bpe_merge_table /
# bpe_encode_stats (trainer job-count halved: the next round's collect
# is the materializing action, the last rewrite is skipped),
# knn_beam_search_recall / knn_graph_delta_merge /
# knn_graph_delta_delete (driver-side job overlap, guide §2.6 — same
# plans, overlapped checkpoint jobs), ann_dpp_pruned_topk (cells
# descend written directly; the single-consumer output checkpoint
# dropped). All re-verified parity-exact at sf0.01 AND sf0.1 this
# round; pinned so the driver refreshes their stale greens.
_PRIORITY: tuple[str, ...] = (
    "doc_repetition_stats",
    "verbatim_window_pairs",
    "bpe_merge_table",
    "bpe_encode_stats",
    "knn_beam_search_recall",
    "knn_graph_delta_merge",
    "knn_graph_delta_delete",
    "ann_dpp_pruned_topk",
    # second tranche: truth/sigs (band sweep) and truth/cands (recall
    # report) checkpoint chains overlapped — same plans, re-verified
    # exact at both SFs
    "lsh_band_sweep",
    "lsh_recall_report",
    # third tranche: the shared (nation, day) permutation relation is
    # respread before its checkpoint (the 64-way sign explode ran on
    # ONE AQE-coalesced partition) — values partition-independent,
    # re-verified exact at both SFs
    "permutation_test_nation_revenue",
    "bh_fdr_nation_tests",
    # + the retrieval eval harness: embeddings scan respread under the
    # two cosine/dot-fold arms (RoundRobinPartitioning now in plan)
    "retrieval_ranking_metrics",
)


# Queries ADDED this round (construction parity evidence only). Round
# 15 adds none — optimization rounds add no features; all ten round-14
# additions are driver-green in CORRECTNESS_r14 and have moved into
# _PRIOR_VERIFIED.
_NEW_PARITY_ONLY: tuple[str, ...] = ()


def _rotated() -> list[str]:
    names = list(REGISTRY)
    skip = set(_PRIORITY) | set(_NEW_PARITY_ONLY)
    front = [n for n in names if n not in _PRIOR_VERIFIED and n not in skip]
    back = [n for n in names if n in _PRIOR_VERIFIED and n not in skip]
    # Oldest driver-green first so re-verification slots refresh the
    # stalest verdicts; ties keep registration order.
    order = {n: i for i, n in enumerate(names)}
    back.sort(key=lambda n: (_LAST_GREEN.get(n, 0), order[n]))
    return (
        [n for n in _PRIORITY if n in REGISTRY]
        + front
        + [n for n in _NEW_PARITY_ONLY if n in REGISTRY]
        + back
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _rotated()}


def all_oracles() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _rotated()
        if REGISTRY[name].oracle
    }


def run_entry(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return flagship_nation_year_rate(spark, sf_dir)


__all__ = [n for n in globals() if not n.startswith("__")]
