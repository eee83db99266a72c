"""Scaling probe: time representative queries across the three testdata
scale factors and report the 0.01→0.1 ratio (10× data).

Interpretation: a ratio near 1 means the query is scheduling-floor
bound at these sizes (fixed cost dominates); near 10 means linear in
data; well ABOVE 10 means superlinear — a plan that will not survive a
100× scale-up and needs attention. This is the measured form of the
"would this plan hold at 1000 executors / 100 TB" review question.

Usage: python tools/scaling_probe.py [q1 q2 ...]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# One representative per plan family (scan-agg, broadcast join, window,
# sessionize, shingle explode + band join, iterative CC, self-join
# output-bound, HOF vector math, text explode-agg, packing).
DEFAULT = [
    "pricing_summary",
    "validated_m2o_join",
    "events_hourly",
    "sessionize_events",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "simhash_near_pairs",
    "embedding_cosine_topk",
    "tfidf_top_terms",
    "pack_sequences",
    "balanced_lang_mix",
    # round-5 families: grid expansion + ffill window, broadcast-plan
    # mix filter, shingle self-join across sources, iterative
    # fixed-point PageRank, expansion-join rolling median, nearest-rank
    # winsorize, end-to-end mix→dedup→stats chain
    "events_resample_ffill",
    "corpus_mix_apply",
    "cross_source_ngram_overlap",
    "nation_trade_pagerank",
    "rolling_median_daily_revenue",
    "winsorized_event_stats",
    "corpus_build_e2e",
    # late round-5 families: chunk-frequency shuffle, bigram explode +
    # scalar-broadcast scoring, wedge-join triangles, per-key lag-chain
    # window, posting-list aggregation, exact-moment stats (corr twin
    # covers gini/trend/chisq shapes), per-group+global percentiles
    "chunk_dup_profile",
    "corpus_bigram_lift",
    "nation_trade_triangles",
    "ewma_daily_revenue",
    "inverted_index_postings",
    "nation_price_qty_corr",
    "quality_quantile_align",
    # this session's families: token/bigram distinct-count stats, char
    # explode entropy, LM-score shuffle join, mapInPandas Gram + tiny
    # dim-axis joins, broadcast centroid argmin, bounded CMS explode,
    # Bloom bounded bit join, snapshot write+full-outer-diff
    "corpus_ngram_diversity",
    "doc_char_entropy",
    "doc_bigram_logprob",
    "embedding_gram_power",
    "embedding_lloyd_step",
    "heavy_hitters_cms",
    "bloom_prefilter_orders",
    "upsert_version_diff",
    # final round-5 families: recursive-CTE-twin pandas recursion,
    # variant parse-once, salted join, RANGE frame, Morton bucketing,
    # bucketed self-join projection, single-scan expectations, 3-format
    # federation, privacy census, bucketed checksum, drift, mining, OOV
    "holt_forecast_region_revenue",
    "props_variant_histogram",
    "salted_join_user_enrichment",
    "events_range_frame_sum",
    "zorder_clustering_report",
    "user_cooccurrence_pairs",
    "expectations_orders_report",
    "multiformat_join_report",
    "k_anonymity_report",
    "table_fingerprint_orders",
    "embedding_drift_report",
    "hard_negative_mining",
    "vocab_coverage_report",
    # continuation-session families: char-window explode + pair core,
    # codebook assignment + blocked cosine pairs, jaccard × hash-split,
    # WindowGroupLimit cap, offset-assembled curriculum rank, blocked
    # levenshtein vocabulary join, CC over the name-match graph,
    # fold-hash agg + scalar broadcast, basket pair-explode lift,
    # 7-day expansion STL, broadcast-stoplist in-row rebuild, CUBE
    "verbatim_window_pairs",
    "semdedup_verdicts",
    "split_leakage_audit",
    "source_frequency_cap",
    "curriculum_order_docs",
    "fuzzy_part_name_pairs",
    "canonical_part_names",
    "cv_fold_stats",
    "basket_part_lift",
    "stl_daily_revenue",
    "strip_boilerplate_tokens",
    "cube_orders_status_year",
    # latest families: epoch-repeat explode, LM-score terciles,
    # full-outer MERGE, JSONL write+read roundtrip, map-side PQ codes,
    # ADC table lookup + TakeOrdered, vocabulary-relation BPE rounds
    "epoch_mixing_apply",
    "perplexity_buckets",
    "merge_orders_full",
    "jsonl_roundtrip_report",
    "pq_codes_embeddings",
    "pq_adc_topk",
    "bpe_merge_table",
    # end-of-session families: checkpointed fixed-round peeling,
    # sqrt-damped mix plan, RFM wide table, blocked-negative pair
    # builder, per-key watermark replay, dual-LM importance diff,
    # composed curation chain, min/max-bound histogram, replica
    # checksum diff
    "nation_trade_k_core",
    "temperature_mixing_plan",
    "user_feature_store",
    "contrastive_pairs_dataset",
    "late_arrival_audit",
    "dsir_selection_report",
    "corpus_build_v2_e2e",
    "column_histogram_orders",
    "fingerprint_diff_report",
    # round-5 continuation families: query-filtered posting score +
    # scalar broadcast, grid-cell banded interval self-join, dual
    # ordered-window prefix statistic, per-group rank bucketing
    "bm25_topk",
    "order_window_overlap",
    "nation_revenue_cusum",
    "orders_equidepth_deciles",
    "bpe_encode_stats",
    "ab_test_welch",
    "rolling_corr_nation_global",
    "approx_quantile_report",
    "session_pattern_match",
    "psi_price_drift",
    "distinct_rollup_hierarchy",
    "global_rank_orders",
    "nation_trade_communities",
    "multimodal_shard_plan",
    "ks_chars_by_lang",
    "tfidf_cosine_pairs",
    "snm_part_name_pairs",
    "pps_doc_sample",
    "trade_community_modularity",
    "synthetic_sku_profile",
    "benford_order_totals",
    "ab_test_cuped",
    "kaplan_meier_user_lifetime",
    "spatial_grid_nn",
    "lineitem_corr_matrix",
    "cohort_ltv_curve",
    "anova_order_value_by_segment",
    "region_revenue_quad_trend",
    "median_imputation_report",
    "feature_information_gain",
    "daily_revenue_acf",
    "event_gap_slo_report",
    # round-9 families (probed round 10): byte-walking codecs
    # (synth + header/pixel parse, all-JVM), classifier-eval windows
    # (ROC/Brier), rolling-origin backtest, pairwise-slope median,
    # rank-stat family, privacy/diversity audits, frozen-index
    # incremental assign, layout skipping audit, sketch width curve,
    # ranking-metric joins
    "jpeg_sof_report",
    "mp4_mvhd_report",
    "gif_header_report",
    "wav_pcm_stats",
    "image_dhash_clusters",
    "roc_auc_length_vs_dup",
    "brier_calibration_report",
    "forecast_backtest_mase",
    "theil_sen_region_trend",
    "wilcoxon_signed_rank_purchase_vs_view",
    "l_diversity_report",
    "source_lang_simpson",
    "dp_nation_order_stats",
    "incremental_dedup_assign",
    "zone_map_skipping_report",
    "cms_width_error_sweep",
    "retrieval_ranking_metrics",
    "readability_report",
    "ivf_incremental_assign",
    # round-10 families: real BMP encode→decode→featurize
    # (Arrow-batched stdlib decode), single-pass IVF nprobe sweep,
    # decode→resize→dHash chain, PCM autocorrelation, degree-capped
    # link prediction, JSON round-trip lint, greedy MMR re-rank,
    # gaps-and-islands, SFT corpus build, preference-pair audit
    "bmp_feature_report",
    "ivf_nprobe_recall_sweep",
    "bmp_resize_dhash_clusters",
    "wav_autocorr_report",
    "supplier_adamic_adar_links",
    "chat_format_lint",
    "mmr_diverse_topk",
    "customer_activity_islands",
    "corpus_build_v4_e2e",
    "preference_pair_audit",
    "webdataset_shard_index",
    "semantic_packing_order_report",
    "json_corrupt_record_audit",
    "csv_corrupt_record_audit",
    "fs_linkage_score_histogram",
    # round-11 second-wave families: MM-iteration preference fit,
    # broadcast-Q̂ doubly-robust OPE, kmin-cumulative nested scaling
    # fit, range-partitioned conformal order statistic, grid-EMD
    # privacy audit, class-threshold confident joint, frontier BFS
    # over a windowed-sparsified graph, per-stratum weighted top-k,
    # bounded minimax isotonic cube, 1-row-broadcast jackknife,
    # libm-free survival hazard, tombstone semi-join audit, EB
    # shrinkage moments, prefix-sum SSE changepoint scan, arithmetic
    # mu-law round-trip, ASCII-header PPM decode, trained NB scoring
    "bradley_terry_strengths",
    "dr_policy_value_report",
    "inverse_scaling_fit_report",
    "conformal_coverage_report",
    "t_closeness_report",
    "label_noise_confident_report",
    "nation_trade_bfs_hops",
    "weighted_priority_sample",
    "isotonic_calibration_bins",
    "jackknife_ratio_ci",
    "nelson_aalen_hazard",
    "deletion_propagation_audit",
    "eb_shrunk_source_quality",
    "changepoint_revenue_report",
    "mulaw_codec_report",
    "ppm_feature_report",
    "naive_bayes_langid_report",
]


def main() -> None:
    from data_integration_and_visualization_uc3m_spark.session import get_spark
    import __spark_entry__ as entrymod

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(qs["pricing_summary"](spark, SFS[0]))  # warm the JVM
    rows = []
    for name in names:
        med = {}
        for sf in SFS:
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(qs[name](spark, sf))
                runs.append(time.perf_counter() - t0)
            med[sf] = statistics.median(runs)
        ratio = med[SFS[2]] / med[SFS[1]] if med[SFS[1]] > 0 else float("inf")
        rows.append((name, med[SFS[0]], med[SFS[1]], med[SFS[2]], ratio))

    print(f"\n| query | sf0.001 s | sf0.01 s | sf0.1 s | 10x-data ratio |")
    print("|---|---|---|---|---|")
    for name, a, b, c, r in rows:
        flag = "" if r <= 12 else " ⚠ superlinear"
        print(f"| {name} | {a:.2f} | {b:.2f} | {c:.2f} | {r:.1f}×{flag} |")


if __name__ == "__main__":
    main()
