"""Determinism-under-partitioning probe.

The registry's float convention claims every query's values are
independent of partitioning (exact decimal / fixed-point integer
accumulation; floats only in final fixed-order scalar expressions).
This probe tests that claim directly: each query runs under different
``spark.sql.shuffle.partitions`` settings and the collected row
multisets must be BIT-IDENTICAL — any order-dependent float
accumulation shows up as a diff here before it shows up as a
once-in-N-runs oracle flake.

Usage: python tools/determinism_probe.py [sf_dir] [q1 q2 ...]
Defaults: sf0.01, the queries with the most float/partition surface.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# Queries chosen for maximum partitioning surface: multi-stage float
# fixed-point chains, window moments, weighted self-joins, sketches
# with exact twins, iterative graph rounds, range-partitioned ranks.
DEFAULT = [
    "nation_price_qty_corr",
    "rolling_corr_nation_global",
    "tfidf_cosine_pairs",
    "doc_bigram_logprob",
    "nation_revenue_cusum",
    "ab_test_welch",
    "psi_price_drift",
    "bm25_topk",
    "global_rank_orders",
    "nation_trade_pagerank",
    "nation_trade_communities",
    "ks_chars_by_lang",
    "flagship_nation_year_rate",
    "dedup_minhash_lsh",
    "tfidf_cosine_pairs",
    "kaplan_meier_user_lifetime",
    "ab_test_cuped",
    "benford_order_totals",
    "trade_community_modularity",
    "pps_doc_sample",
    "spatial_grid_nn",
    "lineitem_corr_matrix",
    "bpe_encode_stats",
    "cohort_ltv_curve",
    "anova_order_value_by_segment",
    "region_revenue_quad_trend",
    "median_imputation_report",
    "feature_information_gain",
    "daily_revenue_acf",
    "event_gap_slo_report",
    "snm_part_name_pairs",
    "synthetic_sku_profile",
    # round 8: fused ranks and the two-stage ANN composite — integer
    # fixed-point end-to-end, but rank ties and probe pruning are the
    # partitioning surface worth probing
    "hybrid_rrf_topk",
    "ivfpq_topk",
    "semdedup_verdicts",
    "scattergeo_trace_specs",
    # round 8 late additions: doubled-rank statistics (rank windows +
    # sqrt/division scalar tails), the sparse MaxSim join, and the
    # in-row CDC chunker feeding a two-level aggregation
    "spearman_price_qty_by_nation",
    "mannwhitney_value_by_event_type",
    "maxsim_late_interaction_topk",
    "cdc_chunk_dedup_histogram",
    "wilcoxon_signed_rank_purchase_vs_view",
    "ivf_nprobe_recall_sweep",
    "corpus_build_v3_e2e",
    "lsh_band_sweep",
    "jaccard_threshold_sweep",
]

PARTITION_SETTINGS = ["3", "32"]


def canon(rows) -> list[tuple]:
    out = []
    for r in rows:
        vals = []
        for v in r:
            # floats compared bit-exactly via repr; NaN normalized
            if isinstance(v, float) and v != v:
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    key = lambda t: tuple((v is None, str(v)) for v in t)
    return sorted(out, key=key)


def main() -> None:
    import os

    from data_integration_and_visualization_uc3m_spark.session import get_spark
    import __spark_entry__ as E

    sf_dir = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]
    names = args or DEFAULT

    spark = get_spark("determinism")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    failures = []
    for name in names:
        results = []
        for parts in PARTITION_SETTINGS:
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results.append(canon(qs[name](spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        if results[0] != results[1]:
            ndiff = sum(1 for a, b in zip(results[0], results[1]) if a != b)
            ndiff += abs(len(results[0]) - len(results[1]))
            failures.append(name)
            print(f"DIFF {name}: {ndiff} rows differ across "
                  f"shuffle.partitions {PARTITION_SETTINGS}")
        else:
            print(f". {name} ({len(results[0])} rows bit-identical)")
    if failures:
        print(f"\n{len(failures)} PARTITION-DEPENDENT: {failures}")
        sys.exit(1)
    print(f"\nall {len(names)} queries partition-independent @ {sf_dir}")


if __name__ == "__main__":
    main()
