"""Decade probe: time queries at sf0.1 vs the generated sf1-equivalent
slice (tools/gen_sf1.py — 10× the row volume) and report the ratio.

This extends the three-SF scaling evidence one decade PAST the
driver's largest testdata, where the scheduling floor no longer hides
data-proportional cost (VERDICT r12 ask #4). Interpretation matches
tools/scaling_probe.py: ratio ≈ 1 → floor-bound, ≈ 10 → linear in
data, » 10 → superlinear (fix the plan).

Usage: python tools/decade_probe.py [q1 q2 ...]
Requires the sf1 slice: python tools/gen_sf1.py first (the probe
regenerates it if the directory is missing).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF01 = "/root/testdata/sf0.1"

# The heavy data-proportional families the sf0.1 probes could not
# separate from the scheduling floor (VERDICT r12 #4), plus the
# heaviest corpus-shuffle representatives.
DEFAULT = [
    "wav_vad_segments_report",
    "permutation_test_nation_revenue",
    "bh_fdr_nation_tests",
    "ppjoin_word_set_pairs",
    "verbatim_window_pairs",
    "supplier_adamic_adar_links",
    "hash_bootstrap_revenue_ci",
    "dedup_minhash_lsh",
    "lsh_band_sweep",
    "semdedup_verdicts",
    "dedup_clusters",
    "sessionize_events",
    "embedding_cosine_topk",
    "corpus_build_e2e",
]


def main() -> None:
    from data_integration_and_visualization_uc3m_spark.scratch import scratch_dir
    from data_integration_and_visualization_uc3m_spark.session import get_spark
    import __spark_entry__ as entrymod

    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR") or scratch_dir("sf1")
    if not os.path.exists(os.path.join(sf1, "lineitem.parquet")):
        print("sf1 slice missing — run: python tools/gen_sf1.py",
              file=sys.stderr)
        sys.exit(1)

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("decade_probe")
    qs = entrymod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(qs["pricing_summary"](spark, SF01))  # warm the JVM

    rows = []
    for name in names:
        med = {}
        for sf in (SF01, sf1):
            runs = []
            for _ in range(3):
                if len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) > 3:
                    import gc as _gc
                    _gc.collect()
                    spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                force(qs[name](spark, sf))
                runs.append(time.perf_counter() - t0)
            med[sf] = statistics.median(runs)
        ratio = med[sf1] / med[SF01] if med[SF01] > 0 else float("inf")
        rows.append((name, med[SF01], med[sf1], ratio))
        print(f"  {name}: sf0.1 {med[SF01]:.2f}s  sf1 {med[sf1]:.2f}s  "
              f"{ratio:.1f}x", flush=True)

    print()
    print("| query | sf0.1 s | sf1 s | 10x-data ratio |")
    print("|---|---|---|---|")
    for name, a, b, r in rows:
        print(f"| {name} | {a:.2f} | {b:.2f} | {r:.1f}× |")


if __name__ == "__main__":
    main()
