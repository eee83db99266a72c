"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with the noop sink (full materialization, no
driver-side collect cost). One untimed warmup executes first so JVM/
codegen startup isn't attributed to the first query.

The driver records only the LAST 2000 bytes of stdout (rounds 2-3 both
produced an unparseable truncated tail once the roster outgrew that),
so the printed line keeps `queries` to a comparison subset (the
BASELINE.md 20-query series + the heaviest queries this run) and is
hard-capped under 2000 bytes; the full per-query median/cold/warm
detail for the whole roster goes to BENCH_DETAIL.json next to this
file, which is committed with the repo.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Roster: every registered query except the streaming e2e suite, which
# drives real Structured Streaming jobs (temp checkpoint dirs, stream
# scheduling latency) and would measure stream-trigger waits rather
# than engine throughput. Deriving from the registry keeps the roster
# complete as queries are added; BENCH_EXCLUDE lists the opt-outs.
BENCH_EXCLUDE = frozenset({
    "streaming_batch_parity_e2e",
    "streaming_dedup_e2e",
    "streaming_stateful_totals_e2e",
    "streaming_attribution_e2e",
    "streaming_lsh_dedup_e2e",
    "streaming_enrich_e2e",
    "streaming_curate_e2e",
    "streaming_rest_poll_e2e",
    "streaming_sessionize_e2e",
    "streaming_pyds_sink_e2e",
    "streaming_ann_index_e2e",
})


def main() -> None:
    from data_integration_and_visualization_uc3m_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qs = entrymod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup: JVM + codegen + parquet footer caches
    force(qs["pricing_summary"](spark, SF_DIR))

    # Machine-speed yardstick: a fixed CPU-bound workload (hash-reduce
    # over 2e8 synthetic rows, no I/O, all cores) timed median-of-3 and
    # recorded with every run. Query times on this box vary up to ~35%
    # run-to-run under host contention (observed round 8: identical
    # code, roster totals 194.5 s vs 258.7 s); the calibration scalar
    # makes that visible so series comparisons can be deflated.
    calib_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "bit_xor(xxhash64(id)) AS s"  # xor-reduce: overflow-free under ANSI
        ).collect()
        calib_runs.append(time.perf_counter() - t0)
    calib = round(sorted(calib_runs)[1], 3)

    names = [n for n in qs if n not in BENCH_EXCLUDE]
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in names:
        # localCheckpoint blocks (iterative queries) are reclaimed only
        # after a DRIVER full GC lets the ContextCleaner run; without
        # this, orphaned storage blocks accumulate across the session
        # and late queries degrade 3-5x (measured on dedup_clusters:
        # 3.3 s fresh vs 11-19 s late-session). Trigger adaptively:
        # only when orphaned persistent RDDs are actually lingering.
        if len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) > 3:
            import gc as _gc

            _gc.collect()
            spark.sparkContext._jvm.System.gc()
        # Round-1 protocol restored for series comparability: 3 timed
        # runs per query, headline = MEDIAN of the 3 (the first run pays
        # plan compilation / codegen / Python-worker spawn — 3-10x on
        # this box — and lands at the median only if the two repeats
        # straddle it). Cold (run 1) and warm (best of runs 2-3) are
        # recorded separately so both the fresh-plan and resident-engine
        # stories stay visible in the historical series (ADVICE.md).
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(qs[name](spark, SF_DIR))
            runs.append(time.perf_counter() - t0)
        times[name] = round(sorted(runs)[1], 3)
        cold[name] = round(runs[0], 3)
        warm[name] = round(min(runs[1:]), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    detail = {
        "metric": "per-query wall seconds (noop-sink forced), full roster",
        "n_queries": len(times),
        "total_median": round(sum(times.values()), 3),
        "total_warm": round(sum(warm.values()), 3),
        "calib_sec": calib,
        "cpus": cpus,
        "queries": times,
        "queries_cold": cold,
        "queries_warm": warm,
        "sf": sf_val,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    # Preserve every section other harnesses merged in (streaming from
    # bench_streaming.py, streaming_state_growth from
    # tools/streaming_state_probe.py) — the harnesses share this file
    # but own disjoint keys. Preserve a WHITELIST of known
    # foreign-owned sections, not every unknown key (ADVICE r12: the
    # open-ended merge kept renamed/retired sections alive forever,
    # reading as current data).
    foreign_sections = ("streaming", "streaming_state_growth")
    try:
        with open(detail_path) as f:
            prior = json.load(f)
        for key in foreign_sections:
            if key in prior and key not in detail:
                detail[key] = prior[key]
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    # The driver benches the same code at several core counts back to
    # back; a single shared detail file means the later (lower-core)
    # run destroys the 32-core per-query evidence (r14 VERDICT item).
    # Keep a per-core-count copy alongside the canonical file so every
    # epoch's full detail survives a multi-cpu driver sweep. The
    # streaming sections live only in the canonical file (those
    # harnesses are cpu-count-agnostic).
    if cpus:
        percpu_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_DETAIL_c%s.json" % cpus,
        )
        percpu = {k: v for k, v in detail.items()
                  if k not in foreign_sections}
        with open(percpu_path, "w") as f:
            json.dump(percpu, f, indent=1, sort_keys=True)

    # Printed subset: the BASELINE.md round-1 20-query series (the 2x
    # gate's comparison points) plus the heaviest queries this run.
    baseline_series = [
        "pricing_summary", "flagship_nation_year_rate", "validated_m2o_join",
        "region_revenue", "shipping_priority", "small_quantity_orders",
        "rollup_region_nation", "keyed_dedup_first_wins",
        "deterministic_slice", "events_hourly", "sessionize_events",
        "upsert_conflict_ignore", "dedup_exact_docs", "dedup_ngram_jaccard",
        "dedup_minhash_lsh", "simhash_signatures", "token_count_profile",
        "doc_quality_score", "lang_id_predict", "embedding_cosine_topk",
    ]
    shown = {n: times[n] for n in baseline_series if n in times}
    for n, _ in sorted(times.items(), key=lambda kv: -kv[1]):
        if n not in shown:
            shown[n] = times[n]
    out = {
        "metric": "sum of FULL %d-query roster wall times (noop-sink forced,"
                  " median-of-3); per-query subset=baseline series + heaviest;"
                  " full detail in BENCH_DETAIL.json" % len(times),
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "calib_sec": calib,
        "queries": shown,
        "sf": sf_val,
    }
    # Hard cap: the driver keeps only the last 2000 stdout bytes; drop
    # the lightest non-baseline entries until the line fits with slack.
    while len(json.dumps(out)) > 1900 and len(shown) > len(baseline_series):
        for n in sorted(shown, key=lambda k: shown[k]):
            if n not in baseline_series:
                del shown[n]
                break
        else:
            break
    # The eviction loop can only remove non-baseline entries; if the
    # baseline subset itself ever outgrows the cap (longer names,
    # larger values), fall back to totals-only rather than printing a
    # line the driver would truncate into unparseable JSON.
    if len(json.dumps(out)) > 1900:
        out["queries"] = {}
        out["metric"] = (
            "sum of FULL %d-query roster wall times (noop-sink forced,"
            " median-of-3); per-query detail omitted (stdout cap),"
            " see BENCH_DETAIL.json" % len(times)
        )
    assert len(json.dumps(out)) <= 1900, "bench stdout line exceeds driver cap"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
