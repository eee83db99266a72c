"""r13 bench-shift adjudication probes (VERDICT r13 ask #1).

Two modes:

  python tools/bench_shift_probe.py fresh5 <query>
      The established fresh-session 5-run protocol: THIS process is a
      brand-new JVM; run the standard bench warmup (pricing_summary),
      then 5 timed noop-forced runs of <query>. Prints one JSON line.

  python tools/bench_shift_probe.py poslate <q1> <q2> ...
      Direct test of the registry-size / session-state hypothesis the
      r12/r13 audits kept re-hypothesizing: time each target EARLY in
      a fresh session (3 runs), then sweep the ENTIRE bench roster
      once each (same order + same adaptive-GC rule as bench.py, so
      the session accumulates exactly the state a real bench run
      accumulates), then re-time each target LATE. JVM JIT code-cache
      and codegen-cache stats are sampled before/after the sweep. If
      late/early >> 1 on unchanged queries, the uniform roster uplift
      is session-accumulated state, not host speed; if ~1, it is
      host-environmental.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _code_cache(spark) -> dict:
    """Sample JVM CodeHeap/Metaspace pool usage (bytes used) via JMX."""
    out = {}
    try:
        jvm = spark.sparkContext._jvm
        mf = jvm.java.lang.management.ManagementFactory
        for pool in mf.getMemoryPoolMXBeans():
            name = pool.getName()
            if "CodeHeap" in name or name in ("Metaspace", "Code Cache"):
                out[name] = pool.getUsage().getUsed()
    except Exception as e:  # diagnostics only — never fail the probe
        out["error"] = repr(e)
    return out


def main() -> None:
    mode, targets = sys.argv[1], sys.argv[2:]
    from data_integration_and_visualization_uc3m_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench-shift-probe")
    qs = entrymod.queries()
    _force(qs["pricing_summary"](spark, SF_DIR))  # standard bench warmup

    if mode == "fresh5":
        (name,) = targets
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            _force(qs[name](spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"probe": "fresh5", "query": name, "runs": runs,
                          "median": sorted(runs)[2]}))
        return

    assert mode == "poslate"
    from bench import BENCH_EXCLUDE

    def time3(name: str) -> dict:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(qs[name](spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 3))
        return {"median": sorted(runs)[1], "warm": min(runs[1:]), "runs": runs}

    early = {n: time3(n) for n in targets}
    cc_before = _code_cache(spark)

    # Roster sweep: one forced run per query, bench order, bench GC rule.
    swept = 0
    t_sweep = time.perf_counter()
    for n in qs:
        if n in BENCH_EXCLUDE or n in targets:
            continue
        if len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) > 3:
            import gc as _gc
            _gc.collect()
            spark.sparkContext._jvm.System.gc()
        _force(qs[n](spark, SF_DIR))
        swept += 1
    sweep_sec = round(time.perf_counter() - t_sweep, 1)

    cc_after = _code_cache(spark)
    late = {n: time3(n) for n in targets}
    print(json.dumps({
        "probe": "poslate", "swept": swept, "sweep_sec": sweep_sec,
        "early": early, "late": late,
        "ratio_warm": {n: round(late[n]["warm"] / max(early[n]["warm"], 1e-9), 2)
                       for n in targets},
        "code_cache_before": cc_before, "code_cache_after": cc_after,
    }))


if __name__ == "__main__":
    main()
