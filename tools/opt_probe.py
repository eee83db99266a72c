"""Round-15 optimization probe: per-query timing + plan capture.

Usage:
  python tools/opt_probe.py time <query> [query ...]
      Fresh JVM; standard bench warmup (pricing_summary), then for
      each query 3 noop-forced timed runs (bench.py protocol: median,
      cold = run 1, warm = best of runs 2-3). Prints one JSON line.

  python tools/opt_probe.py plan <suffix> <query> [query ...]
      Write plans/$SPARK_GRAFT_PLANDIR(default r15)/<query>_<suffix>.txt with explain("formatted")
      for each query (suffix: before | after).

Timing env: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode, args = sys.argv[1], sys.argv[2:]
    from data_integration_and_visualization_uc3m_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("opt-probe")
    qs = entrymod.queries()

    if mode == "plan":
        suffix, names = args[0], args[1:]
        outdir = os.path.join("/root/repo/plans",
                              os.environ.get("SPARK_GRAFT_PLANDIR", "r15"))
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
        return

    assert mode == "time", mode
    _force(qs["pricing_summary"](spark, SF_DIR))  # bench warmup
    out = {}
    for name in args:
        spark.sparkContext.setJobDescription(f"opt_probe: {name}")
        if len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) > 3:
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(qs[name](spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "runs": runs,
            "median": sorted(runs)[1],
            "cold": runs[0],
            "warm": round(min(runs[1:]), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
