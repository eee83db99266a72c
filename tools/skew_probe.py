"""Skew-join evidence probe (VERDICT r13 ask #8a): measure, on a
DELIBERATELY skewed sf1 join key, what the shuffle audit cannot see —
per-TASK time concentration — and demonstrate the two production
levers (AQE skew-join splitting, explicit salting) against a pinned
baseline.

Setup: the sf1 lineitem slice replicated 16x (~96M rows) joins a
1,000-row dim on a synthetic key where HALF the fact rows share key 0
(xxhash-deterministic) — the "one hot key owns the shuffle partition"
shape that stalls a 1000-executor cluster on one straggler task. Broadcast is disabled so
the join actually shuffles (at 100 TB the dim side of a skewed join is
rarely broadcastable; here it would be, which is lever #0 and already
the engine's default).

Variants (same session, runtime confs only):
  baseline  AQE on, skew-join splitting OFF  -> one straggler task
  aqe_skew  AQE skew-join splitting ON       -> runtime partition split
  salted    key x 32 salts, dim exploded     -> planned-ahead split

Per-task evidence comes from the UI REST API's taskSummary quantiles
(the probe session enables the UI; the engine's sessions keep it off).

Usage: python tools/skew_probe.py   (requires the sf1 slice:
python tools/gen_sf1.py first)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

UI_PORT = 4057
N_SALT = 32


def _rest(path: str):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{UI_PORT}/api/v1{path}", timeout=10
    ) as r:
        return json.load(r)


def _stage_task_summary(app_id: str, known: set[int]) -> dict:
    """Task-duration quantiles of the heaviest NEW completed stage."""
    stages = _rest(f"/applications/{app_id}/stages?status=complete")
    new = [s for s in stages if s["stageId"] not in known]
    for s in stages:
        known.add(s["stageId"])
    if not new:
        return {}
    heavy = max(new, key=lambda s: s.get("executorRunTime", 0))
    q = _rest(
        f"/applications/{app_id}/stages/{heavy['stageId']}"
        f"/{heavy['attemptId']}/taskSummary?quantiles=0.5,0.95,1.0"
    )
    dur = q.get("duration", [0, 0, 0])
    return {
        "stage": heavy["stageId"],
        "n_tasks": heavy.get("numCompleteTasks"),
        "task_ms_p50": dur[0],
        "task_ms_p95": dur[1],
        "task_ms_max": dur[2],
        "straggler_x": round(dur[2] / dur[0], 1) if dur[0] else None,
    }


def main() -> None:
    from data_integration_and_visualization_uc3m_spark.scratch import scratch_dir
    from pyspark.sql import SparkSession, functions as F

    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR") or scratch_dir("sf1")
    li = os.path.join(sf1, "lineitem.parquet")
    if not os.path.exists(li):
        print("sf1 slice missing — run: python tools/gen_sf1.py",
              file=sys.stderr)
        sys.exit(1)

    spark = (
        SparkSession.builder.master(
            "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32"))
        .appName("skew-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "true")

    # Fact: the sf1 lineitem replicated 16x (~96M rows) with HALF the
    # rows piled onto key 0 (xxhash-deterministic), the rest spread
    # over 1..999 — so the hot key's shuffle partition carries ~48M
    # rows while the median partition carries ~1.5M. Dim: 1,000 keyed
    # payload rows. The first probe cut used the raw 6M rows and the
    # hot task finished in 350 ms — skew was real but under the task
    # floor; 16x makes the straggler the stage.
    fact = (
        spark.read.parquet(li)
        .select("l_orderkey", "l_linenumber", "l_extendedprice",
                F.explode(F.sequence(F.lit(0), F.lit(15))).alias("r"))
        .select(
            F.when(
                F.pmod(F.xxhash64(F.col("l_orderkey") * 7
                                  + F.col("l_linenumber")
                                  + F.col("r") * 1000003), F.lit(100)) < 50,
                F.lit(0),
            ).otherwise(
                F.pmod(F.xxhash64(F.col("l_orderkey") + F.col("r")),
                       F.lit(999)) + 1
            ).cast("long").alias("k"),
            F.col("l_extendedprice").cast("double").alias("v"),
        )
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3 + 1).alias("w")
    )

    def run(df) -> float:
        t0 = time.perf_counter()
        df.groupBy().agg(F.sum(F.col("v") * F.col("w")).alias("s")).collect()
        return round(time.perf_counter() - t0, 2)

    known: set[int] = set()
    plain = fact.join(dim, "k")
    results = {}

    conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run(plain)  # warm parquet/code paths so variant 1 isn't penalized
    known = {s["stageId"] for s in _rest(f"/applications/{app_id}/stages")}
    sec = run(plain)
    results["baseline_no_skew_handling"] = {
        "wall_sec": sec, **_stage_task_summary(app_id, known)}

    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # AQE only splits when a partition exceeds both the factor and
    # skewedPartitionThresholdInBytes (default 256m) — drop the floor
    # so the sf1-sized demo exercises the same code path a 100 TB key
    # would hit naturally.
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
             "8m")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    sec = run(plain)
    results["aqe_skew_join"] = {
        "wall_sec": sec, **_stage_task_summary(app_id, known)}

    conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    # numeric salted key (k*N + s): a concat_ws string key measured
    # ~3x the per-task cost of the long key on the same data
    salted_fact = fact.select(
        (F.col("k") * N_SALT
         + F.pmod(F.xxhash64("v"), F.lit(N_SALT))).alias("ks"),
        "v",
    )
    salted_dim = dim.crossJoin(
        spark.range(0, N_SALT).select(F.col("id").alias("s"))
    ).select((F.col("k") * N_SALT + F.col("s")).alias("ks"), "w")
    sec = run(salted_fact.join(salted_dim, "ks"))
    results["salted_x%d" % N_SALT] = {
        "wall_sec": sec, **_stage_task_summary(app_id, known)}

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
