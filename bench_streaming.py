"""Streaming-family benchmark — the 8 e2e queries bench.py excludes.

Protocol note: these queries drive REAL Structured Streaming jobs
(file/socket sources, availableNow-style drain-the-source triggers,
temp checkpoint dirs), so their wall time includes stream scheduling
latency, micro-batch planning, and sink commit protocol — NOT pure
engine throughput. That is exactly what this harness records: the
end-to-end "stage source → run stream to completion → read final
sink" latency a pipeline operator would experience. They are excluded
from bench.py so the throughput roster stays comparable across rounds;
this file gives them their own round-over-round series.

Per query: 3 timed runs, headline = median (same round-1 protocol as
bench.py; each run re-stages its own temp source + checkpoint, so
every run pays the full cold stream-start cost by design). Results
merge into BENCH_DETAIL.json under the "streaming" key (bench.py
preserves it) and print as one JSON line.

State telemetry (VERDICT r10 ask #6): a StreamingQueryListener
captures each micro-batch's ``stateOperators`` metrics; per query the
section records peak state rows and peak state memory across the
timed runs — the round-over-round series that makes state growth in
the watermark-bound queries (stream-stream join, sessionize) visible
the same way calib_sec makes host noise visible. Stateless streams
record zeros.

Usage: python bench_streaming.py   [$SPARK_GRAFT_SF_DIR, default sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DETAIL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "BENCH_DETAIL.json")


class _StateCapture:
    """StreamingQueryListener accumulating peak stateOperators metrics.

    Listener callbacks arrive on a background thread, so reads happen
    after a short settle; peak-across-runs makes slight event lag
    harmless."""

    def __init__(self):
        from pyspark.sql.streaming import StreamingQueryListener

        cap = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                cap.n_batches += 1
                for so in p.stateOperators:
                    cap.rows = max(cap.rows, so.numRowsTotal)
                    cap.bytes = max(cap.bytes, so.memoryUsedBytes)

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self.listener = _L()
        self.reset()

    def reset(self):
        self.rows = 0
        self.bytes = 0
        self.n_batches = 0


def main() -> None:
    from bench import BENCH_EXCLUDE
    from data_integration_and_visualization_uc3m_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench-streaming")
    qs = entrymod.queries()
    names = sorted(n for n in qs if n in BENCH_EXCLUDE)

    cap = _StateCapture()
    spark.streams.addListener(cap.listener)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup: JVM + codegen + one full stream lifecycle
    force(qs[names[0]](spark, SF_DIR))

    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    state: dict[str, dict[str, int]] = {}
    for name in names:
        cap.reset()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(qs[name](spark, SF_DIR))
            runs.append(time.perf_counter() - t0)
        times[name] = round(sorted(runs)[1], 3)
        cold[name] = round(runs[0], 3)
        warm[name] = round(min(runs[1:]), 3)
        time.sleep(1.0)  # let trailing listener events land
        state[name] = {
            "peak_state_rows": cap.rows,
            "peak_state_bytes": cap.bytes,
            "n_progress_events": cap.n_batches,
        }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    section = {
        "metric": "end-to-end stream latency seconds (stage + run "
                  "stream to completion + read final sink), median of 3",
        "n_queries": len(times),
        "total_median": round(sum(times.values()), 3),
        "queries": times,
        "queries_cold": cold,
        "queries_warm": warm,
        "queries_state": state,
        "sf": sf_val,
    }
    try:
        detail = json.load(open(DETAIL))
    except (FileNotFoundError, json.JSONDecodeError):
        detail = {}
    # NOTE: bench.py preserves only a WHITELIST of foreign-owned
    # sections across its rewrites (`foreign_sections` in bench.py) —
    # if this key is ever renamed or a sibling section added, update
    # that tuple in the same change or the section is silently dropped
    # on the next bench run.
    detail["streaming"] = section
    with open(DETAIL, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    print(json.dumps({
        "metric": "streaming e2e latency",
        "value": section["total_median"],
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
    }))


if __name__ == "__main__":
    main()
