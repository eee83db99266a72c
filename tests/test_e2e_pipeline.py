"""Gate the one-command reference pipeline (tools/run_reference_pipeline.py).

The flagship demo — real Eurostat CSV -> star transforms -> live
embedded-Derby warehouse -> viz data.csv, mirroring the reference's
``crime_immigration_etl.py`` + ``map-making/`` flow — runs here as a
subprocess so the exact command a user types is what the suite
verifies (round 7 taught us an un-gated entrypoint can silently rot).

Marked ``e2e``: run just this with ``pytest -m e2e``; it also runs in
the default suite (no deselect-by-default) so the demo cannot break
unnoticed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "run_reference_pipeline.py")


@pytest.mark.e2e
def test_reference_pipeline_end_to_end(tmp_path):
    out = subprocess.run(
        [sys.executable, TOOL, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    # the tool prints exactly one JSON summary line (last stdout line)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, out.stdout[-4000:]
    summary = json.loads(lines[-1])

    # real public CSV present in the reference checkout
    assert summary["eurostat_source"] == "real"
    assert summary["raw_immigration_rows"] > 800

    # every constraint-violation counter zero (V1-V4 surface)
    assert summary["validation"]
    assert all(v == 0 for v in summary["validation"].values()), (
        summary["validation"]
    )

    # atomic loads reported == rows actually readable back from Derby
    assert summary["loaded"] == summary["warehouse_counts"]
    assert summary["warehouse_counts"]["country"] > 0
    assert summary["year_seeded"] == 5  # S7 DDL-seeded year dim

    # viz egress wrote a non-empty single-header CSV (K5 sink contract)
    assert summary["viz_rows"] > 0
    viz_dir = summary["viz_csv"]
    parts = [f for f in os.listdir(viz_dir) if f.endswith(".csv")]
    assert len(parts) == 1, parts
    with open(os.path.join(viz_dir, parts[0])) as f:
        header = f.readline().strip()
    assert header.split(",")[:3] == ["name", "immigration", "crime"]
