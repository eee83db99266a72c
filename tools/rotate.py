"""Round-start rotation helper: fold driver verdicts into the registry.

Usage: python tools/rotate.py CORRECTNESS_rNN.json

Reads the driver's correctness record and prints, ready to paste into
queries.py:
  1. the updated ``_PRIOR_VERIFIED`` frozenset (old greens + names that
     passed this round),
  2. names that FAILED (these must be fixed and PINNED in _PRIORITY),
  3. ``_NEW_PARITY_ONLY`` / ``_PRIORITY`` leftovers that did not reach
     the window (keep them queued),
so the start-of-round bookkeeping that round 7 fumbled (stale greens,
unpinned re-plumbs) is mechanical. This tool only PRINTS — the edit
stays a reviewed, committed change.
"""

from __future__ import annotations

import json
import sys
import textwrap

sys.path.insert(0, "/root/repo")


def main() -> None:
    path = sys.argv[1]
    rec = json.load(open(path))
    from data_integration_and_visualization_uc3m_spark import queries as Q

    def passed(v) -> bool:
        # driver record shape (observed r02-r06): {"rows_match": bool,
        # "schema_match": bool, "hash_match": bool, ..., "err": ...}
        if isinstance(v, dict):
            flags = [
                bool(v.get(k))
                for k in ("rows_match", "schema_match", "hash_match",
                          "match", "ok", "passed", "value_match")
                if k in v
            ]
            return bool(flags) and all(flags) and not v.get("err")
        return bool(v)

    greens = {n for n, v in rec.items() if n in Q.REGISTRY and passed(v)}
    reds = {n for n, v in rec.items() if n in Q.REGISTRY and not passed(v)}
    merged = sorted(set(Q._PRIOR_VERIFIED) | greens)
    print(f"# verdicts: {len(greens)} green, {len(reds)} red "
          f"(of {len(rec)} recorded)")
    if reds:
        print("# FAILED — fix and pin in _PRIORITY:")
        for n in sorted(reds):
            print(f"#   {n}")
    leftovers_new = [n for n in Q._NEW_PARITY_ONLY if n not in rec]
    leftovers_pin = [n for n in Q._PRIORITY if n not in rec]
    if leftovers_pin:
        print(f"# _PRIORITY never reached the window (investigate): "
              f"{leftovers_pin}")
    if leftovers_new:
        print(f"# _NEW_PARITY_ONLY still queued ({len(leftovers_new)}): "
              f"{leftovers_new}")
    body = ", ".join(f'"{n}"' for n in merged)
    print("_PRIOR_VERIFIED: frozenset[str] = frozenset({")
    print(textwrap.fill(body, width=72, initial_indent="    ",
                        subsequent_indent="    "))
    print("})")


if __name__ == "__main__":
    main()
