"""Rotation planner for the driver's 50-row CORRECTNESS window.

Reads every committed CORRECTNESS_r*.json, computes per-query evidence
freshness (newest driver-green round, or never), and prints the suggested
``_RUN_FIRST`` ordering for the next round: never-sampled queries first (in
registration order), then stalest-green.  Run at the START of each round so
the window rotation (registry.py evidence policy) is derived from the
artifacts instead of by hand.

Usage: python tools/rotation_plan.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    newest: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        data = json.load(open(path))
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("err") is None
            ):
                newest[name] = max(newest.get(name, 0), rnd)

    from hnsw_spark import registry

    registry.load_all_queries()
    names = list(registry.QUERIES)
    rows_only = [n for n in names if n not in registry.ORACLES]
    never = [n for n in names if n not in newest and n not in rows_only]
    stale = sorted(
        (n for n in names if n in newest), key=lambda n: (newest[n], names.index(n))
    )
    print(f"registry: {len(names)}  driver-green ever: {len(newest)}")
    print(f"never-sampled (excl {len(rows_only)} rows-only): {len(never)}")
    plan = never + [n for n in stale if n not in never]
    print(f"\nsuggested _RUN_FIRST head (window={window}):")
    for i, n in enumerate(plan[:window]):
        tag = "NEVER" if n in never else f"r{newest[n]}"
        print(f"  {i + 1:3d}. {n}  [{tag}]")
    overflow = [n for n in never if n not in plan[:window]]
    if overflow:
        print(f"\nWARNING: {len(overflow)} never-sampled queries do not fit "
              f"the window: {overflow}")
    return 0


if __name__ == "__main__":
    main()
