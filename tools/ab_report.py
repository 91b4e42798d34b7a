"""A/B bench report: diff two bench.py JSON records (e.g. BENCH_r1.json vs
BENCH_r2.json) the way the reference's report tool diffs baseline-vs-candidate
sweeps (src/bench/report.ts:126-270): per-query deltas keyed by query name,
missing-in-either lists, and an avg/min/max delta summary.

Usage: python tools/ab_report.py BASE.json CANDIDATE.json [--strict]
  --strict: only queries present in both (inner join), exit 1 on any
            candidate regression > 2x (the driver's bench gate).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.loads(f.read().strip().splitlines()[-1])
    return doc


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    strict = "--strict" in sys.argv
    if len(args) != 2:
        print(__doc__)
        return 2
    base, cand = load(args[0]), load(args[1])
    bq, cq = base.get("queries", {}), cand.get("queries", {})
    keys = sorted(set(bq) | set(cq)) if not strict else sorted(set(bq) & set(cq))
    missing_in_base = sorted(set(cq) - set(bq))
    missing_in_cand = sorted(set(bq) - set(cq))

    deltas = []
    print(f"{'query':32s} {'base_s':>8s} {'cand_s':>8s} {'delta_s':>8s} {'ratio':>6s}")
    for k in keys:
        b, c = bq.get(k), cq.get(k)
        if b is None or c is None:
            print(f"{k:32s} {b if b is not None else '—':>8} {c if c is not None else '—':>8}")
            continue
        d = c - b
        ratio = c / b if b else float("inf")
        deltas.append((k, d, ratio))
        print(f"{k:32s} {b:8.3f} {c:8.3f} {d:+8.3f} {ratio:6.2f}")

    if deltas:
        ds = [d for _, d, _ in deltas]
        print(
            f"\nsummary delta_s: avg {sum(ds)/len(ds):+.3f}  "
            f"min {min(ds):+.3f}  max {max(ds):+.3f}"
        )
        worst = max(deltas, key=lambda t: t[2])
        print(f"worst ratio: {worst[0]} at {worst[2]:.2f}x")
    if missing_in_base:
        print("missing in base:", ", ".join(missing_in_base))
    if missing_in_cand:
        print("missing in candidate:", ", ".join(missing_in_cand))

    if strict and deltas and max(r for _, _, r in deltas) > 2.0:
        print("FAIL: candidate regressed a query beyond 2x")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
