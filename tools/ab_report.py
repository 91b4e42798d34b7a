"""A/B bench report: diff two bench.py JSON records (e.g. BENCH_r1.json vs
BENCH_r2.json) the way the reference's report tool diffs baseline-vs-candidate
sweeps (src/bench/report.ts:126-270):

- per-query wall deltas keyed by query name, with missing-in-either lists
  and an avg/min/max delta summary (summarizeDelta, report.ts:95-101);
- composite-key comparison over the protocol ANN cells — the analogue of
  makeKey (report.ts:88-92), which joins dataset+params fields into one
  key: here ``tier|n_lists|n_probe|ef_search|k``.  Each matched key reports
  recall / search-latency / build-time base, candidate, and delta (the
  ComparisonRow fields, report.ts:158-181); unmatched keys land in
  missing-in-base / missing-in-candidate (report.ts:144-152).

Usage: python tools/ab_report.py BASE.json CANDIDATE.json [--strict] [--csv PATH]
  --strict: only keys present in both (inner join, report.ts:147-152), and
            exit 1 on any candidate query regression > 2x (the driver's
            bench gate).
  --csv PATH: also write the composite comparison rows as a header CSV
            (the report.ts toCsv sink).
"""

from __future__ import annotations

import json
import sys

CSV_FIELDS = [
    "key", "tier", "n_lists", "n_probe", "ef_search", "k",
    "recall_base", "recall_candidate", "recall_delta",
    "search_ms_base", "search_ms_candidate", "search_ms_delta",
    "build_ms_base", "build_ms_candidate", "build_ms_delta",
]


def load(path: str) -> dict:
    with open(path) as f:
        raw = f.read().strip()
    try:  # a whole-file JSON document (the driver's BENCH_r{N}.json)
        doc = json.loads(raw)
    except json.JSONDecodeError:  # bench.py stdout: JSON is the last line
        doc = json.loads(raw.splitlines()[-1])
    # the driver's BENCH_r{N}.json wraps the bench record under "parsed"
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    return doc


def protocol_cells(doc: dict) -> dict[str, dict]:
    """Flatten the ANN protocol cells into composite-keyed rows
    (makeKey, report.ts:88-92).  The recall_curve (one row per n_probe)
    provides the sweep axes; records without a curve (round-1 files)
    contribute their single headline cell."""
    out: dict[str, dict] = {}
    proto = doc.get("protocol") or {}
    for tier_key in ("ann_ivf", "ann_hnsw"):
        cell = proto.get(tier_key)
        if not cell:
            continue
        tier = tier_key[len("ann_"):]
        n_lists = cell.get("n_lists", 8)
        ef = cell.get("ef_search")
        k = cell.get("k", 10)
        curve = cell.get("recall_curve")
        if curve:
            for c in curve:
                key = f"{tier}|n_lists={n_lists}|n_probe={c['n_probe']}|ef={ef}|k={k}"
                out[key] = {
                    "tier": tier, "n_lists": n_lists,
                    "n_probe": c["n_probe"], "ef_search": ef, "k": k,
                    "recall": c.get("recall_at_10"),
                    "search_ms": c.get("search_ms"),
                    "build_ms": cell.get("build_ms"),
                }
        else:
            n_probe = cell.get("n_probe", 2)
            key = f"{tier}|n_lists={n_lists}|n_probe={n_probe}|ef={ef}|k={k}"
            out[key] = {
                "tier": tier, "n_lists": n_lists,
                "n_probe": n_probe, "ef_search": ef, "k": k,
                "recall": cell.get("recall_at_10"),
                "search_ms": cell.get("search_ms"),
                "build_ms": cell.get("build_ms"),
            }
    return out


def compare_protocol(base: dict, cand: dict, strict: bool):
    """Composite-key join (compareResults, report.ts:126-185)."""
    b_cells, c_cells = protocol_cells(base), protocol_cells(cand)
    all_keys = sorted(set(b_cells) | set(c_cells))
    rows, missing_in_base, missing_in_cand = [], [], []
    for key in all_keys:
        bi, ci = b_cells.get(key), c_cells.get(key)
        if bi is None:
            missing_in_base.append(key)
            if strict:
                continue
        if ci is None:
            missing_in_cand.append(key)
            if strict:
                continue
        if bi is None or ci is None:
            continue

        def d(field):
            a, b = bi.get(field), ci.get(field)
            return None if a is None or b is None else round(b - a, 4)

        rows.append(
            {
                "key": key,
                **{f: bi.get(f) for f in ("tier", "n_lists", "n_probe", "ef_search", "k")},
                "recall_base": bi.get("recall"),
                "recall_candidate": ci.get("recall"),
                "recall_delta": d("recall"),
                "search_ms_base": bi.get("search_ms"),
                "search_ms_candidate": ci.get("search_ms"),
                "search_ms_delta": d("search_ms"),
                "build_ms_base": bi.get("build_ms"),
                "build_ms_candidate": ci.get("build_ms"),
                "build_ms_delta": d("build_ms"),
            }
        )
    return rows, missing_in_base, missing_in_cand


def write_csv(rows: list[dict], path: str) -> None:
    import csv

    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=CSV_FIELDS)
        w.writeheader()
        for r in rows:
            w.writerow({k: r.get(k) for k in CSV_FIELDS})


def main() -> int:
    argv = sys.argv[1:]
    csv_path = None
    if "--csv" in argv:
        i = argv.index("--csv")
        csv_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    strict = "--strict" in argv
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

    rows, p_miss_base, p_miss_cand = compare_protocol(base, cand, strict)
    if rows or p_miss_base or p_miss_cand:
        print(f"\n{'protocol cell':40s} {'recallΔ':>8s} {'searchΔms':>10s} {'buildΔms':>9s}")
        for r in rows:
            rd = "—" if r["recall_delta"] is None else f"{r['recall_delta']:+.4f}"
            sd = "—" if r["search_ms_delta"] is None else f"{r['search_ms_delta']:+.1f}"
            bd = "—" if r["build_ms_delta"] is None else f"{r['build_ms_delta']:+.1f}"
            print(f"{r['key']:40s} {rd:>8s} {sd:>10s} {bd:>9s}")
        if p_miss_base:
            print("protocol cells missing in base:", ", ".join(p_miss_base))
        if p_miss_cand:
            print("protocol cells missing in candidate:", ", ".join(p_miss_cand))
    if csv_path:
        write_csv(rows, csv_path)
        print(f"wrote {len(rows)} comparison rows to {csv_path}")

    if strict and deltas and max(r for _, _, r in deltas) > 2.0:
        print("FAIL: candidate regressed a query beyond 2x")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
