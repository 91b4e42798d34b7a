"""Generate the round's ORACLE_FULL artifact: replay EVERY registered query
against its DuckDB oracle at sf0.01 AND sf0.1 (the same comparator the
driver's correctness gate uses, via tools/check_oracle.py), then merge the
two blocks into ORACLE_FULL_r{N}.json at the repo root.

This is the builder-side evidence for queries outside the driver's bounded
CORRECTNESS sample window (see registry.py's rotation note).

Usage: python tools/oracle_full.py <round_number>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_block(sf_dir: str, out_path: str) -> dict:
    rc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "check_oracle.py"),
         sf_dir, "--json", out_path],
        cwd=ROOT,
    ).returncode
    if rc != 0:
        print(f"WARNING: check_oracle exited {rc} for {sf_dir} "
              "(n_fail > 0 — inspect the block before committing)")
    with open(out_path) as f:
        return json.load(f)


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    b001 = run_block("/root/testdata/sf0.01", f"/tmp/oracle_full_sf001_r{rnd}.json")
    b01 = run_block("/root/testdata/sf0.1", f"/tmp/oracle_full_sf01_r{rnd}.json")
    merged = {"round": rnd, **b001, "sf01_replay": b01}
    out = os.path.join(ROOT, f"ORACLE_FULL_r{rnd:02d}.json")
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    for label, b in (("sf0.01", b001), ("sf0.1", b01)):
        print(f"{label}: {b['n_exact']}/{b['n_queries']} exact, "
              f"{b['n_fail']} fail, {b['n_rows_only']} rows-only")
    print(f"wrote {out}")
    return 1 if (b001["n_fail"] or b01["n_fail"]) else 0


if __name__ == "__main__":
    sys.exit(main())
