"""A/B mini-bench (BASELINE.md drift protocol, VERDICT r8 #2): time the
same registered cells under TWO repo checkouts in alternating subprocess
runs on the same box, so host drift hits both arms equally and the A/B
ratio isolates code.

Usage: python tools/ab_minibench.py <repo_a> <repo_b> <sf_dir> <cell> [...]

Each arm runs in a fresh subprocess (own JVM): warm-up on sf0.001, then
best-of-3 walls for each cell at <sf_dir>, printed as one JSON line.  The
driver script alternates A B A B (2 rounds) and reports per-cell min walls
and the B/A ratio.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_ARM = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
sf_dir = sys.argv[2]
cells = sys.argv[3:]
from hnsw_spark.session import get_spark
spark = get_spark(app_name="ab_arm", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
qs = e.queries()
for c in cells:  # warm-up: JVM, Python workers, Arrow serde
    qs[c](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
out = {}
for c in cells:
    walls = []
    for _ in range(3):
        t0 = time.time()
        qs[c](spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    out[c] = round(min(walls), 3)
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def run_arm(repo: str, sf_dir: str, cells: list[str]) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", _ARM, repo, sf_dir, *cells],
        capture_output=True, text=True, timeout=900,
    )
    for ln in r.stdout.splitlines():
        if ln.startswith("ABRESULT "):
            return json.loads(ln[len("ABRESULT "):])
    raise RuntimeError(f"arm {repo} produced no result: {r.stderr[-500:]}")


def main() -> None:
    repo_a, repo_b, sf_dir, *cells = sys.argv[1:]
    rounds = int(os.environ.get("AB_ROUNDS", "2"))
    a_runs, b_runs = [], []
    for i in range(rounds):
        a_runs.append(run_arm(repo_a, sf_dir, cells))
        b_runs.append(run_arm(repo_b, sf_dir, cells))
    best = lambda runs, c: min(r[c] for r in runs)  # noqa: E731
    report = {
        "repo_a": repo_a,
        "repo_b": repo_b,
        "sf_dir": sf_dir,
        "rounds": rounds,
        "cells": {
            c: {
                "a_best_s": best(a_runs, c),
                "b_best_s": best(b_runs, c),
                "b_over_a": round(best(b_runs, c) / best(a_runs, c), 3),
                "a_runs": [r[c] for r in a_runs],
                "b_runs": [r[c] for r in b_runs],
            }
            for c in cells
        },
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
