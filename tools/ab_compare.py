"""A/B bench orchestration: run bench.py at two git refs and diff the results.

This is the engine-side analogue of the reference's compare flow
(src/bench/compare.ts:254-311): clean-tree guard (:114-119), record the
original ref, check out base then candidate, run the bench at each, diff with
the report tool, and restore the original state in a ``finally``.  Two
deliberate adaptations to the git/Python idiom:

- **worktrees, not in-place checkout**: each ref is materialized with
  ``git worktree add --detach`` under ``.tmp/ab_worktrees/``, so the user's
  working tree is never mutated and "restore original ref" cannot fail —
  the finally block just removes the worktrees (same guarantee as
  compare.ts's ``checkout(originalRef)`` finally, without the failure mode
  of a dirty checkout target).
- **bench-source injection** (compare.ts:181-211): a base ref that predates
  ``bench.py`` is still measurable — the CURRENT harness (bench.py +
  tools/ab_report.py) is copied into its worktree, so old engine code runs
  under the new measurement protocol, exactly what injectBenchSources does
  for old refs lacking src/bench/*.ts.

Usage:
  python tools/ab_compare.py [--base-ref REF] [--candidate-ref REF]
                             [--sf-dir DIR] [--out-dir DIR] [--strict]
                             [--csv PATH] [--allow-dirty] [--timeout SEC]

Defaults mirror the reference CLI: base-ref HEAD~1, candidate-ref HEAD,
out-dir .tmp/ab_outputs (bench/outputs in the reference).  Exit code is the
report's (1 on a >2x regression under --strict).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INJECT_FILES = ("bench.py", "__spark_entry__.py")


def run(cmd: list[str], cwd: str | None = None, env: dict | None = None,
        timeout: int | None = None) -> str:
    cwd = cwd if cwd is not None else REPO  # late-bound so tests can repoint
    res = subprocess.run(
        cmd, cwd=cwd, env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    if res.returncode != 0:
        raise RuntimeError(
            f"command failed ({res.returncode}): {' '.join(cmd)}\n{res.stderr[-2000:]}"
        )
    return res.stdout


def ensure_clean_tree(allow_dirty: bool) -> None:
    """compare.ts:114-119 — refuse to measure an unreproducible state."""
    status = run(["git", "status", "--porcelain"]).strip()
    if status and not allow_dirty:
        raise SystemExit(
            "Working tree is dirty. Commit/stash changes or pass --allow-dirty."
        )


def add_worktree(ref: str, path: str) -> None:
    sha = run(["git", "rev-parse", "--verify", f"{ref}^{{commit}}"]).strip()
    run(["git", "worktree", "add", "--detach", path, sha])


def remove_worktree(path: str) -> None:
    try:
        run(["git", "worktree", "remove", "--force", path])
    except Exception:
        shutil.rmtree(path, ignore_errors=True)
        try:
            run(["git", "worktree", "prune"])
        except Exception:
            pass


def inject_bench_sources(wt: str) -> list[str]:
    """Copy the current harness into a worktree that lacks it
    (injectBenchSources, compare.ts:191-203)."""
    injected = []
    for name in INJECT_FILES:
        if not os.path.exists(os.path.join(wt, name)):
            shutil.copyfile(os.path.join(REPO, name), os.path.join(wt, name))
            injected.append(name)
    return injected


def run_bench(wt: str, sf_dir: str, out_path: str, timeout: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = run([sys.executable, "bench.py"], cwd=wt, env=env, timeout=timeout)
    record = json.loads(out.strip().splitlines()[-1])  # bench prints ONE JSON line last
    if "protocol" not in record:
        # bench.py keeps its stdout line compact and sidecars the full
        # protocol next to itself; fold it back in so the report's composite
        # ANN-cell comparison still sees the sweep axes
        sidecar = os.path.join(wt, "BENCH_PROTOCOL.json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                record["protocol"] = json.load(f).get("protocol")
    with open(out_path, "w") as f:
        json.dump(record, f, indent=2)
    return record


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--base-ref", default="HEAD~1")
    p.add_argument("--candidate-ref", default="HEAD")
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--out-dir", default=os.path.join(REPO, ".tmp", "ab_outputs"))
    p.add_argument("--strict", action="store_true")
    p.add_argument("--csv")
    p.add_argument("--allow-dirty", action="store_true")
    p.add_argument("--timeout", type=int, default=1800,
                   help="per-bench-run timeout in seconds")
    args = p.parse_args()

    ensure_clean_tree(args.allow_dirty)
    os.makedirs(args.out_dir, exist_ok=True)
    wt_root = os.path.join(REPO, ".tmp", "ab_worktrees")
    os.makedirs(wt_root, exist_ok=True)

    results: dict[str, str] = {}
    worktrees: list[str] = []
    try:
        for side, ref in (("base", args.base_ref), ("candidate", args.candidate_ref)):
            wt = os.path.join(wt_root, side)
            remove_worktree(wt)  # stale dir from an interrupted prior run
            add_worktree(ref, wt)
            worktrees.append(wt)
            injected = inject_bench_sources(wt)
            if injected:
                print(f"[{side}] injected current harness: {', '.join(injected)}",
                      file=sys.stderr)
            out_path = os.path.join(args.out_dir, f"{side}.json")
            print(f"[{side}] running bench.py at {ref} (sf={args.sf_dir}) ...",
                  file=sys.stderr)
            rec = run_bench(wt, args.sf_dir, out_path, args.timeout)
            print(f"[{side}] total {rec.get('value')}s -> {out_path}", file=sys.stderr)
            results[side] = out_path
    finally:
        for wt in worktrees:
            remove_worktree(wt)

    # the report always comes from the CURRENT ref's tool, like compare.ts
    # running the candidate-built report script on both output dirs
    report_cmd = [sys.executable, os.path.join(REPO, "tools", "ab_report.py"),
                  results["base"], results["candidate"]]
    if args.strict:
        report_cmd.append("--strict")
    if args.csv:
        report_cmd += ["--csv", args.csv]
    return subprocess.call(report_cmd, cwd=REPO)


if __name__ == "__main__":
    sys.exit(main())
