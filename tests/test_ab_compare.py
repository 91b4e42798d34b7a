"""Orchestration tests for tools/ab_compare.py (the compare.ts analogue):
worktree creation, bench-source injection into refs lacking the harness,
clean-tree guard, and worktree removal in the ``finally`` — exercised
against a throwaway two-commit fixture repo with a fake instant bench.py,
so no Spark session and no network/git-config side effects."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import ab_compare  # noqa: E402

REAL_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reads a per-ref wall.txt so base/candidate produce different totals even
# after the CURRENT bench.py is injected into the base worktree
FAKE_BENCH = """\
import json
with open("wall.txt") as f:
    wall = float(f.read().strip())
line = {
    "metric": "headline_queries_total_wall", "value": wall, "unit": "sec",
    "queries": {"q1": wall}, "sf": 0.0, "protocol_file": "BENCH_PROTOCOL.json",
}
proto = {"ann_ivf": {"n_lists": 8, "n_probe": 6, "ef_search": None,
                     "recall_at_10": 0.9, "build_ms": wall * 100}}
with open("BENCH_PROTOCOL.json", "w") as f:
    json.dump({"line": line, "protocol": proto}, f)
print(json.dumps(line))
"""

FAKE_BENCH_CRASH = "import sys; sys.exit(3)\n"


def _git(repo: str, *args: str) -> str:
    env = dict(
        os.environ,
        GIT_AUTHOR_NAME="t", GIT_AUTHOR_EMAIL="t@t",
        GIT_COMMITTER_NAME="t", GIT_COMMITTER_EMAIL="t@t",
    )
    return subprocess.run(
        ["git", "-C", repo, *args], env=env, text=True, check=True,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    ).stdout


@pytest.fixture()
def fixture_repo(tmp_path, monkeypatch):
    """Two commits: #1 has only wall.txt (no harness — injection target),
    #2 adds bench.py + __spark_entry__.py + tools/ab_report.py and a faster
    wall.txt."""
    repo = str(tmp_path / "fixture")
    os.makedirs(repo)
    _git(repo, "init", "-q", "-b", "main")
    with open(os.path.join(repo, "wall.txt"), "w") as f:
        f.write("2.0\n")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "base: engine only, no harness")
    with open(os.path.join(repo, "bench.py"), "w") as f:
        f.write(FAKE_BENCH)
    with open(os.path.join(repo, "__spark_entry__.py"), "w") as f:
        f.write("# harness stub\n")
    with open(os.path.join(repo, "wall.txt"), "w") as f:
        f.write("1.0\n")
    os.makedirs(os.path.join(repo, "tools"))
    shutil.copyfile(
        os.path.join(REAL_REPO, "tools", "ab_report.py"),
        os.path.join(repo, "tools", "ab_report.py"),
    )
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "candidate: add harness, halve wall")
    monkeypatch.setattr(ab_compare, "REPO", repo)
    return repo


def _main(argv: list[str], monkeypatch) -> int:
    monkeypatch.setattr(sys, "argv", ["ab_compare.py", *argv])
    return ab_compare.main()


def test_full_compare_flow(fixture_repo, monkeypatch, capsys):
    rc = _main(["--base-ref", "HEAD~1", "--candidate-ref", "HEAD"], monkeypatch)
    assert rc == 0
    out_dir = os.path.join(fixture_repo, ".tmp", "ab_outputs")
    with open(os.path.join(out_dir, "base.json")) as f:
        base = json.load(f)
    with open(os.path.join(out_dir, "candidate.json")) as f:
        cand = json.load(f)
    # base ref had no bench.py: the injected CURRENT harness ran against the
    # base ref's wall.txt (compare.ts injectBenchSources semantics)
    assert base["value"] == 2.0
    assert cand["value"] == 1.0
    # the compact stdout line lacks "protocol"; run_bench folds the
    # worktree's BENCH_PROTOCOL.json sidecar back into the record
    assert base["protocol"]["ann_ivf"]["build_ms"] == 200.0
    assert cand["protocol"]["ann_ivf"]["build_ms"] == 100.0
    assert "injected current harness" in capsys.readouterr().err
    # worktrees are removed in the finally and git metadata pruned
    wt_root = os.path.join(fixture_repo, ".tmp", "ab_worktrees")
    assert not os.path.exists(os.path.join(wt_root, "base"))
    assert not os.path.exists(os.path.join(wt_root, "candidate"))
    assert "ab_worktrees" not in _git(fixture_repo, "worktree", "list")


def test_worktrees_removed_when_bench_crashes(fixture_repo, monkeypatch):
    with open(os.path.join(fixture_repo, "bench.py"), "w") as f:
        f.write(FAKE_BENCH_CRASH)
    _git(fixture_repo, "commit", "-aqm", "crash: bench exits 3")
    with pytest.raises(RuntimeError, match="command failed"):
        _main(["--base-ref", "HEAD~1", "--candidate-ref", "HEAD"], monkeypatch)
    wt_root = os.path.join(fixture_repo, ".tmp", "ab_worktrees")
    assert not os.path.exists(os.path.join(wt_root, "base"))
    assert not os.path.exists(os.path.join(wt_root, "candidate"))


def test_dirty_tree_guard(fixture_repo, monkeypatch):
    with open(os.path.join(fixture_repo, "wall.txt"), "a") as f:
        f.write("dirty\n")
    with pytest.raises(SystemExit, match="dirty"):
        _main(["--base-ref", "HEAD~1"], monkeypatch)
    # --allow-dirty bypasses the guard (worktrees materialize committed
    # state, so the run itself is still reproducible refs-vs-refs)
    rc = _main(
        ["--base-ref", "HEAD~1", "--candidate-ref", "HEAD", "--allow-dirty"],
        monkeypatch,
    )
    assert rc == 0
