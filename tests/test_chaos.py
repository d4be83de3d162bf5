"""Mid-superstep chaos tests (VERDICT r4 item 2): kill a worker process
/ remove a whole virtual node WHILE supersteps run; the engine must
recover (Ray task retry / lineage reconstruction, or clean checkpoint
resume) with state bit-identical to an uninterrupted run.

Run as subprocesses — killing workers inside the session-scoped Ray
would poison every other test."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest


def _run(mode: str, extra=()):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    env["PYTHONPATH"] = repo
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "chaos_kill.py"),
         "--mode", mode, "--edges", "2000000", "--parts", "8",
         "--steps", "25", *extra],
        # nominal ~35 s; the sandbox box sporadically DRAM-throttles 10x+
        # (see BENCH/BASELINE.md ceiling probes), so leave wide headroom
        capture_output=True, text=True, timeout=1200, env=env, cwd=repo)
    assert proc.returncode == 0, f"chaos {mode} failed:\n{proc.stderr[-2500:]}"
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_worker_sigkill_mid_superstep_bit_identical():
    out = _run("worker")
    assert out["match"] is True
    assert out["kills"] >= 1, "no worker was actually killed mid-run"


def _cluster_available() -> bool:
    try:
        from ray.cluster_utils import Cluster  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _cluster_available(),
                    reason="ray.cluster_utils.Cluster unavailable")
def test_node_loss_mid_run_recovers():
    out = _run("node", extra=("--kill-after", "1.0"))
    assert out["match"] is True
    assert out["alive_after"] == 3  # the node really died
    assert out["recovered_via"] in ("lineage", "checkpoint_resume")
