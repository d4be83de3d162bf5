"""Virtual multi-node validation of the grouped exchange wire (VERDICT
r4 item 1): runs tools/cluster_wire.py in a SUBPROCESS (it owns its own
ray.cluster_utils.Cluster — it must not touch the session-scoped local
Ray) and asserts the JSON verdict.

Covers, on a real 4-raylet topology:
  * PLANAR_GROUP_AUTO_P auto-grouping derives G = alive node count
  * flat vs grouped wires bit-identical
  * each group table held by <= 2 nodes (one fetch per destination node)
  * wave object count P x G grouped vs P x P flat
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest


def _cluster_available() -> bool:
    try:
        from ray.cluster_utils import Cluster  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _cluster_available(),
                    reason="ray.cluster_utils.Cluster unavailable")
def test_grouped_wire_on_virtual_cluster(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    env["PYTHONPATH"] = repo
    # keep the subprocess cluster off the session Ray's temp dir
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "cluster_wire.py"),
         "--nodes", "3", "--cpus", "1", "--edges", "240000",
         "--parts", "6", "--steps", "4", "--time-batches", "1",
         "--store-mb", "300"],
        capture_output=True, text=True, timeout=420, env=env, cwd=repo)
    assert proc.returncode == 0, \
        f"cluster_wire failed:\n{proc.stderr[-3000:]}"
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["ok"] is True
    assert out["bit_identical"] is True
    assert out["nodes"] == 3
    assert out["grouped"]["G"] == 3
    assert out["grouped"]["wave_objects"] == 6 * 3
    assert out["flat"]["wave_objects"] == 6 * 6
    assert out["grouped"]["copies_max"] <= 2
    assert out["grouped"]["frac_copies_le2"] >= 0.9
