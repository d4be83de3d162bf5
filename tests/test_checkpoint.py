"""Checkpoint/resume: kill mid-iteration, resume, match the uninterrupted run."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from planar_ray import graph as G
from planar_ray.kernels import pagerank
from planar_ray.kernels.pagerank import PageRankKernel
from planar_ray.superstep import Engine

EDGES = np.array(
    [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (1, 4)], dtype=np.int64
)


def _graph(tmp_root, name):
    ds = rd.from_arrow(pa.table({"src": EDGES[:, 0], "dst": EDGES[:, 1]}))
    return G.graph_from_id_edges(ds, f"{tmp_root}/{name}", num_parts=2)


def test_resume_matches_uninterrupted(tmp_root):
    g = _graph(tmp_root, "ckpt_g")

    # uninterrupted run
    full_state, full_eng = pagerank(g, max_supersteps=60)
    full = full_state.to_pandas().sort_values("v")["val"].to_numpy()
    total_steps = full_eng.metrics[-1].superstep

    # interrupted run: checkpoint every step, stop after 3 supersteps
    run_dir = f"{tmp_root}/ckpt_run"
    eng1 = Engine(g, PageRankKernel(), run_dir=run_dir, checkpoint_every=1)
    state = eng1.init_state()
    for s in range(3):
        state, _ = eng1.step(state, s)
    del eng1  # "crash"

    # manifests exist and carry lineage + metrics
    man = json.load(open(os.path.join(run_dir, "step_00002", "manifest.json")))
    assert man["superstep"] == 2
    assert man["kernel"] == "pagerank"
    assert man["metrics"]["edges_per_sec"] > 0
    assert man["lineage"]["prev_superstep"] == 1

    # resume from the latest checkpoint and finish
    eng2 = Engine(g, PageRankKernel(), run_dir=run_dir, checkpoint_every=1)
    state2 = eng2.run(max_supersteps=60, resume=True)
    resumed = state2.to_pandas().sort_values("v")["val"].to_numpy()
    # resumed run continued (did not restart from superstep 0)
    assert eng2.metrics[0].superstep == 3
    assert np.allclose(resumed, full, atol=1e-9)


def test_resume_with_no_checkpoint_starts_fresh(tmp_root):
    g = _graph(tmp_root, "ckpt_g2")
    eng = Engine(g, PageRankKernel(), run_dir=f"{tmp_root}/empty_run",
                 checkpoint_every=1)
    state = eng.run(max_supersteps=5, resume=True)
    assert state.count() == g.num_vertices
    assert eng.metrics[0].superstep == 0