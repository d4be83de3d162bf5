"""Coloring / RandomWalk / GNN parity vs NumPy oracles."""

from __future__ import annotations

import numpy as np
import pytest

from planar_ray.kernels import coloring, gnn, random_walk
from planar_ray.kernels.coloring import coloring_oracle
from planar_ray.kernels.gnn import FDIM, gnn_oracle
from planar_ray.kernels.randomwalk import random_walk_oracle
from tests.test_kernels import CASES, make_graph


@pytest.mark.parametrize("name", ["simple", "two_cliques", "tri_tail"])
def test_coloring_proper_and_deterministic(name, tmp_root):
    edges, n = CASES[name]
    g = make_graph(edges, f"{tmp_root}/col_{name}")
    state, eng = coloring(g)
    df = state.to_pandas().sort_values("v")
    colors = df["val"].to_numpy()
    # proper coloring: no adjacent equal colors
    for a, b in edges:
        if a != b:
            assert colors[a] != colors[b], (name, a, b)
    # exact trajectory parity with the oracle
    want = coloring_oracle(edges, n)
    assert (colors == want[df["v"].to_numpy()]).all(), (name, colors, want)


@pytest.mark.parametrize("name", ["simple", "two_cliques", "sink"])
def test_random_walk_matches_oracle(name, tmp_root):
    edges, n = CASES[name]
    g = make_graph(edges, f"{tmp_root}/rw_{name}")
    out = random_walk(g).to_pandas().sort_values("origin")
    want = random_walk_oracle(edges, n)
    assert (out["final_v"].to_numpy() == want[out["origin"].to_numpy()]).all()


@pytest.mark.parametrize("name", ["simple", "sink"])
def test_gnn_matches_oracle(name, tmp_root):
    edges, n = CASES[name]
    g = make_graph(edges, f"{tmp_root}/gnn_{name}")
    state, eng = gnn(g, layers=2)
    df = state.to_pandas().sort_values("v")
    got = df[[f"f{j}" for j in range(FDIM)]].to_numpy()
    want = gnn_oracle(edges, n, layers=2)
    assert np.allclose(got, want[df["v"].to_numpy()], atol=1e-9)