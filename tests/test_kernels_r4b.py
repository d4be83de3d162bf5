"""Round-4 kernel additions: k-core peel, personalized PageRank, HITS.

Each new kernel is oracle-checked against an independent pure-NumPy
re-implementation on random graphs, plus structure-specific cases
(full-collapse cores, frontier restart after resume)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _sym_random_graph(tmp_root, seed, V=800, E=2600, num_parts=3,
                      tag="symg"):
    """Symmetric deduped self-loop-free random graph + its edge array."""
    import ray.data as rd

    from planar_ray.graph import partition_edges

    rng = np.random.default_rng(seed)
    a = rng.integers(0, V, E)
    b = rng.integers(0, V, E)
    keep = a != b
    pairs = np.unique(
        np.stack([np.minimum(a[keep], b[keep]),
                  np.maximum(a[keep], b[keep])], 1), axis=0)
    edges = np.concatenate([pairs, pairs[:, ::-1]])
    root = f"{tmp_root}/{tag}_{seed}"
    ds = rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]}))
    g = partition_edges(ds, root, V, num_parts=num_parts, direction="fwd")
    return g, edges, V


@pytest.mark.parametrize("k", [2, 4, 7])
def test_kcore_matches_numpy_peel(tmp_root, k):
    from planar_ray.kernels.kcore import kcore, kcore_oracle

    g, edges, V = _sym_random_graph(tmp_root, seed=11 + k)
    state, eng = kcore(g, k)
    tab = state.select_columns(["v", "val", "alive"]).to_pandas()
    tab = tab.sort_values("v")
    alive = tab["alive"].to_numpy().astype(bool)
    coredeg = np.where(alive, tab["val"].to_numpy(), 0).astype(np.int64)
    oalive, ocoredeg = kcore_oracle(edges, V, k)
    assert np.array_equal(alive, oalive)
    assert np.array_equal(coredeg, ocoredeg)


def test_kcore_full_collapse_and_trivial(tmp_root):
    """k above the max degree empties the graph; k=0 keeps everything
    with val == full degree."""
    from planar_ray.kernels.kcore import kcore

    g, edges, V = _sym_random_graph(tmp_root, seed=5, V=300, E=900)
    deg = np.bincount(edges[:, 0], minlength=V)
    state, _ = kcore(g, int(deg.max()) + 1)
    t = state.select_columns(["alive"]).to_pandas()
    assert int(t["alive"].sum()) == 0
    state, _ = kcore(g, 0)
    t = state.select_columns(["v", "val", "alive"]).to_pandas().sort_values("v")
    assert int(t["alive"].sum()) == V
    assert np.array_equal(t["val"].to_numpy().astype(np.int64), deg)


def test_kcore_checkpoint_resume(tmp_root, tmp_path):
    """Kill-after-superstep-1 resume reproduces the uninterrupted peel."""
    from planar_ray.kernels.kcore import kcore

    g, edges, V = _sym_random_graph(tmp_root, seed=23, V=600, E=1500)
    k = 3
    full, _ = kcore(g, k)
    want = full.select_columns(["v", "val", "alive"]).to_pandas().sort_values("v")

    run_dir = str(tmp_path / "kcore_run")
    part, _ = kcore(g, k, max_iters=2, checkpoint_every=1, run_dir=run_dir)
    res, _ = kcore(g, k, checkpoint_every=1, run_dir=run_dir, resume=True)
    got = res.select_columns(["v", "val", "alive"]).to_pandas().sort_values("v")
    assert np.array_equal(got["alive"].to_numpy(), want["alive"].to_numpy())
    assert np.array_equal(got["val"].to_numpy(), want["val"].to_numpy())
