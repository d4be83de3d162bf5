"""Round-5 late kernels: weighted SSSP and full coreness decomposition.

Both oracle-checked against INDEPENDENT pure-NumPy algorithms on random
graphs (dense Bellman-Ford for wsssp; Batagelj-style peel for coreness
— the engine runs the h-index iteration, so agreement validates the
algorithm, not just the plumbing)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _sym_random_graph(tmp_root, seed, V=800, E=2600, num_parts=3,
                      tag="symg5d"):
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


def _directed_random_graph(tmp_root, seed, V=600, E=2400, num_parts=3,
                           tag="dirg5d"):
    import ray.data as rd

    from planar_ray.graph import partition_edges

    rng = np.random.default_rng(seed)
    a = rng.integers(0, V, E)
    b = rng.integers(0, V, E)
    keep = a != b
    edges = np.unique(np.stack([a[keep], b[keep]], 1), axis=0)
    root = f"{tmp_root}/{tag}_{seed}"
    ds = rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]}))
    g = partition_edges(ds, root, V, num_parts=num_parts, direction="fwd")
    return g, edges, V


@pytest.mark.parametrize("seed", [3, 17])
def test_wsssp_matches_bellman_ford(tmp_root, seed):
    from planar_ray.kernels.sssp import INF, wsssp, wsssp_oracle

    g, edges, V = _directed_random_graph(tmp_root, seed)
    state, eng = wsssp(g, source=0)
    assert eng.metrics[-1].changed == 0  # converged, not capped
    tab = state.select_columns(["v", "val"]).to_pandas().sort_values("v")
    got = tab["val"].to_numpy()
    want = wsssp_oracle(edges, V, source=0)
    assert np.array_equal(got, want)
    assert got[0] == 0 and (got[got < INF] >= 0).all()


def test_wsssp_weights_differ_from_hops(tmp_root):
    """On a graph with weighted shortcuts, wsssp must not equal hop SSSP
    (guards against silently falling back to +1 relaxation)."""
    from planar_ray.kernels.sssp import INF, sssp, wsssp

    g, edges, V = _directed_random_graph(tmp_root, seed=29)
    ws, _ = wsssp(g, source=0)
    hs, _ = sssp(g, source=0)
    wt = ws.select_columns(["v", "val"]).to_pandas().sort_values("v")
    ht = hs.select_columns(["v", "val"]).to_pandas().sort_values("v")
    w = wt["val"].to_numpy()
    h = ht["val"].to_numpy()
    reach = (w < INF) & (h < INF)
    assert (w[reach] >= h[reach]).all()  # weights are >= 1 per edge
    assert (w[reach] > h[reach]).any()   # and genuinely weighted


@pytest.mark.parametrize("seed", [5, 23])
def test_coreness_matches_numpy_peel(tmp_root, seed):
    from planar_ray.kernels.coreness import coreness, coreness_oracle

    g, edges, V = _sym_random_graph(tmp_root, seed)
    state, eng = coreness(g)
    assert eng.metrics[-1].changed == 0
    tab = state.select_columns(["v", "val"]).to_pandas().sort_values("v")
    got = tab["val"].to_numpy().astype(np.int64)
    want = coreness_oracle(edges, V)
    assert np.array_equal(got, want)


def test_coreness_consistent_with_kcore(tmp_root):
    """Cross-kernel invariant: v survives the k-core peel iff
    coreness(v) >= k."""
    from planar_ray.kernels.coreness import coreness
    from planar_ray.kernels.kcore import kcore

    k = 4
    g, edges, V = _sym_random_graph(tmp_root, seed=41)
    cstate, _ = coreness(g)
    kstate, _ = kcore(g, k)
    ct = cstate.select_columns(["v", "val"]).to_pandas().sort_values("v")
    kt = kstate.select_columns(["v", "alive"]).to_pandas().sort_values("v")
    core = ct["val"].to_numpy()
    alive = kt["alive"].to_numpy().astype(bool)
    assert np.array_equal(alive, core >= k)


def test_coreness_rejects_directed_store(tmp_root):
    from planar_ray.kernels.coreness import coreness

    g, edges, V = _directed_random_graph(tmp_root, seed=7, tag="dirg5d_gate")
    with pytest.raises(ValueError, match="symmetric|self-loops"):
        coreness(g)


def test_coreness_checkpoint_resume(tmp_root, tmp_path):
    """Interrupted coreness run resumes from its manifest to the same
    fixpoint as the uninterrupted run."""
    from planar_ray.kernels.coreness import coreness

    g, edges, V = _sym_random_graph(tmp_root, seed=53)
    full, _ = coreness(g)
    want = full.select_columns(["v", "val"]).to_pandas().sort_values("v")

    run_dir = str(tmp_path / "coreness_run")
    coreness(g, max_iters=2, checkpoint_every=1, run_dir=run_dir)
    res, _ = coreness(g, checkpoint_every=1, run_dir=run_dir, resume=True)
    got = res.select_columns(["v", "val"]).to_pandas().sort_values("v")
    assert np.array_equal(got["val"].to_numpy(), want["val"].to_numpy())


def test_cli_runs_wsssp_and_coreness(tmp_root, capsys):
    """`cli run --kernel wsssp|coreness` operability against prebuilt
    stores (directed for wsssp, symmetric for coreness)."""
    import json as _json

    import ray.data as rd

    from planar_ray import cli
    from planar_ray.graph import partition_edges, sym_dedup_edges

    rng = np.random.default_rng(67)
    V, E = 400, 1400
    a = rng.integers(0, V, E)
    b = rng.integers(0, V, E)
    keep = a != b
    edges = np.unique(np.stack([a[keep], b[keep]], 1), axis=0)
    ds = rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]}))
    droot = f"{tmp_root}/cli5d_dir"
    partition_edges(ds, droot, V, num_parts=2, direction="fwd")
    sroot = f"{tmp_root}/cli5d_sym"
    partition_edges(sym_dedup_edges(ds), sroot, V, num_parts=2,
                    direction="fwd")

    cli.main(["run", "--kernel", "wsssp", "--graph", droot, "--source", "0"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["supersteps"] >= 1

    cli.main(["run", "--kernel", "coreness", "--graph", sroot])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["max_coreness"] >= 1 and out["supersteps"] >= 1
