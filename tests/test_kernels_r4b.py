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


def _directed_random_graph(tmp_root, seed, V=700, E=2200, num_parts=3):
    import ray.data as rd

    from planar_ray.graph import partition_edges

    rng = np.random.default_rng(seed)
    a = rng.integers(0, V, E)
    b = rng.integers(0, V, E)
    keep = a != b
    edges = np.unique(np.stack([a[keep], b[keep]], 1), axis=0)
    root = f"{tmp_root}/dirg_{seed}"
    ds = rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]}))
    g = partition_edges(ds, root, V, num_parts=num_parts, direction="fwd")
    return g, edges, V


def test_ppr_matches_dense_oracle(tmp_root):
    """Seeded teleport + dangling-mass-to-seeds vs the dense oracle;
    the random directed graph has dangling vertices by construction."""
    from planar_ray.kernels.ppr import ppr, ppr_oracle

    g, edges, V = _directed_random_graph(tmp_root, seed=31)
    deg = np.bincount(edges[:, 0], minlength=V)
    assert (deg == 0).any()  # dangling path actually exercised
    seeds = np.arange(0, V, 37)
    state, _ = ppr(g, seeds, iters=12)
    tab = state.select_columns(["v", "val"]).to_pandas().sort_values("v")
    want = ppr_oracle(edges, V, seeds, iters=12)
    np.testing.assert_allclose(tab["val"].to_numpy(), want, rtol=1e-12,
                               atol=1e-15)
    # total mass stays 1 under the dangling-to-seeds formulation
    assert abs(tab["val"].sum() - 1.0) < 1e-9


def test_ppr_single_seed_localises(tmp_root):
    """With one seed, mass concentrates at/near the seed: the seed's
    score must be the global max."""
    from planar_ray.kernels.ppr import ppr

    g, edges, V = _directed_random_graph(tmp_root, seed=43)
    state, _ = ppr(g, np.array([5]), iters=15)
    tab = state.select_columns(["v", "val"]).to_pandas().sort_values("v")
    val = tab["val"].to_numpy()
    assert val.argmax() == 5
    assert abs(val.sum() - 1.0) < 1e-9


def test_hits_matches_dense_oracle(tmp_root):
    from planar_ray.kernels.hits import hits, hits_oracle

    g, edges, V = _directed_random_graph(tmp_root, seed=61, V=500, E=1700)
    state, _eng, _ = hits(g, f"{tmp_root}/hits_lift_61", iters=4)
    tab = state.select_columns(["v", "val"]).to_pandas().sort_values("v")
    val = tab["val"].to_numpy()
    hub = val[:V] / val[:V].sum()
    auth = val[V:] / val[V:].sum()
    oh, oa = hits_oracle(edges, V, iters=4)
    np.testing.assert_allclose(hub, oh, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(auth, oa, rtol=1e-10, atol=1e-14)


def test_hits_bipartite_halves(tmp_root):
    """On a purely bipartite graph (sources never targets), hub mass
    sits on sources, authority mass on targets."""
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.hits import hits

    rng = np.random.default_rng(9)
    n_src, V = 40, 100  # sources 0..39, targets 40..99
    src = rng.integers(0, n_src, 300)
    dst = rng.integers(n_src, V, 300)
    edges = np.unique(np.stack([src, dst], 1), axis=0)
    root = f"{tmp_root}/bip"
    ds = rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]}))
    g = partition_edges(ds, root, V, num_parts=2, direction="fwd")
    state, _eng, _ = hits(g, f"{root}_lift", iters=3)
    tab = state.select_columns(["v", "val"]).to_pandas().sort_values("v")
    val = tab["val"].to_numpy()
    hub, auth = val[:V], val[V:]
    assert hub[n_src:].sum() == 0.0      # targets are never hubs
    assert auth[:n_src].sum() == 0.0     # sources are never authorities
    assert hub[:n_src].sum() > 0 and auth[n_src:].sum() > 0


def test_sym_dedup_edges_matches_numpy():
    """sym_dedup_edges == np.unique canonical pairs, both orientations —
    including multi-edges, self-loops and both-orientation duplicates in
    the input."""
    import ray.data as rd

    from planar_ray.graph import sym_dedup_edges

    rng = np.random.default_rng(77)
    a = rng.integers(0, 50, 400)
    b = rng.integers(0, 50, 400)
    raw = np.stack([a, b], 1)
    raw = np.concatenate([raw, raw[:17], raw[:9, ::-1]])  # dups both ways
    ds = rd.from_arrow(pa.table({"src": raw[:, 0], "dst": raw[:, 1]}))
    got = sym_dedup_edges(ds, num_buckets=7).to_pandas()
    got = got.sort_values(["src", "dst"]).reset_index(drop=True)
    keep = raw[:, 0] != raw[:, 1]
    lo = np.minimum(raw[keep, 0], raw[keep, 1])
    hi = np.maximum(raw[keep, 0], raw[keep, 1])
    pairs = np.unique(np.stack([lo, hi], 1), axis=0)
    want = np.concatenate([pairs, pairs[:, ::-1]])
    want = want[np.lexsort((want[:, 1], want[:, 0]))]
    assert np.array_equal(got[["src", "dst"]].to_numpy(), want)


def test_cli_runs_new_kernels(tmp_root, capsys):
    """`cli run --kernel kcore|ppr|hits` operability: each prints a JSON
    line with superstep metrics against a prebuilt graph store."""
    import json as _json

    import ray.data as rd

    from planar_ray import cli
    from planar_ray.graph import partition_edges, sym_dedup_edges

    rng = np.random.default_rng(101)
    V, E = 400, 1400
    a = rng.integers(0, V, E)
    b = rng.integers(0, V, E)
    keep = a != b
    edges = np.unique(np.stack([a[keep], b[keep]], 1), axis=0)
    ds = rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]}))
    droot = f"{tmp_root}/cli_new_dir"       # directed store (ppr, hits)
    partition_edges(ds, droot, V, num_parts=2, direction="fwd")
    sroot = f"{tmp_root}/cli_new_sym"       # symmetric store (kcore)
    partition_edges(sym_dedup_edges(ds), sroot, V, num_parts=2,
                    direction="fwd")

    cli.main(["run", "--kernel", "kcore", "--graph", sroot, "--iters", "3"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["k"] == 3 and 0 <= out["core_size"] <= V
    assert out["supersteps"] >= 1

    cli.main(["run", "--kernel", "ppr", "--graph", droot, "--iters", "5"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["supersteps"] == 5

    cli.main(["run", "--kernel", "hits", "--graph", droot, "--iters", "2"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["supersteps"] == 4  # 2 iterations = 4 half-step supersteps


def test_kcore_property_fuzz(tmp_root):
    """PROPERTY: engine peel == NumPy peel for arbitrary small graphs
    and k (incl. k=0/1, multi-component graphs, isolated vertices)."""
    from hypothesis import given, settings, strategies as st

    import ray.data as rd

    from planar_ray.graph import partition_edges, sym_dedup_edges
    from planar_ray.kernels.kcore import kcore, kcore_oracle

    case = [0]

    @given(st.integers(0, 2**31), st.integers(10, 80), st.integers(0, 6))
    @settings(max_examples=10, deadline=None)
    def check(seed, V, k):
        rng = np.random.default_rng(seed)
        E = int(rng.integers(V // 2, 3 * V))
        a = rng.integers(0, V, E)
        b = rng.integers(0, V, E)
        case[0] += 1
        ds = rd.from_arrow(pa.table({"src": a, "dst": b}))
        root = f"{tmp_root}/fuzz_{case[0]}"
        g = partition_edges(sym_dedup_edges(ds, num_buckets=5), root, V,
                            num_parts=2, direction="fwd")
        state, _ = kcore(g, k)
        tab = state.select_columns(["v", "val", "alive"]).to_pandas()
        tab = tab.sort_values("v")
        alive = tab["alive"].to_numpy().astype(bool)
        coredeg = np.where(alive, tab["val"].to_numpy(), 0).astype(np.int64)
        # rebuild the exact sym-dedup edge array for the oracle
        keep = a != b
        lo = np.minimum(a[keep], b[keep])
        hi = np.maximum(a[keep], b[keep])
        pairs = np.unique(np.stack([lo, hi], 1), axis=0)
        edges = np.concatenate([pairs, pairs[:, ::-1]])
        oalive, ocoredeg = kcore_oracle(edges, V, k)
        assert np.array_equal(alive, oalive)
        assert np.array_equal(coredeg, ocoredeg)

    check()


def test_kcore_rejects_directed_store(tmp_root):
    """Review finding: pointing kcore at an ordinary directed store must
    fail loudly (sampled symmetry gate), not peel by out-degree."""
    from planar_ray.kernels.kcore import kcore

    g, edges, V = _directed_random_graph(tmp_root, seed=87)
    with pytest.raises(ValueError, match="not symmetric|self-loops"):
        kcore(g, 2)


def test_cli_ppr_source_zero_and_kcore_k_zero(tmp_root, capsys):
    """Review findings: --source 0 must run a SINGLE-seed PPR from
    vertex 0 (not the multi-seed default), and --iters 0 must run
    kcore with k=0 (everything survives)."""
    import json as _json

    import ray.data as rd

    from planar_ray import cli
    from planar_ray.graph import partition_edges, sym_dedup_edges
    from planar_ray.kernels.ppr import ppr

    rng = np.random.default_rng(55)
    V, E = 200, 700
    a = rng.integers(0, V, E)
    b = rng.integers(0, V, E)
    keep = a != b
    edges = np.unique(np.stack([a[keep], b[keep]], 1), axis=0)
    ds = rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]}))
    droot = f"{tmp_root}/cli_zero_dir"
    g = partition_edges(ds, droot, V, num_parts=2, direction="fwd")
    sroot = f"{tmp_root}/cli_zero_sym"
    partition_edges(sym_dedup_edges(ds), sroot, V, num_parts=2,
                    direction="fwd")

    cli.main(["run", "--kernel", "ppr", "--graph", droot,
              "--iters", "5", "--source", "0"])
    got = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the CLI really seeded {0}: its per-step max_delta trail must match
    # the library single-seed run exactly (the multi-seed default's
    # deltas differ from the first step)
    want_state, want_eng = ppr(g, np.array([0]), iters=5)
    want_tail = [m.max_delta for m in want_eng.metrics[-3:]]
    got_tail = [m["max_delta"] for m in got["metrics_tail"]]
    assert got_tail == want_tail
    want = want_state.select_columns(["v", "val"]).to_pandas().sort_values("v")
    assert want["val"].to_numpy().argmax() == 0  # sanity: seed dominates

    cli.main(["run", "--kernel", "kcore", "--graph", sroot, "--iters", "0"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["k"] == 0 and out["core_size"] == V


def test_hits_checkpoint_resume_phase_parity(tmp_root, tmp_path):
    """Resume mid-run must restore the superstep counter so the
    auth/hub phase alternation stays aligned: a run interrupted after
    an ODD number of supersteps and resumed must reproduce the
    uninterrupted scores exactly."""
    from planar_ray.kernels.hits import hits

    g, edges, V = _directed_random_graph(tmp_root, seed=71, V=300, E=900)
    lift = f"{tmp_root}/hits_resume_lift"
    full_state, _e, _ = hits(g, lift, iters=3)
    want = full_state.select_columns(["v", "val"]).to_pandas().sort_values("v")

    run_dir = str(tmp_path / "hits_run")
    # interrupt after 3 supersteps (mid-iteration: auth updated, hub not)
    eng_kw = dict(run_dir=run_dir, checkpoint_every=1)
    from planar_ray.graph import Graph
    from planar_ray.kernels.hits import HITSKernel, lift_graph
    from planar_ray.superstep import Engine

    lifted = lift_graph(g, lift)
    eng = Engine(lifted, HITSKernel(V, iters=3), **eng_kw)
    eng.run(max_supersteps=3)
    # resume to completion
    res_state, _e2, _ = hits(g, lift, iters=3, run_dir=run_dir,
                             checkpoint_every=1, resume=True)
    got = res_state.select_columns(["v", "val"]).to_pandas().sort_values("v")
    np.testing.assert_allclose(got["val"].to_numpy(), want["val"].to_numpy(),
                               rtol=0, atol=0)


def test_hll_sketch_accuracy_and_bitlength():
    """HLL internals: exact uint64 bit-length vs Python int.bit_length
    (incl. >2^53 where float log2 misrounds), and the dense-register
    estimator within ~4 standard errors on 200k distinct tokens (the
    driver corpus's 31-word dictionary only exercises the
    linear-counting branch)."""
    from planar_ray.pipelines.docs import (
        HLL_B,
        HLL_M,
        HLL_SEED,
        _bit_length_u64,
        _hll_estimate,
    )
    from planar_ray.util import poly_splitmix_vec

    rng = np.random.default_rng(13)
    w = rng.integers(0, 2**63, 5000, dtype=np.uint64)
    w[:10] = [0, 1, 2, (1 << 53) - 1, 1 << 53, (1 << 53) + 1,
              (1 << 54) - 1, 1 << 54, (1 << 62), (1 << 63) - 1]
    got = _bit_length_u64(w)
    want = np.array([int(x).bit_length() for x in w], dtype=np.int64)
    assert np.array_equal(got, want)

    n_distinct = 200_000
    toks = np.array([f"tok{i}" for i in range(n_distinct)], dtype=object)
    hv = poly_splitmix_vec(toks, HLL_SEED)
    bucket = (hv & np.uint64(HLL_M - 1)).astype(np.int64)
    rho = (64 - HLL_B + 1) - _bit_length_u64(hv >> np.uint64(HLL_B))
    reg = np.zeros(HLL_M, np.int64)
    np.maximum.at(reg, bucket, rho)
    nz = int((reg > 0).sum())
    denom = float(np.sum(np.power(2.0, -reg[reg > 0].astype(np.float64)))
                  + (HLL_M - nz))
    est = _hll_estimate(denom, nz)
    rel_err = abs(est - n_distinct) / n_distinct
    assert rel_err < 4 * 1.04 / np.sqrt(HLL_M), (est, rel_err)
