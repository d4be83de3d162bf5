"""Round-5 fixes: ADVICE items — spread-sampled kcore symmetry gate,
validated HITS lift cache, hits_scores zero-mass guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_symmetry_gate_catches_tail_asymmetry(tmp_root):
    """A store whose LOW-id edges are all reciprocated but whose tail
    holds a reverse-less edge must fail the gate (the old head-sample
    inspected only partition 0's lowest-id corner)."""
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.kcore import assert_symmetric_sample

    V = 1000
    rng = np.random.default_rng(7)
    a = rng.integers(0, 120, 600)
    b = rng.integers(0, 120, 600)
    keep = a != b
    pairs = np.unique(np.stack([np.minimum(a[keep], b[keep]),
                                np.maximum(a[keep], b[keep])], 1), axis=0)
    sym = np.concatenate([pairs, pairs[:, ::-1]])
    # one directed tail edge with NO reverse, far from the head
    bad = np.array([[900, 950]])
    edges = np.concatenate([sym, bad])
    ds = rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]}))
    g = partition_edges(ds, f"{tmp_root}/tail_asym", V, num_parts=3,
                        direction="fwd")
    with pytest.raises(ValueError, match="not symmetric"):
        assert_symmetric_sample(g)


def test_symmetry_gate_passes_symmetric_store(tmp_root):
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.kcore import assert_symmetric_sample

    V = 500
    rng = np.random.default_rng(9)
    a = rng.integers(0, V, 1500)
    b = rng.integers(0, V, 1500)
    keep = a != b
    pairs = np.unique(np.stack([np.minimum(a[keep], b[keep]),
                                np.maximum(a[keep], b[keep])], 1), axis=0)
    sym = np.concatenate([pairs, pairs[:, ::-1]])
    ds = rd.from_arrow(pa.table({"src": sym[:, 0], "dst": sym[:, 1]}))
    g = partition_edges(ds, f"{tmp_root}/tail_sym_ok", V, num_parts=4,
                        direction="fwd")
    assert_symmetric_sample(g)  # must not raise


def test_stale_hits_lift_cache_rebuilt(tmp_root):
    """Rebuilding the base graph in place must invalidate the cached
    bipartite lift (validated on 2V/2E, not mere existence)."""
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.hits import hits, hits_oracle, hits_scores

    V = 60
    root = f"{tmp_root}/hits_stale_base"
    lift = f"{tmp_root}/hits_stale_lift"

    def build(edges):
        ds = rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]}))
        return partition_edges(ds, root, V, num_parts=2, direction="fwd")

    rng = np.random.default_rng(3)
    e1 = np.unique(np.stack([rng.integers(0, V, 150),
                             rng.integers(0, V, 150)], 1), axis=0)
    e1 = e1[e1[:, 0] != e1[:, 1]]
    g1 = build(e1)
    state, _e, _V = hits(g1, lift, iters=3)
    hub, auth = hits_scores(state, V)

    # rebuild IN PLACE with a different (smaller) edge set
    e2 = e1[: len(e1) // 2]
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    g2 = build(e2)
    state2, _e2, _V2 = hits(g2, lift, iters=3)
    hub2, auth2 = hits_scores(state2, V)
    ohub, oauth = hits_oracle(e2, V, iters=3)
    keep = ~np.isnan(ohub)
    np.testing.assert_allclose(hub2, ohub, atol=1e-9)
    np.testing.assert_allclose(auth2, oauth, atol=1e-9)
    # and the stale scores genuinely differ (the cache WAS the hazard)
    assert not np.allclose(hub, hub2)


def test_hits_scores_zero_mass_raises():
    import ray.data as rd

    from planar_ray.kernels.hits import hits_scores

    V = 4
    # hub half has mass, auth half (v >= V) is all zero
    tab = pa.table({
        "v": np.arange(2 * V, dtype=np.int64),
        "val": np.concatenate([np.ones(V), np.zeros(V)]),
    })
    with pytest.raises(ValueError, match="zero L1 mass"):
        hits_scores(rd.from_arrow(tab), V)
