"""Round-5 session-b additions: MIS kernel (deterministic-priority Luby
peeling) and the Jaccard link-prediction pipeline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _sym_random_graph(tmp_root, seed, V=800, E=2600, num_parts=3,
                      tag="misg"):
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


@pytest.mark.parametrize("seed,V,E", [(1, 60, 150), (2, 400, 1400),
                                      (3, 900, 2500)])
def test_mis_matches_greedy_oracle(tmp_root, seed, V, E):
    from planar_ray.kernels.mis import mis, mis_oracle

    g, edges, _ = _sym_random_graph(tmp_root, seed, V=V, E=E,
                                    tag=f"mis{V}")
    state, eng = mis(g)
    t = state.select_columns(["v", "val"]).to_pandas().sort_values("v")
    val = t["val"].to_numpy()
    assert (val != 0).all()
    got = val == 1
    want = mis_oracle(edges[:, 0], edges[:, 1], V)
    assert np.array_equal(got, want)


def test_mis_is_independent_and_maximal(tmp_root):
    from planar_ray.kernels.mis import mis

    g, edges, V = _sym_random_graph(tmp_root, seed=7, V=500, E=1700)
    state, _ = mis(g)
    t = state.select_columns(["v", "val"]).to_pandas().sort_values("v")
    inm = t["val"].to_numpy() == 1
    # independence: no edge inside the set
    assert not (inm[edges[:, 0]] & inm[edges[:, 1]]).any()
    # maximality: every non-member has a member neighbor
    blocked = np.zeros(V, bool)
    np.logical_or.at(blocked, edges[:, 1], inm[edges[:, 0]])
    assert (inm | blocked).all()


def test_mis_structures(tmp_root):
    """Star: exactly one of {center} / {leaves} by priority; path:
    matches the greedy oracle; isolated vertex always joins."""
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.mis import mis, mis_oracle
    from planar_ray.util import splitmix64

    # star on 0..6 centered at 0, isolated vertex 7
    pairs = np.array([[0, i] for i in range(1, 7)])
    edges = np.concatenate([pairs, pairs[:, ::-1]])
    V = 8
    g = partition_edges(
        rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]})),
        f"{tmp_root}/mis_star", V, num_parts=2, direction="fwd")
    state, _ = mis(g)
    t = state.select_columns(["v", "val"]).to_pandas().sort_values("v")
    inm = t["val"].to_numpy() == 1
    assert inm[7]  # isolated joins
    pri = splitmix64(np.arange(V, dtype=np.uint64))
    if pri[0] < pri[1:7].min():
        assert inm[0] and not inm[1:7].any()
    else:
        assert not inm[0] and inm[1:7].all()
    assert np.array_equal(inm, mis_oracle(edges[:, 0], edges[:, 1], V))


def test_mis_checkpoint_resume(tmp_root, tmp_path):
    from planar_ray.kernels.mis import mis

    g, edges, V = _sym_random_graph(tmp_root, seed=23, V=600, E=1500,
                                    tag="misck")
    full, _ = mis(g)
    want = full.select_columns(["v", "val"]).to_pandas().sort_values("v")

    run_dir = str(tmp_path / "mis_run")
    mis(g, max_supersteps=2, checkpoint_every=1, run_dir=run_dir)
    res, _ = mis(g, checkpoint_every=1, run_dir=run_dir, resume=True)
    got = res.select_columns(["v", "val"]).to_pandas().sort_values("v")
    assert np.array_equal(got["val"].to_numpy(), want["val"].to_numpy())


def test_mis_rejects_directed_store(tmp_root):
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.mis import mis

    rng = np.random.default_rng(3)
    e = np.unique(np.stack([rng.integers(0, 200, 600),
                            rng.integers(0, 200, 600)], 1), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    g = partition_edges(
        rd.from_arrow(pa.table({"src": e[:, 0], "dst": e[:, 1]})),
        f"{tmp_root}/mis_dir", 200, num_parts=2, direction="fwd")
    with pytest.raises(Exception):
        mis(g)


def _tri_per_vertex_oracle(edges: np.ndarray, V: int) -> np.ndarray:
    """Per-vertex triangle counts by direct enumeration (a<b<c)."""
    adj = [set() for _ in range(V)]
    canon = set()
    for s, d in edges:
        if s != d:
            adj[int(s)].add(int(d))
            adj[int(d)].add(int(s))
            canon.add((min(int(s), int(d)), max(int(s), int(d))))
    tri = np.zeros(V, np.int64)
    for a, b in canon:
        for c in adj[a] & adj[b]:
            if c > b:
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    return tri


@pytest.mark.parametrize("seed", [11, 12])
def test_triangle_per_vertex_matches_numpy(tmp_root, seed):
    from planar_ray.kernels.triangle import triangle_per_vertex

    g, edges, V = _sym_random_graph(tmp_root, seed, V=300, E=1800,
                                    tag="tpv")
    t = triangle_per_vertex(g).to_pandas()
    got = np.zeros(V, np.int64)
    got[t["v"].to_numpy()] = t["tri"].to_numpy()
    want = _tri_per_vertex_oracle(edges, V)
    assert np.array_equal(got, want)
    # triangle_count == sum / 3 cross-check
    from planar_ray.kernels import triangle_count

    assert triangle_count(g) == int(want.sum()) // 3


@pytest.mark.parametrize("k,local", [(3, True), (4, True), (5, True),
                                     (3, False)])
def test_ktruss_matches_bruteforce(tmp_root, k, local):
    """Both plans of the gated dual path: the bounded local peel
    (default at test scale) and the distributed per-round wedge join
    (local_threshold=0 forces the scale plan — a deliberately tiny,
    dense graph: every distributed round pays ~7 shuffle jobs of fixed
    overhead, so the test budget goes to round COUNT, not size)."""
    from planar_ray.kernels.triangle import ktruss, ktruss_oracle

    if local:
        V, E = 150, 900
    else:
        V, E = 40, 220  # dense -> shallow peel depth
    g, edges, V = _sym_random_graph(tmp_root, seed=31 + k, V=V, E=E,
                                    tag=f"kt{k}{int(local)}")
    thr = 5_000_000 if local else 0
    surv, rounds = ktruss(g, k, buckets=8, local_threshold=thr)
    df = surv.to_pandas()
    got = (set() if len(df) == 0
           else set(map(tuple, df[["a", "b"]].to_numpy())))
    want = ktruss_oracle(edges, k)
    assert got == want
    assert rounds >= 1


def test_ktruss_k2_keeps_everything(tmp_root):
    from planar_ray.kernels.triangle import ktruss

    g, edges, V = _sym_random_graph(tmp_root, seed=41, V=100, E=300,
                                    tag="kt2")
    surv, _ = ktruss(g, 2)
    assert surv.count() == len(edges) // 2  # canonical pairs


def test_jaccard_query_matches_duckdb():
    """g2_jaccard vs its SQL twin at sf0.001 (the shared
    _cn_pair_union stream + two bucketed degree joins)."""
    import duckdb

    from planar_ray.pipelines.testdata_graph import (QUERIES, ORACLES)

    sf = "/root/testdata/sf0.001"
    got = QUERIES["g2_jaccard"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = con.execute(ORACLES["g2_jaccard"]).df()
    assert len(got) == len(want)
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(g, w, check_dtype=False, rtol=0,
                                  atol=1e-9)
