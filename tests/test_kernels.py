"""Kernel parity tests: engine results vs pure-NumPy oracles.

Fixture graphs (FIXTURES.md §3): the reference repo's own 4-vertex
sample (/root/reference/testfile/simple.csv), two disjoint cliques, a
star (hub), a triangle with a tail, and a sink graph (dangling vertex).
"""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from planar_ray import graph as G
from planar_ray.kernels import (
    lpa,
    pagerank,
    pagerank_reference,
    sssp,
    triangle_count,
    wcc,
)
from planar_ray.kernels.lpa import lpa_oracle
from planar_ray.kernels.sssp import INF
from planar_ray.kernels.triangle import triangle_oracle

# the reference's own micro-graph: testfile/simple.csv
SIMPLE = np.array(
    [(0, 1), (0, 3), (1, 2), (1, 3), (2, 1), (2, 3), (3, 2), (3, 0)], dtype=np.int64
)
TWO_CLIQUES = np.array(
    [(a, b) for a in range(4) for b in range(4) if a != b]
    + [(a, b) for a in range(4, 7) for b in range(4, 7) if a != b],
    dtype=np.int64,
)
STAR = np.array([(i, 0) for i in range(1, 9)], dtype=np.int64)
TRI_TAIL = np.array([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)], dtype=np.int64)
SINK = np.array([(0, 1), (1, 2), (2, 3), (0, 2)], dtype=np.int64)  # 3 is dangling


def make_graph(edges, root, num_parts=3):
    ds = rd.from_arrow(
        __import__("pyarrow").table(
            {"src": edges[:, 0].tolist(), "dst": edges[:, 1].tolist()}
        )
    )
    return G.graph_from_id_edges(ds, root, num_parts=num_parts)


def state_values(state, col="val"):
    df = state.to_pandas().sort_values("v")
    return df["v"].to_numpy(), df[col].to_numpy()


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def pagerank_oracle(edges, n, damping=0.85, tol=1e-6, iters=500):
    """Textbook power iteration with dangling redistribution."""
    deg = np.zeros(n)
    np.add.at(deg, edges[:, 0], 1)
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, edges[:, 1], pr[edges[:, 0]] / deg[edges[:, 0]])
        dangling = pr[deg == 0].sum()
        new = (1 - damping) / n + damping * (contrib + dangling / n)
        if np.abs(new - pr).max() < tol:
            return new
        pr = new
    return pr


def ref_pagerank_oracle(edges, n, iters=10):
    """The reference kernel exactly (pagerank_app.h:74-99): init 1/deg
    (1/n if deg==0); each round pr'[v] = 0.85*sum(pr[out(v)])/deg(v) for
    deg>0, zero-degree vertices keep their value."""
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, edges[:, 0], 1)
    pr = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 1.0 / n)
    for _ in range(iters):
        new = pr.copy()
        s = np.zeros(n)
        np.add.at(s, edges[:, 0], pr[edges[:, 1]])
        nz = deg > 0
        new[nz] = 0.85 * s[nz] / deg[nz]
        pr = new
    return pr


def wcc_oracle(edges, n):
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n)])


def sssp_oracle(edges, n, src):
    from collections import deque

    adj = {}
    for a, b in edges:
        adj.setdefault(int(a), []).append(int(b))
    dist = np.full(n, int(INF), dtype=np.int64)
    dist[src] = 0
    q = deque([src])
    while q:
        u = q.popleft()
        for w in adj.get(u, []):
            if dist[w] > dist[u] + 1:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

CASES = {
    "simple": (SIMPLE, 4),
    "two_cliques": (TWO_CLIQUES, 7),
    "star": (STAR, 9),
    "tri_tail": (TRI_TAIL, 5),
    "sink": (SINK, 4),
}


@pytest.mark.parametrize("name", list(CASES))
def test_pagerank_matches_oracle(name, tmp_root):
    edges, n = CASES[name]
    g = make_graph(edges, f"{tmp_root}/pr_{name}")
    state, eng = pagerank(g, max_supersteps=300)
    v, vals = state_values(state)
    want = pagerank_oracle(edges, n)
    assert np.allclose(vals, want[v], atol=1e-6), (name, vals, want[v])


@pytest.mark.parametrize("name", ["simple", "sink", "star"])
def test_reference_pagerank_parity(name, tmp_root):
    edges, n = CASES[name]
    g = make_graph(edges, f"{tmp_root}/prref_{name}")
    state, eng = pagerank_reference(g, iters=10)
    v, vals = state_values(state)
    want = ref_pagerank_oracle(edges, n, iters=10)
    assert np.allclose(vals, want[v], atol=1e-6), (name, vals, want[v])


@pytest.mark.parametrize("name", list(CASES))
def test_wcc_matches_oracle(name, tmp_root):
    edges, n = CASES[name]
    g = make_graph(edges, f"{tmp_root}/wcc_{name}")
    state, eng = wcc(g)
    v, vals = state_values(state)
    want = wcc_oracle(edges, n)
    assert (vals == want[v]).all(), (name, vals, want[v])


@pytest.mark.parametrize("name", ["simple", "two_cliques", "star"])
def test_lpa_matches_oracle(name, tmp_root):
    edges, n = CASES[name]
    g = make_graph(edges, f"{tmp_root}/lpa_{name}")
    state, eng = lpa(g, max_iters=6)
    v, vals = state_values(state)
    want = lpa_oracle(edges, n, max_iters=6)
    assert (vals == want[v]).all(), (name, vals, want[v])


@pytest.mark.parametrize("name", list(CASES))
def test_sssp_matches_oracle(name, tmp_root):
    edges, n = CASES[name]
    g = make_graph(edges, f"{tmp_root}/sssp_{name}")
    state, eng = sssp(g, source=0)
    v, vals = state_values(state)
    want = sssp_oracle(edges, n, 0)
    assert (vals == want[v]).all(), (name, vals, want[v])


@pytest.mark.parametrize(
    "name,expect",
    [("simple", None), ("two_cliques", 4 + 1), ("star", 0), ("tri_tail", 1)],
)
def test_triangle_count(name, expect, tmp_root):
    edges, n = CASES[name]
    g = make_graph(edges, f"{tmp_root}/tri_{name}")
    got = triangle_count(g)
    want = triangle_oracle(edges) if expect is None else expect
    assert triangle_oracle(edges) == want  # sanity on hand counts
    assert got == want, (name, got, want)


def test_wcc_frontier_shrinks(tmp_root):
    """Frontier semantics: message volume must drop across supersteps."""
    edges, n = TWO_CLIQUES, 7
    g = make_graph(edges, f"{tmp_root}/wcc_frontier")
    state, eng = wcc(g)
    assert eng.metrics[-1].changed == 0  # converged: last sweep changed nothing
    msgs = [m.in_msgs for m in eng.metrics]
    assert msgs[-1] < msgs[0]  # frontier (and so message volume) shrank