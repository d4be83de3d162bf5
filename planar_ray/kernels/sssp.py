"""SSSP (hop distances) and k-hop reachability — frontier supersteps.

Capability parity with the reference's SSSP
(/root/reference/core/apps/sssp_app_op.h:70-97: unweighted graph, relax
pushes ``Read(id)+1`` via WriteMin, frontier = changed vertices) and
k-hop (/root/reference/core/apps/k_hop_app.cpp): identical semantics —
distances are hop counts, INF for unreachable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ..graph import CSRPart, Graph
from ..superstep import Engine, Kernel, combine_min

INF = np.int64(2**62)


class SSSPKernel(Kernel):
    name = "sssp"
    direction = "fwd"  # directed by default; pass a sym graph for undirected
    columns = {
        "val": pa.int64(),      # hop distance (INF unreachable)
        "active": pa.int8(),
        "changed": pa.int64(),
        "in_msgs": pa.int64(),
    }
    @property
    def message_columns(self):
        return ["val"]

    def __init__(self, source: int, direction: str = "fwd"):
        self.source = source
        self.direction = direction

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        val = np.full(n, INF, dtype=np.int64)
        active = np.zeros(n, np.int8)
        if begin <= self.source < end:
            val[self.source - begin] = 0
            active[self.source - begin] = 1
        return {"val": val, "active": active,
                "changed": np.zeros(n, np.int64),
                "in_msgs": np.zeros(n, np.int64)}

    def scatter(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        dist = np.repeat(cols["val"] + 1, counts)
        t, m = combine_min(nbrs, dist)
        return {"v": t, "val": m}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        best = np.full(n, INF, dtype=np.int64)
        if len(msgs["v"]):
            np.minimum.at(best, msgs["v"] - begin, msgs["val"])
        in_msgs = np.bincount(msgs["v"] - begin, minlength=n).astype(np.int64)
        v = state["v"]
        old = state["val"]
        new = np.minimum(old, best[v - begin])
        changed = (new != old).astype(np.int64)
        return {"v": v, "val": new, "active": changed.astype(np.int8),
                "changed": changed, "in_msgs": in_msgs}

    stats_spec = [("changed", "changed", "sum"), ("in_msgs", "in_msgs", "sum")]

    def converged(self, stats, superstep):
        return superstep > 0 and int(stats.get("changed") or 0) == 0


class AspSSSPKernel(SSSPKernel):
    """ASP SSSP — the reference's sssp_asp_app
    (/root/reference/core/apps/sssp_asp_app.cpp): distances relax through
    mid-round writes. BSP analogue with identical fixpoint: local
    Bellman-Ford to fixpoint over the partition's intra-partition edges
    (ctx["csr"]) after the inbound merge — relaxation is monotone, so
    converged distances are identical and supersteps shrink to the
    cross-partition hop count."""

    name = "sssp_asp"
    wants_csr = True

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        best = np.full(n, INF, dtype=np.int64)
        if len(msgs["v"]):
            np.minimum.at(best, msgs["v"] - begin, msgs["val"])
        in_msgs = np.bincount(msgs["v"] - begin, minlength=n).astype(np.int64)
        v = state["v"]
        old = state["val"]
        dist = np.full(n, INF, dtype=np.int64)
        dist[v - begin] = old
        np.minimum.at(dist, v - begin, best[v - begin])
        # instance-cached on the memoised CSRPart (one O(E_p) build per
        # worker per run, not per superstep)
        src_loc, dst_loc = ctx["csr"].intra_local()
        while True:
            before = dist[dst_loc].copy()
            cand = dist[src_loc]
            relax = cand < INF  # avoid INF+1 wrap
            np.minimum.at(dist, dst_loc[relax], cand[relax] + 1)
            if np.array_equal(before, dist[dst_loc]):
                break
        new = dist[v - begin]
        changed = (new != old).astype(np.int64)
        return {"v": v, "val": new, "active": changed.astype(np.int8),
                "changed": changed, "in_msgs": in_msgs}


def sssp_asp(graph: Graph, source: int, direction: str = "fwd",
             max_supersteps: int = 10_000, **engine_kw):
    """ASP-mode SSSP: same converged distances as :func:`sssp`."""
    from ..graph import derive_direction

    if direction != "fwd":
        derive_direction(graph, direction)
    eng = Engine(graph, AspSSSPKernel(source, direction), **engine_kw)
    state = eng.run(max_supersteps=max_supersteps)
    return state, eng


def sssp(graph: Graph, source: int, direction: str = "fwd",
         max_supersteps: int = 10_000, **engine_kw):
    """Hop-count SSSP from ``source``; returns (state Dataset, engine)."""
    from ..graph import derive_direction

    if direction != "fwd":
        derive_direction(graph, direction)
    eng = Engine(graph, SSSPKernel(source, direction), **engine_kw)
    state = eng.run(max_supersteps=max_supersteps)
    return state, eng


def khop_counts(graph: Graph, source: int, k: int, direction: str = "fwd",
                **engine_kw):
    """Number of vertices within each hop 0..k of ``source`` (k-hop app)."""
    from ..graph import derive_direction

    if direction != "fwd":
        derive_direction(graph, direction)
    eng = Engine(graph, SSSPKernel(source, direction), **engine_kw)
    state = eng.run(max_supersteps=k)
    import pyarrow.compute as pc

    reach = state.map_batches(
        lambda t: t.filter(pc.less_equal(t["val"], k)).select(["val"]),
        batch_format="pyarrow",
    ).groupby("val").count()
    return reach, eng


# ---------------------------------------------------------------------------
# Weighted SSSP — the reference's SSSP is hop-only (sssp_app_op.h relaxes
# Read(id)+1); this extends the same WriteMin/frontier kernel to integer
# edge weights. Weights are a deterministic pure function of the edge's
# COMPACTED endpoint ids (splitmix64 of src*C1+dst mod 2^64, then
# 1..WSSSP_WMAX), so any parallelism/partitioning produces identical
# weights and a DuckDB oracle replicates them bit-exactly with the
# HUGEINT _sql_mix chain (pipelines/testdata_graph.SQL_G2_WSSSP).
# ---------------------------------------------------------------------------

WSSSP_WMAX = 16
_WKEY_C = 0x9E3779B97F4A7C15


def edge_weights(src: np.ndarray, dst: np.ndarray,
                 wmax: int = WSSSP_WMAX) -> np.ndarray:
    """Deterministic integer weight 1..wmax per directed edge."""
    from ..util import splitmix64

    with np.errstate(over="ignore"):
        key = (src.astype(np.uint64) * np.uint64(_WKEY_C)
               + dst.astype(np.uint64))
    return (splitmix64(key) % np.uint64(wmax)).astype(np.int64) + 1


class WeightedSSSPKernel(SSSPKernel):
    """Same frontier/WriteMin shape as SSSPKernel; relax pushes
    ``Read(id) + w(id, nbr)`` instead of +1. Weights are recomputed
    per scatter batch from the CSR's (src, dst) pairs — one vectorised
    splitmix64 pass, no weight storage or extra shuffle column."""

    name = "wsssp"

    def scatter(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        u_rep = np.repeat(v, counts)
        dist = np.repeat(cols["val"], counts) + edge_weights(u_rep, nbrs)
        t, m = combine_min(nbrs, dist)
        return {"v": t, "val": m}


def wsssp(graph: Graph, source: int, direction: str = "fwd",
          max_supersteps: int = 10_000, **engine_kw):
    """Weighted SSSP from ``source``; returns (state Dataset, engine).
    Converged ``val`` is the exact shortest weighted distance (the
    relaxation is monotone; a converged fixpoint admits no shorter
    path), INF for unreachable."""
    from ..graph import derive_direction

    if direction != "fwd":
        derive_direction(graph, direction)
    eng = Engine(graph, WeightedSSSPKernel(source, direction), **engine_kw)
    state = eng.run(max_supersteps=max_supersteps)
    return state, eng


def wsssp_oracle(edges: np.ndarray, num_vertices: int, source: int,
                 wmax: int = WSSSP_WMAX) -> np.ndarray:
    """Pure-NumPy Bellman-Ford oracle (tests): same deterministic
    weights, dense relaxation to fixpoint."""
    src = edges[:, 0].astype(np.int64)
    dst = edges[:, 1].astype(np.int64)
    w = edge_weights(src, dst, wmax)
    dist = np.full(num_vertices, INF, dtype=np.int64)
    dist[source] = 0
    for _ in range(num_vertices):
        nd = dist.copy()
        reach = dist[src] < INF
        np.minimum.at(nd, dst[reach], dist[src[reach]] + w[reach])
        if np.array_equal(nd, dist):
            break
        dist = nd
    return dist
