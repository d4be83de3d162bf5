"""Strongly connected components — the distributed coloring algorithm
(Orzan's forward-max / backward-gather peel) on the BSP superstep
engine.

Not a reference app (Planar ships no SCC; /root/reference/core/apps has
WCC only) — a north-rule-family addition in the same vertex-kernel
style. Per outer PHASE over the still-unassigned ("alive") subgraph:

  A. forward MAX-label propagation (direction ``fwd``): color(v)
     converges to the maximum alive id that reaches v — WCC-style
     frontier supersteps with a max combiner;
  B. backward gather (direction ``rev``): every root r (color(r)==r)
     walks reversed edges through SAME-color vertices; a reached vertex
     u satisfies r->*u (color) and u->*r (the walk), so SCC(u)=SCC(r).
     All roots proceed simultaneously — color equality keeps distinct
     roots' waves from interfering. Collected vertices die; survivors
     re-seed phase A.

Final label = the MAX member id of each SCC (if w>r were in SCC(r),
w would reach r and force color(r)>r). With the order-preserving dense
rank, that is exactly MAX(raw key) over the component — what the SQL
twin's mutual-reachability closure computes.

State hand-off between phases (and between the two directions' engines)
rides ``Engine.run(initial_state=)`` — the harmonic/K17 seeding pattern;
nothing dense touches the driver, only per-phase scalar aggregates.

Superstep cost: phase A is O(alive frontier edges) per superstep with
the max combiner; phase B ships raw (target, root) pairs deduped per
batch (equality-acceptance cannot max-combine: the matching root could
lose). Phases peel at least every currently-leading SCC, so the outer
loop is short on real graphs (cap ``max_phases``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..graph import CSRPart, Graph, derive_direction
from ..superstep import Engine, Kernel, combine_max

_COLUMNS = {
    "color": pa.int64(),
    "scc": pa.int64(),     # -1 until assigned
    "alive": pa.int8(),
    "active": pa.int8(),
    "changed": pa.int64(),
    "in_msgs": pa.int64(),
}
_STATS = [("changed", "changed", "sum"), ("in_msgs", "in_msgs", "sum")]


class FwdColorKernel(Kernel):
    name = "scc_color"
    direction = "fwd"
    columns = _COLUMNS
    stats_spec = _STATS

    @property
    def message_columns(self):
        return ["color"]

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        return {"color": v.copy(), "scc": np.full(n, -1, np.int64),
                "alive": np.ones(n, np.int8), "active": np.ones(n, np.int8),
                "changed": np.zeros(n, np.int64),
                "in_msgs": np.zeros(n, np.int64)}

    def scatter(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        t, c = combine_max(nbrs.astype(np.int64),
                           np.repeat(cols["color"], counts))
        return {"v": t, "color": c}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        best = np.full(n, -1, np.int64)
        loc = (msgs["v"] - begin).astype(np.int64)
        if len(loc):
            np.maximum.at(best, loc, msgs["color"])
        in_msgs = np.bincount(loc, minlength=n).astype(np.int64)
        v = state["v"]
        alive = state["alive"].astype(bool) & (state["scc"] == -1)
        old = state["color"]
        new = np.where(alive, np.maximum(old, best[v - begin]), old)
        changed = (new != old).astype(np.int64)
        return {"v": v, "color": new, "scc": state["scc"],
                "alive": state["alive"],
                "active": changed.astype(np.int8), "changed": changed,
                "in_msgs": in_msgs}

    def converged(self, stats, superstep):
        return superstep > 0 and int(stats.get("changed") or 0) == 0


class BwdGatherKernel(Kernel):
    name = "scc_gather"
    direction = "rev"
    columns = _COLUMNS
    stats_spec = _STATS

    @property
    def message_columns(self):
        return ["color"]  # carries the ROOT id (== the root's color)

    def init_cols(self, part, begin, end, csr: CSRPart):
        raise NotImplementedError("BwdGatherKernel is always seeded via "
                                  "initial_state (see scc())")

    def scatter(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        t = nbrs.astype(np.int64)
        c = np.repeat(cols["scc"], counts)
        pairs = np.unique(np.stack([t, c], 1), axis=0)  # batch dedup only
        return {"v": pairs[:, 0], "color": pairs[:, 1]}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        v = state["v"]
        color = np.full(n, -2, np.int64)
        color[v - begin] = state["color"]
        loc = (msgs["v"] - begin).astype(np.int64)
        in_msgs = np.bincount(loc, minlength=n).astype(np.int64)
        hit = np.zeros(n, bool)
        if len(loc):
            m = msgs["color"] == color[loc]  # equality acceptance
            hit[loc[m]] = True
        alive = state["alive"].astype(bool)
        un = alive & (state["scc"] == -1)
        newly = un & hit[v - begin]
        scc = np.where(newly, state["color"], state["scc"])
        changed = newly.astype(np.int64)
        return {"v": v, "color": state["color"], "scc": scc,
                "alive": state["alive"],
                "active": newly.astype(np.int8), "changed": changed,
                "in_msgs": in_msgs}

    def converged(self, stats, superstep):
        return superstep > 0 and int(stats.get("changed") or 0) == 0


def _seed_gather(t: pa.Table) -> pa.Table:
    """Phase A final state -> phase B initial state: roots self-assign
    and become the frontier."""
    v = t["v"].to_numpy(zero_copy_only=False)
    color = t["color"].to_numpy(zero_copy_only=False)
    scc = t["scc"].to_numpy(zero_copy_only=False)
    alive = t["alive"].to_numpy(zero_copy_only=False).astype(bool)
    is_root = alive & (scc == -1) & (color == v)
    n = len(v)
    return pa.table({
        "part": t["part"], "v": t["v"], "role": t["role"],
        "color": t["color"],
        "scc": pa.array(np.where(is_root, v, scc)),
        "alive": t["alive"],
        "active": pa.array(is_root.astype(np.int8)),
        "changed": pa.array(np.zeros(n, np.int64)),
        "in_msgs": pa.array(np.zeros(n, np.int64)),
    })


def _seed_color(t: pa.Table) -> pa.Table:
    """Phase B final state -> next phase A initial state: collected
    vertices die; survivors reset color=v and reactivate."""
    v = t["v"].to_numpy(zero_copy_only=False)
    scc = t["scc"].to_numpy(zero_copy_only=False)
    alive = (t["alive"].to_numpy(zero_copy_only=False).astype(bool)
             & (scc == -1))
    n = len(v)
    return pa.table({
        "part": t["part"], "v": t["v"], "role": t["role"],
        "color": pa.array(np.where(alive, v, -1)),
        "scc": pa.array(scc),
        "alive": pa.array(alive.astype(np.int8)),
        "active": pa.array(alive.astype(np.int8)),
        "changed": pa.array(np.zeros(n, np.int64)),
        "in_msgs": pa.array(np.zeros(n, np.int64)),
    })


def scc(graph: Graph, max_phases: int = 100, max_supersteps: int = 10_000,
        **engine_kw) -> tuple[Dataset, dict]:
    """SCC labels for every vertex of the DIRECTED ``graph``.

    Returns (Dataset (v, scc) with scc = max member id, info dict with
    phase/superstep counts). Derives the ``rev`` store on first use.
    """
    derive_direction(graph, "rev")
    state: Dataset | None = None
    info = {"phases": 0, "supersteps": 0}
    # ONE engine per direction for ALL phases (CSRs pin once; the
    # kernels are phase-stateless and run() re-adopts each seed)
    engA = Engine(graph, FwdColorKernel(), **engine_kw)
    engB = Engine(graph, BwdGatherKernel(), **engine_kw)
    for _phase in range(max_phases):
        seedA = (None if state is None
                 else state.map_batches(_seed_color, batch_format="pyarrow"))
        state = engA.run(max_supersteps=max_supersteps, initial_state=seedA)
        seedB = state.map_batches(_seed_gather, batch_format="pyarrow")
        state = engB.run(max_supersteps=max_supersteps, initial_state=seedB)
        info["phases"] += 1
        remaining = state.map_batches(
            lambda t: pa.table({"n": pa.array([int(
                ((t["scc"].to_numpy(zero_copy_only=False) == -1)
                 & (t["alive"].to_numpy(zero_copy_only=False) == 1)).sum()
            )], pa.int64())}),
            batch_format="pyarrow").sum("n")
        if not remaining:
            break
    else:
        engA.close()
        engB.close()
        raise RuntimeError(f"scc: not converged in {max_phases} phases")
    info["supersteps"] = len(engA.metrics) + len(engB.metrics)
    engA.close()
    engB.close()
    return state.select_columns(["v", "scc"]), info


def scc_oracle(edges: np.ndarray, num_vertices: int) -> np.ndarray:
    """Dense NumPy oracle (tests): boolean-matrix transitive closure;
    label = max id of each mutual-reachability class."""
    V = num_vertices
    reach = np.eye(V, dtype=bool)
    reach[edges[:, 0], edges[:, 1]] = True
    for _ in range(int(np.ceil(np.log2(max(V, 2)))) + 1):
        nxt = reach | (reach @ reach)
        if np.array_equal(nxt, reach):
            break
        reach = nxt
    mutual = reach & reach.T
    return np.array([int(np.flatnonzero(mutual[i]).max())
                     for i in range(V)], dtype=np.int64)
