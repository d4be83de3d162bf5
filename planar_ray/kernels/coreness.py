"""Full k-core decomposition (per-vertex coreness) — distributed h-index.

Not present in the reference (its kcore peels one fixed k; this computes
the coreness NUMBER of every vertex in one run): each vertex starts at
its degree and repeatedly lowers its estimate to the h-index of its
neighbours' current estimates — ``c(v) <- min(c(v), H({c(u): u in
N(v)}))`` where ``H`` is the largest h with at least h neighbours
valued >= h. With degree initialisation the fixpoint of this monotone,
non-increasing operator is exactly the coreness (Lü et al., "The
H-index of a network node and its relation to degree and coreness",
Nature Communications 2016) — so convergence implies correctness, and
the pytest oracle validates against an INDEPENDENT algorithm
(Batagelj–Zavernik-style peel in :func:`coreness_oracle`).

Scale shape: the message is (dst, estimate) pre-combined per scatter
batch to (dst, estimate, count) — coreness estimates cluster heavily,
so the combiner bounds hub in-degree volume exactly like LPA's label
messages. Apply computes every vertex's h-index in ONE vectorised
lexsort + reduceat pass over the partition's combined messages (no
per-vertex loop). Requires the symmetric deduped store (same input
contract as kcore; the sampled symmetry gate fails loudly on a
directed store).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..graph import CSRPart, Graph
from ..superstep import Engine, Kernel, combine_pair_counts


class CorenessKernel(Kernel):
    name = "coreness"
    direction = "fwd"  # pass an already-symmetric deduped graph
    columns = {
        "val": pa.int64(),     # current coreness estimate
        "mcnt": pa.int64(),    # message: count of (dst, estimate) pairs
        "changed": pa.int64(),
        "in_msgs": pa.int64(),
    }

    @property
    def message_columns(self):
        return ["val", "mcnt"]

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        deg = csr.degrees(v).astype(np.int64)
        return {"val": deg, "mcnt": np.zeros(n, np.int64),
                "changed": np.zeros(n, np.int64),
                "in_msgs": np.zeros(n, np.int64)}

    def scatter(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        est = np.repeat(cols["val"], counts)
        t, e, c = combine_pair_counts(nbrs, est)
        return {"v": t, "val": e, "mcnt": c}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        v = state["v"]
        old = state["val"]
        new = old.copy()
        in_msgs = np.zeros(n, np.int64)
        if len(msgs["v"]):
            mv, mval, mcnt = combine_pair_counts(
                msgs["v"], msgs["val"], msgs["mcnt"]
            )
            # per dest: estimates DESC, cumulative neighbour count,
            # h = max over rows of min(estimate, cum-count)
            order = np.lexsort((-mval, mv))
            mv, mval, mcnt = mv[order], mval[order], mcnt[order]
            first = np.ones(len(mv), dtype=bool)
            first[1:] = mv[1:] != mv[:-1]
            starts = np.flatnonzero(first)
            cum = np.cumsum(mcnt)
            base = np.zeros(len(mv), np.int64)
            base[starts[1:]] = cum[starts[1:] - 1]
            base = np.maximum.accumulate(base)
            hrow = np.minimum(mval, cum - base)
            h = np.maximum.reduceat(hrow, starts)
            # state rows are NOT guaranteed id-sorted within the group
            sorter = np.argsort(v)
            pos = sorter[np.searchsorted(v, mv[starts], sorter=sorter)]
            new[pos] = np.minimum(new[pos], h)
            in_msgs = np.bincount(msgs["v"] - begin,
                                  minlength=n).astype(np.int64)
        changed = (new != old).astype(np.int64)
        return {"v": v, "val": new, "mcnt": np.zeros(len(v), np.int64),
                "changed": changed, "in_msgs": in_msgs}

    stats_spec = [("changed", "changed", "sum"), ("in_msgs", "in_msgs", "sum")]

    def converged(self, stats, superstep):
        return superstep > 0 and int(stats.get("changed") or 0) == 0


def coreness(graph: Graph, max_iters: int = 200, run_dir=None,
             checkpoint_every=0, resume=False, check_input: bool = True,
             **engine_kw):
    """Coreness of every vertex of ``graph`` (stored-fwd must be
    symmetric + deduped, as for :func:`~planar_ray.kernels.kcore.kcore`).
    Returns (state, engine): ``val`` is the coreness number.

    ``check_input`` runs the sampled symmetry/self-loop gate first so a
    directed store fails loudly instead of converging on wrong h-indices.
    """
    if check_input:
        from .kcore import assert_symmetric_sample

        assert_symmetric_sample(graph)
    eng = Engine(graph, CorenessKernel(), run_dir=run_dir,
                 checkpoint_every=checkpoint_every, **engine_kw)
    state = eng.run(max_supersteps=max_iters, resume=resume)
    return state, eng


def coreness_oracle(edges: np.ndarray, num_vertices: int) -> np.ndarray:
    """Pure-NumPy peel oracle (tests) — the INDEPENDENT algorithm:
    repeatedly remove all vertices of minimum surviving degree k,
    assigning them coreness k. ``edges`` is the symmetric deduped
    directed edge list (both orientations, no self-loops)."""
    src = edges[:, 0].astype(np.int64)
    dst = edges[:, 1].astype(np.int64)
    core = np.zeros(num_vertices, dtype=np.int64)
    alive = np.ones(num_vertices, dtype=bool)
    deg = np.bincount(src, minlength=num_vertices).astype(np.int64)
    k = 0
    while alive.any():
        da = deg[alive]
        k = max(k, int(da.min()) if len(da) else 0)
        while True:
            drop = alive & (deg <= k)
            if not drop.any():
                break
            core[drop] = k
            alive &= ~drop
            keep = alive[src] & alive[dst]
            deg = np.bincount(src[keep], minlength=num_vertices)
        k += 1
    return core
