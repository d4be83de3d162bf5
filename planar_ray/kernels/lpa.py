"""Synchronous label propagation (community detection).

Not present in the reference (SURVEY.md §7.5 — a new kernel required by
the north rule, built in the same vertex-kernel style): every superstep
each vertex adopts the most frequent label among its (symmetrised)
neighbors, ties broken by the smallest label; isolated vertices keep
their label. Deterministic by construction, so the pytest oracle (same
rule in NumPy) matches exactly.

Messages are pre-combined per scatter batch to (dst, label, count) —
the combiner bounding hub in-degree message volume — and re-aggregated
per partition in apply. Synchronous LPA can 2-cycle on bipartite
structures, so the driver caps supersteps (``max_iters``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ..graph import CSRPart, Graph, derive_direction
from ..superstep import Engine, Kernel, combine_pair_counts


class LPAKernel(Kernel):
    name = "lpa"
    direction = "sym"
    columns = {
        "val": pa.int64(),     # current label
        "mcnt": pa.int64(),    # message: count of (dst, label) pairs
        "changed": pa.int64(),
        "in_msgs": pa.int64(),
    }
    @property
    def message_columns(self):
        return ["val", "mcnt"]

    def __init__(self, value_type: pa.DataType | None = None):
        # narrow label variant — see WCCKernel / superstep.narrow_vertex_type
        if value_type is not None:
            self.columns = dict(self.columns)
            self.columns["val"] = value_type

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        return {"val": v.copy(), "mcnt": np.zeros(n, np.int64),
                "changed": np.zeros(n, np.int64),
                "in_msgs": np.zeros(n, np.int64)}

    def scatter(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        labels = np.repeat(cols["val"], counts)
        t, lab, cnt = combine_pair_counts(nbrs, labels)
        return {"v": t, "val": lab, "mcnt": cnt}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        v = state["v"]
        old = state["val"]
        new = old.copy()
        in_msgs = np.zeros(n, np.int64)
        if len(msgs["v"]):
            # merge partial (v, label, count) rows, then per-v argmax with
            # (count desc, label asc) tie-break — all vectorised
            mv, mlab, mcnt = combine_pair_counts(
                msgs["v"], msgs["val"], msgs["mcnt"]
            )
            order = np.lexsort((mlab, -mcnt, mv))
            mv, mlab = mv[order], mlab[order]
            first = np.ones(len(mv), dtype=bool)
            first[1:] = mv[1:] != mv[:-1]
            win_v, win_lab = mv[first], mlab[first]
            # state rows are NOT guaranteed id-sorted within the group
            sorter = np.argsort(v)
            pos = sorter[np.searchsorted(v, win_v, sorter=sorter)]
            new[pos] = win_lab
            in_msgs = np.bincount(msgs["v"] - begin, minlength=n).astype(np.int64)
        changed = (new != old).astype(np.int64)
        return {"v": v, "val": new, "mcnt": np.zeros(len(v), np.int64),
                "changed": changed, "in_msgs": in_msgs}

    stats_spec = [("changed", "changed", "sum"), ("in_msgs", "in_msgs", "sum")]

    def converged(self, stats, superstep):
        return superstep > 0 and int(stats.get("changed") or 0) == 0


def lpa(graph: Graph, max_iters: int = 10, run_dir=None, checkpoint_every=0,
        resume=False, narrow: bool = False, **engine_kw):
    """Synchronous LPA for at most ``max_iters`` supersteps.
    ``narrow=True``: labels in the narrowest unsigned type fitting V."""
    from ..superstep import narrow_vertex_type

    derive_direction(graph, "sym")
    vt = narrow_vertex_type(graph.num_vertices) if narrow else None
    eng = Engine(graph, LPAKernel(value_type=vt), run_dir=run_dir,
                 checkpoint_every=checkpoint_every, **engine_kw)
    state = eng.run(max_supersteps=max_iters, resume=resume)
    return state, eng


def lpa_oracle(edges: np.ndarray, num_vertices: int, max_iters: int = 10) -> np.ndarray:
    """Pure-NumPy synchronous LPA oracle (tests): same rule, dense arrays."""
    src, dst = edges[:, 0], edges[:, 1]
    # symmetrise + dedup
    a = np.concatenate([src, dst])
    b = np.concatenate([dst, src])
    keep = a != b
    a, b = a[keep], b[keep]
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    a, b = pairs[:, 0], pairs[:, 1]
    labels = np.arange(num_vertices, dtype=np.int64)
    for _ in range(max_iters):
        new = labels.copy()
        lab = labels[a]
        order = np.lexsort((lab, b))
        bb, ll = b[order], lab[order]
        grp = np.ones(len(bb), dtype=bool)
        if len(bb):
            grp[1:] = (bb[1:] != bb[:-1]) | (ll[1:] != ll[:-1])
        starts = np.flatnonzero(grp)
        cnt = np.diff(np.append(starts, len(bb)))
        gv, gl = bb[starts], ll[starts]
        order2 = np.lexsort((gl, -cnt, gv))
        gv, gl = gv[order2], gl[order2]
        first = np.ones(len(gv), dtype=bool)
        if len(gv):
            first[1:] = gv[1:] != gv[:-1]
        new[gv[first]] = gl[first]
        if np.array_equal(new, labels):
            return new
        labels = new
    return labels
