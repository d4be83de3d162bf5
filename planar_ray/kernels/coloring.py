"""Greedy graph coloring — conflict-resolution fixpoint.

Capability parity with the reference's coloring app
(/root/reference/core/apps/coloring_app_op.h:34-106): for every edge
(u, w) with u < w and equal colors, the LOWER endpoint re-colors by a
positive random increment; loop until no conflicts. The reference seeds
``srand(0)``; we replace C ``rand()`` with a deterministic per-(vertex,
round) hash so the run is reproducible at any parallelism — same
fixpoint guarantee (a proper coloring), deterministic trajectory.

BSP formulation: every vertex sends its color to its smaller-id
neighbors (sym graph); apply re-colors u iff some higher-id neighbor
reported u's color. Frontier: only vertices whose color changed (or
whose neighbor changed) keep scattering — here all vertices re-scatter
while any conflict remains (conflicts can cascade), so convergence is
the empty-changed round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ..graph import CSRPart, Graph, derive_direction
from ..superstep import Engine, Kernel
from ..util import splitmix64

RAND_MAX = 10  # reference's -rand_max default bound on the increment
MIX_K = 1000003  # (vertex, round) -> distinct mixer inputs for rounds < MIX_K


def _increments(v: np.ndarray, rnd: int) -> np.ndarray:
    """Deterministic per-(vertex, round) increment in [1, RAND_MAX] —
    vectorised splitmix64, replicable by a SQL oracle (HUGEINT math)."""
    x = v.astype(np.uint64) * np.uint64(MIX_K) + np.uint64(rnd)
    return (splitmix64(x) % np.uint64(RAND_MAX)).astype(np.int64) + 1


class ColoringKernel(Kernel):
    name = "coloring"
    direction = "sym"
    columns = {
        "val": pa.int64(),      # color
        "changed": pa.int64(),
        "in_msgs": pa.int64(),
    }
    @property
    def message_columns(self):
        return ["val"]

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        return {"val": np.zeros(n, np.int64), "changed": np.zeros(n, np.int64),
                "in_msgs": np.zeros(n, np.int64)}

    def scatter(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        src = np.repeat(v, counts)
        col = np.repeat(cols["val"], counts)
        # send color only to SMALLER-id neighbors (they own the re-color)
        keep = nbrs < src
        if not keep.any():
            return None
        return {"v": nbrs[keep], "val": col[keep]}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        v = state["v"]
        color = state["val"].astype(np.int64).copy()
        in_msgs = np.zeros(n, np.int64)
        changed = np.zeros(len(v), np.int64)
        if len(msgs["v"]):
            mv = msgs["v"].astype(np.int64)
            mc = msgs["val"].astype(np.int64)
            in_msgs = np.bincount(mv - begin, minlength=n).astype(np.int64)
            # conflict[u] = any neighbor (higher id) reported u's own color
            sorter = np.argsort(v)
            pos = sorter[np.searchsorted(v, mv, sorter=sorter)]
            conflict = np.zeros(len(v), dtype=bool)
            hit = color[pos] == mc
            conflict[pos[hit]] = True
            if conflict.any():
                rnd = int(ctx["superstep"])
                inc = _increments(v[conflict], rnd)
                color[conflict] += inc
                changed[conflict] = 1
        return {"v": v, "val": color, "changed": changed, "in_msgs": in_msgs}

    stats_spec = [("changed", "changed", "sum"), ("in_msgs", "in_msgs", "sum")]

    def converged(self, stats, superstep):
        return superstep > 0 and int(stats.get("changed") or 0) == 0


def coloring(graph: Graph, max_supersteps: int = 500, **engine_kw):
    """Run greedy conflict-resolution coloring to a proper coloring."""
    derive_direction(graph, "sym")
    eng = Engine(graph, ColoringKernel(), **engine_kw)
    state = eng.run(max_supersteps=max_supersteps)
    return state, eng


def coloring_oracle(edges: np.ndarray, n: int, max_rounds: int = 500) -> np.ndarray:
    """Same synchronous rule in NumPy (exact-trajectory oracle)."""
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(int(a), int(b)), max(int(a), int(b))))
    colors = np.zeros(n, dtype=np.int64)
    for rnd in range(max_rounds):
        conflict = np.zeros(n, dtype=bool)
        for a, b in und:
            if colors[a] == colors[b]:
                conflict[a] = True  # lower endpoint recolors
        if not conflict.any():
            break
        idx = np.flatnonzero(conflict)
        colors[idx] += _increments(idx.astype(np.int64), rnd)
    return colors
