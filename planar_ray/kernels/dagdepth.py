"""Topological depth (longest-path layer) over a DAG — the standard
post-pass on an SCC condensation: ``depth(v) = 0`` for sources, else
``max over in-edges (depth(u) + 1)``.

No reference counterpart file (Planar ships no DAG pass); this extends
the SCC family (kernels/scc.py) the same way the reference's apps
compose PEval/IncEval phases (/root/reference/core/apps/*_app_op.h
pattern): a monotone WriteMax propagation run to fixpoint. On a DAG it
converges in L supersteps (L = longest path); a cycle would grow depths
forever, so ``dag_depth`` raises loudly if the cap is hit — the
oracle-contract pattern (loud, never silently truncated).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..graph import CSRPart, Graph
from ..superstep import Engine, Kernel, combine_max


class DagDepthKernel(Kernel):
    name = "dagdepth"
    direction = "fwd"
    columns = {
        "val": pa.int64(),      # longest-path depth (0 = source layer)
        "active": pa.int8(),
        "changed": pa.int64(),
    }

    @property
    def message_columns(self):
        return ["val"]

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        return {"val": np.zeros(n, np.int64),
                "active": np.ones(n, np.int8),
                "changed": np.zeros(n, np.int64)}

    def scatter(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        d = np.repeat(cols["val"] + 1, counts)
        t, m = combine_max(nbrs, d)
        return {"v": t, "val": m}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        best = np.zeros(n, dtype=np.int64)
        if len(msgs["v"]):
            np.maximum.at(best, msgs["v"] - begin, msgs["val"])
        v = state["v"]
        old = state["val"]
        new = np.maximum(old, best[v - begin])
        changed = (new != old).astype(np.int64)
        return {"v": v, "val": new,
                "active": changed.astype(np.int8), "changed": changed}

    stats_spec = [("changed", "changed", "sum")]

    def converged(self, stats, superstep):
        return superstep > 0 and int(stats.get("changed") or 0) == 0


def dag_depth(graph: Graph, max_rounds: int | None = None, **engine_kw):
    """Longest-path depth per vertex; returns (state Dataset, engine).

    Raises if the propagation has not converged within ``max_rounds``
    supersteps. The default bound is ``num_vertices + 1``: any DAG's
    longest path is <= V-1 (so every valid DAG converges inside it),
    while on a cycle depths keep growing and exceed it within ~V
    rounds — correct for all DAGs, bounded on bad input.
    """
    if max_rounds is None:
        max_rounds = graph.num_vertices + 1
    eng = Engine(graph, DagDepthKernel(), **engine_kw)
    state = eng.run(max_supersteps=max_rounds)
    last = eng.metrics[-1] if eng.metrics else None
    if last is not None and int(last.changed or 0) != 0:
        raise RuntimeError(
            f"dag_depth: still changing after {max_rounds} supersteps — "
            "input is not a DAG (or raise max_rounds)")
    return state, eng


def dag_depth_oracle(edges: np.ndarray, num_vertices: int) -> np.ndarray:
    """First-principles fixpoint for tests: edges is (E, 2) int array."""
    depth = np.zeros(num_vertices, dtype=np.int64)
    for _ in range(num_vertices + 1):
        cand = depth[edges[:, 0]] + 1
        new = depth.copy()
        np.maximum.at(new, edges[:, 1], cand)
        if np.array_equal(new, depth):
            return depth
        depth = new
    raise RuntimeError("oracle: cycle detected")
