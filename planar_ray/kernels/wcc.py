"""Weakly connected components: BSP min-label propagation with a frontier.

Capability parity with the reference's graft / pointer-jump / contract
WCC (/root/reference/core/apps/wcc_app_op.h:76-121): both converge to
the same fixpoint — every vertex labelled with the minimum vertex id of
its weakly-connected component — which is what the north rule compares.
The reference's intra-round asynchrony (pointer jumps reading fresh
writes) only accelerates convergence; labels at fixpoint are identical.

Runs on the ``sym`` (symmetrised) direction. Frontier semantics
(the reference's active bitmaps, planar_app_base_op.h:810-836): only
vertices whose label changed last superstep re-scatter, so supersteps
shrink as components settle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Sum

from ..graph import CSRPart, Graph, derive_direction
from ..superstep import Engine, Kernel, combine_min


class WCCKernel(Kernel):
    name = "wcc"
    direction = "sym"
    columns = {
        "val": pa.int64(),      # current component label (min id seen)
        "active": pa.int8(),    # frontier flag
        "changed": pa.int64(),
        "in_msgs": pa.int64(),
    }

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        return {"val": v.copy(), "active": np.ones(n, np.int8),
                "changed": np.zeros(n, np.int64),
                "in_msgs": np.zeros(n, np.int64)}

    def scatter(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        labels = np.repeat(cols["val"], counts)
        t, m = combine_min(nbrs, labels)
        return {"v": t, "val": m}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        INF = np.iinfo(np.int64).max
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

    def stat_aggs(self):
        return [Sum(on="changed", alias_name="changed"),
                Sum(on="in_msgs", alias_name="in_msgs")]

    def converged(self, stats, superstep):
        return superstep > 0 and int(stats.get("changed") or 0) == 0


def wcc(graph: Graph, max_supersteps=200, run_dir=None, checkpoint_every=0,
        resume=False, **engine_kw):
    """Min-label WCC to fixpoint; returns (state Dataset, engine)."""
    derive_direction(graph, "sym")
    eng = Engine(graph, WCCKernel(), run_dir=run_dir,
                 checkpoint_every=checkpoint_every, **engine_kw)
    state = eng.run(max_supersteps=max_supersteps, resume=resume)
    return state, eng
