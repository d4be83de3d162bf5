"""Personalized PageRank — the PageRank kernel with teleport restricted
to a seed set.

Same push-style power iteration as ``PageRankKernel`` (damping 0.85,
dangling mass riding the shuffle as role-2 global partials), but the
teleport vector is s(v) = 1/|S| on the seed set S and 0 elsewhere:

    pr'(v) = s(v) * (0.15 + 0.85 * D_prev) + 0.85 * sum_in(pr/deg)

with D_prev the previous round's dangling mass (which teleports back to
the seeds, the standard PPR formulation). Fixed-iteration mode only —
that is what the unrolled SQL oracle replays.

Partitioning / scale note: the seed set ships inside the pickled kernel
(object store, once per run) — PPR's usual regime, |S| << V. A
V-proportional seed set should instead ride as a state column seeded
via ``initial_state=`` (the wcc_precomp pattern).
"""

from __future__ import annotations

import numpy as np

from ..graph import CSRPart, Graph
from .pagerank import PageRankKernel


class PPRKernel(PageRankKernel):
    name = "ppr"

    def __init__(self, seed_ids: np.ndarray, damping: float = 0.85,
                 fixed_iters: int = 10):
        super().__init__(damping=damping, fixed_iters=fixed_iters)
        self._seed_ids = np.unique(np.asarray(seed_ids, dtype=np.int64))
        if len(self._seed_ids) == 0:
            raise ValueError("PPR needs a non-empty seed set")

    def _seed_weight(self, v: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self._seed_ids, v)
        pos = np.minimum(pos, len(self._seed_ids) - 1)
        is_seed = self._seed_ids[pos] == v
        return np.where(is_seed, 1.0 / len(self._seed_ids), 0.0)

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        deg = csr.degrees(v)
        val = self._seed_weight(v)  # pr0 = personalization vector
        return {"val": val, "deg": deg, "delta": np.zeros(n),
                "dangling": np.where(deg == 0, val, 0.0),
                "gdangling": np.zeros(n), "in_msgs": np.zeros(n, np.int64)}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        d = self.damping
        v = state["v"]
        deg = state["deg"]
        old = state["val"]
        loc = (msgs["v"] - begin).astype(np.int64)
        msum = np.bincount(loc, weights=msgs["val"], minlength=n) \
            if len(loc) else np.zeros(n)
        in_msgs = np.bincount(loc, minlength=n).astype(np.int64)
        dm = ctx.get("dense_msgs")
        if dm is not None:
            msum = msum + dm[0]
            in_msgs = in_msgs + dm[1]
        gp = ctx.get("global_partials") or {}
        dangling_prev = float(
            gp.get("gdangling", ctx["globals"].get("dangling_mass") or 0.0)
        )
        s = self._seed_weight(v)
        val = s * ((1.0 - d) + d * dangling_prev) + d * msum[v - begin]
        delta = np.abs(val - old)
        deg = deg.astype(np.int64)
        return {"v": v, "val": val, "deg": deg, "delta": delta,
                "dangling": np.where(deg == 0, val, 0.0),
                "gdangling": np.zeros(len(v)), "in_msgs": in_msgs}


def ppr(graph: Graph, seed_ids: np.ndarray, iters: int = 10,
        damping: float = 0.85, run_dir=None, checkpoint_every=0,
        resume=False, **engine_kw):
    """Personalized PageRank from ``seed_ids`` for exactly ``iters``
    rounds. Returns (state, engine)."""
    from ..superstep import Engine

    eng = Engine(graph, PPRKernel(seed_ids, damping=damping,
                                  fixed_iters=iters),
                 run_dir=run_dir, checkpoint_every=checkpoint_every,
                 **engine_kw)
    state = eng.run(max_supersteps=iters, resume=resume)
    return state, eng


def ppr_oracle(edges: np.ndarray, num_vertices: int, seed_ids: np.ndarray,
               iters: int = 10, damping: float = 0.85) -> np.ndarray:
    """Dense NumPy PPR oracle (tests): same update rule and iteration
    count as the kernel."""
    src = edges[:, 0].astype(np.int64)
    dst = edges[:, 1].astype(np.int64)
    deg = np.bincount(src, minlength=num_vertices).astype(np.int64)
    s = np.zeros(num_vertices)
    s[np.asarray(seed_ids, dtype=np.int64)] = 1.0 / len(np.unique(seed_ids))
    pr = s.copy()
    for _ in range(iters):
        dangling = pr[deg == 0].sum()
        contrib = np.zeros(num_vertices)
        np.add.at(contrib, dst, pr[src] / np.maximum(deg[src], 1))
        pr = s * ((1.0 - damping) + damping * dangling) + damping * contrib
    return pr
