"""PageRank kernels.

Two modes, mirroring the reference's two formulations (SURVEY.md §2.3):

* ``PageRankKernel`` — textbook power iteration with damping 0.85 and
  dangling-mass redistribution, push-style over the ``fwd`` graph, run
  until ``max|Δpr| < 1e-6`` (the north-rule metric). Messages are
  ``(dst, pr/outdeg)`` partials, pre-combined per scatter batch; the
  dangling mass is a global scalar carried between supersteps via the
  engine's stats aggregate (no driver-side row iteration).

* ``ReferencePageRankKernel`` — bit-compatible re-implementation of the
  reference's core kernel (/root/reference/core/apps/pagerank_app.h:
  74-99): init ``1/outdeg`` (``1/V`` when outdeg==0), each round
  ``pr'[v] = 0.85 * Σ_{w∈out(v)} pr[w] / outdeg(v)`` for outdeg>0
  vertices (zero-outdeg vertices keep their value), fixed ``iters``
  rounds, no convergence test. A pull over out-edges is a push over the
  stored ``rev`` direction, so this kernel scatters on ``rev`` while
  dividing by the ``fwd`` out-degree carried in the state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ..graph import CSRPart, Graph
from ..superstep import Engine, Kernel, combine_sum


class PageRankKernel(Kernel):
    name = "pagerank"
    direction = "fwd"
    # dangling mass rides the shuffle as role-2 global-partial rows
    # (Kernel.global_partials), so no per-superstep aggregate job is needed
    needs_global_stats = False
    columns = {
        "val": pa.float64(),
        "deg": pa.int64(),
        "delta": pa.float64(),
        "dangling": pa.float64(),
        "gdangling": pa.float64(),
        "in_msgs": pa.int64(),
    }

    def __init__(self, damping: float = 0.85, tol: float = 1e-6,
                 fixed_iters: int | None = None):
        self.damping = damping
        self.tol = tol
        self.fixed_iters = fixed_iters  # exact superstep count (oracle parity)

    # wire format: messages carry only the rank partial; global rows only
    # the dangling mass (the full state schema tripled plasma traffic)
    @property
    def message_columns(self) -> list:
        return ["val", "gdangling"]

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        deg = csr.degrees(v)
        val = np.full(n, 1.0 / self._num_vertices)  # PR(0) uniform
        return {"val": val, "deg": deg, "delta": np.zeros(n),
                "dangling": np.where(deg == 0, val, 0.0),
                "gdangling": np.zeros(n), "in_msgs": np.zeros(n, np.int64)}

    def global_partials(self, v, cols):
        deg = cols["deg"]
        return {"gdangling": float(cols["val"][deg == 0].sum())}

    def scatter_raw(self, csr: CSRPart, v, cols):
        # direct mode without a plan: raw (target, partial) pairs; the
        # engine combines per destination partition (dense bincount)
        deg = cols["deg"]
        val = cols["val"]
        nz = deg > 0
        if not nz.any():
            return None
        counts, nbrs = csr.neighbors_flat(v[nz])
        contrib = np.repeat(val[nz] / deg[nz], counts)
        return {"v": nbrs, "val": contrib}

    def vertex_rate(self, csr: CSRPart, v, cols):
        # static-scatter form: the per-vertex value every out-edge
        # carries this superstep (rank/deg) — enables the precomputed
        # exchange plan; indexed by local vertex offset
        rate = np.zeros(csr.end - csr.begin)
        deg = cols["deg"]
        rate[v - csr.begin] = np.where(
            deg > 0, cols["val"] / np.maximum(deg, 1), 0.0)
        return rate

    def scatter(self, csr: CSRPart, v, cols):
        # dataset mode keeps the pre-combined form (shuffle volume)
        out = self.scatter_raw(csr, v, cols)
        if out is None:
            return None
        t, s = combine_sum(out["v"], out["val"],
                           num_targets=self._num_vertices)
        return {"v": t, "val": s}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        N = ctx["num_vertices"]
        d = self.damping
        v = state["v"]
        deg = state["deg"]
        old = state["val"]
        # dense message sum over the range: pre-reduced (dval, dcnt)
        # vectors where the exchange plan delivered dense, plus one
        # bincount pass over any sparse-delivered message rows (the
        # adaptive wire can mix both in one superstep)
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
        val = (1.0 - d) / N + d * (msum[v - begin] + dangling_prev / N)
        delta = np.abs(val - old)
        deg = deg.astype(np.int64)
        return {"v": v, "val": val, "deg": deg, "delta": delta,
                "dangling": np.where(deg == 0, val, 0.0),
                "gdangling": np.zeros(len(v)), "in_msgs": in_msgs}

    stats_spec = [("max_delta", "delta", "max"),
                  ("in_msgs", "in_msgs", "sum"),
                  ("dangling_mass", "dangling", "sum")]

    def converged(self, stats, superstep):
        if self.fixed_iters is not None:
            return superstep >= self.fixed_iters - 1
        md = stats.get("max_delta")  # 0.0 is a valid (converged) value
        return superstep > 0 and md is not None and float(md) < self.tol


class ReferencePageRankKernel(Kernel):
    """Fixed-iteration reference-parity mode (pagerank_app.h:74-99)."""

    name = "pagerank_ref"
    direction = "rev"
    columns = {
        "val": pa.float64(),
        "deg": pa.int64(),  # fwd out-degree (the divisor in Pull)
        "delta": pa.float64(),
        "in_msgs": pa.int64(),
    }

    def __init__(self, iters: int = 10):
        self.iters = iters
        self._fwd_degrees = None  # set by pagerank_reference()

    @property
    def message_columns(self) -> list:
        return ["val"]

    def init_cols(self, part, begin, end, csr: CSRPart):
        # csr here is the REV csr; fwd out-degree comes via a degree map
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        deg = self._deg_lookup(v)
        val = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 1.0 / self._num_vertices)
        return {"val": val, "deg": deg, "delta": np.zeros(n),
                "in_msgs": np.zeros(n, np.int64)}

    def _deg_lookup(self, v):
        return self._fwd_degrees[v]

    def scatter(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        contrib = np.repeat(cols["val"], counts)
        t, s = combine_sum(nbrs, contrib, num_targets=self._num_vertices)
        return {"v": t, "val": s}

    def scatter_raw(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        return {"v": nbrs, "val": np.repeat(cols["val"], counts)}

    def vertex_rate(self, csr: CSRPart, v, cols):
        rate = np.zeros(csr.end - csr.begin)
        rate[v - csr.begin] = cols["val"]
        return rate

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
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
        val = np.where(deg > 0, 0.85 * msum[v - begin] / np.maximum(deg, 1), old)
        return {"v": v, "val": val, "deg": deg, "delta": np.abs(val - old),
                "in_msgs": in_msgs}

    stats_spec = [("max_delta", "delta", "max"), ("in_msgs", "in_msgs", "sum")]

    def converged(self, stats, superstep):
        return superstep >= self.iters - 1  # fixed rounds, like the reference


def pagerank(graph: Graph, damping=0.85, tol=1e-6, max_supersteps=200,
             fixed_iters=None, run_dir=None, checkpoint_every=0, resume=False,
             initial_state=None, **engine_kw):
    """Run textbook PageRank to convergence; returns (state Dataset, engine).

    ``fixed_iters`` runs exactly that many supersteps instead of the
    delta test (used when comparing against an unrolled SQL oracle).

    ``initial_state`` warm-starts from a previous run's state — the
    PIE IncEval path (reference core/apis/pie.h:9-27): after a graph
    delta, re-running with the old scores as the seed converges in far
    fewer supersteps to the SAME fixpoint (power iteration is
    contraction-convergent from any L1-normalised start; pinned by
    test_pagerank_warm_start_incremental).
    """
    if initial_state is not None:
        # keep only the prior SCORES; every graph-derived column (deg,
        # dangling classification) is rebuilt against THIS graph's CSRs
        # — adopting a stale deg column from the pre-delta graph leaks
        # rank mass through changed out-degrees (measured: sum drifted
        # to 1.06 on a 1% edge delta). Distributed: degrees_dataset is
        # a per-partition CSR map, the score carry-over one hash join.
        from ..graph import degrees_dataset
        from ..joins import hash_bucket_join

        prior = initial_state.select_columns(["v", "val"])
        seed = hash_bucket_join(degrees_dataset(graph), prior,
                                left_on="v", right_on="v")

        def mk(t: pa.Table) -> pa.Table:
            v = t["v"].to_numpy(zero_copy_only=False)
            deg = t["outdeg"].to_numpy(zero_copy_only=False)
            val = t["val"].to_numpy(zero_copy_only=False)
            n = len(v)
            return pa.table({
                "part": pa.array(np.zeros(n, np.int64)),  # re-split on adopt
                "v": pa.array(v.astype(np.int64)),
                "role": pa.array(np.zeros(n, np.int8)),
                "val": pa.array(val),
                "deg": pa.array(deg.astype(np.int64)),
                "delta": pa.array(np.zeros(n)),
                "dangling": pa.array(np.where(deg == 0, val, 0.0)),
                "gdangling": pa.array(np.zeros(n)),
                "in_msgs": pa.array(np.zeros(n, np.int64)),
            })

        initial_state = seed.map_batches(mk, batch_format="pyarrow")
        n_seed = initial_state.materialize().count()
        if n_seed != graph.num_vertices:
            raise ValueError(
                f"pagerank warm start: prior state covers {n_seed} of "
                f"{graph.num_vertices} vertices — warm start requires "
                "the same vertex id space (new vertices need a fresh "
                "or padded prior)")
    eng = Engine(graph, PageRankKernel(damping, tol, fixed_iters),
                 run_dir=run_dir, checkpoint_every=checkpoint_every, **engine_kw)
    state = eng.run(max_supersteps=fixed_iters or max_supersteps,
                    resume=resume, initial_state=initial_state)
    return state, eng


def pagerank_reference(graph: Graph, iters=10, **engine_kw):
    """Reference-parity PageRank (fixed iters, pull over out-edges)."""
    from ..graph import derive_direction

    rev = derive_direction(graph, "rev")
    kern = ReferencePageRankKernel(iters)
    kern._num_vertices = graph.num_vertices
    # fwd out-degree array: small per-vertex int vector; at 10^12 vertices
    # this would be a joined state column instead — documented trade-off.
    deg = np.zeros(graph.num_vertices, dtype=np.int64)
    for p in range(graph.num_parts):
        csr = graph.load_csr(p)
        vv = np.arange(csr.begin, csr.end, dtype=np.int64)
        deg[vv] = csr.degrees(vv)
    kern._fwd_degrees = deg
    eng = Engine(graph, kern, **engine_kw)
    state = eng.run(max_supersteps=iters + 1)
    return state, eng
