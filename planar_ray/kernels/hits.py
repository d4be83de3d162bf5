"""HITS (Kleinberg hubs & authorities) on the BSP superstep engine.

One HITS iteration needs BOTH edge orientations (auth pulls over
in-edges, hub pulls over out-edges), and the engine walks one stored
direction per kernel — so HITS runs on the **bipartite lift** of the
graph: every original vertex u becomes a hub node u (id u) and an
authority node (id V + u), and every edge u->w becomes the directed
pair u -> (V+w) and (V+w) -> u. The lift's single ``fwd`` direction
then carries both halves of the iteration, alternating by superstep
parity with the engine's frontier mask (K6):

  even superstep: hub half scatters, authority half updates
                  a_raw(w) = sum_{u->w} h_raw(u) / S_h
  odd superstep:  authority half scatters, hub half updates
                  h_raw(u) = sum_{u->w} a_raw(w) / S_a

S is the scattering half's raw sum, riding the shuffle as a role-2
global partial (the PageRank dangling-mass mechanism) — dividing by the
*previous* vector's L1 mass is Kleinberg's per-step normalisation
applied lazily, so intermediate values stay bounded and the final
normalised scores are identical. Fixed ``iters`` iterations
(2*iters supersteps); the unrolled SQL oracle replays the exact
arithmetic.

Partitioning assumption: the lift is partitioned edge-balanced over the
2V id space like any other graph; each half's global L1 mass is the one
cross-partition scalar per superstep and rides the existing wire.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..graph import CSRPart, Graph
from ..superstep import Engine, Kernel, combine_sum


class HITSKernel(Kernel):
    name = "hits"
    direction = "fwd"  # the lifted graph's only stored direction
    needs_global_stats = False  # S rides as role-2 partials
    columns = {
        "val": pa.float64(),   # current raw score (hub on [0,V), auth on [V,2V))
        "gsum": pa.float64(),  # role-2: scattering half's raw L1 mass
        "gcur": pa.float64(),  # state copy of val on the active half (stats seed)
        "active": pa.int8(),
        "in_msgs": pa.int64(),
    }

    @property
    def message_columns(self):
        return ["val", "gsum"]

    def __init__(self, num_orig: int, iters: int = 5):
        self.num_orig = int(num_orig)
        self.iters = int(iters)

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        is_hub = v < self.num_orig
        val = is_hub.astype(np.float64)  # h_0 = 1 on every hub node
        return {"val": val, "gsum": np.zeros(n), "gcur": val.copy(),
                "active": is_hub.astype(np.int8),
                "in_msgs": np.zeros(n, np.int64)}

    def global_partials(self, v, cols):
        act = cols["active"].astype(bool)
        return {"gsum": float(cols["val"][act].sum())}

    def scatter(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        t, s = combine_sum(nbrs, np.repeat(cols["val"], counts),
                           num_targets=self._num_vertices)
        return {"v": t, "val": s}

    def scatter_raw(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        return {"v": nbrs, "val": np.repeat(cols["val"], counts)}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        loc = (msgs["v"] - begin).astype(np.int64)
        msum = np.bincount(loc, weights=msgs["val"], minlength=n) \
            if len(loc) else np.zeros(n)
        in_msgs = np.bincount(loc, minlength=n).astype(np.int64)
        dm = ctx.get("dense_msgs")
        if dm is not None:
            msum = msum + dm[0]
            in_msgs = in_msgs + dm[1]
        gp = ctx.get("global_partials") or {}
        S = float(gp.get("gsum", ctx["globals"].get("scatter_mass") or 0.0))
        v = state["v"]
        old = state["val"]
        # even superstep: auth half updates; odd: hub half updates
        upd = (v >= self.num_orig) if ctx["superstep"] % 2 == 0 \
            else (v < self.num_orig)
        new = np.where(upd, msum[v - begin] / max(S, 1e-300), old)
        return {"v": v, "val": new, "gsum": np.zeros(len(v)),
                "gcur": np.where(upd, new, 0.0),
                "active": upd.astype(np.int8), "in_msgs": in_msgs}

    stats_spec = [("scatter_mass", "gcur", "sum"),
                  ("in_msgs", "in_msgs", "sum")]

    def converged(self, stats, superstep):
        return superstep >= 2 * self.iters - 1


def lift_graph(graph: Graph, root: str, num_parts: int | None = None) -> Graph:
    """Materialise (cached) the bipartite lift of ``graph``: edge u->w
    becomes u -> (V+w) and (V+w) -> u over 2V vertex ids.

    The cache is VALIDATED against the base graph before reuse
    (num_vertices == 2V and num_edges == 2E), not trusted on mere
    existence — a base store rebuilt in place with different edges would
    otherwise silently reuse a stale lift and return wrong scores."""
    import os
    import shutil

    from ..graph import partition_edges

    if os.path.exists(os.path.join(root, "meta_fwd.json")):
        cached = Graph.load(root, "fwd")
        if (cached.num_vertices == 2 * graph.num_vertices
                and cached.num_edges == 2 * graph.num_edges):
            return cached
        shutil.rmtree(root, ignore_errors=True)  # stale lift: rebuild
    V = graph.num_vertices

    def lift(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": np.concatenate([src, dst + V]),
            "dst": np.concatenate([dst + V, src]),
        })

    lifted = graph.edges_dataset().map_batches(lift, batch_format="pyarrow")
    return partition_edges(lifted, root, 2 * V,
                           num_parts or graph.num_parts, "fwd")


def hits(graph: Graph, lift_root: str, iters: int = 5, run_dir=None,
         checkpoint_every=0, resume=False, **engine_kw):
    """Run ``iters`` HITS iterations. Returns (state, engine, V): state
    rows v < V carry raw hub scores, rows v >= V raw authority scores —
    normalise each half by its L1 sum for the final scores."""
    V = graph.num_vertices
    lifted = lift_graph(graph, lift_root)
    eng = Engine(lifted, HITSKernel(V, iters=iters), run_dir=run_dir,
                 checkpoint_every=checkpoint_every, **engine_kw)
    state = eng.run(max_supersteps=2 * iters, resume=resume)
    return state, eng, V


def hits_scores(state, V: int) -> tuple[np.ndarray, np.ndarray]:
    """Final state -> (hub, auth) dense arrays over the ORIGINAL id
    space, each L1-normalised (the one place the lift is unpacked)."""
    tab = state.select_columns(["v", "val"]).to_pandas()
    v = tab["v"].to_numpy()
    val = tab["val"].to_numpy()
    hub_raw = np.zeros(V)
    auth_raw = np.zeros(V)
    hub_raw[v[v < V]] = val[v < V]
    auth_raw[v[v >= V] - V] = val[v >= V]
    hs, as_ = hub_raw.sum(), auth_raw.sum()
    if hs <= 0.0 or as_ <= 0.0:
        # an edge-free (or half-empty) graph has zero mass on a half —
        # normalising would return silent NaN arrays
        raise ValueError(
            f"hits_scores: zero L1 mass (hub={hs}, auth={as_}) — "
            "the graph has no edges feeding that half")
    return hub_raw / hs, auth_raw / as_


def hits_scores_dataset(state, V: int):
    """Distributed variant of :func:`hits_scores` (round 5): returns a
    Dataset (v, hub, auth) over the ORIGINAL id space with both halves
    L1-normalised — no dense V-sized driver arrays. The only values that
    touch the driver are the two half sums (per-batch partials summed in
    sorted order for determinism, matching ``hits_scores``'s np.sum
    pairwise-equivalent accumulation to float ulp; consumers round to
    1e-6)."""
    vals = state.select_columns(["v", "val"]).materialize()

    def half_sums(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        val = t["val"].to_numpy(zero_copy_only=False)
        return pa.table({
            "hub_s": pa.array([float(val[v < V].sum())]),
            "auth_s": pa.array([float(val[v >= V].sum())]),
        })

    parts = vals.map_batches(half_sums, batch_format="pyarrow").to_pandas()
    hs = float(np.sort(parts["hub_s"].to_numpy()).sum())
    as_ = float(np.sort(parts["auth_s"].to_numpy()).sum())
    if hs <= 0.0 or as_ <= 0.0:
        raise ValueError(
            f"hits_scores_dataset: zero L1 mass (hub={hs}, auth={as_})")

    def split(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        val = t["val"].to_numpy(zero_copy_only=False)
        is_hub = v < V
        return pa.table({
            "v": pa.array(np.where(is_hub, v, v - V)),
            "hub": pa.array(np.where(is_hub, val / hs, 0.0)),
            "auth": pa.array(np.where(is_hub, 0.0, val / as_)),
        })

    # each original id has exactly one hub row (v < V) and one auth row
    # (v >= V); one grouped sum folds them to (v, hub, auth)
    from ray.data.aggregate import Sum

    return (vals.map_batches(split, batch_format="pyarrow")
            .groupby("v").aggregate(Sum(on="hub", alias_name="hub"),
                                    Sum(on="auth", alias_name="auth")))


def hits_oracle(edges: np.ndarray, num_vertices: int, iters: int = 5):
    """Dense NumPy HITS oracle (tests): identical lazy-normalised
    update order. Returns (hub, auth) L1-normalised."""
    src = edges[:, 0].astype(np.int64)
    dst = edges[:, 1].astype(np.int64)
    h = np.ones(num_vertices)
    a = np.zeros(num_vertices)
    for _ in range(iters):
        S_h = h.sum()
        a = np.bincount(dst, weights=h[src], minlength=num_vertices) / S_h
        S_a = a.sum()
        h = np.bincount(src, weights=a[dst], minlength=num_vertices) / S_a
    return h / h.sum(), a / a.sum()
