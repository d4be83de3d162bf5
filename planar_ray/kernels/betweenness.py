"""Sampled betweenness centrality (Brandes, pivot-exact) on the BSP
superstep engine — round-5 north-rule-family addition.

bc(v) = Σ_{s ∈ pivots} δ_s(v) where δ_s is Brandes' dependency from
source s. Two engine passes per pivot:

  forward  — synchronous BFS: superstep k's frontier is exactly the
             distance-k layer, so an unvisited vertex's first inbound
             messages all carry layer-k path counts and
             σ(v) = Σ_{preds} σ(u) needs no predecessor bookkeeping —
             the σ partials ride the engine's sum wire (scatter_raw /
             dense bincount reduction);
  backward — layered accumulation in DESCENDING distance order:
             superstep s scatters c(w) = (1 + δ(w))/σ(w) from layer
             D - s; a receiver accepts iff its own distance is exactly
             one less (the layer schedule is a pure function of the
             superstep, no extra wire bits), then
             δ(v) = σ(v) · Σ c(w) — the same factorisation the SQL
             twin uses, so only sum-order ulp separates them.

The per-vertex accumulator ``acc`` is a state column threaded between
pivot runs via ``Engine.run(initial_state=)`` (the harmonic/K17
pattern); nothing dense touches the driver — the only driver scalars
are each pivot's max finite distance D (a stats-board max) and the
convergence counters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..graph import CSRPart, Graph
from ..superstep import Engine, Kernel

INF = np.int64(2**62)


class BetwForwardKernel(Kernel):
    """BFS with path counting: dist + σ (σ rides the sum wire as
    ``val``)."""

    name = "betw_fwd"
    direction = "fwd"
    columns = {
        "dist": pa.int64(),
        "val": pa.float64(),    # sigma (path counts; float64 = SQL DOUBLE)
        "acc": pa.float64(),    # bc accumulator, carried untouched
        "dfin": pa.int64(),     # dist where finite else -1 (stats max)
        "active": pa.int8(),
        "changed": pa.int64(),
        "in_msgs": pa.int64(),
    }
    stats_spec = [("changed", "changed", "sum"),
                  ("in_msgs", "in_msgs", "sum"),
                  ("maxdist", "dfin", "max")]

    @property
    def message_columns(self):
        return ["val"]

    def __init__(self, source: int):
        self.source = int(source)

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        dist = np.full(n, INF, np.int64)
        sigma = np.zeros(n)
        active = np.zeros(n, np.int8)
        if begin <= self.source < end:
            dist[self.source - begin] = 0
            sigma[self.source - begin] = 1.0
            active[self.source - begin] = 1
        return {"dist": dist, "val": sigma, "acc": np.zeros(n),
                "dfin": np.where(dist < INF, dist, -1),
                "active": active, "changed": np.zeros(n, np.int64),
                "in_msgs": np.zeros(n, np.int64)}

    def scatter_raw(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        return {"v": nbrs, "val": np.repeat(cols["val"], counts)}

    def scatter(self, csr: CSRPart, v, cols):
        # dataset-mode form: pre-combined sums (parity with the raw wire)
        out = self.scatter_raw(csr, v, cols)
        if out is None:
            return None
        from ..superstep import combine_sum

        t, s = combine_sum(out["v"].astype(np.int64), out["val"],
                           num_targets=self._num_vertices)
        return {"v": t, "val": s}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        loc = (msgs["v"] - begin).astype(np.int64)
        ssum = np.bincount(loc, weights=msgs["val"], minlength=n) \
            if len(loc) else np.zeros(n)
        cnt = np.bincount(loc, minlength=n).astype(np.int64)
        dm = ctx.get("dense_msgs")
        if dm is not None:
            ssum = ssum + dm[0]
            cnt = cnt + dm[1]
        v = state["v"]
        vl = v - begin
        k = ctx["superstep"]
        unvisited = state["dist"] >= INF
        hit = unvisited & (cnt[vl] > 0)
        dist = np.where(hit, k + 1, state["dist"])
        sigma = np.where(hit, ssum[vl], state["val"])
        return {"v": v, "dist": dist, "val": sigma, "acc": state["acc"],
                "dfin": np.where(dist < INF, dist, -1),
                "active": hit.astype(np.int8),
                "changed": hit.astype(np.int64), "in_msgs": cnt[vl]}

    def converged(self, stats, superstep):
        return superstep > 0 and int(stats.get("changed") or 0) == 0


class BetwBackwardKernel(Kernel):
    """Layered dependency accumulation: at superstep s, layer D-s
    scatters c = (1+δ)/σ; layer D-s-1 accepts and sets
    δ = σ · Σc, then becomes the next frontier (schedule is a pure
    function of the superstep)."""

    name = "betw_bwd"
    # dependency flows successor -> predecessor, i.e. against the edge
    # orientation: the backward pass walks the REVERSE store (on an
    # undirected/symmetric graph rev == fwd, just materialised once).
    # The pivot's depth D rides as a constant STATE column (the kernel
    # object is pinned once per engine and engines are REUSED across
    # pivots, so per-pivot scalars cannot live on the instance).
    direction = "rev"
    columns = {
        "dist": pa.int64(),
        "sigma": pa.float64(),
        "val": pa.float64(),    # wire: c partials out, Σc in
        "delta": pa.float64(),
        "acc": pa.float64(),
        "depth": pa.int64(),
        "active": pa.int8(),
        "changed": pa.int64(),
        "in_msgs": pa.int64(),
    }
    stats_spec = [("changed", "changed", "sum"), ("in_msgs", "in_msgs", "sum")]

    @property
    def message_columns(self):
        return ["val"]

    def init_cols(self, part, begin, end, csr: CSRPart):
        raise NotImplementedError("BetwBackwardKernel is seeded via "
                                  "initial_state (see betweenness())")

    def scatter_raw(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        c = (1.0 + cols["delta"]) / cols["sigma"]
        return {"v": nbrs, "val": np.repeat(c, counts)}

    def scatter(self, csr: CSRPart, v, cols):
        out = self.scatter_raw(csr, v, cols)
        if out is None:
            return None
        from ..superstep import combine_sum

        t, s = combine_sum(out["v"].astype(np.int64), out["val"],
                           num_targets=self._num_vertices)
        return {"v": t, "val": s}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        loc = (msgs["v"] - begin).astype(np.int64)
        csum = np.bincount(loc, weights=msgs["val"], minlength=n) \
            if len(loc) else np.zeros(n)
        cnt = np.bincount(loc, minlength=n).astype(np.int64)
        dm = ctx.get("dense_msgs")
        if dm is not None:
            csum = csum + dm[0]
            cnt = cnt + dm[1]
        v = state["v"]
        vl = v - begin
        s = ctx["superstep"]
        depth = int(state["depth"][0]) if len(v) else 0
        layer = depth - s - 1  # the accepting layer this superstep
        at_layer = state["dist"] == layer
        delta = np.where(at_layer, state["sigma"] * csum[vl],
                         state["delta"])
        return {"v": v, "dist": state["dist"], "sigma": state["sigma"],
                "val": np.zeros(len(v)), "delta": delta,
                "acc": state["acc"], "depth": state["depth"],
                "active": at_layer.astype(np.int8),
                "changed": at_layer.astype(np.int64), "in_msgs": cnt[vl]}

    def converged(self, stats, superstep):
        return False  # the caller caps max_supersteps at D exactly


def _seed_backward(depth: int):
    def fn(t: pa.Table) -> pa.Table:
        dist = t["dist"].to_numpy(zero_copy_only=False)
        n = len(dist)
        top = dist == depth
        return pa.table({
            "part": t["part"], "v": t["v"], "role": t["role"],
            "dist": t["dist"], "sigma": t["val"],
            "val": pa.array(np.zeros(n)),
            "delta": pa.array(np.zeros(n)),
            "acc": t["acc"],
            "depth": pa.array(np.full(n, depth, np.int64)),
            "active": pa.array(top.astype(np.int8)),
            "changed": pa.array(np.zeros(n, np.int64)),
            "in_msgs": pa.array(np.zeros(n, np.int64)),
        })

    return fn


def _seed_forward(source: int, prev_source: int | None):
    """Backward final state (or forward state when D==0) -> next
    pivot's forward initial state, folding δ into acc (δ of the pivot
    itself is excluded, per Brandes)."""

    def fn(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        acc = t["acc"].to_numpy(zero_copy_only=False)
        if "delta" in t.column_names:
            delta = t["delta"].to_numpy(zero_copy_only=False)
            acc = acc + np.where(v == prev_source, 0.0, delta)
        n = len(v)
        is_src = v == source
        dist = np.where(is_src, 0, INF).astype(np.int64)
        return pa.table({
            "part": t["part"], "v": t["v"], "role": t["role"],
            "dist": pa.array(dist),
            "val": pa.array(is_src.astype(np.float64)),
            "acc": pa.array(acc),
            "dfin": pa.array(np.where(dist < INF, dist, -1)),
            "active": pa.array(is_src.astype(np.int8)),
            "changed": pa.array(np.zeros(n, np.int64)),
            "in_msgs": pa.array(np.zeros(n, np.int64)),
        })

    return fn


def betweenness(graph: Graph, num_pivots: int, max_depth: int = 10_000,
                **engine_kw) -> tuple[Dataset, dict]:
    """Pivot-exact Brandes betweenness from pivots 0..num_pivots-1.
    Returns (Dataset (v, bc), info with per-pivot depths). ``max_depth``
    bounds each pivot's BFS depth (callers with an unrolled SQL twin
    pass their unroll and get a loud failure instead of silent
    truncation — the oracle contract pattern)."""
    from ..graph import derive_direction

    derive_direction(graph, "rev")
    pivots = list(range(min(num_pivots, graph.num_vertices)))
    state: Dataset | None = None
    info = {"depths": [], "supersteps": 0}
    prev_src: int | None = None
    # ONE engine per direction for ALL pivots: CSRs/plans pin once;
    # per-pivot scalars (source, depth) ride the seed state instead of
    # the pinned kernel objects
    engF = Engine(graph, BetwForwardKernel(pivots[0]), **engine_kw)
    engB = Engine(graph, BetwBackwardKernel(), **engine_kw)
    for s in pivots:
        seed = (None if state is None
                else state.map_batches(_seed_forward(s, prev_src),
                                       batch_format="pyarrow"))
        state = engF.run(max_supersteps=max_depth + 1, initial_state=seed)
        D = int(engF.globals.get("maxdist") or 0)
        if D > max_depth:
            raise RuntimeError(
                f"betweenness: pivot {s} reached depth {D} > max_depth "
                f"{max_depth} (raise max_depth / the SQL unroll)")
        info["depths"].append(D)
        prev_src = s
        if D <= 0:
            continue  # isolated pivot: nothing to accumulate
        seedB = state.map_batches(_seed_backward(D), batch_format="pyarrow")
        state = engB.run(max_supersteps=D, initial_state=seedB)
    info["supersteps"] = len(engF.metrics) + len(engB.metrics)
    engF.close()
    engB.close()

    def finish(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        acc = t["acc"].to_numpy(zero_copy_only=False)
        if "delta" in t.column_names and prev_src is not None:
            delta = t["delta"].to_numpy(zero_copy_only=False)
            acc = acc + np.where(v == prev_src, 0.0, delta)
        return pa.table({"v": t["v"], "bc": pa.array(acc)})

    return state.map_batches(finish, batch_format="pyarrow"), info


def betweenness_oracle(edges: np.ndarray, num_vertices: int,
                       pivots: list[int]) -> np.ndarray:
    """Dense NumPy Brandes oracle (tests) — textbook queue form."""
    import collections

    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[int(a)].append(int(b))
    bc = np.zeros(num_vertices)
    for s in pivots:
        dist = {s: 0}
        sigma = collections.defaultdict(float)
        sigma[s] = 1.0
        order = [s]
        q = collections.deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
                    order.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = collections.defaultdict(float)
        for w in reversed(order):
            for x in adj[w]:
                if dist.get(x) == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[x] * (1.0 + delta[x])
            if w != s:
                bc[w] += delta[w]
    return bc
