"""k-core decomposition (iterative peel) on the BSP superstep engine.

Not a reference app — a north-rule-family addition in the same
vertex-kernel style as LPA (SURVEY.md §7.5): repeatedly remove every
vertex whose degree within the surviving subgraph is < k, until no
vertex is removed; the survivors are the k-core and ``val`` ends as
each survivor's degree *inside the core*.

Message flow is removal-driven (the classic distributed peel): a vertex
removed in superstep s notifies each neighbor with one decrement per
shared edge; superstep s+1 subtracts the decrements, drops newly
sub-k vertices and marks them as the next scatter frontier. Work per
superstep is O(edges incident to just-removed vertices) — the frontier
mask (K6) keeps settled vertices out of scatter entirely — and the
round count is the graph's peel depth for this k.

Expects a graph whose stored ``fwd`` direction is ALREADY symmetric and
deduplicated with self-loops dropped (the g2 co-occurrence graph and
``sym_dedup_edges`` in the tests both are): degree = CSR row length.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ..graph import CSRPart, Graph
from ..superstep import Engine, Kernel, combine_sum


class KCoreKernel(Kernel):
    name = "kcore"
    direction = "fwd"  # pass an already-symmetric deduped graph
    columns = {
        "val": pa.float64(),    # degree within the surviving subgraph
        "alive": pa.int8(),
        "active": pa.int8(),    # just removed -> notifies neighbors next
        "removed": pa.int64(),
        "in_msgs": pa.int64(),
    }

    @property
    def message_columns(self):
        return ["val"]  # message: #edges the target lost this superstep

    def __init__(self, k: int):
        self.k = int(k)

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        deg = csr.degrees(v).astype(np.float64)
        dead = deg < self.k
        return {"val": deg, "alive": (~dead).astype(np.int8),
                "active": dead.astype(np.int8),
                "removed": dead.astype(np.int64),
                "in_msgs": np.zeros(n, np.int64)}

    def scatter(self, csr: CSRPart, v, cols):
        # v is the frontier (just-removed vertices); one decrement per edge
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        t, s = combine_sum(nbrs, np.ones(len(nbrs)),
                           num_targets=self._num_vertices)
        return {"v": t, "val": s}

    def scatter_raw(self, csr: CSRPart, v, cols):
        # direct mode pre-combines per destination range (dense bincount)
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        return {"v": nbrs, "val": np.ones(len(nbrs))}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        loc = (msgs["v"] - begin).astype(np.int64)
        lost = np.bincount(loc, weights=msgs["val"], minlength=n) \
            if len(loc) else np.zeros(n)
        in_msgs = np.bincount(loc, minlength=n).astype(np.int64)
        dm = ctx.get("dense_msgs")
        if dm is not None:
            lost = lost + dm[0]
            in_msgs = in_msgs + dm[1]
        v = state["v"]
        alive = state["alive"].astype(bool)
        deg = state["val"] - lost[v - begin]
        newly = alive & (deg < self.k)
        return {"v": v, "val": deg,
                "alive": (alive & ~newly).astype(np.int8),
                "active": newly.astype(np.int8),
                "removed": newly.astype(np.int64),
                "in_msgs": in_msgs}

    stats_spec = [("removed", "removed", "sum"), ("in_msgs", "in_msgs", "sum")]

    def converged(self, stats, superstep):
        return int(stats.get("removed") or 0) == 0


def assert_symmetric_sample(graph: Graph, sample: int = 256) -> None:
    """Cheap gate on the kcore input contract: sample edges SPREAD across
    every partition (evenly-spaced edge offsets per partition's CSR, not
    the head of the dataset — the store is src-sorted, so a head sample
    would inspect only partition 0's lowest-id corner) and require no
    self-loops and the reverse edge present in its partition's CSR.
    Catches the silent-wrong-result case of pointing kcore at an ordinary
    directed store (degrees would then be out-degrees only). O(sample)
    vectorised lookups, not a full scan."""
    from ..graph import part_of
    from ..util import repeat_ranges

    per_part = max(1, sample // max(1, graph.num_parts))
    src_l, dst_l = [], []
    csr_cache: dict[int, object] = {}
    for p in range(graph.num_parts):
        csr = csr_cache.setdefault(p, graph.load_csr(p))
        ne = len(csr.indices)
        if ne == 0:
            continue
        # evenly-spaced edge offsets across the partition's whole range
        eidx = np.unique(np.linspace(0, ne - 1, min(per_part, ne),
                                     dtype=np.int64))
        # src of edge offset e: the CSR row containing e
        row = np.searchsorted(csr.indptr, eidx, side="right") - 1
        src_l.append(row + csr.begin)
        dst_l.append(csr.indices[eidx].astype(np.int64))
    if not src_l:
        return
    src = np.concatenate(src_l)
    dst = np.concatenate(dst_l)
    if (src == dst).any():
        raise ValueError("kcore input contract: store contains self-loops "
                         "(build it with graph.sym_dedup_edges)")
    parts = part_of(dst, graph.boundaries)
    for p in np.unique(parts):
        csr = csr_cache.setdefault(int(p), graph.load_csr(int(p)))
        m = parts == p
        s_q, d_loc = src[m], dst[m] - csr.begin
        # vectorised membership: gather each queried row's adjacency run
        # and bincount matches back per query (no per-edge Python loop)
        starts = csr.indptr[d_loc]
        counts = csr.indptr[d_loc + 1] - starts
        flat = csr.indices[repeat_ranges(starts, counts)].astype(np.int64)
        owner = np.repeat(np.arange(len(s_q)), counts)
        hit = np.bincount(owner[flat == np.repeat(s_q, counts)],
                          minlength=len(s_q)) > 0
        if not hit.all():
            i = int(np.flatnonzero(~hit)[0])
            s, d = int(s_q[i]), int(d_loc[i] + csr.begin)
            raise ValueError(
                f"kcore input contract: edge ({s},{d}) has no reverse "
                f"({d},{s}) — stored fwd is not symmetric (build it "
                "with graph.sym_dedup_edges)")


def kcore(graph: Graph, k: int, max_iters: int = 200, run_dir=None,
          checkpoint_every=0, resume=False, check_input: bool = True,
          **engine_kw):
    """Peel ``graph`` (stored-fwd must be symmetric + deduped) to its
    k-core. Returns (state, engine): state rows with ``alive``==1 are
    the core; their ``val`` is the within-core degree.

    ``check_input`` runs a sampled symmetry/self-loop gate first
    (assert_symmetric_sample) so a directed store fails loudly instead
    of peeling by out-degree."""
    if check_input:
        assert_symmetric_sample(graph)
    eng = Engine(graph, KCoreKernel(k), run_dir=run_dir,
                 checkpoint_every=checkpoint_every, **engine_kw)
    state = eng.run(max_supersteps=max_iters, resume=resume)
    return state, eng


def kcore_oracle(edges: np.ndarray, num_vertices: int, k: int):
    """Pure-NumPy peel oracle (tests). ``edges`` is the symmetric deduped
    directed edge list (both orientations present, no self-loops).
    Returns (alive bool[V], coredeg int64[V] — 0 off-core)."""
    src = edges[:, 0].astype(np.int64)
    dst = edges[:, 1].astype(np.int64)
    deg = np.bincount(src, minlength=num_vertices).astype(np.int64)
    alive = deg >= k
    while True:
        keep = alive[src] & alive[dst]
        deg = np.bincount(src[keep], minlength=num_vertices)
        nxt = alive & (deg >= k)
        if np.array_equal(nxt, alive):
            break
        alive = nxt
    keep = alive[src] & alive[dst]
    coredeg = np.bincount(src[keep], minlength=num_vertices).astype(np.int64)
    coredeg[~alive] = 0
    return alive, coredeg
