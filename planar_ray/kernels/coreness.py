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
from ..util import repeat_ranges


def _h_index_per_group(tt: np.ndarray, ee: np.ndarray, cc: np.ndarray):
    """h-index per group of (group id, estimate, count) triples — the
    shared vectorised block of both coreness kernels: groups sorted by
    (tt asc, ee desc), cumulative neighbour count per group, h = max
    over rows of min(estimate, cum-count). Returns (unique group ids in
    ascending order, their h values)."""
    order = np.lexsort((-ee, tt))
    tt, ee, cc = tt[order], ee[order], cc[order]
    first = np.ones(len(tt), dtype=bool)
    first[1:] = tt[1:] != tt[:-1]
    starts = np.flatnonzero(first)
    cum = np.cumsum(cc)
    base = np.zeros(len(tt), np.int64)
    base[starts[1:]] = cum[starts[1:] - 1]
    base = np.maximum.accumulate(base)
    hrow = np.minimum(ee, cum - base)
    return tt[starts], np.maximum.reduceat(hrow, starts)


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
            targets, h = _h_index_per_group(mv, mval, mcnt)
            # state rows are NOT guaranteed id-sorted within the group
            sorter = np.argsort(v)
            pos = sorter[np.searchsorted(v, targets, sorter=sorter)]
            new[pos] = np.minimum(new[pos], h)
            in_msgs = np.bincount(msgs["v"] - begin,
                                  minlength=n).astype(np.int64)
        changed = (new != old).astype(np.int64)
        return {"v": v, "val": new, "mcnt": np.zeros(len(v), np.int64),
                "changed": changed, "in_msgs": in_msgs}

    stats_spec = [("changed", "changed", "sum"), ("in_msgs", "in_msgs", "sum")]

    def converged(self, stats, superstep):
        return superstep > 0 and int(stats.get("changed") or 0) == 0


def _edge_slot_index(csr: CSRPart):
    """Composite (local row << 32 | neighbour id) key per adjacency slot,
    memoised on the CSRPart instance (which the engine memoises per
    worker process, see _cache_get in superstep.py). partition_edges
    lexsorts (src, dst), so the keys are normally already strictly
    increasing and the sorter is the identity; a non-sorted or
    DUPLICATED adjacency (a non-deduped store would make a slot lookup
    ambiguous and the cached-estimate update silently partial) fails
    loudly here. Returns (sorted keys, sorter or None)."""
    got = getattr(csr, "_delta_slot_keys", None)
    if got is None:
        n = len(csr.indptr) - 1
        deg = np.diff(csr.indptr)
        if len(csr.indices) and int(csr.indices.max()) >= 2**32:
            raise ValueError("coreness delta kernel requires vertex ids "
                             "< 2^32 (uint32 VertexID contract)")
        keys = ((np.repeat(np.arange(n, dtype=np.int64), deg) << 32)
                | csr.indices.astype(np.int64))
        sorter = None
        d = np.diff(keys)
        if np.any(d < 0):
            sorter = np.argsort(keys, kind="stable")
            keys = keys[sorter]
            d = np.diff(keys)
        if np.any(d == 0):
            raise ValueError("coreness delta kernel requires a DEDUPED "
                             "store: duplicate adjacency slot detected")
        got = csr._delta_slot_keys = (keys, sorter)
    return got


class CorenessDeltaKernel(Kernel):
    """Delta-message coreness — same h-index operator and fixpoint as
    :class:`CorenessKernel` (so it converges to the same coreness
    numbers), but Montresor-style incremental messaging (Montresor,
    De Pellegrini, Miorandi, "Distributed k-core decomposition", IEEE
    TPDS 2013): every vertex caches its neighbours' current estimates in
    an edge-aligned ``list<int32>`` state column (one slot per adjacency
    entry, CSR order), so after the bootstrap superstep a round ships
    ONLY the (dst, sender, new estimate) triples of vertices whose
    estimate changed — per-round wire volume is sum(deg(changed))
    instead of the dense kernel's full 2E scatter. The h-index chain is
    long but its tail touches few vertices, so total traffic across a
    run drops from rounds x 2E to ~2E + sum over rounds of
    deg(changed)."""

    name = "coreness_delta"
    direction = "fwd"  # pass an already-symmetric deduped graph
    wants_csr = True
    columns = {
        "val": pa.int64(),              # current coreness estimate
        "nbr_est": pa.list_(pa.int32()),  # cached neighbour estimates
        "msrc": pa.int64(),             # message: sender id
        "mval": pa.int64(),             # message: sender's new estimate
        "changed": pa.int64(),
        "in_msgs": pa.int64(),
    }

    @property
    def message_columns(self):
        return ["msrc", "mval"]

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        deg = csr.degrees(v).astype(np.int64)
        # cache slots start 0; the bootstrap scatter (everyone changed)
        # fills every slot at superstep 0
        nbr = pa.ListArray.from_arrays(
            pa.array(csr.indptr.astype(np.int32)),
            pa.array(np.zeros(int(csr.indptr[-1]), np.int32)))
        z = np.zeros(n, np.int64)
        return {"val": deg, "nbr_est": nbr, "msrc": z, "mval": z,
                "changed": np.ones(n, np.int64), "in_msgs": z}

    def scatter(self, csr: CSRPart, v, cols):
        m = np.asarray(cols["changed"]) != 0
        if not m.any():
            return None
        vs = np.asarray(v)[m]
        counts, nbrs = csr.neighbors_flat(vs)
        if len(nbrs) == 0:
            return None
        return {"v": nbrs.astype(np.int64),
                "msrc": np.repeat(vs, counts),
                "mval": np.repeat(np.asarray(cols["val"])[m], counts)}

    def apply(self, begin, end, state, msgs, ctx):
        csr: CSRPart = ctx["csr"]
        n = end - begin
        v = state["v"]
        old = state["val"]
        nbr = state["nbr_est"]
        if isinstance(nbr, pa.ChunkedArray):
            nbr = nbr.combine_chunks()
        # normalise to ascending-id order so the flattened cache aligns
        # slot-for-slot with the CSR adjacency (init emits this order;
        # adopted/resumed state may not)
        if not np.array_equal(v, np.arange(begin, end, dtype=v.dtype)):
            order = np.argsort(v)
            v, old = v[order], old[order]
            nbr = nbr.take(pa.array(order))
        off = nbr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = nbr.values.to_numpy(zero_copy_only=False)[off[0]:off[-1]]
        new = old.copy()
        in_msgs = np.zeros(n, np.int64)
        if len(msgs["v"]):
            mdst = np.asarray(msgs["v"], dtype=np.int64)
            msrc = np.asarray(msgs["msrc"], dtype=np.int64)
            mval = np.asarray(msgs["mval"], dtype=np.int64)
            keys, sorter = _edge_slot_index(csr)
            mkey = ((mdst - begin) << 32) | msrc
            pos = np.searchsorted(keys, mkey)
            if (pos >= len(keys)).any() or not np.array_equal(keys[pos], mkey):
                raise ValueError("delta message along a non-stored edge "
                                 "(asymmetric or stale store)")
            if sorter is not None:
                pos = sorter[pos]
            flat = flat.copy()
            flat[pos] = mval.astype(np.int32)
            # recompute h only for vertices that received a delta
            loc = np.unique(mdst - begin)
            starts = csr.indptr[loc]
            counts = csr.indptr[loc + 1] - starts
            tt, ee, cc = combine_pair_counts(
                np.repeat(loc, counts),
                flat[repeat_ranges(starts, counts)].astype(np.int64))
            targets, h = _h_index_per_group(tt, ee, cc)
            new[targets] = np.minimum(new[targets], h)
            in_msgs = np.bincount(mdst - begin, minlength=n).astype(np.int64)
        changed = (new != old).astype(np.int64)
        nbr_out = pa.ListArray.from_arrays(
            pa.array((off - off[0]).astype(np.int32)), pa.array(flat))
        z = np.zeros(n, np.int64)
        return {"v": v, "val": new, "nbr_est": nbr_out, "msrc": z,
                "mval": z, "changed": changed, "in_msgs": in_msgs}

    stats_spec = [("changed", "changed", "sum"), ("in_msgs", "in_msgs", "sum")]

    def converged(self, stats, superstep):
        return superstep > 0 and int(stats.get("changed") or 0) == 0


def coreness(graph: Graph, max_iters: int = 200, run_dir=None,
             checkpoint_every=0, resume=False, check_input: bool = True,
             mode: str = "dense", **engine_kw):
    """Coreness of every vertex of ``graph`` (stored-fwd must be
    symmetric + deduped, as for :func:`~planar_ray.kernels.kcore.kcore`).
    Returns (state, engine): ``val`` is the coreness number.

    ``check_input`` runs the sampled symmetry/self-loop gate first so a
    directed store fails loudly instead of converging on wrong h-indices.

    ``mode="dense"`` (default) rescatters every estimate every round;
    ``mode="delta"`` ships only changed estimates against a persistent
    edge-aligned cache (see :class:`CorenessDeltaKernel`) — same
    fixpoint, ~rounds-times less wire traffic past the bootstrap step.
    """
    if check_input:
        from .kcore import assert_symmetric_sample

        assert_symmetric_sample(graph)
    if mode not in ("dense", "delta"):
        raise ValueError(f"unknown coreness mode {mode!r}")
    kern = CorenessKernel() if mode == "dense" else CorenessDeltaKernel()
    eng = Engine(graph, kern, run_dir=run_dir,
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
