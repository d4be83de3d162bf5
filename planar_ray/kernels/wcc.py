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
    # wire format: only the label partial rides in messages
    @property
    def message_columns(self):
        return ["val"]

    def __init__(self, value_type: pa.DataType | None = None):
        # narrow label variant (reference core/common/types.h:25-28
        # uint16 VertexData): shrink the label column in state tables,
        # messages and checkpoints; numpy kernel math upcasts to int64,
        # so labels are identical to the wide run (parity-tested)
        if value_type is not None:
            self.columns = dict(self.columns)
            self.columns["val"] = value_type

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

    stats_spec = [("changed", "changed", "sum"), ("in_msgs", "in_msgs", "sum")]

    def converged(self, stats, superstep):
        return superstep > 0 and int(stats.get("changed") or 0) == 0


class AspWCCKernel(WCCKernel):
    """ASP (asynchronous-within-superstep) WCC — the reference's
    wcc_asp_app (/root/reference/core/apps/wcc_asp_app.cpp:74-99) reads
    mid-round writes so labels can travel many hops per round. The BSP
    analogue with identical fixpoint: after merging the inbound
    messages, run label propagation to LOCAL FIXPOINT over the
    partition's intra-partition edges (its own CSR segment — ctx["csr"])
    before emitting. Min-label propagation is monotone, so any extra
    local iterations only accelerate convergence; the converged labels
    are provably the same (min vertex id per component). Supersteps drop
    from O(diameter) to O(cross-partition diameter)."""

    name = "wcc_asp"
    wants_csr = True

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        INF = np.iinfo(np.int64).max
        best = np.full(n, INF, dtype=np.int64)
        if len(msgs["v"]):
            np.minimum.at(best, msgs["v"] - begin, msgs["val"])
        in_msgs = np.bincount(msgs["v"] - begin, minlength=n).astype(np.int64)
        v = state["v"]
        old = state["val"]
        lab = np.full(n, INF, dtype=np.int64)
        lab[v - begin] = old
        np.minimum.at(lab, v - begin, best[v - begin])
        # intra-partition edge list — instance-cached on the memoised
        # CSRPart, so the O(E_p) rebuild happens once per worker, not
        # once per superstep
        src_loc, dst_loc = ctx["csr"].intra_local()
        while True:
            before = lab[dst_loc].copy()
            np.minimum.at(lab, dst_loc, lab[src_loc])
            if np.array_equal(before, lab[dst_loc]):
                break
        new = lab[v - begin]
        changed = (new != old).astype(np.int64)
        return {"v": v, "val": new, "active": changed.astype(np.int8),
                "changed": changed, "in_msgs": in_msgs}


def wcc_asp(graph: Graph, max_supersteps=200, **engine_kw):
    """ASP-mode WCC: same fixpoint labels as :func:`wcc`, measured fewer
    supersteps (see tests/test_round3.py and BASELINE.md)."""
    derive_direction(graph, "sym")
    eng = Engine(graph, AspWCCKernel(), **engine_kw)
    state = eng.run(max_supersteps=max_supersteps)
    return state, eng


def wcc(graph: Graph, max_supersteps=200, run_dir=None, checkpoint_every=0,
        resume=False, contract_every: int = 0, narrow: bool = False,
        **engine_kw):
    """Min-label WCC to fixpoint; returns (state Dataset, engine).

    ``contract_every=k`` enables supervertex contraction — the
    reference's Contract step (wcc_app_op.h:100-121 /
    mutable_block_csr_graph.h:168-263) re-expressed as an immutable
    rebuild (see _wcc_contracting). Labels at fixpoint are identical;
    the live edge volume shrinks per phase (``eng.contract_log``).

    ``narrow=True`` stores labels in the narrowest unsigned type that
    fits V (uint16/uint32 — the reference's uint16 VertexData variant,
    core/common/types.h:25-28); labels identical, state/message bytes
    halved or quartered.
    """
    from ..superstep import narrow_vertex_type

    derive_direction(graph, "sym")
    vt = narrow_vertex_type(graph.num_vertices) if narrow else None
    if not contract_every:
        eng = Engine(graph, WCCKernel(value_type=vt), run_dir=run_dir,
                     checkpoint_every=checkpoint_every, **engine_kw)
        state = eng.run(max_supersteps=max_supersteps, resume=resume)
        return state, eng
    return _wcc_contracting(graph, max_supersteps, contract_every,
                            run_dir=run_dir, resume=resume, **engine_kw)


def _wcc_contracting(graph: Graph, max_supersteps: int, contract_every: int,
                     run_dir: str | None = None, resume: bool = False,
                     max_phases: int = 32, **engine_kw):
    """Supervertex contraction (Borůvka-style): run ``contract_every``
    propagation supersteps, then RELABEL every crossing edge by its
    endpoints' current labels — edges inside a label group vanish, the
    graph shrinks to one node per label — and restart propagation on the
    contracted graph. The per-phase label mapping composes into the
    final answer with one join per phase. (Dropping only intra-label
    edges while keeping original ids is NOT sound: a dropped edge can
    still need to carry a later, smaller label.)

    ``run_dir`` enables per-phase checkpointing (checkpoint.PhaseLog):
    the composed mapping and the live-graph root are persisted after
    every phase, so ``resume=True`` picks up after the last COMPLETE
    phase instead of restarting (the contracted edge sets are already
    on disk under ``<graph.root>/_contract``). ``max_phases`` exists for
    the kill-after-phase-k test."""
    import os
    import shutil

    from ..checkpoint import PhaseLog
    from ..graph import partition_edges
    from ..joins import hash_bucket_join

    sym = derive_direction(graph, "sym")
    boundaries = sym.boundaries
    scratch = os.path.join(graph.root, "_contract")
    live = sym
    mapping = None  # Dataset (v, m): v's label through completed phases
    contract_log = [(0, sym.num_edges)]
    all_metrics = []
    eng = None
    plog = PhaseLog(run_dir) if run_dir else None
    start_phase, resumed_done = 0, False
    if resume and plog is not None:
        found = plog.latest()
        if found is not None:
            pdone, meta = found
            mapping = plog.load(pdone, "mapping").materialize()
            live = Graph.load(meta["live_root"], meta["live_direction"])
            contract_log = [tuple(x) for x in meta["contract_log"]]
            start_phase = pdone + 1
            resumed_done = bool(meta.get("converged"))
    for phase in range(start_phase, max_phases):
        if resumed_done:
            break
        if eng is not None:
            eng.close()  # one board actor + CSR refs per phase otherwise
        eng = Engine(live, WCCKernel(), **engine_kw)
        state = eng.run(max_supersteps=min(contract_every, max_supersteps))
        all_metrics.extend(eng.metrics)
        labels = state.map_batches(
            lambda t: pa.table({"_lv": t["v"], "_lab": t["val"]}),
            batch_format="pyarrow",
        ).materialize()
        if mapping is None:
            mapping = state.select_columns(["v", "val"]).map_batches(
                lambda t: pa.table({"v": t["v"], "m": t["val"]}),
                batch_format="pyarrow",
            ).materialize()
        else:
            mapping = hash_bucket_join(mapping, labels,
                                       left_on="m", right_on="_lv")
            mapping = mapping.map_batches(
                lambda t: pa.table({"v": t["v"], "m": t["_lab"]}),
                batch_format="pyarrow",
            ).materialize()
        converged = int(eng.globals.get("changed") or 0) == 0
        if converged or live.num_edges == 0:
            if plog is not None:
                plog.complete(phase, {"mapping": mapping}, {
                    "live_root": live.root, "live_direction": live.direction,
                    "contract_log": [list(x) for x in contract_log],
                    "converged": True,
                })
            break
        # contract: crossing edges relabelled to their endpoint labels
        e = hash_bucket_join(live.edges_dataset(), labels,
                             left_on="src", right_on="_lv")
        e = e.map_batches(
            lambda t: pa.table({"dst": t["dst"], "_ls": t["_lab"]}),
            batch_format="pyarrow",
        )
        e = hash_bucket_join(e, labels, left_on="dst", right_on="_lv")
        e = e.map_batches(
            lambda t: t.filter(
                pa.compute.not_equal(t["_ls"], t["_lab"])
            ).select(["_ls", "_lab"]).rename_columns(["src", "dst"]),
            batch_format="pyarrow",
        )
        root2 = os.path.join(scratch, f"phase_{phase:03d}")
        shutil.rmtree(root2, ignore_errors=True)
        os.makedirs(root2, exist_ok=True)
        # dedup_in_parts: every original crossing edge yields its own
        # (label_src, label_dst) row — without the in-partition dedup
        # (src is the partition key, so the local mask is exact) the
        # duplicates accumulate across phases and inflate num_edges and
        # scatter volume (labels stay correct but contraction stops paying)
        live = partition_edges(e, root2, graph.num_vertices,
                               len(boundaries) - 1, "sym",
                               boundaries=boundaries, symmetrize=False,
                               dedup_in_parts=True)
        contract_log.append((phase + 1, live.num_edges))
        if plog is not None:
            plog.complete(phase, {"mapping": mapping}, {
                "live_root": live.root, "live_direction": live.direction,
                "contract_log": [list(x) for x in contract_log],
                "converged": False,
            })
    # final state in the engine's row shape: (part, v, val=mapped label).
    # A standalone kernel instance, NOT eng.kernel: eng is None on a
    # resume that found the converged phase, and referencing the engine
    # in this closure would pickle it into the worker tasks.
    from ..graph import part_of

    kern = WCCKernel()

    def to_state(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = t["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(v)
        return kern.rows(part_of(v, boundaries), v, 0, {
            "val": m, "active": np.zeros(n, np.int8),
            "changed": np.zeros(n, np.int64), "in_msgs": np.zeros(n, np.int64),
        })

    final = mapping.map_batches(to_state, batch_format="pyarrow")
    if eng is None:
        eng = Engine(live, kern, **engine_kw)  # resume hit the converged phase
    eng.metrics = all_metrics
    eng.contract_log = contract_log
    return final, eng


def hop_extrema_seeds(graph: Graph, broadcast_threshold: int = 50_000_000):
    """(v, seed) dataset: seed = min(v, 1-hop min, 2-hop min) over the
    symmetrised graph — the reference's NVMe precomputing pipeline
    (/root/reference/nvme/precomputing/basic.h:26-283,
    two_hop_neighbor.h).

    Under the broadcast threshold: two shuffle-free per-partition CSR
    passes (segment-min per vertex, then segment-min over the broadcast
    1-hop array). Beyond it: two aggregate shuffles + one hop join.
    """
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Min

    from ..joins import hash_bucket_join

    sym = derive_direction(graph, "sym")
    if graph.num_vertices <= broadcast_threshold:
        return _hop_seeds_broadcast(sym)
    e = sym.edges_dataset().materialize()
    h1 = e.groupby("src").aggregate(Min(on="dst", alias_name="min1")).materialize()
    withh = hash_bucket_join(
        e, h1.map_batches(
            lambda t: pa.table({"_hv": t["src"], "_m1": t["min1"]}),
            batch_format="pyarrow"),
        left_on="dst", right_on="_hv",
    )
    h2 = withh.groupby("src").aggregate(Min(on="_m1", alias_name="min2"))
    both = hash_bucket_join(
        h1, h2.map_batches(
            lambda t: pa.table({"_hv2": t["src"], "min2": t["min2"]}),
            batch_format="pyarrow"),
        left_on="src", right_on="_hv2", how="left",
    )
    seeds = hash_bucket_join(
        rd.range(graph.num_vertices).map_batches(
            lambda t: pa.table({"v": t["id"].combine_chunks().cast(pa.int64())}),
            batch_format="pyarrow"),
        both.map_batches(
            lambda t: pa.table({"_sv": t["src"], "min1": t["min1"],
                                "min2": t["min2"]}),
            batch_format="pyarrow"),
        left_on="v", right_on="_sv", how="left",
    )

    def finish(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        m1 = t["min1"].to_numpy(zero_copy_only=False).astype(np.float64)
        m2 = t["min2"].to_numpy(zero_copy_only=False).astype(np.float64)
        seed = np.minimum(v.astype(np.float64),
                          np.minimum(np.nan_to_num(m1, nan=np.inf),
                                     np.nan_to_num(m2, nan=np.inf)))
        return pa.table({"v": pa.array(v),
                         "seed": pa.array(seed.astype(np.int64))})

    return seeds.map_batches(finish, batch_format="pyarrow")


def _hop_seeds_broadcast(sym: Graph):
    """Shuffle-free hop-extrema seeds: per-partition CSR segment-mins."""
    import ray
    import ray.data as rd

    INF = np.iinfo(np.int64).max
    boundaries = sym.boundaries
    root, direction, P = sym.root, sym.direction, sym.num_parts

    def _parts_ds():
        return rd.range(P, override_num_blocks=P)

    def seg_min(csr, vals: np.ndarray | None) -> np.ndarray:
        """Per-vertex min over each CSR row (of neighbor ids, or of
        ``vals[neighbor]`` when vals is given); INF for empty rows."""
        n = csr.end - csr.begin
        src = csr.indices if vals is None else vals[csr.indices]
        out = np.full(n, INF, dtype=np.int64)
        counts = np.diff(csr.indptr)
        nz = counts > 0
        if nz.any():
            starts = csr.indptr[:-1][nz]
            out[nz] = np.minimum.reduceat(src, starts)
        return out

    def pass1(batch: pa.Table) -> pa.Table:
        from ..graph import CSRPart
        import os

        outs = []
        for p in batch["id"].to_numpy():
            p = int(p)
            begin, end = int(boundaries[p]), int(boundaries[p + 1])
            csr = CSRPart.load(os.path.join(root, direction, f"part={p:05d}"),
                               begin, end)
            v = np.arange(begin, end, dtype=np.int64)
            outs.append(pa.table({"v": pa.array(v),
                                  "h1": pa.array(seg_min(csr, None))}))
        return pa.concat_tables(outs)

    h1 = np.full(sym.num_vertices, INF, dtype=np.int64)
    for t in _parts_ds().map_batches(pass1, batch_format="pyarrow",
                                     batch_size=1).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        h1[t["v"].to_numpy(zero_copy_only=False)] = \
            t["h1"].to_numpy(zero_copy_only=False)
    h1_ref = ray.put(h1)

    def pass2(batch: pa.Table) -> pa.Table:
        from ..graph import CSRPart
        import os

        h1v = ray.get(h1_ref)
        outs = []
        for p in batch["id"].to_numpy():
            p = int(p)
            begin, end = int(boundaries[p]), int(boundaries[p + 1])
            csr = CSRPart.load(os.path.join(root, direction, f"part={p:05d}"),
                               begin, end)
            v = np.arange(begin, end, dtype=np.int64)
            h2 = seg_min(csr, h1v)
            seed = np.minimum(v, np.minimum(h1v[begin:end], h2))
            outs.append(pa.table({"v": pa.array(v), "seed": pa.array(seed)}))
        return pa.concat_tables(outs)

    return _parts_ds().map_batches(pass2, batch_format="pyarrow", batch_size=1)


def wcc_precomputed(graph: Graph, max_supersteps=200, **engine_kw):
    """A10: WCC seeded from precomputed 1/2-hop minima — the reference's
    wcc_nvme_precomputing_app (nvme/apps/wcc_nvme_precomputing_app.h:
    35-116 InitTwoHop). Same fixpoint as plain WCC, measurably fewer
    supersteps (each vertex starts 2 hops ahead)."""
    derive_direction(graph, "sym")
    eng = Engine(graph, WCCKernel(), **engine_kw)
    boundaries = np.array(eng._apply_boundaries, dtype=np.int64)

    def to_state(t: pa.Table) -> pa.Table:
        from ..graph import part_of

        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        seed = t["seed"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(v)
        return eng.kernel.rows(part_of(v, boundaries), v, 0, {
            "val": seed, "active": np.ones(n, np.int8),
            "changed": np.zeros(n, np.int64), "in_msgs": np.zeros(n, np.int64),
        })

    state0 = hop_extrema_seeds(graph).map_batches(to_state, batch_format="pyarrow")
    state = eng.run(max_supersteps=max_supersteps, initial_state=state0)
    return state, eng
