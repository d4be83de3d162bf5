"""Virtual multi-node validation of the two-level (node-major) exchange
wire — VERDICT r4 item 1.

Stands up ``ray.cluster_utils.Cluster`` (N virtual nodes on one box,
each its own raylet + object store) and runs PageRank twice over the
same deterministic Zipf graph:

  flat     — ``node_groups=P`` (the P x P wire, no grouping)
  grouped  — auto path: PLANAR_GROUP_AUTO_P low + node_groups=None, so
             the engine derives G = alive node count, exactly as it
             would on a real cluster (also covers the AUTO_P gate).

Asserts / measures:
  (a) results bit-identical between the two wires (the documented
      parity guarantee — per-source reduction order is format-free);
  (b) each grouped message table is held by at most 2 nodes (producer
      + destination group's home node) — i.e. a group table is fetched
      to its destination node ONCE and all member partitions slice the
      same plasma object (``ray.experimental.get_object_locations``);
      made a placement property by the engine's home-node soft pinning
      (superstep.Engine._pin);
  (c) wave object count: P x G grouped vs P x P flat;
  (d) steady s/superstep for both wires on the virtual cluster.

Run:  python tools/cluster_wire.py --nodes 4 --cpus 2 --edges 800000 \
          --parts 8 --steps 6
Emits ONE JSON line on stdout (diagnostics on stderr).

This is validation of placement + parity semantics, not a throughput
bench — the virtual nodes share one box's DRAM, so absolute s/step is
not comparable to a real N-node cluster (but object accounting is).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time


def eprint(*a):
    print(*a, file=sys.stderr, flush=True)


def state_digest(eng) -> str:
    """Bitwise digest of the engine's final state (v, val), sorted by v."""
    import numpy as np
    import pyarrow as pa

    import ray

    tabs = [t for t in ray.get(list(eng._state_refs)) if len(t)]
    t = pa.concat_tables(tabs)
    v = t["v"].to_numpy(zero_copy_only=False)
    val = t["val"].to_numpy(zero_copy_only=False)
    order = np.argsort(v)
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(v[order]).tobytes())
    h.update(np.ascontiguousarray(val[order]).tobytes())
    return h.hexdigest()


def timed_steps(eng, start: int, batches: int, batch: int) -> float:
    """Best-batch s/superstep (the box-throttle protocol of bench.py)."""
    import ray

    def barrier():
        ray.wait(list(eng._state_refs), num_returns=len(eng._state_refs),
                 fetch_local=False)

    best = None
    s = start
    for _ in range(batches):
        t0 = time.monotonic()
        for _ in range(batch):
            eng.step_fused(s, with_stats=False)
            s += 1
        barrier()
        dt = (time.monotonic() - t0) / batch
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=2)
    ap.add_argument("--edges", type=int, default=800_000)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--store-mb", type=int, default=600)
    ap.add_argument("--time-batches", type=int, default=3)
    args = ap.parse_args()

    # the preset RAY_ADDRESS=local would hijack ray.init(address=...)
    os.environ.pop("RAY_ADDRESS", None)
    # importable from any cwd, and inherited by every node's workers
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.environ["PYTHONPATH"] = (
        repo + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)
    # the auto-group gate: any P above this groups by alive node count
    os.environ["PLANAR_GROUP_AUTO_P"] = str(max(1, args.nodes))

    import numpy as np

    import ray
    from ray.cluster_utils import Cluster

    store = args.store_mb * 1_000_000
    cluster = Cluster(initialize_head=True, head_node_args={
        "num_cpus": args.cpus, "object_store_memory": store})
    for _ in range(args.nodes - 1):
        cluster.add_node(num_cpus=args.cpus, object_store_memory=store)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    alive = sum(1 for n in ray.nodes() if n.get("Alive"))
    eprint(f"cluster up: {alive} nodes x {args.cpus} cpus")

    from planar_ray import graph as G
    from planar_ray.benchgraph import zipf_edges
    from planar_ray.kernels.pagerank import PageRankKernel
    from planar_ray.superstep import Engine

    root = f"/tmp/planar_cluster/zipf_{args.edges}_p{args.parts}"
    if os.path.exists(os.path.join(root, "meta_fwd.json")):
        g = G.Graph.load(root, "fwd")
    else:
        edges = zipf_edges(num_vertices=args.edges // 8,
                           num_edges=args.edges)
        g = G.graph_from_id_edges(edges, root, num_parts=args.parts,
                                  dedup=False)
    P = g.num_parts
    eprint(f"graph: V={g.num_vertices} E={g.num_edges} P={P}")

    out: dict = {"nodes": alive, "cpus_per_node": args.cpus,
                 "edges": g.num_edges, "vertices": g.num_vertices,
                 "parts": P}

    # ---- flat wire --------------------------------------------------------
    eng_flat = Engine(g, PageRankKernel(fixed_iters=10_000),
                      node_groups=P, stats_every=100)
    assert eng_flat._group_cuts is None, "node_groups=P must stay flat"
    if alive > 1:
        assert eng_flat._part_node is not None and \
            len(set(eng_flat._part_node)) == alive, \
            "home-node map must cover every alive node"
    else:
        assert eng_flat._part_node is None, "single node must not pin"
    eng_flat.init_state_direct()
    for s in range(args.steps):
        eng_flat.step_fused(s, with_stats=False)
    flat_refs = [r for row in eng_flat._msg_refs for r in row]
    eng_flat.step_fused(args.steps, with_stats=False)  # consume them
    flat_digest = state_digest(eng_flat)
    flat_sps = timed_steps(eng_flat, args.steps + 1,
                           args.time_batches, args.steps)
    flat_locs = ray.experimental.get_object_locations(flat_refs)
    flat_copies = [len(v.get("node_ids", [])) for v in flat_locs.values()]
    out["flat"] = {
        "wave_objects": len(flat_refs),
        "sec_per_superstep": round(flat_sps, 4),
        "copies_mean": round(float(np.mean(flat_copies)), 3),
        "copies_max": int(max(flat_copies)),
    }
    eng_flat.close()

    # ---- grouped wire (auto path: G = alive nodes) ------------------------
    eng_grp = Engine(g, PageRankKernel(fixed_iters=10_000),
                     stats_every=100)
    assert eng_grp._group_cuts is not None, \
        "AUTO_P gate did not trigger grouping"
    Gn = len(eng_grp._group_cuts) - 1
    assert Gn == alive, f"auto G={Gn} != alive nodes {alive}"
    eng_grp.init_state_direct()
    for s in range(args.steps):
        eng_grp.step_fused(s, with_stats=False)
    grp_refs = [r for row in eng_grp._msg_refs for r in row]
    eng_grp.step_fused(args.steps, with_stats=False)  # consume them
    grp_digest = state_digest(eng_grp)
    grp_sps = timed_steps(eng_grp, args.steps + 1,
                          args.time_batches, args.steps)
    grp_locs = ray.experimental.get_object_locations(grp_refs)
    grp_copies = [len(v.get("node_ids", [])) for v in grp_locs.values()]
    # the central claim: a group table reaches its destination node ONCE
    # (copies <= 2: producer + destination home; ==1 when src group ==
    # dst group). Soft pinning may reschedule a task under pressure, so
    # allow a small tail rather than a hard max.
    le2 = sum(1 for c in grp_copies if c <= 2) / max(1, len(grp_copies))
    out["grouped"] = {
        "G": Gn,
        "wave_objects": len(grp_refs),
        "sec_per_superstep": round(grp_sps, 4),
        "copies_mean": round(float(np.mean(grp_copies)), 3),
        "copies_max": int(max(grp_copies)),
        "frac_copies_le2": round(le2, 4),
    }
    eng_grp.close()

    out["bit_identical"] = flat_digest == grp_digest
    out["digest"] = flat_digest[:16]
    out["object_ratio_flat_over_grouped"] = round(
        len(flat_refs) / max(1, len(grp_refs)), 2)
    ok = (out["bit_identical"]
          and len(grp_refs) == P * Gn
          and len(flat_refs) == P * P
          and le2 >= 0.9)
    out["ok"] = bool(ok)

    ray.shutdown()
    cluster.shutdown()
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
