"""Mid-superstep chaos validation — VERDICT r4 item 2.

Two failure modes, both injected WHILE supersteps are running:

  --mode worker : single node; SIGKILL a ray worker process that is
      executing an engine task (proctitle ``ray::_direct_fused`` /
      ``ray::_direct_scatter``). The worker's in-flight task is retried
      by Ray (tasks are stateless pure functions of plasma-resident
      args); the run must complete with state BIT-IDENTICAL to an
      uninterrupted run.

  --mode node : 4-node ``ray.cluster_utils.Cluster``; hard-remove one
      worker NODE mid-run. That node's plasma objects (its partitions'
      state tables, message tables, CSR blocks) are LOST and must be
      reconstructed via lineage (re-execution of the deterministic
      task chain, CSR reload from disk). If reconstruction fails
      terminally the run must fail CLEANLY into checkpoint resume
      (Engine(run_dir=...).run(resume=True)) and still match.

Emits one JSON line; exit 0 iff the post-chaos digest equals the
uninterrupted digest.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import signal
import sys
import threading
import time


def eprint(*a):
    print(*a, file=sys.stderr, flush=True)


def digest_of(state_refs) -> str:
    import numpy as np
    import pyarrow as pa

    import ray

    tabs = [t for t in ray.get(list(state_refs)) if len(t)]
    t = pa.concat_tables(tabs)
    v = t["v"].to_numpy(zero_copy_only=False)
    val = t["val"].to_numpy(zero_copy_only=False)
    order = np.argsort(v)
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(v[order]).tobytes())
    h.update(np.ascontiguousarray(val[order]).tobytes())
    return h.hexdigest()


def build_graph(edges: int, parts: int):
    from planar_ray import graph as G
    from planar_ray.benchgraph import zipf_edges

    root = f"/tmp/planar_chaos/zipf_{edges}_p{parts}"
    if os.path.exists(os.path.join(root, "meta_fwd.json")):
        return G.Graph.load(root, "fwd")
    e = zipf_edges(num_vertices=edges // 8, num_edges=edges)
    return G.graph_from_id_edges(e, root, num_parts=parts, dedup=False)


def run_pagerank(g, steps: int, run_dir=None, checkpoint_every=0,
                 resume=False):
    from planar_ray.kernels.pagerank import PageRankKernel
    from planar_ray.superstep import Engine

    eng = Engine(g, PageRankKernel(fixed_iters=10_000),
                 run_dir=run_dir, checkpoint_every=checkpoint_every,
                 stats_every=1)
    eng.run(max_supersteps=steps, resume=resume)
    d = digest_of(eng._state_refs)
    eng.close()
    return d


def find_engine_workers() -> list[int]:
    """PIDs of ray workers currently executing engine tasks (Ray sets
    the proctitle to ``ray::<task name>`` while a task runs)."""
    pids = []
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
        except OSError:
            continue
        if cmd.startswith("ray::_direct") or cmd.startswith("ray::planar"):
            pids.append(int(p))
    return pids


def chaos_worker(args) -> dict:
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    g = build_graph(args.edges, args.parts)
    clean = run_pagerank(g, args.steps)
    eprint("clean digest", clean[:16])

    killed = {"n": 0}

    def killer():
        # wait until supersteps are in flight, then SIGKILL up to two
        # busy engine workers a beat apart
        deadline = time.monotonic() + 30
        while killed["n"] < 2 and time.monotonic() < deadline:
            for pid in find_engine_workers():
                try:
                    os.kill(pid, signal.SIGKILL)
                    killed["n"] += 1
                    eprint(f"SIGKILLed worker {pid}")
                    break
                except OSError:
                    pass
            time.sleep(0.15)

    t = threading.Thread(target=killer, daemon=True)
    t.start()
    chaotic = run_pagerank(g, args.steps)
    t.join(timeout=5)
    ray.shutdown()
    return {"mode": "worker", "kills": killed["n"], "clean": clean[:16],
            "chaos": chaotic[:16], "match": clean == chaotic,
            "recovered_via": "task_retry"}


def chaos_node(args) -> dict:
    import ray
    from ray.cluster_utils import Cluster

    # exercise the GROUPED wire + home-node pinning during the loss:
    # G = alive nodes (4 -> 3 mid-run; soft pinning must fall back)
    os.environ["PLANAR_GROUP_AUTO_P"] = "4"
    store = 400_000_000
    cluster = Cluster(initialize_head=True, head_node_args={
        "num_cpus": 2, "object_store_memory": store})
    workers = [cluster.add_node(num_cpus=2, object_store_memory=store)
               for _ in range(3)]
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    g = build_graph(args.edges, args.parts)
    run_dir = f"/tmp/planar_chaos/run_node_{os.getpid()}"
    clean = run_pagerank(g, args.steps)
    eprint("clean digest", clean[:16])

    def killer():
        time.sleep(args.kill_after)
        eprint("removing node", workers[-1].node_id)
        cluster.remove_node(workers[-1], allow_graceful=False)

    t = threading.Thread(target=killer, daemon=True)
    t.start()
    recovered_via = "lineage"
    try:
        chaotic = run_pagerank(g, args.steps, run_dir=run_dir,
                               checkpoint_every=3)
    except Exception as e:  # terminal loss -> clean resume path
        eprint("lineage reconstruction failed terminally:",
               type(e).__name__, str(e)[:200])
        recovered_via = "checkpoint_resume"
        chaotic = run_pagerank(g, args.steps, run_dir=run_dir,
                               checkpoint_every=3, resume=True)
    t.join(timeout=5)
    alive = sum(1 for n in ray.nodes() if n.get("Alive"))
    ray.shutdown()
    cluster.shutdown()
    return {"mode": "node", "alive_after": alive, "clean": clean[:16],
            "chaos": chaotic[:16], "match": clean == chaotic,
            "recovered_via": recovered_via}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["worker", "node"], default="worker")
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--kill-after", type=float, default=1.0)
    args = ap.parse_args()

    os.environ.pop("RAY_ADDRESS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.environ["PYTHONPATH"] = (
        repo + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)

    out = chaos_worker(args) if args.mode == "worker" else chaos_node(args)
    print(json.dumps(out))
    sys.exit(0 if out["match"] else 1)


if __name__ == "__main__":
    main()
