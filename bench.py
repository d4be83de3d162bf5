"""Benchmark harness.

Default mode (what the driver runs per round): times the headline
pipelines — corpus ingest -> graph build, PageRank to convergence (the
north-rule metric: edges/sec per superstep), WCC, LPA, triangle count,
plus the training-data ops over ``$GRAFT_SF_DIR`` — and prints ONE JSON
line::

  {"metric": "total_bench_sec", "value": N, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "pagerank": {"supersteps": n, "edges_per_sec_per_superstep": r}}

``--scaling``: runs the same PageRank job on the same deterministic
Zipf edge table (PLANAR_SCALING_EDGES, default 256M edges) in two fresh
processes at N and 4N CPUs (PLANAR_SCALING_N, default 4 -> 4 vs 16) and
reports both throughputs + scaling efficiency, appending the result to
BENCH/BASELINE.md. A sandbox substitute for two cluster sizes per
BASELINE.md's protocol.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _eprint(*a):
    print(*a, file=sys.stderr, flush=True)


def _init_ray(ncpu: int):
    import logging

    # first-touch page faults on this VM run ~100x slower than warm
    # memory (nested paging): have glibc serve large numpy temporaries
    # from the warm heap instead of fresh mmap/munmap cycles. Workers
    # inherit the env. No-op on machines with healthy fault rates.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # our UDFs all emit typed empty tables; the remaining "RefBundle with
    # a different schema" warnings come from Ray's own zero-row sort
    # partitions (schema-less blocks Ray emits internally), so keep the
    # bench log at ERROR
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _warm_workers(ncpu: int):
    """Pre-fork Ray workers and pull the heavy imports (numpy/pandas/
    pyarrow/planar_ray) into each before the timed section — otherwise
    the first timed query pays ~ncpu cold module loads. Standard bench
    warm-up; every timed stage still does all of its real work."""
    import ray.data as rd

    def _imp(t):
        import pandas  # noqa: F401

        import planar_ray.graph  # noqa: F401
        import planar_ray.superstep  # noqa: F401
        return t

    rd.range(ncpu * 4, override_num_blocks=ncpu * 4).map_batches(
        _imp, batch_format="pyarrow").materialize()


def _bench_graph(ncpu: int):
    """Corpus BENCH spec -> ingest -> graph build; returns (graph, secs)."""
    from planar_ray import corpus, graph as G, ingest

    cdir = corpus.write_corpus(corpus.BENCH)  # cached, untimed after first run
    root = "/tmp/planar_bench/graph"
    shutil.rmtree(root, ignore_errors=True)
    import ray.data as rd

    t0 = time.monotonic()
    ds = rd.read_parquet(cdir)
    files = ingest.extract_files(ds, concurrency=min(8, ncpu))
    edges = ingest.build_edges(files, num_partitions=16)
    # fixed partition count: P beyond ~16 only adds per-superstep task
    # dispatch on a graph this small (the scaling run sizes its own P)
    g, _vdict = G.build_graph(edges, root, num_parts=16)
    return g, time.monotonic() - t0


def run_suite(sf_dir: str, ncpu: int) -> dict:
    from planar_ray.kernels import lpa, pagerank, triangle_count, wcc

    queries: dict[str, float] = {}
    extra: dict = {}

    g, queries["corpus_ingest_build"] = _bench_graph(ncpu)
    _eprint(f"graph: V={g.num_vertices} E={g.num_edges} P={g.num_parts}")

    t0 = time.monotonic()
    state, eng = pagerank(g, tol=1e-6, max_supersteps=200, stats_every=2)
    queries["pagerank"] = time.monotonic() - t0
    steps = eng.metrics
    _eprint("pagerank per-step sec:",
            [round(m.seconds, 2) for m in steps])
    extra["pagerank"] = {
        "supersteps": len(steps),
        "edges_per_sec_per_superstep": round(
            g.num_edges * len(steps) / max(1e-9, queries["pagerank"]), 1
        ),
        "max_delta_final": steps[-1].max_delta,
    }

    t0 = time.monotonic()
    _state, weng = wcc(g, stats_every=1)
    queries["wcc"] = time.monotonic() - t0
    extra["wcc_supersteps"] = len(weng.metrics)

    t0 = time.monotonic()
    lpa(g, max_iters=8, stats_every=2)
    queries["lpa"] = time.monotonic() - t0

    t0 = time.monotonic()
    extra["triangles"] = triangle_count(g)
    queries["triangles"] = time.monotonic() - t0

    # remaining graph apps over the bench graph
    from planar_ray.kernels import (
        boruvka,
        coloring,
        gnn,
        random_walk,
        wcc_precomputed,
    )

    t0 = time.monotonic(); _s, peng = wcc_precomputed(g)
    queries["wcc_precomp"] = time.monotonic() - t0
    extra["wcc_precomp_supersteps"] = len(peng.metrics)
    t0 = time.monotonic(); coloring(g, stats_every=1)
    queries["coloring"] = time.monotonic() - t0
    t0 = time.monotonic(); _l, fedges = boruvka(g)
    queries["mst"] = time.monotonic() - t0
    extra["mst_forest_edges"] = len(fedges)
    t0 = time.monotonic(); random_walk(g).count()
    queries["randomwalk"] = time.monotonic() - t0
    t0 = time.monotonic(); gnn(g, layers=2)
    queries["gnn"] = time.monotonic() - t0

    # round-4 kernels: ppr/hits run on the directed corpus graph; kcore
    # peels its symmetrised-deduped variant (timed incl. that one extra
    # canonical-pair shuffle + build, like corpus_ingest_build)
    import numpy as np

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.hits import hits
    from planar_ray.kernels.kcore import kcore
    from planar_ray.kernels.ppr import ppr

    t0 = time.monotonic()
    ppr(g, np.arange(0, g.num_vertices, 97), iters=10)
    queries["ppr"] = time.monotonic() - t0

    lift_root = "/tmp/planar_bench/graph_hits_lift"
    shutil.rmtree(lift_root, ignore_errors=True)
    t0 = time.monotonic()
    hits(g, lift_root, iters=5)
    queries["hits"] = time.monotonic() - t0

    sym_root = "/tmp/planar_bench/graph_sym_kcore"
    shutil.rmtree(sym_root, ignore_errors=True)
    t0 = time.monotonic()
    from planar_ray.graph import sym_dedup_edges

    both = sym_dedup_edges(g.edges_dataset())
    gsym = partition_edges(both, sym_root, g.num_vertices,
                           num_parts=g.num_parts, direction="fwd")
    _kstate, keng = kcore(gsym, 4)
    queries["kcore"] = time.monotonic() - t0
    kt = _kstate.select_columns(["alive"]).to_pandas()
    extra["kcore_rounds"] = len(keng.metrics)
    extra["kcore_size"] = int(kt["alive"].sum())

    # round-5 kernels: full coreness decomposition (h-index iteration)
    # reuses the symmetric store; weighted SSSP runs on the directed graph
    from planar_ray.kernels.coreness import coreness
    from planar_ray.kernels.sssp import wsssp

    t0 = time.monotonic()
    _cstate, ceng = coreness(gsym)
    queries["coreness"] = time.monotonic() - t0
    extra["coreness_rounds"] = len(ceng.metrics)
    ct = _cstate.select_columns(["val"]).to_pandas()
    extra["coreness_max"] = int(ct["val"].max())

    t0 = time.monotonic()
    _wstate, weng2 = wsssp(g, source=0)
    queries["wsssp"] = time.monotonic() - t0
    extra["wsssp_supersteps"] = len(weng2.metrics)

    # round-5 kernel: SCC (coloring-algorithm phase peel) on the
    # directed bench graph
    from planar_ray.kernels.scc import scc as scc_run

    t0 = time.monotonic()
    _labels, scc_info = scc_run(g)
    queries["scc"] = time.monotonic() - t0
    extra["scc"] = scc_info

    # training-data ops over the sf tables
    from planar_ray.pipelines.ann import (
        q_ann_ivf_topk,
        q_ann_lsh_topk,
        q_ann_neardup,
        q_ann_topk,
    )
    from planar_ray.pipelines.docs import (
        q_doc_exact_dedup,
        q_doc_fingerprint,
        q_doc_hll_vocab,
        q_doc_minhash_dedup,
        q_doc_quality,
        q_doc_scrub,
        q_doc_simhash,
    )
    from planar_ray.pipelines.docs import q_doc_tfidf
    from planar_ray.pipelines.events import q_events_sessionize, q_events_window
    from planar_ray.pipelines.multimodal import q_mm_audio, q_mm_decode
    from planar_ray.pipelines.relational import (
        q_lineitem_pricing,
        q_orders_semijoin,
        q_q3_shipping,
    )
    from planar_ray.pipelines.testdata_graph import q_g2_modularity

    for qname, fn in [
        ("doc_exact_dedup", q_doc_exact_dedup),
        ("doc_minhash_dedup", q_doc_minhash_dedup),
        ("doc_quality", q_doc_quality),
        ("doc_simhash", q_doc_simhash),
        ("doc_fingerprint", q_doc_fingerprint),
        ("doc_scrub", q_doc_scrub),
        ("doc_hll_vocab", q_doc_hll_vocab),
        ("ann_topk", q_ann_topk),
        ("ann_neardup", q_ann_neardup),
        ("ann_lsh_topk", q_ann_lsh_topk),
        ("ann_ivf_topk", q_ann_ivf_topk),
        ("events_window", q_events_window),
        ("events_sessionize", q_events_sessionize),
        ("doc_tfidf", q_doc_tfidf),
        ("mm_decode", q_mm_decode),
        ("mm_audio", q_mm_audio),
        # round-5 relational + composite graph-metric queries
        ("lineitem_pricing", q_lineitem_pricing),
        ("q3_shipping", q_q3_shipping),
        ("orders_semijoin", q_orders_semijoin),
        ("g2_modularity", q_g2_modularity),
    ]:
        t0 = time.monotonic(); fn(sf_dir)
        queries[qname] = time.monotonic() - t0

    return {"queries": {k: round(v, 2) for k, v in queries.items()}, "extra": extra}


# ---------------------------------------------------------------------------
# scaling protocol (N vs 4N CPUs, same input, fresh processes)
# ---------------------------------------------------------------------------

def _scaling_graph(num_edges: int, num_parts: int | None = None):
    from planar_ray import graph as G
    from planar_ray.benchgraph import zipf_edges

    if num_parts is None:
        num_parts = int(os.environ.get("PLANAR_SCALING_PARTS", "16"))
    root = f"/tmp/planar_scaling/zipf_{num_edges}_p{num_parts}"
    if os.path.exists(os.path.join(root, "meta_fwd.json")):
        return G.Graph.load(root, "fwd")  # deterministic: reuse across children
    edges = zipf_edges(num_vertices=num_edges // 8, num_edges=num_edges)
    return G.graph_from_id_edges(edges, root, num_parts=num_parts, dedup=False)


def scaling_prep(ncpu: int, num_edges: int) -> None:
    """Build (or confirm) the shared on-disk scaling graph at full
    parallelism so neither timed child pays the one-time build."""
    _init_ray(ncpu)
    g = _scaling_graph(num_edges)
    import ray

    ray.shutdown()
    print(json.dumps({"edges": g.num_edges, "parts": g.num_parts}))


def scaling_child(ncpu: int, num_edges: int) -> None:
    # this VM's first-touch page faults run ~100x slower than warm
    # memory (nested paging; measured 0.2-2 GB/s cold vs 9-186 GB/s
    # warm) — so (a) keep the plasma arena SMALL enough that per-step
    # message traffic re-uses warm pages instead of faulting fresh ones
    # across a 40 GB arena, and (b) have glibc satisfy large numpy
    # temporaries from the (warm) heap instead of fresh mmaps. Workers
    # inherit the env. On real hardware both are no-ops for correctness.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    # single-threaded BLAS in this driver process: _cpu_ceiling's
    # concurrency math needs one core per matmul task (Ray workers
    # already default to OMP_NUM_THREADS=1)
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    import ray

    store = int(float(os.environ.get("PLANAR_SCALING_STORE_GB", "24")) * 1e9)
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             object_store_memory=store)
    from planar_ray.kernels.pagerank import PageRankKernel
    from planar_ray.superstep import Engine

    g = _scaling_graph(num_edges)

    def barrier(e):  # wait for the pipelined supersteps without fetching
        ray.wait(list(e._state_refs), num_returns=len(e._state_refs),
                 fetch_local=False)

    eng = Engine(g, PageRankKernel(fixed_iters=10_000), stats_every=100)
    eng.init_state_direct()
    for s in range(6):  # warm: CSR + plasma arena pages + worker caches
        eng.step_fused(s, with_stats=False)
    barrier(eng)
    # this box is multi-tenant with bursty hypervisor steal (identical
    # back-to-back runs swing 2-3x): time 5 barriered batches of 4
    # supersteps and score the FASTEST batch — the batch least hit by
    # steal — the same way at both parallelism levels
    n_batches, batch = 6, 4
    batch_secs = []
    s = 6
    for _ in range(n_batches):
        t0 = time.monotonic()
        for _ in range(batch):
            eng.step_fused(s, with_stats=False)
            s += 1
        barrier(eng)
        batch_secs.append(time.monotonic() - t0)
    n_steps = 10
    dt = min(batch_secs) / batch * n_steps
    dt_mean = (sum(batch_secs) / len(batch_secs)) / batch * n_steps

    ray.shutdown()
    print(json.dumps({
        "num_cpus": ncpu, "edges": g.num_edges, "supersteps": n_steps,
        "sec": round(dt, 2),
        "sec_mean": round(dt_mean, 2),
        "edges_per_sec_per_superstep": round(g.num_edges * n_steps / dt, 1),
        "sec_per_superstep": round(dt / n_steps, 3),
        "batch_secs": [round(b, 2) for b in batch_secs],
        "cpu_ceiling_task_sec": _cpu_ceiling(ncpu),
        "mem_ceiling_task_sec": _mem_ceiling(ncpu),
    }))


def run_pcross() -> dict:
    """P-crossover probe for the two-level (node-major) exchange wire:
    time steady PageRank supersteps on the SAME Zipf edge table
    partitioned at P=16 / 64 / 128, each with the flat P x P wire
    (node_groups=P disables the auto gate) and the grouped P x G wire
    (G = node count, 1 on this box). The round-3 verdict's named scale
    caveat was "P=16 beats P=32 (P^2 wire)" — this shows whether the
    grouped wire removes the object-count crossover at high P. Appends a
    table to BENCH/BASELINE.md."""
    edges = int(os.environ.get("PLANAR_PCROSS_EDGES", "256000000"))
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    _init_ray(ncpu)
    import ray

    from planar_ray.kernels.pagerank import PageRankKernel
    from planar_ray.superstep import Engine

    def barrier(e):
        ray.wait(list(e._state_refs), num_returns=len(e._state_refs),
                 fetch_local=False)

    configs = [(16, 16, "flat"), (64, 64, "flat"), (64, 1, "grouped"),
               (128, 128, "flat"), (128, 1, "grouped"), (128, 4, "grouped")]
    rows = []
    for parts, groups, label in configs:
        g = _scaling_graph(edges, num_parts=parts)
        eng = Engine(g, PageRankKernel(fixed_iters=10_000), stats_every=100,
                     node_groups=groups)
        try:
            eng.init_state_direct()
            for s in range(4):  # warm CSR/plan pins + worker caches
                eng.step_fused(s, with_stats=False)
            barrier(eng)
            n_batches, batch = 4, 3
            batch_secs = []
            s = 4
            for _ in range(n_batches):
                t0 = time.monotonic()
                for _ in range(batch):
                    eng.step_fused(s, with_stats=False)
                    s += 1
                barrier(eng)
                batch_secs.append(time.monotonic() - t0)
        finally:
            eng.close()
        row = {
            "parts": parts, "wire": label, "groups": groups,
            "sec_per_superstep_best": round(min(batch_secs) / batch, 3),
            "sec_per_superstep_mean": round(
                sum(batch_secs) / len(batch_secs) / batch, 3),
            "batch_secs": [round(b, 2) for b in batch_secs],
        }
        rows.append(row)
        _eprint("pcross:", row)
    ray.shutdown()
    result = {"metric": "pcross", "edges": edges, "num_cpus": ncpu,
              "rows": rows}
    _write_pcross_md(result)
    return result


def _write_pcross_md(r: dict) -> None:
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH", "BASELINE.md")
    lines = [
        "",
        f"## P-crossover: flat vs two-level wire "
        f"({time.strftime('%Y-%m-%d %H:%M:%S')})",
        "",
        f"PageRank steady supersteps, Zipf E={r['edges']:,}, "
        f"{r['num_cpus']} cpus, fused direct exchange. 'flat' ships the "
        "P x P message matrix; 'grouped' pre-combines per destination "
        "group (P x G objects; G = node count, 1 here).",
        "",
        "| P | wire | G | s/superstep (best) | s/superstep (mean) | batches |",
        "|---|---|---|---|---|---|",
    ]
    for row in r["rows"]:
        lines.append(
            f"| {row['parts']} | {row['wire']} | {row['groups']} | "
            f"{row['sec_per_superstep_best']} | "
            f"{row['sec_per_superstep_mean']} | {row['batch_secs']} |")
    lines.append("")
    with open(path, "a") as f:
        f.write("\n".join(lines))


def _cpu_ceiling(ncpu: int) -> float:
    """Per-task seconds of a fixed warm numpy matmul burn run ncpu-way
    concurrent — the box's PURE-COMPUTE parallel ceiling at this level,
    measured in the same process right after the Ray run. On dedicated
    hardware this is flat across levels; on this multi-tenant VM it
    degrades with concurrency (hypervisor overcommit + shared memory
    bandwidth), so (lo_ceiling / hi_ceiling) is the best scaling ANY
    CPU-bound job — Ray or not — could show between the two levels.
    Reported alongside the PageRank number to separate engine scaling
    from infrastructure ceiling."""
    import numpy as np
    from concurrent.futures import ThreadPoolExecutor

    a = np.random.rand(1500, 1500)

    def burn(_):
        t0 = time.monotonic()
        for _ in range(6):
            (a @ a).sum()
        return time.monotonic() - t0

    with ThreadPoolExecutor(ncpu) as ex:  # numpy matmul releases the GIL
        # warm the pool's threads + their malloc arenas at full
        # concurrency first — otherwise the probe measures first-touch
        # page faults (which this VM serves ~100x slower than warm
        # memory), not compute
        list(ex.map(burn, range(ncpu)))
        times = sorted(ex.map(burn, range(2 * ncpu)))
    return round(times[len(times) // 2], 3)  # median task


def _mem_ceiling(ncpu: int) -> float:
    """Memory-bound twin of _cpu_ceiling: each task random-gathers a
    64 MB array and bincounts the result — the same access pattern as a
    PageRank scatter wave (rate gather + dense accumulate). DRAM
    bandwidth is shared across cores, so this ceiling is LOWER than the
    matmul one and is the honest bound for what a memory-bound superstep
    can scale to on one box; on a real cluster each of the 4N nodes
    brings its own memory system and this term disappears."""
    import numpy as np
    from concurrent.futures import ThreadPoolExecutor

    n = 8_000_000
    rng = np.random.default_rng(5)
    arr = rng.random(n)
    idx = rng.integers(0, n, n).astype(np.int64)

    def burn(_):
        t0 = time.monotonic()
        for _ in range(3):
            g = arr[idx]
            np.bincount(idx >> np.int64(12), weights=g,
                        minlength=n >> 12).sum()
        return time.monotonic() - t0

    with ThreadPoolExecutor(ncpu) as ex:
        # same arena warm-up as _cpu_ceiling: time bandwidth, not faults
        list(ex.map(burn, range(ncpu)))
        times = sorted(ex.map(burn, range(2 * ncpu)))
    return round(times[len(times) // 2], 3)


def run_scaling() -> dict:
    n = int(os.environ.get("PLANAR_SCALING_N", "4"))
    # default 128M edges: large enough that per-step compute dominates
    # the fixed per-superstep cost at BOTH levels (the engine's dense
    # exchange is ~8x faster than round 2, so 16M-edge steps finish in
    # ~0.2 s and measure mostly task latency, not scaling)
    edges = int(os.environ.get("PLANAR_SCALING_EDGES", "256000000"))

    def child(ncpu: int, mode: str = "--scaling-child") -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode,
             str(ncpu), str(edges)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    _eprint("scaling prep:", child(32, "--scaling-prep"))
    # the sandbox is multi-tenant (hypervisor neighbors; observed 2-3x
    # swings in identical back-to-back runs): measure several (lo, hi)
    # pairs back-to-back so both levels see the same noise regime, and
    # report every pair plus the best one
    pairs = []
    for i in range(int(os.environ.get("PLANAR_SCALING_PAIRS", "1"))):
        lo = child(n)
        _eprint(f"scaling lo[{i}]:", lo)
        hi = child(4 * n)
        _eprint(f"scaling hi[{i}]:", hi)
        # pure-compute ceiling: the best scaling ANY CPU-bound job could
        # show between these two levels at measurement time (see
        # _cpu_ceiling) — the box is overcommitted, so per-core speed
        # drops as concurrency rises even for warm numpy matmul
        ceil = None
        if lo.get("cpu_ceiling_task_sec") and hi.get("cpu_ceiling_task_sec"):
            ceil = round(lo["cpu_ceiling_task_sec"]
                         / hi["cpu_ceiling_task_sec"], 3)
        mceil = None
        if lo.get("mem_ceiling_task_sec") and hi.get("mem_ceiling_task_sec"):
            mceil = round(lo["mem_ceiling_task_sec"]
                          / hi["mem_ceiling_task_sec"], 3)
        eff = round((lo["sec"] / hi["sec"]) / 4.0, 3)
        eff_mean = (round((lo["sec_mean"] / hi["sec_mean"]) / 4.0, 3)
                    if lo.get("sec_mean") and hi.get("sec_mean") else None)
        # a mem ceiling > 1 means the box's throttle level CHANGED between
        # the lo and hi runs (per-task time should only rise with
        # concurrency) — the pair's conditions weren't comparable, so
        # don't derive an eff-vs-ceiling from it. The probes bracket each
        # LEVEL but can miss a throttle shift DURING one (observed: lo
        # batches drifting 18.6 -> 23.0 s within a run while both probes
        # land in the same phase), so also require each level's timed
        # batches to stay flat (max/min <= 1.25, first batch dropped as
        # residual warm-up).
        def _drift(level: dict):
            bs = (level.get("batch_secs") or [])
            bs = bs[1:] if len(bs) > 1 else bs  # first = residual warm-up
            return round(max(bs) / max(min(bs), 1e-9), 3) if bs else None

        dlo, dhi = _drift(lo), _drift(hi)
        flat = all(d is not None and d <= 1.25 for d in (dlo, dhi))
        steady = mceil is not None and mceil <= 1.0 and flat
        pairs.append({"lo": lo, "hi": hi, "eff": eff, "eff_mean": eff_mean,
                      "ceiling_eff": ceil,
                      "mem_ceiling_eff": mceil,
                      "level_drift": [dlo, dhi],
                      "steady_conditions": steady,
                      "eff_vs_ceiling": (round(min(eff / mceil, 1.0), 3)
                                         if steady else None)})
    # HEADLINE = the MEDIAN pair (robust under the VM's 2-3x hypervisor
    # swings); best-of stays a disclosed secondary field. Selecting the
    # max favored the most favorable noise regime and overstated typical
    # scaling even with per-pair disclosure.
    by_eff = sorted(pairs, key=lambda p: p["eff"])
    med = by_eff[(len(by_eff) - 1) // 2]  # lower-middle: conservative
    best = by_eff[-1]
    result = {
        "metric": "pagerank_scaling_efficiency",
        "value": med["eff"],
        "unit": "ratio",
        "n_cpus": n,
        "n4_cpus": 4 * n,
        "edges": edges,
        "lo": med["lo"],
        "hi": med["hi"],
        "pairs": [p["eff"] for p in pairs],
        "pairs_mean": [p.get("eff_mean") for p in pairs],
        "eff_mean": med.get("eff_mean"),
        "best_eff": best["eff"],
        "ceiling_eff": med["ceiling_eff"],
        "mem_ceiling_eff": med["mem_ceiling_eff"],
        "level_drift": med["level_drift"],
        "steady_conditions": med["steady_conditions"],
        "eff_vs_ceiling": med["eff_vs_ceiling"],
    }
    _write_scaling_md(result)
    return result


def _write_scaling_md(r: dict) -> None:
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"),
                exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH", "BASELINE.md")
    lines = [
        "",
        f"## Scaling run ({time.strftime('%Y-%m-%d %H:%M:%S')})",
        "",
        f"Zipf edge table, E={r['edges']:,}, same graph + 10 timed supersteps",
        "per level (2 warm-up), fresh `ray.init` processes.",
        "",
        "| cpus | sec (10 supersteps, best batch) | sec (mean of batches) | sec/superstep | edges/sec/superstep |",
        "|---|---|---|---|---|",
        f"| {r['lo']['num_cpus']} | {r['lo']['sec']} | {r['lo'].get('sec_mean', '-')} | {r['lo']['sec_per_superstep']} | {r['lo']['edges_per_sec_per_superstep']:,} |",
        f"| {r['hi']['num_cpus']} | {r['hi']['sec']} | {r['hi'].get('sec_mean', '-')} | {r['hi']['sec_per_superstep']} | {r['hi']['edges_per_sec_per_superstep']:,} |",
        "",
        f"**Scaling efficiency (N={r['n_cpus']} -> 4N={r['n4_cpus']}): "
        f"{r['value']} (median pair)**"
        + (f" — back-to-back pairs {r['pairs']}, best {r.get('best_eff')}"
           f", mean-of-batches pairs {r.get('pairs_mean')}"
           if r.get("pairs") else ""),
        "",
    ]
    if r.get("ceiling_eff"):
        lo_c = r["lo"].get("cpu_ceiling_task_sec")
        hi_c = r["hi"].get("cpu_ceiling_task_sec")
        lo_m = r["lo"].get("mem_ceiling_task_sec")
        hi_m = r["hi"].get("mem_ceiling_task_sec")
        lines += [
            f"Box ceilings at measurement time, each a warm 1-thread numpy "
            f"task run {r['n_cpus']}-way then {r['n4_cpus']}-way concurrent: "
            f"compute (matmul) {lo_c} -> {hi_c} s/task = scaling ceiling "
            f"**{r['ceiling_eff']}**; memory-bound (random gather+bincount, "
            f"a superstep's access pattern) {lo_m} -> {hi_m} s/task = "
            f"ceiling **{r.get('mem_ceiling_eff')}**."
            + (f" PageRank reached **{r['eff_vs_ceiling']}** of the "
               f"memory-bound ceiling (shared-DRAM term; absent on a real "
               f"cluster where each of the 4N nodes brings its own memory "
               f"system)."
               if r.get("steady_conditions")
               else " NOT STEADY: either a memory ceiling > 1 (throttle "
                    "level changed between the lo and hi runs) or "
                    "intra-level batch drift > 1.25 (throttle shifted "
                    "DURING a level) — the pair's levels did not see "
                    "comparable conditions."),
            f"Intra-level batch drift (max/min of timed batches, first "
            f"dropped): {r.get('level_drift')}.",
            "",
        ]
    with open(path, "a") as f:
        f.write("\n".join(lines))


def run_cluster() -> dict:
    """Virtual multi-node evidence for the grouped wire (VERDICT r4
    item 1) at bench scale: tools/cluster_wire.py on 4 nodes x 8 cpus
    vs 1 node x 32 cpus, same Zipf graph. Appends to BENCH/BASELINE.md.

    The virtual nodes share one box's DRAM, so s/step is an upper bound
    on real-cluster cost (adds plasma transfers, shares bandwidth); the
    object-placement accounting is exact either way."""
    edges = int(os.environ.get("PLANAR_CLUSTER_EDGES", "16000000"))
    parts = int(os.environ.get("PLANAR_CLUSTER_PARTS", "32"))
    here = os.path.dirname(os.path.abspath(__file__))

    def child(nodes: int, cpus: int) -> dict:
        env = dict(os.environ)
        env.pop("RAY_ADDRESS", None)
        out = subprocess.run(
            [sys.executable, os.path.join(here, "tools", "cluster_wire.py"),
             "--nodes", str(nodes), "--cpus", str(cpus),
             "--edges", str(edges), "--parts", str(parts),
             "--steps", "6", "--time-batches", "3", "--store-mb", "2000"],
            capture_output=True, text=True, check=True, cwd=here, env=env)
        return json.loads(out.stdout.strip().splitlines()[-1])

    multi = child(4, 8)
    _eprint("cluster 4x8:", multi)
    single = child(1, 32)
    _eprint("single 1x32:", single)
    r = {"metric": "grouped_wire_virtual_cluster", "edges": multi["edges"],
         "parts": multi["parts"], "multi": multi, "single": single}
    path = os.path.join(here, "BENCH", "BASELINE.md")
    g, f = multi["grouped"], multi["flat"]
    with open(path, "a") as fh:
        fh.write("\n".join([
            "",
            f"## Virtual multi-node wire validation "
            f"({time.strftime('%Y-%m-%d %H:%M:%S')})",
            "",
            f"`ray.cluster_utils.Cluster`, Zipf E={multi['edges']:,} "
            f"P={multi['parts']}, PageRank fused supersteps "
            f"(tools/cluster_wire.py; home-node soft pinning).",
            "",
            "| topology | wire | wave objects | copies mean/max | s/superstep |",
            "|---|---|---|---|---|",
            f"| 4 nodes x 8 cpus | grouped G={g['G']} | {g['wave_objects']} "
            f"| {g['copies_mean']} / {g['copies_max']} "
            f"| {g['sec_per_superstep']} |",
            f"| 4 nodes x 8 cpus | flat P x P | {f['wave_objects']} "
            f"| {f['copies_mean']} / {f['copies_max']} "
            f"| {f['sec_per_superstep']} |",
            f"| 1 node x 32 cpus | flat (G=1 auto) "
            f"| {single['flat']['wave_objects']} "
            f"| {single['flat']['copies_mean']} / "
            f"{single['flat']['copies_max']} "
            f"| {single['flat']['sec_per_superstep']} |",
            "",
            f"Bit-identical across wires AND topologies: "
            f"multi {multi['bit_identical']}, digests "
            f"{multi['digest']} == {single['digest']}: "
            f"{multi['digest'] == single['digest']}. Every grouped "
            f"message table held by <= 2 nodes "
            f"(frac_le2={g['frac_copies_le2']}) — one fetch per "
            f"destination node, member partitions slice the same plasma "
            f"object. Virtual nodes share one box's DRAM: s/step here is "
            f"an UPPER bound on a real cluster's exchange cost.",
            "",
        ]))
    return r


def main() -> None:
    if "--cluster" in sys.argv:
        print(json.dumps(run_cluster()))
        return
    if "--scaling-child" in sys.argv:
        i = sys.argv.index("--scaling-child")
        scaling_child(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        return
    if "--scaling-prep" in sys.argv:
        i = sys.argv.index("--scaling-prep")
        scaling_prep(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        return
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
        return
    if "--pcross" in sys.argv:
        print(json.dumps(run_pcross()))
        return

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    _init_ray(ncpu)
    _warm_workers(ncpu)
    t0 = time.monotonic()
    res = run_suite(sf_dir, ncpu)
    total = round(time.monotonic() - t0, 2)
    import ray

    ray.shutdown()
    print(json.dumps({
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": res["queries"],
        "sf": sf_dir,
        "num_cpus": ncpu,
        "pagerank": res["extra"]["pagerank"],
        "extra": {k: v for k, v in res["extra"].items() if k != "pagerank"},
    }))


if __name__ == "__main__":
    main()
