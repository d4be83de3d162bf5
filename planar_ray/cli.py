"""CLI — the ``ray job submit`` entry point.

    python -m planar_ray.cli ingest --spec small --out /tmp/g
    python -m planar_ray.cli run --kernel pagerank --graph /tmp/g \
        --run-dir /tmp/run1 --checkpoint-every 1 [--resume]
    python -m planar_ray.cli kernels            # list available kernels

On a cluster: ``ray job submit -- python -m planar_ray.cli run ...`` —
the driver process stays thin (supersteps are dataset pipelines); resume
picks up the latest per-superstep manifest in --run-dir (the
checkpoint/lineage contract of BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_ingest(args) -> None:
    _ensure_ray()
    import ray.data as rd

    from . import corpus, graph as G, ingest

    spec = {"tiny": corpus.TINY, "small": corpus.SMALL, "bench": corpus.BENCH}[args.spec]
    cdir = corpus.write_corpus(spec)
    ds = rd.read_parquet(cdir)
    files = ingest.extract_files(ds)
    edges = ingest.build_edges(files)
    out: dict = {"graph": args.out}
    if getattr(args, "relabel", "none") == "bfs":
        g = _ingest_relabel_bfs(edges, args.out, args.parts, out)
    else:
        g, _vdict = G.build_graph(edges, args.out, num_parts=args.parts)
    out.update({"num_vertices": g.num_vertices, "num_edges": g.num_edges,
                "parts": g.num_parts})
    print(json.dumps(out))


def _ingest_relabel_bfs(edges, out_dir: str, parts: int, out: dict):
    """End-to-end BFS relabel path (the usable form of the reference's
    S13 planar vertex-cut, tools/graph_partitioner/partitioner/
    csr_based_planar_vertexcut.cpp): build the raw graph under
    ``out/pre_relabel``, rename vertices to their BFS visit rank
    (neighbours get nearby ids), range-partition the renamed graph into
    ``out`` — the engine's ordinary range partitioner then IS the
    locality partitioner. Writes the composed key->new-id dictionary to
    ``out/vertices``, the old->new rank map to ``out/relabel_rank/``,
    and lineage + measured edge-cut fractions to ``out/relabel.json``."""
    import os

    import numpy as np
    import pyarrow as pa

    import ray

    from . import graph as G
    from .partition_quality import (
        bfs_order,
        edge_cut_fraction,
        range_assign,
        relabel_graph,
    )
    from .util import write_json_atomic

    raw_root = os.path.join(out_dir, "pre_relabel")
    g_raw, vdict = G.build_graph(edges, raw_root, num_parts=parts)
    rank = bfs_order(g_raw)  # offline tool pass, like the reference exe
    g = relabel_graph(g_raw, rank, out_dir, num_parts=parts)
    ref = ray.put(rank.astype(np.int64))

    def remap_dict(t: pa.Table) -> pa.Table:
        r = ray.get(ref)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"key": t["key"], "v": pa.array(r[v])})

    vdict.map_batches(remap_dict, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "vertices"))
    import ray.data as rd

    rd.from_arrow(pa.table({
        "old_v": pa.array(np.arange(len(rank), dtype=np.int64)),
        "new_v": pa.array(rank.astype(np.int64)),
    })).write_parquet(os.path.join(out_dir, "relabel_rank"))
    cut_before = edge_cut_fraction(g_raw.edges_dataset(),
                                   range_assign(g_raw.boundaries))
    cut_after = edge_cut_fraction(g.edges_dataset(),
                                  range_assign(g.boundaries))
    lineage = {
        "method": "bfs",
        "source_root": raw_root,
        "rank_map": "relabel_rank/",
        "num_vertices": g.num_vertices,
        "num_edges": g.num_edges,
        "edge_cut_before": round(cut_before, 4),
        "edge_cut_after": round(cut_after, 4),
    }
    write_json_atomic(os.path.join(out_dir, "relabel.json"), lineage)
    out["relabel"] = lineage
    return g


KERNELS = ("pagerank", "pagerank_ref", "wcc", "wcc_precomp", "wcc_contract",
           "lpa", "sssp", "coloring", "gnn", "randomwalk", "triangles", "mst",
           "kcore", "ppr", "hits", "scc", "betweenness", "harmonic",
           "diameter", "wsssp", "coreness")


def cmd_run(args) -> None:
    _ensure_ray()
    import os

    from . import graph as G
    from . import kernels as K

    if os.path.exists(os.path.join(args.graph, "meta_fwd.json")):
        g = G.Graph.load(args.graph, "fwd")
    elif os.path.exists(os.path.join(args.graph, "meta_rev.json")):
        # incoming-only store (`ingest-csv --store-strategy incoming`):
        # materialise fwd once from the transposed rev rows so every
        # kernel (out-degree readers included) runs against this root
        g = G.derive_direction(G.Graph.load(args.graph, "rev"), "fwd")
    else:
        raise SystemExit(f"no graph store (meta_*.json) under {args.graph}")
    common = dict(run_dir=args.run_dir, checkpoint_every=args.checkpoint_every)
    out: dict = {"kernel": args.kernel}
    if args.kernel == "pagerank":
        # --iters caps supersteps (an operator-controlled interruption
        # point: checkpoint, stop, later `--resume` continues to
        # convergence — the north rule's resume-mid-iteration path)
        _state, eng = K.pagerank(
            g, resume=args.resume,
            max_supersteps=args.iters or 200, **common)
    elif args.kernel == "pagerank_ref":
        _state, eng = K.pagerank_reference(g, iters=args.iters or 10)
    elif args.kernel == "wcc":
        _state, eng = K.wcc(g, resume=args.resume, **common)
    elif args.kernel == "wcc_precomp":
        _state, eng = K.wcc_precomputed(g)
    elif args.kernel == "wcc_contract":
        _state, eng = K.wcc(g, contract_every=args.iters or 3)
        out["contract_log"] = getattr(eng, "contract_log", [])
    elif args.kernel == "lpa":
        _state, eng = K.lpa(g, max_iters=args.iters or 10, resume=args.resume, **common)
    elif args.kernel == "sssp":
        _state, eng = K.sssp(
            g, source=args.source if args.source is not None else 0)
    elif args.kernel == "wsssp":
        _state, eng = K.wsssp(
            g, source=args.source if args.source is not None else 0)
    elif args.kernel == "coreness":
        # sampled input gate inside coreness() rejects non-symmetric stores
        _state, eng = K.coreness(g, resume=args.resume,
                                 mode=args.mode or "dense", **common)
        t = _state.select_columns(["val"]).to_pandas()
        out["max_coreness"] = int(t["val"].max())
    elif args.kernel == "coloring":
        _state, eng = K.coloring(g)
    elif args.kernel == "gnn":
        _state, eng = K.gnn(g, layers=args.iters or 2)
    elif args.kernel == "randomwalk":
        ds = K.random_walk(g)
        print(json.dumps({"kernel": "randomwalk", "rows": ds.count()}))
        return
    elif args.kernel == "triangles":
        print(json.dumps({"kernel": "triangles", "triangles": K.triangle_count(g)}))
        return
    elif args.kernel == "mst":
        from .kernels.mst import boruvka

        labels, forest = boruvka(g)
        print(json.dumps({"kernel": "mst", "forest_edges": len(forest),
                          "components": int(labels["label"].nunique())}))
        return
    elif args.kernel == "kcore":
        # --iters doubles as k (peel threshold; 0 is a valid k). The
        # sampled input gate inside kcore() rejects non-symmetric stores.
        k = args.iters if args.iters is not None else 2
        _state, eng = K.kcore(g, k, resume=args.resume, **common)
        t = _state.select_columns(["alive"]).to_pandas()
        out["k"] = k
        out["core_size"] = int(t["alive"].sum())
    elif args.kernel == "ppr":
        import numpy as _np

        # seeds: every 97th dense id (deterministic, same rule as the
        # corpus_ppr query); --source selects a single-seed run instead
        # (vertex 0 included — test the flag against None, not truthiness)
        seeds = (_np.array([args.source]) if args.source is not None
                 else _np.arange(0, g.num_vertices, 97))
        # None-vs-0: --iters 0 is a valid zero-iteration run (matches the
        # kcore/--source handling), not a fall-through to the default
        _state, eng = K.ppr(g, seeds,
                            iters=args.iters if args.iters is not None else 10,
                            resume=args.resume, **common)
    elif args.kernel == "hits":
        lift_root = os.path.join(args.graph, "hits_lift")
        _state, eng, _V = K.hits(
            g, lift_root,
            iters=args.iters if args.iters is not None else 5,
            resume=args.resume, **common)
    elif args.kernel == "scc":
        from .kernels.scc import scc as scc_run

        labels, info = scc_run(g)
        n_comp = labels.select_columns(["scc"]).groupby("scc").count().count()
        print(json.dumps({"kernel": "scc", "components": int(n_comp),
                          **info}))
        return
    elif args.kernel == "betweenness":
        from .kernels.betweenness import betweenness

        # --iters = pivot count (default 6)
        piv = args.iters if args.iters is not None else 6
        bc, info = betweenness(g, piv)
        out["pivots"] = piv
        out["depths"] = info["depths"]
        out["supersteps"] = info["supersteps"]
        out["rows"] = bc.count()
        print(json.dumps(out))
        return
    elif args.kernel == "harmonic":
        from .kernels.harmonic import harmonic

        piv = args.iters if args.iters is not None else 8
        h = harmonic(g, piv)
        print(json.dumps({"kernel": "harmonic", "pivots": piv,
                          "rows": h.count()}))
        return
    elif args.kernel == "diameter":
        from .kernels.sssp import INF as _INF

        state1, _e = K.sssp(g, source=args.source or 0)
        t = state1.select_columns(["v", "val"]).to_pandas()
        fin = t[t["val"] < int(_INF)]
        far = int(fin.sort_values(["val", "v"],
                                  ascending=[False, True]).iloc[0]["v"])
        state2, _e2 = K.sssp(g, source=far)
        t2 = state2.select_columns(["val"]).to_pandas()
        ecc = int(t2[t2["val"] < int(_INF)]["val"].max())
        print(json.dumps({"kernel": "diameter", "far": far,
                          "diameter_lb": ecc}))
        return
    else:  # pragma: no cover
        raise SystemExit(f"unknown kernel {args.kernel}")
    out["supersteps"] = len(eng.metrics)
    out["metrics_tail"] = [m.__dict__ for m in eng.metrics[-3:]]
    print(json.dumps(out, default=float))


def cmd_ingest_csv(args) -> None:
    """CSV edge list -> partitioned graph — the reference's primary
    converter entry point (graph_convertor_exec, graph_converter.cpp:
    329-369), flags mirrored: -i/-o/-sep/-read_head/-n_edges/
    -not_reorder_vertices."""
    _ensure_ray()
    from . import ingest

    from . import graph as G

    g = ingest.graph_from_csv(
        args.i, args.out, sep=args.sep, header=args.read_head,
        n_edges=args.n_edges, num_parts=args.parts,
        reorder=not args.not_reorder_vertices)
    dirs = ["fwd"]
    # reference store_strategy: outgoing = out-edge CSRs only (our fwd),
    # incoming = in-edge CSRs ONLY (rev; the fwd build intermediate is
    # removed), unconstrained = both on disk
    if args.store_strategy in ("incoming", "unconstrained"):
        G.derive_direction(g, "rev")
        dirs.append("rev")
    if args.store_strategy == "incoming":
        import os
        import shutil

        shutil.rmtree(os.path.join(args.out, "fwd"), ignore_errors=True)
        os.remove(os.path.join(args.out, "meta_fwd.json"))
        dirs = ["rev"]
    print(json.dumps({"graph": args.out, "num_vertices": g.num_vertices,
                      "num_edges": g.num_edges, "parts": g.num_parts,
                      "reordered": not args.not_reorder_vertices,
                      "directions": dirs}))


def cmd_convert(args) -> None:
    """Write block-binary payloads (the reference's S8 Pram block format,
    blockbin.py) beside every partition's parquet; idempotent."""
    _ensure_ray()
    from . import blockbin, graph as G

    g = G.Graph.load(args.root, args.direction)
    metas = blockbin.convert_graph(g)
    print(json.dumps({
        "root": args.root, "direction": args.direction,
        "parts": len(metas),
        "num_edges": sum(m["num_edges"] for m in metas.values()),
        "edge_dtype": sorted({m["edge_dtype"] for m in metas.values()}),
    }))


def cmd_check(args) -> None:
    """planar_check parity (reference planar/planar_check.cpp): validate
    a graph root's manifests + per-partition payloads; exit 1 on errors."""
    from .inspect_tools import check_graph

    rep = check_graph(args.root, args.direction)
    if args.verbose:
        print(json.dumps(rep, indent=1))
    else:
        slim = {d: {"num_vertices": v["num_vertices"],
                    "num_edges": v["num_edges"],
                    "num_parts": v["num_parts"],
                    "max_degree": max((p["max_degree"] for p in v["parts"]),
                                      default=0)}
                for d, v in rep["directions"].items()}
        print(json.dumps({"root": rep["root"], "ok": rep["ok"],
                          "directions": slim, "errors": rep["errors"]}))
    if not rep["ok"]:
        sys.exit(1)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="planar_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="corpus -> partitioned graph")
    pi.add_argument("--spec", choices=("tiny", "small", "bench"), default="small")
    pi.add_argument("--out", required=True)
    pi.add_argument("--parts", type=int, default=8)
    pi.add_argument("--relabel", choices=("none", "bfs"), default="none",
                    help="bfs: rename vertices to BFS visit rank so range "
                         "partitioning becomes locality-aware (S13)")
    pi.set_defaults(fn=cmd_ingest)

    px = sub.add_parser("ingest-csv",
                        help="CSV edge list -> partitioned graph "
                             "(reference graph_convertor_exec)")
    px.add_argument("--i", required=True, help="input csv file/dir")
    px.add_argument("--out", required=True)
    px.add_argument("--sep", default=",")
    px.add_argument("--read-head", action="store_true",
                    help="first line is a header")
    px.add_argument("--n-edges", type=int, default=None,
                    help="read at most N edges (big-graph variant)")
    px.add_argument("--parts", type=int, default=8)
    px.add_argument("--not-reorder-vertices", action="store_true",
                    help="keep raw vertex ids (holes stay holes)")
    px.add_argument("--store-strategy", default="outgoing",
                    choices=("outgoing", "incoming", "unconstrained"),
                    help="which edge direction(s) to store as CSRs")
    px.set_defaults(fn=cmd_ingest_csv)

    pr = sub.add_parser("run", help="run a kernel on a built graph")
    pr.add_argument("--kernel", choices=KERNELS, required=True)
    pr.add_argument("--graph", required=True)
    pr.add_argument("--run-dir", default=None)
    pr.add_argument("--checkpoint-every", type=int, default=0)
    pr.add_argument("--resume", action="store_true")
    pr.add_argument("--iters", type=int, default=None)
    # None = unset: sssp falls back to vertex 0, ppr to the multi-seed
    # default (so `--source 0` still means "single seed at vertex 0")
    pr.add_argument("--source", type=int, default=None)
    pr.add_argument("--mode", choices=("dense", "delta"), default=None,
                    help="coreness only: dense rescatter (default) or "
                         "delta messaging over the edge-aligned cache")
    pr.set_defaults(fn=cmd_run)

    pk = sub.add_parser("kernels", help="list kernels")
    pk.set_defaults(fn=lambda a: print("\n".join(KERNELS)))

    pv = sub.add_parser("convert",
                        help="write S8 block-binary payloads beside parquet")
    pv.add_argument("root")
    pv.add_argument("--direction", default="fwd")
    pv.set_defaults(fn=cmd_convert)

    pc = sub.add_parser("check", help="validate on-disk graph partitions")
    pc.add_argument("root")
    pc.add_argument("--direction", default=None)
    pc.add_argument("--verbose", action="store_true")
    pc.set_defaults(fn=cmd_check)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
