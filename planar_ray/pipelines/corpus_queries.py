"""Rows-only queries running the engine on its OWN input — the synthetic
source-code corpus (the BASELINE.json input_hint schema). No SQL oracle
(the corpus is not a registered view); correctness is covered by the
pytest oracles (tests/test_corpus_pipeline.py) — the driver records the
rows-only check and the judge sees which.

The corpus scale is fixed (SMALL: 64 repos / ~5k files) regardless of
``sf_dir`` so results are deterministic; the graph is built once into the
cache directory and reused across queries.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .. import corpus as C
from .. import graph as G
from .. import ingest
from ..joins import hash_bucket_join
from ..kernels import coloring, gnn, lpa, pagerank, random_walk, triangle_count, wcc
from ..kernels.gnn import FDIM

SPEC = C.SMALL


def _root() -> str:
    return os.path.join(C.default_cache_dir(), "corpus_graph", SPEC.tag)


def _build() -> tuple[G.Graph, "object"]:
    import ray.data as rd

    root = _root()
    dict_dir = os.path.join(root, "vertices")
    if os.path.exists(os.path.join(root, "meta_fwd.json")):
        return G.Graph.load(root, "fwd"), rd.read_parquet(dict_dir)
    cdir = C.write_corpus(SPEC)
    ds = rd.read_parquet(cdir)
    files = ingest.extract_files(ds, concurrency=4)
    edges = ingest.build_edges(files, num_partitions=8)
    g, vdict = G.build_graph(edges, root, num_parts=8)
    return g, vdict


def _with_keys(state, vdict, cols):
    ranks = state.select_columns(["v"] + cols)
    keyed = hash_bucket_join(ranks, vdict.select_columns(["key", "v"]),
                             left_on="v", right_on="v")
    return keyed.to_pandas()


def q_corpus_edges(sf_dir: str) -> pa.Table:
    g, _ = _build()
    df = g.edges_dataset().to_pandas().sort_values(["src", "dst"])
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def q_corpus_pagerank(sf_dir: str) -> pa.Table:
    g, vdict = _build()
    state, _eng = pagerank(g, max_supersteps=100)
    df = _with_keys(state, vdict, ["val"])
    return pa.table(
        {
            "node_key": pa.array(df["key"]),
            "score": pa.array(np.round(df["val"].to_numpy(), 9)),
        }
    )


def q_corpus_wcc(sf_dir: str) -> pa.Table:
    g, vdict = _build()
    state, _eng = wcc(g)
    df = _with_keys(state, vdict, ["val"])
    return pa.table(
        {
            "node_key": pa.array(df["key"]),
            "component": pa.array(df["val"].to_numpy().astype(np.int64)),
        }
    )


def q_corpus_lpa(sf_dir: str) -> pa.Table:
    g, vdict = _build()
    state, _eng = lpa(g, max_iters=8)
    df = _with_keys(state, vdict, ["val"])
    return pa.table(
        {
            "node_key": pa.array(df["key"]),
            "label": pa.array(df["val"].to_numpy().astype(np.int64)),
        }
    )


def q_corpus_triangles(sf_dir: str) -> pa.Table:
    g, _ = _build()
    return pa.table({"triangles": pa.array([triangle_count(g)], pa.int64())})


def q_corpus_coloring(sf_dir: str) -> pa.Table:
    g, vdict = _build()
    state, _eng = coloring(g)
    df = _with_keys(state, vdict, ["val"])
    return pa.table(
        {
            "node_key": pa.array(df["key"]),
            "color": pa.array(df["val"].to_numpy().astype(np.int64)),
        }
    )


def q_corpus_randomwalk(sf_dir: str) -> pa.Table:
    g, _ = _build()
    out = random_walk(g).to_pandas().sort_values("origin")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def q_corpus_gnn(sf_dir: str) -> pa.Table:
    g, vdict = _build()
    state, _eng = gnn(g, layers=2)
    cols = [f"f{j}" for j in range(FDIM)]
    df = _with_keys(state, vdict, cols)
    data = {"node_key": pa.array(df["key"])}
    for c in cols:
        data[c] = pa.array(np.round(df[c].to_numpy(), 9))
    return pa.table(data)


def q_corpus_mst(sf_dir: str) -> pa.Table:
    g, _ = _build()
    _labels, fedges = __import__(
        "planar_ray.kernels", fromlist=["boruvka"]).boruvka(g)
    return pa.Table.from_pandas(fedges, preserve_index=False)


def q_corpus_sssp(sf_dir: str) -> pa.Table:
    from ..kernels import sssp
    from ..kernels.sssp import INF

    g, vdict = _build()
    # undirected hop distances (sym direction) so the result covers the
    # whole component of vertex 0, not just its directed out-cone
    from ..graph import derive_direction

    derive_direction(g, "sym")
    state, _eng = sssp(g, source=0, max_supersteps=50, direction="sym")
    df = _with_keys(state, vdict, ["val"])
    df = df[df["val"] < int(INF)]
    return pa.table(
        {
            "node_key": pa.array(df["key"]),
            "dist": pa.array(df["val"].to_numpy().astype(np.int64)),
        }
    )


def q_corpus_wcc_precomp(sf_dir: str) -> pa.Table:
    from ..kernels import wcc_precomputed

    g, vdict = _build()
    state, _eng = wcc_precomputed(g)
    df = _with_keys(state, vdict, ["val"])
    return pa.table(
        {
            "node_key": pa.array(df["key"]),
            "component": pa.array(df["val"].to_numpy().astype(np.int64)),
        }
    )


def q_corpus_kcore(sf_dir: str) -> pa.Table:
    """k-core of the symmetrised import graph (k=3): the sym-dedup
    variant is built once into the cache via graph.sym_dedup_edges."""
    from ..graph import partition_edges, sym_dedup_edges
    from ..kernels import kcore

    g, vdict = _build()
    sym_root = _root() + "_sym"
    gsym = None
    if os.path.exists(os.path.join(sym_root, "meta_fwd.json")):
        cand = G.Graph.load(sym_root, "fwd")
        # validate the cache against the CURRENT base graph (same
        # guard as hits.lift_graph): num_vertices must match and the
        # sidecar must record the base store it was derived from
        from ..util import read_json

        side = os.path.join(sym_root, "base_meta.json")
        base = read_json(side) if os.path.exists(side) else {}
        if (cand.num_vertices == g.num_vertices
                and base.get("num_edges") == g.num_edges):
            gsym = cand
    if gsym is None:
        import shutil

        shutil.rmtree(sym_root, ignore_errors=True)
        gsym = partition_edges(sym_dedup_edges(g.edges_dataset()), sym_root,
                               g.num_vertices, g.num_parts, "fwd")
        from ..util import write_json_atomic

        write_json_atomic(os.path.join(sym_root, "base_meta.json"),
                          {"num_vertices": g.num_vertices,
                           "num_edges": g.num_edges})
    state, _eng = kcore(gsym, 3)
    df = _with_keys(state, vdict, ["val", "alive"])
    alive = df["alive"].to_numpy().astype(np.int64)
    return pa.table({
        "node_key": pa.array(df["key"]),
        "in_core": pa.array(alive),
        "coredeg": pa.array(np.where(alive == 1, df["val"].to_numpy(), 0.0)
                            .astype(np.int64)),
    })


def q_corpus_ppr(sf_dir: str) -> pa.Table:
    """Personalized PageRank from every 97th dense id (deterministic)."""
    from ..kernels import ppr

    g, vdict = _build()
    state, _eng = ppr(g, np.arange(0, g.num_vertices, 97), iters=10)
    df = _with_keys(state, vdict, ["val"])
    return pa.table({
        "node_key": pa.array(df["key"]),
        "score": pa.array(np.round(df["val"].to_numpy(), 9)),
    })


def q_corpus_hits(sf_dir: str) -> pa.Table:
    """HITS hubs/authorities over the import graph (bipartite lift)."""
    from ..kernels import hits
    from ..kernels.hits import hits_scores_dataset

    g, vdict = _build()
    state, _eng, V = hits(g, _root() + "_hits_lift", iters=5)
    scores = hits_scores_dataset(state, V)  # no dense driver arrays
    df = hash_bucket_join(scores, vdict.select_columns(["key", "v"]),
                          left_on="v", right_on="v").to_pandas()
    return pa.table({
        "node_key": pa.array(df["key"]),
        "hub": pa.array(np.round(df["hub"].to_numpy(), 9)),
        "auth": pa.array(np.round(df["auth"].to_numpy(), 9)),
    })


def q_corpus_scc(sf_dir: str) -> pa.Table:
    """SCC labels of the directed import graph (coloring-algorithm
    kernel pair; rows-only — pytest pins parity vs the matrix-closure
    oracle on the materialised edge list)."""
    from ..kernels.scc import scc as scc_run

    g, vdict = _build()
    labels, _info = scc_run(g)
    df = hash_bucket_join(labels, vdict.select_columns(["key", "v"]),
                          left_on="v", right_on="v").to_pandas()
    df = df.sort_values("key").reset_index(drop=True)
    return pa.table({
        "node_key": pa.array(df["key"]),
        "scc": pa.array(df["scc"].to_numpy().astype(np.int64)),
    })


def q_corpus_betweenness(sf_dir: str) -> pa.Table:
    """Sampled Brandes betweenness from the 6 smallest dense ids."""
    from ..kernels.betweenness import betweenness

    g, vdict = _build()
    bc, _info = betweenness(g, 6)
    df = hash_bucket_join(bc, vdict.select_columns(["key", "v"]),
                          left_on="v", right_on="v").to_pandas()
    df = df.sort_values("key").reset_index(drop=True)
    return pa.table({
        "node_key": pa.array(df["key"]),
        "bc": pa.array(np.round(df["bc"].to_numpy(), 6)),
    })


QUERIES = {
    "corpus_edges": q_corpus_edges,
    "corpus_pagerank": q_corpus_pagerank,
    "corpus_wcc": q_corpus_wcc,
    "corpus_lpa": q_corpus_lpa,
    "corpus_triangles": q_corpus_triangles,
    "corpus_coloring": q_corpus_coloring,
    "corpus_randomwalk": q_corpus_randomwalk,
    "corpus_gnn": q_corpus_gnn,
    "corpus_mst": q_corpus_mst,
    "corpus_sssp": q_corpus_sssp,
    "corpus_wcc_precomp": q_corpus_wcc_precomp,
    "corpus_kcore": q_corpus_kcore,
    "corpus_ppr": q_corpus_ppr,
    "corpus_hits": q_corpus_hits,
    "corpus_scc": q_corpus_scc,
    "corpus_betweenness": q_corpus_betweenness,
}
