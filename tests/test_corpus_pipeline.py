"""End-to-end corpus pipeline parity: corpus -> edges -> graph -> kernels
vs in-process NumPy oracles (the north-rule per-vertex checks), on TINY.
"""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from planar_ray import corpus, graph as G, ingest
from planar_ray.kernels import pagerank, wcc
from tests.test_kernels import pagerank_oracle, wcc_oracle


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_e2e"))
    ds = rd.from_arrow(corpus.corpus_table(corpus.TINY)).repartition(4)
    files = ingest.extract_files(ds, concurrency=2)
    edges = ingest.build_edges(files, num_partitions=4)
    g, vdict = G.build_graph(edges, root, num_parts=4)
    vd = vdict.to_pandas().sort_values("v")
    eids = g.edges_dataset().to_pandas()
    return g, vd, eids.to_numpy(dtype=np.int64)


def test_graph_matches_oracle_edges(built):
    g, vd, eids = built
    # reconstruct the oracle edge set in id space via the dictionary
    key2id = dict(zip(vd["key"], vd["v"]))
    oracle = ingest.oracle_edges(corpus.corpus_table(corpus.TINY))
    want = {(key2id[s], key2id[d]) for s, d, _k in oracle if s != d}
    got = {(int(a), int(b)) for a, b in eids}
    assert got == want
    assert g.num_edges == len(want)


def test_corpus_pagerank_parity(built):
    g, vd, eids = built
    state, _ = pagerank(g, max_supersteps=300)
    df = state.to_pandas().sort_values("v")
    want = pagerank_oracle(eids, g.num_vertices)
    assert np.allclose(df["val"].to_numpy(), want[df["v"].to_numpy()], atol=1e-6)


def test_corpus_wcc_parity(built):
    g, vd, eids = built
    state, _ = wcc(g)
    df = state.to_pandas().sort_values("v")
    want = wcc_oracle(eids, g.num_vertices)
    assert (df["val"].to_numpy() == want[df["v"].to_numpy()]).all()


def test_determinism_across_parallelism(built, tmp_path_factory):
    """Same corpus, different partition count -> identical ids and ranks."""
    g, vd, _ = built
    root2 = str(tmp_path_factory.mktemp("corpus_e2e_p2"))
    ds = rd.from_arrow(corpus.corpus_table(corpus.TINY)).repartition(2)
    files = ingest.extract_files(ds, concurrency=1)
    edges = ingest.build_edges(files, num_partitions=2)
    g2, vdict2 = G.build_graph(edges, root2, num_parts=2)
    vd2 = vdict2.to_pandas().sort_values("v")
    assert list(vd["key"]) == list(vd2["key"])  # identical id assignment
    s1, _ = pagerank(g, max_supersteps=300)
    s2, _ = pagerank(g2, max_supersteps=300)
    a = s1.to_pandas().sort_values("v")["val"].to_numpy()
    b = s2.to_pandas().sort_values("v")["val"].to_numpy()
    assert np.allclose(a, b, atol=1e-9)

# ---------------------------------------------------------------------------
# Golden self-checks for the rows-only corpus_* driver queries: the
# corpus is deterministic (SMALL spec), so row counts + canonical value
# hashes are frozen here — a regression in any corpus pipeline fails
# pytest instead of slipping through the (oracle-less) driver rows.
# Regenerate by running the queries and copying the printed dict ONLY
# when a semantic change is intended and reviewed.
# ---------------------------------------------------------------------------

CORPUS_GOLDENS = {
    "corpus_edges": (16545, "4003b897b39affd1"),
    "corpus_pagerank": (5056, "9967329788c86d78"),
    "corpus_wcc": (5056, "06eae781d7fcb7f8"),
    "corpus_lpa": (5056, "c2829956102312d3"),
    "corpus_triangles": (1, "3fcb4371c23b7246"),
    "corpus_coloring": (5056, "58c2c2d1f2f8e187"),
    "corpus_randomwalk": (5056, "e58cc0bad24c6ffc"),
    "corpus_gnn": (5056, "da87fae3d44e3140"),
    "corpus_mst": (5055, "0ab58e24dd0b96f2"),
    "corpus_sssp": (5056, "75b49ba4aafb1a18"),
    "corpus_wcc_precomp": (5056, "06eae781d7fcb7f8"),
    "corpus_kcore": (5056, "41f81c6a5c604d18"),
    "corpus_ppr": (5056, "d0782ba6b549354e"),
    "corpus_hits": (5056, "91dad0082079b7b4"),
    # round 5 (values independently parity-checked against the
    # matrix-closure / Brandes numpy oracles in test_round5)
    "corpus_scc": (5056, "adb1246b889cb453"),
    "corpus_betweenness": (5056, "003af54003ea7081"),
}


def _canon_hash(tab):
    import hashlib

    import pandas as pd

    df = tab.to_pandas() if not isinstance(tab, pd.DataFrame) else tab
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return len(df), hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()[:16]


def test_corpus_query_goldens():
    from planar_ray.pipelines import corpus_queries as cq

    assert set(CORPUS_GOLDENS) == set(cq.QUERIES)
    fails = {}
    for name, fn in cq.QUERIES.items():
        got = _canon_hash(fn(""))
        if got != CORPUS_GOLDENS[name]:
            fails[name] = (got, CORPUS_GOLDENS[name])
    assert not fails, fails
