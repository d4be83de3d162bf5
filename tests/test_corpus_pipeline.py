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