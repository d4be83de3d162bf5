"""Round-2 additions: seeded WCC (A10), distributed Jaccard verify,
in-partition dedup equivalence, join int64 precision."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from planar_ray import graph as G
from tests.test_kernels import CASES, make_graph

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", ["two_cliques", "tri_tail"])
def test_wcc_precomputed_matches_plain(name, tmp_root):
    from planar_ray.kernels import wcc, wcc_precomputed

    edges, n = CASES[name]
    g = make_graph(edges, f"{tmp_root}/wccp_{name}")
    s1, e1 = wcc(g)
    s2, e2 = wcc_precomputed(g)
    l1 = s1.to_pandas().sort_values("v")["val"].to_numpy()
    l2 = s2.to_pandas().sort_values("v")["val"].to_numpy()
    assert (l1 == l2).all()
    # hop-extrema seeding starts every vertex 2 hops ahead
    assert len(e2.metrics) <= len(e1.metrics)


@pytest.mark.parametrize("name", ["two_cliques", "tri_tail", "star"])
def test_wcc_contraction_matches_plain(name, tmp_root):
    """Supervertex contraction reaches the identical min-label fixpoint."""
    from planar_ray.kernels import wcc

    edges, n = CASES[name]
    g = make_graph(edges, f"{tmp_root}/wccc_{name}")
    s1, _e1 = wcc(g)
    s2, e2 = wcc(g, contract_every=2)
    l1 = s1.to_pandas().sort_values("v")["val"].to_numpy()
    l2 = s2.to_pandas().sort_values("v")["val"].to_numpy()
    assert (l1 == l2).all()
    # contraction never grows the live edge set
    sizes = [e for _p, e in e2.contract_log]
    assert sizes == sorted(sizes, reverse=True)


def test_pair_jaccards_matches_local_sets():
    """Distributed verify == local set-based Jaccard on the same pairs."""
    import re

    from planar_ray.pipelines.docs import (
        TOKEN_RE,
        _batch_shingles,
        lsh_candidate_pairs,
        pair_jaccards,
    )

    cand = lsh_candidate_pairs(SF).materialize()
    got = pair_jaccards(SF, cand).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(got) == cand.count()

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tok_re = re.compile(TOKEN_RE)
    need = set(got["doc_a"]) | set(got["doc_b"])
    sets = {}
    for d, s in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        if d in need:
            _c, flat = _batch_shingles([s], tok_re)
            sets[d] = set(flat.astype(np.int64).tolist())
    for row in got.itertuples():
        sa, sb = sets[row.doc_a], sets[row.doc_b]
        union = len(sa | sb)
        want = round(len(sa & sb) / union, 6) if union else 0.0
        assert abs(row.jaccard - want) < 1e-9, (row.doc_a, row.doc_b)


def test_partition_dedup_in_parts_equivalence(tmp_root):
    """Duplicated edge rows collapse exactly to the distinct edge set."""
    rng = np.random.default_rng(5)
    src = rng.integers(0, 50, 2000)
    dst = rng.integers(0, 50, 2000)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = rd.from_arrow(pa.table({"src": src.astype("int64"),
                                 "dst": dst.astype("int64")}))
    g = G.graph_from_id_edges(ds, f"{tmp_root}/dedup_eq", num_vertices=50,
                              num_parts=3, dedup=True)
    want = {(int(a), int(b)) for a, b in zip(src, dst)}
    assert g.num_edges == len(want)
    got = set()
    for p in range(g.num_parts):
        csr = g.load_csr(p)
        for v in range(csr.begin, csr.end):
            for w in csr.indices[csr.indptr[v - csr.begin]:csr.indptr[v - csr.begin + 1]]:
                got.add((v, int(w)))
    assert got == want


def test_bfs_partitioner_and_relabel(tmp_root):
    """S13: BFS order is a permutation, improves (or ties) the edge cut,
    and relabelled-graph WCC labels map back to the plain labels."""
    from planar_ray.kernels import wcc
    from planar_ray.partition_quality import (
        bfs_assign,
        bfs_order,
        edge_cut_fraction,
        hash_assign,
        relabel_graph,
    )

    edges, n = CASES["two_cliques"]
    g = make_graph(edges, f"{tmp_root}/pq_two")
    rank = bfs_order(g)
    assert sorted(rank.tolist()) == list(range(n))
    e = g.edges_dataset().materialize()
    cut_bfs = edge_cut_fraction(e, bfs_assign(g, g.num_parts))
    cut_hash = edge_cut_fraction(e, hash_assign(g.num_parts))
    assert cut_bfs <= cut_hash + 1e-9
    g2 = relabel_graph(g, rank, f"{tmp_root}/pq_two_bfs")
    s1, _ = wcc(g)
    s2, _ = wcc(g2)
    l1 = s1.to_pandas().sort_values("v")["val"].to_numpy()
    l2 = s2.to_pandas().sort_values("v")["val"].to_numpy()
    # map the relabelled labels back: component SETS must be identical
    import numpy as np

    inv = np.empty(n, dtype=np.int64)
    inv[rank] = np.arange(n)
    back = inv[l2[rank]]  # label of old-id v, expressed as an old id
    groups1 = {}
    groups2 = {}
    for v in range(n):
        groups1.setdefault(int(l1[v]), set()).add(v)
        groups2.setdefault(int(back[v]), set()).add(v)
    assert sorted(map(sorted, groups1.values())) == sorted(map(sorted, groups2.values()))


def test_grid_blocks_cover_all_edges(tmp_root):
    """S14: every edge lands in exactly one (src_part, dst_part) block."""
    from planar_ray.partition_quality import grid_blocks

    edges, n = CASES["two_cliques"]
    g = make_graph(edges, f"{tmp_root}/grid_two")
    e = g.edges_dataset().materialize()
    gb = grid_blocks(e, 2).materialize()
    assert gb.count() == e.count()
    blocks = gb.to_pandas()["block"].unique()
    assert set(blocks).issubset(set(range(4)))


def test_scale_plan_equals_broadcast_plan(tmp_root):
    """The >threshold join/shuffle plans (what a 100 TB run would use)
    must produce bit-identical results to the broadcast fast paths."""
    from planar_ray.kernels import boruvka, random_walk
    from planar_ray.kernels.triangle import triangle_count

    edges, n = CASES["two_cliques"]
    g = make_graph(edges, f"{tmp_root}/scale_two")

    lb, fb = boruvka(g)  # broadcast plan
    lj, fj = boruvka(g, broadcast_threshold=0)  # join plan
    assert fb.equals(fj)
    assert (lb.sort_values("v")["label"].to_numpy()
            == lj.sort_values("v")["label"].to_numpy()).all()

    rb = random_walk(g).to_pandas().sort_values("origin")
    rj = random_walk(g, broadcast_threshold=0).to_pandas().sort_values("origin")
    assert (rb["final_v"].to_numpy() == rj["final_v"].to_numpy()).all()

    tb = triangle_count(g)  # broadcast plan
    tj = triangle_count(g, broadcast_threshold=0)  # join plan
    assert tb == tj


def test_hop_seeds_join_plan_matches_broadcast(tmp_root):
    from planar_ray.kernels import hop_extrema_seeds

    edges, n = CASES["tri_tail"]
    g = make_graph(edges, f"{tmp_root}/seeds_tt")
    b = hop_extrema_seeds(g).to_pandas().sort_values("v").reset_index(drop=True)
    j = hop_extrema_seeds(g, broadcast_threshold=0).to_pandas().sort_values(
        "v").reset_index(drop=True)
    assert b.equals(j)


def test_mm_frame_sample_and_resize():
    from planar_ray.pipelines.multimodal import (
        FRAME_STRIDE,
        q_mm_frame_sample,
        q_mm_resize,
    )

    fs = q_mm_frame_sample(SF).to_pandas()
    assert set(fs.columns) == {"doc_id", "frame_idx", "feature"}
    assert (fs["frame_idx"] % FRAME_STRIDE == 0).all()
    assert fs["doc_id"].nunique() == 500
    rz = q_mm_resize(SF).to_pandas()
    assert len(rz) == 500
    assert (rz["n_bytes"] == 8).all()  # HIST_BINS // 2 bytes per payload


def test_hash_bucket_join_preserves_big_int64():
    """Join keys above 2^53 must survive exactly (no float64 transit)."""
    from planar_ray.joins import hash_bucket_join

    base = (1 << 60) + 12345
    ks = [base + i * 7 for i in range(100)]
    left = rd.from_arrow(pa.table({"k": pa.array(ks, pa.int64()),
                                   "x": pa.array(list(range(100)), pa.int64())}))
    right = rd.from_arrow(pa.table({"kk": pa.array(ks, pa.int64()),
                                    "y": pa.array([i * 3 for i in range(100)],
                                                  pa.int64())}))
    out = hash_bucket_join(left, right, left_on="k", right_on="kk",
                           buckets=8).to_pandas().sort_values("x")
    assert len(out) == 100
    assert (out["k"].to_numpy() == np.array(ks)[out["x"].to_numpy()]).all()
    assert (out["y"].to_numpy() == out["x"].to_numpy() * 3).all()
