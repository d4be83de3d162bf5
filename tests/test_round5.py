"""Round-5 fixes: ADVICE items — spread-sampled kcore symmetry gate,
validated HITS lift cache, hits_scores zero-mass guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_symmetry_gate_catches_tail_asymmetry(tmp_root):
    """A store whose LOW-id edges are all reciprocated but whose tail
    holds a reverse-less edge must fail the gate (the old head-sample
    inspected only partition 0's lowest-id corner)."""
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.kcore import assert_symmetric_sample

    V = 1000
    rng = np.random.default_rng(7)
    a = rng.integers(0, 120, 600)
    b = rng.integers(0, 120, 600)
    keep = a != b
    pairs = np.unique(np.stack([np.minimum(a[keep], b[keep]),
                                np.maximum(a[keep], b[keep])], 1), axis=0)
    sym = np.concatenate([pairs, pairs[:, ::-1]])
    # one directed tail edge with NO reverse, far from the head
    bad = np.array([[900, 950]])
    edges = np.concatenate([sym, bad])
    ds = rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]}))
    g = partition_edges(ds, f"{tmp_root}/tail_asym", V, num_parts=3,
                        direction="fwd")
    with pytest.raises(ValueError, match="not symmetric"):
        assert_symmetric_sample(g)


def test_symmetry_gate_passes_symmetric_store(tmp_root):
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.kcore import assert_symmetric_sample

    V = 500
    rng = np.random.default_rng(9)
    a = rng.integers(0, V, 1500)
    b = rng.integers(0, V, 1500)
    keep = a != b
    pairs = np.unique(np.stack([np.minimum(a[keep], b[keep]),
                                np.maximum(a[keep], b[keep])], 1), axis=0)
    sym = np.concatenate([pairs, pairs[:, ::-1]])
    ds = rd.from_arrow(pa.table({"src": sym[:, 0], "dst": sym[:, 1]}))
    g = partition_edges(ds, f"{tmp_root}/tail_sym_ok", V, num_parts=4,
                        direction="fwd")
    assert_symmetric_sample(g)  # must not raise


def test_stale_hits_lift_cache_rebuilt(tmp_root):
    """Rebuilding the base graph in place must invalidate the cached
    bipartite lift (validated on 2V/2E, not mere existence)."""
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.hits import hits, hits_oracle, hits_scores

    V = 60
    root = f"{tmp_root}/hits_stale_base"
    lift = f"{tmp_root}/hits_stale_lift"

    def build(edges):
        ds = rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]}))
        return partition_edges(ds, root, V, num_parts=2, direction="fwd")

    rng = np.random.default_rng(3)
    e1 = np.unique(np.stack([rng.integers(0, V, 150),
                             rng.integers(0, V, 150)], 1), axis=0)
    e1 = e1[e1[:, 0] != e1[:, 1]]
    g1 = build(e1)
    state, _e, _V = hits(g1, lift, iters=3)
    hub, auth = hits_scores(state, V)

    # rebuild IN PLACE with a different (smaller) edge set
    e2 = e1[: len(e1) // 2]
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    g2 = build(e2)
    state2, _e2, _V2 = hits(g2, lift, iters=3)
    hub2, auth2 = hits_scores(state2, V)
    ohub, oauth = hits_oracle(e2, V, iters=3)
    keep = ~np.isnan(ohub)
    np.testing.assert_allclose(hub2, ohub, atol=1e-9)
    np.testing.assert_allclose(auth2, oauth, atol=1e-9)
    # and the stale scores genuinely differ (the cache WAS the hazard)
    assert not np.allclose(hub, hub2)


def test_hits_scores_zero_mass_raises():
    import ray.data as rd

    from planar_ray.kernels.hits import hits_scores

    V = 4
    # hub half has mass, auth half (v >= V) is all zero
    tab = pa.table({
        "v": np.arange(2 * V, dtype=np.int64),
        "val": np.concatenate([np.ones(V), np.zeros(V)]),
    })
    with pytest.raises(ValueError, match="zero L1 mass"):
        hits_scores(rd.from_arrow(tab), V)


# ---------------------------------------------------------------------------
# pure-numpy codecs (round 5: decode_image stub replaced)
# ---------------------------------------------------------------------------

def test_ppm_roundtrip_and_comments():
    from planar_ray.codecs import decode_ppm, encode_ppm

    rng = np.random.default_rng(5)
    for h, w in [(1, 1), (6, 9), (13, 7)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # header with comments + multi-whitespace (netpbm spec)
    img = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    payload = b"P6\n# a comment\n 3  2 # trailing\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(payload), img)


def test_bmp_roundtrip_padding_and_topdown():
    from planar_ray.codecs import decode_bmp, encode_bmp

    rng = np.random.default_rng(6)
    # widths 4,5,6,7: exercise every row-padding remainder
    for w in [4, 5, 6, 7]:
        img = rng.integers(0, 256, (5, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    # top-down variant (negative height) decodes without the flip
    import struct

    img = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_bmp(img[::-1]))  # stored order = img rows
    payload[22:26] = struct.pack("<i", -3)
    assert np.array_equal(decode_bmp(bytes(payload)), img)


def test_wav_roundtrip_mono_stereo():
    from planar_ray.codecs import decode_wav, encode_wav

    rng = np.random.default_rng(7)
    for ch in [1, 2]:
        s = rng.integers(-32768, 32768, (211, ch)).astype(np.int16)
        out, rate = decode_wav(encode_wav(s, sample_rate=16000))
        assert rate == 16000
        assert np.array_equal(out, s)


def test_decode_image_dispatch_and_errors():
    from planar_ray.codecs import decode_image, encode_bmp, encode_ppm

    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    with pytest.raises(NotImplementedError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")
    with pytest.raises(ValueError, match="unrecognised"):
        decode_image(b"??nonsense")


def test_mm_decode_queries_match_duckdb():
    import duckdb

    from planar_ray.pipelines import multimodal as mm

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    for name in ("mm_decode", "mm_audio"):
        got = mm.QUERIES[name](sf).to_pandas()
        want = con.execute(mm.ORACLES[name]).df()
        assert len(got) == len(want)
        cols = sorted(got.columns)
        assert cols == sorted(want.columns)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        import pandas as pd

        pd.testing.assert_frame_equal(g, w, check_dtype=False)


# ---------------------------------------------------------------------------
# state-column harmonic + distributed hits_scores (VERDICT r4 item 5)
# ---------------------------------------------------------------------------

def test_harmonic_state_column_matches_dense_oracle(tmp_root):
    """kernels.harmonic (acc threaded via initial_state=) vs a dense
    numpy BFS oracle on a random directed graph."""
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.harmonic import harmonic

    V, E, PIV = 300, 1200, 6
    rng = np.random.default_rng(17)
    src = rng.integers(0, V, E)
    dst = rng.integers(0, V, E)
    keep = src != dst
    edges = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
    g = partition_edges(
        rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]})),
        f"{tmp_root}/harm_g", V, num_parts=3, direction="fwd")

    got = harmonic(g, PIV).to_pandas().sort_values("v")
    # dense oracle: BFS hop distances from each pivot (pivot order)
    import collections

    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[int(a)].append(int(b))
    want = np.zeros(V)
    for s in range(PIV):
        dist = {s: 0}
        q = collections.deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        for vtx, d in dist.items():
            if d > 0:
                want[vtx] += 1.0 / d
    np.testing.assert_allclose(
        got["harmonic"].to_numpy(), want, atol=1e-12)


def test_hits_scores_dataset_matches_dense(tmp_root):
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.hits import (hits, hits_scores,
                                         hits_scores_dataset)

    V = 120
    rng = np.random.default_rng(21)
    e = np.unique(np.stack([rng.integers(0, V, 400),
                            rng.integers(0, V, 400)], 1), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    g = partition_edges(
        rd.from_arrow(pa.table({"src": e[:, 0], "dst": e[:, 1]})),
        f"{tmp_root}/hsd_g", V, num_parts=2, direction="fwd")
    state, _eng, _V = hits(g, f"{tmp_root}/hsd_lift", iters=3)
    hub, auth = hits_scores(state, V)
    got = hits_scores_dataset(state, V).to_pandas().sort_values("v")
    assert len(got) == V
    np.testing.assert_allclose(got["hub"].to_numpy(), hub, atol=1e-12)
    np.testing.assert_allclose(got["auth"].to_numpy(), auth, atol=1e-12)


# ---------------------------------------------------------------------------
# PLANAR_GROUP_AUTO_P single-node CI coverage (VERDICT r4 item 7)
# ---------------------------------------------------------------------------

def test_auto_grouped_path_at_high_p(tmp_root, monkeypatch):
    """P > 32 with no explicit node_groups must take the AUTO-grouped
    wire (G = alive nodes = 1 locally -> one group table per source)
    and stay bit-identical to the flat wire."""
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.pagerank import PageRankKernel
    from planar_ray.superstep import Engine

    monkeypatch.delenv("PLANAR_NODE_GROUPS", raising=False)
    monkeypatch.delenv("PLANAR_GROUP_AUTO_P", raising=False)
    V, E = 4000, 16000
    rng = np.random.default_rng(33)
    e = np.stack([rng.integers(0, V, E), rng.integers(0, V, E)], 1)
    e = e[e[:, 0] != e[:, 1]]
    g = partition_edges(
        rd.from_arrow(pa.table({"src": e[:, 0], "dst": e[:, 1]})),
        f"{tmp_root}/autop_g", V, num_parts=40, direction="fwd")
    P = g.num_parts
    assert P > 32, f"need P>32 to trip the default AUTO_P gate, got {P}"

    def run(node_groups):
        eng = Engine(g, PageRankKernel(fixed_iters=10_000),
                     node_groups=node_groups, stats_every=100)
        if node_groups is None:
            assert eng._group_cuts == [0, P], \
                f"auto path expected single group, got {eng._group_cuts}"
        else:
            assert eng._group_cuts is None
        eng.init_state_direct()
        for s in range(5):
            eng.step_fused(s, with_stats=False)
        import ray

        tabs = [t for t in ray.get(list(eng._state_refs)) if len(t)]
        eng.close()
        t = pa.concat_tables(tabs)
        v = t["v"].to_numpy(zero_copy_only=False)
        val = t["val"].to_numpy(zero_copy_only=False)
        o = np.argsort(v)
        return v[o], val[o]

    v1, auto = run(None)
    v2, flat = run(P)
    assert np.array_equal(v1, v2)
    assert np.array_equal(auto, flat)  # bitwise


# ---------------------------------------------------------------------------
# blockbin golden byte layout (VERDICT r4 item 8)
# ---------------------------------------------------------------------------

def test_blockbin_golden_bytes(tmp_root):
    """The automated planar_check eyeball step: a tiny graph written
    through the normal pipeline must produce degree.bin / index.bin /
    edges.bin BYTE-FOR-BYTE equal to the hand-computed reference layout
    (uint32 degrees, int64 ceil(n/R)+1 sampled offsets, uint32 dsts)."""
    import struct

    import ray.data as rd

    from planar_ray import blockbin
    from planar_ray.graph import partition_edges

    edges = [(0, 1), (0, 2), (1, 3), (3, 0), (3, 4), (4, 0)]
    src = np.array([e[0] for e in edges], np.int64)
    dst = np.array([e[1] for e in edges], np.int64)
    g = partition_edges(
        rd.from_arrow(pa.table({"src": src, "dst": dst})),
        f"{tmp_root}/golden_g", 5, num_parts=1, direction="fwd")
    assert g.num_parts == 1
    blockbin.convert_graph(g, offset_ratio=2)
    bdir = f"{g.part_dir(0)}/blockbin"

    # hand-computed: degrees per vertex 0..4, indptr [0,2,3,3,5,6],
    # offset samples every R=2 rows + final (n=5 odd -> appended)
    golden_degree = struct.pack("<5I", 2, 1, 0, 2, 1)
    golden_index = struct.pack("<4q", 0, 3, 5, 6)
    golden_edges = struct.pack("<6I", 1, 2, 3, 0, 4, 0)
    assert open(f"{bdir}/degree.bin", "rb").read() == golden_degree
    assert open(f"{bdir}/index.bin", "rb").read() == golden_index
    assert open(f"{bdir}/edges.bin", "rb").read() == golden_edges

    # R | n variant: no duplicated final offset (exact layout)
    indptr = np.array([0, 1, 1, 3, 4], np.int64)  # n=4, R=2
    indices = np.array([3, 0, 1, 2], np.uint32)
    pdir = f"{tmp_root}/golden_even"
    import os

    os.makedirs(pdir, exist_ok=True)
    blockbin.write_block_bin(pdir, 0, 4, indptr, indices, offset_ratio=2)
    assert open(f"{pdir}/blockbin/index.bin", "rb").read() == \
        struct.pack("<3q", 0, 1, 4)
    b, e_, ip, ix = blockbin.read_block_bin(pdir)
    assert (b, e_) == (0, 4)
    assert np.array_equal(ip, indptr) and np.array_equal(ix, indices)


# ---------------------------------------------------------------------------
# SCC (round-5 kernel addition)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed,V,E", [(1, 60, 150), (2, 200, 700),
                                      (3, 150, 220)])
def test_scc_matches_matrix_closure(tmp_root, seed, V, E):
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.scc import scc, scc_oracle

    rng = np.random.default_rng(seed)
    e = np.stack([rng.integers(0, V, E), rng.integers(0, V, E)], 1)
    e = np.unique(e[e[:, 0] != e[:, 1]], axis=0)
    g = partition_edges(
        rd.from_arrow(pa.table({"src": e[:, 0], "dst": e[:, 1]})),
        f"{tmp_root}/scc_{seed}", V, num_parts=3, direction="fwd")
    labels, info = scc(g)
    t = labels.to_pandas().sort_values("v")
    got = t["scc"].to_numpy()
    want = scc_oracle(e, V)
    assert np.array_equal(got, want), \
        f"phase/supersteps={info}, first diff at " \
        f"{np.flatnonzero(got != want)[:5]}"
    assert (got >= 0).all()


def test_scc_structures(tmp_root):
    """Hand-built: a 3-cycle, a 2-cycle feeding a chain, an isolated
    vertex — exact expected labels."""
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.scc import scc

    # cycle {0,1,2}; 2-cycle {3,4} -> chain 5 -> 6; isolated 7 (via pad edge 8->7)
    edges = np.array([(0, 1), (1, 2), (2, 0),
                      (3, 4), (4, 3), (4, 5), (5, 6), (8, 7)])
    g = partition_edges(
        rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]})),
        f"{tmp_root}/scc_hand", 9, num_parts=2, direction="fwd")
    labels, _info = scc(g)
    t = labels.to_pandas().sort_values("v")
    got = dict(zip(t["v"], t["scc"]))
    assert got[0] == got[1] == got[2] == 2
    assert got[3] == got[4] == 4
    assert got[5] == 5 and got[6] == 6 and got[7] == 7 and got[8] == 8


# ---------------------------------------------------------------------------
# sampled Brandes betweenness (round-5 kernel addition)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed,V,E,directed", [(4, 80, 240, True),
                                               (5, 150, 500, False),
                                               (6, 120, 200, True)])
def test_betweenness_matches_brandes(tmp_root, seed, V, E, directed):
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.betweenness import (betweenness,
                                                betweenness_oracle)

    rng = np.random.default_rng(seed)
    e = np.stack([rng.integers(0, V, E), rng.integers(0, V, E)], 1)
    e = np.unique(e[e[:, 0] != e[:, 1]], axis=0)
    if not directed:
        e = np.unique(np.concatenate([e, e[:, ::-1]]), axis=0)
    g = partition_edges(
        rd.from_arrow(pa.table({"src": e[:, 0], "dst": e[:, 1]})),
        f"{tmp_root}/betw_{seed}", V, num_parts=3, direction="fwd")
    PIV = 5
    bc_ds, info = betweenness(g, PIV)
    got = bc_ds.to_pandas().sort_values("v")["bc"].to_numpy()
    want = betweenness_oracle(e, V, list(range(PIV)))
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert len(info["depths"]) == PIV


def test_minhash_dedup_wcc_path_matches_union_find():
    """The 10^12-doc switch (verified pairs -> WCC kernel) must label
    groups identically to the driver union-find (both reps are the
    component min)."""
    import pandas as pd

    from planar_ray.pipelines.docs import (_pair_components_assign,
                                           lsh_candidate_pairs,
                                           pair_jaccards, JACCARD_TAU)

    sf = "/root/testdata/sf0.001"
    cand = lsh_candidate_pairs(sf)
    verified = pair_jaccards(sf, cand).filter(
        expr=f"jaccard >= {JACCARD_TAU}").to_pandas()
    uf = _pair_components_assign(sf, verified).to_pandas()
    wc = _pair_components_assign(sf, verified, wcc_threshold=0).to_pandas()
    pd.testing.assert_frame_equal(uf, wc)
    assert (wc["group_rep"] <= wc["doc_id"]).all()


def test_pagerank_warm_start_incremental(tmp_root):
    """PIE IncEval parity: after an edge delta, warm-starting PageRank
    from the previous fixpoint converges to the SAME scores in fewer
    supersteps than a cold start."""
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.pagerank import pagerank

    V = 2000
    rng = np.random.default_rng(41)
    e = np.stack([rng.integers(0, V, 8000), rng.integers(0, V, 8000)], 1)
    e = np.unique(e[e[:, 0] != e[:, 1]], axis=0)
    gA = partition_edges(
        rd.from_arrow(pa.table({"src": e[:, 0], "dst": e[:, 1]})),
        f"{tmp_root}/warm_A", V, num_parts=3, direction="fwd")
    stateA, engA = pagerank(gA, tol=1e-9)
    engA.close()

    # delta: 1% new edges
    d = np.stack([rng.integers(0, V, 80), rng.integers(0, V, 80)], 1)
    e2 = np.unique(np.concatenate([e, d[d[:, 0] != d[:, 1]]]), axis=0)
    gB = partition_edges(
        rd.from_arrow(pa.table({"src": e2[:, 0], "dst": e2[:, 1]})),
        f"{tmp_root}/warm_B", V, num_parts=3, direction="fwd")
    cold, engC = pagerank(gB, tol=1e-9)
    s_cold = len(engC.metrics)
    engC.close()
    warm, engW = pagerank(gB, tol=1e-9, initial_state=stateA)
    s_warm = len(engW.metrics)
    engW.close()

    tc = cold.select_columns(["v", "val"]).to_pandas().sort_values("v")
    tw = warm.select_columns(["v", "val"]).to_pandas().sort_values("v")
    np.testing.assert_allclose(tw["val"].to_numpy(), tc["val"].to_numpy(),
                               atol=1e-7)
    assert s_warm < s_cold, (s_warm, s_cold)


@pytest.mark.parametrize("mode", ["direct", "dataset"])
def test_scc_exchange_mode_parity(tmp_root, mode):
    """SCC results identical on the raw-task direct wire and the pure
    Dataset groupby-shuffle formulation."""
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.scc import scc, scc_oracle

    V, E = 120, 360
    rng = np.random.default_rng(77)
    e = np.stack([rng.integers(0, V, E), rng.integers(0, V, E)], 1)
    e = np.unique(e[e[:, 0] != e[:, 1]], axis=0)
    g = partition_edges(
        rd.from_arrow(pa.table({"src": e[:, 0], "dst": e[:, 1]})),
        f"{tmp_root}/sccm_{mode}", V, num_parts=2, direction="fwd")
    labels, _ = scc(g, exchange=mode)
    got = labels.to_pandas().sort_values("v")["scc"].to_numpy()
    assert np.array_equal(got, scc_oracle(e, V))


def test_betweenness_dataset_mode_parity(tmp_root):
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.betweenness import (betweenness,
                                                betweenness_oracle)

    V, E = 100, 300
    rng = np.random.default_rng(88)
    e = np.stack([rng.integers(0, V, E), rng.integers(0, V, E)], 1)
    e = np.unique(e[e[:, 0] != e[:, 1]], axis=0)
    g = partition_edges(
        rd.from_arrow(pa.table({"src": e[:, 0], "dst": e[:, 1]})),
        f"{tmp_root}/betw_ds", V, num_parts=2, direction="fwd")
    bc, _ = betweenness(g, 4, exchange="dataset")
    got = bc.to_pandas().sort_values("v")["bc"].to_numpy()
    np.testing.assert_allclose(
        got, betweenness_oracle(e, V, [0, 1, 2, 3]), atol=1e-9)


def test_corpus_scc_and_betweenness_match_oracles():
    """The corpus-family rows-only queries pinned against the numpy
    oracles on the materialised corpus edge list."""
    from planar_ray.pipelines import corpus_queries as cq
    from planar_ray.kernels.scc import scc_oracle
    from planar_ray.kernels.betweenness import betweenness_oracle

    g, vdict = cq._build()
    e = g.edges_dataset().to_pandas()[["src", "dst"]].to_numpy()
    V = g.num_vertices

    scc_tab = cq.q_corpus_scc("unused").to_pandas()
    want = scc_oracle(e, V)
    # map node_key -> v via the dict to align
    vd = vdict.to_pandas().set_index("key")["v"]
    got_v = vd.loc[scc_tab["node_key"]].to_numpy()
    assert np.array_equal(scc_tab["scc"].to_numpy(), want[got_v])

    bc_tab = cq.q_corpus_betweenness("unused").to_pandas()
    want_bc = betweenness_oracle(e, V, list(range(6)))
    got_v = vd.loc[bc_tab["node_key"]].to_numpy()
    np.testing.assert_allclose(bc_tab["bc"].to_numpy(),
                               np.round(want_bc[got_v], 6), atol=2e-6)
