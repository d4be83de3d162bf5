"""Round-3 additions:

* ANN dual-plan equality — the LSH-bucketed scale plans for
  neardup / knn-label must produce EXACTLY the exact blocked-scan
  results on a margin-constructed corpus (clusters whose members
  provably share every table's bucket and whose cross-cluster
  similarities sit far below the threshold).
* the threshold gate itself routes to the LSH plan.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from planar_ray.pipelines import ann

DIM = 16
N_CLUSTERS = 8
CLUSTER = 12  # > TOP_K so exact 10-NN stay in-cluster
EPS = 1e-4


def _margin_clusters(tmpdir: str) -> str:
    """Write an embeddings.parquet of near-dup clusters with guaranteed
    LSH margins: every member of a cluster has the same sign pattern as
    its center under EVERY table's hyperplanes (margin >> perturbation),
    in-cluster cosines ~1 >= tau, cross-cluster cosines < tau."""
    rng = np.random.default_rng(7)
    planes = [ann._lsh_planes(DIM, t) for t in range(ann.LSH_TABLES)]
    centers = []
    while len(centers) < N_CLUSTERS:
        c = rng.standard_normal(DIM)
        c /= np.linalg.norm(c)
        # sign margin under every plane of every table
        if min(float(np.abs(c @ pl).min()) for pl in planes) < 0.05:
            continue
        # cross-cluster similarity must sit far below tau
        if any(abs(float(c @ o)) > 0.25 for o in centers):
            continue
        centers.append(c)
    vecs, labels = [], []
    for ci, c in enumerate(centers):
        for _ in range(CLUSTER):
            v = c + EPS * rng.standard_normal(DIM)
            v /= np.linalg.norm(v)
            vecs.append(v)
            labels.append(ci % 3)
    m = np.stack(vecs)
    # construction invariants (fail loudly if the seed ever degrades)
    for pl in planes:
        sig = m @ pl > 0
        csig = np.stack(centers) @ pl > 0
        assert (sig == np.repeat(csig, CLUSTER, axis=0)).all()
    sims = np.round(m @ m.T, 6)
    for ci in range(N_CLUSTERS):
        blk = sims[ci * CLUSTER:(ci + 1) * CLUSTER,
                   ci * CLUSTER:(ci + 1) * CLUSTER]
        assert blk.min() >= ann.NEARDUP_TAU
    off = sims.copy()
    for ci in range(N_CLUSTERS):
        off[ci * CLUSTER:(ci + 1) * CLUSTER,
            ci * CLUSTER:(ci + 1) * CLUSTER] = 0.0
    assert off.max() < ann.NEARDUP_TAU

    tab = pa.table({
        "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
        "embedding": pa.array([row.astype(np.float32).tolist() for row in m],
                              pa.list_(pa.float32())),
        "label": pa.array(np.asarray(labels, dtype=np.int32)),
    })
    pq.write_table(tab, os.path.join(tmpdir, "embeddings.parquet"))
    return tmpdir


@pytest.fixture(scope="module")
def cluster_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_clusters"))
    return _margin_clusters(d)


def test_neardup_lsh_plan_equals_exact_plan(ray_session, cluster_dir):
    exact = ann.q_ann_neardup(cluster_dir, plan="exact")
    lsh = ann.q_ann_neardup(cluster_dir, plan="lsh")
    assert exact.num_rows == N_CLUSTERS * CLUSTER * (CLUSTER - 1) // 2
    assert exact.to_pydict() == lsh.to_pydict()


def test_knn_label_lsh_plan_equals_exact_plan(ray_session, cluster_dir):
    exact = ann.q_ann_knn_label(cluster_dir, plan="exact")
    lsh = ann.q_ann_knn_label(cluster_dir, plan="lsh")
    assert exact.num_rows == N_CLUSTERS * CLUSTER
    assert exact.to_pydict() == lsh.to_pydict()


def test_neardup_gate_routes_to_lsh(ray_session, cluster_dir, monkeypatch):
    monkeypatch.setattr(ann, "EXACT_SCAN_MAX_ROWS", 10)
    gated = ann.q_ann_neardup(cluster_dir)  # row count 96 > 10 -> lsh
    exact = ann.q_ann_neardup(cluster_dir, plan="exact")
    assert gated.to_pydict() == exact.to_pydict()


# ---------------------------------------------------------------------------
# phase-level checkpoint/resume for multi-phase drivers (VERDICT r2 #4)
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.001"


def _chain_graph(tmp_root: str, name: str):
    """A long path + a few branches: contracting WCC needs several phases
    and Borůvka several rounds."""
    import ray.data as rd

    from planar_ray import graph as G

    e = [(i, i + 1) for i in range(40)] + [(10, 50), (50, 51), (20, 60)]
    arr = np.array(e, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"src": arr[:, 0], "dst": arr[:, 1]}))
    return G.graph_from_id_edges(ds, f"{tmp_root}/{name}", num_parts=3)


def test_wcc_contracting_phase_resume(ray_session, tmp_root):
    from planar_ray.kernels.wcc import _wcc_contracting, wcc

    g = _chain_graph(tmp_root, "phase_wcc")
    full_state, _ = wcc(g, contract_every=2)
    full = full_state.to_pandas().sort_values("v")["val"].to_numpy()

    run_dir = f"{tmp_root}/wcc_phases"
    # "killed" after 2 phases
    _wcc_contracting(g, 200, 2, run_dir=run_dir, max_phases=2)
    import os

    assert os.path.exists(os.path.join(run_dir, "phase_001", "manifest.json"))
    # resume and finish
    final, eng = _wcc_contracting(g, 200, 2, run_dir=run_dir, resume=True)
    got = final.to_pandas().sort_values("v")["val"].to_numpy()
    assert np.array_equal(got, full)
    assert eng.contract_log[-1][1] < eng.contract_log[0][1]  # it contracted


@pytest.mark.parametrize("threshold", [10**9, 0])  # broadcast / dataset plans
def test_boruvka_round_resume(ray_session, tmp_root, threshold):
    from planar_ray.kernels.mst import boruvka

    g = _chain_graph(tmp_root, f"phase_mst_{threshold}")
    labels_full, forest_full = boruvka(g, broadcast_threshold=threshold)

    run_dir = f"{tmp_root}/mst_rounds_{threshold}"
    boruvka(g, max_rounds=1, run_dir=run_dir, broadcast_threshold=threshold)
    labels_res, forest_res = boruvka(g, run_dir=run_dir, resume=True,
                                     broadcast_threshold=threshold)
    assert np.array_equal(labels_res["label"].to_numpy(),
                          labels_full["label"].to_numpy())
    assert forest_res.reset_index(drop=True).equals(
        forest_full.reset_index(drop=True))


# ---------------------------------------------------------------------------
# direct partition-to-partition exchange (Engine(exchange="direct"))
# ---------------------------------------------------------------------------

def _rand_graph(tmp_root: str, name: str):
    import ray.data as rd

    from planar_ray import graph as G
    from planar_ray.graph import derive_direction

    rng = np.random.default_rng(3)
    E = rng.integers(0, 300, size=(2000, 2)).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": E[:, 0], "dst": E[:, 1]}))
    g = G.graph_from_id_edges(ds, f"{tmp_root}/{name}", num_parts=4)
    derive_direction(g, "sym")
    return g


@pytest.mark.parametrize("kern", ["pagerank", "wcc", "lpa"])
def test_direct_exchange_matches_dataset_mode(ray_session, tmp_root, kern):
    from planar_ray.kernels.lpa import LPAKernel
    from planar_ray.kernels.pagerank import PageRankKernel
    from planar_ray.kernels.wcc import WCCKernel
    from planar_ray.superstep import Engine

    kern_f = {"pagerank": PageRankKernel, "wcc": WCCKernel,
              "lpa": LPAKernel}[kern]
    steps = {"pagerank": 40, "wcc": 50, "lpa": 8}[kern]
    g = _rand_graph(tmp_root, f"direct_{kern}")
    e1 = Engine(g, kern_f(), exchange="dataset")
    d1 = e1.run(max_supersteps=steps).to_pandas().sort_values("v")
    e2 = Engine(g, kern_f(), exchange="direct")
    d2 = e2.run(max_supersteps=steps).to_pandas().sort_values("v")
    assert len(e1.metrics) == len(e2.metrics)  # same superstep count
    assert np.allclose(d1["val"].to_numpy(), d2["val"].to_numpy(), atol=1e-12)
    e1.close()
    e2.close()


def test_direct_mode_checkpoint_resume(ray_session, tmp_root):
    from planar_ray.kernels.pagerank import PageRankKernel
    from planar_ray.superstep import Engine

    g = _rand_graph(tmp_root, "direct_ckpt")
    full = Engine(g, PageRankKernel()).run(max_supersteps=60)
    fullv = full.to_pandas().sort_values("v")["val"].to_numpy()

    run_dir = f"{tmp_root}/direct_ckpt_run"
    eng1 = Engine(g, PageRankKernel(), run_dir=run_dir, checkpoint_every=1)
    eng1.init_state_direct()
    for s in range(3):
        eng1.step_direct(s)
    del eng1  # "crash"
    eng2 = Engine(g, PageRankKernel(), run_dir=run_dir, checkpoint_every=1)
    state2 = eng2.run(max_supersteps=60, resume=True)
    resumed = state2.to_pandas().sort_values("v")["val"].to_numpy()
    assert eng2.metrics[0].superstep == 3  # continued, not restarted
    assert np.allclose(resumed, fullv, atol=1e-9)


# ---------------------------------------------------------------------------
# ASP (asynchronous within a superstep) WCC / SSSP — reference
# wcc_asp_app.cpp / sssp_asp_app.cpp parity at fixpoint
# ---------------------------------------------------------------------------

def _path_graph(tmp_root: str, name: str, n: int = 64):
    import ray.data as rd

    from planar_ray import graph as G
    from planar_ray.graph import derive_direction

    e = np.array([(i, i + 1) for i in range(n - 1)], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"src": e[:, 0], "dst": e[:, 1]}))
    g = G.graph_from_id_edges(ds, f"{tmp_root}/{name}", num_parts=4)
    derive_direction(g, "sym")
    return g


def test_asp_wcc_same_fixpoint_fewer_supersteps(ray_session, tmp_root):
    from planar_ray.kernels.wcc import wcc, wcc_asp

    g = _path_graph(tmp_root, "asp_path")
    s_bsp, e_bsp = wcc(g)
    s_asp, e_asp = wcc_asp(g)
    b = s_bsp.to_pandas().sort_values("v")["val"].to_numpy()
    a = s_asp.to_pandas().sort_values("v")["val"].to_numpy()
    assert np.array_equal(a, b)
    # a 64-vertex path needs ~diameter supersteps in BSP; ASP crosses a
    # whole partition per superstep
    assert len(e_asp.metrics) < len(e_bsp.metrics) / 3

    g2 = _rand_graph(tmp_root, "asp_rand")
    s_bsp2, _ = wcc(g2)
    s_asp2, e2 = wcc_asp(g2)
    assert np.array_equal(
        s_asp2.to_pandas().sort_values("v")["val"].to_numpy(),
        s_bsp2.to_pandas().sort_values("v")["val"].to_numpy())


def test_asp_sssp_same_fixpoint_fewer_supersteps(ray_session, tmp_root):
    from planar_ray.kernels.sssp import sssp, sssp_asp

    g = _path_graph(tmp_root, "asp_sssp_path")
    s_bsp, e_bsp = sssp(g, source=0)
    s_asp, e_asp = sssp_asp(g, source=0)
    b = s_bsp.to_pandas().sort_values("v")["val"].to_numpy()
    a = s_asp.to_pandas().sort_values("v")["val"].to_numpy()
    assert np.array_equal(a, b)
    assert len(e_asp.metrics) < len(e_bsp.metrics) / 3


# ---------------------------------------------------------------------------
# planar_check parity tool (reference planar/planar_check.cpp)
# ---------------------------------------------------------------------------

def test_check_graph_clean_and_corrupted(ray_session, tmp_root):
    import pyarrow.parquet as pq

    from planar_ray.inspect_tools import check_graph

    g = _rand_graph(tmp_root, "check_g")
    rep = check_graph(g.root)
    assert rep["ok"], rep["errors"]
    assert set(rep["directions"]) == {"fwd", "sym"}
    assert sum(p["rows"] for p in rep["directions"]["fwd"]["parts"]) \
        == g.num_edges

    # corruption 1: drop rows from one partition's payload
    path = f"{g.root}/fwd/part=00001/edges.parquet"
    tab = pq.read_table(path)
    pq.write_table(tab.slice(0, max(1, len(tab) // 2)), path)
    rep2 = check_graph(g.root, "fwd")
    assert not rep2["ok"]
    assert any("row count" in e for e in rep2["errors"])

    # corruption 2: unsorted src (CSR precondition violated)
    sliced = tab.to_pandas().iloc[::-1]
    import pyarrow as _pa

    pq.write_table(_pa.table({
        "src": _pa.array(sliced["src"].to_numpy()),
        "dst": _pa.array(sliced["dst"].to_numpy())}), path)
    rep3 = check_graph(g.root, "fwd")
    assert any("not sorted" in e for e in rep3["errors"])

    # CLI wrapper exits nonzero on a broken graph
    from planar_ray import cli

    with pytest.raises(SystemExit):
        cli.main(["check", g.root, "--direction", "fwd"])


def test_minhash_dedup_phase_resume(ray_session, tmp_root):
    from planar_ray.pipelines.docs import q_doc_minhash_dedup

    full = q_doc_minhash_dedup(SF)
    run_dir = f"{tmp_root}/dedup_phases"
    q_doc_minhash_dedup(SF, run_dir=run_dir)  # writes phase 0 + 1
    import os
    import shutil

    # "kill during verify": drop phase 1, keep the candidate parquet
    shutil.rmtree(os.path.join(run_dir, "phase_001"))
    resumed = q_doc_minhash_dedup(SF, run_dir=run_dir, resume=True)
    assert resumed.to_pydict() == full.to_pydict()


# ---------------------------------------------------------------------------
# narrow (uint16/uint32) vertex-state variant — reference
# core/common/types.h:25-28 uint16 VertexData parity
# ---------------------------------------------------------------------------

def test_narrow_state_wcc_lpa_parity(ray_session, tmp_root):
    import pyarrow as pa

    from planar_ray.kernels.lpa import lpa
    from planar_ray.kernels.wcc import wcc
    from planar_ray.superstep import narrow_vertex_type

    assert narrow_vertex_type(300) == pa.uint16()
    assert narrow_vertex_type(1 << 20) == pa.uint32()
    assert narrow_vertex_type(1 << 40) == pa.int64()

    g = _rand_graph(tmp_root, "narrow_g")  # 300 vertices -> uint16 labels
    s_wide, e_wide = wcc(g)
    s_nar, e_nar = wcc(g, narrow=True)
    assert e_nar.kernel.columns["val"] == pa.uint16()
    sch = s_nar.schema()  # ray.data Schema: parallel names/types lists
    assert dict(zip(sch.names, sch.types))["val"] == pa.uint16()
    w = s_wide.to_pandas().sort_values("v")["val"].to_numpy()
    n = s_nar.to_pandas().sort_values("v")["val"].to_numpy()
    assert np.array_equal(w, n.astype(np.int64))
    assert len(e_wide.metrics) == len(e_nar.metrics)

    l_wide, _ = lpa(g, max_iters=6)
    l_nar, le = lpa(g, max_iters=6, narrow=True)
    assert le.kernel.columns["val"] == pa.uint16()
    assert np.array_equal(
        l_wide.to_pandas().sort_values("v")["val"].to_numpy(),
        l_nar.to_pandas().sort_values("v")["val"].to_numpy().astype(np.int64))


# ---------------------------------------------------------------------------
# IVF ANN: probe-all == brute force; built index == inline; nprobe prunes
# ---------------------------------------------------------------------------

def test_ivf_exact_equals_brute_force_and_index_path(ray_session, tmp_root):
    bf = ann.q_ann_topk(SF).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    ex = ann.q_ann_ivf_topk(SF).to_pandas()  # under gate -> probe-all
    assert bf.equals(ex.sort_values(["query_id", "rank"]).reset_index(drop=True))

    idx = os.path.join(tmp_root, "ivf_index")
    ann.ivf_build(SF, idx)
    # one directory per inverted list on disk (resumable, prunable)
    lists = [d for d in os.listdir(idx) if d.startswith("list_id=")]
    assert len(lists) > 1
    exi = ann.q_ann_ivf_topk(SF, index_dir=idx).to_pandas()
    assert bf.equals(exi.sort_values(["query_id", "rank"]).reset_index(drop=True))

    ap = ann.q_ann_ivf_topk(SF, nprobe=4, index_dir=idx).to_pandas()
    hit = len(set(map(tuple, ap[["query_id", "vec_id"]].to_numpy())) &
              set(map(tuple, bf[["query_id", "vec_id"]].to_numpy())))
    assert hit / len(bf) >= 0.3  # approximate, but far above chance


# ---------------------------------------------------------------------------
# whole-batch winnower == per-doc fingerprints (incl. unicode + short docs)
# ---------------------------------------------------------------------------

def test_winnower_batch_matches_per_doc(ray_session):
    from planar_ray.pipelines.docs import Winnower

    w = Winnower()
    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"])
    extra = pa.table({
        "doc_id": pa.array([900001, 900002, 900003, 900004, 900005], pa.int64()),
        "text": pa.array(["", "abc", "ünïcødé-text with ünïcødé",
                          "1234567", "12345678"]),
    })
    t = pa.concat_tables([t, extra.cast(t.schema)])
    got = w(t)
    for i, s in enumerate(t["text"].to_pylist()):
        fp = w.fingerprints(s)
        assert got["n_fp"][i].as_py() == len(fp), s[:30]
        assert got["min_fp"][i].as_py() == int(fp.min()), s[:30]


# ---------------------------------------------------------------------------
# S15 vertex-capped BFS edge-cut (reference bfs_based_edgecut.cpp:82-160)
# ---------------------------------------------------------------------------

def test_bfs_capped_assign_respects_cap_and_beats_hash(ray_session, tmp_root):
    from planar_ray.partition_quality import (
        bfs_capped_assign,
        edge_cut_fraction,
        hash_assign,
    )

    g = _rand_graph(tmp_root, "capped_g")  # 300 vertices
    cap = 75
    fn = bfs_capped_assign(g, cap)
    ids = np.arange(g.num_vertices, dtype=np.int64)
    parts = fn(ids)
    counts = np.bincount(parts)
    assert counts.max() <= cap              # the cap is a hard bound
    assert len(counts) == -(-g.num_vertices // cap)
    e = g.edges_dataset().materialize()
    cut_capped = edge_cut_fraction(e, fn)
    cut_hash = edge_cut_fraction(e, hash_assign(len(counts)))
    assert cut_capped <= cut_hash + 1e-9    # BFS locality helps (or ties)


# ---------------------------------------------------------------------------
# vertex-dict id mapping: broadcast plan == join plan (the dual-plan gate)
# ---------------------------------------------------------------------------

def test_map_edges_broadcast_plan_equals_join_plan(ray_session, tmp_root):
    from planar_ray import corpus, graph as G, ingest
    import ray.data as rd

    cdir = corpus.write_corpus(corpus.TINY)
    files = ingest.extract_files(rd.read_parquet(cdir), concurrency=2)
    edges = ingest.build_edges(files, num_partitions=4).materialize()
    vdict = G.build_vertex_dict(edges, os.path.join(tmp_root, "bv"), 4)

    def canon(ds):
        df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        return df

    bc = canon(G.map_edges_to_ids(edges, vdict, 4, broadcast_threshold=10**9))
    jn = canon(G.map_edges_to_ids(edges, vdict, 4, broadcast_threshold=0))
    assert bc.equals(jn)
    assert len(bc) > 0


def test_resolve_stems_broadcast_plan_equals_join_plan(ray_session, tmp_root):
    """NUL-separator regression guard: the broadcast stem resolver must
    match the hash-join plan exactly (stem_key embeds \\x00, which pandas
    string hashing truncates — the resolver must stay Arrow-native)."""
    from planar_ray import corpus, ingest
    import ray.data as rd
    import pyarrow.compute as pc

    cdir = corpus.write_corpus(corpus.TINY)
    files = ingest.extract_files(rd.read_parquet(cdir), concurrency=2).materialize()
    cands = files.map_batches(ingest._explode_imports, batch_format="pyarrow")
    file_cands = cands.filter(expr="kind == 'file'").select_columns(
        ["src_key", "stem_key", "kind"]).materialize()
    stems = files.map_batches(ingest._file_stems, batch_format="pyarrow").materialize()

    def canon(ds):
        return sorted(map(tuple, ds.to_pandas()[["src_key", "dst_key"]]
                          .itertuples(index=False)))

    bc = canon(ingest._resolve_stems_broadcast(file_cands, stems))
    jn = canon(ingest._resolve_stems_join(file_cands, stems, 4))
    assert len(bc) > 0
    assert bc == jn


def test_adaptive_wire_sparse_rows_match_dense_and_noplan(
        ray_session, tmp_root, monkeypatch):
    """The exchange plan's adaptive wire (superstep._direct_scatter):
    sparse (src, dst)-partition pairs ship pre-combined rows, dense
    pairs ship (dval, dcnt) vectors. A low-density graph (many vertices,
    few edges -> rows everywhere) and a denser one must both match the
    no-plan raw path bit-for-bit in superstep count and 1e-12 in values.
    """
    import ray.data as rd

    from planar_ray import graph as G
    from planar_ray.graph import derive_direction
    from planar_ray.kernels.pagerank import PageRankKernel
    from planar_ray.superstep import Engine

    rng = np.random.default_rng(11)
    # V=4000, E=3000: per-(p,q) density ~0.17 -> the rows arm fires
    E = rng.integers(0, 4000, size=(3000, 2)).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": E[:, 0], "dst": E[:, 1]}))
    g = G.graph_from_id_edges(ds, f"{tmp_root}/adaptive_sparse", num_parts=4)
    derive_direction(g, "sym")

    e1 = Engine(g, PageRankKernel())
    assert e1._plan_refs is not None  # plan mode active
    d1 = e1.run(max_supersteps=30).to_pandas().sort_values("v")

    monkeypatch.setenv("PLANAR_NO_EXCHANGE_PLAN", "1")
    e2 = Engine(g, PageRankKernel())
    assert e2._plan_refs is None
    d2 = e2.run(max_supersteps=30).to_pandas().sort_values("v")
    monkeypatch.delenv("PLANAR_NO_EXCHANGE_PLAN")

    assert len(e1.metrics) == len(e2.metrics)
    assert np.allclose(d1["val"].to_numpy(), d2["val"].to_numpy(), atol=1e-12)
    assert d1["in_msgs"].sum() > 0
    e1.close()
    e2.close()


def test_fused_wave_matches_two_wave_engine(ray_session, tmp_root):
    """superstep._direct_fused (apply+scatter in one task wave) must be
    observationally identical to the two-wave scatter->apply form:
    same superstep count, same values, for a plan-mode kernel
    (PageRank, dense/sparse adaptive wire) and a frontier kernel (WCC).
    """
    import ray.data as rd

    from planar_ray import graph as G
    from planar_ray.graph import derive_direction
    from planar_ray.kernels.pagerank import PageRankKernel
    from planar_ray.kernels.wcc import WCCKernel
    from planar_ray.superstep import Engine

    rng = np.random.default_rng(7)
    E = rng.integers(0, 8000, size=(48000, 2)).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": E[:, 0], "dst": E[:, 1]}))
    g = G.graph_from_id_edges(ds, f"{tmp_root}/fused_parity", num_parts=4)
    derive_direction(g, "sym")

    for K in (PageRankKernel, WCCKernel):
        e1 = Engine(g, K(), fused=True)
        d1 = e1.run(max_supersteps=60).to_pandas().sort_values("v")
        e2 = Engine(g, K(), fused=False)
        d2 = e2.run(max_supersteps=60).to_pandas().sort_values("v")
        assert len(e1.metrics) == len(e2.metrics)
        assert np.allclose(d1["val"].to_numpy(), d2["val"].to_numpy(),
                           atol=1e-12)
        e1.close()
        e2.close()


def test_asof_bucket_join_matches_pandas_reference(ray_session):
    """joins.asof_bucket_join (distributed point-in-time join): backward
    inner semantics with a (key, ts) tiebreak, vs a local merge_asof
    reference — covers duplicate (key, ts) right rows, left rows with no
    preceding right row, and keys on only one side.
    """
    import pandas as pd
    import ray.data as rd

    from planar_ray.joins import asof_bucket_join

    rng = np.random.default_rng(13)
    L = pd.DataFrame({
        "lid": np.arange(600, dtype=np.int64),
        "k": rng.integers(0, 25, 600).astype(np.int64),
        "lts": rng.integers(0, 1000, 600).astype(np.int64),
    })
    R = pd.DataFrame({
        "rid": np.arange(200, dtype=np.int64),
        "rk": rng.integers(5, 35, 200).astype(np.int64),  # partial overlap
        "rts": rng.integers(0, 1000, 200).astype(np.int64),
        "val": rng.random(200).round(6),
    })
    # force (key, ts) ties so the tiebreak path executes
    R.loc[10, ["rk", "rts"]] = R.loc[11, ["rk", "rts"]].to_numpy()

    got = asof_bucket_join(
        rd.from_pandas(L), rd.from_pandas(R), left_by="k", right_by="rk",
        left_ts="lts", right_ts="rts", buckets=8, right_tiebreak="rid",
    ).to_pandas().sort_values("lid").reset_index(drop=True)

    Rd = (R.sort_values(["rk", "rts", "rid"], kind="stable")
           .drop_duplicates(["rk", "rts"], keep="first"))
    want = pd.merge_asof(
        L.sort_values("lts", kind="stable"), Rd.sort_values("rts"),
        left_on="lts", right_on="rts", left_by="k", right_by="rk",
        direction="backward")
    want = (want[want["rts"].notna()].sort_values("lid")
            .reset_index(drop=True))
    assert len(got) == len(want) > 0
    for c in ("lid", "rid", "rts", "val"):
        assert np.allclose(got[c].to_numpy(dtype=float),
                           want[c].to_numpy(dtype=float)), c
