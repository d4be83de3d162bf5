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
