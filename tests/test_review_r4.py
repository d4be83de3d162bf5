"""Regression tests for the round-4 whole-package review findings:
checkpoint lineage gate, testdata-graph build atomicity, exact-kNN
self-vote on tiny corpora, incoming-only CLI runs, CSRPart.intra_local
caching, GNN wire width, vertex-dict single execution / stale-dir
cleanup, and the shared splitmix64 bucket mixer."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _rand_graph(root, n=200, m=1200, parts=4, seed=7):
    import ray.data as rd

    from planar_ray.graph import partition_edges

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m, dtype=np.int64)
    dst = rng.integers(0, n, m, dtype=np.int64)
    keep = src != dst
    edges = rd.from_arrow(pa.table({"src": pa.array(src[keep]),
                                    "dst": pa.array(dst[keep])}))
    return partition_edges(edges, root, n, parts, "fwd")


# ---------------------------------------------------------------------------
# Finding 1: checkpoint resume must reject manifests from another
# graph build / partitioning (lineage gate), not just another kernel
# ---------------------------------------------------------------------------

def test_checkpoint_lineage_mismatch_starts_fresh(tmp_root):
    from planar_ray.graph import derive_direction
    from planar_ray.kernels.wcc import WCCKernel
    from planar_ray.superstep import Engine

    run_dir = tmp_root + "/lineage_run"
    ga = derive_direction(_rand_graph(tmp_root + "/lineage_a"), "sym")
    eng = Engine(ga, WCCKernel(), run_dir=run_dir, checkpoint_every=1)
    eng.run(max_supersteps=50)
    eng.close()

    # same graph, same kernel -> the manifest is adoptable
    again = Engine(ga, WCCKernel(), run_dir=run_dir, checkpoint_every=1)
    assert again.latest_checkpoint() is not None
    again.close()

    # a DIFFERENT build (n, boundaries, root all differ) pointed at the
    # same run_dir must refuse the stale state and warn
    gb = derive_direction(
        _rand_graph(tmp_root + "/lineage_b", n=300, m=900, parts=3), "sym")
    other = Engine(gb, WCCKernel(), run_dir=run_dir, checkpoint_every=1)
    with pytest.warns(UserWarning, match="lineage mismatch"):
        assert other.latest_checkpoint() is None
    other.close()


def test_checkpoint_lineage_rejects_boundary_change(tmp_root):
    """Same vertex/edge counts, different partition boundaries -> the
    boundaries_sha leg of the gate must fire (a state parquet's 'part'
    column indexes apply tasks positionally)."""
    from planar_ray.graph import derive_direction
    from planar_ray.kernels.wcc import WCCKernel
    from planar_ray.superstep import Engine

    run_dir = tmp_root + "/lineage_bd_run"
    ga = derive_direction(
        _rand_graph(tmp_root + "/lineage_bd_a", parts=4), "sym")
    eng = Engine(ga, WCCKernel(), run_dir=run_dir, checkpoint_every=1)
    eng.run(max_supersteps=50)
    eng.close()
    # identical edges re-partitioned 2-ways in a fresh root: only root +
    # boundaries differ; the gate must still refuse
    gb = derive_direction(
        _rand_graph(tmp_root + "/lineage_bd_b", parts=2), "sym")
    assert gb.num_vertices == ga.num_vertices
    assert gb.num_edges == ga.num_edges
    other = Engine(gb, WCCKernel(), run_dir=run_dir, checkpoint_every=1)
    with pytest.warns(UserWarning, match="lineage mismatch"):
        assert other.latest_checkpoint() is None
    other.close()


# ---------------------------------------------------------------------------
# Finding 2: testdata-graph build commits the id dictionary LAST — a
# half-built cache state (meta present, dict missing) must rebuild
# cleanly with no duplicated dictionary rows
# ---------------------------------------------------------------------------

def test_testdata_build_recovers_from_partial_cache():
    import shutil

    from planar_ray.pipelines.testdata_graph import _build, _cache_root

    g, iddict = _build(SF, "g2")
    want = iddict.count()
    dict_dir = os.path.join(_cache_root(SF), "g2", "iddict")
    # simulate the crash window: partitioned graph (meta) exists, the
    # dictionary commit never happened
    shutil.rmtree(dict_dir)
    g2, iddict2 = _build(SF, "g2")
    assert iddict2.count() == want
    # the dict must be unique on both key and rank
    t = iddict2.take_all()
    keys = [r["key"] for r in t]
    vs = [r["v"] for r in t]
    assert len(set(keys)) == len(keys) == want
    assert sorted(vs) == list(range(want))


# ---------------------------------------------------------------------------
# Finding 3: exact-plan kNN on a corpus smaller than TOP_K — the -inf
# self slots that survive the top-k cut are not votes
# ---------------------------------------------------------------------------

def test_knn_label_tiny_corpus_matches_oracle(tmp_path):
    import duckdb

    from planar_ray.pipelines.ann import SQL_ANN_KNN_LABEL, q_ann_knn_label

    # 4 vectors (< TOP_K = 10): labels chosen so a bogus self-vote row
    # (label of the voter itself) would flip at least one majority
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((4, 8)).astype(np.float32)
    lab = np.array([1, 0, 0, 1], dtype=np.int32)
    tab = pa.table({
        "vec_id": pa.array(np.arange(4, dtype=np.int64)),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(lab),
    })
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))

    got = q_ann_knn_label(str(tmp_path), plan="exact").to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * "
                f"FROM '{tmp_path}/embeddings.parquet'")
    want = con.sql(SQL_ANN_KNN_LABEL).df().sort_values(
        "vec_id").reset_index(drop=True)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["pred_label"].tolist() == want["pred_label"].tolist()


def test_knn_label_single_vector_emits_no_row(tmp_path):
    """One vector has no candidates at all -> no prediction row (the SQL
    twin's self-excluding join returns zero rows too)."""
    from planar_ray.pipelines.ann import q_ann_knn_label

    tab = pa.table({
        "vec_id": pa.array([0], pa.int64()),
        "embedding": pa.array([[1.0, 0.0]], pa.list_(pa.float32())),
        "label": pa.array([5], pa.int32()),
    })
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))
    assert q_ann_knn_label(str(tmp_path), plan="exact").num_rows == 0


# ---------------------------------------------------------------------------
# Finding 4: `cli run` works against an incoming-only store (fwd is
# derived from the transposed rev rows, exactly)
# ---------------------------------------------------------------------------

def test_cli_run_on_incoming_only_store(tmp_path, capsys):
    from planar_ray import cli

    csvp = str(tmp_path / "edges.csv")
    rng = np.random.default_rng(11)
    with open(csvp, "w") as f:
        for _ in range(400):
            a, b = rng.integers(0, 60, 2)
            f.write(f"{a},{b}\n")

    out_in = str(tmp_path / "g_in")
    out_out = str(tmp_path / "g_out")
    cli.main(["ingest-csv", "--i", csvp, "--out", out_in, "--parts", "2",
              "--store-strategy", "incoming"])
    cli.main(["ingest-csv", "--i", csvp, "--out", out_out, "--parts", "2",
              "--store-strategy", "outgoing"])
    capsys.readouterr()

    cli.main(["run", "--kernel", "pagerank", "--graph", out_in,
              "--iters", "5"])
    rep_in = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    cli.main(["run", "--kernel", "pagerank", "--graph", out_out,
              "--iters", "5"])
    rep_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # identical graph content -> identical deterministic outputs either
    # way (seconds/edges_per_sec are wall-clock, skip those)
    assert rep_in["kernel"] == "pagerank"
    assert rep_in["supersteps"] == rep_out["supersteps"]
    for ma, mb in zip(rep_in["metrics_tail"], rep_out["metrics_tail"]):
        for k in ("superstep", "max_delta", "changed", "in_msgs"):
            assert ma[k] == mb[k], k


def test_derive_direction_from_rev_only_store(tmp_path):
    """derive_direction('fwd') on a rev-only root recovers the original
    orientation exactly, multi-edges included."""
    import ray.data as rd

    from planar_ray.graph import Graph, derive_direction, partition_edges

    src = np.array([0, 0, 1, 2, 2, 2], dtype=np.int64)  # multi-edge 2->0
    dst = np.array([1, 2, 2, 0, 0, 1], dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": pa.array(src),
                                    "dst": pa.array(dst)}))
    root = str(tmp_path / "revonly")
    # partition_edges takes fwd-oriented rows and transposes for "rev"
    partition_edges(edges, root, 3, 2, "rev")
    g = derive_direction(Graph.load(root, "rev"), "fwd")
    got = sorted((r["src"], r["dst"]) for r in g.edges_dataset().take_all())
    assert got == sorted(zip(src.tolist(), dst.tolist()))


def test_derive_direction_sym_only_store_refuses(tmp_path):
    """A sym-only store cannot determine fwd orientation — explicit error
    beats silently duplicated edges."""
    import ray.data as rd

    from planar_ray.graph import Graph, derive_direction, partition_edges

    both = pa.table({"src": pa.array([0, 1], pa.int64()),
                     "dst": pa.array([1, 0], pa.int64())})
    root = str(tmp_path / "symonly")
    partition_edges(rd.from_arrow(both), root, 2, 1, "sym")
    with pytest.raises(ValueError, match="orientation"):
        derive_direction(Graph.load(root, "sym"), "fwd")


# ---------------------------------------------------------------------------
# Finding 5: CSRPart.intra_local is correct and instance-cached
# ---------------------------------------------------------------------------

def test_csrpart_intra_local_cached_and_correct():
    from planar_ray.graph import CSRPart

    # partition owns [2, 5); edges: 2->[0,3], 3->[3,4,9], 4->[2]
    indptr = np.array([0, 2, 5, 6], dtype=np.int64)
    indices = np.array([0, 3, 3, 4, 9, 2], dtype=np.uint32)
    part = CSRPart(2, 5, indptr, indices)
    s1 = part.intra_local()
    s2 = part.intra_local()
    assert s1 is s2  # cached, not rebuilt per superstep
    src_loc, dst_loc = s1
    got = sorted(zip(src_loc.tolist(), dst_loc.tolist()))
    # local ids: 2->3 (0,1), 3->3 (1,1), 3->4 (1,2), 4->2 (2,0)
    assert got == [(0, 1), (1, 1), (1, 2), (2, 0)]


# ---------------------------------------------------------------------------
# Finding 6: GNN messages carry only the feature partials on the wire
# ---------------------------------------------------------------------------

def test_gnn_message_columns_narrow_wire():
    from planar_ray.kernels.gnn import FDIM, GNNKernel

    cols = GNNKernel().message_columns
    assert cols == [f"f{j}" for j in range(FDIM)]
    assert "deg" not in cols and "delta" not in cols


# ---------------------------------------------------------------------------
# Finding 7: build_vertex_dict overwrites a stale vertices dir (never
# appends beside old files) and its output matches a fresh read-back
# ---------------------------------------------------------------------------

def test_build_vertex_dict_clears_stale_dir(tmp_path):
    import ray.data as rd

    from planar_ray.graph import build_vertex_dict

    out = str(tmp_path / "vd")
    vdir = os.path.join(out, "vertices")
    os.makedirs(vdir)
    # stale rows a previous (different) build left behind
    pq.write_table(pa.table({"key": pa.array([b"zz"], pa.binary()),
                             "v": pa.array([999], pa.int64())}),
                   os.path.join(vdir, "stale.parquet"))
    names = [f"k{i}" for i in range(20)]
    keys = rd.from_arrow(pa.table({
        "src_key": pa.array(names * 3), "dst_key": pa.array(names[::-1] * 3)}))
    vdict = build_vertex_dict(keys, out, num_partitions=4)
    assert vdict.count() == 20
    ondisk = pq.read_table(vdir)
    assert ondisk.num_rows == 20  # stale file gone
    assert sorted(ondisk["v"].to_pylist()) == list(range(20))
    # the returned dataset and the on-disk files agree row-for-row
    mem = {r["key"]: r["v"] for r in vdict.take_all()}
    disk = dict(zip(ondisk["key"].to_pylist(), ondisk["v"].to_pylist()))
    assert mem == disk


# ---------------------------------------------------------------------------
# Finding 8: bucket hashing goes through the shared property-tested
# splitmix64 (no hand-rolled partial mixers)
# ---------------------------------------------------------------------------

def test_bucket_of_uses_shared_splitmix64():
    from planar_ray.joins import _bucket_of
    from planar_ray.util import splitmix64

    v = np.array([0, 1, 2, 10**12, 2**63 - 1], dtype=np.int64)
    got = _bucket_of(pa.array(v), 64)
    want = (splitmix64(v.astype(np.uint64)) % np.uint64(64)).astype(np.int64)
    np.testing.assert_array_equal(got, want)
