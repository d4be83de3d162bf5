"""Round-4 additions: ADVICE fixes, grouped (node-major) direct exchange,
uint32 CSR indices, SQL-replicable dedup hashes, kNN-LSH vectorised vote."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# ADVICE: combine_sum's dense path must keep exact-zero-sum targets
# ---------------------------------------------------------------------------

def test_combine_sum_keeps_zero_sum_targets():
    from planar_ray.superstep import combine_sum

    t = np.array([3, 3, 5, 7], dtype=np.int64)
    v = np.array([1.0, -1.0, 2.0, 0.0])
    # dense path (num_targets under the gate)
    ud, sd = combine_sum(t, v, num_targets=10)
    # sort path
    us, ss = combine_sum(t, v, num_targets=None)
    np.testing.assert_array_equal(ud, us)
    np.testing.assert_allclose(sd, ss)
    assert 3 in ud and 7 in ud  # zero-sum target 3 and zero-valued 7 kept


def test_direct_raw_scatter_keeps_zero_sum_rows():
    """The raw-branch per-destination bincount must emit a row for a
    target whose partials cancel to exactly 0.0 (message presence feeds
    in_msgs)."""
    from planar_ray.superstep import Kernel, _direct_scatter

    class K(Kernel):
        name = "zsum"
        columns = {"val": pa.float64()}

        def scatter_raw(self, csr, v, cols):
            return {"v": np.array([2, 2, 3], dtype=np.int64),
                    "val": np.array([1.0, -1.0, 5.0])}

    csr_arrays = (0, 4, np.zeros(5, np.int64), np.empty(0, np.int64))
    state = K().rows(np.zeros(1, np.int64), np.array([0]), 0,
                     {"val": np.array([1.0])})
    out = _direct_scatter("t", K(), csr_arrays, [0, 4], 0, state)
    assert out["v"].to_pylist() == [2, 3]
    assert out["val"].to_pylist() == [0.0, 5.0]


# ---------------------------------------------------------------------------
# ADVICE: ivf_train must not crash on degenerate (all-identical) corpora
# ---------------------------------------------------------------------------

def test_ivf_train_degenerate_corpus(tmp_path):
    import pyarrow.parquet as pq

    from planar_ray.pipelines.ann import ivf_train

    vec = [0.5] * 8
    tab = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array([vec] * 40, pa.list_(pa.float64())),
        "label": pa.array(np.zeros(40, np.int64)),
    })
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))
    C = ivf_train(str(tmp_path), nlist=8)  # must not raise
    assert 1 <= len(C) <= 8
    assert np.isfinite(C).all()


# ---------------------------------------------------------------------------
# two-level (node-major) direct exchange: bit-identical to the flat wire
# ---------------------------------------------------------------------------

def _rand_graph(root, n=400, m=3000, parts=6):
    import ray.data as rd

    from planar_ray import graph as G

    rng = np.random.default_rng(41)
    # Zipf-ish src skew + uniform dst, self-loops dropped by the builder
    src = (rng.zipf(1.3, m) - 1) % n
    dst = rng.integers(0, n, m)
    ds = rd.from_arrow(pa.table({"src": src.astype(np.int64),
                                 "dst": dst.astype(np.int64)}))
    return G.graph_from_id_edges(ds, root, num_vertices=n, num_parts=parts)


def _vals(state, col="val"):
    df = state.to_pandas().sort_values("v").reset_index(drop=True)
    return df["v"].to_numpy(), df[col].to_numpy()


@pytest.mark.parametrize("groups", [1, 2, 4])  # P=6: even and uneven cuts
def test_grouped_exchange_pagerank_bitexact(tmp_root, groups):
    from planar_ray.kernels import pagerank

    g = _rand_graph(tmp_root + f"/ggrp_pr")
    flat_state, feng = pagerank(g, fixed_iters=8)
    v0, pr0 = _vals(flat_state)
    got_state, geng = pagerank(g, fixed_iters=8, node_groups=groups)
    v1, pr1 = _vals(got_state)
    np.testing.assert_array_equal(v0, v1)
    # same bincount accumulation order per slot -> bitwise identical
    assert (pr0 == pr1).all()
    feng.close(); geng.close()


@pytest.mark.parametrize("fused", [True, False])
def test_grouped_exchange_wcc_lpa_exact(tmp_root, fused):
    from planar_ray.kernels import lpa, wcc

    g = _rand_graph(tmp_root + f"/ggrp_wl_{fused}")
    flat_w, e1 = wcc(g)
    grp_w, e2 = wcc(g, node_groups=2, fused=fused)
    np.testing.assert_array_equal(_vals(flat_w)[1], _vals(grp_w)[1])
    flat_l, e3 = lpa(g, max_iters=6)
    grp_l, e4 = lpa(g, max_iters=6, node_groups=2, fused=fused)
    np.testing.assert_array_equal(_vals(flat_l)[1], _vals(grp_l)[1])
    for e in (e1, e2, e3, e4):
        e.close()


def test_plan_budget_gate_falls_back_bitexact(tmp_root, monkeypatch):
    """PLANAR_PLAN_BYTES_MAX below the plan estimate must disable the
    exchange plan (scatter_raw path) without changing a single bit of
    the PageRank result (the apply-side per-source reduction is
    format-independent)."""
    from planar_ray.kernels import pagerank

    g = _rand_graph(tmp_root + "/gate_pr")
    with_plan, e1 = pagerank(g, fixed_iters=6)
    assert e1._plan_bytes > 0
    monkeypatch.setenv("PLANAR_PLAN_BYTES_MAX", "1")
    gated, e2 = pagerank(g, fixed_iters=6)
    assert e2._plan_refs is None and e2._plan_bytes == 0
    assert (_vals(with_plan)[1] == _vals(gated)[1]).all()
    e1.close(); e2.close()


# ---------------------------------------------------------------------------
# round-4 SQL oracles: minhash / simhash / ngram-jaccard replayed in DuckDB
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.001"


def test_poly_splitmix_hash_matches_duckdb():
    import duckdb

    from planar_ray.pipelines.docs import _hash_sql_ctes
    from planar_ray.util import poly_splitmix_vec

    strs = ["hello", "", "a", "pkg\x1fmod\x1ftok", "z9_", "_pad"]
    got = poly_splitmix_vec(strs, 12345)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{s}')".replace("\x1f", "' || chr(31) || '")
                    for i, s in enumerate(strs)) + ") v(i, s)")
    ctes, fin = _hash_sql_ctes("m", "t", "s", 12345, ["i"])
    want = con.sql("WITH " + ",\n".join(ctes)
                   + f"\nSELECT z FROM {fin} ORDER BY i").df()["z"]
    np.testing.assert_array_equal(got, want.to_numpy().astype(np.uint64))


@pytest.mark.parametrize(
    "q", ["doc_simhash", "doc_ngram_jaccard", "doc_minhash_dedup"])
def test_neardup_suite_matches_sql_oracle(q):
    import duckdb
    import pandas as pd

    from planar_ray.pipelines import docs

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    got = docs.QUERIES[q](SF).to_pandas()
    want = con.sql(docs.ORACLES[q]).df()
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# cli ingest --relabel bfs: end-to-end relabel + lineage + measured win
# ---------------------------------------------------------------------------

def test_cli_ingest_relabel_bfs(tmp_root, capsys):
    import json
    import os

    from planar_ray import cli, graph as G
    from planar_ray.kernels import wcc

    out = tmp_root + "/cli_bfs"
    cli.main(["ingest", "--spec", "tiny", "--out", out, "--parts", "4",
              "--relabel", "bfs"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    lin = rep["relabel"]
    assert os.path.exists(os.path.join(out, "relabel.json"))
    assert os.path.isdir(os.path.join(out, "relabel_rank"))
    # BFS locality must beat the hash-scrambled id ranges on the cut meter
    assert lin["edge_cut_after"] < lin["edge_cut_before"]

    # the relabeled graph runs through the ordinary engine/CLI path...
    g_bfs = G.Graph.load(out, "fwd")
    g_raw = G.Graph.load(os.path.join(out, "pre_relabel"), "fwd")
    assert g_bfs.num_edges == g_raw.num_edges
    # ...with FEWER cross-partition messages: WCC component count is
    # identical and total in-shuffle messages drop (the round-3 measured
    # -2.4x reproduced through the CLI artifact)
    s_raw, e_raw = wcc(g_raw)
    s_bfs, e_bfs = wcc(g_bfs)
    import numpy as np

    n_raw = len(np.unique(s_raw.to_pandas()["val"]))
    n_bfs = len(np.unique(s_bfs.to_pandas()["val"]))
    assert n_raw == n_bfs
    msgs_raw = sum(m.in_msgs for m in e_raw.metrics)
    msgs_bfs = sum(m.in_msgs for m in e_bfs.metrics)
    assert msgs_bfs < msgs_raw
    e_raw.close(); e_bfs.close()


def test_grouped_checkpoint_resume(tmp_root):
    """Checkpoint + resume works identically on the two-level wire: run
    WCC grouped with per-step checkpoints, rebuild a fresh engine, and
    resume from the last manifest to the same labels as an uninterrupted
    run."""
    from planar_ray.kernels.wcc import WCCKernel
    from planar_ray.superstep import Engine

    g = _rand_graph(tmp_root + "/grp_ckpt")
    from planar_ray.graph import derive_direction

    sym = derive_direction(g, "sym")
    run_dir = tmp_root + "/grp_ckpt_run"
    full = Engine(sym, WCCKernel(), node_groups=2, run_dir=run_dir,
                  checkpoint_every=1)
    state = full.run(max_supersteps=50)
    want = _vals(state)[1]
    full.close()
    # fresh engine, resume from the on-disk manifests (simulated kill)
    res = Engine(sym, WCCKernel(), node_groups=2, run_dir=run_dir,
                 checkpoint_every=1)
    state2 = res.run(max_supersteps=50, resume=True)
    np.testing.assert_array_equal(want, _vals(state2)[1])
    man = res.latest_checkpoint()
    assert man is not None
    res.close()


def test_in_msgs_identical_across_wire_formats(tmp_root):
    """in_msgs (a convergence/diagnostic stat) must not depend on the
    wire: plan-dense, plan-sparse (gated off), flat, grouped and dataset
    exchange all count one message per (source partition, vertex)."""
    from planar_ray.kernels import pagerank

    g = _rand_graph(tmp_root + "/imsg")
    runs = {}
    _, e0 = pagerank(g, fixed_iters=4)
    runs["flat_plan"] = [m.in_msgs for m in e0.metrics]
    _, e1 = pagerank(g, fixed_iters=4, node_groups=2)
    runs["grouped_plan"] = [m.in_msgs for m in e1.metrics]
    import os
    os.environ["PLANAR_PLAN_BYTES_MAX"] = "1"
    try:
        _, e2 = pagerank(g, fixed_iters=4)
        runs["flat_raw"] = [m.in_msgs for m in e2.metrics]
        _, e3 = pagerank(g, fixed_iters=4, node_groups=2)
        runs["grouped_raw"] = [m.in_msgs for m in e3.metrics]
    finally:
        del os.environ["PLANAR_PLAN_BYTES_MAX"]
    _, e4 = pagerank(g, fixed_iters=4, exchange="dataset")
    runs["dataset"] = [m.in_msgs for m in e4.metrics]
    want = runs["flat_plan"]
    assert all(v == want for v in runs.values()), runs
    for e in (e0, e1, e2, e3, e4):
        e.close()


# ---------------------------------------------------------------------------
# S8 block-binary payloads (blockbin.py)
# ---------------------------------------------------------------------------

def test_blockbin_roundtrip_and_engine_parity(tmp_root, monkeypatch):
    from planar_ray import blockbin
    from planar_ray.kernels import pagerank

    g = _rand_graph(tmp_root + "/bbin")
    metas = blockbin.convert_graph(g)
    assert len(metas) == g.num_parts
    # roundtrip: bin payload == parquet payload, bit for bit
    for p in range(g.num_parts):
        a = g.load_csr(p)
        b = blockbin.load_csr_bin(g, p)
        np.testing.assert_array_equal(a.indptr, b.indptr)
        np.testing.assert_array_equal(a.indices, b.indices)
        assert a.indices.dtype == b.indices.dtype == np.uint32
    # engine reads the bin payload when asked — identical PageRank
    want, e1 = pagerank(g, fixed_iters=5)
    monkeypatch.setenv("PLANAR_CSR_FORMAT", "bin")
    got, e2 = pagerank(g, fixed_iters=5)
    assert (_vals(want)[1] == _vals(got)[1]).all()
    e1.close(); e2.close()


def test_blockbin_detects_corruption(tmp_root):
    import os

    from planar_ray import blockbin

    g = _rand_graph(tmp_root + "/bbin_bad")
    blockbin.convert_graph(g)
    deg = os.path.join(g.part_dir(0), "blockbin", "degree.bin")
    raw = bytearray(open(deg, "rb").read())
    raw[0] ^= 0xFF  # flip a degree byte
    open(deg, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="disagrees|mismatch"):
        blockbin.read_block_bin(g.part_dir(0))


def test_blockbin_index_layout_exact(tmp_path):
    """index.bin must hold exactly ceil(n/R)+1 offsets — no duplicated
    final entry when R divides n (review finding: indptr[::R] already ends
    at indptr[n] in that case)."""
    import os

    from planar_ray import blockbin

    for n in (128, 130, 64, 1):  # R|n and not
        rng = np.random.default_rng(n)
        deg = rng.integers(0, 5, n)
        indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
        indices = rng.integers(0, 50, int(indptr[-1])).astype(np.uint32)
        pdir = str(tmp_path / f"p{n}")
        blockbin.write_block_bin(pdir, 0, n, indptr, indices,
                                 offset_ratio=64)
        raw = np.fromfile(os.path.join(pdir, "blockbin", "index.bin"),
                          dtype=np.int64)
        assert len(raw) == -(-n // 64) + 1, n
        b, e, ip, ix = blockbin.read_block_bin(pdir)
        np.testing.assert_array_equal(ip, indptr)
        np.testing.assert_array_equal(ix, indices)


def test_blockbin_stale_range_rejected(tmp_root, monkeypatch):
    """A self-consistent blockbin payload whose vertex range disagrees
    with the manifest (stale after an in-place re-ingest) must raise, not
    silently misroute scatter targets."""
    import json
    import os

    from planar_ray import blockbin
    from planar_ray.superstep import _load_csr_arrays

    g = _rand_graph(tmp_root + "/bbin_stale")
    blockbin.convert_graph(g)
    monkeypatch.setenv("PLANAR_CSR_FORMAT", "bin")
    meta = json.load(open(os.path.join(g.part_dir(0), "blockbin",
                                       "meta.json")))
    b, e = meta["begin"], meta["end"]
    # matching manifest range: loads fine
    got = _load_csr_arrays(g.root, g.direction, 0, b, e)
    assert (got[0], got[1]) == (b, e)
    # boundaries shifted since the convert: must refuse
    with pytest.raises(ValueError, match="stale blockbin"):
        _load_csr_arrays(g.root, g.direction, 0, b + 1, e + 1)


def test_group_auto_gate_engages_and_matches_flat(tmp_root, monkeypatch):
    """PLANAR_GROUP_AUTO_P: above the threshold the engine must pick the
    grouped wire by itself (G = alive node count -> 1 here) and stay
    bit-identical to the explicitly-flat run."""
    from planar_ray.kernels import pagerank

    g = _rand_graph(tmp_root + "/auto_gate", parts=6)
    flat, e0 = pagerank(g, fixed_iters=4)  # default: P=6 <= 32, flat
    assert e0._group_cuts is None
    monkeypatch.setenv("PLANAR_GROUP_AUTO_P", "4")
    grouped, e1 = pagerank(g, fixed_iters=4)
    assert e1._group_cuts is not None  # auto-gate engaged (single node -> G=1)
    np.testing.assert_array_equal(_vals(flat)[1], _vals(grouped)[1])
    e0.close(); e1.close()


def test_check_graph_validates_blockbin(tmp_root):
    """cli-check must verify S8 payloads beside the parquet: a stale
    vertex range (meta rewritten) and a corrupt degree file both fail."""
    import json
    import os

    from planar_ray import blockbin
    from planar_ray.inspect_tools import check_graph

    g = _rand_graph(tmp_root + "/bbin_check")
    blockbin.convert_graph(g)
    assert check_graph(g.root)["ok"]
    mpath = os.path.join(g.part_dir(1), "blockbin", "meta.json")
    meta = json.load(open(mpath))
    meta["begin"] += 1; meta["end"] += 1
    json.dump(meta, open(mpath, "w"))
    rep = check_graph(g.root)
    assert not rep["ok"]
    assert any("stale payload" in e for e in rep["errors"])


def test_blockbin_reads_legacy_index_layout(tmp_path):
    """Payloads written before the exact ceil(n/R)+1 layout duplicated
    the final offset when R | n and carry no index_layout field — the
    reader must accept them, not report corruption."""
    import json
    import os

    from planar_ray import blockbin

    n = 128  # 64 | n: legacy layout differs from exact
    rng = np.random.default_rng(0)
    deg = rng.integers(0, 4, n)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    indices = rng.integers(0, 50, int(indptr[-1])).astype(np.uint32)
    pdir = str(tmp_path / "p")
    blockbin.write_block_bin(pdir, 0, n, indptr, indices, offset_ratio=64)
    bdir = os.path.join(pdir, "blockbin")
    # rewrite as a LEGACY payload: duplicated final offset, no layout field
    legacy = np.concatenate([indptr[::64], indptr[-1:]]).astype(np.int64)
    legacy.tofile(os.path.join(bdir, "index.bin"))
    mpath = os.path.join(bdir, "meta.json")
    meta = json.load(open(mpath)); del meta["index_layout"]
    json.dump(meta, open(mpath, "w"))
    b, e, ip, ix = blockbin.read_block_bin(pdir)
    np.testing.assert_array_equal(ip, indptr)
    # but a CLAIMED-exact payload with the legacy index is corrupt
    meta["index_layout"] = "exact"
    json.dump(meta, open(mpath, "w"))
    with pytest.raises(ValueError, match="disagrees"):
        blockbin.read_block_bin(pdir)


def test_blockbin_roundtrip_property(tmp_path):
    """PROPERTY: write_block_bin/read_block_bin roundtrip bit-exactly for
    arbitrary degree sequences, vertex counts and offset ratios (incl.
    R | n, n=0, all-zero degrees)."""
    from hypothesis import given, settings, strategies as st

    from planar_ray import blockbin

    case = [0]

    @given(st.integers(0, 300), st.sampled_from([1, 3, 64, 256]),
           st.integers(0, 6), st.integers(0, 2**31))
    @settings(max_examples=60, deadline=None)
    def check(n, ratio, dmax, seed):
        rng = np.random.default_rng(seed)
        deg = rng.integers(0, dmax + 1, n)
        indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
        indices = rng.integers(0, max(n, 1) * 2,
                               int(indptr[-1])).astype(np.uint32)
        case[0] += 1
        pdir = str(tmp_path / f"c{case[0]}")
        blockbin.write_block_bin(pdir, 0, n, indptr, indices,
                                 offset_ratio=ratio)
        b, e, ip, ix = blockbin.read_block_bin(pdir)
        assert (b, e) == (0, n)
        np.testing.assert_array_equal(ip, indptr)
        np.testing.assert_array_equal(ix, indices)

    check()


def test_dense_rank_int_property(ray_session):
    """PROPERTY: dense_rank_int == rank in the sorted distinct key set,
    for arbitrary int64 keys (negative, sparse 64-bit, duplicated)."""
    import ray.data as rd
    from hypothesis import given, settings, strategies as st

    from planar_ray.graph import dense_rank_int

    @given(st.lists(st.integers(-2**40, 2**62), min_size=1, max_size=60))
    @settings(max_examples=12, deadline=None)
    def check(keys):
        ds = rd.from_arrow(pa.table({"key": pa.array(keys, pa.int64())}))
        got = dense_rank_int(ds).to_pandas().sort_values("key")
        uniq = sorted(set(keys))
        assert got["key"].tolist() == uniq
        assert got["v"].tolist() == list(range(len(uniq)))

    check()


def test_cli_run_checkpoint_resume_e2e(tmp_root, capsys):
    """North-rule resume path at the CLI surface: cap supersteps with
    --iters (operator interruption), then --resume continues from the
    checkpoint to convergence rather than restarting."""
    import json as _json

    from planar_ray import cli

    out = tmp_root + "/cli_resume_g"
    run_dir = tmp_root + "/cli_resume_run"
    cli.main(["ingest", "--spec", "tiny", "--out", out, "--parts", "4"])
    capsys.readouterr()
    # uninterrupted reference run
    cli.main(["run", "--kernel", "pagerank", "--graph", out])
    full = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # interrupted: 3 supersteps, checkpoint every step
    cli.main(["run", "--kernel", "pagerank", "--graph", out,
              "--run-dir", run_dir, "--checkpoint-every", "1",
              "--iters", "3"])
    part = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert part["supersteps"] == 3
    # resume: continues (strictly fewer steps than the full run) and
    # converges to the same delta regime
    cli.main(["run", "--kernel", "pagerank", "--graph", out,
              "--run-dir", run_dir, "--checkpoint-every", "1", "--resume"])
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < res["supersteps"] < full["supersteps"]
    assert res["supersteps"] + 3 <= full["supersteps"] + 1
    assert res["metrics_tail"][-1]["max_delta"] <= 1e-6
