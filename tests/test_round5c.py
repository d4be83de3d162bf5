"""Round-5 session-c additions: semi/anti hash-bucket join modes, the
relational Q3/semi/anti driver queries, and the g4 layered graph."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _two_tables():
    import ray.data as rd

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 40, 300)
    left = rd.from_arrow(pa.table({
        "k": lk, "lv": np.arange(300, dtype=np.int64)}))
    rk = rng.integers(20, 60, 120)  # overlaps [20, 40)
    right = rd.from_arrow(pa.table({
        "rk": rk, "rv": np.arange(120, dtype=np.int64)}))
    return left, right, lk, set(rk.tolist())


def test_semi_join_membership_exact():
    from planar_ray.joins import hash_bucket_join

    left, right, lk, rkeys = _two_tables()
    out = hash_bucket_join(left, right, "k", "rk", how="semi").to_pandas()
    # exactly the left rows whose key appears on the right, NO duplication
    want = int(np.isin(lk, list(rkeys)).sum())
    assert len(out) == want
    assert sorted(out.columns) == ["k", "lv"]
    assert set(out["k"]).issubset(rkeys)
    assert out["lv"].is_unique


def test_anti_join_complement_exact():
    from planar_ray.joins import hash_bucket_join

    left, right, lk, rkeys = _two_tables()
    semi = hash_bucket_join(left, right, "k", "rk", how="semi").to_pandas()
    anti = hash_bucket_join(left, right, "k", "rk", how="anti").to_pandas()
    assert len(semi) + len(anti) == 300
    assert not (set(anti["k"]) & rkeys)
    assert sorted(anti.columns) == ["k", "lv"]
    # lv partitions exactly: every left row lands on one side
    assert sorted(semi["lv"].tolist() + anti["lv"].tolist()) \
        == list(range(300))


def test_anti_join_empty_right_bucket_keeps_left():
    """Buckets with zero right rows must pass their left rows through."""
    import ray.data as rd

    from planar_ray.joins import hash_bucket_join

    left = rd.from_arrow(pa.table({
        "k": np.arange(100, dtype=np.int64),
        "lv": np.arange(100, dtype=np.int64)}))
    right = rd.from_arrow(pa.table({"rk": np.array([3], dtype=np.int64)}))
    anti = hash_bucket_join(left, right, "k", "rk", how="anti").to_pandas()
    assert len(anti) == 99 and 3 not in set(anti["k"])


SF = "/root/testdata/sf0.001"


def _duck(sql):
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "events",
              "part", "supplier", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(sql).df()


@pytest.mark.parametrize("name", ["q3_shipping", "orders_semijoin",
                                  "cust_antijoin", "q9_profit"])
def test_relational_round5c_oracle_parity(name):
    from planar_ray.pipelines import relational as R

    got = R.QUERIES[name](SF).to_pandas()
    want = _duck(R.ORACLES[name])
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)
    assert len(g) > 0, f"{name} degenerate (empty result proves nothing)"


def test_doc_dedup_keep_best_consistent_with_parts():
    """The composite must agree with its two ingredient queries:
    groups from doc_minhash_dedup, winner quality from doc_quality."""
    from planar_ray.pipelines.docs import (
        q_doc_dedup_keep_best,
        q_doc_minhash_dedup,
        q_doc_quality,
    )

    kept = q_doc_dedup_keep_best(SF).to_pandas()
    groups = q_doc_minhash_dedup(SF).to_pandas()
    qual = q_doc_quality(SF).to_pandas().set_index("doc_id")["quality"]

    assert kept["n_docs"].sum() == len(groups)
    sizes = groups.groupby("group_rep").size()
    assert set(kept["group_rep"]) == set(sizes.index)
    by_rep = groups.groupby("group_rep")["doc_id"].apply(set)
    for rep, n, kid, kq in kept[["group_rep", "n_docs", "kept_doc_id",
                                 "kept_quality"]].itertuples(index=False):
        members = by_rep[rep]
        assert len(members) == n
        assert kid in members
        assert abs(qual[kid] - kq) < 1e-9
        # the winner really is argmax quality (ties -> min doc_id)
        best = max(members, key=lambda d: (qual[d], -d))
        assert kid == best


def test_events_funnel_oracle_parity_and_semantics():
    import duckdb

    from planar_ray.pipelines import events as EV

    got = EV.QUERIES["events_funnel"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.sql(EV.ORACLES["events_funnel"]).df()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    # semantics: stage timestamps strictly increase while present
    for _, r in got.iterrows():
        ts = [r[f"t_{s}"] for s in EV.FUNNEL]
        present = [t for t in ts if t >= 0]
        assert len(present) == r["stage"]
        assert present == sorted(present)
        # a missing stage means everything after it is missing too
        seen_gap = False
        for t in ts:
            if t < 0:
                seen_gap = True
            else:
                assert not seen_gap


def test_modularity_broadcast_and_join_paths_agree():
    from planar_ray.pipelines.testdata_graph import q_g2_modularity

    bcast = q_g2_modularity(SF).to_pydict()
    joined = q_g2_modularity(SF, broadcast_threshold=0).to_pydict()
    assert bcast == joined


def test_g4_graph_is_layered():
    """Every cross-block edge points to a strictly higher block; every
    block's ring stays inside the block."""
    from planar_ray.pipelines.testdata_graph import (
        G4_BLOCK,
        SCC_MOD,
        g4_edge_ids,
    )

    e = g4_edge_ids(SF).to_pandas()
    s, d = e["src"].to_numpy(), e["dst"].to_numpy()
    assert s.max() < SCC_MOD and d.max() < SCC_MOD
    bs, bd = s // G4_BLOCK, d // G4_BLOCK
    same = bs == bd
    # intra-block edges are exactly the +1 ring
    blk = (s[same] // G4_BLOCK) * G4_BLOCK
    assert ((d[same] - blk) == ((s[same] - blk) + 1) % G4_BLOCK).all()
    # cross edges strictly ascend
    assert (bd[~same] > bs[~same]).all()
    # both kinds exist (non-degenerate)
    assert same.sum() > 0 and (~same).sum() > 0


@pytest.mark.parametrize("seed,V,E", [(1, 80, 200), (2, 500, 2000)])
def test_dag_depth_matches_oracle(tmp_root, seed, V, E):
    """Random DAG (edges forced low->high id) — kernel == numpy fixpoint."""
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.dagdepth import dag_depth, dag_depth_oracle

    rng = np.random.default_rng(seed)
    a = rng.integers(0, V, E)
    b = rng.integers(0, V, E)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    keep = lo != hi
    edges = np.unique(np.stack([lo[keep], hi[keep]], 1), axis=0)
    ds = rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]}))
    g = partition_edges(ds, f"{tmp_root}/dag{seed}", V, num_parts=3,
                        direction="fwd")
    state, eng = dag_depth(g)
    got = state.select_columns(["v", "val"]).to_pandas()
    depth = np.zeros(V, dtype=np.int64)
    depth[got["v"].to_numpy()] = got["val"].to_numpy()
    want = dag_depth_oracle(edges, V)
    assert (depth == want).all()
    # convergence bound: longest path + 1 supersteps
    assert len(eng.metrics) <= want.max() + 2


def test_dag_depth_raises_on_cycle(tmp_root):
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.kernels.dagdepth import dag_depth

    edges = np.array([[0, 1], [1, 2], [2, 0]])
    ds = rd.from_arrow(pa.table({"src": edges[:, 0], "dst": edges[:, 1]}))
    g = partition_edges(ds, f"{tmp_root}/dagcyc", 3, num_parts=1,
                        direction="fwd")
    with pytest.raises(RuntimeError, match="not a DAG"):
        dag_depth(g, max_rounds=25)


def test_g4_condensation_nonempty_and_acyclic():
    from planar_ray.pipelines.testdata_graph import q_g4_condensation

    dag = q_g4_condensation(SF).to_pandas()
    assert len(dag) > 0
    # the condensation of any digraph is a DAG: Kahn's peel must consume
    # every node
    nodes = sorted(set(dag["src_scc"]) | set(dag["dst_scc"]))
    succ = {n: set() for n in nodes}
    indeg = {n: 0 for n in nodes}
    for a, b in zip(dag["src_scc"], dag["dst_scc"]):
        if b not in succ[a]:
            succ[a].add(b)
            indeg[b] += 1
    frontier = [n for n in nodes if indeg[n] == 0]
    seen = 0
    while frontier:
        n = frontier.pop()
        seen += 1
        for m in succ[n]:
            indeg[m] -= 1
            if indeg[m] == 0:
                frontier.append(m)
    assert seen == len(nodes), "condensation contains a cycle"
