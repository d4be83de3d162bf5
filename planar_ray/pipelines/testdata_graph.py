"""Driver-checkable graph pipelines over the TPC-H-ish testdata tables.

The engine's own input is the synthetic code corpus (FIXTURES.md), but the
driver's correctness gate compares Ray pipelines against DuckDB SQL over
the pre-registered testdata views. These adapters derive two deterministic
graphs from those tables and run every kernel on them, with a SQL oracle
string generated next to each pipeline:

* **g1** (directed, bipartite, has dangling vertices): customer -> order,
  node ids encoded ``custkey`` and ``1_000_000 + orderkey``;
* **g2** (undirected): part co-occurrence — parts appearing in the same
  order are connected; both directions stored, so the fwd graph is
  symmetric.

Node ids are compacted with the ORDER-PRESERVING dense rank
(graph.dense_rank_int), so internal-id comparisons (WCC min labels, LPA
tie-breaks) coincide with raw-key comparisons and the SQL oracle can
reproduce them on the raw keys. Results are keyed by ``node_key`` strings
('c123' / 'o45' / 'p7') and floats are rounded to 6 digits on BOTH sides
so the driver's value-hash comparison is stable.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count

from ..graph import (
    Graph,
    degrees_dataset,
    dense_rank_int,
    graph_from_id_edges,
    partition_edges,
)
from ..joins import hash_bucket_join
from ..kernels import khop_counts, lpa, pagerank, sssp, triangle_count, wcc
from ..kernels.sssp import INF

ORDER_OFFSET = 1_000_000
PR_ITERS = 20
LPA_ITERS = 4
KHOP_K = 3
SSSP_CAP = 30
WCC_UNROLL = 20  # oracle unroll for min-label propagation (>= graph diameter)


def _cache_root(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(
        os.environ.get("PLANAR_RAY_CACHE", "/tmp/planar_ray_cache"), "testdata", tag
    )


def _read(sf_dir: str, table: str, columns: list[str]) -> Dataset:
    from ..util import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, f"{table}.parquet"),
                              columns=columns)


# ---------------------------------------------------------------------------
# graph construction (cached per sf_dir)
# ---------------------------------------------------------------------------

def g1_edge_ids(sf_dir: str) -> Dataset:
    """customer -> order edges with encoded int node ids."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    return orders.map_batches(
        lambda t: pa.table(
            {
                "src": t["o_custkey"].combine_chunks().cast(pa.int64()),
                "dst": pc.add(t["o_orderkey"], ORDER_OFFSET).combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def g2_edge_ids(sf_dir: str) -> Dataset:
    """Part co-occurrence (same order) — symmetric directed edge table."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    li = li.groupby(["l_orderkey", "l_partkey"]).aggregate(
        Count(alias_name="_n")
    ).select_columns(["l_orderkey", "l_partkey"])
    right = li.map_batches(
        lambda t: pa.table({"okey": t["l_orderkey"], "pk2": t["l_partkey"]}),
        batch_format="pyarrow",
    )
    pairs = hash_bucket_join(li, right, left_on="l_orderkey", right_on="okey")

    def canon(t: pa.Table) -> pa.Table:
        a = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["pk2"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a < b
        return pa.table({"src": pa.array(a[keep]), "dst": pa.array(b[keep])})

    canon_pairs = pairs.map_batches(canon, batch_format="pyarrow")
    canon_pairs = canon_pairs.groupby(["src", "dst"]).aggregate(
        Count(alias_name="_n")
    ).select_columns(["src", "dst"])
    # symmetrise: both directions stored -> fwd graph is the undirected graph
    return canon_pairs.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays([t["src"].combine_chunks(), t["dst"].combine_chunks()]),
                "dst": pa.concat_arrays([t["dst"].combine_chunks(), t["src"].combine_chunks()]),
            }
        ),
        batch_format="pyarrow",
    )


SCC_MOD = 500  # g3 node space: two functional maps over [0, SCC_MOD)


def g3_edge_ids(sf_dir: str) -> Dataset:
    """Directed graph WITH cycles for SCC (g1 is acyclic-bipartite, g2
    symmetric): the union of two functional maps over a mod-SCC_MOD id
    space — (o % M) -> ((o*37+11) % M) and ((c*13+5) % M) -> (o % M) —
    self-loops dropped, exact dedup. Functional-graph unions are
    rho-shaped and SCC-rich; the rule is trivially SQL-expressible."""
    M = SCC_MOD
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def f(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        a, b, c = ok % M, (ok * 37 + 11) % M, (ck * 13 + 5) % M
        src = np.concatenate([a, c])
        dst = np.concatenate([b, a])
        keep = src != dst
        pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
        return pa.table({"src": pa.array(pairs[:, 0]),
                         "dst": pa.array(pairs[:, 1])})

    e = orders.map_batches(f, batch_format="pyarrow")
    return e.groupby(["src", "dst"]).aggregate(
        Count(alias_name="_n")).select_columns(["src", "dst"])


G4_BLOCK = 50  # g4: SCC_MOD // G4_BLOCK ring-blocks + upward cross edges


def g4_edge_ids(sf_dir: str) -> Dataset:
    """Layered cyclic graph for condensation tests: nodes [0, SCC_MOD)
    split into SCC_MOD/G4_BLOCK blocks; each block carries a +1 ring
    (cycle => the block is one SCC once all residues appear) and each
    node u adds a cross edge u -> (u*13+7) % SCC_MOD kept only when it
    lands in a STRICTLY HIGHER block — so cross-SCC edges form a DAG
    and the condensation is non-trivial (unlike g3, which is one giant
    SCC at sf>=0.01)."""
    M, B = SCC_MOD, G4_BLOCK
    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def f(t: pa.Table) -> pa.Table:
        u = (t["o_orderkey"].to_numpy(zero_copy_only=False)
             .astype(np.int64) % M)
        ring = (u // B) * B + ((u % B) + 1) % B
        w = (u * 13 + 7) % M
        up = (w // B) > (u // B)
        src = np.concatenate([u, u[up]])
        dst = np.concatenate([ring, w[up]])
        pairs = np.unique(np.stack([src, dst], 1), axis=0)
        return pa.table({"src": pa.array(pairs[:, 0]),
                         "dst": pa.array(pairs[:, 1])})

    e = orders.map_batches(f, batch_format="pyarrow")
    return e.groupby(["src", "dst"]).aggregate(
        Count(alias_name="_n")).select_columns(["src", "dst"])


def _build(sf_dir: str, which: str) -> tuple[Graph, Dataset]:
    """Build (or reload) the compacted graph + id dictionary for g1/g2/g3."""
    import ray.data as rd

    root = os.path.join(_cache_root(sf_dir), which)
    dict_dir = os.path.join(root, "iddict")
    if os.path.exists(os.path.join(root, "meta_fwd.json")) and os.path.isdir(dict_dir):
        return Graph.load(root, "fwd"), rd.read_parquet(dict_dir)

    edges = {"g1": g1_edge_ids, "g2": g2_edge_ids,
             "g3": g3_edge_ids, "g4": g4_edge_ids}[which](sf_dir).materialize()
    keys = edges.map_batches(
        lambda t: pa.table(
            {"key": pa.concat_arrays(
                [t["src"].combine_chunks(), t["dst"].combine_chunks()])}
        ),
        batch_format="pyarrow",
    )
    iddict = dense_rank_int(keys).materialize()
    num_vertices = iddict.count()
    mapped = hash_bucket_join(edges, iddict, left_on="src", right_on="key")
    mapped = mapped.map_batches(
        lambda t: pa.table({"src": t["v"], "dst": t["dst"]}), batch_format="pyarrow"
    )
    mapped = hash_bucket_join(mapped, iddict, left_on="dst", right_on="key")
    mapped = mapped.map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["v"]}), batch_format="pyarrow"
    )
    os.makedirs(root, exist_ok=True)
    # the reload gate is (meta_fwd.json AND iddict dir) — stage the
    # dictionary in a tmp dir and rename it into place LAST, so a crash
    # anywhere mid-build can never leave a state that passes the gate
    # with a partial (or, on rebuild, duplicated) dictionary
    import shutil

    shutil.rmtree(dict_dir, ignore_errors=True)
    tmp_dir = dict_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    iddict.write_parquet(tmp_dir)
    g = partition_edges(mapped, root, num_vertices, num_parts=4, direction="fwd")
    os.rename(tmp_dir, dict_dir)  # commit marker
    return g, iddict


def _format_keys(keys: np.ndarray) -> list[str]:
    out = []
    for k in keys:
        k = int(k)
        out.append(f"o{k - ORDER_OFFSET}" if k >= ORDER_OFFSET else (f"c{k}"))
    return out


def _format_keys_p(keys: np.ndarray) -> list[str]:
    return [f"p{int(k)}" for k in keys]


def _attach_key(ds: Dataset, iddict: Dataset, on: str, out_name: str) -> Dataset:
    """Map an internal-id column back to its raw key via the dictionary."""
    flip = iddict.map_batches(
        lambda t: pa.table({"_vid": t["v"], "_rawkey": t["key"]}),
        batch_format="pyarrow",
    )
    j = hash_bucket_join(ds, flip, left_on=on, right_on="_vid")
    return j.map_batches(
        lambda t: t.append_column(out_name, t["_rawkey"]).drop_columns(["_rawkey"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# queries (each returns a pyarrow table; names match the SQL oracle exactly)
# ---------------------------------------------------------------------------

def q_g1_degree(sf_dir: str) -> pa.Table:
    g, iddict = _build(sf_dir, "g1")
    deg = degrees_dataset(g)
    withkey = _attach_key(deg, iddict, "v", "rawkey")
    tab = withkey.to_pandas()
    return pa.table(
        {
            "node_key": pa.array(_format_keys(tab["rawkey"].to_numpy())),
            "outdeg": pa.array(tab["outdeg"].to_numpy().astype(np.int64)),
        }
    )


CSV_DST_MOD = 1024  # csv_degree edge rule: dst = o_orderkey % MOD


def q_csv_degree(sf_dir: str) -> pa.Table:
    """S1/S2 exercised THROUGH the raw-CSV converter path
    (ingest.graph_from_csv): the orders table is streamed out as a
    comma-separated edge list (src=o_custkey, dst=o_orderkey % MOD; one
    shard per block, header per shard), read back with the CSV ingest
    (self-loop drop, order-preserving dense compaction, multi-edges
    kept), and out-degrees come from the partitioned CSRs. The SQL twin
    reproduces the compaction with dense_rank() OVER (ORDER BY key)."""
    import shutil
    import tempfile

    from .. import ingest

    work = tempfile.mkdtemp(prefix="planar_csvdeg_")
    try:
        orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
        def to_edges(t: pa.Table) -> pa.Table:
            ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table({
                "src": t["o_custkey"].cast(pa.int64()),
                "dst": pa.array((ok % CSV_DST_MOD).astype(np.int64)),
            })

        edges = orders.map_batches(to_edges, batch_format="pyarrow")
        csv_dir = os.path.join(work, "csv")
        edges.write_csv(csv_dir)
        g = ingest.graph_from_csv(csv_dir, os.path.join(work, "g"),
                                  header=True, num_parts=4)
        deg = degrees_dataset(g).to_pandas().sort_values("v")
        return pa.table({
            "v": pa.array(deg["v"].to_numpy().astype(np.int64)),
            "outdeg": pa.array(deg["outdeg"].to_numpy().astype(np.int64)),
        })
    finally:
        shutil.rmtree(work, ignore_errors=True)


SQL_CSV_DEGREE = f"""
WITH e AS (
  SELECT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey % {CSV_DST_MOD} AS BIGINT) AS dst
  FROM orders
  WHERE o_custkey <> o_orderkey % {CSV_DST_MOD}
),
k AS (
  SELECT DISTINCT key
  FROM (SELECT src AS key FROM e UNION ALL SELECT dst AS key FROM e)
),
m AS (
  SELECT key, CAST(dense_rank() OVER (ORDER BY key) - 1 AS BIGINT) AS v
  FROM k
)
SELECT m.v AS v, CAST(COUNT(e.src) AS BIGINT) AS outdeg
FROM m LEFT JOIN e ON e.src = m.key
GROUP BY m.v
"""


def _pagerank_table(sf_dir: str, which: str, fmt) -> pa.Table:
    g, iddict = _build(sf_dir, which)
    state, _eng = pagerank(g, fixed_iters=PR_ITERS)
    vals = state.select_columns(["v", "val"])
    withkey = _attach_key(vals, iddict, "v", "rawkey")
    tab = withkey.to_pandas()
    return pa.table(
        {
            "node_key": pa.array(fmt(tab["rawkey"].to_numpy())),
            "score": pa.array(np.round(tab["val"].to_numpy(), 6)),
        }
    )


def q_g1_pagerank(sf_dir: str) -> pa.Table:
    return _pagerank_table(sf_dir, "g1", _format_keys)


def q_g2_pagerank(sf_dir: str) -> pa.Table:
    return _pagerank_table(sf_dir, "g2", _format_keys_p)


def q_g2_wcc(sf_dir: str) -> pa.Table:
    g, iddict = _build(sf_dir, "g2")
    state, _eng = wcc(g)
    vals = state.select_columns(["v", "val"])
    withv = _attach_key(vals, iddict, "v", "vkey")
    withc = _attach_key(withv, iddict, "val", "ckey")
    tab = withc.to_pandas()
    return pa.table(
        {
            "node_key": pa.array(_format_keys_p(tab["vkey"].to_numpy())),
            "component": pa.array(_format_keys_p(tab["ckey"].to_numpy())),
        }
    )


def q_g2_wcc_contract(sf_dir: str) -> pa.Table:
    """Contracting WCC (supervertex contraction every 2 supersteps —
    the K9/K15 edge-mutation path, reference wcc_app_op.h Contract):
    identical fixpoint labels, shares SQL_G2_WCC."""
    g, iddict = _build(sf_dir, "g2")
    state, _eng = wcc(g, contract_every=2)
    vals = state.select_columns(["v", "val"])
    withv = _attach_key(vals, iddict, "v", "vkey")
    withc = _attach_key(withv, iddict, "val", "ckey")
    tab = withc.to_pandas()
    return pa.table(
        {
            "node_key": pa.array(_format_keys_p(tab["vkey"].to_numpy())),
            "component": pa.array(_format_keys_p(tab["ckey"].to_numpy())),
        }
    )


def q_g2_wcc_narrow(sf_dir: str) -> pa.Table:
    """Narrow vertex-state WCC (labels stored uint16/uint32, reference
    core/common/types.h VertexData variants): bit-identical labels,
    shares SQL_G2_WCC."""
    g, iddict = _build(sf_dir, "g2")
    state, _eng = wcc(g, narrow=True)
    vals = state.select_columns(["v", "val"]).map_batches(
        lambda t: pa.table({"v": t["v"],
                            "val": pc.cast(t["val"], pa.int64())}),
        batch_format="pyarrow",
    )
    withv = _attach_key(vals, iddict, "v", "vkey")
    withc = _attach_key(withv, iddict, "val", "ckey")
    tab = withc.to_pandas()
    return pa.table(
        {
            "node_key": pa.array(_format_keys_p(tab["vkey"].to_numpy())),
            "component": pa.array(_format_keys_p(tab["ckey"].to_numpy())),
        }
    )


def q_g2_wcc_asp(sf_dir: str) -> pa.Table:
    """ASP-mode WCC (local fixpoint per partition per superstep,
    kernels/wcc.AspWCCKernel) — converges to the same labels as q_g2_wcc
    in fewer supersteps; shares SQL_G2_WCC."""
    from ..kernels.wcc import wcc_asp

    g, iddict = _build(sf_dir, "g2")
    state, _eng = wcc_asp(g)
    vals = state.select_columns(["v", "val"])
    withv = _attach_key(vals, iddict, "v", "vkey")
    withc = _attach_key(withv, iddict, "val", "ckey")
    tab = withc.to_pandas()
    return pa.table(
        {
            "node_key": pa.array(_format_keys_p(tab["vkey"].to_numpy())),
            "component": pa.array(_format_keys_p(tab["ckey"].to_numpy())),
        }
    )


def q_g2_sssp_asp(sf_dir: str) -> pa.Table:
    """ASP-mode SSSP (local Bellman-Ford per partition per superstep) —
    same converged hop distances as q_g2_sssp; shares SQL_G2_SSSP."""
    from ..kernels.sssp import sssp_asp

    g, iddict = _build(sf_dir, "g2")
    state, _eng = sssp_asp(g, source=0, max_supersteps=SSSP_CAP)
    reach = state.map_batches(
        lambda t: t.filter(pc.less(t["val"], int(INF))).select(["v", "val"]),
        batch_format="pyarrow",
    )
    withkey = _attach_key(reach, iddict, "v", "rawkey")
    tab = withkey.to_pandas()
    return pa.table(
        {
            "node_key": pa.array(_format_keys_p(tab["rawkey"].to_numpy())),
            "dist": pa.array(tab["val"].to_numpy().astype(np.int64)),
        }
    )


def q_g2_lpa(sf_dir: str) -> pa.Table:
    g, iddict = _build(sf_dir, "g2")
    state, _eng = lpa(g, max_iters=LPA_ITERS)
    vals = state.select_columns(["v", "val"])
    withv = _attach_key(vals, iddict, "v", "vkey")
    withl = _attach_key(withv, iddict, "val", "lkey")
    tab = withl.to_pandas()
    return pa.table(
        {
            "node_key": pa.array(_format_keys_p(tab["vkey"].to_numpy())),
            "label": pa.array(_format_keys_p(tab["lkey"].to_numpy())),
        }
    )


def q_g2_triangles(sf_dir: str) -> pa.Table:
    g, _ = _build(sf_dir, "g2")
    n = triangle_count(g)
    return pa.table({"triangles": pa.array([n], pa.int64())})


def q_g2_sssp(sf_dir: str) -> pa.Table:
    g, iddict = _build(sf_dir, "g2")
    state, _eng = sssp(g, source=0, max_supersteps=SSSP_CAP)  # id 0 = min key
    reach = state.map_batches(
        lambda t: t.filter(pc.less(t["val"], int(INF))).select(["v", "val"]),
        batch_format="pyarrow",
    )
    withkey = _attach_key(reach, iddict, "v", "rawkey")
    tab = withkey.to_pandas()
    return pa.table(
        {
            "node_key": pa.array(_format_keys_p(tab["rawkey"].to_numpy())),
            "dist": pa.array(tab["val"].to_numpy().astype(np.int64)),
        }
    )


def q_g2_khop(sf_dir: str) -> pa.Table:
    g, _ = _build(sf_dir, "g2")
    reach, _eng = khop_counts(g, source=0, k=KHOP_K)
    tab = reach.to_pandas().sort_values("val")
    return pa.table(
        {
            "dist": pa.array(tab["val"].to_numpy().astype(np.int64)),
            "n": pa.array(tab["count()"].to_numpy().astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# SQL oracles (DuckDB, over the pre-registered testdata views)
# ---------------------------------------------------------------------------

_G1_BASE = f"""
edges AS MATERIALIZED (
  SELECT CAST(o_custkey AS BIGINT) AS src,
         CAST({ORDER_OFFSET} + o_orderkey AS BIGINT) AS dst
  FROM orders GROUP BY 1, 2),
nodes AS MATERIALIZED (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
deg AS MATERIALIZED (
  SELECT n.v, COUNT(e.src) AS outdeg
  FROM nodes n LEFT JOIN edges e ON e.src = n.v GROUP BY n.v)
"""

_G2_BASE = """
pairs AS MATERIALIZED (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
edges AS MATERIALIZED (SELECT CAST(a AS BIGINT) AS src, CAST(b AS BIGINT) AS dst FROM pairs
          UNION ALL
          SELECT CAST(b AS BIGINT), CAST(a AS BIGINT) FROM pairs),
nodes AS MATERIALIZED (SELECT DISTINCT src AS v FROM edges),
deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS outdeg FROM edges GROUP BY src)
"""

_KEY_G1 = (
    f"CASE WHEN v >= {ORDER_OFFSET} THEN 'o' || CAST(v - {ORDER_OFFSET} AS VARCHAR) "
    "ELSE 'c' || CAST(v AS VARCHAR) END"
)


def _pr_sql(base: str, key_expr: str, iters: int) -> str:
    ctes = [
        "nv AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes)",
        "pr0 AS MATERIALIZED (SELECT d.v, d.outdeg, 1.0 / nv.n AS pr FROM deg d, nv)",
    ]
    for i in range(1, iters + 1):
        p = f"pr{i - 1}"
        ctes.append(
            f"pr{i} AS MATERIALIZED ("
            f" SELECT d.v, d.outdeg,"
            f"  0.15 / nv.n + 0.85 * (COALESCE(m.s, 0)"
            f"   + (SELECT COALESCE(SUM(pr), 0) FROM {p} WHERE outdeg = 0) / nv.n) AS pr"
            f" FROM deg d CROSS JOIN nv"
            f" LEFT JOIN (SELECT e.dst AS v, SUM(p.pr / p.outdeg) AS s"
            f"            FROM edges e JOIN {p} p ON p.v = e.src GROUP BY e.dst) m"
            f"   ON m.v = d.v)"
        )
    return (
        "WITH " + base.strip().rstrip() + ",\n"
        + ",\n".join(ctes)
        + f"\nSELECT {key_expr} AS node_key, ROUND(pr, 6) AS score FROM pr{iters}"
    )


def _wcc_sql(unroll: int = WCC_UNROLL) -> str:
    ctes = ["lab0 AS MATERIALIZED (SELECT v, v AS label FROM nodes)"]
    for i in range(1, unroll + 1):
        p = f"lab{i - 1}"
        ctes.append(
            f"lab{i} AS MATERIALIZED ("
            f" SELECT n.v, LEAST(l.label, COALESCE(m.mn, l.label)) AS label"
            f" FROM nodes n JOIN {p} l ON l.v = n.v"
            f" LEFT JOIN (SELECT e.dst AS v, MIN(p.label) AS mn"
            f"            FROM edges e JOIN {p} p ON p.v = e.src GROUP BY e.dst) m"
            f"   ON m.v = n.v)"
        )
    return (
        "WITH " + _G2_BASE.strip() + ",\n" + ",\n".join(ctes)
        + f"\nSELECT 'p' || CAST(v AS VARCHAR) AS node_key,"
        f" 'p' || CAST(label AS VARCHAR) AS component FROM lab{unroll}"
    )


def _lpa_ctes(iters: int = LPA_ITERS) -> list[str]:
    ctes = ["lab0 AS MATERIALIZED (SELECT v, v AS label FROM nodes)"]
    for i in range(1, iters + 1):
        p = f"lab{i - 1}"
        ctes.append(
            f"lab{i} AS MATERIALIZED ("
            f" SELECT n.v, COALESCE(w.label, l.label) AS label"
            f" FROM nodes n JOIN {p} l ON l.v = n.v"
            f" LEFT JOIN ("
            f"   SELECT v, label FROM ("
            f"     SELECT e.dst AS v, p.label, COUNT(*) AS c,"
            f"            ROW_NUMBER() OVER (PARTITION BY e.dst"
            f"                               ORDER BY COUNT(*) DESC, p.label ASC) AS rn"
            f"     FROM edges e JOIN {p} p ON p.v = e.src"
            f"     GROUP BY e.dst, p.label)"
            f"   WHERE rn = 1) w ON w.v = n.v)"
        )
    return ctes


def _lpa_sql(iters: int = LPA_ITERS) -> str:
    return (
        "WITH " + _G2_BASE.strip() + ",\n" + ",\n".join(_lpa_ctes(iters))
        + f"\nSELECT 'p' || CAST(v AS VARCHAR) AS node_key,"
        f" 'p' || CAST(label AS VARCHAR) AS label FROM lab{iters}"
    )


SQL_G1_DEGREE = (
    "WITH " + _G1_BASE.strip()
    + f"\nSELECT {_KEY_G1} AS node_key, CAST(outdeg AS BIGINT) AS outdeg FROM deg"
)

SQL_G1_PAGERANK = _pr_sql(_G1_BASE, _KEY_G1, PR_ITERS)
SQL_G2_PAGERANK = _pr_sql(_G2_BASE, "'p' || CAST(v AS VARCHAR)", PR_ITERS)
SQL_G2_WCC = _wcc_sql()
SQL_G2_LPA = _lpa_sql()

SQL_G2_TRIANGLES = (
    "WITH " + _G2_BASE.strip() + ",\n"
    + """o AS MATERIALIZED (
  SELECT CASE WHEN (da.outdeg < db.outdeg)
               OR (da.outdeg = db.outdeg AND p.a < p.b) THEN p.a ELSE p.b END AS x,
         CASE WHEN (da.outdeg < db.outdeg)
               OR (da.outdeg = db.outdeg AND p.a < p.b) THEN p.b ELSE p.a END AS y
  FROM pairs p JOIN deg da ON da.v = p.a JOIN deg db ON db.v = p.b)
SELECT CAST(COUNT(*) AS BIGINT) AS triangles
FROM o e1 JOIN o e2 ON e2.x = e1.x AND e1.y < e2.y
JOIN pairs pr ON pr.a = LEAST(e1.y, e2.y) AND pr.b = GREATEST(e1.y, e2.y)"""
)

SQL_G2_SSSP = (
    "WITH RECURSIVE " + _G2_BASE.strip() + ",\n"
    + f"""walk(v, d) AS (
  SELECT (SELECT MIN(v) FROM nodes), 0
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.v
  WHERE w.d < {SSSP_CAP})
SELECT 'p' || CAST(v AS VARCHAR) AS node_key, CAST(MIN(d) AS BIGINT) AS dist
FROM walk GROUP BY v"""
)

SQL_G2_KHOP = (
    "WITH RECURSIVE " + _G2_BASE.strip() + ",\n"
    + f"""walk(v, d) AS (
  SELECT (SELECT MIN(v) FROM nodes), 0
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.v
  WHERE w.d < {KHOP_K})
SELECT CAST(dist AS BIGINT) AS dist, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT v, MIN(d) AS dist FROM walk GROUP BY v) GROUP BY dist"""
)


def q_g2_hop_extrema(sf_dir: str) -> pa.Table:
    """Per-vertex 1-hop and 2-hop min/max neighbour ids — the reference's
    NVMe precomputing pipeline (/root/reference/nvme/precomputing/
    basic.h:26-283, two_hop_neighbor.h) as two groupbys + one join."""
    from ray.data.aggregate import Max as AMax, Min as AMin

    e = g2_edge_ids(sf_dir).materialize()
    h1 = e.groupby("src").aggregate(
        AMin(on="dst", alias_name="min1"), AMax(on="dst", alias_name="max1")
    ).materialize()
    withh = hash_bucket_join(e, h1, left_on="dst", right_on="src")
    h2 = withh.groupby("src").aggregate(
        AMin(on="min1", alias_name="min2"), AMax(on="max1", alias_name="max2")
    )
    both = hash_bucket_join(h1, h2, left_on="src", right_on="src")
    tab = both.to_pandas().sort_values("src")
    return pa.table(
        {
            "node_key": pa.array(_format_keys_p(tab["src"].to_numpy())),
            "min1": pa.array(tab["min1"].astype("int64")),
            "max1": pa.array(tab["max1"].astype("int64")),
            "min2": pa.array(tab["min2"].astype("int64")),
            "max2": pa.array(tab["max2"].astype("int64")),
        }
    )


SQL_G2_HOP_EXTREMA = (
    "WITH " + _G2_BASE.strip() + ",\n"
    + """h1 AS MATERIALIZED (
  SELECT src, MIN(dst) AS min1, MAX(dst) AS max1 FROM edges GROUP BY src),
h2 AS (
  SELECT e.src, MIN(h.min1) AS min2, MAX(h.max1) AS max2
  FROM edges e JOIN h1 h ON h.src = e.dst GROUP BY e.src)
SELECT 'p' || CAST(h1.src AS VARCHAR) AS node_key,
       CAST(h1.min1 AS BIGINT) AS min1, CAST(h1.max1 AS BIGINT) AS max1,
       CAST(h2.min2 AS BIGINT) AS min2, CAST(h2.max2 AS BIGINT) AS max2
FROM h1 JOIN h2 ON h2.src = h1.src"""
)


# ---------------------------------------------------------------------------
# A5/A6/A7/A9/A10 driver queries (coloring, MST, random walk, GNN, seeded
# WCC) with trajectory-exact SQL oracles. All of them work in the dense
# INTERNAL id space, which SQL reproduces exactly with
# ROW_NUMBER() OVER (ORDER BY v) - 1 (dense_rank_int is order-preserving);
# "random" choices use splitmix64, replicated in SQL via HUGEINT
# mod-2^64 arithmetic (_sql_mix).
# ---------------------------------------------------------------------------

COLOR_ROUNDS = 20
MST_ROUNDS = 12
MST_JUMPS = 12
RW_LEN = 5
GNN_LAYERS = 2

_M64 = 1 << 64
_B32 = 1 << 32
_C1, _C2, _C3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

_IDS_CTE = """
ids AS MATERIALIZED (SELECT v, ROW_NUMBER() OVER (ORDER BY v) - 1 AS id FROM nodes),
iedges AS MATERIALIZED (
  SELECT a.id AS src, b.id AS dst FROM edges e
  JOIN ids a ON a.v = e.src JOIN ids b ON b.v = e.dst)
"""


def _sql_mulmod(z: str, c: int) -> str:
    """(z * c) mod 2^64 without INT128 overflow: 32-bit split multiply."""
    return (f"CAST(((CAST({z} AS HUGEINT) % {_B32}) * {c} + "
            f"((CAST({z} AS HUGEINT) // {_B32}) * {c} % {_B32}) * {_B32})"
            f" % {_M64} AS UBIGINT)")


def _sql_mix(prefix: str, src: str, in_expr: str, keep: list[str]) -> tuple[list[str], str]:
    """CTE chain computing z = splitmix64(in_expr) (verified bit-exact
    against util.splitmix64). Returns (ctes, final_cte_name)."""
    kc = (", ".join(keep) + ", ") if keep else ""
    ctes = [
        f"{prefix}a AS (SELECT {kc}CAST(((CAST({in_expr} AS HUGEINT) + {_C1})"
        f" % {_M64}) AS UBIGINT) AS z FROM {src})",
        f"{prefix}b AS (SELECT {kc}xor(z, z >> 30) AS z FROM {prefix}a)",
        f"{prefix}c AS (SELECT {kc}{_sql_mulmod('z', _C2)} AS z FROM {prefix}b)",
        f"{prefix}d AS (SELECT {kc}xor(z, z >> 27) AS z FROM {prefix}c)",
        f"{prefix}e AS (SELECT {kc}{_sql_mulmod('z', _C3)} AS z FROM {prefix}d)",
        f"{prefix}f AS (SELECT {kc}xor(z, z >> 31) AS z FROM {prefix}e)",
    ]
    return ctes, f"{prefix}f"


def q_g2_coloring(sf_dir: str) -> pa.Table:
    from ..kernels import coloring

    g, iddict = _build(sf_dir, "g2")
    state, _eng = coloring(g, max_supersteps=COLOR_ROUNDS)
    vals = state.select_columns(["v", "val"])
    withkey = _attach_key(vals, iddict, "v", "rawkey")
    tab = withkey.to_pandas()
    return pa.table(
        {
            "node_key": pa.array(_format_keys_p(tab["rawkey"].to_numpy())),
            "color": pa.array(tab["val"].to_numpy().astype(np.int64)),
        }
    )


def _coloring_sql(rounds: int = COLOR_ROUNDS) -> str:
    from ..kernels.coloring import MIX_K, RAND_MAX

    ctes = ["col0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS c FROM ids)"]
    for i in range(1, rounds + 1):
        rnd = i - 1  # kernel superstep index
        p = f"col{i - 1}"
        ctes.append(
            f"cf{i} AS (SELECT DISTINCT e.src AS id FROM iedges e"
            f" JOIN {p} cu ON cu.id = e.src JOIN {p} cw ON cw.id = e.dst"
            f" WHERE e.dst > e.src AND cu.c = cw.c)"
        )
        mix, fin = _sql_mix(f"cm{i}", f"cf{i}",
                            f"(CAST(id AS HUGEINT) * {MIX_K} + {rnd}) % {_M64}",
                            ["id"])
        ctes.extend(mix)
        ctes.append(
            f"inc{i} AS (SELECT id, CAST(z % {RAND_MAX} AS BIGINT) + 1 AS inc"
            f" FROM {fin})"
        )
        ctes.append(
            f"col{i} AS MATERIALIZED (SELECT c0.id, c0.c + COALESCE(i.inc, 0) AS c"
            f" FROM {p} c0 LEFT JOIN inc{i} i ON i.id = c0.id)"
        )
    return (
        "WITH " + _G2_BASE.strip() + ",\n" + _IDS_CTE.strip() + ",\n"
        + ",\n".join(ctes)
        + f"\nSELECT 'p' || CAST(n.v AS VARCHAR) AS node_key, c.c AS color"
        f" FROM col{rounds} c JOIN ids n ON n.id = c.id"
    )


def q_g2_mst(sf_dir: str) -> pa.Table:
    from ..kernels import boruvka

    g, iddict = _build(sf_dir, "g2")
    _labels, fedges = boruvka(g)
    import ray.data as rd

    fe = rd.from_arrow(pa.table({
        "src": pa.array(fedges["src"].to_numpy().astype(np.int64)),
        "dst": pa.array(fedges["dst"].to_numpy().astype(np.int64)),
    }))  # typed arrow, no pandas schema metadata
    fe = _attach_key(fe, iddict, "src", "skey")
    fe = _attach_key(fe, iddict, "dst", "dkey")
    tab = fe.to_pandas().sort_values(["skey", "dkey"])
    return pa.table(
        {
            "src_key": pa.array(_format_keys_p(tab["skey"].to_numpy())),
            "dst_key": pa.array(_format_keys_p(tab["dkey"].to_numpy())),
        }
    )


def _mst_sql(rounds: int = MST_ROUNDS, jumps: int = MST_JUMPS) -> str:
    """Unrolled Borůvka replaying kernels/mst.boruvka exactly: per round a
    per-component min-(ekey,to) choice (window), deterministic 2-cycle
    break to the smaller id, pointer-jump DOUBLING (log-depth), label
    update. Distinct ekeys => the minimum spanning forest is unique."""
    ctes = [
        "nvt AS (SELECT COUNT(*) AS nv FROM ids)",
        "uedges AS MATERIALIZED (SELECT src AS a, dst AS b,"
        " src * nv + dst AS ekey FROM iedges, nvt WHERE src < dst)",
        "lab0 AS MATERIALIZED (SELECT id, id AS label FROM ids)",
    ]
    forests = []
    for r in range(rounds):
        p = f"lab{r}"
        ctes.append(
            f"cr{r} AS MATERIALIZED (SELECT u.a, u.b, u.ekey, la.label AS ls,"
            f" lb.label AS ld FROM uedges u"
            f" JOIN {p} la ON la.id = u.a JOIN {p} lb ON lb.id = u.b"
            f" WHERE la.label <> lb.label)"
        )
        ctes.append(
            f"both{r} AS (SELECT ls AS comp, ld AS t, ekey FROM cr{r}"
            f" UNION ALL SELECT ld, ls, ekey FROM cr{r})"
        )
        ctes.append(
            f"ch{r} AS MATERIALIZED (SELECT comp, t, ekey FROM ("
            f"SELECT comp, t, ekey, ROW_NUMBER() OVER (PARTITION BY comp"
            f" ORDER BY ekey, t) AS rn FROM both{r}) WHERE rn = 1)"
        )
        forests.append(f"SELECT ekey FROM ch{r}")
        ctes.append(
            f"j{r}_0 AS MATERIALIZED (SELECT c.comp,"
            f" CASE WHEN q.t = c.comp AND q.comp = c.t"
            f" THEN LEAST(c.comp, c.t) ELSE c.t END AS par"
            f" FROM ch{r} c LEFT JOIN ch{r} q ON q.comp = c.t)"
        )
        for k in range(jumps):
            ctes.append(
                f"j{r}_{k + 1} AS MATERIALIZED (SELECT a.comp, COALESCE(b.par, a.par) AS par"
                f" FROM j{r}_{k} a LEFT JOIN j{r}_{k} b ON b.comp = a.par)"
            )
        ctes.append(
            f"lab{r + 1} AS MATERIALIZED (SELECT l.id, COALESCE(j.par, l.label) AS label"
            f" FROM {p} l LEFT JOIN j{r}_{jumps} j ON j.comp = l.label)"
        )
    ctes.append("forest AS (SELECT DISTINCT ekey FROM ("
                + " UNION ALL ".join(forests) + "))")
    return (
        "WITH " + _G2_BASE.strip() + ",\n" + _IDS_CTE.strip() + ",\n"
        + ",\n".join(ctes)
        + "\nSELECT 'p' || CAST(sa.v AS VARCHAR) AS src_key,"
        " 'p' || CAST(sb.v AS VARCHAR) AS dst_key"
        " FROM (SELECT ekey // nv AS said, ekey % nv AS sbid FROM forest, nvt) f"
        " JOIN ids sa ON sa.id = f.said"
        " JOIN ids sb ON sb.id = f.sbid"
    )


def q_g2_randomwalk(sf_dir: str) -> pa.Table:
    from ..kernels import random_walk

    g, iddict = _build(sf_dir, "g2")
    walks = random_walk(g, L=RW_LEN)
    walks = _attach_key(walks, iddict, "origin", "okey")
    walks = _attach_key(walks, iddict, "final_v", "fkey")
    tab = walks.to_pandas().sort_values("okey")
    return pa.table(
        {
            "node_key": pa.array(_format_keys_p(tab["okey"].to_numpy())),
            "final_key": pa.array(_format_keys_p(tab["fkey"].to_numpy())),
        }
    )


def _randomwalk_sql(L: int = RW_LEN) -> str:
    from ..kernels.randomwalk import MIX_K

    ctes = [
        "adj AS MATERIALIZED (SELECT src, dst, ROW_NUMBER() OVER"
        " (PARTITION BY src ORDER BY dst) - 1 AS idx FROM iedges)",
        "degt AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg"
        " FROM iedges GROUP BY src)",
        "w0 AS (SELECT id AS origin, id AS cur FROM ids)",
    ]
    for i in range(L):
        mix, fin = _sql_mix(f"rm{i}", "ids",
                            f"(CAST(id AS HUGEINT) * {MIX_K} + {i}) % {_M64}",
                            ["id"])
        ctes.extend(mix)
        ctes.append(
            f"nx{i} AS (SELECT d.id, a.dst AS nxt FROM degt d"
            f" JOIN {fin} m ON m.id = d.id"
            f" JOIN adj a ON a.src = d.id"
            f" AND a.idx = CAST(m.z % CAST(d.deg AS UBIGINT) AS BIGINT))"
        )
        ctes.append(
            f"w{i + 1} AS MATERIALIZED (SELECT w.origin, COALESCE(n.nxt, w.cur) AS cur"
            f" FROM w{i} w LEFT JOIN nx{i} n ON n.id = w.cur)"
        )
    return (
        "WITH " + _G2_BASE.strip() + ",\n" + _IDS_CTE.strip() + ",\n"
        + ",\n".join(ctes)
        + f"\nSELECT 'p' || CAST(o.v AS VARCHAR) AS node_key,"
        f" 'p' || CAST(fv.v AS VARCHAR) AS final_key"
        f" FROM w{L} w JOIN ids o ON o.id = w.origin"
        f" JOIN ids fv ON fv.id = w.cur"
    )


def q_g2_gnn(sf_dir: str) -> pa.Table:
    from ..kernels import gnn
    from ..kernels.gnn import FDIM

    g, iddict = _build(sf_dir, "g2")
    state, _eng = gnn(g, layers=GNN_LAYERS)
    cols = ["v"] + [f"f{j}" for j in range(FDIM)]
    vals = state.select_columns(cols)
    withkey = _attach_key(vals, iddict, "v", "rawkey")
    tab = withkey.to_pandas()
    out = {"node_key": pa.array(_format_keys_p(tab["rawkey"].to_numpy()))}
    for j in range(FDIM):
        out[f"f{j}"] = pa.array(np.round(tab[f"f{j}"].to_numpy(), 6))
    return pa.table(out)


def _gnn_sql(layers: int = GNN_LAYERS) -> str:
    from ..kernels.gnn import FDIM, _weights

    seed = 17
    # feature init: x = (id*2654435761 + seed*97+j) mod 2^64;
    # x = (x ^ (x>>16)) * 0x45D9F3B mod 2^64; f = (x % 10000) / 10000
    init_x = ", ".join(
        f"CAST(((CAST(id AS HUGEINT) * 2654435761 + {seed * 97 + j}) % {_M64})"
        f" AS UBIGINT) AS x{j}"
        for j in range(FDIM)
    )
    # 0x45D9F3B < 2^27 and x < 2^64 -> direct HUGEINT product fits
    mix_x = ", ".join(
        f"CAST((CAST(xor(x{j}, x{j} >> 16) AS HUGEINT) * {0x45D9F3B}) % {_M64}"
        f" AS UBIGINT) AS x{j}"
        for j in range(FDIM)
    )
    feat0 = ", ".join(
        f"CAST(x{j} % 10000 AS DOUBLE) / 10000.0 AS f{j}" for j in range(FDIM)
    )
    ctes = [
        "degt AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg"
        " FROM iedges GROUP BY src)",
        f"g0 AS (SELECT id, {init_x} FROM ids)",
        f"g1 AS (SELECT id, {mix_x} FROM g0)",
        f"feat0 AS (SELECT id, {feat0} FROM g1)",
    ]
    for layer in range(layers):
        W, b = _weights(layer, seed)
        aggs = ", ".join(
            f"SUM(f.f{j} / d.deg) AS a{j}" for j in range(FDIM)
        )
        ctes.append(
            f"agg{layer} AS (SELECT e.dst AS id, {aggs} FROM iedges e"
            f" JOIN feat{layer} f ON f.id = e.src"
            f" JOIN degt d ON d.id = e.src GROUP BY e.dst)"
        )
        outs = []
        for j in range(FDIM):
            lin = " + ".join(
                f"({W[j][k]!r}) * COALESCE(a.a{k}, 0.0)" for k in range(FDIM)
            )
            outs.append(f"1.0 / (1.0 + exp(-({lin} + ({b[j]!r})))) AS f{j}")
        ctes.append(
            f"feat{layer + 1} AS MATERIALIZED (SELECT i.id, {', '.join(outs)}"
            f" FROM ids i LEFT JOIN agg{layer} a ON a.id = i.id)"
        )
    sel = ", ".join(f"ROUND(f.f{j}, 6) AS f{j}" for j in range(FDIM))
    return (
        "WITH " + _G2_BASE.strip() + ",\n" + _IDS_CTE.strip() + ",\n"
        + ",\n".join(ctes)
        + f"\nSELECT 'p' || CAST(n.v AS VARCHAR) AS node_key, {sel}"
        f" FROM feat{layers} f JOIN ids n ON n.id = f.id"
    )


def q_g2_wcc_precomp(sf_dir: str) -> pa.Table:
    """A10: hop-extrema-seeded WCC — same fixpoint (and same oracle) as
    plain WCC, fewer supersteps."""
    from ..kernels import wcc_precomputed

    g, iddict = _build(sf_dir, "g2")
    state, _eng = wcc_precomputed(g)
    vals = state.select_columns(["v", "val"])
    withv = _attach_key(vals, iddict, "v", "vkey")
    withc = _attach_key(withv, iddict, "val", "ckey")
    tab = withc.to_pandas()
    return pa.table(
        {
            "node_key": pa.array(_format_keys_p(tab["vkey"].to_numpy())),
            "component": pa.array(_format_keys_p(tab["ckey"].to_numpy())),
        }
    )


SQL_G2_COLORING = _coloring_sql()
SQL_G2_MST = _mst_sql()
SQL_G2_RANDOMWALK = _randomwalk_sql()
SQL_G2_GNN = _gnn_sql()


KCORE_K = 80        # peels ~5 rounds with a nontrivial core at sf0.01/0.1
KCORE_UNROLL = 10   # SQL peel rounds; Ray side asserts supersteps <= this
                    # (extra SQL rounds past the fixpoint are no-ops)


def q_g2_kcore(sf_dir: str) -> pa.Table:
    """k-core peel (kernels/kcore.py) on the symmetric g2 graph: emits
    every vertex with its core membership flag and, for members, the
    degree inside the core."""
    from ..kernels.kcore import kcore

    g, iddict = _build(sf_dir, "g2")
    state, eng = kcore(g, KCORE_K, max_iters=KCORE_UNROLL + 1)
    steps = eng.metrics if isinstance(eng.metrics, int) else len(eng.metrics)
    if steps > KCORE_UNROLL:
        raise RuntimeError(
            f"kcore peel took {steps} rounds > SQL unroll {KCORE_UNROLL}")
    vals = state.select_columns(["v", "val", "alive"])
    withkey = _attach_key(vals, iddict, "v", "rawkey")
    tab = withkey.to_pandas()
    alive = tab["alive"].to_numpy().astype(bool)
    coredeg = np.where(alive, tab["val"].to_numpy(), 0.0).astype(np.int64)
    return pa.table({
        "node_key": pa.array(_format_keys_p(tab["rawkey"].to_numpy())),
        "in_core": pa.array(alive.astype(np.int64)),
        "coredeg": pa.array(coredeg),
    })


def _kcore_sql(k: int = KCORE_K, unroll: int = KCORE_UNROLL) -> str:
    ctes = [f"alive0 AS MATERIALIZED (SELECT v FROM deg WHERE outdeg >= {k})"]
    for i in range(1, unroll + 1):
        p = f"alive{i - 1}"
        ctes.append(
            f"alive{i} AS MATERIALIZED ("
            f" SELECT a.v FROM {p} a"
            f" JOIN edges e ON e.src = a.v"
            f" JOIN {p} b ON b.v = e.dst"
            f" GROUP BY a.v HAVING COUNT(*) >= {k})"
        )
    fin = f"alive{unroll}"
    return (
        "WITH " + _G2_BASE.strip() + ",\n" + ",\n".join(ctes) + ",\n"
        f"coredeg AS (SELECT a.v, COUNT(*) AS c FROM {fin} a"
        f" JOIN edges e ON e.src = a.v JOIN {fin} b ON b.v = e.dst"
        f" GROUP BY a.v)\n"
        "SELECT 'p' || CAST(n.v AS VARCHAR) AS node_key,"
        " CAST(CASE WHEN f.v IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_core,"
        " CAST(COALESCE(c.c, 0) AS BIGINT) AS coredeg"
        f" FROM nodes n LEFT JOIN {fin} f ON f.v = n.v"
        " LEFT JOIN coredeg c ON c.v = n.v"
    )


SQL_G2_KCORE = _kcore_sql()


CORENESS_UNROLL = 20  # SQL h-index rounds; the Ray side asserts it
                      # converged within this many updates


def q_g2_coreness(sf_dir: str) -> pa.Table:
    """Full coreness decomposition (kernels/coreness.py, distributed
    h-index iteration) on the symmetric g2 graph — every vertex's core
    number in ONE run, vs q_g2_kcore's single fixed-k peel. The h-index
    operator is monotone non-increasing from degree init, so the SQL
    twin (the same update unrolled CORENESS_UNROLL times) reaches the
    identical fixpoint whenever the kernel converges within the unroll
    budget — asserted here, so a slow-converging input fails loudly
    instead of hash-mismatching."""
    from ..kernels.coreness import coreness

    g, iddict = _build(sf_dir, "g2")
    state, eng = coreness(g, max_iters=CORENESS_UNROLL + 1)
    if eng.metrics[-1].changed != 0:
        raise RuntimeError(
            f"coreness did not converge within {CORENESS_UNROLL + 1} "
            "supersteps — raise CORENESS_UNROLL")
    vals = state.select_columns(["v", "val"])
    withkey = _attach_key(vals, iddict, "v", "rawkey")
    tab = withkey.to_pandas()
    return pa.table({
        "node_key": pa.array(_format_keys_p(tab["rawkey"].to_numpy())),
        "coreness": pa.array(tab["val"].to_numpy().astype(np.int64)),
    })


def _coreness_sql(unroll: int = CORENESS_UNROLL) -> str:
    ctes = ["cor0 AS MATERIALIZED "
            "(SELECT v, CAST(outdeg AS BIGINT) AS c FROM deg)"]
    for i in range(1, unroll + 1):
        p = f"cor{i - 1}"
        ctes.append(
            f"h{i} AS (SELECT dst AS v, MAX(LEAST(cval, rn)) AS h FROM ("
            f" SELECT e.dst, c.c AS cval,"
            f" ROW_NUMBER() OVER (PARTITION BY e.dst ORDER BY c.c DESC)"
            f" AS rn FROM edges e JOIN {p} c ON c.v = e.src) GROUP BY dst)"
        )
        ctes.append(
            f"cor{i} AS MATERIALIZED (SELECT p.v,"
            f" LEAST(p.c, COALESCE(h.h, 0)) AS c"
            f" FROM {p} p LEFT JOIN h{i} h ON h.v = p.v)"
        )
    return (
        "WITH " + _G2_BASE.strip() + ",\n" + ",\n".join(ctes) + "\n"
        "SELECT 'p' || CAST(v AS VARCHAR) AS node_key,"
        f" CAST(c AS BIGINT) AS coreness FROM cor{unroll}"
    )


SQL_G2_CORENESS = _coreness_sql()


WSSSP_UNROLL = 30  # SQL Bellman-Ford rounds; covers shortest paths of up
                   # to this many edges — the Ray side asserts convergence
                   # within the budget

from ..kernels.sssp import WSSSP_WMAX as _WSSSP_WMAX  # noqa: E402
from ..kernels.sssp import _WKEY_C as _WSSSP_KEY_C  # noqa: E402

_WSSSP_INF_SQL = 1 << 40


def q_g2_wsssp(sf_dir: str) -> pa.Table:
    """Weighted SSSP (kernels/sssp.WeightedSSSPKernel) from internal id
    0 on the g2 graph. Edge weights are splitmix64(src*C1+dst) mod
    WMAX + 1 over the COMPACTED ids, so the SQL twin reproduces them
    bit-exactly through the HUGEINT mix chain and an unrolled
    Bellman-Ford reaches the same fixpoint."""
    from ..kernels.sssp import wsssp

    g, iddict = _build(sf_dir, "g2")
    state, eng = wsssp(g, source=0, max_supersteps=WSSSP_UNROLL + 1)
    if eng.metrics[-1].changed != 0:
        raise RuntimeError(
            f"wsssp did not converge within {WSSSP_UNROLL + 1} "
            "supersteps — raise WSSSP_UNROLL")
    reach = state.map_batches(
        lambda t: t.filter(pc.less(t["val"], int(INF))).select(["v", "val"]),
        batch_format="pyarrow",
    )
    withkey = _attach_key(reach, iddict, "v", "rawkey")
    tab = withkey.to_pandas()
    return pa.table({
        "node_key": pa.array(_format_keys_p(tab["rawkey"].to_numpy())),
        "dist": pa.array(tab["val"].to_numpy().astype(np.int64)),
    })


def _wsssp_sql(unroll: int = WSSSP_UNROLL) -> str:
    mix, fin = _sql_mix(
        "ww", "iedges",
        f"(CAST(src AS HUGEINT) * {_WSSSP_KEY_C} + dst) % {_M64}",
        ["src", "dst"])
    big = _WSSSP_INF_SQL
    ctes = list(mix)
    ctes.append(
        f"wedges AS MATERIALIZED (SELECT src, dst,"
        f" CAST(z % {_WSSSP_WMAX} AS BIGINT) + 1 AS w FROM {fin})")
    ctes.append(
        "wd0 AS MATERIALIZED (SELECT id AS v,"
        f" CASE WHEN id = 0 THEN CAST(0 AS BIGINT)"
        f" ELSE CAST({big} AS BIGINT) END AS d FROM ids)")
    for i in range(1, unroll + 1):
        p = f"wd{i - 1}"
        ctes.append(
            f"wd{i} AS MATERIALIZED (SELECT p.v,"
            f" LEAST(p.d, COALESCE(r.m, {big})) AS d"
            f" FROM {p} p LEFT JOIN ("
            f" SELECT e.dst AS v, MIN(q.d + e.w) AS m"
            f" FROM wedges e JOIN {p} q ON q.v = e.src"
            f" WHERE q.d < {big} GROUP BY e.dst) r ON r.v = p.v)"
        )
    return (
        "WITH " + _G2_BASE.strip() + ",\n" + _IDS_CTE.strip() + ",\n"
        + ",\n".join(ctes) + "\n"
        "SELECT 'p' || CAST(i.v AS VARCHAR) AS node_key,"
        f" CAST(d.d AS BIGINT) AS dist FROM wd{unroll} d"
        f" JOIN ids i ON i.id = d.v WHERE d.d < {big}"
    )


SQL_G2_WSSSP = _wsssp_sql()


MIS_UNROLL = 14  # SQL parallel-peel rounds; the Ray side asserts its BSP
                 # superstep count <= this (parallel rounds needed is at
                 # most ceil(supersteps/2)+1; extra SQL rounds are no-ops)


def q_g2_mis(sf_dir: str) -> pa.Table:
    """Maximal independent set (kernels/mis.py) on the symmetric g2
    graph: deterministic-priority Luby peeling, p(v) = splitmix64 of
    the order-preserving internal id. Emits every vertex with its MIS
    membership flag — the unique greedy-by-priority MIS, so the SQL
    twin's parallel-round unroll lands on the same set."""
    from ..kernels.mis import mis

    g, iddict = _build(sf_dir, "g2")
    state, eng = mis(g, max_supersteps=2 * MIS_UNROLL + 2)
    steps = eng.metrics if isinstance(eng.metrics, int) else len(eng.metrics)
    if steps > 2 * MIS_UNROLL:
        raise RuntimeError(
            f"MIS peel took {steps} supersteps > 2*unroll {2 * MIS_UNROLL}")
    vals = state.select_columns(["v", "val"])
    withkey = _attach_key(vals, iddict, "v", "rawkey")
    tab = withkey.to_pandas()
    val = tab["val"].to_numpy().astype(np.int64)
    if (val == 0).any():
        raise RuntimeError("MIS peel left undecided vertices")
    return pa.table({
        "node_key": pa.array(_format_keys_p(tab["rawkey"].to_numpy())),
        "in_mis": pa.array((val == 1).astype(np.int64)),
    })


def _mis_sql(unroll: int = MIS_UNROLL) -> str:
    mix, fin = _sql_mix("mp", "ids", "CAST(id AS HUGEINT)", ["id"])
    ctes = list(mix)
    ctes.append("und0 AS MATERIALIZED (SELECT id FROM ids)")
    ctes.append("mis0 AS (SELECT id FROM ids WHERE 1=0)")
    for i in range(1, unroll + 1):
        p = f"und{i - 1}"
        ctes.append(
            f"newmis{i} AS MATERIALIZED ("
            f" SELECT u.id FROM {p} u JOIN {fin} pu ON pu.id = u.id"
            f" WHERE NOT EXISTS ("
            f"  SELECT 1 FROM iedges e"
            f"  JOIN {p} w ON w.id = e.dst"
            f"  JOIN {fin} pw ON pw.id = e.dst"
            f"  WHERE e.src = u.id AND pw.z < pu.z))")
        ctes.append(
            f"und{i} AS MATERIALIZED ("
            f" SELECT d.id FROM {p} d"
            f" WHERE d.id NOT IN (SELECT id FROM newmis{i})"
            f"  AND d.id NOT IN (SELECT e.dst FROM iedges e"
            f"   JOIN newmis{i} m ON m.id = e.src))")
        ctes.append(
            f"mis{i} AS (SELECT id FROM mis{i - 1}"
            f" UNION ALL SELECT id FROM newmis{i})")
    return (
        "WITH " + _G2_BASE.strip() + ",\n" + _IDS_CTE.strip() + ",\n"
        + ",\n".join(ctes)
        + f"\nSELECT 'p' || CAST(n.v AS VARCHAR) AS node_key,"
        f" CAST(CASE WHEN m.id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_mis"
        f" FROM ids n LEFT JOIN mis{unroll} m ON m.id = n.id"
    )


SQL_G2_MIS = _mis_sql()


def q_g2_clustering(sf_dir: str) -> pa.Table:
    """Per-vertex local clustering coefficient on the symmetric g2
    graph: cc(v) = 2*T(v) / (deg(v)*(deg(v)-1)), T(v) from the oriented
    wedge join (kernels.triangle.triangle_per_vertex — each triangle
    counted once, corners exploded, per-batch combiner before the
    groupby), degrees left-joined so triangle-free vertices emit 0."""
    from ..joins import hash_bucket_join
    from ..kernels.triangle import triangle_per_vertex

    g, iddict = _build(sf_dir, "g2")
    tri = triangle_per_vertex(g)
    deg = degrees_dataset(g)
    j = hash_bucket_join(deg, tri, "v", "v", how="left")
    tab = _attach_key(j, iddict, "v", "rawkey").to_pandas()
    d = tab["outdeg"].to_numpy().astype(np.float64)
    t = tab["tri"].to_numpy()
    t = np.where(np.isnan(t.astype(np.float64)), 0.0, t).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        cc = np.where(d >= 2, np.round(2.0 * t / (d * (d - 1.0)), 6), 0.0)
    return pa.table({
        "node_key": pa.array(_format_keys_p(tab["rawkey"].to_numpy())),
        "tri": pa.array(t.astype(np.int64)),
        "cc": pa.array(cc),
    })


SQL_G2_CLUSTERING = (
    "WITH " + _G2_BASE.strip() + """,
tri AS (
  SELECT e1.src AS v, COUNT(*) AS t
  FROM edges e1
  JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
  JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst
  GROUP BY e1.src)
SELECT 'p' || CAST(d.v AS VARCHAR) AS node_key,
       CAST(COALESCE(t.t, 0) AS BIGINT) AS tri,
       CASE WHEN d.outdeg >= 2
            THEN ROUND(2.0 * COALESCE(t.t, 0)
                       / (d.outdeg * (d.outdeg - 1.0)), 6)
            ELSE 0.0 END AS cc
FROM deg d LEFT JOIN tri t ON t.v = d.v
""")


KTRUSS_K = 5
KTRUSS_UNROLL = 8  # SQL peel rounds; Ray side asserts rounds <= this
                   # (extra SQL rounds past the fixpoint are no-ops)


def q_g2_ktruss(sf_dir: str) -> pa.Table:
    """k-truss (kernels.triangle.ktruss) on the symmetric g2 graph:
    peel edges in < KTRUSS_K-2 triangles to fixpoint; emits each
    surviving vertex with its within-truss degree (count of surviving
    canonical edges at the vertex)."""
    import ray.data as rd

    from ..kernels.triangle import ktruss
    from ..joins import coalesce

    g, iddict = _build(sf_dir, "g2")
    surv, rounds = ktruss(g, KTRUSS_K, max_rounds=KTRUSS_UNROLL + 1)
    if rounds > KTRUSS_UNROLL:
        raise RuntimeError(
            f"ktruss peel took {rounds} rounds > SQL unroll "
            f"{KTRUSS_UNROLL}")

    def ends(t: pa.Table) -> pa.Table:
        v = np.concatenate([t["a"].to_numpy(zero_copy_only=False),
                            t["b"].to_numpy(zero_copy_only=False)])
        uv, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uv),
                         "td": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    deg = coalesce(surv.map_batches(ends, batch_format="pyarrow")) \
        .groupby("v").aggregate(Sum(on="td", alias_name="truss_deg"))
    tab = _attach_key(deg, iddict, "v", "rawkey").to_pandas()
    tab = tab.sort_values("rawkey")
    return pa.table({
        "node_key": pa.array(_format_keys_p(tab["rawkey"].to_numpy())),
        "truss_deg": pa.array(tab["truss_deg"].to_numpy().astype(np.int64)),
    })


def _ktruss_sql(k: int = KTRUSS_K, unroll: int = KTRUSS_UNROLL) -> str:
    need = max(k - 2, 0)
    ctes = ["t0 AS MATERIALIZED (SELECT a, b FROM pairs)"]
    for i in range(1, unroll + 1):
        p = f"t{i - 1}"
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT a AS u, b AS w FROM {p}"
            f" UNION ALL SELECT b, a FROM {p})")
        ctes.append(
            f"supp{i} AS MATERIALIZED ("
            f" SELECT e.a, e.b, COUNT(*) AS c FROM {p} e"
            f" JOIN s{i} s1 ON s1.u = e.a"
            f" JOIN s{i} s2 ON s2.u = e.b AND s2.w = s1.w"
            f" GROUP BY e.a, e.b)")
        ctes.append(
            f"t{i} AS MATERIALIZED ("
            f" SELECT e.a, e.b FROM {p} e"
            f" LEFT JOIN supp{i} x ON x.a = e.a AND x.b = e.b"
            f" WHERE COALESCE(x.c, 0) >= {need})")
    return (
        "WITH " + _G2_BASE.strip() + ",\n" + ",\n".join(ctes)
        + f""",
ends AS (SELECT a AS v FROM t{unroll} UNION ALL SELECT b FROM t{unroll})
SELECT 'p' || CAST(v AS VARCHAR) AS node_key,
       CAST(COUNT(*) AS BIGINT) AS truss_deg
FROM ends GROUP BY v
""")


SQL_G2_KTRUSS = _ktruss_sql()


def q_g2_assortativity(sf_dir: str) -> pa.Table:
    """Degree assortativity of the symmetric g2 graph: the Pearson
    correlation of (deg(src), deg(dst)) over all directed edge rows.

    Plan (scale shape): two bucketed hash joins attach endpoint degrees
    to the edge stream (no broadcast — the degree table never leaves
    the cluster), then each batch reduces to SIX int64 partial sums
    (n, Σx, Σy, Σx², Σy², Σxy); the driver sees one 6-number row per
    block and finishes the correlation in float64."""
    from ..joins import hash_bucket_join

    g, _iddict = _build(sf_dir, "g2")
    deg = degrees_dataset(g)

    def deg_as(name):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"v": t["v"], name: t["outdeg"]})
        return fn

    dx = deg.map_batches(deg_as("dx"), batch_format="pyarrow")
    dy = deg.map_batches(deg_as("dy"), batch_format="pyarrow")
    e = g.edges_dataset().map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
        batch_format="pyarrow")
    j = hash_bucket_join(hash_bucket_join(e, dx, "src", "v"),
                         dy, "dst", "v")

    def partial(t: pa.Table) -> pa.Table:
        x = t["dx"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["dy"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
        })

    # one 6-int row per block -> bounded driver collect
    p = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    n, sx, sy, sxx, syy, sxy = (float(p[c].sum())
                                for c in ("n", "sx", "sy", "sxx", "syy",
                                          "sxy"))
    r = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx)
                               * np.sqrt(n * syy - sy * sy))
    return pa.table({
        "num_edges": pa.array([int(n)], pa.int64()),
        "assortativity": pa.array([float(np.round(r, 6))]),
    })


SQL_G2_ASSORTATIVITY = (
    "WITH " + _G2_BASE.strip() + """,
dj AS (SELECT da.outdeg AS dx, db.outdeg AS dy
       FROM edges e
       JOIN deg da ON da.v = e.src
       JOIN deg db ON db.v = e.dst),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(dx) AS DOUBLE) AS sx,
             CAST(SUM(dy) AS DOUBLE) AS sy,
             CAST(SUM(dx * dx) AS DOUBLE) AS sxx,
             CAST(SUM(dy * dy) AS DOUBLE) AS syy,
             CAST(SUM(dx * dy) AS DOUBLE) AS sxy
      FROM dj)
SELECT CAST(n AS BIGINT) AS num_edges,
       ROUND((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
             6) AS assortativity
FROM s
""")


PPR_ITERS = 10
PPR_SEED_MOD = 97  # seeds: node ids divisible by 97 (customers + orders)


def q_g1_ppr(sf_dir: str) -> pa.Table:
    """Personalized PageRank (kernels/ppr.py) on the customer->order
    graph: teleport mass restricted to nodes whose RAW key id is
    divisible by PPR_SEED_MOD; order nodes are dangling, so the
    dangling-mass-to-seeds path is exercised every round."""
    from ..kernels.ppr import ppr

    g, iddict = _build(sf_dir, "g1")
    def _pick_seeds(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(key % PPR_SEED_MOD == 0))

    seeds = iddict.map_batches(
        _pick_seeds, batch_format="pyarrow",
    ).select_columns(["v"]).to_pandas()["v"].to_numpy()
    state, _eng = ppr(g, seeds, iters=PPR_ITERS)
    vals = state.select_columns(["v", "val"])
    withkey = _attach_key(vals, iddict, "v", "rawkey")
    tab = withkey.to_pandas()
    return pa.table({
        "node_key": pa.array(_format_keys(tab["rawkey"].to_numpy())),
        "score": pa.array(np.round(tab["val"].to_numpy(), 6)),
    })


def _ppr_sql(base: str, key_expr: str, iters: int = PPR_ITERS,
             mod: int = PPR_SEED_MOD) -> str:
    seed_w = "CASE WHEN s.v IS NULL THEN 0.0 ELSE 1.0 / ns.n END"
    ctes = [
        f"seeds AS MATERIALIZED (SELECT v FROM nodes WHERE v % {mod} = 0)",
        "ns AS MATERIALIZED (SELECT COUNT(*) AS n FROM seeds)",
        f"pr0 AS MATERIALIZED (SELECT d.v, d.outdeg, {seed_w} AS pr"
        " FROM deg d LEFT JOIN seeds s ON s.v = d.v CROSS JOIN ns)",
    ]
    for i in range(1, iters + 1):
        p = f"pr{i - 1}"
        ctes.append(
            f"pr{i} AS MATERIALIZED ("
            f" SELECT d.v, d.outdeg,"
            f"  {seed_w} * (0.15 + 0.85 *"
            f"   (SELECT COALESCE(SUM(pr), 0) FROM {p} WHERE outdeg = 0))"
            f"  + 0.85 * COALESCE(m.s, 0) AS pr"
            f" FROM deg d LEFT JOIN seeds s ON s.v = d.v CROSS JOIN ns"
            f" LEFT JOIN (SELECT e.dst AS v, SUM(p.pr / p.outdeg) AS s"
            f"            FROM edges e JOIN {p} p ON p.v = e.src GROUP BY e.dst) m"
            f"   ON m.v = d.v)"
        )
    return (
        "WITH " + base.strip() + ",\n" + ",\n".join(ctes)
        + f"\nSELECT {key_expr} AS node_key, ROUND(pr, 6) AS score FROM pr{iters}"
    )


SQL_G1_PPR = _ppr_sql(_G1_BASE, _KEY_G1)


HITS_ITERS = 5


def q_g1_hits(sf_dir: str) -> pa.Table:
    """HITS on the customer->order graph via the bipartite-lift kernel
    (kernels/hits.py): customers are pure hubs, orders pure
    authorities — the zero halves exercise the lazily-normalised
    update's empty-message paths."""
    # round 5: hits_scores_dataset unpacks the lift distributively (one
    # grouped sum over (v % V)) — no dense V-sized driver arrays
    from ..kernels.hits import hits, hits_scores_dataset

    g, iddict = _build(sf_dir, "g1")
    lift_root = os.path.join(_cache_root(sf_dir), "g1_hits_lift")
    state, _eng, V = hits(g, lift_root, iters=HITS_ITERS)
    scores = hits_scores_dataset(state, V)
    keyed = _attach_key(scores, iddict, "v", "rawkey").to_pandas()
    return pa.table({
        "node_key": pa.array(_format_keys(keyed["rawkey"].to_numpy())),
        "hub": pa.array(np.round(keyed["hub"].to_numpy(), 6)),
        "auth": pa.array(np.round(keyed["auth"].to_numpy(), 6)),
    })


def _hits_sql(base: str, key_expr: str, iters: int = HITS_ITERS) -> str:
    ctes = ["h0 AS MATERIALIZED (SELECT v, 1.0 AS s FROM nodes)"]
    for i in range(1, iters + 1):
        hp, ap = f"h{i - 1}", f"a{i}"
        ctes.append(
            f"a{i} AS MATERIALIZED ("
            f" SELECT n.v, COALESCE(m.s, 0) / (SELECT SUM(s) FROM {hp}) AS s"
            f" FROM nodes n LEFT JOIN ("
            f"   SELECT e.dst AS v, SUM(h.s) AS s FROM edges e"
            f"   JOIN {hp} h ON h.v = e.src GROUP BY e.dst) m ON m.v = n.v)"
        )
        ctes.append(
            f"h{i} AS MATERIALIZED ("
            f" SELECT n.v, COALESCE(m.s, 0) / (SELECT SUM(s) FROM {ap}) AS s"
            f" FROM nodes n LEFT JOIN ("
            f"   SELECT e.src AS v, SUM(a.s) AS s FROM edges e"
            f"   JOIN {ap} a ON a.v = e.dst GROUP BY e.src) m ON m.v = n.v)"
        )
    return (
        "WITH " + base.strip() + ",\n" + ",\n".join(ctes)
        + f"\nSELECT {key_expr} AS node_key, hub, auth FROM ("
        f" SELECT h.v AS v,"
        f"  ROUND(h.s / (SELECT SUM(s) FROM h{iters}), 6) AS hub,"
        f"  ROUND(a.s / (SELECT SUM(s) FROM a{iters}), 6) AS auth"
        f" FROM h{iters} h JOIN a{iters} a ON a.v = h.v)"
    )


SQL_G1_HITS = _hits_sql(_G1_BASE, _KEY_G1)


HARMONIC_PIVOTS = 4


def q_g2_harmonic(sf_dir: str) -> pa.Table:
    """Sampled harmonic centrality — the pivot-BFS composition pattern:
    h(v) = Σ_{s ∈ pivots} 1/d(s,v) over HARMONIC_PIVOTS BFS runs of the
    SSSP kernel (d=0 self terms and unreachable pairs contribute 0).
    Pivots are the smallest dense ids, which the order-preserving rank
    makes exactly the smallest raw keys — the same rule the SQL twin's
    ORDER BY v LIMIT applies. Each pivot is one frontier-kernel run, so
    cost scales linearly in pivots and reuses the engine unchanged."""
    # round 5: the accumulator is a STATE COLUMN threaded between pivot
    # runs (kernels/harmonic.py, initial_state= seeding) — no dense
    # driver-side np.zeros(V); per-vertex accumulation order is pivot
    # order either way, so results are bit-equal to the old form
    from ..kernels.harmonic import harmonic as harmonic_ds

    g, iddict = _build(sf_dir, "g2")
    scores = harmonic_ds(g, HARMONIC_PIVOTS, max_supersteps=SSSP_CAP)
    keyed = _attach_key(scores, iddict, "v", "rawkey").to_pandas()
    return pa.table({
        "node_key": pa.array(_format_keys_p(keyed["rawkey"].to_numpy())),
        "harmonic": pa.array(np.round(keyed["harmonic"].to_numpy(), 6)),
    })


SQL_G2_HARMONIC = (
    "WITH RECURSIVE " + _G2_BASE.strip() + ",\n"
    + f"""piv AS MATERIALIZED (SELECT v FROM nodes ORDER BY v LIMIT {HARMONIC_PIVOTS}),
walk(s, v, d) AS (
  SELECT v, v, 0 FROM piv
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.v
  WHERE w.d < {SSSP_CAP}),
dist AS (SELECT s, v, MIN(d) AS d FROM walk GROUP BY s, v)
SELECT 'p' || CAST(n.v AS VARCHAR) AS node_key,
       ROUND(COALESCE(SUM(CASE WHEN dist.d > 0 THEN 1.0 / dist.d END), 0), 6)
         AS harmonic
FROM nodes n LEFT JOIN dist ON dist.v = n.v
GROUP BY n.v"""
)


def q_g3_scc(sf_dir: str) -> pa.Table:
    """SCC labels over the g3 directed graph via the coloring-algorithm
    kernel pair (kernels/scc.py). Labels are the MAX member id; the
    order-preserving rank makes internal-max == raw-key-max, which the
    SQL twin's mutual-reachability closure computes directly."""
    from ..kernels.scc import scc as scc_run

    g, iddict = _build(sf_dir, "g3")
    labels, _info = scc_run(g)
    keyed = _attach_key(labels, iddict, "v", "rawkey")
    keyed = _attach_key(keyed, iddict, "scc", "scckey").to_pandas()
    return pa.table({
        "node_key": pa.array(
            [f"s{int(k)}" for k in keyed["rawkey"].to_numpy()]),
        "scc_key": pa.array(
            [f"s{int(k)}" for k in keyed["scckey"].to_numpy()]),
    })


SQL_G3_SCC = f"""
WITH RECURSIVE
base AS MATERIALIZED (
  SELECT CAST(o_orderkey % {SCC_MOD} AS BIGINT) AS a,
         CAST((o_orderkey * 37 + 11) % {SCC_MOD} AS BIGINT) AS b,
         CAST((o_custkey * 13 + 5) % {SCC_MOD} AS BIGINT) AS c
  FROM orders),
edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM base WHERE a <> b
  UNION
  SELECT c, a FROM base WHERE c <> a),
nodes AS MATERIALIZED (
  SELECT src AS v FROM edges UNION SELECT dst FROM edges),
reach(s, v) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON e.src = r.v),
mutual AS (
  SELECT r1.s AS v, r1.v AS u
  FROM reach r1 JOIN reach r2 ON r2.s = r1.v AND r2.v = r1.s)
SELECT 's' || CAST(v AS VARCHAR) AS node_key,
       's' || CAST(MAX(u) AS VARCHAR) AS scc_key
FROM mutual GROUP BY v
"""


BETW_PIVOTS = 6
BETW_CAP = 12  # SQL unroll depth; the Ray query RAISES if any pivot's
               # BFS runs deeper (oracle-contract pattern: loud, never
               # silently truncated)


def q_g2_betweenness(sf_dir: str) -> pa.Table:
    """Sampled Brandes betweenness from the BETW_PIVOTS smallest ids
    (kernels/betweenness.py: forward σ-BFS + layered backward
    dependency accumulation, acc threaded across pivots as a state
    column)."""
    from ..kernels.betweenness import betweenness

    g, iddict = _build(sf_dir, "g2")
    bc_ds, _info = betweenness(g, BETW_PIVOTS, max_depth=BETW_CAP)
    keyed = _attach_key(bc_ds, iddict, "v", "rawkey").to_pandas()
    return pa.table({
        "node_key": pa.array(_format_keys_p(keyed["rawkey"].to_numpy())),
        "bc": pa.array(np.round(keyed["bc"].to_numpy(), 6)),
    })


def _betw_sql(cap: int = BETW_CAP, pivots: int = BETW_PIVOTS) -> str:
    """Unrolled Brandes twin: per-layer σ CTEs forward, per-layer δ
    CTEs backward (δ factorised σ_v * Σ (1+δ_w)/σ_w exactly like the
    engine's wire reduction). Layers beyond the true depth are empty
    CTEs; the Ray side raises if the true depth exceeds the unroll."""
    sig = ["sig0 AS MATERIALIZED (SELECT v AS s, v, 1.0 AS sigma FROM piv)"]
    for d in range(1, cap + 1):
        sig.append(
            f"sig{d} AS MATERIALIZED (\n"
            f"  SELECT p.s, e.dst AS v, SUM(p.sigma) AS sigma\n"
            f"  FROM sig{d - 1} p JOIN edges e ON e.src = p.v\n"
            f"  JOIN dist dd ON dd.s = p.s AND dd.v = e.dst AND dd.d = {d}\n"
            f"  GROUP BY p.s, e.dst)")
    sigall = ("sigall AS MATERIALIZED ("
              + " UNION ALL ".join(f"SELECT * FROM sig{d}"
                                   for d in range(cap + 1)) + ")")
    dels = [f"del{cap} AS (SELECT s, v, 0.0 AS delta FROM dist "
            f"WHERE d = {cap})"]
    for d in range(cap - 1, 0, -1):
        dels.append(
            f"del{d} AS MATERIALIZED (\n"
            f"  SELECT dv.s, dv.v, MAX(sv.sigma) * "
            f"SUM((1 + COALESCE(dl.delta, 0)) / sw.sigma) AS delta\n"
            f"  FROM dist dv\n"
            f"  JOIN edges e ON e.src = dv.v\n"
            f"  JOIN dist dw ON dw.s = dv.s AND dw.v = e.dst "
            f"AND dw.d = {d + 1}\n"
            f"  JOIN sigall sw ON sw.s = dv.s AND sw.v = e.dst\n"
            f"  JOIN sigall sv ON sv.s = dv.s AND sv.v = dv.v\n"
            f"  LEFT JOIN del{d + 1} dl ON dl.s = dv.s AND dl.v = e.dst\n"
            f"  WHERE dv.d = {d}\n"
            f"  GROUP BY dv.s, dv.v)")
    alldel = ("alldel AS (" + " UNION ALL ".join(
        f"SELECT * FROM del{d}" for d in range(1, cap + 1)) + ")")
    return (
        "WITH RECURSIVE " + _G2_BASE.strip() + ",\n"
        + f"piv AS MATERIALIZED (SELECT v FROM nodes ORDER BY v "
          f"LIMIT {pivots}),\n"
        + "walk(s, v, d) AS (\n  SELECT v, v, 0 FROM piv\n  UNION\n"
          f"  SELECT w.s, e.dst, w.d + 1 FROM walk w "
          f"JOIN edges e ON e.src = w.v WHERE w.d < {cap}),\n"
        + "dist AS MATERIALIZED (SELECT s, v, MIN(d) AS d FROM walk "
          "GROUP BY s, v),\n"
        + ",\n".join(sig) + ",\n" + sigall + ",\n"
        + ",\n".join(dels) + ",\n" + alldel + "\n"
        + "SELECT 'p' || CAST(n.v AS VARCHAR) AS node_key,\n"
          "       ROUND(COALESCE(SUM(a.delta), 0), 6) AS bc\n"
          "FROM nodes n LEFT JOIN alldel a ON a.v = n.v GROUP BY n.v")


def _argmax_finite_dist(state) -> tuple[int, int]:
    """(max finite dist, min vertex at that dist) via per-batch partials
    — the driver sees one row per block, never the state table."""
    def part(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        d = t["val"].to_numpy(zero_copy_only=False)
        fin = d < INF
        if not fin.any():
            return pa.table({"d": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        dm = int(d[fin].max())
        return pa.table({"d": pa.array([dm], pa.int64()),
                         "v": pa.array([int(v[fin & (d == dm)].min())],
                                       pa.int64())})

    p = state.select_columns(["v", "val"]).map_batches(
        part, batch_format="pyarrow").to_pandas()
    dm = int(p["d"].max())
    return dm, int(p[p["d"] == dm]["v"].min())


def q_g2_diameter(sf_dir: str) -> pa.Table:
    """Double-sweep diameter lower bound: BFS from the min-id vertex,
    then BFS from its farthest vertex (ties -> min id); the second
    eccentricity is the classic lower bound. Two frontier-kernel runs +
    two bounded partial-argmax passes — nothing dense on the driver."""
    g, iddict = _build(sf_dir, "g2")
    st1, _e1 = sssp(g, source=0, max_supersteps=SSSP_CAP)
    _d1, far = _argmax_finite_dist(st1)
    st2, _e2 = sssp(g, source=far, max_supersteps=SSSP_CAP)
    ecc, _v2 = _argmax_finite_dist(st2)
    # map the two endpoint ids back to raw keys (2 bounded lookups)
    import ray.data as rd

    ends = _attach_key(
        rd.from_arrow(pa.table({"v": pa.array([0, far], pa.int64())})),
        iddict, "v", "rawkey").to_pandas().sort_values("v")
    src_k, far_k = [f"p{int(k)}" for k in ends["rawkey"]]
    return pa.table({
        "source_key": pa.array([src_k]),
        "far_key": pa.array([far_k]),
        "diameter_lb": pa.array([ecc], pa.int64()),
    })


SQL_G2_DIAMETER = (
    "WITH RECURSIVE " + _G2_BASE.strip() + ",\n"
    + f"""w1(v, d) AS (
  SELECT (SELECT MIN(v) FROM nodes), 0
  UNION
  SELECT e.dst, w1.d + 1 FROM w1 JOIN edges e ON e.src = w1.v
  WHERE w1.d < {SSSP_CAP}),
d1 AS MATERIALIZED (SELECT v, MIN(d) AS d FROM w1 GROUP BY v),
far AS MATERIALIZED (SELECT v FROM d1 ORDER BY d DESC, v ASC LIMIT 1),
w2(v, d) AS (
  SELECT (SELECT v FROM far), 0
  UNION
  SELECT e.dst, w2.d + 1 FROM w2 JOIN edges e ON e.src = w2.v
  WHERE w2.d < {SSSP_CAP}),
d2 AS (SELECT v, MIN(d) AS d FROM w2 GROUP BY v)
SELECT 'p' || CAST((SELECT MIN(v) FROM nodes) AS VARCHAR) AS source_key,
       'p' || CAST((SELECT v FROM far) AS VARCHAR) AS far_key,
       CAST((SELECT MAX(d) FROM d2) AS BIGINT) AS diameter_lb
""")


AA_TOP_K = 50
AA_BUCKETS = 32
# middle vertices above this degree are EXCLUDED (both sides of the
# oracle): super-hub common neighbors carry ~1/ln(d) ~ 0 signal each and
# their d^2 pair expansion is the only unbounded term — the cap is the
# standard scale guard and bounds per-vertex work at CAP^2
AA_HUB_CAP = 256


def _cn_pair_union(g, weight_of, buckets: int = AA_BUCKETS,
                   hub_cap: int = AA_HUB_CAP):
    """Common-neighbor pair stream over a symmetric graph, shared by the
    link-prediction queries (Adamic-Adar and Jaccard).

    Pair generation runs per CSR partition with NO shuffle — vertices
    are grouped by degree class and each class's neighbor matrix expands
    through one cached triu index pair (fully vectorised, no per-vertex
    Python loop); each common neighbor of degree d contributes
    ``weight_of(d)`` to its (a, b) pair. Canonical edge markers
    (edge=1 rows) ride the same stream so the downstream bucket
    aggregation can drop adjacent pairs. Middle vertices above
    ``hub_cap`` are excluded (their d^2 pair expansion is the only
    unbounded term), so per-vertex work is <= cap^2 and total pair
    volume is bounded by E * cap. Returns the unioned Dataset with a
    ``bucket`` column for ONE bounded pair-hash shuffle."""
    import ray.data as rd

    from ..graph import CSRPart
    from ..util import splitmix64

    boundaries, root, direction = g.boundaries, g.root, g.direction
    P = g.num_parts

    def gen_pairs(batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch["id"].to_numpy():
            p = int(p)
            begin, end = int(boundaries[p]), int(boundaries[p + 1])
            csr = CSRPart.load(
                os.path.join(root, direction, f"part={p:05d}"), begin, end)
            deg = np.diff(csr.indptr)
            idx = csr.indices.astype(np.int64)
            for d in np.unique(deg[(deg >= 2) & (deg <= hub_cap)]):
                vloc = np.flatnonzero(deg == d)
                starts = csr.indptr[vloc]
                # (k, d) neighbor matrix of every degree-d vertex
                mat = idx[(starts[:, None]
                           + np.arange(d)[None, :]).reshape(-1)]
                mat = mat.reshape(len(vloc), d)
                iu, ju = np.triu_indices(d, k=1)
                a = mat[:, iu].reshape(-1)
                b = mat[:, ju].reshape(-1)
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                w = np.full(len(lo), weight_of(float(d)))
                outs.append((lo, hi, w))
        if not outs:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "w": pa.array([], pa.float64()),
                             "edge": pa.array([], pa.int8()),
                             "bucket": pa.array([], pa.int64())})
        lo = np.concatenate([o[0] for o in outs])
        hi = np.concatenate([o[1] for o in outs])
        w = np.concatenate([o[2] for o in outs])
        # per-batch combine (sorted pair groups) before the shuffle
        order = np.lexsort((hi, lo))
        lo, hi, w = lo[order], hi[order], w[order]
        new = np.ones(len(lo), bool)
        new[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        starts = np.flatnonzero(new)
        lo, hi = lo[starts], hi[starts]
        w = np.add.reduceat(w, starts)
        key = splitmix64(lo.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                         ^ hi.astype(np.uint64))
        return pa.table({
            "a": pa.array(lo), "b": pa.array(hi), "w": pa.array(w),
            "edge": pa.array(np.zeros(len(lo), np.int8)),
            "bucket": pa.array(
                (key % np.uint64(buckets)).astype(np.int64)),
        })

    pairs = rd.range(P, override_num_blocks=P).map_batches(
        gen_pairs, batch_format="pyarrow", batch_size=1)

    def edge_markers(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s < d  # canonical orientation of the symmetric store
        s, d = s[keep], d[keep]
        key = splitmix64(s.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                         ^ d.astype(np.uint64))
        return pa.table({
            "a": pa.array(s), "b": pa.array(d),
            "w": pa.array(np.zeros(len(s))),
            "edge": pa.array(np.ones(len(s), np.int8)),
            "bucket": pa.array(
                (key % np.uint64(buckets)).astype(np.int64)),
        })

    markers = g.edges_dataset().map_batches(edge_markers,
                                            batch_format="pyarrow")
    return pairs.union(markers)


def _cn_group_sum(t: pa.Table):
    """Bucket-local combine of the _cn_pair_union stream: sum the pair
    partials, drop pairs carrying an edge marker (adjacent) and zero
    weights; returns numpy (a, b, w) arrays."""
    a = t["a"].to_numpy(zero_copy_only=False)
    b = t["b"].to_numpy(zero_copy_only=False)
    w = t["w"].to_numpy(zero_copy_only=False)
    is_edge = t["edge"].to_numpy(zero_copy_only=False).astype(bool)
    order = np.lexsort((b, a))
    a, b, w, is_edge = a[order], b[order], w[order], is_edge[order]
    new = np.ones(len(a), bool)
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(new)
    ga, gb = a[starts], b[starts]
    gw = np.add.reduceat(w, starts)
    has_edge = np.logical_or.reduceat(is_edge, starts)
    keep = ~has_edge & (gw > 0)
    return ga[keep], gb[keep], gw[keep]


def _cn_format_topk(local, iddict, k: int) -> pa.Table:
    """Driver-side merge of the bounded per-bucket top-k tables: final
    (score desc, raw key) order, internal ids swapped for p-keys."""
    import ray.data as rd

    # internal-id tie-break == raw-key tie-break (order-preserving rank)
    top = local.sort_values(["score", "a", "b"],
                            ascending=[False, True, True]).head(k)
    keyed = rd.from_arrow(pa.Table.from_pandas(top, preserve_index=False))
    keyed = _attach_key(keyed, iddict, "a", "rawa")
    keyed = _attach_key(keyed, iddict, "b", "rawb").to_pandas()
    keyed = keyed.sort_values(["score", "rawa", "rawb"],
                              ascending=[False, True, True])
    return pa.table({
        "node_a": pa.array([f"p{int(x)}" for x in keyed["rawa"]]),
        "node_b": pa.array([f"p{int(x)}" for x in keyed["rawb"]]),
        "score": pa.array(keyed["score"].to_numpy()),
    })


def q_g2_adamic_adar(sf_dir: str) -> pa.Table:
    """Adamic-Adar link prediction over the undirected g2 graph: for
    every NON-adjacent pair (a < b) sharing neighbors, score =
    Σ_{v ∈ N(a)∩N(b)} 1/ln(deg(v)); top-{AA_TOP_K} pairs.

    Plan (scale shape): the _cn_pair_union stream (per-partition
    vectorised pair generation, no shuffle) hash-buckets on the pair,
    ONE bounded shuffle; each bucket sums partials, drops adjacent
    pairs and keeps a local top-K, so the driver sees ≤ buckets*K
    rows. Middle vertices above AA_HUB_CAP are excluded on BOTH sides
    of the oracle (their 1/ln(d) terms are noise and their d^2
    expansion is the only unbounded cost)."""
    g, iddict = _build(sf_dir, "g2")

    def bucket_topk(t: pa.Table) -> pa.Table:
        ga, gb, gw = _cn_group_sum(t)
        gw = np.round(gw, 6)
        top = np.lexsort((gb, ga, -gw))[:AA_TOP_K]
        return pa.table({"a": pa.array(ga[top]), "b": pa.array(gb[top]),
                         "score": pa.array(gw[top])})

    local = _cn_pair_union(
        g, lambda d: 1.0 / np.log(d)).groupby("bucket").map_groups(
        bucket_topk, batch_format="pyarrow").to_pandas()
    return _cn_format_topk(local, iddict, AA_TOP_K)


def q_g2_jaccard(sf_dir: str) -> pa.Table:
    """Jaccard link prediction over the undirected g2 graph: for every
    NON-adjacent pair (a < b) with a common neighbor, score =
    |N(a)∩N(b)| / |N(a)∪N(b)|; top-{AA_TOP_K} pairs.

    Plan (scale shape): common-neighbor counts ride the same
    _cn_pair_union stream as Adamic-Adar (weight 1 per middle vertex,
    ONE bounded pair-hash shuffle, adjacent pairs dropped in the
    bucket combine). Unlike AA the denominator needs |N(a)∪N(b)| =
    deg(a)+deg(b)-common, so the counted pairs take TWO bucketed hash
    joins against the per-partition degree table (V rows, never
    collected to the driver), then a per-block local top-K bounds what
    the driver merges. Middle vertices above AA_HUB_CAP are excluded
    on both sides of the oracle; a/b degrees are full (uncapped)."""
    from ..joins import hash_bucket_join

    g, iddict = _build(sf_dir, "g2")

    def bucket_sum(t: pa.Table) -> pa.Table:
        ga, gb, gw = _cn_group_sum(t)
        return pa.table({"a": pa.array(ga), "b": pa.array(gb),
                         "common": pa.array(gw)})

    cn = _cn_pair_union(g, lambda d: 1.0).groupby("bucket").map_groups(
        bucket_sum, batch_format="pyarrow")

    def deg_as(name):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"v": t["v"],
                             name: t["outdeg"].cast(pa.float64())})
        return fn

    degs = degrees_dataset(g)
    da = degs.map_batches(deg_as("da"), batch_format="pyarrow")
    db = degs.map_batches(deg_as("db"), batch_format="pyarrow")
    joined = hash_bucket_join(
        hash_bucket_join(cn, da, "a", "v"), db, "b", "v")

    def score_topk(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        common = t["common"].to_numpy(zero_copy_only=False)
        dav = t["da"].to_numpy(zero_copy_only=False)
        dbv = t["db"].to_numpy(zero_copy_only=False)
        score = np.round(common / (dav + dbv - common), 6)
        top = np.lexsort((b, a, -score))[:AA_TOP_K]
        return pa.table({"a": pa.array(a[top]), "b": pa.array(b[top]),
                         "score": pa.array(score[top])})

    local = joined.map_batches(
        score_topk, batch_format="pyarrow").to_pandas()
    return _cn_format_topk(local, iddict, AA_TOP_K)


SQL_G2_JACCARD = (
    "WITH " + _G2_BASE.strip() + f""",
mid AS (SELECT v FROM deg WHERE outdeg >= 2 AND outdeg <= {AA_HUB_CAP}),
cn AS (
  SELECT e1.dst AS a, e2.dst AS b, COUNT(*) AS common
  FROM edges e1
  JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
  JOIN mid m ON m.v = e1.src
  GROUP BY e1.dst, e2.dst),
sc AS (
  SELECT c.a, c.b,
         ROUND(CAST(c.common AS DOUBLE)
               / (da.outdeg + db.outdeg - c.common), 6) AS score
  FROM cn c
  JOIN deg da ON da.v = c.a
  JOIN deg db ON db.v = c.b
  LEFT JOIN edges e ON e.src = c.a AND e.dst = c.b
  WHERE e.src IS NULL)
SELECT 'p' || CAST(a AS VARCHAR) AS node_a,
       'p' || CAST(b AS VARCHAR) AS node_b, score
FROM sc ORDER BY score DESC, a, b LIMIT {AA_TOP_K}
""")


SQL_G2_ADAMIC_ADAR = (
    "WITH " + _G2_BASE.strip() + f""",
wt AS (SELECT v, 1.0 / ln(outdeg) AS w FROM deg
       WHERE outdeg >= 2 AND outdeg <= {AA_HUB_CAP}),
aap AS (
  SELECT e1.dst AS a, e2.dst AS b, ROUND(SUM(w.w), 6) AS score
  FROM edges e1
  JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
  JOIN wt w ON w.v = e1.src
  GROUP BY e1.dst, e2.dst)
SELECT 'p' || CAST(p.a AS VARCHAR) AS node_a,
       'p' || CAST(p.b AS VARCHAR) AS node_b, p.score
FROM aap p LEFT JOIN edges e ON e.src = p.a AND e.dst = p.b
WHERE e.src IS NULL
ORDER BY p.score DESC, p.a, p.b LIMIT {AA_TOP_K}
""")


MODULARITY_BCAST_V = 2_000_000  # below this, labels broadcast (8 B/vertex)


def q_g2_modularity(sf_dir: str,
                    broadcast_threshold: int = MODULARITY_BCAST_V
                    ) -> pa.Table:
    """Newman modularity of the LPA partition — a composite that feeds
    one kernel's output (labels) into a graph-metric pipeline. With the
    symmetric directed store (E = 2m directed edges):
    ``Q = intra/E - sum_c (deg_c/E)^2``.

    Scale shape: labels are V-sized (tiny next to E), so below
    ``broadcast_threshold`` vertices they ship ONCE via ``ray.put`` and
    BOTH terms run shuffle-free — one map pass over edges counts
    label-equal endpoints per batch (scalar partials), one map pass
    over degrees pre-aggregates per-label degree sums per batch before
    a #communities-row groupby. Above the threshold the same terms use
    bounded hash-bucket joins (the broadcast no longer fits a worker).
    Both final sums are INTEGER on both sides, so the single closing
    division is bit-deterministic against the SQL twin."""
    import ray
    from ray.data.aggregate import Sum

    g, _ = _build(sf_dir, "g2")
    state, _eng = lpa(g, max_iters=LPA_ITERS)
    labels = state.select_columns(["v", "val"])
    E = g.num_edges
    V = g.num_vertices

    if V <= broadcast_threshold:
        lt = labels.to_pandas()  # bounded: V rows
        lab_arr = np.zeros(V, dtype=np.int64)
        lab_arr[lt["v"].to_numpy()] = lt["val"].to_numpy()
        lab_ref = ray.put(lab_arr)

        def intra_partial(t: pa.Table) -> pa.Table:
            lab = ray.get(lab_ref)
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            eq = int((lab[s] == lab[d]).sum())
            return pa.table({"m": pa.array([eq], pa.int64())})

        intra = int(sum(
            r["m"] for r in g.edges_dataset().map_batches(
                intra_partial, batch_format="pyarrow").take_all()))

        def deg_prepart(t: pa.Table) -> pa.Table:
            lab = ray.get(lab_ref)
            v = t["v"].to_numpy(zero_copy_only=False)
            dv = t["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64)
            lv = lab[v]
            uniq, inv = np.unique(lv, return_inverse=True)
            return pa.table({"lab": pa.array(uniq),
                             "dsum": pa.array(np.bincount(inv, weights=dv)
                                              .astype(np.int64))})

        degsum = (degrees_dataset(g)
                  .map_batches(deg_prepart, batch_format="pyarrow")
                  .groupby("lab").aggregate(Sum(on="dsum",
                                                alias_name="dsum")))
    else:
        lab_s = labels.map_batches(
            lambda t: pa.table({"_sv": t["v"], "lab_s": t["val"]}),
            batch_format="pyarrow")
        lab_d = labels.map_batches(
            lambda t: pa.table({"_dv": t["v"], "lab_d": t["val"]}),
            batch_format="pyarrow")
        e1 = hash_bucket_join(g.edges_dataset(), lab_s,
                              left_on="src", right_on="_sv")
        e2 = hash_bucket_join(e1, lab_d, left_on="dst", right_on="_dv")

        def intra_partial(t: pa.Table) -> pa.Table:
            eq = pc.sum(pc.cast(pc.equal(t["lab_s"], t["lab_d"]),
                                pa.int64())).as_py() or 0
            return pa.table({"m": pa.array([eq], pa.int64())})

        intra = int(sum(
            r["m"] for r in
            e2.map_batches(intra_partial, batch_format="pyarrow").take_all()))

        degsum = hash_bucket_join(
            degrees_dataset(g),
            labels.map_batches(
                lambda t: pa.table({"_v": t["v"], "lab": t["val"]}),
                batch_format="pyarrow"),
            left_on="v", right_on="_v",
        ).groupby("lab").aggregate(Sum(on="outdeg", alias_name="dsum"))

    def deg_partial(t: pa.Table) -> pa.Table:
        d = t["dsum"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"k": pa.array([len(d)], pa.int64()),
                         "sq": pa.array([int((d * d).sum())], pa.int64())})

    parts = degsum.map_batches(deg_partial, batch_format="pyarrow").take_all()
    n_comm = int(sum(r["k"] for r in parts))
    sq = int(sum(r["sq"] for r in parts))
    q = intra / E - sq / (E * E)
    return pa.table({
        "n_communities": pa.array([n_comm], pa.int64()),
        "modularity": pa.array([float(np.round(q, 6))], pa.float64()),
    })


SQL_G2_MODULARITY = (
    "WITH " + _G2_BASE.strip() + ",\n" + ",\n".join(_lpa_ctes())
    + f""",
lab AS MATERIALIZED (SELECT v, label FROM lab{LPA_ITERS}),
ecnt AS (SELECT COUNT(*) AS e FROM edges),
intra AS (SELECT COUNT(*) AS m FROM edges e
          JOIN lab ls ON ls.v = e.src JOIN lab ld ON ld.v = e.dst
          WHERE ls.label = ld.label),
degc AS (SELECT l.label, SUM(d.outdeg) AS dsum
         FROM deg d JOIN lab l ON l.v = d.v GROUP BY 1)
SELECT CAST((SELECT COUNT(*) FROM degc) AS BIGINT) AS n_communities,
       ROUND((SELECT m FROM intra) * 1.0 / (SELECT e FROM ecnt)
             - (SELECT SUM(dsum * dsum) FROM degc) * 1.0
               / ((SELECT e FROM ecnt) * (SELECT e FROM ecnt)), 6)
         AS modularity"""
)


def q_g3_reciprocity(sf_dir: str) -> pa.Table:
    """Edge reciprocity of the directed g3 graph: the fraction of edges
    whose reverse edge also exists (g1 is trivially 0, g2 trivially 1 —
    g3's functional-map union is the interesting case).

    Scale shape: canonicalise each edge to its unordered pair map-side
    (lo, hi, fwd/rev 0-1 flags), ONE bounded groupby-sum over the pair
    key, then per-batch scalar partials (pairs-with-both, total edges) —
    the classic pre-aggregate + bounded-shuffle plan; nothing ever
    leaves the cluster except two integers."""
    from ray.data.aggregate import Sum

    edges = g3_edge_ids(sf_dir)

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "lo": pa.array(np.minimum(s, d)),
            "hi": pa.array(np.maximum(s, d)),
            "f": pa.array((s < d).astype(np.int64)),
            "r": pa.array((s > d).astype(np.int64)),
        })

    per_pair = (edges.map_batches(canon, batch_format="pyarrow")
                     .groupby(["lo", "hi"])
                     .aggregate(Sum(on="f", alias_name="f"),
                                Sum(on="r", alias_name="r")))

    def partial(t: pa.Table) -> pa.Table:
        f = t["f"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "both": pa.array([int(((f > 0) & (r > 0)).sum())], pa.int64()),
            "ne": pa.array([int((f + r).sum())], pa.int64()),
        })

    rows = per_pair.map_batches(partial, batch_format="pyarrow").take_all()
    both = sum(r["both"] for r in rows)
    ne = sum(r["ne"] for r in rows)
    return pa.table({
        "n_edges": pa.array([ne], pa.int64()),
        "n_reciprocal": pa.array([2 * both], pa.int64()),
        "reciprocity": pa.array([float(np.round(2.0 * both / ne, 6))],
                                pa.float64()),
    })


SQL_G3_RECIPROCITY = f"""
WITH base AS MATERIALIZED (
  SELECT CAST(o_orderkey % {SCC_MOD} AS BIGINT) AS a,
         CAST((o_orderkey * 37 + 11) % {SCC_MOD} AS BIGINT) AS b,
         CAST((o_custkey * 13 + 5) % {SCC_MOD} AS BIGINT) AS c
  FROM orders),
edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM base WHERE a <> b
  UNION
  SELECT c, a FROM base WHERE c <> a),
pairs AS (
  SELECT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi,
         SUM(CASE WHEN src < dst THEN 1 ELSE 0 END) AS f,
         SUM(CASE WHEN src > dst THEN 1 ELSE 0 END) AS r
  FROM edges GROUP BY 1, 2)
SELECT CAST(SUM(f + r) AS BIGINT) AS n_edges,
       CAST(2 * COUNT(*) FILTER (WHERE f > 0 AND r > 0) AS BIGINT)
         AS n_reciprocal,
       ROUND(2.0 * COUNT(*) FILTER (WHERE f > 0 AND r > 0) / SUM(f + r), 6)
         AS reciprocity
FROM pairs
"""


def _condensation_edges(g, labels) -> Dataset:
    """Distinct cross-component (scc_s, scc_d) pairs: two bounded label
    joins pin each endpoint's SCC, intra-component edges drop map-side,
    one dedup groupby bounds the output at #condensation-edges rows."""
    lab_s = labels.map_batches(
        lambda t: pa.table({"_sv": t["v"], "scc_s": t["scc"]}),
        batch_format="pyarrow")
    lab_d = labels.map_batches(
        lambda t: pa.table({"_dv": t["v"], "scc_d": t["scc"]}),
        batch_format="pyarrow")
    e1 = hash_bucket_join(g.edges_dataset(), lab_s,
                          left_on="src", right_on="_sv")
    e2 = hash_bucket_join(e1, lab_d, left_on="dst", right_on="_dv")
    cross = e2.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["scc_s"], t["scc_d"])))
                   .select(["scc_s", "scc_d"]),
        batch_format="pyarrow")
    return (cross.groupby(["scc_s", "scc_d"])
                 .aggregate(Count(alias_name="_n"))
                 .select_columns(["scc_s", "scc_d"]))


def q_g4_condensation(sf_dir: str) -> pa.Table:
    """Condensation DAG of g4 (the layered cyclic graph): distinct
    (scc(src), scc(dst)) pairs over cross-component edges — the
    standard SCC post-pass that turns a cyclic graph into a DAG for
    downstream topological passes. (g3 is a single giant SCC at
    sf>=0.01, so its condensation is empty — g4 exists for this.)

    Scale shape: two bounded bucket joins pin the SCC label onto each
    edge endpoint, a filter drops intra-component edges map-side, and
    ONE groupby over the (label, label) pair key dedups — output is
    #condensation-edges rows, far smaller than E."""
    from ..kernels.scc import scc as scc_run

    g, iddict = _build(sf_dir, "g4")
    labels, _info = scc_run(g)
    dag = _condensation_edges(g, labels)
    keyed = _attach_key(dag, iddict, "scc_s", "rk_s")
    keyed = _attach_key(keyed, iddict, "scc_d", "rk_d").to_pandas()
    return pa.table({
        "src_scc": pa.array(
            [f"s{int(k)}" for k in keyed["rk_s"].to_numpy()]),
        "dst_scc": pa.array(
            [f"s{int(k)}" for k in keyed["rk_d"].to_numpy()]),
    })


SQL_G4_CONDENSATION = f"""
WITH RECURSIVE
base AS MATERIALIZED (
  SELECT CAST(o_orderkey % {SCC_MOD} AS BIGINT) AS u FROM orders),
edges AS MATERIALIZED (
  SELECT u AS src, (u // {G4_BLOCK}) * {G4_BLOCK}
                   + ((u % {G4_BLOCK}) + 1) % {G4_BLOCK} AS dst FROM base
  UNION
  SELECT u, (u * 13 + 7) % {SCC_MOD} FROM base
  WHERE ((u * 13 + 7) % {SCC_MOD}) // {G4_BLOCK} > u // {G4_BLOCK}),
nodes AS MATERIALIZED (
  SELECT src AS v FROM edges UNION SELECT dst FROM edges),
reach(s, v) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON e.src = r.v),
mutual AS (
  SELECT r1.s AS v, r1.v AS u
  FROM reach r1 JOIN reach r2 ON r2.s = r1.v AND r2.v = r1.s),
lab AS (SELECT v, MAX(u) AS l FROM mutual GROUP BY v)
SELECT DISTINCT 's' || CAST(ls.l AS VARCHAR) AS src_scc,
                's' || CAST(ld.l AS VARCHAR) AS dst_scc
FROM edges e
JOIN lab ls ON ls.v = e.src
JOIN lab ld ON ld.v = e.dst
WHERE ls.l <> ld.l
"""


def q_g4_topo_depth(sf_dir: str) -> pa.Table:
    """Topological depth of each SCC in g4's condensation DAG (the pass
    that schedules SCC-blocks for downstream dataflow): longest-path
    layer per component plus its member count.

    Scale shape: condensation edges come from two bounded label joins +
    one dedup groupby (as in g4_condensation); the layering itself is
    the dagdepth KERNEL — monotone WriteMax supersteps over a
    partitioned store, converging in L rounds (L = longest chain, here
    #blocks-1) — not a driver loop. dag_depth raises loudly if the
    input were cyclic."""
    import shutil
    import tempfile

    from ..graph import partition_edges
    from ..kernels.dagdepth import dag_depth
    from ..kernels.scc import scc as scc_run

    g, iddict = _build(sf_dir, "g4")
    labels, _info = scc_run(g)
    dag = _condensation_edges(g, labels).map_batches(
        lambda t: pa.table({"src": t["scc_s"], "dst": t["scc_d"]}),
        batch_format="pyarrow")

    root = tempfile.mkdtemp(prefix="g4dag_")
    try:
        gd = partition_edges(dag, root, g.num_vertices,
                             num_parts=g.num_parts, direction="fwd")
        state, _eng = dag_depth(gd)
        depth = state.map_batches(
            lambda t: pa.table({"_dv": t["v"], "depth": t["val"]}),
            batch_format="pyarrow")
        members = labels.groupby("scc").aggregate(
            Count(alias_name="n_members"))
        j = hash_bucket_join(members, depth, left_on="scc",
                             right_on="_dv")
        keyed = _attach_key(j, iddict, "scc", "rawkey").to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return pa.table({
        "scc_key": pa.array(
            [f"s{int(k)}" for k in keyed["rawkey"].to_numpy()]),
        "depth": pa.array(keyed["depth"].to_numpy().astype(np.int64)),
        "n_members": pa.array(
            keyed["n_members"].to_numpy().astype(np.int64)),
    })


SQL_G4_TOPO_DEPTH = f"""
WITH RECURSIVE
base AS MATERIALIZED (
  SELECT CAST(o_orderkey % {SCC_MOD} AS BIGINT) AS u FROM orders),
edges AS MATERIALIZED (
  SELECT u AS src, (u // {G4_BLOCK}) * {G4_BLOCK}
                   + ((u % {G4_BLOCK}) + 1) % {G4_BLOCK} AS dst FROM base
  UNION
  SELECT u, (u * 13 + 7) % {SCC_MOD} FROM base
  WHERE ((u * 13 + 7) % {SCC_MOD}) // {G4_BLOCK} > u // {G4_BLOCK}),
nodes AS MATERIALIZED (
  SELECT src AS v FROM edges UNION SELECT dst FROM edges),
reach(s, v) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON e.src = r.v),
mutual AS (
  SELECT r1.s AS v, r1.v AS u
  FROM reach r1 JOIN reach r2 ON r2.s = r1.v AND r2.v = r1.s),
lab AS MATERIALIZED (SELECT v, MAX(u) AS l FROM mutual GROUP BY v),
dagE AS MATERIALIZED (
  SELECT DISTINCT ls.l AS src, ld.l AS dst
  FROM edges e JOIN lab ls ON ls.v = e.src JOIN lab ld ON ld.v = e.dst
  WHERE ls.l <> ld.l),
paths(v, d) AS (
  SELECT l, 0 FROM (SELECT DISTINCT l FROM lab)
  UNION
  SELECT e.dst, p.d + 1 FROM paths p JOIN dagE e ON e.src = p.v),
depth AS (SELECT v, MAX(d) AS depth FROM paths GROUP BY v),
mem AS (SELECT l, COUNT(*) AS n_members FROM lab GROUP BY l)
SELECT 's' || CAST(m.l AS VARCHAR) AS scc_key,
       CAST(d.depth AS BIGINT) AS depth,
       CAST(m.n_members AS BIGINT) AS n_members
FROM mem m JOIN depth d ON d.v = m.l
"""


QUERIES = {
    "g1_degree": q_g1_degree,
    "csv_degree": q_csv_degree,
    "g2_hop_extrema": q_g2_hop_extrema,
    "g1_pagerank": q_g1_pagerank,
    "g2_pagerank": q_g2_pagerank,
    "g2_wcc": q_g2_wcc,
    "g2_lpa": q_g2_lpa,
    "g2_triangles": q_g2_triangles,
    "g2_sssp": q_g2_sssp,
    "g2_khop": q_g2_khop,
    "g2_coloring": q_g2_coloring,
    "g2_mst": q_g2_mst,
    "g2_randomwalk": q_g2_randomwalk,
    "g2_gnn": q_g2_gnn,
    "g2_wcc_precomp": q_g2_wcc_precomp,
    "g2_wcc_asp": q_g2_wcc_asp,
    "g2_sssp_asp": q_g2_sssp_asp,
    "g2_wcc_contract": q_g2_wcc_contract,
    "g2_wcc_narrow": q_g2_wcc_narrow,
    "g2_kcore": q_g2_kcore,
    "g2_coreness": q_g2_coreness,
    "g2_wsssp": q_g2_wsssp,
    "g2_mis": q_g2_mis,
    "g2_clustering": q_g2_clustering,
    "g2_assortativity": q_g2_assortativity,
    "g2_ktruss": q_g2_ktruss,
    "g1_ppr": q_g1_ppr,
    "g1_hits": q_g1_hits,
    "g2_harmonic": q_g2_harmonic,
    "g3_scc": q_g3_scc,
    "g2_adamic_adar": q_g2_adamic_adar,
    "g2_jaccard": q_g2_jaccard,
    "g2_betweenness": q_g2_betweenness,
    "g2_diameter": q_g2_diameter,
    "g2_modularity": q_g2_modularity,
    "g3_reciprocity": q_g3_reciprocity,
    "g4_condensation": q_g4_condensation,
    "g4_topo_depth": q_g4_topo_depth,
}

ORACLES = {
    "g1_degree": SQL_G1_DEGREE,
    "csv_degree": SQL_CSV_DEGREE,
    "g2_hop_extrema": SQL_G2_HOP_EXTREMA,
    "g1_pagerank": SQL_G1_PAGERANK,
    "g2_pagerank": SQL_G2_PAGERANK,
    "g2_wcc": SQL_G2_WCC,
    "g2_lpa": SQL_G2_LPA,
    "g2_triangles": SQL_G2_TRIANGLES,
    "g2_sssp": SQL_G2_SSSP,
    "g2_khop": SQL_G2_KHOP,
    "g2_coloring": SQL_G2_COLORING,
    "g2_mst": SQL_G2_MST,
    "g2_randomwalk": SQL_G2_RANDOMWALK,
    "g2_gnn": SQL_G2_GNN,
    "g2_wcc_precomp": SQL_G2_WCC,  # same fixpoint as plain WCC
    "g2_wcc_asp": SQL_G2_WCC,     # ASP: identical fixpoint labels
    "g2_sssp_asp": SQL_G2_SSSP,   # ASP: identical converged distances
    "g2_wcc_contract": SQL_G2_WCC,  # contraction: identical fixpoint labels
    "g2_wcc_narrow": SQL_G2_WCC,    # narrow state: bit-identical labels
    "g2_kcore": SQL_G2_KCORE,
    "g2_coreness": SQL_G2_CORENESS,
    "g2_wsssp": SQL_G2_WSSSP,
    "g2_mis": SQL_G2_MIS,
    "g2_clustering": SQL_G2_CLUSTERING,
    "g2_assortativity": SQL_G2_ASSORTATIVITY,
    "g2_ktruss": SQL_G2_KTRUSS,
    "g1_ppr": SQL_G1_PPR,
    "g1_hits": SQL_G1_HITS,
    "g2_harmonic": SQL_G2_HARMONIC,
    "g3_scc": SQL_G3_SCC,
    "g2_adamic_adar": SQL_G2_ADAMIC_ADAR,
    "g2_jaccard": SQL_G2_JACCARD,
    "g2_betweenness": _betw_sql(),
    "g2_diameter": SQL_G2_DIAMETER,
    "g2_modularity": SQL_G2_MODULARITY,
    "g3_reciprocity": SQL_G3_RECIPROCITY,
    "g4_condensation": SQL_G4_CONDENSATION,
    "g4_topo_depth": SQL_G4_TOPO_DEPTH,
}
