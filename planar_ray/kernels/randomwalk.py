"""Random walks — sample + replay, reference-style.

Capability parity with /root/reference/core/apps/randomwalk_app_op.h:
``Sample`` fills road[v][i] = random out-neighbor of v (or v itself when
out-degree is 0) for i in [0, L); ``Walk`` replays
``tmp = road[tmp][i]`` — step i uses the i-th sample of the CURRENT
vertex. C ``rand()`` is replaced by a deterministic per-(vertex, step)
hash (reproducible at any parallelism).

Ray shape: the road matrix is a dataset built by a per-partition CSR
map (one pass over the edges, no shuffle); the replay is L hash-bucket
joins walks⋈road on the current position — at scale each join is a
hash-partitioned exchange of V rows. The oracle replays the same arrays
in NumPy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..graph import Graph
from ..joins import hash_bucket_join
from ..util import splitmix64

WALK_LENGTH = 5
MIX_K = 131  # (vertex, step) -> distinct mixer inputs for steps < MIX_K


def _samples_for(csr, v: np.ndarray, L: int) -> np.ndarray:
    """(len(v), L) sampled next-hops, deterministic per (vertex, step) —
    one vectorised splitmix64 pass over the (vertices x steps) grid, no
    per-row hashing loop. SQL-replicable (HUGEINT math + ROW_NUMBER
    adjacency index)."""
    deg = csr.degrees(v)
    out = np.tile(v[:, None], (1, L))  # deg==0 -> stay (reference semantics)
    nz = deg > 0
    if not nz.any():
        return out
    vv = v[nz].astype(np.uint64)
    starts = csr.indptr[v[nz] - csr.begin]
    steps = np.arange(L, dtype=np.uint64)
    mixed = splitmix64(vv[:, None] * np.uint64(MIX_K) + steps[None, :])
    idx = (mixed % deg[nz].astype(np.uint64)[:, None]).astype(np.int64)
    out[nz] = csr.indices[starts[:, None] + idx]
    return out


def road_dataset(graph: Graph, L: int = WALK_LENGTH) -> Dataset:
    """(v, step, nxt) road matrix — per-partition CSR map, no shuffle."""
    import ray.data as rd

    boundaries = graph.boundaries
    root, direction, P = graph.root, graph.direction, graph.num_parts

    def emit(batch: pa.Table) -> pa.Table:
        import os

        from ..graph import CSRPart

        outs = []
        for p in batch["id"].to_numpy():
            p = int(p)
            begin, end = int(boundaries[p]), int(boundaries[p + 1])
            csr = CSRPart.load(os.path.join(root, direction, f"part={p:05d}"),
                               begin, end)
            v = np.arange(begin, end, dtype=np.int64)
            road = _samples_for(csr, v, L)
            outs.append(pa.table({
                "v": pa.array(np.repeat(v, L)),
                "step": pa.array(np.tile(np.arange(L, dtype=np.int64), len(v))),
                "nxt": pa.array(road.reshape(-1)),
            }))
        return pa.concat_tables(outs)

    return rd.range(P, override_num_blocks=P).map_batches(
        emit, batch_format="pyarrow", batch_size=1
    )


def random_walk(graph: Graph, L: int = WALK_LENGTH,
                broadcast_threshold: int = 10_000_000) -> Dataset:
    """Replay: returns (origin, final_v) after L steps for every vertex.

    Under the broadcast threshold (V*L int64 fits an object-store slab)
    the road matrix is broadcast once and ONE stateless map replays all
    L steps; beyond it, the replay is L hash-bucket joins (each a
    hash-partitioned exchange of V rows) — identical output.
    """
    import ray.data as rd

    road = road_dataset(graph, L).materialize()

    if graph.num_vertices * L <= broadcast_threshold:
        import ray

        mat = np.tile(np.arange(graph.num_vertices, dtype=np.int64)[:, None],
                      (1, L))
        for t in road.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            mat[t["v"].to_numpy(zero_copy_only=False),
                t["step"].to_numpy(zero_copy_only=False)] = \
                t["nxt"].to_numpy(zero_copy_only=False)
        ref = ray.put(mat)

        def replay(t: pa.Table) -> pa.Table:
            m = ray.get(ref)
            origin = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
            cur = origin.copy()
            for i in range(L):
                cur = m[cur, i]
            return pa.table({"origin": pa.array(origin),
                             "final_v": pa.array(cur)})

        return rd.range(graph.num_vertices).map_batches(
            replay, batch_format="pyarrow")
    walks = rd.range(graph.num_vertices).map_batches(
        lambda t: pa.table({
            "origin": t["id"].combine_chunks().cast(pa.int64()),
            "cur": t["id"].combine_chunks().cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )
    for i in range(L):
        step_i = road.filter(expr=f"step == {i}").select_columns(["v", "nxt"])
        walks = hash_bucket_join(walks, step_i, left_on="cur", right_on="v")
        walks = walks.map_batches(
            lambda t: pa.table({"origin": t["origin"], "cur": t["nxt"]}),
            batch_format="pyarrow",
        ).materialize()
    return walks.map_batches(
        lambda t: pa.table({"origin": t["origin"], "final_v": t["cur"]}),
        batch_format="pyarrow",
    )


def random_walk_oracle(edges: np.ndarray, n: int, L: int = WALK_LENGTH) -> np.ndarray:
    """Same sampling + replay with dense arrays."""
    order = np.lexsort((edges[:, 1], edges[:, 0]))
    e = edges[order]
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, e[:, 0], 1)
    indptr = np.concatenate([[0], np.cumsum(deg)])
    road = np.tile(np.arange(n, dtype=np.int64)[:, None], (1, L))
    nz = deg > 0
    vv = np.arange(n, dtype=np.uint64)[nz]
    steps = np.arange(L, dtype=np.uint64)
    mixed = splitmix64(vv[:, None] * np.uint64(MIX_K) + steps[None, :])
    idx = (mixed % deg[nz].astype(np.uint64)[:, None]).astype(np.int64)
    road[nz] = e[indptr[:-1][nz][:, None] + idx, 1]
    cur = np.arange(n, dtype=np.int64)
    for i in range(L):
        cur = road[cur, i]
    return cur
