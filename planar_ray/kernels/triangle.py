"""Triangle counting — degree-oriented wedge join (MapReduce-style).

Not present in the reference (SURVEY.md §7.5 — new kernel required by
the north rule). Algorithm (the standard compact-forward / node-iterator
hybrid expressed as dataset ops):

  1. canonicalise the graph to undirected simple edges (a<b, distinct);
  2. orient every edge from the endpoint with smaller (degree, id) to
     the larger — bounds each vertex's oriented out-degree by O(sqrt(E))
     and tames hubs (a stdlib module's edges all point *at* it, so it
     produces no wedges);
  3. wedges: self-join oriented edges on their source;
  4. close: semi-join each wedge (b, c) against the oriented edge set.

All-to-all exchanges: the distinct groupby, the degree groupby, and
three hash-bucket joins. Wedge volume is O(Σ outdeg²) ≤ O(E^1.5) by the
orientation bound. Pair keys are packed as ``x * V + y`` (requires
V < 3·10^9 for int64; beyond that the join key becomes the two-column
hash directly — documented limit, not a silent overflow).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count

from ..graph import Graph
from ..joins import hash_bucket_join
from ..util import splitmix64


def _dedup_pairs(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    if len(a):
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b = a[keep], b[keep]
    return a, b


def canonical_edges(edges: Dataset, buckets: int = 64) -> Dataset:
    """(src,dst) any direction -> distinct undirected (a<b) pairs.

    Dedup = per-batch combiner + ONE bucket shuffle with a vectorised
    per-bucket unique — Ray's multi-key sort-aggregate sorts the full
    16M-row table by (a,b) and was the dominant cost of triangle
    counting at that scale."""

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        a, b = _dedup_pairs(a, b)  # local combiner
        # pair hash via the shared property-tested mixer (bucket choice
        # only affects work placement, never the dedup result)
        with np.errstate(over="ignore"):
            h = splitmix64(splitmix64(a.astype(np.uint64)) ^ b.astype(np.uint64))
        bucket = (h % np.uint64(buckets)).astype(np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "bucket": pa.array(bucket)})

    def uniq(t: pa.Table) -> pa.Table:
        a, b = _dedup_pairs(t["a"].to_numpy(zero_copy_only=False),
                            t["b"].to_numpy(zero_copy_only=False))
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    from ..joins import coalesce

    e = coalesce(edges.map_batches(canon, batch_format="pyarrow"))
    return e.groupby("bucket").map_groups(uniq, batch_format="pyarrow")


def triangle_count(graph: Graph, buckets: int = 64,
                   broadcast_threshold: int = 50_000_000) -> int:
    """Total number of triangles in the underlying undirected simple graph.

    Fast path (V and E under the broadcast threshold): degrees as a
    broadcast dense array (per-batch partial bincounts combined on the
    driver, like the partitioner histogram), orientation as a stateless
    map, then ONE bucket-by-source shuffle whose groups generate wedges
    AND close them locally against the broadcast sorted edge-key array —
    wedges never enter a shuffle at all. Two all-to-alls total (the
    canonical dedup + the bucket groupby) instead of a degree groupby
    plus three joins. Beyond the threshold the join-based path below
    handles arbitrary V/E.
    """
    canon = canonical_edges(graph.edges_dataset()).materialize()
    V = graph.num_vertices

    if V <= broadcast_threshold and graph.num_edges <= broadcast_threshold:
        return _triangle_broadcast(canon, V, buckets)

    # undirected degree per endpoint (consumed by TWO joins -> pin once)
    deg = (
        canon.map_batches(
            lambda t: pa.table(
                {"v": pa.concat_arrays([
                    t["a"].combine_chunks(), t["b"].combine_chunks()])}
            ),
            batch_format="pyarrow",
        )
        .groupby("v")
        .aggregate(Count(alias_name="deg"))
    ).materialize()

    withdeg = hash_bucket_join(canon, deg, left_on="a", right_on="v", buckets=buckets)
    withdeg = withdeg.map_batches(
        lambda t: pa.table({"a": t["a"], "b": t["b"], "dega": t["deg"]}),
        batch_format="pyarrow",
    )
    withdeg = hash_bucket_join(withdeg, deg, left_on="b", right_on="v", buckets=buckets)

    def orient(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        da = t["dega"].to_numpy(zero_copy_only=False)
        db = t["deg"].to_numpy(zero_copy_only=False)
        # orient from smaller (deg, id) to larger
        a_first = (da < db) | ((da == db) & (a < b))
        lo = np.where(a_first, a, b)
        hi = np.where(a_first, b, a)
        return pa.table({"x": pa.array(lo), "y": pa.array(hi)})

    oriented = withdeg.map_batches(orient, batch_format="pyarrow").materialize()

    # wedges: (x -> y1), (x -> y2) with y1 < y2; key both sides on x
    right = oriented.map_batches(
        lambda t: pa.table({"x2": t["x"], "z": t["y"]}), batch_format="pyarrow"
    )
    wedges = hash_bucket_join(oriented, right, left_on="x", right_on="x2",
                              buckets=buckets)

    def wedge_keys(t: pa.Table) -> pa.Table:
        y = t["y"].to_numpy(zero_copy_only=False)
        z = t["z"].to_numpy(zero_copy_only=False)
        keep = y < z
        y, z = y[keep], z[keep]
        return pa.table({"pair": pa.array(y * V + z)})

    wkeys = wedges.map_batches(wedge_keys, batch_format="pyarrow")

    # wedge keys are id-ordered (y<z); pack every edge id-ordered too, so
    # each undirected edge yields exactly one matching key
    def edge_keys(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        return pa.table({"epair": pa.array(lo * V + hi)})

    ekeys = oriented.map_batches(edge_keys, batch_format="pyarrow")

    closed = hash_bucket_join(wkeys, ekeys, left_on="pair", right_on="epair",
                              buckets=buckets)
    return closed.count()


def _triangle_broadcast(canon, V: int, buckets: int) -> int:
    """Broadcast-degree + in-task wedge close (see triangle_count)."""
    import ray

    # dense degree array via per-batch partial bincounts -> driver combine
    def partial_deg(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(a, minlength=V) + np.bincount(b, minlength=V)
        nz = np.flatnonzero(cnt)
        return pa.table({"v": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    deg = np.zeros(V, dtype=np.int64)
    for t in canon.map_batches(partial_deg, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        np.add.at(deg, t["v"].to_numpy(zero_copy_only=False),
                  t["n"].to_numpy(zero_copy_only=False))
    deg_ref = ray.put(deg)

    def orient(t: pa.Table) -> pa.Table:
        d = ray.get(deg_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        da, db = d[a], d[b]
        a_first = (da < db) | ((da == db) & (a < b))
        lo = np.where(a_first, a, b).astype(np.int64)
        hi = np.where(a_first, b, a).astype(np.int64)
        bucket = lo % buckets
        return pa.table({"x": pa.array(lo), "y": pa.array(hi),
                         "bucket": pa.array(bucket)})

    oriented = canon.map_batches(orient, batch_format="pyarrow").materialize()

    # broadcast sorted id-ordered edge keys (8 B/edge, built streaming —
    # driver memory bounded by the threshold, never a to_pandas of a
    # growing table)
    chunks = []
    for t in oriented.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        chunks.append(np.minimum(x, y) * V + np.maximum(x, y))
    keys_sorted = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
    keys_ref = ray.put(keys_sorted)

    def wedge_close(t: pa.Table) -> pa.Table:
        """One bucket: vectorised wedge generation per source run + local
        close against the broadcast key array. Wedges never leave here.
        Runs are processed GROUPED BY OUT-DEGREE so the work is exactly
        the wedge count (a stride-k scan would pay O(max_deg x rows) in
        mask overhead — measured 3x slower on the 16M-edge Zipf graph)."""
        ks = ray.get(keys_ref)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        order = np.lexsort((y, x))
        x, y = x[order], y[order]
        n = len(x)
        if n == 0 or len(ks) == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        run = np.zeros(n, dtype=np.int64)
        run[1:] = np.cumsum(x[1:] != x[:-1])
        counts = np.bincount(run)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        hits = 0
        CHUNK = 4_000_000  # cap pair-buffer memory per step
        for c in np.unique(counts):
            if c < 2:
                continue
            R = starts[counts == c]  # all runs with out-degree c
            i, j = np.triu_indices(int(c), 1)
            m = len(i)
            # chunk over runs so |runs_chunk| * m stays bounded
            rows_per = max(1, CHUNK // m)
            for lo in range(0, len(R), rows_per):
                Rc = R[lo:lo + rows_per][:, None]
                pair = (y[Rc + i[None, :]] * V + y[Rc + j[None, :]]).ravel()
                pos = np.minimum(np.searchsorted(ks, pair), len(ks) - 1)
                hits += int((ks[pos] == pair).sum())
        return pa.table({"n": pa.array([hits], pa.int64())})

    out = oriented.groupby("bucket").map_groups(wedge_close,
                                               batch_format="pyarrow")
    return int(out.sum("n") or 0)


def triangle_oracle(edges: np.ndarray) -> int:
    """Brute-force triangle count over an edge array (tests)."""
    s = {(int(a), int(b)) for a, b in edges if a != b}
    und = set()
    for a, b in s:
        und.add((min(a, b), max(a, b)))
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    for a, b in und:
        count += len(adj[a] & adj[b])
    return count // 3  # each triangle counted once per edge
