"""Graph build: string-keyed edge table -> dense-id, range-partitioned Graph.

Capability parity with the reference's converter + partitioner
(/root/reference/tools/graph_converter/graph_converter.cpp:126-133 vid
compaction; /root/reference/planar/partitioner.cpp:74-101 edge-balanced
block split), Ray-Data-first:

* **Dense vertex ids** without driver-side materialisation: distinct keys
  are hash-bucketed (``B`` buckets), ranked *within* their bucket by key
  order, and offset by the bucket's global cumulative count. Only the
  B-row bucket-count table ever reaches the driver, so this holds at
  10^12 keys. Ids are a pure function of the key set (deterministic at
  any parallelism).

* **Edge-balanced vertex ranges** (the 2-level partitioner's balancing
  rule): per-coarse-bucket edge counts (``src // bucket`` histogram, a
  small groupby) are cumulative-summed on the driver and cut into P
  ranges targeting ``E/P`` edges each — degree-aware skew handling at
  bucket granularity. A mega-hub whose bucket alone exceeds the target
  simply gets its own partition (its scatter is a vectorised numpy run).

* **Per-partition sorted parquet**: edges are shuffled once by ``part``
  and each partition is written as one src-sorted parquet file, which is
  exactly what a CSR build wants to mmap later (the stand-in for the
  reference's ``<bid>.bin`` sub-block payloads, planar/partitioner.cpp:
  229-233). A JSON manifest replaces ``blocks_meta.yaml``.

Directions: ``fwd`` (by src), ``rev`` (edges reversed), ``sym``
(fwd ∪ rev, deduped) are materialised on demand and cached on disk —
WCC/LPA want ``sym``, reference-mode PageRank wants ``rev``.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from ray.data import Dataset
from ray.data.aggregate import Count

from .joins import hash_bucket_join
from .util import h64_bytes_vec, read_json, repeat_ranges, write_json_atomic

ID_BUCKETS = 1 << 12  # vertex-dictionary rank buckets (driver sees this many rows)


# ---------------------------------------------------------------------------
# vertex dictionary: distinct keys -> dense ids [0, V)
# ---------------------------------------------------------------------------

def build_vertex_dict(edges_keys: Dataset, out_dir: str, num_partitions: int = 16) -> Dataset:
    """Distinct src/dst keys -> (key, v) with dense deterministic ids.

    Writes ``vertices/`` parquet and returns the dict as a Dataset.
    """
    from .joins import coalesce

    keys = edges_keys.map_batches(
        lambda t: pa.table({"key": pa.concat_arrays(
            [t["src_key"].combine_chunks().cast(pa.string()),
             t["dst_key"].combine_chunks().cast(pa.string())])}),
        batch_format="pyarrow",
    )
    # local pre-dedup (combiner) then global distinct via groupby;
    # coalesce first — the distinct shuffle's task count scales with blocks
    keys = keys.map_batches(
        lambda t: pa.table({"key": pc.unique(t["key"])}), batch_format="pyarrow"
    )
    keys = coalesce(keys)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (h64_bytes_vec(t["key"].to_pylist(), "vbkt") % ID_BUCKETS).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    # ONE shuffle total (was three: global distinct, bucket counts,
    # bucket rank): the per-bucket group dedups AND sorts its keys —
    # a key's bucket is a pure function of the key, so the in-group
    # unique IS the global distinct — and emits a bucket-local rank.
    # Global id = offsets[bucket] + local rank, with offsets the cumsum
    # of per-bucket distinct counts gathered by a shuffle-free per-block
    # bincount (ID_BUCKETS rows to the driver, nothing else).
    def rank_group(t: pa.Table) -> pa.Table:
        b = int(t["bucket"][0].as_py())
        uniq = pc.unique(t["key"])
        keys_sorted = uniq.take(pc.sort_indices(uniq))
        n = len(keys_sorted)
        return pa.table({
            "key": keys_sorted,
            "bucket": pa.array(np.full(n, b, np.int64)),
            "lrank": pa.array(np.arange(n, dtype=np.int64)),
        })

    ranked = keys.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "bucket").map_groups(rank_group, batch_format="pyarrow").materialize()

    def block_counts(t: pa.Table) -> pa.Table:
        c = np.bincount(t["bucket"].to_numpy(zero_copy_only=False),
                        minlength=ID_BUCKETS)
        return pa.table({"bucket": pa.array(np.arange(ID_BUCKETS)),
                         "n": pa.array(c.astype(np.int64))})

    counts = ranked.map_batches(
        block_counts, batch_format="pyarrow").to_pandas().groupby(
        "bucket")["n"].sum()
    offsets = np.zeros(ID_BUCKETS, dtype=np.int64)
    offsets[counts.index.to_numpy()] = counts.to_numpy()
    offsets = np.concatenate([[0], np.cumsum(offsets)[:-1]])

    def finalize(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        lr = t["lrank"].to_numpy(zero_copy_only=False)
        return pa.table({"key": t["key"], "v": pa.array(offsets[b] + lr)})

    # materialize BEFORE the write: write_parquet would otherwise run
    # the finalize plan once for the files and every downstream consumer
    # of the returned (still-lazy) dataset would run it again
    vdict = ranked.map_batches(finalize, batch_format="pyarrow").materialize()
    vdir = os.path.join(out_dir, "vertices")
    shutil.rmtree(vdir, ignore_errors=True)  # never append beside stale files
    vdict.write_parquet(vdir)
    return vdict


# under this many vertices the whole dictionary is broadcast once via
# ray.put and edges resolve with an in-task C index lookup — zero join
# shuffles; beyond it the two-hash-join plan runs (the 100-TB path,
# plan-equality tested like every other broadcast gate)
BROADCAST_VDICT_MAX = 2_000_000


def map_edges_to_ids(
    edges_keys: Dataset, vdict: Dataset, num_partitions: int = 16,
    dedup: bool = True, num_vertices: int | None = None,
    broadcast_threshold: int = BROADCAST_VDICT_MAX,
    drop_self_loops: bool = True,
) -> Dataset:
    """(src_key, dst_key) -> (src, dst) int64.

    Dual plan: broadcast-dictionary lookup under ``broadcast_threshold``
    vertices, two hash joins beyond. ``dedup=False`` skips the exact
    multi-edge dedup shuffle — used by build_graph, whose partition step
    dedups inside the per-partition write (one shuffle instead of two).
    ``drop_self_loops=False`` skips the post-map filter pass — for
    callers that already filtered on keys (the dictionary is injective,
    so no NEW self-loops can appear in id space).
    """
    n = num_vertices if num_vertices is not None else vdict.count()
    if n <= broadcast_threshold:
        e = _map_edges_broadcast(edges_keys, vdict)
    else:
        e = _map_edges_join(edges_keys, vdict, num_partitions)
    if drop_self_loops:
        # self-loop guard (reference converter behavior)
        e = e.map_batches(
            lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
            batch_format="pyarrow",
        )
    if not dedup:
        return e
    grouped = e.groupby(["src", "dst"]).aggregate(Count(alias_name="_n"))
    return grouped.select_columns(["src", "dst"])


def _map_edges_broadcast(edges_keys: Dataset, vdict: Dataset) -> Dataset:
    # Arrow index_in, NOT pandas get_indexer: pandas' string hash table
    # compares C strings, so keys with embedded NUL bytes silently
    # truncate and mis-match; Arrow hashes the full buffer.
    import ray

    tabs = ray.get(vdict.select_columns(["key", "v"]).to_arrow_refs())
    # groupby().map_groups upstreams can emit zero-row blocks with an
    # EMPTY schema — drop them or concat_tables raises on the mismatch
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        # empty dictionary -> every edge is unresolvable (inner-join
        # semantics): emit a typed empty (src, dst) per batch
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
        return edges_keys.map_batches(lambda t: empty,
                                      batch_format="pyarrow")
    tbl = pa.concat_tables(tabs)
    ref = ray.put((tbl["key"].combine_chunks(), tbl["v"].combine_chunks()))

    def resolve(t: pa.Table) -> pa.Table:
        keys, v = ray.get(ref)
        si = pc.index_in(t["src_key"].combine_chunks(), value_set=keys)
        di = pc.index_in(t["dst_key"].combine_chunks(), value_set=keys)
        keep = pc.and_(si.is_valid(), di.is_valid())  # inner-join semantics
        return pa.table({"src": v.take(si.filter(keep)),
                         "dst": v.take(di.filter(keep))})

    return edges_keys.select_columns(["src_key", "dst_key"]).map_batches(
        resolve, batch_format="pyarrow")


def _map_edges_join(edges_keys: Dataset, vdict: Dataset,
                    num_partitions: int) -> Dataset:
    vd = vdict.select_columns(["key", "v"])
    e = edges_keys.select_columns(["src_key", "dst_key"])
    e = hash_bucket_join(e, vd, left_on="src_key", right_on="key",
                         buckets=num_partitions * 4)
    e = e.map_batches(
        lambda t: pa.table({"src": t["v"], "dst_key": t["dst_key"]}),
        batch_format="pyarrow",
    )
    e = hash_bucket_join(e, vd, left_on="dst_key", right_on="key",
                         buckets=num_partitions * 4)
    return e.map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["v"]}), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# partitioning + per-partition sorted parquet
# ---------------------------------------------------------------------------

def _bucket_size(num_vertices: int, num_parts: int) -> int:
    """Histogram granularity: ~64 buckets per target partition. Coarse
    buckets under-split hub src-ranges (a Zipf head bucket can hold
    several partitions' worth of edges and become the superstep
    straggler — measured 5x skew at 8 buckets/part), so granularity is
    the skew control; the driver still only sees ~64·P rows."""
    return max(1, num_vertices // max(1, num_parts * 64))


def pick_boundaries(edges: Dataset, num_vertices: int, num_parts: int) -> np.ndarray:
    """Edge-balanced vertex-range boundaries (len P+1, [0 .. V]).

    Mirrors the reference partitioner's scan-until-E/P rule
    (planar/partitioner.cpp:74-101) on a coarse histogram: only the
    per-bucket edge counts reach the driver, never per-vertex degrees.
    """
    bsz = _bucket_size(num_vertices, num_parts)
    nb = (num_vertices + bsz - 1) // bsz

    def partial_hist(t: pa.Table) -> pa.Table:
        # per-batch combiner: each batch emits its own (bucket, count)
        # rows; the tiny partials are summed on the driver — no shuffle
        b = t["src"].to_numpy(zero_copy_only=False) // bsz
        cnt = np.bincount(b, minlength=max(nb, 1)).astype(np.int64)
        nzb = np.flatnonzero(cnt)
        return pa.table({"b": pa.array(nzb.astype(np.int64)),
                         "n": pa.array(cnt[nzb])})

    hist = edges.map_batches(partial_hist, batch_format="pyarrow").to_pandas()
    per_bucket = np.zeros(max(nb, 1), dtype=np.int64)
    if len(hist) and "b" in hist.columns:
        # zero-row inputs can bypass the UDF entirely (hist keeps the
        # input schema) — an empty histogram is a valid empty graph
        np.add.at(per_bucket, hist["b"].to_numpy(dtype=np.int64),
                  hist["n"].to_numpy(dtype=np.int64))
    cum = np.cumsum(per_bucket)
    total = int(cum[-1]) if len(cum) else 0
    target = max(1, total // num_parts)
    cuts = [0]
    for p in range(1, num_parts):
        pos = int(np.searchsorted(cum, p * target, side="left")) + 1
        if pos * bsz > cuts[-1] and pos <= nb:
            cuts.append(min(pos * bsz, num_vertices))
    if cuts[-1] != num_vertices:
        cuts.append(num_vertices)
    return np.array(sorted(set(cuts)), dtype=np.int64)


def part_of(v: np.ndarray, boundaries: np.ndarray) -> np.ndarray:
    return np.searchsorted(boundaries, v, side="right") - 1


def _write_parts(out_dir: str, boundaries: np.ndarray, dedup: bool = False):
    """Group fn: one partition's edges -> sorted parquet file + manifest row.

    ``dedup=True`` drops duplicate (src,dst) pairs INSIDE the partition —
    the partition key is src, so all copies of a pair land in the same
    group and a local mask replaces a whole global groupby(['src','dst'])
    shuffle (measured: that shuffle alone cost more than the rest of the
    partition step combined).
    """

    def fn(t: pa.Table) -> pa.Table:
        part = int(t["part"][0].as_py())
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))  # src-major, dst-minor: CSR + sorted adjacency
        src, dst = src[order], dst[order]
        if dedup and len(src):
            keep = np.ones(len(src), dtype=bool)
            keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
            src, dst = src[keep], dst[keep]
        tab = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        pdir = os.path.join(out_dir, f"part={part:05d}")
        os.makedirs(pdir, exist_ok=True)
        # src-sorted adjacency delta-encodes extremely well: 2.5 B/edge vs
        # 7 B dictionary/snappy vs 16 B raw on the 16M-edge Zipf graph —
        # the parquet-native equivalent of the reference's ligra+ edge
        # compression (/root/reference/compress/ligra_plus_compress.cpp)
        pq.write_table(
            tab, os.path.join(pdir, "edges.parquet"),
            use_dictionary=False,
            column_encoding={"src": "DELTA_BINARY_PACKED",
                             "dst": "DELTA_BINARY_PACKED"},
            compression="snappy",
        )
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "num_edges": pa.array([len(tab)], pa.int64()),
                "begin": pa.array([int(boundaries[part])], pa.int64()),
                "end": pa.array([int(boundaries[part + 1])], pa.int64()),
            }
        )

    return fn


@dataclass
class Graph:
    """Handle to a partitioned edge table on disk + its metadata."""

    root: str
    num_vertices: int
    num_edges: int
    boundaries: np.ndarray  # len P+1 — vertex-range cuts of the fwd direction
    direction: str = "fwd"
    part_rows: dict[int, int] = field(default_factory=dict)

    @property
    def num_parts(self) -> int:
        return len(self.boundaries) - 1

    def part_dir(self, part: int) -> str:
        return os.path.join(self.root, self.direction, f"part={part:05d}")

    def edges_dataset(self) -> Dataset:
        import ray.data as rd

        # columns pruned at the read; also drops the hive-style `part=`
        # directory column the parquet reader would otherwise synthesise
        return rd.read_parquet(
            os.path.join(self.root, self.direction), columns=["src", "dst"]
        )

    def load_csr(self, part: int) -> "CSRPart":
        return CSRPart.load(self.part_dir(part), int(self.boundaries[part]),
                            int(self.boundaries[part + 1]))

    def meta_path(self) -> str:
        return os.path.join(self.root, f"meta_{self.direction}.json")

    def save_meta(self) -> None:
        write_json_atomic(
            self.meta_path(),
            {
                "num_vertices": self.num_vertices,
                "num_edges": self.num_edges,
                "boundaries": [int(b) for b in self.boundaries],
                "direction": self.direction,
                "part_rows": {str(k): v for k, v in self.part_rows.items()},
            },
        )

    @classmethod
    def load(cls, root: str, direction: str = "fwd") -> "Graph":
        m = read_json(os.path.join(root, f"meta_{direction}.json"))
        return cls(
            root=root,
            num_vertices=m["num_vertices"],
            num_edges=m["num_edges"],
            boundaries=np.array(m["boundaries"], dtype=np.int64),
            direction=direction,
            part_rows={int(k): v for k, v in m["part_rows"].items()},
        )


@dataclass
class CSRPart:
    """In-memory CSR for one vertex-range partition (actor-held state).

    The Ray stand-in for the reference's MutableBlockCSRGraph
    (/root/reference/core/data_structures/graph/mutable_block_csr_graph.h).
    """

    begin: int
    end: int
    indptr: np.ndarray  # len (end-begin)+1, int64 (small: V/P entries)
    # dst ids: uint32 when every id fits (the reference's VertexID is
    # uint32_t, /root/reference/core/common/types.h:13-22) — this is the
    # E-sized hot array of the measured memory-bound superstep, so
    # halving it halves DRAM traffic on the scatter gather; int64 only
    # beyond 2^32 vertices. All consumers subtract a lower range bound
    # (>= 0 by construction) or compare/index, so unsigned math is safe;
    # message rows cast back to int64 at the Arrow boundary.
    indices: np.ndarray

    @classmethod
    def load(cls, part_dir: str, begin: int, end: int) -> "CSRPart":
        path = os.path.join(part_dir, "edges.parquet")
        if not os.path.exists(path):
            n = end - begin
            return cls(begin, end, np.zeros(n + 1, np.int64), np.empty(0, np.uint32))
        tab = pq.read_table(path)
        src = tab["src"].to_numpy()
        dst = tab["dst"].to_numpy()
        n = end - begin
        deg = np.bincount(src - begin, minlength=n).astype(np.int64)
        indptr = np.concatenate([[0], np.cumsum(deg)])
        narrow = len(dst) == 0 or int(dst.max()) < 2**32
        return cls(begin, end, indptr,
                   dst.astype(np.uint32 if narrow else np.int64))

    def neighbors_flat(self, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(counts, flat neighbor ids) for a vertex subset — vectorised."""
        loc = v - self.begin
        starts = self.indptr[loc]
        counts = self.indptr[loc + 1] - starts
        return counts, self.indices[repeat_ranges(starts, counts)]

    def degrees(self, v: np.ndarray) -> np.ndarray:
        loc = v - self.begin
        return self.indptr[loc + 1] - self.indptr[loc]

    def intra_local(self) -> tuple[np.ndarray, np.ndarray]:
        """(src_loc, dst_loc) of the partition's INTRA-partition edges in
        local ids — the edge list the ASP locals-fixpoint kernels walk
        every superstep. Cached on the instance: the CSR is immutable and
        instances are memoised per (run_id, part) in superstep's
        process cache, so the O(E_p) mask+repeat runs once per worker
        process per run instead of once per superstep."""
        c = getattr(self, "_intra", None)
        if c is None:
            loc = (self.indices >= self.begin) & (self.indices < self.end)
            n = self.end - self.begin
            src_loc = np.repeat(np.arange(n, dtype=np.int64),
                                np.diff(self.indptr))[loc]
            dst_loc = self.indices[loc].astype(np.int64) - self.begin
            c = (src_loc, dst_loc)
            self._intra = c
        return c


def partition_edges(
    edges_ids: Dataset,
    root: str,
    num_vertices: int,
    num_parts: int,
    direction: str = "fwd",
    dedup_in_parts: bool = False,
    boundaries: np.ndarray | None = None,
    symmetrize: bool = True,
) -> Graph:
    """(src,dst) dataset -> range-partitioned sorted parquet + manifest.

    ``dedup_in_parts`` removes duplicate (src,dst) pairs during the
    per-partition write (src is the partition key, so the local mask is
    exact) — ONE shuffle total instead of a global multi-key groupby
    followed by the partition shuffle. The manifest (and num_edges)
    count post-dedup rows.

    ``boundaries`` fixes the vertex-range cuts instead of re-balancing —
    used by edge CONTRACTION (WCC/MST rebuild a shrunken live-edge set
    mid-run and the vertex-state partitioning must stay aligned).
    """
    if direction == "rev":
        edges_ids = edges_ids.map_batches(
            lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
            batch_format="pyarrow",
        )
    elif direction == "sym" and symmetrize:
        # symmetrize=False: caller guarantees the input is already
        # symmetric (e.g. the contracted live set of a sym graph)
        fwd = edges_ids
        rev = edges_ids.map_batches(
            lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
            batch_format="pyarrow",
        )
        edges_ids = fwd.union(rev)
        dedup_in_parts = True  # (a,b) + (b,a) in fwd would double up

    edges_ids = edges_ids.materialize()
    if boundaries is None:
        # histogram over the pre-dedup rows: duplicates inflate counts at
        # most uniformly (2x for sym), so edge-balanced cuts stay balanced
        boundaries = pick_boundaries(edges_ids, num_vertices, num_parts)

    def tag(t: pa.Table) -> pa.Table:
        p = part_of(t["src"].to_numpy(zero_copy_only=False), boundaries)
        return t.append_column("part", pa.array(p.astype(np.int64)))

    out_dir = os.path.join(root, direction)
    os.makedirs(out_dir, exist_ok=True)
    # materialize + coalesce the tagged table BEFORE the sort shuffle:
    # sampling re-executes a lazy upstream map, and sort task count
    # scales with input blocks (joins.coalesce)
    from .joins import coalesce

    tagged = coalesce(edges_ids.map_batches(tag, batch_format="pyarrow"))
    manifest = (
        tagged.groupby("part")
        .map_groups(_write_parts(out_dir, boundaries, dedup=dedup_in_parts),
                    batch_format="pyarrow")
        .to_pandas()
    )
    if len(manifest) == 0:  # empty edge set (e.g. fully contracted)
        manifest = manifest.reindex(columns=["part", "num_edges"])
    g = Graph(
        root=root,
        num_vertices=num_vertices,
        num_edges=int(manifest["num_edges"].sum()),
        boundaries=boundaries,
        direction=direction,
        part_rows=dict(zip(manifest["part"].astype(int), manifest["num_edges"].astype(int))),
    )
    g.save_meta()
    return g


def build_graph(
    edges_keys: Dataset,
    root: str,
    num_parts: int = 8,
    num_partitions: int = 16,
) -> tuple[Graph, Dataset]:
    """Full build: string-keyed edges -> (fwd Graph, vertex dict Dataset)."""
    os.makedirs(root, exist_ok=True)
    # consumed by both the dict build and the id mapping — pin once
    edges_keys = edges_keys.materialize()
    vdict = build_vertex_dict(edges_keys, root, num_partitions).materialize()
    num_vertices = vdict.count()
    # exact multi-edge dedup happens inside the partition write (src is
    # the partition key), saving the global (src,dst) groupby shuffle
    edges_ids = map_edges_to_ids(edges_keys, vdict, num_partitions,
                                 dedup=False, num_vertices=num_vertices)
    g = partition_edges(edges_ids, root, num_vertices, num_parts, "fwd",
                        dedup_in_parts=True)
    return g, vdict


def degrees_dataset(g: Graph) -> Dataset:
    """(v, outdeg) for every vertex id in the graph's ranges — a per-part
    map over the stored CSRs (the converter's degree pass,
    /root/reference/tools/graph_partitioner/partitioner/hash_based_edgecut.cpp:82-100)."""
    import ray.data as rd

    boundaries = g.boundaries
    root, direction = g.root, g.direction
    P = g.num_parts

    def emit(batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch["id"].to_numpy():
            p = int(p)
            begin, end = int(boundaries[p]), int(boundaries[p + 1])
            csr = CSRPart.load(os.path.join(root, direction, f"part={p:05d}"), begin, end)
            v = np.arange(begin, end, dtype=np.int64)
            outs.append(pa.table({"v": pa.array(v), "outdeg": pa.array(csr.degrees(v))}))
        return pa.concat_tables(outs)

    return rd.range(P, override_num_blocks=P).map_batches(
        emit, batch_format="pyarrow", batch_size=1
    )


def dense_rank_int(keys: Dataset, col: str = "key", bucket_width: int = 1 << 12) -> Dataset:
    """Distinct int keys -> (key, v) with ORDER-PRESERVING dense ids [0, V).

    Unlike :func:`build_vertex_dict` (hash buckets — order-scrambling),
    this ranks within *range* buckets (``key // W``) and offsets by the
    bucket-count cumsum, so ``key1 < key2  =>  id1 < id2``. Internal-id
    comparisons (WCC min-label, LPA tie-breaks) then mirror key order,
    which lets an external SQL oracle reproduce them on the raw keys.
    Only the bucket-count table reaches the driver.
    """
    distinct = keys.groupby(col).aggregate(Count(alias_name="_n")).select_columns([col])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t[col].to_numpy(zero_copy_only=False) // bucket_width
        return t.append_column("rbucket", pa.array(b.astype(np.int64)))

    distinct = distinct.map_batches(add_bucket, batch_format="pyarrow").materialize()
    counts = (
        distinct.groupby("rbucket").aggregate(Count(alias_name="n"))
        .to_pandas().sort_values("rbucket")
    )
    # offsets over OBSERVED buckets only (one row per non-empty bucket —
    # O(V/W) driver memory). A dense array indexed by bucket id would
    # scale with MAX(key)/W instead (OOM on sparse 64-bit keys) and wrap
    # around on negative keys; the mapping handles both (floor-division
    # buckets sort correctly for negatives).
    bvals = counts["rbucket"].to_numpy(dtype=np.int64)
    boffs = np.concatenate([[0], np.cumsum(counts["n"].to_numpy())[:-1]])
    offsets_map = dict(zip(bvals.tolist(), boffs.tolist()))

    def rank_group(t: pa.Table) -> pa.Table:
        b = int(t["rbucket"][0].as_py())
        k = np.sort(t[col].to_numpy(zero_copy_only=False))
        v = offsets_map[b] + np.arange(len(k), dtype=np.int64)
        return pa.table({"key": pa.array(k), "v": pa.array(v)})

    return distinct.groupby("rbucket").map_groups(rank_group, batch_format="pyarrow")


def graph_from_id_edges(
    edges_ids: Dataset,
    root: str,
    num_vertices: int | None = None,
    num_parts: int = 8,
    dedup: bool = True,
) -> Graph:
    """Build a Graph from an already-integer (src,dst) dataset.

    Ids need not be dense; ranges just contain holes (zero-degree slots).
    Used by tests (hand-built graphs) and the testdata-derived pipelines
    where keys are already small ints. ``dedup=False`` skips the exact
    multi-edge dedup shuffle for inputs known clean (bench generators).
    """
    os.makedirs(root, exist_ok=True)
    edges_ids = edges_ids.materialize()
    if num_vertices is None:
        hi = edges_ids.map_batches(
            lambda t: pa.table({
                "m": pa.array([max(
                    int(pc.max(t["src"]).as_py() or 0),
                    int(pc.max(t["dst"]).as_py() or 0),
                )])
            }),
            batch_format="pyarrow",
        ).max("m")
        num_vertices = int(hi) + 1
    cleaned = edges_ids.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
        batch_format="pyarrow",
    )
    return partition_edges(cleaned, root, num_vertices, num_parts, "fwd",
                           dedup_in_parts=dedup)


def sym_dedup_edges(edges: Dataset, num_buckets: int = 64) -> Dataset:
    """Canonical symmetric dedup: drop self-loops, canonicalise to
    (min,max), dedup exactly, emit BOTH orientations — the input
    contract of degree-semantics kernels (kcore) whose stored ``fwd``
    must be the undirected graph.

    Zipf-safe at scale: a per-batch ``np.unique`` combiner first, then
    ONE bounded shuffle on ``hash(pair) % num_buckets`` (each distinct
    pair lands wholly in one bucket) with a vectorised per-bucket
    unique — the MST canonical-pair pattern, not a two-column global
    sort."""
    from .util import splitmix64

    def canon(t: pa.Table) -> pa.Table:
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        lo = np.minimum(a[keep], b[keep])
        hi = np.maximum(a[keep], b[keep])
        pairs = np.unique(np.stack([lo, hi], 1), axis=0)  # batch combiner
        key = splitmix64(pairs[:, 0].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                         ^ pairs[:, 1].astype(np.uint64))
        return pa.table({
            "src": pa.array(pairs[:, 0]), "dst": pa.array(pairs[:, 1]),
            "bucket": pa.array((key % np.uint64(num_buckets)).astype(np.int64)),
        })

    def uniq_both(t: pa.Table) -> pa.Table:
        lo = t["src"].to_numpy(zero_copy_only=False)
        hi = t["dst"].to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([lo, hi], 1), axis=0)
        return pa.table({
            "src": np.concatenate([pairs[:, 0], pairs[:, 1]]),
            "dst": np.concatenate([pairs[:, 1], pairs[:, 0]]),
        })

    return (edges.map_batches(canon, batch_format="pyarrow")
            .groupby("bucket").map_groups(uniq_both, batch_format="pyarrow"))


def derive_direction(g: Graph, direction: str, num_parts: int | None = None) -> Graph:
    """Materialise (once, cached on disk) the rev/sym variant of a graph.

    Works from a rev-only store too (``ingest-csv --store-strategy
    incoming`` keeps just the in-edge CSRs): the rev rows are the fwd
    edges transposed, so fwd orientation is recovered exactly (multi-
    edges included) and partition_edges re-derives any direction from it.
    """
    meta = os.path.join(g.root, f"meta_{direction}.json")
    if os.path.exists(meta):
        return Graph.load(g.root, direction)
    if g.direction == "fwd":
        base, edges = g, g.edges_dataset()
    elif os.path.exists(os.path.join(g.root, "meta_fwd.json")):
        base = Graph.load(g.root, "fwd")
        edges = base.edges_dataset()
    elif g.direction == "rev":
        base = g
        edges = g.edges_dataset().map_batches(
            lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
            batch_format="pyarrow",
        )
    else:
        # a sym store holds both orientations of every edge — the original
        # fwd orientation is not recoverable from it
        raise ValueError(
            f"cannot derive '{direction}' at {g.root}: no fwd store and the "
            f"'{g.direction}' store does not determine edge orientation")
    return partition_edges(
        edges, g.root, g.num_vertices,
        num_parts or base.num_parts, direction,
    )
