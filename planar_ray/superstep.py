"""BSP superstep engine — the Ray-Data-native replacement for Planar's
PRAM kernel-plug loop (PEval/IncEval over thread pools + io_uring,
/root/reference/core/apis/planar_app_base_op.h) re-expressed as dataset
pipelines.

One superstep is ONE wide shuffle, a single linear chain:

  state (part, v, role=0, cols...)                        [materialized]
    -> map_batches(scatter_fn, tasks)                     # gather-scatter
         per-partition CSR (object-store resident, memoised per worker
         process) emits the state rows unchanged PLUS pre-combined
         message rows (part=part_of(dst), v=dst, role=1, cols...) — the
         per-batch combiner replacing the reference's WriteMin/WriteAdd
         atomics (core/update_stores/bsp_update_store.h:113-165)
    -> groupby('part').map_groups(apply)                  # THE shuffle
         splits rows by role, aggregates messages into dense per-range
         numpy arrays (deterministic: sorted before reduction), runs the
         kernel's vertex program, emits the next state
    -> repartition(P)                                     # cap block count
    -> materialize()                                      # the BSP barrier
    -> tiny aggregate pass (max delta / changed count...) # convergence
    -> optional parquet checkpoint + JSON manifest        # resume point

Convergence scalars come back as Ray aggregates, never via driver-side
row iteration. Carrying state through the scatter stage co-groups
state with messages in one all-to-all without a join.

Iterative-pipeline lessons baked in (each measured on this Ray 2.49):
* per-execution actor pools cost ~1 s spin-up; scatter runs as TASKS
  with CSRs pinned in the object store instead (see below);
* ``Dataset.union(materialized, derived_from_it)`` re-grows the plan
  every iteration (runtime doubles per superstep) — hence the
  state-passthrough in scatter instead of a union co-group;
* the sort shuffle emits one block per input block — without the
  ``repartition(P)`` coalesce the block count doubles per superstep.

Scale notes (the 10^12-edge framing):
* message volume into the shuffle is bounded by (#scatter batches ×
  vertices-per-part) thanks to the per-batch combine — a high in-degree
  hub receives O(#batches) partials, not O(in-degree) rows;
* CSR blocks live in the distributed object store (one copy per node,
  zero-copy reads; spilled by Ray under pressure) — the stand-in for
  the reference's byte-budgeted edge buffers (core/scheduler/
  edge_buffer2.h);
* frontier kernels (WCC/SSSP) scatter only ``active`` rows.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Max, Sum

from .graph import CSRPart, Graph, part_of
from .util import read_json, write_json_atomic

ROLE_STATE, ROLE_MSG, ROLE_GLOBAL = 0, 1, 2
_BASE_FIELDS = [("part", pa.int64()), ("v", pa.int64()), ("role", pa.int8())]


class Kernel:
    """Vertex/edge kernel contract (the user-extension surface that
    replaces PIE::PEval/IncEval, /root/reference/core/apis/pie.h:9-27).

    Subclasses define:
      columns   — {name: pyarrow type} for all per-vertex + message cols
      direction — which stored edge direction scatter walks (fwd/rev/sym)
      stats_spec — [(alias, column, 'max'|'sum')] convergence scalars;
                   computed per partition INSIDE the apply stage and
                   merged on the driver (no extra aggregate job)
      init_cols(part, begin, end, csr) -> {col: np.ndarray}  (per vertex)
      scatter(csr, v, cols) -> {'v': targets, ...} | None    (pre-combined)
      apply(begin, end, state, msgs, ctx) -> {col: np.ndarray}
      converged(stats, superstep) -> bool
    """

    name: str = "kernel"
    direction: str = "fwd"
    columns: dict[str, pa.DataType] = {}
    stats_spec: list[tuple[str, str, str]] = [
        ("max_delta", "delta", "max"),
        ("changed", "changed", "sum"),
        ("in_msgs", "in_msgs", "sum"),
    ]

    def init_cols(self, part: int, begin: int, end: int, csr: CSRPart) -> dict:
        raise NotImplementedError

    def scatter(self, csr: CSRPart, v: np.ndarray, cols: dict) -> dict | None:
        raise NotImplementedError

    def apply(self, begin: int, end: int, state: dict, msgs: dict, ctx: dict) -> dict:
        raise NotImplementedError

    def global_partials(self, v: np.ndarray, cols: dict) -> dict | None:
        """Optional: per-batch contributions to GLOBAL scalars (e.g.
        PageRank's dangling mass). Returned {col: scalar} is replicated to
        every partition as role-2 rows riding the same shuffle, so the
        next apply sees the global value WITHOUT a separate aggregate job
        per superstep (summed per column, sorted first for determinism,
        into ctx['global_partials'])."""
        return None

    def stat_aggs(self) -> list:
        """Ray Data aggregates equivalent to stats_spec (used once, to
        seed globals from the initial state)."""
        return [
            (Max(on=col, alias_name=alias) if op == "max"
             else Sum(on=col, alias_name=alias))
            for alias, col, op in self.stats_spec
        ]

    def local_stats(self, cols: dict) -> dict:
        """Per-partition stats_spec values over the new state columns."""
        out = {}
        for alias, col, op in self.stats_spec:
            v = np.asarray(cols[col])
            if len(v) == 0:
                out[alias] = None
            elif op == "max":
                out[alias] = float(v.max())
            else:
                out[alias] = float(v.sum())
        return out

    @staticmethod
    def merge_stats(parts: list[dict], spec) -> dict:
        out = {}
        for alias, _col, op in spec:
            vals = [p[alias] for p in parts if p.get(alias) is not None]
            if not vals:
                out[alias] = 0
            elif op == "max":
                out[alias] = max(vals)
            else:
                out[alias] = sum(sorted(vals))  # sorted: deterministic fp sum
        return out

    def converged(self, stats: dict, superstep: int) -> bool:
        return False

    # -- shared helpers -----------------------------------------------------
    def schema(self) -> pa.Schema:
        return pa.schema(_BASE_FIELDS + list(self.columns.items()))

    def empty_table(self) -> pa.Table:
        return self.schema().empty_table()

    def rows(self, part_arr, v, role: int, cols: dict) -> pa.Table:
        n = len(v)
        data = {"part": pa.array(np.asarray(part_arr, dtype=np.int64)),
                "v": pa.array(np.asarray(v, dtype=np.int64)),
                "role": pa.array(np.full(n, role, dtype=np.int8))}
        for name, typ in self.columns.items():
            if name in cols:
                val = cols[name]
                if isinstance(val, (pa.Array, pa.ChunkedArray)):
                    data[name] = val if val.type == typ else val.cast(typ)
                else:
                    data[name] = pa.array(np.asarray(val)).cast(typ)
            else:
                data[name] = pa.nulls(n, typ)
        return pa.table(data, schema=self.schema())

    # columns that actually ride in message/global rows (direct mode
    # ships ONLY these — message tables otherwise carry every state
    # column as nulls, tripling per-superstep plasma traffic; kernels
    # override to slim their wire format)
    @property
    def message_columns(self) -> list:
        return list(self.columns)

    def message_schema(self) -> pa.Schema:
        return pa.schema(
            [("v", pa.int64()), ("role", pa.int8())]
            + [(n, self.columns[n]) for n in self.message_columns]
        )

    def msg_rows(self, v, role: int, cols: dict) -> pa.Table:
        n = len(v)
        data = {"v": pa.array(np.asarray(v, dtype=np.int64)),
                "role": pa.array(np.full(n, role, dtype=np.int8))}
        for name in self.message_columns:
            typ = self.columns[name]
            if name in cols:
                data[name] = pa.array(np.asarray(cols[name])).cast(typ)
            else:
                data[name] = pa.nulls(n, typ)
        return pa.table(data, schema=self.message_schema())

    def empty_msg_table(self) -> pa.Table:
        return self.message_schema().empty_table()


def narrow_vertex_type(num_vertices: int) -> pa.DataType:
    """Narrowest unsigned Arrow type that holds any vertex id / label —
    the reference keeps a uint16 VertexData variant for label kernels to
    halve state bytes (/root/reference/core/common/types.h:25-28); here
    it halves (or quarters) the label column in state tables, messages
    and checkpoints. Kernel numpy math upcasts to int64 transparently."""
    if num_vertices <= (1 << 16):
        return pa.uint16()
    if num_vertices <= (1 << 32):
        return pa.uint32()
    return pa.int64()


# dense-bincount gate for combine_sum: a float64 accumulator over the
# whole id space; 32M ids = 256 MB per task — beyond that, sort-based
DENSE_SUM_MAX_IDS = 33_554_432


def combine_sum(targets: np.ndarray, vals: np.ndarray,
                num_targets: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Grouped sum of float partials, deterministic for a fixed input
    order (a partitioned graph's CSR order — parallelism-invariant).

    With ``num_targets`` under the dense gate: one-pass ``np.bincount``
    (measured 10x the lexsort this replaced). Otherwise: single-key
    stable sort + ``add.reduceat`` (2.8x). Sums accumulate in input
    order rather than a value-canonical order, so results across
    *different partitionings* agree to float ulp, not bitwise —
    well inside every consumer's 1e-9/round-6 tolerance.
    """
    if len(targets) == 0:
        return targets, vals
    if num_targets is not None and num_targets <= DENSE_SUM_MAX_IDS:
        s = np.bincount(targets, weights=vals, minlength=num_targets)
        # uniq from a COUNT bincount, not the sum vector: a target whose
        # partials sum to exactly 0.0 still received messages, and the
        # sort path below emits its zero-valued row — keying on the sum
        # dropped it, silently diverging in_msgs between the two paths
        uniq = np.flatnonzero(np.bincount(targets, minlength=num_targets))
        return uniq, s[uniq]
    order = np.argsort(targets, kind="stable")
    t, v = targets[order], vals[order]
    uniq, starts = np.unique(t, return_index=True)
    return uniq, np.add.reduceat(v, starts)


def combine_min(targets: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    # min is order-independent (exact), so a single-key stable sort +
    # minimum.reduceat replaces the two-key lexsort (2.8x measured)
    if len(targets) == 0:
        return targets, vals
    order = np.argsort(targets, kind="stable")
    t, v = targets[order], vals[order]
    uniq, starts = np.unique(t, return_index=True)
    return uniq, np.minimum.reduceat(v, starts)


def combine_max(targets: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    # mirror of combine_min (max is order-independent, exact)
    if len(targets) == 0:
        return targets, vals
    order = np.argsort(targets, kind="stable")
    t, v = targets[order], vals[order]
    uniq, starts = np.unique(t, return_index=True)
    return uniq, np.maximum.reduceat(v, starts)


def _is_nested(typ: pa.DataType) -> bool:
    return pa.types.is_list(typ) or pa.types.is_large_list(typ)


def _col_value(arr, typ: pa.DataType):
    """State/message column -> kernel-visible value: numpy for scalar
    types (the long-standing contract), the Arrow array itself for
    nested (list) types — ``to_numpy`` on a list column materialises one
    Python object per row, which at V/P rows per task would dwarf the
    actual compute, while the Arrow array hands the kernel zero-copy
    ``.values`` / ``.offsets`` buffers."""
    if _is_nested(typ):
        return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return arr.to_numpy(zero_copy_only=False)


def _mask_col(col, mask: np.ndarray):
    """Boolean-mask a kernel column value (numpy fancy-index for scalars,
    Arrow filter for nested arrays)."""
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        return col.filter(pa.array(mask))
    return col[mask]


def combine_pair_counts(a: np.ndarray, b: np.ndarray, w: np.ndarray | None = None):
    """Grouped count/sum over (a, b) pairs -> (ua, ub, counts). Deterministic."""
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    w = np.ones(len(a), np.int64) if w is None else w[order]
    if len(a) == 0:
        return a, b, w
    new = np.empty(len(a), dtype=bool)
    new[0] = True
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(new)
    return a[starts], b[starts], np.add.reduceat(w, starts)


# ---------------------------------------------------------------------------
# worker-process-resident state.
#
# A Ray Data actor pool is created and torn down PER map_batches execution;
# measured on this Ray (2.49): ~0.8-1.5 s per superstep for the pool alone,
# vs ~0.07 s for task-based stages. A BSP engine runs hundreds of
# supersteps, so the gather-scatter stage runs as plain tasks instead, with
# the per-partition CSR blocks resident in the OBJECT STORE (ray.put once
# at engine start; ray.get in a task is a zero-copy view on the same node)
# and memoised in a worker-process-global cache. Ray reuses worker
# processes across tasks and supersteps, so this gives exactly the
# "resident edge blocks" behaviour of the reference's EdgeBuffer2
# (/root/reference/core/scheduler/edge_buffer2.h) without per-step actor
# churn. On a multi-node cluster the object store transfers a partition's
# CSR to a node at most once.
# ---------------------------------------------------------------------------

_PROC_CACHE: dict = {}  # (run_id, kind, part) -> object; run-scoped


def _cache_get(run_id: str, kind: str, key, builder):
    # evict entries of other runs so long pytest sessions don't accumulate
    stale = [k for k in _PROC_CACHE if k[0] != run_id]
    for k in stale:
        del _PROC_CACHE[k]
    ck = (run_id, kind, key)
    if ck not in _PROC_CACHE:
        _PROC_CACHE[ck] = builder()
    return _PROC_CACHE[ck]


def _csr_from_ref(run_id: str, part: int, ref) -> CSRPart:
    import ray

    def build():
        begin, end, indptr, indices = ray.get(ref)
        return CSRPart(begin, end, indptr, indices)

    return _cache_get(run_id, "csr", part, build)


def _kernel_from_ref(run_id: str, ref) -> Kernel:
    import ray

    return _cache_get(run_id, "kernel", 0, lambda: ray.get(ref))


def make_scatter_fn(run_id: str, kernel_ref, csr_refs: dict, boundaries_list: list):
    """Task-based gather-scatter stage (closure is tiny: refs only).

    Emits the input state rows unchanged (role=0) PLUS the pre-combined
    message rows (role=1). Carrying the state through the same stage keeps
    the superstep a single linear chain — ``Dataset.union`` of a
    materialised dataset with a dataset derived from it re-grows the plan
    every iteration on this Ray version (measured: runtime doubles per
    superstep), so the classic state∪msgs co-group is expressed without
    union at identical shuffle volume.
    """
    boundaries = np.array(boundaries_list, dtype=np.int64)

    P = len(boundaries_list) - 1

    def scatter_fn(batch: pa.Table) -> pa.Table:
        k = _kernel_from_ref(run_id, kernel_ref)
        outs = [batch]  # state passthrough (role=0)
        v = batch["v"].to_numpy(zero_copy_only=False)
        gp = k.global_partials(
            v, {n: _col_value(batch[n], k.columns[n])
                for n in k.columns if n in batch.column_names}
        )
        if gp:
            # replicate this batch's global partial to every partition
            gv = boundaries[:-1]
            outs.append(k.rows(np.arange(P, dtype=np.int64), gv, ROLE_GLOBAL,
                               {n: np.full(P, val) for n, val in gp.items()}))
        if "active" in k.columns:
            act = batch["active"].to_numpy(zero_copy_only=False).astype(bool)
            if not act.any():
                # keep any role-2 global-partial rows already emitted
                return pa.concat_tables(outs)
            batch = batch.filter(pa.array(act))
            v = v[act]
        cols = {name: _col_value(batch[name], k.columns[name])
                for name in k.columns if name in batch.column_names}
        parts = part_of(v, boundaries)
        for p in np.unique(parts):
            m = parts == p
            csr = _csr_from_ref(run_id, int(p), csr_refs[int(p)])
            out = k.scatter(csr, v[m],
                            {n: _mask_col(c, m) for n, c in cols.items()})
            if out is not None and len(out["v"]):
                tgt = out.pop("v")
                outs.append(k.rows(part_of(tgt, boundaries), tgt, ROLE_MSG, out))
        return pa.concat_tables(outs)

    return scatter_fn


class _StatsBoard:
    """num_cpus=0 actor collecting per-partition convergence stats pushed
    from INSIDE the apply stage — replaces the per-superstep aggregate
    job (a whole second pipeline execution) with P tiny actor RPCs.

    Pushes are FIRE-AND-FORGET: a blocking ``ray.get`` on the push inside
    every apply task holds a worker CPU slot for an actor round-trip, and
    under driver-node contention (the bench suite, a busy cluster) those
    round-trips inflate and serialise the apply tail — measured as the
    round-2 2.1x PageRank driver-bench regression. The driver instead
    POLLS ``peek`` until all P partitions have reported (the materialize
    barrier guarantees every push was *sent* before its task finished;
    delivery needs only the worker process to stay alive, which Ray's
    worker reuse gives; a lost push falls back to one aggregate job)."""

    def __init__(self):
        self._data: dict = {}

    def push(self, superstep: int, part: int, stats: dict) -> None:
        self._data[(superstep, part)] = stats

    def peek(self, superstep: int) -> list[dict]:
        return [v for (s, _p), v in self._data.items() if s == superstep]

    def gc(self, superstep: int) -> None:
        """Drop entries at or below ``superstep`` (already merged)."""
        self._data = {k: v for k, v in self._data.items() if k[0] > superstep}


def make_apply_fn(run_id: str, kernel_ref, boundaries_list: list[int], ctx: dict,
                  stats_board=None, csr_refs: dict | None = None):
    boundaries = np.array(boundaries_list, dtype=np.int64)

    def apply_group(t: pa.Table) -> pa.Table:
        kernel = _kernel_from_ref(run_id, kernel_ref)
        part = int(t["part"][0].as_py())
        begin, end = int(boundaries[part]), int(boundaries[part + 1])
        role = t["role"].to_numpy(zero_copy_only=False)
        is_state = role == ROLE_STATE
        is_msg = role == ROLE_MSG
        is_gbl = role == ROLE_GLOBAL
        names = [n for n in kernel.columns]
        cols = {n: _col_value(t[n], kernel.columns[n]) for n in names}
        vv = t["v"].to_numpy(zero_copy_only=False)
        state = {"v": vv[is_state]}
        msgs = {"v": vv[is_msg]}
        for n in names:
            state[n] = _mask_col(cols[n], is_state)
            msgs[n] = _mask_col(cols[n], is_msg)
        local_ctx = ctx
        wants_csr = getattr(kernel, "wants_csr", False) and csr_refs is not None
        if is_gbl.any() or wants_csr:
            local_ctx = dict(ctx)
        if wants_csr:
            local_ctx["csr"] = _csr_from_ref(run_id, part, csr_refs[part])
        if is_gbl.any():
            local_ctx["global_partials"] = {
                n: float(np.sort(cols[n][is_gbl]).sum()) for n in names
                if not _is_nested(kernel.columns[n])
                and not np.all(np.isnan(cols[n][is_gbl].astype(np.float64)))
            }
        new = kernel.apply(begin, end, state, msgs, local_ctx)
        v_new = new.pop("v")
        if stats_board is not None:
            # fire-and-forget: the driver polls peek() until P partitions
            # reported (see _StatsBoard docstring — a blocking ray.get
            # here stalls a worker slot per group under contention)
            stats_board.push.remote(ctx["superstep"], part,
                                    kernel.local_stats(new))
        return kernel.rows(np.full(len(v_new), part, np.int64), v_new,
                           ROLE_STATE, new)

    return apply_group


def make_init_fn(run_id: str, kernel_ref, csr_refs: dict, boundaries_list: list,
                 stats_board=None):
    boundaries = np.array(boundaries_list, dtype=np.int64)

    def init_fn(batch: pa.Table) -> pa.Table:
        kernel = _kernel_from_ref(run_id, kernel_ref)
        outs = []
        for p in batch["id"].to_numpy():
            p = int(p)
            begin, end = int(boundaries[p]), int(boundaries[p + 1])
            csr = _csr_from_ref(run_id, p, csr_refs[p])
            cols = kernel.init_cols(p, begin, end, csr)
            v = cols.pop("v", np.arange(begin, end, dtype=np.int64))
            if stats_board is not None:
                stats_board.push.remote(-1, p, kernel.local_stats(cols))
            outs.append(kernel.rows(np.full(len(v), p, np.int64), v,
                                    ROLE_STATE, cols))
        return pa.concat_tables(outs) if outs else kernel.empty_table()

    return init_fn


def _load_csr_arrays(root: str, direction: str, part: int, begin: int, end: int):
    """Remote task body: partition payload -> CSR arrays (go into plasma).

    Default source is the delta-packed parquet; PLANAR_CSR_FORMAT=bin
    reads the block-binary payload instead (blockbin.py — the reference's
    S8 Pram format, written by ``cli.py convert``; raw arrays, no decode)
    when present. Same arrays either way — parity-tested."""
    pdir = os.path.join(root, direction, f"part={part:05d}")
    if (os.environ.get("PLANAR_CSR_FORMAT") == "bin"
            and os.path.isdir(os.path.join(pdir, "blockbin"))):
        from .blockbin import read_block_bin

        b, e, indptr, indices = read_block_bin(pdir)
        if (b, e) != (begin, end):
            # A self-consistent but STALE payload (graph re-ingested in
            # place after `cli convert`, boundaries shifted) would silently
            # compute scatter targets against the wrong vertex ranges.
            raise ValueError(
                f"{pdir}/blockbin: vertex range [{b},{e}) disagrees with "
                f"the graph manifest [{begin},{end}) — stale blockbin "
                f"payload; re-run `cli convert` or unset PLANAR_CSR_FORMAT")
        return b, e, indptr, indices
    csr = CSRPart.load(pdir, begin, end)
    return csr.begin, csr.end, csr.indptr, csr.indices


# ---------------------------------------------------------------------------
# direct partition-to-partition exchange (Engine(exchange="direct"))
#
# The dataset-mode superstep routes messages through Ray Data's SORT-based
# groupby("part") shuffle and re-ships the passthrough state rows every
# superstep. For kernels whose message volume stays O(E) after combining
# (LPA's (dst,label) pairs — measured 7 s of an 8.5 s superstep in the
# sort+apply on the 16M-edge Zipf graph), the sort is pure overhead: the
# destination partition of every row is KNOWN at scatter time (part_of(dst)
# over fixed boundaries). Direct mode is the classic BSP all-to-all as raw
# Ray tasks — the documented last-resort path for semantics the Dataset API
# cannot express (a co-partitioned iterative exchange without a sort):
#
#   per superstep: P scatter tasks (one per partition; state table stays
#   IN its partition, never shipped) each return P per-destination message
#   tables (num_returns=P); P apply tasks consume their column of refs +
#   their local state table and return (new state table, stats dict).
#   ray.get on the stats refs is the BSP barrier.
#
# Partitioning assumption (document per SURVEY §7.7): state and messages
# are range-partitioned by the SAME fixed boundaries as the CSR blocks;
# one partition's state+messages fit a worker's heap (identical to the
# dataset-mode apply-group assumption). Object lifetimes: at most two
# supersteps of state tables are live; message tables free after apply.
#
# TWO-LEVEL (node-major) wire — the cluster-scale form of the exchange.
# The flat wire ships a P x P message-table matrix per superstep; at
# cluster scale (P in the thousands so a partition fits a worker heap)
# that is millions of tiny plasma objects per superstep, and the object
# count — not the bytes — becomes the bottleneck (measured here already:
# P=16 beat P=32 on one box, SURVEY §7.12). With ``group_cuts`` (G+1
# partition indices cutting [0..P] into G contiguous destination GROUPS
# = nodes), scatter pre-combines per destination group instead: ONE
# table per (src_part, dst_group), P x G objects. Rows inside a group
# table are ordered by destination partition with the member row-offsets
# carried as ``cuts`` schema metadata (dense vectors span the group's
# contiguous vertex range), so each member partition's apply SLICES its
# share zero-copy — the "intra-node split" costs no extra task wave. On
# a real cluster a group's table is fetched to its node once and all
# member partitions read the same plasma object. Bit-identical to the
# flat wire (same per-slot accumulation order) — parity-tested.
# ---------------------------------------------------------------------------


def _build_exchange_plan(csr_arrays, boundaries_list: list):
    """Static per-partition exchange plan for ``vertex_rate`` kernels
    (computed ONCE per run, pinned in the object store like the CSR):
    the CSR's edges sorted by destination partition, each edge stored as
    (local source offset, local target offset) int32 pairs.

    Per superstep the scatter becomes, per destination: one gather from
    the partition's V/P-sized per-vertex rate array (cache-resident —
    NOT an E-sized permutation gather, which random-reads a full cache
    line per 8-byte value and saturates a node's DRAM long before its
    cores) + one ``bincount`` into a dense accumulator sized to the
    destination's vertex range. lsrc/ltgt stream sequentially.
    """
    csr = CSRPart(*csr_arrays)
    boundaries = np.array(boundaries_list, dtype=np.int64)
    P = len(boundaries) - 1
    idx = csr.indices
    parts = part_of(idx, boundaries)
    perm = np.argsort(parts, kind="stable")
    sp = parts[perm]
    qcuts = np.searchsorted(sp, np.arange(P + 1)).astype(np.int64)
    max_range = int((boundaries[1:] - boundaries[:-1]).max()) if P else 0
    ldt = np.int32 if max_range < 2**31 else np.int64
    ltgt = (idx[perm] - boundaries[sp]).astype(ldt)
    n_local = csr.end - csr.begin
    src_of_edge = np.repeat(np.arange(n_local, dtype=np.int64),
                            np.diff(csr.indptr))
    lsrc = src_of_edge[perm].astype(ldt)
    return lsrc, qcuts, ltgt


def _direct_scatter(run_id: str, kernel: Kernel, csr_arrays, boundaries_list: list,
                    part: int, state_tab: pa.Table, plan_arrays=None,
                    group_cuts: list | None = None):
    """One partition's state -> per-DESTINATION message tables
    (role-1 pre-combined messages + role-2 global-partial rows).

    A destination is one partition (flat wire, ``group_cuts=None``) or a
    contiguous GROUP of partitions (two-level node-major wire — see the
    module comment above): group tables order rows by member partition
    and carry the member row-offsets as ``cuts`` schema metadata so the
    apply side slices its share zero-copy; global partials ride as
    ``g_*`` schema metadata instead of role-2 rows.

    ``kernel`` / ``csr_arrays`` arrive as top-level ObjectRef args, which
    Ray auto-dereferences in the worker (zero-copy local fetch from the
    object store — the same pinned objects the dataset path memoises)."""
    k = kernel
    boundaries = np.array(boundaries_list, dtype=np.int64)
    P = len(boundaries_list) - 1
    dcuts = (np.arange(P + 1, dtype=np.int64) if group_cuts is None
             else np.asarray(group_cuts, dtype=np.int64))
    G = len(dcuts) - 1
    grouped = group_cuts is not None
    per_dest: list[list] = [[] for _ in range(G)]
    dest_meta: list[dict] = [{} for _ in range(G)]
    v = state_tab["v"].to_numpy(zero_copy_only=False)
    cols = {n: _col_value(state_tab[n], k.columns[n])
            for n in k.columns if n in state_tab.column_names}
    gp = k.global_partials(v, cols)
    meta_gp = None
    active = None
    if "active" in k.columns:
        active = cols["active"].astype(bool)
    if active is None or active.any():
        vv = v if active is None else v[active]
        ccols = (cols if active is None
                 else {n: _mask_col(c, active) for n, c in cols.items()})
        csr = CSRPart(*csr_arrays)
        vr = getattr(k, "vertex_rate", None)
        raw = getattr(k, "scatter_raw", None)
        out = None
        if vr is not None and plan_arrays is not None:
            # static-scatter kernels + precomputed plan (see
            # _build_exchange_plan): per-vertex rate gather (the rate
            # array is V/P-sized, cache-resident) + one bincount per
            # destination, all over local int32 offsets
            rate = vr(csr, v, cols)
            if rate is not None:
                lsrc, qcuts, ltgt = plan_arrays
                vals = rate[lsrc]
                # global partials ride as schema metadata on this
                # partition's outgoing tables (attached after concat,
                # read back by _direct_apply from any table)
                if gp:
                    meta_gp = {b"g_" + n.encode(): repr(float(v_)).encode()
                               for n, v_ in gp.items()}
                    gp = None  # consumed
                for gi in range(G):
                    q0, q1 = int(dcuts[gi]), int(dcuts[gi + 1])
                    lo, hi = int(qcuts[q0]), int(qcuts[q1])
                    if lo == hi:
                        continue
                    b0, b1 = int(boundaries[q0]), int(boundaries[q1])
                    gt = ltgt[lo:hi]
                    if grouped and q1 - q0 > 1:
                        # plan targets are per-PARTITION-local: lift each
                        # member segment into the group's contiguous range
                        seg_lens = (qcuts[q0 + 1:q1 + 1]
                                    - qcuts[q0:q1]).astype(np.int64)
                        gt = gt + np.repeat(boundaries[q0:q1] - b0, seg_lens)
                    s = np.bincount(gt, weights=vals[lo:hi],
                                    minlength=b1 - b0)
                    c = np.bincount(gt, minlength=b1 - b0).astype(np.int32)
                    # adaptive wire format: dense (sum, count) vectors at
                    # 12 B/slot when the destination range is mostly hit,
                    # pre-combined rows at ~20 B/row when sparse — at web
                    # scale (P^2 >> E/V) pairs are sparse and rows win;
                    # on mid-size graphs dense skips the apply bincount
                    nz = np.flatnonzero(c)
                    if len(nz) * 5 >= (b1 - b0) * 3:
                        # dcnt ships PRESENCE (0/1 per slot per source),
                        # not edge counts: a sparse delivery is one
                        # pre-combined row per (source, slot), so
                        # presence makes in_msgs identical whichever
                        # format the adaptive wire picks (and matches
                        # dataset mode's combined-rows semantics)
                        per_dest[gi].append(pa.table(
                            {"dval": s,
                             "dcnt": (c > 0).astype(np.int32)}))
                    else:
                        per_dest[gi].append(
                            k.msg_rows(nz + b0, ROLE_MSG, {"val": s[nz]}))
                        if grouped:
                            dest_meta[gi][b"cuts"] = np.searchsorted(
                                nz, boundaries[q0:q1 + 1] - b0
                            ).astype(np.int64).tobytes()
        elif raw is not None:
            # sum-combining kernels emit RAW (target, partial) pairs and
            # the split+combine happens per DESTINATION with a dense
            # bincount over that destination's vertex range — a
            # cache-resident accumulator (~8B x range) instead of a
            # whole-graph sort or a V-sized array, so 16-way tasks don't
            # thrash DRAM. Row presence keys on the COUNT vector, so a
            # target whose partials sum to exactly 0.0 still gets its
            # row (message presence feeds in_msgs — plan parity).
            out = raw(csr, vv, ccols)
            if out is not None and len(out["v"]):
                tgt = out.pop("v")
                vals = out["val"]
                parts = part_of(tgt, boundaries)
                order = np.argsort(parts, kind="stable")
                tgt, vals, parts = tgt[order], vals[order], parts[order]
                cuts = np.searchsorted(parts, np.arange(P + 1))
                for gi in range(G):
                    q0, q1 = int(dcuts[gi]), int(dcuts[gi + 1])
                    lo, hi = int(cuts[q0]), int(cuts[q1])
                    if lo == hi:
                        continue
                    b0, b1 = int(boundaries[q0]), int(boundaries[q1])
                    t_loc = tgt[lo:hi] - b0
                    s = np.bincount(t_loc, weights=vals[lo:hi],
                                    minlength=b1 - b0)
                    nz = np.flatnonzero(np.bincount(t_loc,
                                                    minlength=b1 - b0))
                    per_dest[gi].append(k.msg_rows(nz + b0, ROLE_MSG,
                                                   {"val": s[nz]}))
                    if grouped:
                        dest_meta[gi][b"cuts"] = np.searchsorted(
                            nz, boundaries[q0:q1 + 1] - b0
                        ).astype(np.int64).tobytes()
            out = None
        else:
            out = k.scatter(csr, vv, ccols)
        if out is not None and len(out["v"]):
            tgt = out.pop("v")
            parts = part_of(tgt, boundaries)
            order = np.argsort(parts, kind="stable")
            tgt, parts = tgt[order], parts[order]
            out = {n: c[order] for n, c in out.items()}
            cuts = np.searchsorted(parts, np.arange(P + 1))
            for gi in range(G):
                q0, q1 = int(dcuts[gi]), int(dcuts[gi + 1])
                lo, hi = int(cuts[q0]), int(cuts[q1])
                if lo == hi:
                    continue
                per_dest[gi].append(k.msg_rows(
                    tgt[lo:hi], ROLE_MSG,
                    {n: c[lo:hi] for n, c in out.items()}))
                if grouped:
                    dest_meta[gi][b"cuts"] = (
                        cuts[q0:q1 + 1] - lo).astype(np.int64).tobytes()
    if gp:  # not consumed by the plan branch
        if grouped:
            # grouped wire: global partials always ride as metadata (a
            # role-2 row per member would break the cuts row-accounting)
            meta_gp = {b"g_" + n.encode(): repr(float(v_)).encode()
                       for n, v_ in gp.items()}
        else:
            gv = boundaries[:-1]
            for q in range(P):
                per_dest[q].append(k.msg_rows(gv[q:q + 1], ROLE_GLOBAL,
                                              {n: np.full(1, val)
                                               for n, val in gp.items()}))
    outs = []
    for gi in range(G):
        tab = (pa.concat_tables(per_dest[gi]) if per_dest[gi]
               else k.empty_msg_table())
        md = dest_meta[gi]
        if meta_gp is not None:
            md = {**md, **meta_gp}
        if md:
            tab = tab.replace_schema_metadata(md)
        outs.append(tab)
    return tuple(outs) if G > 1 else outs[0]


def _slice_group_tab(tab: pa.Table, part: int, group_cuts, boundaries) -> pa.Table:
    """Two-level wire: one inbound GROUP table -> this partition's slice.

    Dense (dval/dcnt) tables span the group's contiguous vertex range —
    slice by boundary arithmetic; sparse row tables carry per-member row
    offsets as ``cuts`` schema metadata. Both slices are zero-copy views
    on the shared plasma buffer (on a cluster: one fetch per node, all
    member partitions slice the same object)."""
    gcuts = np.asarray(group_cuts, dtype=np.int64)
    g = int(np.searchsorted(gcuts, part, side="right")) - 1
    q0 = int(gcuts[g])
    if "dval" in tab.column_names and len(tab):
        gb0 = int(boundaries[q0])
        b0, b1 = int(boundaries[part]), int(boundaries[part + 1])
        return tab.slice(b0 - gb0, b1 - b0)
    if len(tab) == 0:
        return tab  # keeps any g_* metadata
    cuts = np.frombuffer((tab.schema.metadata or {})[b"cuts"], dtype=np.int64)
    i = part - q0
    return tab.slice(int(cuts[i]), int(cuts[i + 1] - cuts[i]))


def _direct_apply(run_id: str, kernel: Kernel, boundaries_list: list, ctx: dict,
                  part: int, csr_arrays, state_tab: pa.Table,
                  *msg_tabs: pa.Table, group_cuts: list | None = None):
    """One partition's state + its inbound message tables -> (new state
    table, local stats dict). Same kernel contract as dataset mode.
    ``csr_arrays`` is non-None only for kernels with ``wants_csr`` (the
    ASP locals-fixpoint kernels): the partition's CSR lands in
    ctx["csr"]. With ``group_cuts`` the inbound tables are GROUP tables
    (two-level wire) and this partition's share is sliced out first."""
    k = kernel
    boundaries = np.array(boundaries_list, dtype=np.int64)
    begin, end = int(boundaries[part]), int(boundaries[part + 1])
    if group_cuts is not None:
        msg_tabs = tuple(_slice_group_tab(t, part, group_cuts, boundaries)
                         for t in msg_tabs)
    nonempty = [tab for tab in msg_tabs if len(tab)]
    # global partials ride as g_* schema metadata on plan/grouped tables
    gpart: dict[str, list] = {}
    for tab in msg_tabs:
        for mk, mv_ in (tab.schema.metadata or {}).items():
            if mk.startswith(b"g_"):
                gpart.setdefault(mk[2:].decode(), []).append(float(mv_))
    # SUM-wire kernels (vertex_rate / scatter_raw: the PageRank family)
    # get their message sum reduced HERE, one source at a time in fixed
    # source order: a source's sparse rows bincounted equal its dense
    # (dval, dcnt) vector bitwise (pre-combined wire: at most one row
    # per slot per source), so the per-slot accumulation order — hence
    # the float result — is IDENTICAL whichever format the adaptive
    # wire picked per source, and identical between the flat and the
    # two-level grouped exchange (the parity guarantee).
    sum_wire = (getattr(k, "vertex_rate", None) is not None
                or getattr(k, "scatter_raw", None) is not None)
    if sum_wire or gpart:
        ctx = dict(ctx)
    if sum_wire:
        n_rng = end - begin
        dsum = np.zeros(n_rng)
        dcnt = np.zeros(n_rng, dtype=np.int64)
        rest = []
        for tab in nonempty:
            if "dval" in tab.column_names:
                dsum += tab["dval"].to_numpy(zero_copy_only=False)
                dcnt += tab["dcnt"].to_numpy(zero_copy_only=False)
                continue
            role_t = tab["role"].to_numpy(zero_copy_only=False)
            m = role_t == ROLE_MSG
            if m.any():
                loc = tab["v"].to_numpy(zero_copy_only=False)[m] - begin
                val = tab["val"].to_numpy(zero_copy_only=False)[m]
                dsum += np.bincount(loc, weights=val, minlength=n_rng)
                dcnt += np.bincount(loc, minlength=n_rng)
            if not m.all():
                rest.append(tab.filter(pa.array(~m)))  # role-2 rows ride on
        nonempty = rest
        ctx["dense_msgs"] = (dsum, dcnt)
    if gpart:
        ctx["global_partials"] = {
            n: float(np.sort(np.asarray(vs)).sum())
            for n, vs in gpart.items()}
    t = pa.concat_tables(nonempty) if nonempty else k.empty_msg_table()
    names = list(k.columns)
    wire = set(t.column_names)  # slim message schema (Kernel.msg_rows)
    role = t["role"].to_numpy(zero_copy_only=False)
    is_msg = role == ROLE_MSG
    is_gbl = role == ROLE_GLOBAL
    mv = t["v"].to_numpy(zero_copy_only=False)
    n_msg = int(is_msg.sum())
    state = {"v": state_tab["v"].to_numpy(zero_copy_only=False)}
    msgs = {"v": mv[is_msg]}
    for n in names:
        state[n] = _col_value(state_tab[n], k.columns[n])
        if n in wire:
            msgs[n] = _mask_col(_col_value(t[n], k.columns[n]), is_msg)
        else:
            msgs[n] = np.zeros(n_msg)
    local_ctx = ctx
    if is_gbl.any() or csr_arrays is not None:
        local_ctx = dict(ctx)
    if csr_arrays is not None:
        # memoise the wrapper per (run_id, part): the arrays are the same
        # zero-copy plasma views every call, and a stable instance lets
        # CSRPart cache derived structures (intra_local) across supersteps
        local_ctx["csr"] = _cache_get(run_id, "csrpart", part,
                                      lambda: CSRPart(*csr_arrays))
    if is_gbl.any():
        gcols = {n: t[n].to_numpy(zero_copy_only=False)[is_gbl]
                 for n in names if n in wire and not _is_nested(k.columns[n])}
        merged = dict(local_ctx.get("global_partials") or {})  # metadata-borne
        for n, c in gcols.items():
            c = c.astype(np.float64)
            if not np.all(np.isnan(c)):
                merged[n] = merged.get(n, 0.0) + float(np.sort(c).sum())
        local_ctx["global_partials"] = merged
    new = k.apply(begin, end, state, msgs, local_ctx)
    v_new = new.pop("v")
    stats = k.local_stats(new)
    return (k.rows(np.full(len(v_new), part, np.int64), v_new, ROLE_STATE, new),
            stats)


def _direct_init(run_id: str, kernel: Kernel, csr_arrays, boundaries_list: list,
                 part: int):
    k = kernel
    boundaries = np.array(boundaries_list, dtype=np.int64)
    begin, end = int(boundaries[part]), int(boundaries[part + 1])
    csr = CSRPart(*csr_arrays)
    cols = k.init_cols(part, begin, end, csr)
    v = cols.pop("v", np.arange(begin, end, dtype=np.int64))
    return (k.rows(np.full(len(v), part, np.int64), v, ROLE_STATE, cols),
            k.local_stats(cols))


def _direct_fused(run_id: str, kernel: Kernel, boundaries_list: list,
                  ctx: dict, part: int, csr_arrays, plan_arrays,
                  group_cuts, state_tab: pa.Table, *msg_tabs: pa.Table):
    """Pregel-style fused compute wave: apply the previous superstep's
    inbound messages to this partition's state, then immediately scatter
    the next superstep's outbound messages from the fresh state — ONE
    task wave per superstep instead of scatter+apply's two. This halves
    the per-superstep scheduling depth AND replaces two straggler maxes
    (max(scatter) + max(apply), each a full barrier in the DAG) with one
    max over the fused sum, and the freshly-applied state table never
    round-trips through the object store between the two halves.

    Returns (*per-destination message tables, new state table, stats).
    """
    wants_csr = getattr(kernel, "wants_csr", False)
    new_state, stats = _direct_apply(
        run_id, kernel, boundaries_list, ctx, part,
        csr_arrays if wants_csr else None, state_tab, *msg_tabs,
        group_cuts=group_cuts)
    outs = _direct_scatter(run_id, kernel, csr_arrays, boundaries_list,
                           part, new_state, plan_arrays,
                           group_cuts=group_cuts)
    n_dest = (len(group_cuts) - 1 if group_cuts is not None
              else len(boundaries_list) - 1)
    if n_dest == 1:
        outs = (outs,)
    return (*outs, new_state, stats)


def _split_state_block(boundaries_list: list, tab: pa.Table):
    """One adopted-state block -> P per-partition sub-tables, partitioned
    by part_of(v) over the engine's apply boundaries (the stored ``part``
    column is replaced — see Engine._refs_by_part)."""
    boundaries = np.array(boundaries_list, dtype=np.int64)
    P = len(boundaries_list) - 1
    v = tab["v"].to_numpy(zero_copy_only=False)
    parts = part_of(v, boundaries)
    tab = tab.set_column(tab.column_names.index("part"), "part",
                         pa.array(parts))
    order = np.argsort(parts, kind="stable")
    tab = tab.take(order)
    counts = np.bincount(parts, minlength=P)
    offs = np.concatenate([[0], np.cumsum(counts)])
    outs = [tab.slice(int(offs[p]), int(counts[p])) for p in range(P)]
    return tuple(outs) if P > 1 else outs[0]


def _concat_nonempty(empty: pa.Table, *tabs: pa.Table) -> pa.Table:
    nonempty = [t for t in tabs if len(t)]
    if not nonempty:
        return empty
    return pa.concat_tables(nonempty).combine_chunks()


def _write_state_part(run_dir_step: str, part: int, tab: pa.Table) -> int:
    import pyarrow.parquet as pq

    os.makedirs(run_dir_step, exist_ok=True)
    pq.write_table(tab, os.path.join(run_dir_step, f"part-{part:05d}.parquet"))
    return len(tab)


_REMOTE_FN_CACHE: dict = {}
_PIN_CACHE: dict = {}  # (RemoteFunction, node_id) -> options-wrapped fn


def _remote_fn(fn, num_returns: int):
    """Memoised ``ray.remote`` wrapper. Each ``ray.remote(...)`` call
    creates a fresh RemoteFunction whose definition is re-exported to
    the cluster and re-imported by every worker on first use — doing
    that inside ``step_direct`` added a measurable per-superstep driver
    cost (and grows the GCS function table by 2 entries per step).
    One wrapper per (function, num_returns) for the process lifetime."""
    import ray

    key = (fn, num_returns)
    got = _REMOTE_FN_CACHE.get(key)
    if got is None:
        got = _REMOTE_FN_CACHE[key] = ray.remote(num_returns=num_returns)(fn)
    return got


@dataclass
class StepMetrics:
    superstep: int
    seconds: float
    max_delta: float
    changed: int
    in_msgs: int
    edges_per_sec: float


class Engine:
    """Drives kernels over a Graph: the PEval/IncEval/Assemble loop
    (reference lifecycle §3.1 of SURVEY.md) as an explicit Python loop
    over lazily-built, per-superstep Ray Data pipelines."""

    def __init__(
        self,
        graph: Graph,
        kernel: Kernel,
        run_dir: str | None = None,
        checkpoint_every: int = 0,
        scatter_batch: int | None = None,
        stats_every: int = 1,
        exchange: str = "direct",
        fused: bool = True,
        node_groups: int | None = None,
    ):
        # scatter_batch=None -> one batch per state block (= per partition,
        # thanks to the repartition(P) barrier), so scatter parallelism —
        # and, downstream, the sort shuffle's task count — equals P.
        # A fixed large batch_size would coalesce blocks and serialise the
        # whole superstep (measured: 2 scatter tasks -> 1-task sort).
        import uuid

        import ray

        self.graph = graph
        self.kernel = kernel
        self.run_dir = run_dir
        self.checkpoint_every = checkpoint_every
        self.scatter_batch = scatter_batch
        self.stats_every = stats_every
        # "direct" (default) = raw-task partition-to-partition exchange
        # (see module comment above _direct_scatter; state never leaves
        # its partition, no sort) — measured 3-7x faster per superstep at
        # the 16M-edge scale. "dataset" = the groupby sort-shuffle chain
        # (kept for parity testing and as the pure-Dataset formulation).
        # Identical results — parity-tested per kernel.
        self.exchange = exchange
        # fused (default) = one _direct_fused wave per superstep
        # (apply+scatter in a single task, see _direct_fused); off = the
        # two-wave scatter->apply form (step_direct). Identical results —
        # parity-tested; fused halves per-superstep scheduling depth.
        self.fused = fused and not os.environ.get("PLANAR_NO_FUSED")
        self._state_refs: list | None = None
        self._msg_refs: list | None = None  # fused mode: [src][dst] matrix
        self.metrics: list[StepMetrics] = []
        self.globals: dict = {}
        kernel._num_vertices = graph.num_vertices
        kernel._num_edges = graph.num_edges
        boundaries = [int(b) for b in graph.boundaries]
        if kernel.direction != graph.direction:
            # boundaries of the stored direction the kernel walks
            g2 = Graph.load(graph.root, kernel.direction)
            boundaries = [int(b) for b in g2.boundaries]
        self._apply_boundaries = boundaries
        # two-level (node-major) exchange wire: G destination groups =
        # nodes. Explicit ``node_groups`` / PLANAR_NODE_GROUPS wins; else
        # AUTO above a P threshold (PLANAR_GROUP_AUTO_P, default 32 —
        # where the flat P x P object count starts to dominate, SURVEY
        # §7.12) with G = the cluster's alive node count. G >= P (or a
        # small P) keeps the flat wire. Parity: bit-identical to flat.
        P = len(boundaries) - 1
        G = node_groups or int(os.environ.get("PLANAR_NODE_GROUPS", "0")) or None
        if (G is None and exchange == "direct"
                and P > int(os.environ.get("PLANAR_GROUP_AUTO_P", "32"))):
            try:
                G = max(1, sum(1 for n in ray.nodes() if n.get("Alive")))
            except Exception:
                G = 1
        if G is not None and 0 < G < P:
            base, extra = divmod(P, G)
            cuts = [0]
            for i in range(G):
                cuts.append(cuts[-1] + base + (1 if i < extra else 0))
            self._group_cuts: list[int] | None = cuts
        else:
            self._group_cuts = None
        # partition -> home-node map (multi-node only): every task of a
        # partition (init, scatter, apply, fused) is SOFT-pinned to its
        # home node so (a) a partition's state + CSR stay node-local
        # across supersteps and (b) all member partitions of a
        # destination GROUP consume their group table on ONE node — the
        # grouped wire's "one fetch per group table per node" claim is a
        # placement property, and this is the placement. soft=True keeps
        # Ray free to reschedule on node loss (fault tolerance intact).
        # Single-node: alive==1 -> None -> identical behavior to before.
        self._part_node: list | None = None
        if exchange == "direct":
            try:
                alive = sorted(
                    n["NodeID"] for n in ray.nodes()
                    if n.get("Alive") and n.get("Resources", {}).get("CPU"))
            except Exception:
                alive = []
            if len(alive) > 1:
                if self._group_cuts is not None:
                    # group-major: group g's members share alive[g % n]
                    self._part_node = [
                        alive[self._dest_of(p) % len(alive)]
                        for p in range(P)]
                else:
                    self._part_node = [alive[p % len(alive)]
                                       for p in range(P)]
        self.run_id = uuid.uuid4().hex[:12]
        # pin the kernel and every partition's CSR in the object store ONCE;
        # scatter/init tasks ray.get them zero-copy (and memoise per worker
        # process), replacing the per-superstep actor pools that cost ~1 s
        # of spin-up each (see module docstring).
        self._kernel_ref = ray.put(kernel)
        self._owner_pid = os.getpid()
        self._stats_board = None  # dataset-mode only; created lazily
        load = _remote_fn(_load_csr_arrays, 1)
        self._csr_refs = {
            p: load.remote(graph.root, kernel.direction, p,
                           boundaries[p], boundaries[p + 1])
            for p in range(len(boundaries) - 1)
        }
        # static exchange plans (see _build_exchange_plan) — only for
        # kernels that expose a per-vertex rate (PageRank family). The
        # plan pins one (lsrc, ltgt) int32 pair per edge (+8 B/edge,
        # int64 pairs beyond 2^31-vertex ranges) in the object store
        # beside the CSR — the price of the cache-resident rate gather.
        # PLANAR_PLAN_BYTES_MAX caps that residency: past the budget the
        # engine falls back to scatter_raw (bit-identical results — the
        # apply-side per-source reduction is format-independent).
        self._plan_refs = None
        self._plan_bytes = 0
        if (getattr(kernel, "vertex_rate", None) is not None
                and not os.environ.get("PLANAR_NO_EXCHANGE_PLAN")):
            max_range = max(boundaries[p + 1] - boundaries[p]
                            for p in range(len(boundaries) - 1))
            pair_bytes = 8 if max_range < 2**31 else 16
            est = pair_bytes * graph.num_edges
            budget = int(os.environ.get("PLANAR_PLAN_BYTES_MAX",
                                        str(16 * 2**30)))
            if est <= budget:
                plan = _remote_fn(_build_exchange_plan, 1)
                self._plan_refs = {
                    p: plan.remote(self._csr_refs[p], boundaries)
                    for p in range(len(boundaries) - 1)
                }
                self._plan_bytes = est

    def close(self) -> None:
        """Release engine resources: kill the stats-board actor and drop
        the pinned kernel/CSR refs. Engines are cheap but a multi-phase
        driver (contracting WCC, Borůvka) builds one per phase — without
        this the idle actors accumulate for the driver's lifetime.
        Materialized state datasets stay valid (they are lineage-free).

        Only the CREATOR process may kill the board: a kernel closure that
        references the engine (e.g. ``eng.kernel.rows``) gets the whole
        Engine pickled into worker tasks, and the deserialized copy's
        ``__del__`` must not kill the live actor out from under the run."""
        board = getattr(self, "_stats_board", None)
        if board is not None:
            self._stats_board = None
            if getattr(self, "_owner_pid", None) == os.getpid():
                try:
                    import ray

                    if ray.is_initialized():
                        ray.kill(board)
                except Exception:
                    pass  # ray already shut down / actor gone
        self._csr_refs = {}
        self._kernel_ref = None
        self._msg_refs = None
        self._plan_refs = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        # NO ray.kill here: __del__ can run during interpreter/Ray
        # teardown, where a kill on a released handle trips a C++ CHECK
        # (core_worker actor_manager) and aborts the whole process.
        # Explicit close() is the cleanup path; a GC'd engine just drops
        # its refs and leaves one idle num_cpus=0 actor to session end.
        self._stats_board = None
        self._csr_refs = {}
        self._kernel_ref = None

    def _ensure_board(self):
        import ray

        if self._stats_board is None:
            self._stats_board = ray.remote(num_cpus=0)(_StatsBoard).remote()
        return self._stats_board

    def _merge_board_stats(self, superstep: int, state: Dataset | None) -> dict:
        """Poll the stats board until every partition reported (pushes are
        fire-and-forget; the materialize barrier already passed, so they
        are in flight). A push lost to a worker crash falls back to one
        aggregate job over the materialized state."""
        import ray

        expected = len(self._apply_boundaries) - 1
        # a lost push (worker reaped right after its task completed — a
        # routine Ray event under memory pressure) must not stall every
        # with_stats superstep: poll tightly for the common in-flight
        # case, back off exponentially, and fall back to one aggregate
        # job after ~2 s instead of the former 30 s busy-wait
        deadline = time.monotonic() + 2.0
        sleep = 0.002
        while True:
            parts = ray.get(self._stats_board.peek.remote(superstep))
            if len(parts) >= expected:
                break
            if time.monotonic() > deadline:
                if state is not None:
                    row = state.aggregate(*self.kernel.stat_aggs())
                    return {k: (0 if v is None else v) for k, v in row.items()}
                break
            time.sleep(sleep)
            sleep = min(sleep * 1.5, 0.1)
        self._stats_board.gc.remote(superstep)
        return Kernel.merge_stats(parts, self.kernel.stats_spec)

    # -- state lifecycle ----------------------------------------------------
    def init_state(self, state: Dataset | None = None) -> Dataset:
        """Build (or adopt) the superstep-0 state and seed the globals.

        ``state`` lets a precomputing pipeline seed the kernel (the
        reference's MapVertexWithPrecomputing / InitTwoHop path,
        /root/reference/nvme/apis/block_api.h:109-113) — rows must match
        the kernel schema.
        """
        import ray.data as rd

        import ray

        if state is None:
            P = len(self._apply_boundaries) - 1
            parts = rd.range(P, override_num_blocks=P)
            state = parts.map_batches(
                make_init_fn(self.run_id, self._kernel_ref, self._csr_refs,
                             self._apply_boundaries,
                             stats_board=self._ensure_board()),
                batch_format="pyarrow",
                batch_size=1,
            )
            state = state.materialize()
            # seed the global scalars (e.g. PageRank's dangling mass): the
            # init tasks pushed per-partition stats as superstep -1
            self.globals = self._merge_board_stats(-1, state)
        else:
            # re-tag the part column against THIS engine's boundaries
            # (an adopted state may come from another direction's
            # partitioning — the dataset path groups by the part COLUMN,
            # so a stale tag would hand rows to the wrong vertex range;
            # direct mode's _refs_by_part does the same re-split)
            boundaries = np.array(self._apply_boundaries, dtype=np.int64)

            def retag(t: pa.Table) -> pa.Table:
                p = part_of(t["v"].to_numpy(zero_copy_only=False), boundaries)
                return t.set_column(t.column_names.index("part"), "part",
                                    pa.array(p.astype(np.int64)))

            state = state.map_batches(retag,
                                      batch_format="pyarrow").materialize()
            # adopted initial state (precomputing path): one aggregate job
            row = state.aggregate(*self.kernel.stat_aggs())
            self.globals = {kk: (0 if vv is None else vv) for kk, vv in row.items()}
        return state

    def step(self, state: Dataset, superstep: int,
             with_stats: bool = True) -> tuple[Dataset, StepMetrics]:
        t0 = time.monotonic()
        k = self.kernel
        msgs = state.map_batches(
            make_scatter_fn(self.run_id, self._kernel_ref, self._csr_refs,
                            self._apply_boundaries),
            batch_format="pyarrow",
            batch_size=self.scatter_batch,
        )
        ctx = {"num_vertices": self.graph.num_vertices,
               "num_edges": self.graph.num_edges,
               "superstep": superstep,
               "globals": dict(self.globals)}
        new = msgs.groupby("part").map_groups(
            make_apply_fn(self.run_id, self._kernel_ref,
                          self._apply_boundaries, ctx,
                          csr_refs=self._csr_refs,
                          # skip the per-partition stat pushes entirely on
                          # no-stats supersteps (frontier-free inner loops)
                          stats_board=self._ensure_board() if with_stats else None),
            batch_format="pyarrow",
        )
        # Ray's sort shuffle emits one block per input block, and apply is
        # 1:1, so block count stays = P across supersteps with no explicit
        # coalesce. Guard against drift (e.g. a resumed state read from
        # many parquet fragments) with a cheap conditional repartition.
        P = len(self._apply_boundaries) - 1
        new = new.materialize()
        if new.num_blocks() > 2 * P:
            new = new.repartition(P).materialize()
        # materialize() caches blocks but KEEPS the logical plan chain; after
        # a few hundred supersteps plan traversal overflows the Python stack
        # (RecursionError). Rebuild a lineage-free dataset over the same
        # object-store blocks (zero-copy) — this, plus the parquet
        # checkpoint, is the real BSP barrier.
        import ray.data as rd

        new = rd.from_arrow_refs(new.to_arrow_refs())
        if with_stats:
            # the apply stage pushed per-partition stats fire-and-forget
            # (the materialize barrier guarantees every push was SENT) —
            # poll + merge P dicts instead of a second pipeline execution
            stats = self._merge_board_stats(superstep, new)
            self.globals = stats
        else:
            stats = dict(self.globals)
        dt = time.monotonic() - t0
        m = StepMetrics(
            superstep=superstep,
            seconds=dt,
            max_delta=float(stats.get("max_delta", 0) or 0),
            changed=int(stats.get("changed", 0) or 0),
            in_msgs=int(stats.get("in_msgs", 0) or 0),
            edges_per_sec=self.graph.num_edges / dt if dt > 0 else 0.0,
        )
        self.metrics.append(m)
        if self.checkpoint_every and self.run_dir and (
            superstep % self.checkpoint_every == 0
        ):
            self._checkpoint(new, superstep, m)
        return new, m

    def run(self, max_supersteps: int = 100, resume: bool = False,
            initial_state: Dataset | None = None) -> Dataset:
        if self.exchange == "direct":
            return self._run_direct(max_supersteps, resume, initial_state)
        state, start = None, 0
        if resume and self.run_dir:
            found = self.latest_checkpoint()
            if found is not None:
                state, start = found
        if state is None:
            state = self.init_state(initial_state)
        for s in range(start, max_supersteps):
            # kernels that feed a global scalar forward (PageRank's dangling
            # mass) need stats every superstep; otherwise only on check steps
            check = (
                getattr(self.kernel, "needs_global_stats", False)
                or self.stats_every <= 1
                or s % self.stats_every == 0
                or s == max_supersteps - 1
            )
            state, m = self.step(state, s, with_stats=check)
            if check and self.kernel.converged(self.globals, s):
                break
        return state

    # -- direct-exchange mode (see _direct_scatter module comment) -----------
    def _refs_by_part(self, state: Dataset) -> list:
        """Adopted initial state Dataset -> per-part table refs (only used
        on the adopt/resume paths).

        The incoming ``part`` column is ignored and recomputed against THIS
        engine's apply boundaries: an adopted state (e.g. hop-extrema seeds
        for wcc_precomputed) may have been partitioned for another
        direction's boundary set, and direct mode requires state[p] ⊆
        csr[p]'s vertex range. Fully distributed: each block splits into P
        sub-tables in a task, one concat task per partition."""
        import ray

        P = len(self._apply_boundaries) - 1
        blocks = state.materialize().to_arrow_refs()
        split = _remote_fn(_split_state_block, P)
        outs = [split.remote(self._apply_boundaries, b) for b in blocks]
        if P == 1:
            outs = [[o] for o in outs]
        empty = self.kernel.empty_table()
        concat = _remote_fn(_concat_nonempty, 1)
        return [concat.remote(empty, *[o[p] for o in outs]) for p in range(P)]

    def init_state_direct(self, state: Dataset | None = None) -> None:
        import ray

        P = len(self._apply_boundaries) - 1
        self._msg_refs = None  # fused mode re-seeds from the new state
        if state is not None:
            self._state_refs = self._refs_by_part(state)
            row = state.aggregate(*self.kernel.stat_aggs())
            self.globals = {k: (0 if v is None else v) for k, v in row.items()}
            return
        init = _remote_fn(_direct_init, 2)
        outs = [self._pin(init, p).remote(
                    self.run_id, self._kernel_ref, self._csr_refs[p],
                    self._apply_boundaries, p) for p in range(P)]
        self._state_refs = [o[0] for o in outs]
        stats = ray.get([o[1] for o in outs])
        self.globals = Kernel.merge_stats(stats, self.kernel.stats_spec)

    def step_direct(self, superstep: int, with_stats: bool = True) -> StepMetrics:
        import ray

        t0 = time.monotonic()
        self._msg_refs = None  # invalidate any fused-mode message matrix
        P = len(self._apply_boundaries) - 1
        gcuts = self._group_cuts
        n_dest = len(gcuts) - 1 if gcuts is not None else P
        scatter = _remote_fn(_direct_scatter, n_dest)
        apply_ = _remote_fn(_direct_apply, 2)
        ctx = {"num_vertices": self.graph.num_vertices,
               "num_edges": self.graph.num_edges,
               "superstep": superstep,
               "globals": dict(self.globals)}
        outs = [self._pin(scatter, p).remote(
                    self.run_id, self._kernel_ref,
                    self._csr_refs[p], self._apply_boundaries, p,
                    self._state_refs[p],
                    self._plan_refs[p] if self._plan_refs else None,
                    gcuts)
                for p in range(P)]
        if n_dest == 1:
            outs = [[o] for o in outs]
        wants_csr = getattr(self.kernel, "wants_csr", False)
        applied = [self._pin(apply_, q).remote(
                       self.run_id, self._kernel_ref,
                       self._apply_boundaries, ctx, q,
                       self._csr_refs[q] if wants_csr else None,
                       self._state_refs[q],
                       *[outs[p][self._dest_of(q)]
                         for p in range(P)],
                       group_cuts=gcuts)
                   for q in range(P)]
        self._state_refs = [a[0] for a in applied]
        if with_stats:
            # ray.get on the stats refs IS the BSP barrier
            stats = Kernel.merge_stats(ray.get([a[1] for a in applied]),
                                       self.kernel.stats_spec)
            self.globals = stats
        else:
            stats = dict(self.globals)  # supersteps pipeline through refs
        dt = time.monotonic() - t0
        m = StepMetrics(
            superstep=superstep, seconds=dt,
            max_delta=float(stats.get("max_delta", 0) or 0),
            changed=int(stats.get("changed", 0) or 0),
            in_msgs=int(stats.get("in_msgs", 0) or 0),
            edges_per_sec=self.graph.num_edges / dt if dt > 0 else 0.0,
        )
        self.metrics.append(m)
        if self.checkpoint_every and self.run_dir and (
            superstep % self.checkpoint_every == 0
        ):
            self._checkpoint_direct(superstep, m)
        return m

    def _pin(self, remote_fn, part: int):
        """Home-node soft affinity for a partition's tasks (multi-node
        only; identity on one node). Memoised per (fn, node) — .options
        is cheap but P x supersteps calls add up."""
        if self._part_node is None:
            return remote_fn
        node = self._part_node[part]
        key = (remote_fn, node)
        got = _PIN_CACHE.get(key)
        if got is None:
            from ray.util.scheduling_strategies import (
                NodeAffinitySchedulingStrategy,
            )

            got = _PIN_CACHE[key] = remote_fn.options(
                scheduling_strategy=NodeAffinitySchedulingStrategy(
                    node_id=node, soft=True))
        return got

    def _dest_of(self, q: int) -> int:
        """Destination index of partition q: its group on the two-level
        wire, else the partition itself."""
        if self._group_cuts is None:
            return q
        import bisect

        return bisect.bisect_right(self._group_cuts, q) - 1

    def step_fused(self, superstep: int, with_stats: bool = True) -> StepMetrics:
        """One fused compute wave (see _direct_fused): P tasks, each
        applying superstep ``superstep``'s inbound messages and scattering
        superstep ``superstep + 1``'s outbound ones. The first call seeds
        the message matrix with a scatter-only wave from current state."""
        import ray

        t0 = time.monotonic()
        P = len(self._apply_boundaries) - 1
        gcuts = self._group_cuts
        n_dest = len(gcuts) - 1 if gcuts is not None else P
        if self._msg_refs is None:
            scatter = _remote_fn(_direct_scatter, n_dest)
            outs = [self._pin(scatter, p).remote(
                        self.run_id, self._kernel_ref,
                        self._csr_refs[p], self._apply_boundaries,
                        p, self._state_refs[p],
                        self._plan_refs[p] if self._plan_refs
                        else None, gcuts)
                    for p in range(P)]
            if n_dest == 1:
                outs = [[o] for o in outs]
            self._msg_refs = outs
        fused = _remote_fn(_direct_fused, n_dest + 2)
        ctx = {"num_vertices": self.graph.num_vertices,
               "num_edges": self.graph.num_edges,
               "superstep": superstep,
               "globals": dict(self.globals)}
        waves = [self._pin(fused, q).remote(
                     self.run_id, self._kernel_ref,
                     self._apply_boundaries, ctx, q,
                     self._csr_refs[q],
                     self._plan_refs[q] if self._plan_refs else None,
                     gcuts,
                     self._state_refs[q],
                     *[self._msg_refs[p][self._dest_of(q)]
                       for p in range(P)])
                 for q in range(P)]
        self._msg_refs = [w[:n_dest] for w in waves]
        self._state_refs = [w[n_dest] for w in waves]
        if with_stats:
            # ray.get on the stats refs IS the BSP barrier
            stats = Kernel.merge_stats(ray.get([w[n_dest + 1] for w in waves]),
                                       self.kernel.stats_spec)
            self.globals = stats
        else:
            stats = dict(self.globals)  # supersteps pipeline through refs
        dt = time.monotonic() - t0
        m = StepMetrics(
            superstep=superstep, seconds=dt,
            max_delta=float(stats.get("max_delta", 0) or 0),
            changed=int(stats.get("changed", 0) or 0),
            in_msgs=int(stats.get("in_msgs", 0) or 0),
            edges_per_sec=self.graph.num_edges / dt if dt > 0 else 0.0,
        )
        self.metrics.append(m)
        if self.checkpoint_every and self.run_dir and (
            superstep % self.checkpoint_every == 0
        ):
            self._checkpoint_direct(superstep, m)
        return m

    def state_dataset(self) -> Dataset:
        import ray.data as rd

        return rd.from_arrow_refs(list(self._state_refs))

    def _checkpoint_direct(self, superstep: int, m: StepMetrics) -> None:
        import shutil

        import ray

        step_dir = os.path.join(self.run_dir, f"step_{superstep:05d}")
        state_dir = os.path.join(step_dir, "state")
        shutil.rmtree(state_dir, ignore_errors=True)
        w = _remote_fn(_write_state_part, 1)
        ray.get([self._pin(w, p).remote(state_dir, p, self._state_refs[p])
                 for p in range(len(self._state_refs))])
        self._checkpoint_manifest(step_dir, superstep, m)

    def _run_direct(self, max_supersteps: int, resume: bool,
                    initial_state: Dataset | None) -> Dataset:
        start = 0
        resumed = False
        if resume and self.run_dir:
            found = self.latest_checkpoint()
            if found is not None:
                state, start = found
                self._state_refs = self._refs_by_part(state)
                self._msg_refs = None
                resumed = True
        if initial_state is not None and not resumed:
            # always adopt a fresh seed (engine REUSE across phases:
            # scc/harmonic/betweenness re-run one engine per phase so
            # the pinned CSRs/plans load once, not once per phase)
            self.init_state_direct(initial_state)
        elif self._state_refs is None:
            self.init_state_direct(None)
        for s in range(start, max_supersteps):
            check = (
                getattr(self.kernel, "needs_global_stats", False)
                or self.stats_every <= 1
                or s % self.stats_every == 0
                or s == max_supersteps - 1
            )
            if self.fused:
                self.step_fused(s, with_stats=check)
            else:
                self.step_direct(s, with_stats=check)
            if check and self.kernel.converged(self.globals, s):
                break
        return self.state_dataset()

    # -- checkpoint / resume (north rule) ------------------------------------
    def _checkpoint(self, state: Dataset, superstep: int, m: StepMetrics) -> None:
        import shutil

        step_dir = os.path.join(self.run_dir, f"step_{superstep:05d}")
        state_dir = os.path.join(step_dir, "state")
        # a re-run in the same run_dir must not append next to stale files
        # (a later resume would read duplicated state rows)
        shutil.rmtree(state_dir, ignore_errors=True)
        os.makedirs(state_dir, exist_ok=True)
        state.write_parquet(state_dir)
        self._checkpoint_manifest(step_dir, superstep, m)

    def _checkpoint_manifest(self, step_dir: str, superstep: int,
                             m: StepMetrics) -> None:
        write_json_atomic(
            os.path.join(step_dir, "manifest.json"),
            {
                "superstep": superstep,
                "kernel": self.kernel.name,
                "direction": self.kernel.direction,
                "graph_root": self.graph.root,
                "num_vertices": self.graph.num_vertices,
                "num_edges": self.graph.num_edges,
                "globals": {k: (float(v) if v is not None else None)
                            for k, v in self.globals.items()},
                # object-store residency beside the CSR (0 = plan gated
                # off / kernel has none): the +8 B/edge trade documented
                "exchange_plan_bytes": getattr(self, "_plan_bytes", 0),
                "node_groups": (len(self._group_cuts) - 1
                                if self._group_cuts else None),
                "metrics": m.__dict__,
                "lineage": {
                    "prev_superstep": superstep - 1,
                    "boundaries_sha": hash(tuple(self._apply_boundaries)) & 0xFFFFFFFF,
                },
            },
        )

    def latest_checkpoint(self):
        import ray.data as rd

        if not self.run_dir or not os.path.isdir(self.run_dir):
            return None
        best = None
        for d in sorted(os.listdir(self.run_dir)):
            man = os.path.join(self.run_dir, d, "manifest.json")
            if d.startswith("step_") and os.path.exists(man):
                best = (d, man)
        if best is None:
            return None
        man = read_json(best[1])
        # lineage gate: the manifest records graph identity for exactly
        # this check — state from another kernel, graph build, direction
        # or partitioning must not be adopted (stale 'part'/'v' columns
        # would silently land labels in wrong slots after a re-partition)
        expect = {
            "kernel": self.kernel.name,
            "direction": self.kernel.direction,
            "graph_root": self.graph.root,
            "num_vertices": self.graph.num_vertices,
            "num_edges": self.graph.num_edges,
        }
        stale = [k for k, v in expect.items() if man.get(k) != v]
        want_sha = hash(tuple(self._apply_boundaries)) & 0xFFFFFFFF
        if (man.get("lineage") or {}).get("boundaries_sha") != want_sha:
            stale.append("boundaries_sha")
        if stale:
            import warnings

            warnings.warn(
                f"ignoring checkpoint {best[1]}: lineage mismatch on "
                f"{stale} (graph rebuilt/re-partitioned?) — starting fresh",
                stacklevel=2)
            return None
        self.globals = {k: v for k, v in (man.get("globals") or {}).items()}
        state = rd.read_parquet(
            os.path.join(self.run_dir, best[0], "state")
        ).materialize()
        return state, man["superstep"] + 1
