"""Sampled harmonic centrality as a state-column composition (round 5,
VERDICT r4 item 5).

h(v) = Σ_{s ∈ pivots} 1/d(s, v) over pivot-BFS runs of the SSSP kernel.
The round-4 form ran one SSSP per pivot and accumulated into a dense
``np.zeros(V)`` on the driver; here the accumulator is a STATE COLUMN
(``acc``) threaded between pivot runs via ``Engine.run(initial_state=)``
— the reference's MapVertexWithPrecomputing seeding path (K17) — so
nothing dense ever materialises on the driver and the composition is
scale-clean at any V. Accumulation order per vertex is pivot order,
identical to the driver-side form, so results are bit-equal.

The ``acc`` column rides role-0 state rows only (message_columns still
["val"]): zero extra wire traffic per superstep.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..graph import Graph
from ..superstep import Engine
from .sssp import INF, SSSPKernel


class HarmonicSSSPKernel(SSSPKernel):
    name = "harmonic_sssp"
    columns = {**SSSPKernel.columns, "acc": pa.float64()}

    @property
    def message_columns(self):
        return ["val"]  # acc never rides the wire

    def init_cols(self, part, begin, end, csr):
        cols = super().init_cols(part, begin, end, csr)
        cols["acc"] = np.zeros(end - begin)
        return cols

    def apply(self, begin, end, state, msgs, ctx):
        out = super().apply(begin, end, state, msgs, ctx)
        out["acc"] = state["acc"]  # carried untouched through supersteps
        return out


def _contrib(val: np.ndarray) -> np.ndarray:
    d = val.astype(np.float64)
    ok = (d > 0) & (d < float(INF))
    return np.where(ok, 1.0 / np.where(ok, d, 1.0), 0.0)


def _reseed(source: int):
    """Distributed map: previous pivot's final state -> next pivot's
    initial state (fold the finished distances into acc, reset val)."""

    def fn(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        val = t["val"].to_numpy(zero_copy_only=False)
        acc = t["acc"].to_numpy(zero_copy_only=False) + _contrib(val)
        is_src = v == source
        n = len(v)
        return pa.table({
            "part": t["part"], "v": t["v"], "role": t["role"],
            "val": pa.array(np.where(is_src, 0, INF).astype(np.int64)),
            "active": pa.array(is_src.astype(np.int8)),
            "changed": pa.array(np.zeros(n, np.int64)),
            "in_msgs": pa.array(np.zeros(n, np.int64)),
            "acc": pa.array(acc),
        })

    return fn


def harmonic(graph: Graph, num_pivots: int, max_supersteps: int = 10_000,
             **engine_kw) -> Dataset:
    """Harmonic centrality from pivots 0..num_pivots-1 (the smallest
    dense ids — with an order-preserving rank, the smallest raw keys).
    Returns a Dataset (v, harmonic) — no dense driver arrays."""
    pivots = list(range(min(num_pivots, graph.num_vertices)))
    state = None
    # ONE engine for all pivots: the pinned kernel's source only matters
    # for pivot 0's init_cols; later pivots arrive fully seeded
    eng = Engine(graph, HarmonicSSSPKernel(pivots[0] if pivots else 0),
                 **engine_kw)
    for s in pivots:
        seed = None
        if state is not None:
            seed = state.map_batches(_reseed(s), batch_format="pyarrow")
        state = eng.run(max_supersteps=max_supersteps, initial_state=seed)
    eng.close()

    def finish(t: pa.Table) -> pa.Table:
        val = t["val"].to_numpy(zero_copy_only=False)
        acc = t["acc"].to_numpy(zero_copy_only=False) + _contrib(val)
        return pa.table({"v": t["v"], "harmonic": pa.array(acc)})

    return state.map_batches(finish, batch_format="pyarrow")
