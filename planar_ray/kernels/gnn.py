"""Toy GNN — degree-normalised feature propagation + sigmoid layer.

Capability parity with the reference's toy GNN
(/root/reference/core/apps/gnn_app.h:50-66, nvme/apps/gnn_nvme_app.h):
features are a small dense vector per vertex; each layer aggregates
degree-normalised neighbour features and applies a seeded random linear
map + sigmoid. The reference seeds its weights with C rand(); we use a
seeded NumPy generator, so runs are deterministic and the NumPy oracle
matches exactly (allclose).

Ray shape: the D feature values are D float64 columns (f0..f{D-1}) on
the vertex state — message combining is then D vectorised bincounts, no
list-type columns in the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ..graph import CSRPart, Graph
from ..superstep import Engine, Kernel

FDIM = 8


def _weights(layer: int, seed: int = 17) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed + layer)
    return rng.standard_normal((FDIM, FDIM)), rng.standard_normal(FDIM)


def _init_features(v: np.ndarray, seed: int = 17) -> np.ndarray:
    # deterministic per-vertex features in [0, 1)
    out = np.empty((len(v), FDIM))
    for j in range(FDIM):
        x = (v.astype(np.uint64) * np.uint64(2654435761) + np.uint64(seed * 97 + j))
        x = (x ^ (x >> np.uint64(16))) * np.uint64(0x45D9F3B)
        out[:, j] = (x % np.uint64(10_000)).astype(np.float64) / 10_000.0
    return out


class GNNKernel(Kernel):
    name = "gnn"
    direction = "fwd"
    columns = {
        **{f"f{j}": pa.float64() for j in range(FDIM)},
        "deg": pa.int64(),
        "delta": pa.float64(),
    }

    # wire format: messages carry only the aggregated feature partials —
    # deg/delta would otherwise ship as all-null columns per message row
    @property
    def message_columns(self) -> list:
        return [f"f{j}" for j in range(FDIM)]

    def __init__(self, layers: int = 2, seed: int = 17):
        self.layers = layers
        self.seed = seed

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        feats = _init_features(v, self.seed)
        cols = {f"f{j}": feats[:, j] for j in range(FDIM)}
        cols["deg"] = csr.degrees(v)
        cols["delta"] = np.zeros(n)
        return cols

    def scatter(self, csr: CSRPart, v, cols):
        deg = cols["deg"].astype(np.int64)
        nz = deg > 0
        if not nz.any():
            return None
        counts, nbrs = csr.neighbors_flat(v[nz])
        order = np.argsort(nbrs, kind="stable")
        out = {"v": None}
        tgt_sorted = nbrs[order]
        uniq, starts = np.unique(tgt_sorted, return_index=True)
        out["v"] = uniq
        for j in range(FDIM):
            contrib = np.repeat(cols[f"f{j}"][nz] / deg[nz], counts)[order]
            out[f"f{j}"] = np.add.reduceat(contrib, starts) if len(contrib) else contrib
        return out

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        v = state["v"]
        W, b = _weights(int(ctx["superstep"]), self.seed)
        agg = np.zeros((n, FDIM))
        if len(msgs["v"]):
            mv = msgs["v"].astype(np.int64)
            order = np.argsort(mv, kind="stable")
            for j in range(FDIM):
                np.add.at(agg[:, j], mv[order] - begin,
                          msgs[f"f{j}"][order].astype(np.float64))
        h = agg[v - begin]
        # exp overflow on very negative logits is benign (inf -> sigmoid
        # exactly 0.0, matching the SQL oracle's float math) — silence the
        # RuntimeWarning rather than branch, so values stay bit-identical
        with np.errstate(over="ignore"):
            out = 1.0 / (1.0 + np.exp(-(h @ W.T + b)))
        old = np.stack([state[f"f{j}"] for j in range(FDIM)], axis=1)
        cols = {f"f{j}": out[:, j] for j in range(FDIM)}
        cols["v"] = v
        cols["deg"] = state["deg"].astype(np.int64)
        cols["delta"] = np.abs(out - old).max(axis=1)
        return cols

    stats_spec = [("max_delta", "delta", "max")]

    def converged(self, stats, superstep):
        return superstep >= self.layers - 1


def gnn(graph: Graph, layers: int = 2, seed: int = 17, **engine_kw):
    eng = Engine(graph, GNNKernel(layers, seed), **engine_kw)
    state = eng.run(max_supersteps=layers)
    return state, eng


def gnn_oracle(edges: np.ndarray, n: int, layers: int = 2, seed: int = 17) -> np.ndarray:
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, edges[:, 0], 1)
    h = _init_features(np.arange(n, dtype=np.int64), seed)
    for layer in range(layers):
        W, b = _weights(layer, seed)
        agg = np.zeros((n, FDIM))
        nz = deg[edges[:, 0]] > 0
        src, dst = edges[nz, 0], edges[nz, 1]
        for j in range(FDIM):
            np.add.at(agg[:, j], dst, h[src, j] / deg[src])
        h = 1.0 / (1.0 + np.exp(-(agg @ W.T + b)))
    return h
