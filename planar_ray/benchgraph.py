"""Deterministic synthetic edge tables for throughput/scaling benches.

The corpus pipeline is the functional path, but generating >10^6 files of
text just to get a big edge table wastes bench time; this generator
emits a Zipf-skewed directed edge table with the same *shape* as the
corpus graph (power-law out- and in-degrees, hub vertices) directly as
numpy, deterministically from the row index — so any two runs (and any
two parallelism levels) bench the identical graph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    # deliberately NOT util.splitmix64: this salted variant defines the
    # benchmark GRAPHS themselves — changing it would silently change
    # every logged scaling/crossover measurement's input. Frozen.
    x = (x + np.uint64(salt)) * np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def zipf_edges(num_vertices: int, num_edges: int, skew: float = 2.0,
               seed: int = 42) -> Dataset:
    """Edge dataset with Zipf-ish endpoints: u^skew concentrates mass on
    low ids (hubs), mirroring stdlib-import in-degree skew."""
    import ray.data as rd

    V = num_vertices

    def gen(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        u1 = _mix(i, seed) / np.float64(2**64)
        u2 = _mix(i, seed + 1) / np.float64(2**64)
        src = np.minimum((u1**skew * V).astype(np.int64), V - 1)
        dst = np.minimum((u2**skew * V).astype(np.int64), V - 1)
        keep = src != dst
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    blocks = max(8, num_edges // 500_000)
    return rd.range(num_edges, override_num_blocks=blocks).map_batches(
        gen, batch_format="pyarrow"
    )
