"""Small deterministic helpers shared across the engine.

Everything here must be a pure function of its inputs (no RNG state, no
wall clock) so that two runs at different parallelism produce identical
datasets — the determinism requirement of BASELINE.md.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Iterable

import numpy as np
import pyarrow as pa


def h64(*parts: Any) -> int:
    """Stable 64-bit hash of a tuple of primitives (blake2b based).

    Used for all "random" choices in the synthetic corpus generator and
    for hash-bucketing keys; stable across processes and Python versions
    (unlike builtin ``hash``).
    """
    payload = "\x1f".join(str(p) for p in parts).encode("utf-8")
    return int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")


_HASH_KEYS: dict[str, str] = {}


def _hash_key(salt: str) -> str:
    """Deterministic 16-char siphash key derived from a salt string."""
    k = _HASH_KEYS.get(salt)
    if k is None:
        k = hashlib.blake2b(salt.encode("utf-8"), digest_size=8).hexdigest()
        _HASH_KEYS[salt] = k
    return k


def h64_bytes_vec(column: Iterable[str | bytes], salt: str = "") -> np.ndarray:
    """Vectorised stable 64-bit hash of a string column -> uint64 array.

    pandas' C siphash13 kernel (``pd.util.hash_array``) with a fixed,
    salt-derived key: stable across processes and parallelism levels
    (the determinism requirement of BASELINE.md) and ~50x faster than a
    per-row hashlib loop — this sits under the vertex dictionary and
    every string-keyed join bucket.
    """
    import pandas as pd

    vals = np.asarray(column, dtype=object)
    if len(vals) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(vals, hash_key=_hash_key(salt), categorize=False)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorised splitmix64 mixer (uint64 in -> uint64 out).

    The deterministic stand-in for C ``rand()`` in kernels that need
    "random" but reproducible-at-any-parallelism choices (coloring
    increments, random-walk neighbor picks). Pure 64-bit wraparound
    arithmetic, so a SQL oracle can replicate it exactly with HUGEINT
    mod-2^64 math (see pipelines/testdata_graph.py ``_sql_mix``).
    """
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


POLY_PRIME = 1099511628211  # FNV64 prime — the rolling-hash base


def poly_splitmix_vec(column, seed: int) -> np.ndarray:
    """SQL-replicable vectorised 64-bit string hash -> uint64 array.

    ``h = seed; for byte b: h = (h * POLY_PRIME + b) mod 2^64``, finished
    with one :func:`splitmix64` mix — pure mod-2^64 arithmetic, so a
    DuckDB oracle reproduces it bit-exactly (HUGEINT ``list_reduce`` over
    the string's bytes + the ``_sql_mix`` splitmix chain; see
    pipelines/docs.py ``_hash_sql_ctes``). Replaces siphash for the
    near-dup suite's shingle/token hashes, flipping those queries from
    rows-only to fully oracle-checked.

    Vectorised over the Arrow utf-8 buffer: one numpy pass per byte
    position (bounded by the longest string in the batch) — tokens and
    shingles are short, so this stays a handful of C passes per batch.
    ASCII-safe AND utf-8 safe (bytes are hashed; the SQL twin uses
    ``ascii()`` per char, valid for the [a-z0-9_] token alphabet)."""
    if isinstance(column, (pa.Array, pa.ChunkedArray)):
        arr = (column.combine_chunks()
               if isinstance(column, pa.ChunkedArray) else column)
        arr = arr.cast(pa.large_string())
    else:
        vals = np.asarray(column, dtype=object)
        if len(vals) == 0:
            return np.empty(0, dtype=np.uint64)
        arr = pa.array(vals, pa.large_string())
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64)[
        arr.offset:arr.offset + len(arr) + 1]
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    n = len(arr)
    L = np.diff(off)
    h = np.full(n, seed, dtype=np.uint64)
    starts = off[:-1]
    prime = np.uint64(POLY_PRIME)
    with np.errstate(over="ignore"):
        for j in range(int(L.max()) if n else 0):
            m = L > j
            h[m] = h[m] * prime + data[starts[m] + j]
    return splitmix64(h)


def sha256_vec(column: Iterable[str | bytes]) -> list[str]:
    """Per-row sha256 hex of a string/binary column (the ingest invariant)."""
    out = []
    for s in column:
        b = s if isinstance(s, bytes) else s.encode("utf-8")
        out.append(hashlib.sha256(b).hexdigest())
    return out


def strip_schema_meta(ds):
    """Drop schema-level metadata right after a Dataset ingress.

    Parquet written by pandas (the driver's testdata tables) and
    ``rd.from_pandas`` blocks carry a ``b'pandas'`` schema-metadata dict;
    Ray's shuffle tasks try to hash block schemas for deduplication and
    log ``Failed to hash the schemas ... unhashable type: 'dict'`` on
    every reduce task. ``replace_schema_metadata(None)`` is zero-copy and
    the map fuses with the next stage.
    """
    import pyarrow as pa

    return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                          batch_format="pyarrow")


def read_parquet_clean(path: str, columns: list[str] | None = None, **kw):
    """``rd.read_parquet`` with the pandas schema-metadata dict removed
    AT THE READ (``schema=`` with ``remove_metadata()``).

    :func:`strip_schema_meta` cleans blocks after a read, but the
    ``Failed to hash the schemas`` warning also fires INSIDE the
    ReadParquet op (SplitBlocks / downstream shuffles unify the read
    tasks' block schemas, and a schema carrying the ``b'pandas'``
    metadata dict is unhashable). Passing a stripped read schema stops
    it at the source. One driver-side footer read per call — cheap."""
    import pyarrow.parquet as pq
    import ray.data as rd

    schema = pq.read_schema(path).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
        return rd.read_parquet(path, columns=columns, schema=schema, **kw)
    return rd.read_parquet(path, schema=schema, **kw)


def write_json_atomic(path: str, obj: Any) -> None:
    """Write JSON via temp-file + rename so readers never see partial files."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True, default=str)
    os.replace(tmp, path)


def read_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def repeat_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Flatten variable-length ranges: concat(arange(s, s+c) for s, c).

    The vectorised CSR row-slice gather (no Python loop): used to pull the
    neighbor lists of an arbitrary vertex subset out of a CSR indices
    array in one numpy expression.
    """
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    # local offset within each range: 0..c_i-1
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    return np.repeat(starts, counts) + offs
