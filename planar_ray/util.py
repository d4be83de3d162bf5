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


def h64(*parts: Any) -> int:
    """Stable 64-bit hash of a tuple of primitives (blake2b based).

    Used for all "random" choices in the synthetic corpus generator and
    for hash-bucketing keys; stable across processes and Python versions
    (unlike builtin ``hash``).
    """
    payload = "\x1f".join(str(p) for p in parts).encode("utf-8")
    return int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")


def h64_bytes_vec(column: Iterable[str | bytes], salt: str = "") -> np.ndarray:
    """Vectorised-ish stable 64-bit hash of a string column -> uint64 array."""
    salt_b = salt.encode("utf-8")
    out = np.empty(len(column), dtype=np.uint64)  # type: ignore[arg-type]
    for i, s in enumerate(column):
        b = s if isinstance(s, bytes) else s.encode("utf-8")
        out[i] = int.from_bytes(
            hashlib.blake2b(salt_b + b, digest_size=8).digest(), "big"
        )
    return out


def sha256_vec(column: Iterable[str | bytes]) -> list[str]:
    """Per-row sha256 hex of a string/binary column (the ingest invariant)."""
    out = []
    for s in column:
        b = s if isinstance(s, bytes) else s.encode("utf-8")
        out.append(hashlib.sha256(b).hexdigest())
    return out


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
