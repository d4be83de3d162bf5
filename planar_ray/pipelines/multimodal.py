"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
metadata columns beside them. The decode step needs codec libraries that
are NOT in this container, so it is stubbed behind a clearly marked
``NotImplementedError`` with a deterministic fake for tests — but all the
Ray-side plumbing is real and tested: schema, actor-pool stage shape
(weights "loaded" once per actor in ``__init__``), per-batch vectorised
feature extraction, small batch sizes for wide binary rows, list<float>
output columns.

``mm_features`` fabricates payloads from the documents table (utf-8
bytes as stand-in blobs), then runs the extraction stage.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
from ray.data import Dataset

FEATURE_DIM = 8
HIST_BINS = 16


def decode_image(payload: bytes) -> np.ndarray:
    """REAL decode stub — requires an image codec not present here."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg which are not available in this "
        "environment; use fake_decode (deterministic) for tests"
    )


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: byte histogram as the 'decoded' signal."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(raw >> 4, minlength=HIST_BINS).astype(np.float64)
    total = hist.sum()
    return hist / total if total else hist


class FeatureExtractor:
    """Actor-pool stage: 'model' weights built once per actor (__init__),
    per-batch vectorised feature projection (__call__). The real decode
    call is swapped in by constructing with use_real_decode=True."""

    def __init__(self, seed: int = 31, use_real_decode: bool = False):
        rng = np.random.default_rng(seed)
        self.weights = rng.standard_normal((HIST_BINS, FEATURE_DIM))
        self.decode = decode_image if use_real_decode else fake_decode

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        signals = np.stack([self.decode(p) for p in payloads])
        feats = signals @ self.weights  # (batch, FEATURE_DIM)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "feature": pa.array(
                    [row.tolist() for row in np.round(feats, 6)],
                    pa.list_(pa.float64()),
                ),
            }
        )


def payloads_from_docs(sf_dir: str) -> Dataset:
    from ..util import read_parquet_clean

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])

    def to_binary(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(
                    [s.encode("utf-8") for s in t["text"].to_pylist()], pa.binary()
                ),
            }
        )

    return docs.map_batches(to_binary, batch_format="pyarrow")


def q_mm_features(sf_dir: str) -> pa.Table:
    ds = payloads_from_docs(sf_dir)
    # small batch size: binary payload rows are wide; an image pipeline
    # would size batch_size so batch x concurrency fits worker heap
    out = ds.map_batches(
        FeatureExtractor,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
        num_cpus=1,
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("doc_id").reset_index(drop=True),
                                preserve_index=False)


FRAME_BYTES = 64   # fake "frame" = fixed-size byte chunk of the payload
FRAME_STRIDE = 4   # sample every 4th frame


class FrameSampler:
    """Video-style stage: split each payload into fixed-size frames,
    deterministically sample every FRAME_STRIDE-th, emit one row per
    sampled frame with its features — the 1->N flat-map shape a video
    pipeline needs (frame decode itself would ride ``decode_image``)."""

    def __init__(self, seed: int = 31):
        rng = np.random.default_rng(seed)
        self.weights = rng.standard_normal((HIST_BINS, FEATURE_DIM))

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids, frame_idx, feats = [], [], []
        for did, p in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            raw = np.frombuffer(p, dtype=np.uint8)
            n_frames = max(1, len(raw) // FRAME_BYTES)
            for f in range(0, n_frames, FRAME_STRIDE):
                chunk = raw[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
                hist = np.bincount(chunk >> 4, minlength=HIST_BINS).astype(np.float64)
                s = hist.sum()
                sig = hist / s if s else hist
                doc_ids.append(did)
                frame_idx.append(f)
                feats.append(np.round(sig @ self.weights, 6).tolist())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def q_mm_frame_sample(sf_dir: str) -> pa.Table:
    ds = payloads_from_docs(sf_dir)
    out = ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=128,
        concurrency=(1, 4), num_cpus=1,
    ).to_pandas()
    out = out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def resize_signal(sig: np.ndarray, out_bins: int) -> np.ndarray:
    """Deterministic 'resize': average-pool the histogram signal — the
    shape a real image resize stage would take (decode -> pool -> encode)."""
    assert HIST_BINS % out_bins == 0
    return sig.reshape(out_bins, HIST_BINS // out_bins).mean(axis=1)


def q_mm_resize(sf_dir: str) -> pa.Table:
    """Decode -> resize -> re-encode plumbing: emits a reduced-resolution
    binary payload plus its size, exercising binary-out schemas."""
    ds = payloads_from_docs(sf_dir)
    out_bins = HIST_BINS // 2

    def resize_batch(t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        outs = []
        for p in payloads:
            sig = fake_decode(p)
            small = resize_signal(sig, out_bins)
            outs.append(np.round(small * 255).astype(np.uint8).tobytes())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "resized": pa.array(outs, pa.binary()),
                "n_bytes": pa.array([len(o) for o in outs], pa.int64()),
            }
        )

    out = ds.map_batches(resize_batch, batch_format="pyarrow",
                         batch_size=256).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("doc_id").reset_index(drop=True),
                                preserve_index=False)


QUERIES = {
    "mm_features": q_mm_features,
    "mm_frame_sample": q_mm_frame_sample,
    "mm_resize": q_mm_resize,
}
ORACLES: dict[str, str] = {}
