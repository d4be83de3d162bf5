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


# Real pure-numpy decode (round 5 — formerly a NotImplementedError
# stub): P6 PPM and 24-bit BMP decode natively; compressed formats
# (JPEG/PNG) still raise naming the missing codec libs. See codecs.py.
from ..codecs import decode_image  # noqa: F401  (re-exported surface)


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
        if use_real_decode:
            # real path: decode the image and histogram its pixel bytes
            # into the same HIST_BINS-dim signal the fake path emits
            def real_signal(payload: bytes) -> np.ndarray:
                img = decode_image(payload)
                return fake_decode(img.tobytes())

            self.decode = real_signal
        else:
            self.decode = fake_decode

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        if not payloads:  # np.stack([]) raises; emit a typed empty block
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_bytes": pa.array([], pa.int64()),
                "feature": pa.array([], pa.list_(pa.float64())),
            })
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
        # same 'model' as FeatureExtractor: one signal definition, one
        # weight construction — the frame and feature SQL oracles embed
        # the same constants and must never diverge
        self.weights = FeatureExtractor(seed=seed).weights

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids, frame_idx, feats = [], [], []
        for did, p in zip(t["doc_id"].to_pylist(), t["payload"].to_pylist()):
            raw = np.frombuffer(p, dtype=np.uint8)
            n_frames = max(1, len(raw) // FRAME_BYTES)
            for f in range(0, n_frames, FRAME_STRIDE):
                chunk = raw[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
                sig = fake_decode(chunk.tobytes())
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


# ---------------------------------------------------------------------------
# Driver-contract variants + SQL oracles.
#
# The stage outputs above are the realistic shapes (list<float64> feature
# columns, binary payloads); the driver's oracle compare hashes scalar
# columns, so the registered queries flatten lists to long format and
# hex-encode binaries. The oracles replicate the whole computation in
# DuckDB: payload bytes via hex(encode(text)) (high nibble = first hex
# digit of each byte), the 16x8 projection weights embedded as literals
# (the g2_gnn oracle pattern), np.round's half-to-even replicated for the
# resize byte quantisation.
# ---------------------------------------------------------------------------


def q_mm_features_flat(sf_dir: str) -> pa.Table:
    tab = q_mm_features(sf_dir)
    n = FEATURE_DIM
    doc = np.repeat(tab["doc_id"].to_numpy(), n)
    nb = np.repeat(tab["n_bytes"].to_numpy(), n)
    dim = np.tile(np.arange(n, dtype=np.int64), len(tab))
    val = np.asarray(tab["feature"].to_pylist(), dtype=np.float64).reshape(-1)
    return pa.table({
        "doc_id": pa.array(doc, pa.int64()),
        "n_bytes": pa.array(nb, pa.int64()),
        "dim": pa.array(dim),
        "value": pa.array(val),
    })


def q_mm_frame_sample_flat(sf_dir: str) -> pa.Table:
    tab = q_mm_frame_sample(sf_dir)
    n = FEATURE_DIM
    doc = np.repeat(tab["doc_id"].to_numpy(), n)
    fi = np.repeat(tab["frame_idx"].to_numpy(), n)
    dim = np.tile(np.arange(n, dtype=np.int64), len(tab))
    val = np.asarray(tab["feature"].to_pylist(), dtype=np.float64).reshape(-1)
    return pa.table({
        "doc_id": pa.array(doc, pa.int64()),
        "frame_idx": pa.array(fi, pa.int64()),
        "dim": pa.array(dim),
        "value": pa.array(val),
    })


def q_mm_resize_hex(sf_dir: str) -> pa.Table:
    tab = q_mm_resize(sf_dir)
    hexed = [p.hex().upper() for p in tab["resized"].to_pylist()]
    return pa.table({
        "doc_id": tab["doc_id"],
        "resized_hex": pa.array(hexed, pa.string()),
        "n_bytes": tab["n_bytes"],
    })


def _weights_values_sql() -> str:
    rng = np.random.default_rng(31)
    w = rng.standard_normal((HIST_BINS, FEATURE_DIM))
    rows = ", ".join(
        f"({k}, {j}, {w[k, j]!r})"
        for k in range(HIST_BINS) for j in range(FEATURE_DIM)
    )
    return f"(VALUES {rows}) AS w(k, j, wt)"


# shared prefix: per-doc payload bytes as hex, high nibble per byte
_SQL_NIB_PREFIX = """
WITH d AS (
  SELECT doc_id::BIGINT AS doc_id, hex(encode(text)) AS h,
         (length(hex(encode(text))) // 2)::BIGINT AS n
  FROM documents
),
pos AS (SELECT doc_id, h, n, unnest(range(1, n + 1)) AS i FROM d),
nib AS (
  SELECT doc_id, CAST('0x' || substr(h, (2*i - 1)::INT, 1) AS INTEGER) AS hi
  FROM pos
),
hist AS (SELECT doc_id, hi, COUNT(*)::DOUBLE AS c FROM nib GROUP BY doc_id, hi)
"""


def _mm_features_sql() -> str:
    return (_SQL_NIB_PREFIX + f"""
, sig AS (
  SELECT d.doc_id, d.n, gk.k,
         CASE WHEN d.n = 0 THEN 0.0
              ELSE COALESCE(hist.c, 0) / d.n::DOUBLE END AS s
  FROM d CROSS JOIN (SELECT unnest(range(0, {HIST_BINS}))::INT AS k) gk
  LEFT JOIN hist ON hist.doc_id = d.doc_id AND hist.hi = gk.k
)
SELECT sig.doc_id, sig.n AS n_bytes, w.j::BIGINT AS dim,
       round(SUM(sig.s * w.wt), 6) AS value
FROM sig JOIN {_weights_values_sql()} ON w.k = sig.k
GROUP BY sig.doc_id, sig.n, w.j
ORDER BY doc_id, dim
""")


def _mm_frame_sample_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id::BIGINT AS doc_id, hex(encode(text)) AS h,
         (length(hex(encode(text))) // 2)::BIGINT AS n
  FROM documents
),
fr AS (
  SELECT doc_id, h, n,
         unnest(range(0, greatest(n // {FRAME_BYTES}, 1), {FRAME_STRIDE})) AS f
  FROM d
),
chunks AS (
  SELECT doc_id, f, h,
         least((f + 1) * {FRAME_BYTES}, n) - f * {FRAME_BYTES} AS clen
  FROM fr
),
pos AS (
  SELECT doc_id, f, h,
         unnest(range(f * {FRAME_BYTES} + 1, f * {FRAME_BYTES} + clen + 1)) AS i
  FROM chunks
),
nib AS (
  SELECT doc_id, f,
         CAST('0x' || substr(h, (2*i - 1)::INT, 1) AS INTEGER) AS hi
  FROM pos
),
hist AS (SELECT doc_id, f, hi, COUNT(*)::DOUBLE AS c FROM nib GROUP BY ALL),
sig AS (
  SELECT ch.doc_id, ch.f, ch.clen, gk.k,
         CASE WHEN ch.clen = 0 THEN 0.0
              ELSE COALESCE(hist.c, 0) / ch.clen::DOUBLE END AS s
  FROM chunks ch CROSS JOIN (SELECT unnest(range(0, {HIST_BINS}))::INT AS k) gk
  LEFT JOIN hist ON hist.doc_id = ch.doc_id AND hist.f = ch.f
                AND hist.hi = gk.k
)
SELECT sig.doc_id, sig.f::BIGINT AS frame_idx, w.j::BIGINT AS dim,
       round(SUM(sig.s * w.wt), 6) AS value
FROM sig JOIN {_weights_values_sql()} ON w.k = sig.k
GROUP BY sig.doc_id, sig.f, w.j
ORDER BY doc_id, frame_idx, dim
"""


def _mm_resize_sql() -> str:
    # np.round is half-to-even: the ELSE branch adds floor%2 on exact .5
    return (_SQL_NIB_PREFIX + f"""
, sig AS (
  SELECT d.doc_id, d.n, gk.k,
         CASE WHEN d.n = 0 THEN 0.0
              ELSE COALESCE(hist.c, 0) / d.n::DOUBLE END AS s
  FROM d CROSS JOIN (SELECT unnest(range(0, {HIST_BINS}))::INT AS k) gk
  LEFT JOIN hist ON hist.doc_id = d.doc_id AND hist.hi = gk.k
),
pool AS (
  SELECT doc_id, k // 2 AS ob,
         (MAX(CASE WHEN k % 2 = 0 THEN s END)
          + MAX(CASE WHEN k % 2 = 1 THEN s END)) / 2 * 255 AS x
  FROM sig GROUP BY doc_id, k // 2
),
byt AS (
  SELECT doc_id, ob,
         CASE WHEN x - floor(x) > 0.5 THEN floor(x) + 1
              WHEN x - floor(x) < 0.5 THEN floor(x)
              ELSE floor(x) + (floor(x)::BIGINT % 2) END::BIGINT AS v
  FROM pool
)
SELECT doc_id,
       string_agg(lpad(hex(v), 2, '0'), '' ORDER BY ob) AS resized_hex,
       {HIST_BINS // 2}::BIGINT AS n_bytes
FROM byt GROUP BY doc_id ORDER BY doc_id
""")


# ---------------------------------------------------------------------------
# REAL decode queries (round 5): deterministic PPM/BMP/WAV fixtures are
# generated per doc_id from a splitmix64 pixel/sample rule, ENCODED to
# real container bytes, then decoded by the pure-numpy codecs
# (codecs.py). The emitted stats are pure integers — pixel sum plus an
# index-weighted checksum over the DECODED flattened array — so the SQL
# oracle (which recomputes them from the generative rule, never seeing
# the container bytes) is exact, and any decode bug that permutes,
# pads, flips rows or swaps channels breaks the weighted checksum.
# ---------------------------------------------------------------------------

_PIX_STRIDE = 1 << 20  # doc_id * stride + i: images are < 2^20 pixels
_AUDIO_SALT = 7_777_777


def _gen_pixels(doc_id: int) -> tuple[int, int, np.ndarray]:
    from ..util import splitmix64

    w = 8 + doc_id % 5
    h = 6 + doc_id % 4
    n = w * h * 3
    i = np.arange(n, dtype=np.uint64)
    pix = (splitmix64(np.uint64(doc_id) * np.uint64(_PIX_STRIDE) + i)
           % np.uint64(256)).astype(np.uint8)
    return w, h, pix


def _gen_samples(doc_id: int) -> tuple[int, int, np.ndarray]:
    from ..util import splitmix64

    frames = 200 + doc_id % 57
    ch = 1 + doc_id % 2
    n = frames * ch
    i = np.arange(n, dtype=np.uint64)
    z = splitmix64(
        (np.uint64(doc_id) + np.uint64(_AUDIO_SALT))
        * np.uint64(_PIX_STRIDE) + i)
    s = (z % np.uint64(65536)).astype(np.int64) - 32768
    return frames, ch, s.astype(np.int16)


class ImageDecodeStage:
    """Actor-pool stage: encode each doc's deterministic pixels to a
    REAL container (even doc_id -> PPM, odd -> BMP — both codecs under
    test every run), decode with codecs.decode_image, emit integer
    stats of the decoded array."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..codecs import decode_image as dec, encode_bmp, encode_ppm

        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = {"doc_id": [], "width": [], "height": [], "fmt": [],
                "pix_sum": [], "wsum": []}
        for did in doc_ids:
            did = int(did)
            w, h, pix = _gen_pixels(did)
            img = pix.reshape(h, w, 3)
            payload = encode_ppm(img) if did % 2 == 0 else encode_bmp(img)
            out = dec(payload)  # the operator under test
            flat = out.reshape(-1).astype(np.int64)
            idx = np.arange(len(flat), dtype=np.int64)
            rows["doc_id"].append(did)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["fmt"].append("ppm" if did % 2 == 0 else "bmp")
            rows["pix_sum"].append(int(flat.sum()))
            rows["wsum"].append(int((idx * flat).sum()))
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "width": pa.array(rows["width"], pa.int64()),
            "height": pa.array(rows["height"], pa.int64()),
            "fmt": pa.array(rows["fmt"], pa.string()),
            "pix_sum": pa.array(rows["pix_sum"], pa.int64()),
            "wsum": pa.array(rows["wsum"], pa.int64()),
        })


class AudioDecodeStage:
    """Same shape for WAV: deterministic PCM16 samples -> encode_wav ->
    decode_wav -> integer stats of the decoded interleaved stream."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..codecs import decode_wav, encode_wav

        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = {"doc_id": [], "frames": [], "channels": [],
                "sample_sum": [], "wsum": []}
        for did in doc_ids:
            did = int(did)
            frames, ch, s = _gen_samples(did)
            payload = encode_wav(s.reshape(frames, ch))
            out, rate = decode_wav(payload)  # the operator under test
            assert rate == 8000
            flat = out.reshape(-1).astype(np.int64)
            idx = np.arange(len(flat), dtype=np.int64)
            rows["doc_id"].append(did)
            rows["frames"].append(out.shape[0])
            rows["channels"].append(out.shape[1])
            rows["sample_sum"].append(int(flat.sum()))
            rows["wsum"].append(int((idx * flat).sum()))
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "frames": pa.array(rows["frames"], pa.int64()),
            "channels": pa.array(rows["channels"], pa.int64()),
            "sample_sum": pa.array(rows["sample_sum"], pa.int64()),
            "wsum": pa.array(rows["wsum"], pa.int64()),
        })


def _doc_ids(sf_dir: str) -> Dataset:
    from ..util import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])


def q_mm_decode(sf_dir: str) -> pa.Table:
    out = _doc_ids(sf_dir).map_batches(
        ImageDecodeStage, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4), num_cpus=1).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True),
        preserve_index=False)


def q_mm_audio(sf_dir: str) -> pa.Table:
    out = _doc_ids(sf_dir).map_batches(
        AudioDecodeStage, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4), num_cpus=1).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True),
        preserve_index=False)


def _mm_decode_sql() -> str:
    from .testdata_graph import _sql_mix

    ctes, fin = _sql_mix(
        "mx", "px", f"doc_id * {_PIX_STRIDE} + i", ["doc_id", "w", "h", "i"])
    return f"""
WITH d AS (
  SELECT doc_id::BIGINT AS doc_id,
         (8 + doc_id % 5)::BIGINT AS w,
         (6 + doc_id % 4)::BIGINT AS h
  FROM documents
),
px AS (SELECT doc_id, w, h, unnest(range(0, w * h * 3)) AS i FROM d),
{", ".join(ctes)}
SELECT doc_id, w AS width, h AS height,
       CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt,
       SUM(z % 256)::BIGINT AS pix_sum,
       SUM(i * (z % 256))::BIGINT AS wsum
FROM {fin} GROUP BY doc_id, w, h ORDER BY doc_id
"""


def _mm_audio_sql() -> str:
    from .testdata_graph import _sql_mix

    ctes, fin = _sql_mix(
        "ax", "sx", f"(doc_id + {_AUDIO_SALT}) * {_PIX_STRIDE} + i",
        ["doc_id", "frames", "ch", "i"])
    return f"""
WITH d AS (
  SELECT doc_id::BIGINT AS doc_id,
         (200 + doc_id % 57)::BIGINT AS frames,
         (1 + doc_id % 2)::BIGINT AS ch
  FROM documents
),
sx AS (SELECT doc_id, frames, ch, unnest(range(0, frames * ch)) AS i FROM d),
{", ".join(ctes)}
SELECT doc_id, frames, ch AS channels,
       SUM((z % 65536)::BIGINT - 32768)::BIGINT AS sample_sum,
       SUM(i * ((z % 65536)::BIGINT - 32768))::BIGINT AS wsum
FROM {fin} GROUP BY doc_id, frames, ch ORDER BY doc_id
"""


QUERIES = {
    "mm_features": q_mm_features_flat,
    "mm_frame_sample": q_mm_frame_sample_flat,
    "mm_resize": q_mm_resize_hex,
    "mm_decode": q_mm_decode,
    "mm_audio": q_mm_audio,
}
ORACLES: dict[str, str] = {
    "mm_features": _mm_features_sql(),
    "mm_frame_sample": _mm_frame_sample_sql(),
    "mm_resize": _mm_resize_sql(),
    "mm_decode": _mm_decode_sql(),
    "mm_audio": _mm_audio_sql(),
}
