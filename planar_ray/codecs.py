"""Pure-numpy codecs for the multimodal column: PPM (P6), BMP (24-bit
BI_RGB) and WAV (PCM16) — VERDICT r4 item 4, replacing the former
``decode_image`` NotImplementedError stub without new dependencies.

These are real, byte-level codecs for the three formats simple enough
to do honestly in numpy; compressed formats (JPEG/PNG/FLAC/...) still
raise a clear error naming the missing codec libs. Encoders exist so
the synthetic corpus can generate deterministic fixtures; decoders are
the operators under test (driver queries ``mm_decode`` / ``mm_audio``
check them against a generative SQL oracle: any row-order, padding,
channel-order or header-parse bug breaks the index-weighted checksum).

No reference analogue (Planar is graph-only); this is part of the
training-data-pipeline surface of the builder's brief.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# PPM (binary P6, 8-bit)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6, maxval 255)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (H, W, 3) uint8. Handles whitespace runs and
    ``#`` comments in the header, per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 ints, tokens separated by whitespace, comments
    # run # -> newline; the single whitespace byte after maxval starts
    # the pixel data
    pos = 2
    vals: list[int] = []
    n = len(payload)
    while len(vals) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    need = w * h * 3
    raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return raw.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit BI_RGB, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BMP (bottom-up rows, BGR byte
    order, rows padded to 4 bytes — the format's required layout)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    data_size = stride * h
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + data_size, 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    bgr = img[::-1, :, ::-1]  # bottom-up rows, BGR channels
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP -> (H, W, 3) uint8 RGB (flips the stored
    bottom-up rows and BGR channel order back)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    h = abs(h_signed)
    top_down = h_signed < 0
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                        offset=offset).reshape(h, stride)
    bgr = raw[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM 16-bit)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """(frames, channels) int16 -> PCM16 WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, ch = samples.shape
    assert samples.dtype == np.int16
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV -> ((frames, channels) int16, sample_rate). Walks the
    RIFF chunk list (fmt/data may be preceded by LIST etc.)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    n = len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"only PCM16 supported (format={audio_format}, bits={bits}); "
            "compressed audio needs codec libs not present here")
    samples = np.frombuffer(data, dtype="<i2")
    frames = len(samples) // ch
    return samples[: frames * ch].reshape(frames, ch).copy(), rate


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_MAGIC_ERRORS = {
    b"\xff\xd8": "JPEG (needs libjpeg/PIL)",
    b"\x89P": "PNG (needs zlib codec path/PIL)",
    b"GI": "GIF (needs PIL)",
}


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff + decode: P6 PPM or 24-bit BMP -> (H, W, 3) uint8.
    Compressed formats raise naming the missing dependency."""
    magic = bytes(payload[:2])
    if magic == b"P6":
        return decode_ppm(payload)
    if magic == b"BM":
        return decode_bmp(payload)
    known = _MAGIC_ERRORS.get(magic)
    if known:
        raise NotImplementedError(
            f"decode_image: {known} — codec libraries are not available "
            "in this environment")
    raise ValueError(f"unrecognised image payload (magic {magic!r})")
