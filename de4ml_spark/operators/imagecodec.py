"""Pure-numpy image codec for the simple uncompressed formats (PPM P6,
24-bit BMP) — a REAL decode path with zero native dependencies.

The container has no PIL/cv2, so the multimodal tier's JPEG/PNG kernels
stay environment-gated stubs; but nothing about PPM or uncompressed BMP
needs a library — headers are a few integer fields and the pixel data
is a raw array. Decoding them here upgrades the multimodal pipeline
from "plumbing-only" to decode → transform → re-encode working
end-to-end on real image bytes, with the identical mapInPandas batch
shape a JPEG decoder would slot into.

All functions operate on bytes/ndarray (no Spark imports): they are the
kernels the Arrow-batched operators in multimodal.py call per payload.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 array -> binary PPM (P6, maxval 255)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects an HxWx3 uint8 array")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _ppm_tokens(b: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer tokens after ``start``,
    skipping ``#`` comments (the PPM header grammar)."""
    out: list[int] = []
    i = start
    while len(out) < n:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        out.append(int(b[i:j]))
        i = j
    return out, i + 1  # single whitespace byte terminates the header


def decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6) -> HxWx3 uint8 array."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    (w, h, maxval), off = _ppm_tokens(b, 3, 2)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    data = np.frombuffer(b, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w, 3).copy()


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> HxWx3 uint8 RGB array (handles the
    4-byte row padding and bottom-up row order)."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if bottom_up:
        img = img[::-1]
    return img.copy()


def decode_image(b: bytes) -> np.ndarray:
    """Dispatch on magic bytes: P6 PPM and 24-bit BMP decode natively;
    anything else needs PIL/cv2 (absent here) and raises
    NotImplementedError — the documented environment gate."""
    b = bytes(b)
    if b[:2] == b"P6":
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    raise NotImplementedError(
        "only PPM(P6)/BMP(24-bit) decode natively; other formats require "
        "an imaging library (PIL/cv2) not present in this container"
    )


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index sampling (the exact,
    deterministic kernel — no interpolation-library variance)."""
    h, w = arr.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows][:, cols]


def probe_dims(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a decodable header, None otherwise — cheap
    metadata without touching pixel data."""
    b = bytes(b)
    try:
        if b[:2] == b"P6":
            (w, h, _), _ = _ppm_tokens(b, 3, 2)
            return w, h
        if b[:2] == b"BM":
            w, h = struct.unpack_from("<ii", b, 18)
            return w, abs(h)
    except Exception:  # noqa: BLE001 — corrupt header == not decodable
        return None
    return None
