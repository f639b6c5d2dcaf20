"""Pure-numpy image codec for formats decodable without native libs:
PPM P6, 24-bit BMP, and PNG (stdlib zlib inflate + numpy unfiltering) —
a REAL decode path with zero native dependencies.

The container has no PIL/cv2, so the multimodal tier's JPEG kernel stays
an environment-gated stub; but nothing about PPM, uncompressed BMP, or
baseline PNG needs a library — PNG is zlib (stdlib) + five per-scanline
predictors. Decoding them here upgrades the multimodal pipeline from
"plumbing-only" to decode → transform → re-encode working end-to-end on
real image bytes, with the identical mapInPandas batch shape a JPEG
decoder would slot into.

All functions operate on bytes/ndarray (no Spark imports): they are the
kernels the Arrow-batched operators in multimodal.py call per payload.
"""

from __future__ import annotations

import struct
import zlib

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


# --------------------------------------------------------------------------
# PNG: stdlib zlib + numpy unfiltering. Supports 8-bit depth, color types
# 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced
# — i.e. what every standard encoder emits by default. Adam7 interlace and
# 16-bit depth are rejected with a clear error (rare, and a decode error
# routes the payload to the quarantine side of the multimodal splitter,
# same as any corrupt input).
# --------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunks(b: bytes):
    i = 8
    while i + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, i)
        ctype = b[i + 4 : i + 8]
        yield ctype, b[i + 8 : i + 8 + length]
        if ctype == b"IEND":
            return
        i += 12 + length  # length + type + data + crc


def _paeth_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Sequential Paeth reconstruction of one scanline (int16 workspace;
    the left neighbour forces per-pixel order, vectorized over channels)."""
    out = cur.astype(np.int16)
    prev16 = prev.astype(np.int16)
    n = out.shape[0]
    for i in range(n):
        a = out[i - bpp] if i >= bpp else np.int16(0)
        c = prev16[i - bpp] if i >= bpp else np.int16(0)
        bb = prev16[i]
        p = a + bb - c
        pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
        out[i] = (out[i] + pred) & 0xFF
    return out.astype(np.uint8)


def _sub_row(cur: np.ndarray, bpp: int) -> np.ndarray:
    """Filter 1 (Sub): prefix-sum per channel phase — exact uint8
    wraparound via cumsum mod 256, no per-pixel Python loop."""
    out = cur.copy()
    for phase in range(bpp):
        lane = out[phase::bpp].astype(np.uint32)
        out[phase::bpp] = np.cumsum(lane).astype(np.uint8)
    return out


def _avg_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    out = cur.astype(np.int16)
    prev16 = prev.astype(np.int16)
    n = out.shape[0]
    for i in range(n):
        a = int(out[i - bpp]) if i >= bpp else 0
        out[i] = (out[i] + ((a + int(prev16[i])) >> 1)) & 0xFF
    return out.astype(np.uint8)


def decode_png(b: bytes) -> np.ndarray:
    """Baseline PNG -> HxWx3 uint8 RGB (gray replicated to 3 channels,
    palette expanded, alpha dropped — the corpus convention: alpha is
    metadata for compositing, not signal for the feature kernels).
    Every corruption raises ValueError — the single exception class the
    multimodal quarantine fallback catches (truncated IDAT would raise
    zlib.error, short chunks struct.error, bad palette indexes
    IndexError; `_png_guard` folds them all)."""
    if b[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    try:
        return _decode_png_inner(b)
    except ValueError:
        raise
    except (zlib.error, struct.error, IndexError, OverflowError) as e:
        raise ValueError(f"corrupt PNG: {type(e).__name__}: {e}") from e


def _decode_png_inner(b: bytes) -> np.ndarray:
    w = h = None
    color_type = None
    palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace != 0:
                raise ValueError("Adam7-interlaced PNG unsupported")
            if color_type not in (0, 2, 3, 4, 6):
                raise ValueError(f"unsupported PNG color type {color_type}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if w is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * channels
    if raw.size != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    raw = raw.reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    img = np.empty((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, cur = int(filters[y]), rows[y]
        prev = img[y - 1] if y else zero
        if f == 0:
            img[y] = cur
        elif f == 1:
            img[y] = _sub_row(cur, channels)
        elif f == 2:
            img[y] = cur + prev  # uint8 wraparound is the spec's mod-256
        elif f == 3:
            img[y] = _avg_row(cur, prev, channels)
        elif f == 4:
            img[y] = _paeth_row(cur, prev, channels)
        else:
            raise ValueError(f"bad PNG filter {f}")
    px = img.reshape(h, w, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return palette[px[:, :, 0]].copy()
    if channels == 1:
        return np.repeat(px, 3, axis=2).copy()
    if channels == 2:
        return np.repeat(px[:, :, :1], 3, axis=2).copy()
    return px[:, :, :3].copy()


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """HxWx3 uint8 array -> PNG (color type 2, filter 0 scanlines)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects an HxWx3 uint8 array")
    h, w = arr.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * 3)], axis=1
    )
    idat = zlib.compress(scanlines.tobytes(), level)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_image(b: bytes) -> np.ndarray:
    """Dispatch on magic bytes: P6 PPM, 24-bit BMP, and baseline PNG
    decode natively; anything else (JPEG, WebP, ...) needs PIL/cv2
    (absent here) and raises NotImplementedError — the documented
    environment gate."""
    b = bytes(b)
    if b[:2] == b"P6":
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:8] == _PNG_MAGIC:
        return decode_png(b)
    raise NotImplementedError(
        "only PPM(P6)/BMP(24-bit)/PNG(8-bit baseline) decode natively; "
        "other formats require an imaging library (PIL/cv2) not present "
        "in this container"
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
        if b[:8] == _PNG_MAGIC and b[12:16] == b"IHDR":
            w, h = struct.unpack_from(">II", b, 16)
            return w, h
    except Exception:  # noqa: BLE001 — corrupt header == not decodable
        return None
    return None
