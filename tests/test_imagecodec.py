"""Pure-numpy image codec: PPM round-trip, BMP decode against a
hand-built bitmap, nearest-resize exactness, and the multimodal
pipeline running the REAL path end-to-end on PPM payloads in Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from de4ml_spark.operators.imagecodec import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_ppm,
    probe_dims,
    resize_nearest,
)


def _img(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip():
    img = _img(13, 9)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert probe_dims(encode_ppm(img)) == (9, 13)


def test_ppm_header_comments():
    img = _img(2, 3)
    raw = b"P6\n# a comment\n3 2\n# more\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(raw), img)


def _build_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP writer (test-side reference)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    data_off = 54
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(rows), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    )
    return header + bytes(rows)


def test_bmp_decode_matches_source():
    img = _img(5, 7, seed=3)
    assert np.array_equal(decode_bmp(_build_bmp(img)), img)
    assert probe_dims(_build_bmp(img)) == (7, 5)


def test_bmp_rejects_compressed():
    img = _img(2, 2)
    raw = bytearray(_build_bmp(img))
    struct.pack_into("<I", raw, 30, 1)  # compression = RLE
    with pytest.raises(ValueError):
        decode_bmp(bytes(raw))


def test_resize_nearest_exact():
    img = _img(4, 4)
    out = resize_nearest(img, 2, 2)
    # nearest with integer ratios picks rows/cols 0 and 2
    assert np.array_equal(out, img[[0, 2]][:, [0, 2]])
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    assert np.array_equal(up[::2, ::2], img)


def test_unknown_format_gated():
    # PNG decodes natively now; JPEG remains the documented env gate
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0....")


def test_real_path_in_spark_pipeline(spark):
    """PPM payloads through extract_meta (real header dims) and
    resize_images (real decode -> nearest resize -> PPM re-encode)."""
    from de4ml_spark.operators.multimodal import extract_meta, resize_images

    imgs = {i: _img(10 + i, 20 + i, seed=i) for i in range(4)}
    rows = [(i, bytearray(encode_ppm(a))) for i, a in imgs.items()]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")

    meta = {r["doc_id"]: r for r in extract_meta(df).collect()}
    for i, a in imgs.items():
        assert (meta[i]["width"], meta[i]["height"]) == (20 + i, 10 + i)
        assert meta[i]["magic"].startswith("P6")

    out = {r["doc_id"]: r for r in resize_images(df, target_w=8, target_h=4).collect()}
    for i, a in imgs.items():
        dec = decode_ppm(bytes(out[i]["payload"]))
        assert dec.shape == (4, 8, 3)
        assert np.array_equal(dec, resize_nearest(a, 8, 4))


# --------------------------------------------------------------------------
# PNG: the forward filters below are an independent test-side
# implementation of the PNG spec's predictors (Sub/Up/Average/Paeth);
# the decoder must invert every one of them. zlib is stdlib on both
# sides, so the container's zero-image-lib constraint holds.
# --------------------------------------------------------------------------


def _png_forward_filter(img: np.ndarray, filters: list[int]) -> bytes:
    """Reference PNG writer applying a GIVEN filter per scanline."""
    import struct as st
    import zlib

    h, w = img.shape[:2]
    bpp = img.shape[2]
    flat = img.reshape(h, w * bpp).astype(np.int16)
    out = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * bpp, dtype=np.int16)
        line = np.empty(w * bpp, dtype=np.int16)
        for i in range(w * bpp):
            a = int(cur[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            x = int(cur[i])
            if f == 0:
                line[i] = x
            elif f == 1:
                line[i] = (x - a) % 256
            elif f == 2:
                line[i] = (x - b) % 256
            elif f == 3:
                line[i] = (x - ((a + b) >> 1)) % 256
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (x - pred) % 256
        out += bytes([f]) + line.astype(np.uint8).tobytes()

    def chunk(ctype, data):
        return (
            st.pack(">I", len(data)) + ctype + data
            + st.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ctype_map = {1: 0, 3: 2, 4: 6, 2: 4}
    color_type = ctype_map[bpp]
    ihdr = st.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_decode_inverts_each_filter(filt):
    from de4ml_spark.operators.imagecodec import decode_png

    img = _img(11, 7, seed=filt + 1)
    assert np.array_equal(decode_png(_png_forward_filter(img, [filt])), img)


def test_png_decode_mixed_filters_and_probe():
    from de4ml_spark.operators.imagecodec import decode_png

    img = _img(16, 5, seed=42)
    raw = _png_forward_filter(img, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(raw), img)
    assert probe_dims(raw) == (5, 16)


def test_png_rgba_and_gray_channel_policy():
    from de4ml_spark.operators.imagecodec import decode_png

    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, size=(6, 4, 4), dtype=np.uint8)
    out = decode_png(_png_forward_filter(rgba, [4]))
    assert np.array_equal(out, rgba[:, :, :3])  # alpha dropped
    gray = rng.integers(0, 256, size=(6, 4, 1), dtype=np.uint8)
    gout = decode_png(_png_forward_filter(gray, [1]))
    assert np.array_equal(gout, np.repeat(gray, 3, axis=2))


def test_png_roundtrip_resize():
    """decode -> resize -> re-encode -> decode: the multimodal kernel
    chain on real PNG bytes."""
    from de4ml_spark.operators.imagecodec import decode_png, encode_png

    img = _img(20, 14, seed=9)
    small = resize_nearest(decode_png(encode_png(img)), 7, 10)
    again = decode_png(encode_png(small))
    assert again.shape == (10, 7, 3)
    assert np.array_equal(again, small)
    assert np.array_equal(decode_image(encode_png(img)), img)


def test_png_rejects_unsupported():
    from de4ml_spark.operators.imagecodec import decode_png

    img = _img(4, 4)
    raw = bytearray(_png_forward_filter(img, [0]))
    raw[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(raw))
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
