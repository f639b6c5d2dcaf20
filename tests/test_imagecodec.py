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
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


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
