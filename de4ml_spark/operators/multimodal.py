"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode/resize/frame-sample kernels are STUBS (the image/audio libraries
are not available in this environment) — ``decode_image`` raises
NotImplementedError unless a decoder is importable, and ``fake_payload``
builds a deterministic binary payload so the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.

Scale design: binary columns ride Parquet as-is (no base64 inflation);
``mapInPandas`` streams Arrow record batches so a 100 TB corpus is processed
with bounded executor memory (``spark.sql.execution.arrow.maxRecordsPerBatch``
caps batch size); metadata extraction emits a narrow typed schema so
downstream filters prune the heavy binary column at the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"IMG0"

META_SCHEMA = "doc_id BIGINT, byte_len BIGINT, magic STRING, width INT, height INT"


def fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in binary column: MAGIC header + UTF-8 payload.
    Real pipelines read binary via ``spark.read.format('binaryFile')`` or a
    Parquet/Iceberg binary column."""
    return df.withColumn(
        "payload",
        F.concat(F.lit(MAGIC), F.encode(F.col(text_col), "UTF-8")),
    )


def extract_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Typed metadata from the binary column via Arrow-batched mapInPandas.
    Width/height come from the (stub) header parse — here derived
    deterministically from the payload length so the full plumbing is
    exercised and test-assertable."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        from de4ml_spark.operators.imagecodec import probe_dims

        def dims(b, n):
            real = probe_dims(bytes(b))
            return real if real is not None else (n % 640, n % 480)

        for pdf in it:
            payloads = pdf[bin_col]
            blen = payloads.map(len)
            wh = [dims(b, n) for b, n in zip(payloads, blen)]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": blen,
                    "magic": payloads.map(lambda b: bytes(b[:4]).decode("ascii", "replace")),
                    "width": pd.array([w for w, _ in wh], dtype="int32"),
                    "height": pd.array([h for _, h in wh], dtype="int32"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, META_SCHEMA)


def decode_image(payload: bytes):
    """Decode an image payload to an HxWx3 array. PPM (P6), 24-bit BMP,
    and baseline PNG decode NATIVELY via the pure-numpy codec
    (operators/imagecodec.py — PNG is stdlib zlib + numpy unfiltering);
    other formats (JPEG, WebP) need PIL/cv2 — absent in this container —
    and raise NotImplementedError (the documented environment gate)."""
    from de4ml_spark.operators.imagecodec import decode_image as _decode

    return _decode(payload)


RESIZED_SCHEMA = (
    "doc_id BIGINT, payload BINARY, out_w INT, out_h INT, byte_len BIGINT"
)


def resize_images(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 48,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Binary-in/binary-out batch transform: re-encode each payload at a
    target size. Decodable payloads (PPM P6 / 24-bit BMP / baseline PNG)
    take the REAL path — numpy decode, nearest-neighbor resize, PPM re-encode
    (operators/imagecodec.py); anything else falls back to the
    deterministic stub (truncate/pad to target_w*target_h bytes after
    the MAGIC header) so output sizes — and downstream partition/memory
    behavior — match a real resize for formats whose decoder (PIL/cv2)
    is absent here."""

    def _resize_bytes(b: bytes) -> bytes:
        from de4ml_spark.operators.imagecodec import (
            encode_ppm,
            resize_nearest,
        )
        from de4ml_spark.operators.imagecodec import (
            decode_image as _decode,
        )

        b = bytes(b)
        # gate on the DECODE, not the header probe: a probe-able but
        # undecodable payload (32-bpp or RLE BMP, 16-bit PPM, truncated
        # pixel data) must fall back to the stub, not kill the job
        try:
            return encode_ppm(resize_nearest(_decode(b), target_w, target_h))
        except (NotImplementedError, ValueError):
            pass
        body = b[len(MAGIC):]
        want = target_w * target_h
        body = (body * (want // max(1, len(body)) + 1))[:want]
        return MAGIC + body

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            out = pdf[bin_col].map(_resize_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": out,
                    "out_w": target_w,
                    "out_h": target_h,
                    "byte_len": out.map(len),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id BIGINT, frame_idx INT, frame BINARY"


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 16,
    every_n: int = 4,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """One-to-many batch transform (the video frame-sampling shape): split
    each payload into fixed-size frames, keep every ``every_n``-th. STUB
    framing — a real decoder yields actual frames; the Spark-side contract
    (exploded rows, stable frame_idx, binary column) is identical."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for did, b in zip(pdf[id_col], pdf[bin_col]):
                body = bytes(b[len(MAGIC):])
                n = len(body) // frame_bytes
                for i in range(0, n, every_n):
                    ids.append(did)
                    idxs.append(i)
                    frames.append(body[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, bin_col).mapInPandas(batches, FRAMES_SCHEMA)


FEATURE_SCHEMA = "doc_id BIGINT, feature ARRAY<FLOAT>"


def extract_features(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Binary -> fixed-dim feature vector (the embedding-extraction shape).
    STUB kernel: deterministic bytes->float hashing via numpy so the
    vectorized batch path, output schema, and downstream ANN compatibility
    (array<float>, like the embeddings table) are real."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in it:
            feats = []
            for b in pdf[bin_col]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.float32)
                pad = (-len(arr)) % dim
                if pad:
                    arr = np.pad(arr, (0, pad))
                feats.append((arr.reshape(-1, dim).mean(axis=0) / 255.0).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col], "feature": feats})

    return df.select(id_col, bin_col).mapInPandas(batches, FEATURE_SCHEMA)
