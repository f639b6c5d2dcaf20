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

        for pdf in it:
            payloads = pdf[bin_col]
            blen = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": blen,
                    "magic": payloads.map(lambda b: bytes(b[:4]).decode("ascii", "replace")),
                    "width": (blen % 640).astype("int32"),
                    "height": (blen % 480).astype("int32"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, META_SCHEMA)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Decode an image payload to HxWxC array. STUB: no imaging library is
    available in this container; plug in cv2/PIL in production."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires an imaging library (PIL/cv2); "
            "payload plumbing is tested with fake_payload instead"
        ) from e
    raise NotImplementedError("real decoder goes here")
