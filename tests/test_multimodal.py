"""Multimodal column plumbing tests: binary payloads through Arrow-batched
mapInPandas, stub gating for the absent decoder."""

from __future__ import annotations

import pytest

from de4ml_spark.operators.multimodal import (
    MAGIC,
    decode_image,
    extract_meta,
    fake_payload,
)
from de4ml_spark.session import load_table


def test_payload_roundtrip_meta(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    meta = extract_meta(fake_payload(docs)).collect()
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(meta) == 20
    for r in meta:
        expect_len = len(MAGIC) + len(src[r["doc_id"]].encode())
        assert r["byte_len"] == expect_len
        assert r["magic"] == "IMG0"
        assert r["width"] == expect_len % 640
        assert r["height"] == expect_len % 480


def test_meta_schema_is_narrow_typed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    meta = extract_meta(fake_payload(docs))
    assert meta.schema.simpleString() == (
        "struct<doc_id:bigint,byte_len:bigint,magic:string,width:int,height:int>"
    )


def test_decoder_stub_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"IMG0abc")
