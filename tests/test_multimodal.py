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


def test_resize_binary_in_binary_out(spark, sf_dir):
    from de4ml_spark.operators.multimodal import MAGIC, fake_payload, resize_images
    from de4ml_spark.session import load_table

    docs = fake_payload(load_table(spark, sf_dir, "documents").limit(20))
    out = resize_images(docs, target_w=8, target_h=4).collect()
    assert len(out) == 20
    for r in out:
        assert r["byte_len"] == len(MAGIC) + 8 * 4
        assert bytes(r["payload"][:4]) == MAGIC


def test_frame_sampling_one_to_many(spark, sf_dir):
    from de4ml_spark.operators.multimodal import fake_payload, sample_frames
    from de4ml_spark.session import load_table

    docs = fake_payload(load_table(spark, sf_dir, "documents").limit(5))
    frames = sample_frames(docs, frame_bytes=8, every_n=2).collect()
    assert frames, "expected exploded frame rows"
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
        assert len(r["frame"]) == 8
    for idxs in by_doc.values():
        assert idxs == sorted(idxs) and all(i % 2 == 0 for i in idxs)


def test_feature_extraction_ann_compatible(spark, sf_dir):
    from de4ml_spark.operators.multimodal import extract_features, fake_payload
    from de4ml_spark.session import load_table

    docs = fake_payload(load_table(spark, sf_dir, "documents").limit(10))
    feats = extract_features(docs, dim=16)
    assert dict(feats.dtypes)["feature"] == "array<float>"
    rows = feats.collect()
    assert all(len(r["feature"]) == 16 for r in rows)
    # deterministic: same input -> same vector
    again = {r["doc_id"]: r["feature"] for r in extract_features(docs, dim=16).collect()}
    for r in rows:
        assert again[r["doc_id"]] == r["feature"]
