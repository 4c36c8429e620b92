"""Multimodal plumbing tests: binary payload schema, Arrow batch
shape through mapInPandas, stubbed decode determinism, JVM-side
resize planning, and the NotImplementedError gate for real codecs."""

from __future__ import annotations

import numpy as np
import pytest

from docling_api_spark.operators.multimodal import (
    decode_features,
    decode_header,
    fake_image_bytes,
    media_features,
    resize_plan,
    synthesize_media_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_fake_roundtrip():
    b = fake_image_bytes(120, 80, "docX/m0")
    assert decode_header(b) == (120, 80)
    assert decode_header(b"not an image") is None
    assert decode_header(b"") is None


def test_fake_deterministic():
    assert fake_image_bytes(10, 10, "s") == fake_image_bytes(10, 10, "s")
    assert fake_image_bytes(10, 10, "s") != fake_image_bytes(10, 10, "t")


def test_features_shape_and_determinism():
    b = fake_image_bytes(32, 32, "z")
    f1 = decode_features(b, dim=16)
    f2 = decode_features(b, dim=16)
    assert f1.shape == (16,)
    assert f1.dtype == np.float32
    np.testing.assert_array_equal(f1, f2)
    assert decode_features(b"garbage", dim=16) is None


def test_real_codec_gated():
    with pytest.raises(NotImplementedError, match="codec 'png'"):
        decode_header(b"\x89PNG", codec="png")


def test_media_table_and_features_spark(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    media = synthesize_media_table(docs, per_doc=2)
    rows = media.collect()
    assert len(rows) == 40
    assert all(r.media_ref.endswith(("m0", "m1")) for r in rows)
    assert all(isinstance(r.payload, (bytes, bytearray)) for r in rows)

    feats = media_features(media, dim=8).collect()
    assert len(feats) == 40
    assert all(f.ok for f in feats)
    by_ref = {f.media_ref: f for f in feats}
    m = {r.media_ref: r for r in rows}
    # decoded dims come from the payload and match the metadata columns
    for ref, f in by_ref.items():
        assert (f.width, f.height) == (m[ref].width, m[ref].height)
        assert len(f.feature) == 8


def test_resize_plan_jvm_side(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(5)
    media = synthesize_media_table(docs)
    plan = resize_plan(media, max_side=64)
    for r in plan.collect():
        assert max(r.target_w, r.target_h) <= 64 or r.scale == 1.0
        if r.scale < 1.0:
            assert max(r.target_w, r.target_h) == 64
    # the plan must not touch the payload column (metadata-only stage)
    assert "payload" not in plan.columns
