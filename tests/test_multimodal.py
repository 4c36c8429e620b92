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


def test_frame_sample_plan_is_metadata_only(spark):
    import pyspark.sql.functions as F

    media = spark.createDataFrame(
        [("v1", 10.0, 30.0), ("v2", 0.5, 24.0), ("v3", 100.0, 25.0)],
        "media_ref string, duration_s double, fps double",
    )
    from docling_api_spark.operators.multimodal import frame_sample_plan

    plan = frame_sample_plan(media, every_s=1.0, max_frames=32)
    rows = plan.collect()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append(r)
    assert len(by_ref["v1"]) == 11       # 0..10s inclusive
    assert len(by_ref["v2"]) == 1        # shorter than step → 1 frame
    assert len(by_ref["v3"]) == 32       # capped
    for r in by_ref["v1"]:
        assert 0 <= r.source_frame <= 10 * 30
    assert "payload" not in plan.columns


def test_sample_frames_stub(spark):
    from docling_api_spark.operators.multimodal import (
        fake_image_bytes,
        sample_frames,
    )

    media = spark.createDataFrame(
        [
            ("v1", fake_image_bytes(8, 8, "v1"), 3.0),
            ("bad", b"not media", 5.0),
        ],
        "media_ref string, payload binary, duration_s double",
    )
    frames = sample_frames(media, every_s=1.0).collect()
    good = [f for f in frames if f.media_ref == "v1"]
    bad = [f for f in frames if f.media_ref == "bad"]
    assert len(good) == 4 and all(f.ok for f in good)
    assert [f.frame_index for f in sorted(good, key=lambda f: f.frame_index)] == [0, 1, 2, 3]
    assert len(bad) == 1 and not bad[0].ok


def test_real_video_codec_gated(spark):
    from docling_api_spark.operators.multimodal import sample_frames

    media = spark.createDataFrame(
        [("v", b"", 1.0)], "media_ref string, payload binary, duration_s double"
    )
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_frames(media, codec="h264")
