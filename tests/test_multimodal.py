"""Multimodal binary-column plumbing: schema contracts, Arrow batch shape,
deterministic fake features, frame-sampling fan-out, stubbed decode."""

import numpy as np
import pytest

from lucene_solr_spark.datapipe.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    fake_feature,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (0, "image", "image/png", b"\x89PNG fake payload 0", 800, 600, None),
        (1, "image", "image/jpeg", b"\xff\xd8 fake payload 1", 120, 80, None),
        (2, "video", "video/mp4", b"\x00mp4 fake payload 2" * 40, 640, 480, 3500),
        (3, "audio", "audio/wav", b"RIFF fake payload 3", None, None, 2000),
        (4, "image", "image/png", None, 10, 10, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(3)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"anything")


def test_fake_feature_deterministic():
    a = fake_feature(b"payload", 8)
    b = fake_feature(b"payload", 8)
    assert (a == b).all() and a.dtype == np.float32 and len(a) == 8
    assert not (a == fake_feature(b"other", 8)).all()


def test_extract_features_schema_and_values(media_df):
    out = extract_features(media_df, dim=8).orderBy("media_id").collect()
    assert [r["media_id"] for r in out] == [0, 1, 2, 3, 4]
    r0 = out[0]
    assert r0["n_bytes"] == len(b"\x89PNG fake payload 0")
    assert len(r0["feature"]) == 8
    want = fake_feature(b"\x89PNG fake payload 0", 8)
    assert np.allclose(r0["feature"], want)
    # null payload handled
    assert out[4]["n_bytes"] == 0


def test_sample_frames_fanout(media_df):
    frames = sample_frames(media_df, every_ms=1000).orderBy(
        "media_id", "frame_idx"
    ).collect()
    # only the video row (3500ms -> 3 frames)
    assert [r["media_id"] for r in frames] == [2, 2, 2]
    assert [r["ts_ms"] for r in frames] == [0, 1000, 2000]
    assert all(len(r["frame_payload"]) > 0 for r in frames)


def test_resize_images_pure_catalyst(media_df):
    out = {r["media_id"]: r for r in resize_images(media_df, 256).collect()}
    assert set(out) == {0, 1, 4}
    assert (out[0]["target_w"], out[0]["target_h"]) == (256, 192)
    assert (out[1]["target_w"], out[1]["target_h"]) == (120, 80)  # no upscale
