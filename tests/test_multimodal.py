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


def test_real_wav_decode_features(spark):
    """The audio path is a REAL decoder (stdlib PCM), not a stub:
    RMS of a sine == amp/sqrt(2), zcr == 2*f/sr, duration exact."""
    import math

    import pandas as pd

    from lucene_solr_spark.datapipe.multimodal import (
        audio_features,
        decode_wav,
        make_wav,
    )

    w = make_wav(440.0, duration_sec=0.5, sample_rate=8000, amplitude=0.25)
    sr, ch, x = decode_wav(w)
    assert (sr, ch, len(x)) == (8000, 1, 4000)

    media = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "audio": [w, make_wav(220.0)]})
    )
    rows = {r["doc_id"]: r for r in audio_features(media).collect()}
    r1 = rows[1]
    assert r1["sample_rate"] == 8000 and r1["n_samples"] == 4000
    assert abs(r1["duration_sec"] - 0.5) < 1e-9
    assert abs(r1["rms"] - 0.25 / math.sqrt(2)) < 1e-3
    # sine at f crosses zero 2f times per second
    assert abs(r1["zcr"] - (2 * 440.0 / 8000)) < 5e-3
    assert abs(rows[2]["zcr"] - (2 * 220.0 / 8000)) < 5e-3
