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


def test_real_png_decode_all_filters():
    """decode_png handles every scanline filter (None/Sub/Up/Average/
    Paeth) and all supported channel layouts; encode->decode is
    bit-exact; unsupported shapes fail loudly."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from lucene_solr_spark.datapipe.multimodal import (
        decode_png,
        make_png,
    )

    rng = np.random.default_rng(11)
    for shape in [(5, 7), (4, 3, 3), (6, 2, 4)]:
        arr = rng.integers(0, 256, size=shape).astype(np.uint8)
        assert (decode_png(make_png(arr)) == arr).all()

    # hand-encode with filters 1..4 over a known gradient
    arr = np.add.outer(
        np.arange(6, dtype=np.uint8) * 3, np.arange(10, dtype=np.uint8)
    ).astype(np.uint8)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    def enc(filters):
        rows = []
        prev = np.zeros(10, dtype=np.uint8)
        for y, f in enumerate(filters):
            line = arr[y]
            if f == 0:
                enc_line = line
            elif f == 1:  # Sub (channels=1 -> prev pixel in row)
                enc_line = (line - np.concatenate(([0], line[:-1]))).astype(np.uint8)
            elif f == 2:  # Up
                enc_line = (line - prev).astype(np.uint8)
            elif f == 3:  # Average
                a = np.concatenate(([0], line[:-1])).astype(int)
                enc_line = (line - ((a + prev.astype(int)) >> 1)).astype(np.uint8)
            else:  # Paeth
                out = np.empty(10, dtype=np.uint8)
                for x in range(10):
                    a = int(line[x - 1]) if x else 0
                    b = int(prev[x])
                    c = int(prev[x - 1]) if x else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    out[x] = (int(line[x]) - pr) & 0xFF
                enc_line = out
            rows.append(bytes([f]) + enc_line.tobytes())
            prev = line
        ihdr = struct.pack(">IIBBBBB", 10, 6, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b"")
        )

    for filters in ([1, 1, 1, 1, 1, 1], [3, 3, 3, 3, 3, 3],
                    [4, 4, 4, 4, 4, 4], [0, 1, 2, 3, 4, 2]):
        assert (decode_png(enc(filters)) == arr).all(), filters

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    # 16-bit depth refused loudly
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad)


def test_image_features_analytic_pins(spark):
    """Per-image features over binary PNG columns: mean of a k x n
    gradient add.outer(4*row, col) is analytic; bad payloads keep
    their error instead of dropping."""
    import numpy as np

    from lucene_solr_spark.datapipe.multimodal import (
        image_features,
        make_png,
    )

    h, w = 8, 16
    arr = np.add.outer(
        np.arange(h, dtype=np.uint8) * 4, np.arange(w, dtype=np.uint8)
    ).astype(np.uint8)
    rows = [(1, bytearray(make_png(arr))), (2, bytearray(b"garbage"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in image_features(df).collect()}
    want_mean = (4 * (h - 1) / 2) + (w - 1) / 2
    assert got[1]["width"] == w and got[1]["height"] == h
    assert abs(got[1]["mean_px"] - want_mean) < 1e-9
    assert got[2]["width"] is None and got[2]["error"]
