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


def test_decode_image_dispatch():
    """decode_image routes on magic bytes: PNG and baseline JPEG decode
    for real; unknown formats raise loudly (never a silent wrong
    answer)."""
    from lucene_solr_spark.datapipe.jpeg import make_jpeg
    from lucene_solr_spark.datapipe.multimodal import make_png

    arr = np.add.outer(
        np.arange(8, dtype=np.uint8) * 8, np.arange(8, dtype=np.uint8)
    ).astype(np.uint8)
    assert (decode_image(make_png(arr)) == arr).all()
    jout = decode_image(make_jpeg(arr, quality=95))
    assert jout.shape == arr.shape
    assert np.abs(jout.astype(float) - arr.astype(float)).mean() < 3.0
    with pytest.raises(ValueError, match="unsupported"):
        decode_image(b"GIF89a not supported")
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"\xff")


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


def test_real_jpeg_roundtrip_variants():
    """Baseline JPEG encode->decode across the decoder's support
    matrix: gray + RGB, 4:4:4 + 4:2:0 subsampling, non-multiple-of-8
    (and of 16, for 420) dimensions, restart markers. Fidelity bounds
    are loose (lossy codec) but catch any block/plane misalignment,
    which shows up as ~50+ mean error, not ~2."""
    import numpy as np

    from lucene_solr_spark.datapipe.jpeg import decode_jpeg, make_jpeg

    y, x = np.mgrid[0:21, 0:35]
    smooth = np.stack(
        [(y * 5) % 256, (x * 3) % 256, ((x + y) * 2) % 256], axis=2
    ).astype(np.uint8)
    gray = ((y * 4 + x) % 256).astype(np.uint8)

    for arr, sub, rst, tol in [
        (smooth, "444", 0, 3.0),
        (smooth, "420", 0, 6.0),   # chroma box-averaged
        (smooth, "444", 2, 3.0),   # DRI + RSTn every 2 MCUs
        (smooth, "420", 1, 6.0),
        (gray, "444", 0, 2.0),
        (gray, "444", 3, 2.0),
    ]:
        payload = make_jpeg(arr, quality=95, subsampling=sub,
                            restart_interval=rst)
        out = decode_jpeg(payload)
        assert out.shape == arr.shape, (sub, rst)
        err = np.abs(out.astype(float) - arr.astype(float)).mean()
        assert err < tol, (sub, rst, err)

    # progressive / non-baseline refused loudly
    import pytest

    p = bytearray(make_jpeg(gray, quality=90))
    sof = p.find(b"\xff\xc0")
    p[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(p))


def test_pixel_grid_feature_analytic():
    """pixel_grid_feature on a constant-valued image is the constant/255
    in every cell, for PNG and JPEG alike."""
    import numpy as np

    from lucene_solr_spark.datapipe.jpeg import make_jpeg
    from lucene_solr_spark.datapipe.multimodal import (
        make_png,
        pixel_grid_feature,
    )

    arr = np.full((16, 16, 3), 128, dtype=np.uint8)
    for payload in (make_png(arr), make_jpeg(arr, quality=95)):
        f = pixel_grid_feature(payload, dim=8)
        assert f.shape == (8,) and f.dtype == np.float32
        assert np.allclose(f, 128 / 255.0, atol=2 / 255.0)


def test_image_features_jpeg_payloads(spark):
    """image_features dispatches PNG and JPEG payloads in the same
    column; JPEG mean tracks the analytic mean within DCT tolerance."""
    import numpy as np

    from lucene_solr_spark.datapipe.jpeg import make_jpeg
    from lucene_solr_spark.datapipe.multimodal import (
        image_features,
        make_png,
    )

    h, w = 8, 16
    arr = np.add.outer(
        np.arange(h, dtype=np.uint8) * 4, np.arange(w, dtype=np.uint8)
    ).astype(np.uint8)
    want_mean = (4 * (h - 1) / 2) + (w - 1) / 2
    rows = [
        (1, bytearray(make_png(arr))),
        (2, bytearray(make_jpeg(arr, quality=95))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in image_features(df).collect()}
    assert abs(got[1]["mean_px"] - want_mean) < 1e-9
    assert got[2]["width"] == w and got[2]["height"] == h
    assert abs(got[2]["mean_px"] - want_mean) < 1.5


def test_avi_container_roundtrip():
    """MJPEG/AVI: encode N frames -> parse fps/dims/frames -> per-frame
    decode matches the source within JPEG tolerance; non-MJPG codecs
    and non-AVI RIFFs are refused loudly."""
    import numpy as np
    import pytest

    from lucene_solr_spark.datapipe.avi import (
        decode_avi_frame,
        make_avi,
        parse_avi,
    )

    y, x = np.mgrid[0:16, 0:24]
    frames = [
        np.stack(
            [(y * 4 + 10 * i) % 256, (x * 3) % 256, ((x + y) * 2) % 256],
            axis=2,
        ).astype(np.uint8)
        for i in range(5)
    ]
    avi = make_avi(frames, fps=10, quality=95)
    fps, w, h, raw = parse_avi(avi)
    assert (fps, w, h, len(raw)) == (10, 24, 16, 5)
    for i in (0, 2, 4):
        out = decode_avi_frame(avi, i)
        err = np.abs(out.astype(float) - frames[i].astype(float)).mean()
        assert err < 3.0, (i, err)

    with pytest.raises(ValueError, match="signature"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    bad = bytearray(avi)
    pos = bad.find(b"MJPG")  # strh codec fourcc
    bad[pos : pos + 4] = b"H264"
    with pytest.raises(ValueError, match="codec"):
        parse_avi(bytes(bad))


def test_sample_frames_real_avi(spark):
    """sample_frames on an MJPEG/AVI payload emits REAL standalone JPEG
    frames (nearest-to-timestamp), decodable by decode_image; opaque
    payloads in the same DataFrame keep the stub slice."""
    import numpy as np

    from lucene_solr_spark.datapipe.avi import make_avi
    from lucene_solr_spark.datapipe.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        sample_frames,
    )

    # 2 fps x 3s  ->  6 frames; frame i is constant-valued 40*i
    frames = [
        np.full((8, 8, 3), 40 * i, dtype=np.uint8) for i in range(6)
    ]
    avi = make_avi(frames, fps=2, quality=95)
    rows = [
        (10, "video", "video/avi", bytearray(avi), 8, 8, 3000),
        (11, "video", "video/mp4", bytearray(b"\x00mp4 opaque" * 8),
         64, 48, 2000),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        (r["media_id"], r["frame_idx"]): bytes(r["frame_payload"])
        for r in sample_frames(df, every_ms=1000).collect()
    }
    # media 10: ts 0/1000/2000 -> source frames 0/2/4 (ts*fps//1000)
    for idx, src in [(0, 0), (1, 2), (2, 4)]:
        img = decode_avi_frame_payload = decode_image(out[(10, idx)])
        assert abs(float(img.mean()) - 40 * src) < 2.0, (idx, src)
    # media 11: stub slices, 16 bytes, not JPEG
    assert len(out[(11, 0)]) <= 16
