"""Norm quantization fixtures (FIXTURES.md §3): bit-exact SmallFloat
floatToByte315 / byte315ToFloat replication, all 256 bytes round-tripped."""

import numpy as np

from lucene_solr_spark.index.norms import (
    NORM_TABLE,
    byte315_to_float,
    decode_norm_to_dl,
    encode_norm,
    float_to_byte315,
)


def test_byte315_known_values():
    # SmallFloat.java:76-78 javadoc: smallest non-zero = 5.820766E-10,
    # largest = 7.5161928E9
    assert byte315_to_float(np.array([0]))[0] == 0.0
    assert np.isclose(byte315_to_float(np.array([1]))[0], 5.820766e-10)
    assert np.isclose(byte315_to_float(np.array([255]))[0], 7.5161928e9)


def test_roundtrip_all_256():
    # encode(decode(b)) == b for all bytes except 0-ambiguity
    bytes_ = np.arange(1, 256)
    f = byte315_to_float(bytes_)
    again = float_to_byte315(f)
    assert (again == bytes_).all()


def test_encode_truncates_down():
    # values are truncated (rounded down) to the nearest representable
    b = float_to_byte315(np.array([1.0], dtype=np.float32))
    f = byte315_to_float(b)
    assert f[0] <= 1.0
    b2 = float_to_byte315(np.array([f[0] * 1.01], dtype=np.float32))
    assert b2[0] == b[0]


def test_special_cases():
    assert float_to_byte315(np.array([0.0], dtype=np.float32))[0] == 0
    assert float_to_byte315(np.array([-1.0], dtype=np.float32))[0] == 0
    assert float_to_byte315(np.array([1e-12], dtype=np.float32))[0] == 1
    assert float_to_byte315(np.array([1e12], dtype=np.float32))[0] == 255
    assert float_to_byte315(np.array([np.inf], dtype=np.float32))[0] == 255


def test_encode_norm_dl_values():
    # dl -> floatToByte315(1/sqrt(dl)); spot values must be stable
    dls = np.array([1, 2, 3, 4, 10, 16, 25, 50, 63, 64, 100, 255, 1000, 10000])
    bytes_ = encode_norm(dls)
    # dl=1 -> 1/sqrt(1)=1.0; dl=4 -> 0.5; dl=16 -> 0.25
    assert bytes_[0] == float_to_byte315(np.array([1.0], dtype=np.float32))[0]
    assert bytes_[3] == float_to_byte315(np.array([0.5], dtype=np.float32))[0]
    # monotone non-increasing byte with growing dl
    assert (np.diff(bytes_.astype(int)) <= 0).all()
    # decode(encode(dl)) is within one quantization step: f truncates down
    # by <= 12.5% (3-bit mantissa), so 1/f^2 overshoots by <= ~30.6%
    qdl = decode_norm_to_dl(bytes_)
    rel = (qdl - dls) / dls
    assert (rel >= -1e-7).all() and (rel < 0.35).all()


def test_norm_table_shape():
    assert NORM_TABLE.shape == (256,)
    assert NORM_TABLE.dtype == np.float32
    assert np.isinf(NORM_TABLE[0])  # 1/0^2; never scored (dl=0 docs have no postings)
    assert np.isclose(NORM_TABLE[float_to_byte315(np.array([1.0], dtype=np.float32))[0]], 1.0)
