"""Norm quantization — bit-exact numpy replication of Lucene's SmallFloat.

References:
  - lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:78-99
    (floatToByte315 / byte315ToFloat: 8-bit float, 3 mantissa bits,
    zero exponent 15, truncating)
  - lucene/core/.../search/similarities/BM25Similarity.java:96-104
    (encodeNormValue = floatToByte315(boost / sqrt(fieldLength)))
  - BM25Similarity.java:128-135 (NORM_TABLE[i] = 1 / byte315ToFloat(i)^2)
"""

from __future__ import annotations

import numpy as np


def float_to_byte315(f: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.floatToByte315 (SmallFloat.java:78-90)."""
    f32 = np.asarray(f, dtype=np.float32)
    bits = f32.view(np.int32)
    smallfloat = bits >> (24 - 3)  # arithmetic shift, like Java
    fzero = (63 - 15) << 3
    out = (smallfloat - fzero).astype(np.int32)
    # underflow: positive values below the smallest representable -> 1;
    # zero and negatives -> 0
    under = smallfloat <= fzero
    out = np.where(under, np.where(bits <= 0, 0, 1), out)
    # overflow -> 255 (Java (byte)-1 viewed unsigned)
    out = np.where(smallfloat >= fzero + 0x100, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.byte315ToFloat (SmallFloat.java:93-99)."""
    b = np.asarray(b, dtype=np.int64) & 0xFF
    bits = (b << (24 - 3)) + ((63 - 15) << 24)
    out = bits.astype(np.int32).view(np.float32).copy()
    out[b == 0] = 0.0
    return out


# NORM_TABLE[i] = 1 / f^2 where f = byte315ToFloat(i)
# (BM25Similarity.java:128-135). NORM_TABLE[0] = +inf in float math; Lucene
# never hits it for scoring because a doc with norm byte 0 has no indexed
# terms (dl=0) and thus never appears in any posting list.
_f = byte315_to_float(np.arange(256))
with np.errstate(divide="ignore"):
    NORM_TABLE: np.ndarray = (
        np.float32(1.0) / (_f * _f)
    ).astype(np.float32)
del _f


def encode_norm(dl: np.ndarray, boost: float = 1.0) -> np.ndarray:
    """encodeNormValue(boost, fieldLength) -> norm byte
    (BM25Similarity.java:96-98). dl=0 encodes boost/sqrt(0)=inf -> 255,
    matching Java where 1f/sqrt(0)= Infinity and floatToByte315 overflows.
    """
    dl = np.asarray(dl, dtype=np.int64)
    with np.errstate(divide="ignore"):
        f = np.float32(boost) / np.sqrt(dl.astype(np.float32))
    return float_to_byte315(f)


def decode_norm_to_dl(norm_byte: np.ndarray) -> np.ndarray:
    """Quantized document length: NORM_TABLE[b] (BM25Similarity decode)."""
    return NORM_TABLE[np.asarray(norm_byte, dtype=np.int64) & 0xFF]
