"""Minimal MJPEG-in-AVI container codec (stdlib struct only).

Reference parity: the reference ships no video engine either — its Tika
contrib (solr/contrib/extraction) delegates media parsing to external
libraries. Here the container layer itself is implemented so the video
column path is REAL end-to-end for the one codec this sandbox can decode
(Motion-JPEG: every frame is an independent baseline JPEG, handled by
``datapipe/jpeg.py``). RIFF/AVI is a pure length-prefixed chunk format:

    RIFF <size> 'AVI '
      LIST <size> 'hdrl'
        'avih' <size> <MainAVIHeader: usec/frame, flags, totalframes, w, h>
        LIST <size> 'strl'
          'strh' <size> <AVIStreamHeader: 'vids'/'MJPG', scale/rate, length>
          'strf' <size> <BITMAPINFOHEADER: w, h, 'MJPG'>
      LIST <size> 'movi'
        '00dc' <size> <jpeg bytes>   (one per frame)
      'idx1' <size> <AVIOLDINDEX entries>

Everything is little-endian; chunks pad to even byte boundaries.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, make_jpeg


def _chunk(tag: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return tag + struct.pack("<I", len(data)) + data + pad


def _list(kind: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", kind + data)


def make_avi(
    frames: list[np.ndarray],
    fps: int = 10,
    quality: int = 90,
) -> bytes:
    """Encode uint8 frames (all same (h, w[, 3]) shape) to an MJPEG AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    payloads = [make_jpeg(f, quality=quality) for f in frames]

    usec_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, 0, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, len(frames),  # scale=1, rate=fps
        max(len(p) for p in payloads), 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    offsets = []
    for p in payloads:
        offsets.append(len(movi_body))  # offset of the '00dc' tag from 'movi'
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", movi_body)

    idx = b"".join(
        struct.pack("<4sIII", b"00dc", 0x10, off, len(p))  # AVIIF_KEYFRAME
        for off, p in zip(offsets, payloads)
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse an MJPEG AVI -> (fps, width, height, [frame jpeg bytes]).

    Walks the chunk tree by lengths (never scans for magic inside frame
    data); tolerates missing idx1 by collecting '..dc'/'..db' chunks in
    stream order from 'movi'."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI signature)")
    fps, w, h = 0, 0, 0
    frames: list[bytes] = []

    def walk(data: bytes, pos: int, end: int) -> None:
        nonlocal fps, w, h
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if tag == b"LIST":
                walk(data, body_start + 4, body_end)
            elif tag == b"avih":
                vals = struct.unpack_from("<IIIIIIIIII", data, body_start)
                if vals[0]:
                    fps = round(1_000_000 / vals[0])
                w, h = vals[8], vals[9]
            elif tag == b"strh":
                fcc, codec = data[body_start : body_start + 4], data[
                    body_start + 4 : body_start + 8
                ]
                if fcc == b"vids" and codec not in (b"MJPG", b"mjpg"):
                    raise ValueError(
                        f"unsupported video codec {codec!r} (MJPG only)"
                    )
                if fcc == b"vids":
                    scale, rate = struct.unpack_from(
                        "<II", data, body_start + 20
                    )
                    if scale:
                        fps = round(rate / scale)
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                frames.append(data[body_start:body_end])
            pos = body_end + (body_end & 1)

    walk(payload, 12, 8 + struct.unpack("<I", payload[4:8])[0])
    if not frames:
        raise ValueError("no video frames in AVI")
    return max(fps, 1), w, h, frames


def decode_avi_frame(payload: bytes, idx: int) -> np.ndarray:
    """Decode frame ``idx`` of an MJPEG AVI to a pixel array."""
    _, _, _, frames = parse_avi(payload)
    return decode_jpeg(frames[idx])
