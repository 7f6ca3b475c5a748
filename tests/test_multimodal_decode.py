"""Real byte-level media decoding for codec-free formats: WAV PCM,
binary PPM, BMP — synthesized payloads, exact expected metadata."""

from __future__ import annotations

import math
import struct

import pytest

from renard_spark.functions.multimodal import (
    decode_media_bytes,
    decode_payload,
    parse_bmp,
    parse_ppm,
    parse_wav,
)


def make_wav(rate=8000, channels=1, seconds=0.5, freq=440.0) -> bytes:
    n = int(rate * seconds)
    samples = b"".join(
        struct.pack(
            "<h", int(0.25 * 32767 * math.sin(2 * math.pi * freq * i / rate))
        ) * channels
        for i in range(n)
    )
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_ppm(width=3, height=2, pixel=(255, 0, 0)) -> bytes:
    return (
        f"P6\n# test image\n{width} {height}\n255\n".encode()
        + bytes(pixel) * (width * height)
    )


def make_bmp(width=4, height=3) -> bytes:
    px = bytes([128, 128, 128]) * (width * height)
    header = (
        b"BM" + struct.pack("<I", 54 + len(px)) + b"\x00\x00\x00\x00"
        + struct.pack("<I", 54)
        + struct.pack("<I", 40)
        + struct.pack("<i", width) + struct.pack("<i", height)
        + struct.pack("<HH", 1, 24) + b"\x00" * 24
    )
    return header + px


def test_parse_wav_exact():
    ch, rate_k, dur, feat = parse_wav(make_wav(rate=8000, seconds=0.5))
    assert (ch, rate_k, dur) == (1, 8, 500)
    assert len(feat) == 8
    # a sine has near-zero mean and rms ≈ amplitude/√2
    assert abs(feat[4]) < 0.01
    assert abs(feat[5] - 0.25 / math.sqrt(2)) < 0.01


def test_parse_ppm_exact():
    w, h, dur, feat = parse_ppm(make_ppm(3, 2, (255, 0, 0)))
    assert (w, h, dur) == (3, 2, 0)
    r, g, b = feat[3:6]
    assert abs(r - 1.0) < 1e-9 and g == 0.0 and b == 0.0


def test_parse_bmp_exact():
    w, h, dur, feat = parse_bmp(make_bmp(4, 3))
    assert (w, h, dur) == (4, 3, 0)
    assert abs(feat[3] - 128 / 255) < 1e-9


def test_codec_seam_strict_raises():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG\r\n", "x.png", "image", strict=True)
    # non-strict falls back to the deterministic fake
    w, h, dur, feat = decode_payload(b"\x89PNG\r\n", "x.png", "image")
    assert w > 0 and len(feat) == 8


def test_decode_media_bytes_spark(spark):
    rows = [
        ("d1", 0, "audio", "a.wav", bytearray(make_wav(seconds=0.25))),
        ("d1", 1, "image", "b.ppm", bytearray(make_ppm(5, 4, (0, 255, 0)))),
        ("d2", 0, "image", "c.bmp", bytearray(make_bmp(7, 7))),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, span_order int, kind string, media_ref string,"
        " payload binary",
    )
    got = {r.media_ref: r for r in decode_media_bytes(df, strict=True).collect()}
    assert (got["a.wav"].width, got["a.wav"].duration_ms) == (1, 250)
    assert (got["b.ppm"].width, got["b.ppm"].height) == (5, 4)
    assert (got["c.bmp"].width, got["c.bmp"].height) == (7, 7)
    assert all(len(r.feature) == 8 for r in got.values())
