"""Real-codec path: stdlib PNG/WAV/FSEQ decode through the multimodal
operators (VERDICT r5 item 6 — codecs decode real fixtures, the
digest fake stays as the oracle path)."""

from __future__ import annotations

import math
import struct
import zlib

import pytest

from clickhouse_k_means_spark.functions.codecs import (
    decode_frame_seq,
    decode_png,
    decode_wav,
    encode_frame_seq,
    encode_png,
    encode_wav,
)
from clickhouse_k_means_spark.operators.multimodal import (
    decode_payload,
    extract_features,
    sample_frames,
)


def _rgb_png(w=4, h=3) -> tuple[bytes, bytes]:
    pixels = bytes(
        (x * 37 + y * 11 + c * 5) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    return encode_png(w, h, 3, pixels), pixels


def test_png_roundtrip_filter0():
    data, pixels = _rgb_png()
    w, h, ch, got = decode_png(data)
    assert (w, h, ch) == (4, 3, 3)
    assert got == pixels


def test_png_decodes_all_filter_types():
    """Hand-build a 3x3 gray PNG using one scanline per filter type
    (Sub, Up, Paeth) and check exact unfiltered values."""
    width = height = 3
    rows = [[10, 20, 30], [15, 25, 35], [20, 30, 40]]
    raw = bytearray()
    # row 0: Sub — stored[i] = cur[i] - cur[i-1]
    raw += bytes([1, 10, 10, 10])
    # row 1: Up — stored[i] = cur[i] - above[i]
    raw += bytes([2, 5, 5, 5])
    # row 2: Paeth — predictor of (left, up, upleft)
    prev = rows[1]
    cur = rows[2]
    line = [4]
    for i in range(3):
        left = cur[i - 1] if i else 0
        up = prev[i]
        ul = prev[i - 1] if i else 0
        p = left + up - ul
        pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
        pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
        line.append((cur[i] - pred) & 0xFF)
    raw += bytes(line)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    w, h, ch, got = decode_png(data)
    assert (w, h, ch) == (3, 3, 1)
    assert list(got) == [v for row in rows for v in row]


def test_wav_roundtrip():
    samples = [0, 1000, -1000, 32767, -32768, 5]
    data = encode_wav(8000, 1, samples)
    rate, nch, got = decode_wav(data)
    assert (rate, nch) == (8000, 1)
    assert got == samples


def test_frame_seq_roundtrip():
    f1, _ = _rgb_png(2, 2)
    f2, _ = _rgb_png(3, 1)
    seq = encode_frame_seq([f1, f2])
    assert decode_frame_seq(seq) == [f1, f2]


def test_decode_payload_sniffs_and_rejects():
    png, pixels = _rgb_png()
    assert decode_payload(png, "image") == (4, 3, 3, pixels)
    wav = encode_wav(16000, 2, [1, -1, 2, -2])
    assert decode_payload(wav, "audio") == (16000, 2, [1, -1, 2, -2])
    with pytest.raises(NotImplementedError, match="unsupported"):
        decode_payload(b"\xff\xd8\xff\xe0 jpeg-ish", "image")
    # the fake path still exists for the oracle
    assert len(decode_payload(b"anything", "image", deterministic_fake=True)) == 16


def test_extract_features_real_png_and_wav(spark):
    png, pixels = _rgb_png()
    wav = encode_wav(16000, 1, [0, 16384, -16384, 0])
    df = spark.createDataFrame(
        [(1, "image", bytearray(png), None), (2, "audio", bytearray(wav), None)],
        "id bigint, modality string, payload binary, meta map<string,string>",
    )
    out = {
        r.id: r.features
        for r in extract_features(df, dim=8, deterministic_fake=False).collect()
    }
    img = out[1]
    assert img[0] == pytest.approx(4 / 1024) and img[1] == pytest.approx(3 / 1024)
    assert img[3] == pytest.approx(sum(pixels) / len(pixels) / 255.0)
    aud = out[2]
    assert aud[0] == pytest.approx(16000 / 48000)
    assert aud[3] == pytest.approx(math.sqrt((0 + 0.5**2 + 0.5**2 + 0) / 4))
    assert aud[4] == pytest.approx(0.5)


def test_sample_frames_real_fseq(spark):
    frames = [_rgb_png(2 + i, 2)[0] for i in range(8)]
    seq = encode_frame_seq(frames)
    df = spark.createDataFrame(
        [(7, "video", bytearray(seq), None)],
        "id bigint, modality string, payload binary, meta map<string,string>",
    )
    got = sorted(
        (r.frame_idx, bytes(r.frame))
        for r in sample_frames(
            df, every_n=3, n_frames=3, deterministic_fake=False
        ).collect()
    )
    assert got == [(0, frames[0]), (3, frames[3]), (6, frames[6])]
