"""Byte-level codec pins (multimodal/codecs.py).

The catalog oracle (plans/multimodal_queries.py) proves the
encode→decode ROUND-TRIP agrees with the pixel formula, but a
symmetric error (encoder and decoder both top-down, say) would cancel
out there. These tests pin each side against hand-built golden bytes
from the BMP/WAV specifications, so the files we emit are files any
other tool would read.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from big_data_analysis_of_airline_data_set_spark.multimodal.codecs import (
    decode_bmp,
    decode_wav_pcm16,
    encode_bmp,
    encode_wav_pcm16,
    resize_nearest,
)


def _golden_bmp_2x2() -> bytes:
    """Hand-assembled 2x2 24-bit BMP per the Windows BITMAPINFOHEADER
    spec: bottom-up rows, BGR byte order, rows padded to 4 bytes
    (2 px · 3 B = 6 B → 2 pad bytes). Image (row 0 = TOP):
        (255,0,0) red    (0,255,0) green
        (0,0,255) blue   (255,255,255) white
    """
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + 16, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 2835, 2835, 0, 0)
    bottom_row = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"  # blue, white (BGR)
    top_row = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"  # red, green (BGR)
    return header + info + bottom_row + top_row  # bottom-up: bottom first


EXPECTED_2X2 = np.array(
    [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
)


def test_decode_bmp_matches_spec_golden_bytes():
    assert np.array_equal(decode_bmp(_golden_bmp_2x2()), EXPECTED_2X2)


def test_encode_bmp_emits_spec_bytes():
    assert encode_bmp(EXPECTED_2X2) == _golden_bmp_2x2()


def test_bmp_roundtrip_odd_width_padding():
    # widths 1..8 sweep every 4-byte padding residue
    for w in range(1, 9):
        px = (np.arange(3 * w * 3) % 251).astype(np.uint8).reshape(3, w, 3)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_decode_bmp_top_down_negative_height():
    blob = bytearray(encode_bmp(EXPECTED_2X2))
    # flip height sign and swap the two rows: same logical image
    struct.pack_into("<i", blob, 14 + 8, -2)
    row0 = bytes(blob[54:62])
    blob[54:62] = blob[62:70]
    blob[62:70] = row0
    assert np.array_equal(decode_bmp(bytes(blob)), EXPECTED_2X2)


def test_decode_bmp_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PNG_not_bmp_____" * 10)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(EXPECTED_2X2)[:-4])


def _golden_wav() -> bytes:
    """Hand-assembled RIFF/WAVE PCM16 mono, 3 samples [0, 1000, -2]
    at 8000 Hz, with a LIST chunk the walker must skip."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = struct.pack("<3h", 0, 1000, -2)
    chunks = (
        b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE") + chunks


def test_decode_wav_matches_spec_golden_bytes():
    samples, rate = decode_wav_pcm16(_golden_wav())
    assert rate == 8000
    assert samples.tolist() == [0, 1000, -2]


def test_wav_roundtrip():
    s = np.array([0, 1, -1, 32767, -32768, 123], dtype=np.int16)
    out, rate = decode_wav_pcm16(encode_wav_pcm16(s, sample_rate=44100))
    assert rate == 44100
    assert np.array_equal(out, s)


def test_wav_rejects_stereo():
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    blob = (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt), b"WAVE")
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    with pytest.raises(ValueError, match="mono"):
        decode_wav_pcm16(blob)


def test_resize_nearest_floor_mapping():
    px = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(8, 6, 3)
    out = resize_nearest(px, 3, 4)
    assert out.shape == (4, 3, 3)
    for i in range(4):
        for j in range(3):
            assert np.array_equal(out[i, j], px[(i * 8) // 4, (j * 6) // 3])


# ------------------------- property tests (hypothesis) -------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=512),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    out, got_rate = decode_wav_pcm16(encode_wav_pcm16(s, sample_rate=rate))
    assert got_rate == rate
    assert np.array_equal(out, s)
