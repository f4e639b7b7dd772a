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
    decode_png,
    decode_wav_pcm16,
    encode_bmp,
    encode_png,
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


# --------------------------------- PNG ---------------------------------

import zlib


def _png_raw(w: int, h: int, scanlines: bytes) -> bytes:
    """Assemble a PNG from already-filtered scanlines — a second,
    independent writer so decode_png is pinned against the RFC 2083
    byte layout, not against our own encoder."""

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def test_decode_png_golden_unfiltered():
    # 2x2, filter 0 rows: RGB values written literally
    scan = (
        b"\x00" + bytes([255, 0, 0, 0, 255, 0])
        + b"\x00" + bytes([0, 0, 255, 255, 255, 255])
    )
    assert np.array_equal(decode_png(_png_raw(2, 2, scan)), EXPECTED_2X2)


def test_decode_png_each_filter_hand_computed():
    # one 3-pixel row per filter over a known base; recon computed by
    # hand per RFC 2083 §6.3-6.6
    # row0 Sub:  filt = [10,20,30, 5,5,5, 1,1,1]
    #   recon = [10,20,30, 15,25,35, 16,26,36]
    # row1 Up:   filt = [1,1,1, 2,2,2, 3,3,3] over row0
    #   recon = [11,21,31, 17,27,37, 19,29,39]
    # row2 Average: filt = [4,4,4, 6,6,6, 8,8,8]
    #   px0: 4 + (0+11)//2 = 9, 4+(0+21)//2=14, 4+(0+31)//2=19
    #   px1: 6 + (9+17)//2 = 19, 6+(14+27)//2=26, 6+(19+37)//2=34
    #   px2: 8 + (19+19)//2 = 27, 8+(26+29)//2=35, 8+(34+39)//2=44
    # row3 Paeth: filt = [1,1,1, 1,1,1, 1,1,1]
    #   px0: left=0 up=9/14/19 upleft=0 → p=up → pred=up (pb<=pc,pa>pb)
    #        recon = 10,15,20
    #   px1: a=10 b=19 c=9 → p=20: pa=10 pb=1 pc=11 → b → 20
    #        (14,26,9? compute channel-wise below)
    scan = (
        b"\x01" + bytes([10, 20, 30, 5, 5, 5, 1, 1, 1])
        + b"\x02" + bytes([1, 1, 1, 2, 2, 2, 3, 3, 3])
        + b"\x03" + bytes([4, 4, 4, 6, 6, 6, 8, 8, 8])
        + b"\x04" + bytes([1, 1, 1, 1, 1, 1, 1, 1, 1])
    )
    out = decode_png(_png_raw(3, 4, scan)).astype(int)
    assert out[0].tolist() == [[10, 20, 30], [15, 25, 35], [16, 26, 36]]
    assert out[1].tolist() == [[11, 21, 31], [17, 27, 37], [19, 29, 39]]
    assert out[2].tolist() == [[9, 14, 19], [19, 26, 34], [27, 35, 44]]

    # row3 Paeth, channel-wise reference implementation:
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    prev = out[2]
    expect = []
    left = [0, 0, 0]
    upleft = [0, 0, 0]
    for c in range(3):
        px = [(1 + paeth(left[k], int(prev[c][k]), upleft[k])) % 256 for k in range(3)]
        expect.append(px)
        left, upleft = px, [int(v) for v in prev[c]]
    assert out[3].tolist() == expect


def test_png_roundtrip_exercises_all_filters():
    # h=6 → encoder rows use filters 0,1,2,3,4,0
    px = (np.arange(6 * 5 * 3) * 7 % 256).astype(np.uint8).reshape(6, 5, 3)
    blob = encode_png(px)
    assert blob.count(b"IDAT") == 2  # split-IDAT concatenation exercised
    assert np.array_equal(decode_png(blob), px)


def test_decode_png_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"BM_not_png______" * 10)
    blob = bytearray(encode_png(EXPECTED_2X2))
    blob[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


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
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


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
