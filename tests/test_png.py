"""Unit tests for the vendored pure-stdlib PNG codec (png.py).

Decode is verified two ways: (a) roundtrip through our own encoder, and
(b) against an INDEPENDENTLY hand-built PNG exercising every row filter
type (None/Sub/Up/Average/Paeth) — so the decoder is not just inverting
the encoder's filter-0 choice.
"""

import struct
import zlib

import pytest

from bigdata_lab02_spark.operators.png import (
    PngError,
    decode_png,
    encode_png,
    png_features,
)

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag, body):
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


@pytest.mark.parametrize("color_type,channels", [(0, 1), (2, 3), (6, 4)])
def test_roundtrip(color_type, channels):
    w, h = 13, 7
    px = bytes((i * 31 + color_type) % 256 for i in range(w * h * channels))
    out = decode_png(encode_png(w, h, px, color_type))
    assert out == (w, h, channels, px)


def test_decode_all_filter_types():
    """Hand-encode one PNG whose rows cycle through filters 0..4 and assert
    the decoder recovers the original pixels."""
    w, h, ch = 5, 5, 3
    stride = w * ch
    px = bytes((i * 7) % 256 for i in range(w * h * ch))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    rows, prev = [], bytes(stride)
    for y in range(h):
        line = px[y * stride : (y + 1) * stride]
        f = y % 5
        enc = bytearray(line)
        if f == 1:
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (enc[i] - line[i - ch]) & 0xFF
        elif f == 2:
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                enc[i] = (enc[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                enc[i] = (enc[i] - paeth(left, prev[i], ul)) & 0xFF
        rows.append(bytes([f]) + bytes(enc))
        prev = line

    data = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(data) == (w, h, 3, px)


def test_features_shape():
    f = png_features(encode_png(4, 4, bytes(range(48)), 2))
    assert f[:3] == [4.0, 4.0, 3.0]
    assert 0.0 <= f[3] <= 1.0
    assert len(f) == 12 and abs(sum(f[4:]) - 1.0) < 1e-9


@pytest.mark.parametrize(
    "bad",
    [b"", b"nope", _SIG + b"junk", _SIG],
    ids=["empty", "wrong-magic", "bad-chunk", "sig-only"],
)
def test_decode_rejects_garbage(bad):
    with pytest.raises(PngError):
        decode_png(bad)


def test_unsupported_profile_rejected():
    # 16-bit depth is outside the baseline profile we implement
    data = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError):
        decode_png(data)


def test_corrupt_idat_raises_png_error():
    data = encode_png(4, 4, bytes(48), 2)
    # flip bytes inside the IDAT payload (after its 8-byte chunk header)
    idat_at = data.index(b"IDAT") + 4
    corrupted = data[:idat_at] + bytes([data[idat_at] ^ 0xFF]) + data[idat_at + 1 :]
    with pytest.raises(PngError):
        decode_png(corrupted)


def test_bomb_dimensions_rejected_before_inflate():
    # header claims 65535x65535 RGB (~12 GiB of scanlines) with a tiny body
    data = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 65535, 65535, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError):
        decode_png(data)


def test_malformed_ihdr_length_raises_png_error():
    # IHDR declaring a 5-byte body used to escape as struct.error,
    # bypassing the decode_ok=False honest-failure path downstream.
    data = (
        _SIG
        + _chunk(b"IHDR", b"\x00" * 5)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 8))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError):
        decode_png(data)
