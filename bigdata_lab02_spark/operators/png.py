"""Minimal pure-stdlib PNG codec (RFC 2083) for the multimodal pipeline.

The container has no PIL/ffmpeg, but PNG's baseline profile needs only
``zlib`` + ``struct``: chunked container, zlib-compressed scanlines, five
per-row byte filters. This module implements exactly that profile —

- encode: 8-bit grayscale (color type 0), RGB (2), RGBA (6), filter 0 rows;
- decode: the same color types, all five filters (None/Sub/Up/Average/
  Paeth), non-interlaced.

Scope is deliberately small (no palette, no 16-bit, no Adam7) — enough for
real byte-level decode coverage of the Spark-side media plumbing in
``multimodal.py``. Anything outside the profile raises ``PngError``, which
the pipeline maps to ``decode_ok=False`` (the honest-failure path).

Public-knowledge provenance: PNG spec (RFC 2083 / ISO 15948); the Paeth
predictor is reproduced from the spec's pseudocode.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# channels per pixel, by PNG color type (8-bit only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


class PngError(ValueError):
    """Payload is not a PNG this codec's profile supports."""


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 2) -> bytes:
    """Encode raw 8-bit pixel bytes (row-major, ``width*height*channels``)
    as a valid PNG. Filter byte 0 per row — valid output, zero cleverness."""
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise PngError(f"unsupported color type {color_type}")
    if len(pixels) != width * height * ch:
        raise PngError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * ch}"
        )
    stride = width * ch
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    # RFC 2083 §6.6: predictor = whichever of left/up/up-left is closest
    # to a+b-c, ties broken left, up, up-left.
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline PNG → ``(width, height, channels, pixels)`` with
    8-bit row-major pixel bytes. Raises ``PngError`` for non-PNG bytes or
    anything outside the supported profile."""
    if not data or not data.startswith(_SIGNATURE):
        raise PngError("bad signature")
    pos = len(_SIGNATURE)
    width = height = channels = -1
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        pos += 12 + length  # len + tag + body + crc
        if tag == b"IHDR":
            # IHDR body is exactly 13 bytes (RFC 2083 §4.1.1); a malformed
            # length would otherwise escape as struct.error, bypassing the
            # decode_ok=False honest-failure path in _decode_image_batch.
            if len(body) != 13:
                raise PngError(f"IHDR length {len(body)} != 13")
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype not in _CHANNELS:
                raise PngError(f"unsupported depth/color {depth}/{ctype}")
            if interlace != 0:
                raise PngError("interlaced PNG not supported")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width < 0 or not idat:
        raise PngError("missing IHDR/IDAT")
    # Bound allocations BEFORE inflating: header-declared dimensions are
    # attacker-controlled, and zlib.decompress with no cap is a zip bomb —
    # inflate at most the expected scanline bytes (+1 to detect overrun).
    if width <= 0 or height <= 0 or width * height * channels > (1 << 26):
        raise PngError("unreasonable dimensions")
    stride = width * channels
    expected = (stride + 1) * height
    try:
        raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise PngError(f"corrupt IDAT: {exc}") from exc
    if len(raw) != expected:
        raise PngError("scanline size mismatch")

    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise PngError(f"bad filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)


def features_from_pixels(
    width: int, height: int, channels: int, pixels: bytes, n_bins: int = 8
) -> list[float]:
    """Deterministic feature vector from decoded pixels:
    ``[width, height, channels, mean/255, *histogram]`` where histogram is
    ``n_bins`` normalized intensity-bin frequencies over all channels.
    Format-neutral — the single feature definition every image codec's
    decode output feeds (multimodal's JPEG dispatch uses it too)."""
    n = len(pixels)
    bins = [0] * n_bins
    total = 0
    for b in pixels:
        total += b
        bins[min(b * n_bins // 256, n_bins - 1)] += 1
    return [
        float(width),
        float(height),
        float(channels),
        total / (255.0 * n) if n else 0.0,
    ] + [c / n if n else 0.0 for c in bins]


def png_features(data: bytes, n_bins: int = 8) -> list[float]:
    """Decode + featurize (see ``features_from_pixels``)."""
    return features_from_pixels(*decode_png(data), n_bins=n_bins)
