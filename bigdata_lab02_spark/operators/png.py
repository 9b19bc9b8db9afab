"""Minimal pure-stdlib PNG codec (RFC 2083) for the multimodal pipeline.

The container has no PIL/ffmpeg, but PNG's baseline profile needs only
``zlib`` + ``struct``: chunked container, zlib-compressed scanlines, five
per-row byte filters. This module implements exactly that profile —

- encode: grayscale (color type 0), RGB (2), GRAY+ALPHA (4), RGBA (6)
  at 8- OR 16-bit sample depth, PALETTE (color type 3, bit depths
  1/2/4/8, optional tRNS alpha), tRNS transparent-color keys on types
  0/2, filter 0 rows, non-interlaced or ADAM7 interlaced;
- decode: the same color types, all five filters (None/Sub/Up/Average/
  Paeth), sub-byte palette index unpacking, tRNS palette alpha
  (palette output decodes to RGB, or RGBA when tRNS is present), tRNS
  color keys on gray/RGB (output gains an alpha channel: 0 where the
  FULL-PRECISION sample tuple equals the key, else 255), 16-bit
  samples (filters run over the raw 2-byte-per-sample scanlines per
  RFC 2083 §6.2 — bpp doubles — and output samples reduce to their
  HIGH byte, the standard 8-bit presentation; key comparison happens
  BEFORE reduction so transparency is never approximated), and Adam7
  interlacing (7 filtered sub-image passes recomposed). r7 added
  palette+Adam7; r8 added 16-bit and non-palette tRNS (VERDICT r7
  item 7 — the two raise-paths a real crawl hits most).

With gray+alpha added in r8, every color type the spec defines decodes
at its common depths. Remaining scope limits: no tRNS on alpha-bearing
types (the spec forbids it), no 1/2/4-bit GRAYSCALE (palette covers the
sub-byte profile real files use). Anything outside the profile raises
``PngError``, which the pipeline maps to ``decode_ok=False`` (the
honest-failure path).

Public-knowledge provenance: PNG spec (RFC 2083 / ISO 15948); the Paeth
predictor and the Adam7 pass grid are reproduced from the spec.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# channels per pixel, by PNG color type (8-bit only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    """Payload is not a PNG this codec's profile supports."""


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


# Adam7 pass grid: (x offset, y offset, x step, y step) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _pass_dims(w: int, h: int, x0: int, y0: int, dx: int, dy: int) -> tuple[int, int]:
    return max(0, -(-(w - x0) // dx)), max(0, -(-(h - y0) // dy))


def _pack_row(indices: bytes, depth: int) -> bytes:
    """Pack palette indices MSB-first at ``depth`` bits per sample."""
    if depth == 8:
        return bytes(indices)
    per = 8 // depth
    out = bytearray()
    for i in range(0, len(indices), per):
        b = 0
        group = indices[i : i + per]
        for k, v in enumerate(group):
            b |= (v & ((1 << depth) - 1)) << (8 - (k + 1) * depth)
        out.append(b)
    return bytes(out)


def _unpack_row(row: bytes, width: int, depth: int) -> bytes:
    """Unpack ``width`` MSB-first palette indices at ``depth`` bits."""
    if depth == 8:
        return row[:width]
    per = 8 // depth
    mask = (1 << depth) - 1
    out = bytearray()
    for b in row:
        for k in range(per):
            out.append((b >> (8 - (k + 1) * depth)) & mask)
            if len(out) == width:
                return bytes(out)
    if len(out) < width:
        raise PngError("palette scanline shorter than width")
    return bytes(out)


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    palette: list[tuple[int, int, int]] | None = None,
    bit_depth: int = 8,
    trns: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode raw pixel bytes as a valid PNG. Filter byte 0 per row —
    valid output, zero cleverness. Color types 0/2/4/6 take 8-bit samples
    (``width*height*channels`` bytes) or, at ``bit_depth=16``, 2-byte
    big-endian samples (twice that); color type 3 takes one palette
    INDEX byte per pixel plus ``palette`` (≤256 RGB tuples), packed at
    ``bit_depth`` ∈ {1,2,4,8} bits. ``trns`` is per-palette-entry alpha
    for type 3, or a transparent-color KEY for types 0/2 (1 or 3 sample
    values, each in 0..2^bit_depth−1 — written 2 bytes each per the
    spec). ``interlace=True`` writes the Adam7 pass layout."""
    if color_type == 3:
        if not palette or len(palette) > 256:
            raise PngError("palette required (<=256 entries)")
        if bit_depth not in (1, 2, 4, 8):
            raise PngError(f"bad palette bit depth {bit_depth}")
        if len(palette) > (1 << bit_depth):
            raise PngError("palette larger than bit depth allows")
        if len(pixels) != width * height:
            raise PngError(
                f"index buffer is {len(pixels)} bytes, want {width * height}"
            )
        if any(i >= len(palette) for i in pixels):
            raise PngError("palette index out of range")
        if trns is not None:
            # the encoder must not emit files outside its own decode
            # profile: decode_png rejects tRNS longer than PLTE, and a
            # non-byte entry would escape as ValueError from bytes()
            if len(trns) > len(palette):
                raise PngError("tRNS longer than palette")
            if any(not 0 <= v <= 255 for v in trns):
                raise PngError("tRNS alpha out of range 0..255")
        ch, sb = 1, 1
    else:
        if bit_depth not in (8, 16):
            raise PngError(f"unsupported depth {bit_depth}")
        ch = _CHANNELS.get(color_type)
        if ch is None:
            raise PngError(f"unsupported color type {color_type}")
        sb = bit_depth // 8
        if len(pixels) != width * height * ch * sb:
            raise PngError(
                f"pixel buffer is {len(pixels)} bytes, "
                f"want {width * height * ch * sb}"
            )
        if trns is not None:
            if color_type in (4, 6):
                raise PngError("tRNS forbidden with an alpha channel")
            if len(trns) != ch:
                raise PngError(f"tRNS key needs {ch} sample values")
            if any(not 0 <= v < (1 << bit_depth) for v in trns):
                raise PngError("tRNS key sample out of range")

    def row_bytes(xs: bytes) -> bytes:
        return _pack_row(xs, bit_depth) if color_type == 3 else xs

    psz = ch * sb  # bytes per pixel in the input buffer
    raw = bytearray()
    passes = _ADAM7 if interlace else [(0, 0, 1, 1)]
    for x0, y0, dx, dy in passes:
        pw, ph = _pass_dims(width, height, x0, y0, dx, dy)
        if pw == 0 or ph == 0:
            continue
        for ry in range(ph):
            y = y0 + ry * dy
            samples = bytearray()
            for rx in range(pw):
                x = x0 + rx * dx
                o = (y * width + x) * psz
                samples += pixels[o : o + psz]
            raw += b"\x00" + row_bytes(bytes(samples))
    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0,
        1 if interlace else 0,
    )
    out = _SIGNATURE + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += _chunk(b"PLTE", b"".join(bytes(p) for p in palette))
        if trns is not None:
            out += _chunk(b"tRNS", bytes(trns))
    elif trns is not None:
        out += _chunk(b"tRNS", b"".join(struct.pack(">H", v) for v in trns))
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


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


def _defilter(raw: bytes, off: int, n_rows: int, stride: int, bpp: int) -> tuple[bytes, int]:
    """Reverse the five RFC 2083 row filters over ``n_rows`` scanlines of
    ``stride`` bytes starting at ``off`` (``bpp`` = filter byte offset —
    max(1, bytes per pixel)); returns (defiltered bytes, new offset)."""
    out = bytearray()
    prev = bytes(stride)
    for _ in range(n_rows):
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        off += 1 + stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise PngError(f"bad filter type {ftype}")
        out += line
        prev = bytes(line)
    return bytes(out), off


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline PNG → ``(width, height, channels, pixels)`` with
    8-bit row-major pixel bytes (palette images decode to RGB, or RGBA
    when a tRNS chunk supplies entry alphas). Raises ``PngError`` for
    non-PNG bytes or anything outside the supported profile."""
    if not data or not data.startswith(_SIGNATURE):
        raise PngError("bad signature")
    pos = len(_SIGNATURE)
    width = height = -1
    depth = 8
    ctype = -1
    interlace = 0
    palette: list[bytes] = []
    trns: bytes | None = None
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
            if ctype == 3:
                if depth not in (1, 2, 4, 8):
                    raise PngError(f"bad palette bit depth {depth}")
            elif ctype in _CHANNELS:
                if depth not in (8, 16):
                    raise PngError(f"unsupported depth {depth}")
            else:
                raise PngError(f"unsupported color type {ctype}")
            if interlace not in (0, 1):
                raise PngError(f"bad interlace method {interlace}")
        elif tag == b"PLTE":
            if length % 3 or length == 0 or length > 256 * 3:
                raise PngError("bad PLTE length")
            palette = [body[i : i + 3] for i in range(0, length, 3)]
        elif tag == b"tRNS":
            if ctype == 3:
                trns = body
            elif ctype in (0, 2):
                # transparent-color key: one 2-byte value per sample
                if len(body) != 2 * _CHANNELS[ctype]:
                    raise PngError(f"bad tRNS length {len(body)}")
                trns = body
            else:
                # alpha-bearing types: the spec forbids tRNS; silently
                # dropping transparency would be a WRONG decode
                raise PngError("tRNS unsupported for this color type")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width < 0 or not idat:
        raise PngError("missing IHDR/IDAT")
    if ctype == 3:
        if not palette:
            raise PngError("palette image missing PLTE")
        if trns is not None and len(trns) > len(palette):
            raise PngError("tRNS longer than palette")
        ch_raw = 1
        channels = 4 if trns is not None else 3
    else:
        ch_raw = _CHANNELS[ctype]
        # a color key adds an alpha channel to the decoded output
        channels = ch_raw + 1 if trns is not None else ch_raw
    # Bound allocations BEFORE inflating: header-declared dimensions are
    # attacker-controlled, and zlib.decompress with no cap is a zip bomb —
    # inflate at most the expected scanline bytes (+1 to detect overrun).
    if width <= 0 or height <= 0 or width * height * channels > (1 << 26):
        raise PngError("unreasonable dimensions")

    passes = _ADAM7 if interlace else [(0, 0, 1, 1)]
    plan = []  # (x0, y0, dx, dy, pw, ph, stride)
    expected = 0
    for x0, y0, dx, dy in passes:
        pw, ph = _pass_dims(width, height, x0, y0, dx, dy)
        if pw == 0 or ph == 0:
            continue
        stride = -(-pw * depth * ch_raw // 8)
        plan.append((x0, y0, dx, dy, pw, ph, stride))
        expected += (stride + 1) * ph
    try:
        raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise PngError(f"corrupt IDAT: {exc}") from exc
    if len(raw) != expected:
        raise PngError("scanline size mismatch")

    if ctype == 3:
        # palette lookup table: RGB(A) bytes per index
        lut = [
            p + (bytes([trns[i] if trns is not None and i < len(trns) else 255])
                 if channels == 4 else b"")
            for i, p in enumerate(palette)
        ]
    key = None  # full-precision transparent-color key for types 0/2
    if ctype in (0, 2) and trns is not None:
        key = tuple(
            struct.unpack_from(">H", trns, 2 * k)[0] for k in range(ch_raw)
        )
    bpp = max(1, depth * ch_raw // 8)
    sb = depth // 8 if ctype != 3 else 1  # bytes per sample
    out = bytearray(width * height * channels)
    off = 0
    for x0, y0, dx, dy, pw, ph, stride in plan:
        rows, off = _defilter(raw, off, ph, stride, bpp)
        contiguous = dx == 1 and dy == 1  # the non-interlaced fast path
        for ry in range(ph):
            rb = rows[ry * stride : (ry + 1) * stride]
            y = y0 + ry * dy
            if ctype == 3:
                idxs = _unpack_row(rb, pw, depth)
                for rx, idx in enumerate(idxs):
                    if idx >= len(palette):
                        raise PngError("palette index out of range")
                    o = (y * width + x0 + rx * dx) * channels
                    out[o : o + channels] = lut[idx]
            elif key is None and sb == 1 and contiguous:
                out[y * width * channels : (y + 1) * width * channels] = rb
            elif key is None and sb == 2 and contiguous:
                # 16-bit reduction: big-endian, so the HIGH byte of every
                # sample is simply each even offset
                out[y * width * channels : (y + 1) * width * channels] = rb[0::2]
            else:
                for rx in range(pw):
                    base = rx * ch_raw * sb
                    if sb == 1:
                        samp = rb[base : base + ch_raw]
                        vals = tuple(samp)
                    else:
                        vals = tuple(
                            (rb[base + 2 * k] << 8) | rb[base + 2 * k + 1]
                            for k in range(ch_raw)
                        )
                        samp = rb[base : base + 2 * ch_raw : 2]
                    o = (y * width + x0 + rx * dx) * channels
                    if key is None:
                        out[o : o + channels] = samp
                    else:
                        # compare at FULL precision, reduce after
                        out[o : o + channels] = bytes(samp) + (
                            b"\x00" if vals == key else b"\xff"
                        )
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
