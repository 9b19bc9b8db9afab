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
    # r8 widened the profile to 16-bit samples AND gray+alpha, so the
    # scope boundary moved to genuinely-invalid headers: color type 7
    # is undefined by the spec
    data = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 7, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError):
        decode_png(data)
    # depth 16 decodes as of r8: a hand-built all-zero 2x2 RGB-16 stream
    data = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(data) == (2, 2, 3, bytes(12))
    # gray+alpha decodes as of r8 too (2x2 GA-8, hand-built)
    data = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 4, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" + bytes([1, 2, 3, 4])
                                        + b"\x00" + bytes([5, 6, 7, 8])))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(data) == (2, 2, 2, bytes([1, 2, 3, 4, 5, 6, 7, 8]))


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


class TestPaletteAndAdam7:
    """Round-7 profile extensions: palette images (color type 3, bit
    depths 1/2/4/8, tRNS alpha) and Adam7 interlacing — both common in
    a real crawl (quantized icons/screenshots; interlaced exports)."""

    def _pal(self, n):
        return [(i * 7 % 256, i * 13 % 256, i * 29 % 256) for i in range(n)]

    @pytest.mark.parametrize("depth,npal", [(1, 2), (2, 4), (4, 16), (8, 200)])
    def test_palette_roundtrip_rgb(self, depth, npal):
        import numpy as np

        rng = np.random.default_rng(depth)
        pal = self._pal(npal)
        for w, h in ((1, 1), (5, 3), (13, 7)):
            idx = bytes(rng.integers(0, npal, w * h, dtype=np.uint8))
            got = decode_png(encode_png(w, h, idx, 3, palette=pal,
                                        bit_depth=depth))
            assert got == (w, h, 3, b"".join(bytes(pal[i]) for i in idx))

    def test_palette_trns_decodes_rgba(self):
        pal = self._pal(4)
        trns = [0, 85, 170, 255]
        idx = bytes([0, 1, 2, 3, 3, 2, 1, 0, 2])
        w, h, ch, px = decode_png(
            encode_png(3, 3, idx, 3, palette=pal, bit_depth=2, trns=trns)
        )
        assert (w, h, ch) == (3, 3, 4)
        assert px == b"".join(bytes(pal[i]) + bytes([trns[i]]) for i in idx)

    def test_short_trns_defaults_opaque(self):
        pal = self._pal(4)
        idx = bytes([0, 3])
        _, _, ch, px = decode_png(
            encode_png(2, 1, idx, 3, palette=pal, bit_depth=8, trns=[7])
        )
        assert ch == 4
        assert px[3] == 7 and px[7] == 255  # entry 3 beyond tRNS -> opaque

    @pytest.mark.parametrize("ct,ch", [(0, 1), (2, 3), (6, 4)])
    def test_adam7_roundtrip(self, ct, ch):
        import numpy as np

        rng = np.random.default_rng(ct + 10)
        for w, h in ((1, 1), (3, 2), (8, 8), (13, 11), (24, 16)):
            px = bytes(rng.integers(0, 256, w * h * ch, dtype=np.uint8))
            assert decode_png(encode_png(w, h, px, ct, interlace=True)) == (
                w, h, ch, px,
            )

    def test_adam7_palette_all_depths(self):
        import numpy as np

        rng = np.random.default_rng(99)
        for depth, npal in ((1, 2), (2, 4), (4, 16), (8, 31)):
            pal = self._pal(npal)
            idx = bytes(rng.integers(0, npal, 13 * 11, dtype=np.uint8))
            got = decode_png(encode_png(13, 11, idx, 3, palette=pal,
                                        bit_depth=depth, interlace=True))
            assert got == (13, 11, 3, b"".join(bytes(pal[i]) for i in idx))

    def test_rejections(self):
        pal = self._pal(4)
        with pytest.raises(PngError):  # index beyond palette (encode)
            encode_png(2, 2, bytes([5, 0, 0, 0]), 3, palette=pal, bit_depth=2)
        with pytest.raises(PngError):  # palette bigger than depth allows
            encode_png(2, 2, bytes(4), 3, palette=self._pal(5), bit_depth=2)
        with pytest.raises(PngError):  # missing PLTE on decode
            data = encode_png(2, 2, bytes(4), 3, palette=pal, bit_depth=8)
            plte = data.find(b"PLTE")
            cut = data[: plte - 4] + data[plte + 4 + 12 + 12:]
            decode_png(cut)
        with pytest.raises(PngError):  # decode-side index out of range
            # craft: palette of 2 but an index byte of 3 at depth 8
            good = encode_png(1, 1, bytes([1]), 3, palette=self._pal(2),
                              bit_depth=8)
            # rebuild with a bad index by re-encoding raw IDAT
            import struct as _s
            import zlib as _z
            bad_raw = _z.compress(b"\x00\x03")
            i = good.find(b"IDAT")
            (ln,) = _s.unpack_from(">I", good, i - 4)
            rebuilt = (good[: i - 4]
                       + _s.pack(">I", len(bad_raw)) + b"IDAT" + bad_raw
                       + _s.pack(">I", _z.crc32(b"IDAT" + bad_raw))
                       + good[i + 4 + ln + 4:])
            decode_png(rebuilt)
        with pytest.raises(PngError):  # tRNS on RGBA: spec-forbidden, and
            # silently dropping it would be a wrong decode (RGB color
            # keys DECODE as of r8 — see TestSixteenBitAndColorKey)
            data = encode_png(2, 2, bytes(16), 6)
            ihdr_end = data.find(b"IDAT") - 4
            trns = b"\x00\x00\x00\x00\x00\x00"
            import struct as _s
            import zlib as _z
            chunk = (_s.pack(">I", len(trns)) + b"tRNS" + trns
                     + _s.pack(">I", _z.crc32(b"tRNS" + trns)))
            decode_png(data[:ihdr_end] + chunk + data[ihdr_end:])

    def test_fuzz_palette_interlaced_never_crashes(self):
        import numpy as np

        rng = np.random.default_rng(7)
        pal = self._pal(16)
        idx = bytes(rng.integers(0, 16, 16 * 8, dtype=np.uint8))
        data = encode_png(16, 8, idx, 3, palette=pal, bit_depth=4,
                          interlace=True, trns=list(range(16)))
        for i in range(len(data)):
            m = bytearray(data)
            m[i] ^= 0xFF
            try:
                decode_png(bytes(m))
            except PngError:
                pass


def test_adam7_filter_state_resets_per_pass():
    """PNG spec: each Adam7 pass is filtered INDEPENDENTLY — the first
    scanline of every pass must treat the prior row as zeros, never the
    last row of the previous pass. Hand-build an interlaced grayscale
    image whose every scanline uses filter 2 (Up): if the decoder
    carried filter state across passes, every pass after the first
    would decode to garbage."""
    w = h = 8  # pass 1 of Adam7 at 8x8 is a single pixel per pass cell
    px = bytes((x * 5 + y * 11) % 256 for y in range(h) for x in range(w))
    A7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in A7:
        pw = max(0, -(-(w - x0) // dx))
        ph = max(0, -(-(h - y0) // dy))
        if not pw or not ph:
            continue
        prev = bytes(pw)  # the spec's per-pass zero prior row
        for ry in range(ph):
            y = y0 + ry * dy
            line = bytes(px[y * w + x0 + rx * dx] for rx in range(pw))
            enc = bytes((line[i] - prev[i]) & 0xFF for i in range(pw))
            raw += b"\x02" + enc  # filter 2 (Up) on every row
            prev = line
    data = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(data) == (w, h, 1, px)


class TestSixteenBitAndColorKey:
    """Round-8 profile extensions (VERDICT r7 item 7): 16-bit samples
    (filters run over raw 2-byte scanlines, output reduces to the high
    byte) and tRNS transparent-color keys on gray/RGB (full-precision
    compare BEFORE reduction)."""

    @staticmethod
    def _px16(vals):
        return b"".join(struct.pack(">H", v) for v in vals)

    @pytest.mark.parametrize("ct,ch", [(0, 1), (2, 3), (6, 4)])
    def test_16bit_roundtrip_reduces_to_high_byte(self, ct, ch):
        w, h = 9, 7
        vals = [(i * 1031 + 17) % 65536 for i in range(w * h * ch)]
        got = decode_png(encode_png(w, h, self._px16(vals), ct, bit_depth=16))
        assert got == (w, h, ch, bytes(v >> 8 for v in vals))

    @pytest.mark.parametrize("ct,ch", [(0, 1), (2, 3)])
    def test_16bit_adam7_roundtrip(self, ct, ch):
        w, h = 13, 11
        vals = [(i * 257) % 65536 for i in range(w * h * ch)]
        got = decode_png(
            encode_png(w, h, self._px16(vals), ct, bit_depth=16,
                       interlace=True)
        )
        assert got == (w, h, ch, bytes(v >> 8 for v in vals))

    def test_16bit_sub_filter_hand_built(self):
        """Independent of our filter-0 encoder: hand-build a 16-bit RGB
        stream whose rows use filter 1 (Sub). bpp is 6 for RGB-16, so a
        decoder that kept bpp=3 (the 8-bit value) would add the wrong
        left neighbor and corrupt every pixel after the first."""
        w, h = 4, 2
        vals = [(i * 4099 + 3) % 65536 for i in range(w * h * 3)]
        px = self._px16(vals)
        stride, bpp = w * 6, 6
        raw = bytearray()
        for y in range(h):
            line = px[y * stride : (y + 1) * stride]
            enc = bytearray(line)
            for i in range(stride - 1, bpp - 1, -1):
                enc[i] = (line[i] - line[i - bpp]) & 0xFF
            raw += b"\x01" + bytes(enc)
        data = (
            _SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )
        assert decode_png(data) == (w, h, 3, bytes(v >> 8 for v in vals))

    def test_gray_color_key_depth8(self):
        got = decode_png(encode_png(2, 2, bytes([10, 20, 10, 30]), 0,
                                    trns=[10]))
        assert got == (2, 2, 2, bytes([10, 0, 20, 255, 10, 0, 30, 255]))

    def test_rgb_color_key_full_precision_compare(self):
        """Two 16-bit pixels differing only in a LOW byte: the one equal
        to the key at full precision goes transparent; the other — which
        reduces to the SAME 8-bit sample — must stay opaque."""
        p0 = (0x1234, 0x0001, 0xFF00)
        p1 = (0x1234, 0x0001, 0xFF01)
        got = decode_png(
            encode_png(2, 1, self._px16(p0 + p1), 2, bit_depth=16,
                       trns=list(p0))
        )
        assert got == (2, 1, 4,
                       bytes([0x12, 0x00, 0xFF, 0, 0x12, 0x00, 0xFF, 255]))

    def test_gray_key_out_of_8bit_range_never_matches(self):
        """Spec-conformant edge: a depth-8 stream whose tRNS key is
        above 255 matches no pixel — everything stays opaque."""
        data = encode_png(2, 1, bytes([7, 7]), 0)
        ihdr_end = data.find(b"IDAT") - 4
        trns = struct.pack(">H", 0x0107)  # 263: low byte equals the pixels
        data = data[:ihdr_end] + _chunk(b"tRNS", trns) + data[ihdr_end:]
        assert decode_png(data) == (2, 1, 2, bytes([7, 255, 7, 255]))

    def test_encoder_validation(self):
        with pytest.raises(PngError):  # tRNS forbidden with alpha channel
            encode_png(1, 1, bytes(4), 6, trns=[1, 2, 3])
        with pytest.raises(PngError):  # wrong key arity
            encode_png(1, 1, bytes(3), 2, trns=[1])
        with pytest.raises(PngError):  # key sample beyond depth range
            encode_png(1, 1, bytes(1), 0, trns=[256])
        with pytest.raises(PngError):  # 16-bit buffer size enforced
            encode_png(2, 2, bytes(12), 2, bit_depth=16)
        pal = [(0, 0, 0), (1, 1, 1)]
        with pytest.raises(PngError):  # palette tRNS longer than PLTE
            encode_png(2, 1, bytes([0, 1]), 3, palette=pal, bit_depth=8,
                       trns=[0, 1, 2])
        with pytest.raises(PngError):  # palette tRNS entry out of range
            encode_png(2, 1, bytes([0, 1]), 3, palette=pal, bit_depth=8,
                       trns=[300])

    def test_decode_rejects_bad_trns_length(self):
        data = encode_png(2, 1, bytes([7, 7]), 0)
        ihdr_end = data.find(b"IDAT") - 4
        with pytest.raises(PngError):  # gray key must be exactly 2 bytes
            decode_png(data[:ihdr_end] + _chunk(b"tRNS", b"\x00\x00\x00")
                       + data[ihdr_end:])

    def test_fuzz_16bit_colorkey_never_crashes(self):
        vals = [(i * 31) % 65536 for i in range(6 * 4 * 3)]
        data = encode_png(6, 4, self._px16(vals), 2, bit_depth=16,
                          trns=[vals[0], vals[1], vals[2]], interlace=True)
        for i in range(len(data)):
            m = bytearray(data)
            m[i] ^= 0xFF
            try:
                decode_png(bytes(m))
            except PngError:
                pass


class TestGrayAlpha:
    """Round-8: color type 4 (gray+alpha) at 8 and 16 bits — with it,
    every spec-defined color type decodes at its common depths."""

    @pytest.mark.parametrize("interlace", [False, True])
    def test_ga8_roundtrip(self, interlace):
        w, h = 11, 6
        px = bytes((i * 23 + 5) % 256 for i in range(w * h * 2))
        assert decode_png(encode_png(w, h, px, 4, interlace=interlace)) == (
            w, h, 2, px,
        )

    def test_ga16_roundtrip_reduces_to_high_byte(self):
        w, h = 7, 5
        vals = [(i * 911 + 2) % 65536 for i in range(w * h * 2)]
        px16 = b"".join(struct.pack(">H", v) for v in vals)
        got = decode_png(encode_png(w, h, px16, 4, bit_depth=16))
        assert got == (w, h, 2, bytes(v >> 8 for v in vals))

    def test_trns_still_forbidden_with_alpha(self):
        with pytest.raises(PngError):
            encode_png(1, 1, bytes(2), 4, trns=[1])
        data = encode_png(2, 1, bytes(4), 4)
        ihdr_end = data.find(b"IDAT") - 4
        with pytest.raises(PngError):
            decode_png(data[:ihdr_end] + _chunk(b"tRNS", b"\x00\x00")
                       + data[ihdr_end:])
