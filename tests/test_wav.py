"""Unit tests for the vendored pure-stdlib WAV codec (wav.py).

Decode is verified against an independently hand-built RIFF file with an
extra unknown chunk and word-alignment padding — not just a roundtrip of
our own encoder's canonical layout.
"""

import struct

import pytest

from bigdata_lab02_spark.operators.wav import (
    WavError,
    decode_wav,
    encode_wav,
    wav_stats,
)


def test_roundtrip():
    samples = [0, 100, -100, 32767, -32768, 5, -5]
    sr, ch, out = decode_wav(encode_wav(samples, sample_rate=44100))
    assert (sr, ch, out) == (44100, 1, samples)


def test_decode_hand_built_with_extra_chunks():
    """RIFF with a LIST chunk before fmt, an odd-length chunk (forcing the
    word-alignment pad), and stereo interleaved data."""
    samples = [1, -1, 300, -300]
    pcm = struct.pack("<4h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16)
    odd = b"junk!"  # 5 bytes → 1 pad byte
    body = (
        b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert decode_wav(data) == (16000, 2, samples)


def test_stats_exact():
    samples = [10, -10, 0, 20]
    s = wav_stats(encode_wav(samples))
    assert s["n_samples"] == 4
    assert s["sumsq"] == 100 + 100 + 0 + 400
    # sign flips: +10→-10 (1), -10→0 (0 counts as non-negative → flip, 2),
    # 0→20 (no flip)
    assert s["zero_crossings"] == 2
    assert s["peak"] == 20


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"RIFFxxxxWAVE",  # no chunks
        b"nonsense bytes here",
    ],
    ids=["empty", "chunkless", "wrong-magic"],
)
def test_decode_rejects_garbage(bad):
    with pytest.raises(WavError):
        decode_wav(bad)


def test_unsupported_profile_rejected():
    # float PCM (format code 3) is outside the integer-PCM profile
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(WavError):
        decode_wav(data)


class TestBitDepthEdges:
    """r8: 8-bit (stored unsigned, decoded signed) and 24-bit (3-byte
    two's complement) PCM join the 16-bit profile."""

    def test_8bit_roundtrip_and_storage_convention(self):
        samples = [-128, -1, 0, 1, 127, 64, -64]
        data = encode_wav(samples, 8000, bits=8)
        sr, ch, got = decode_wav(data)
        assert (sr, ch, got) == (8000, 1, samples)
        # on disk the spec stores value+128 unsigned
        at = data.index(b"data") + 8
        assert list(data[at:at + len(samples)]) == [s + 128 for s in samples]

    def test_24bit_roundtrip_sign_extension(self):
        lo, hi = -(1 << 23), (1 << 23) - 1
        samples = [lo, -1, 0, 1, hi, 0x123456, -0x123456]
        sr, ch, got = decode_wav(encode_wav(samples, 44100, bits=24))
        assert (sr, ch) == (44100, 1)
        assert got == samples

    def test_out_of_range_samples_raise(self):
        with pytest.raises(WavError):
            encode_wav([128], bits=8)
        with pytest.raises(WavError):
            encode_wav([1 << 23], bits=24)
        with pytest.raises(WavError):
            encode_wav([0], bits=12)

    def test_24bit_misaligned_data_raises(self):
        data = bytearray(encode_wav([0, 1, -1], bits=24))
        at = data.index(b"data")
        # shrink the data chunk to 8 bytes (not a multiple of 3)
        import struct as _s
        _s.pack_into("<I", data, at + 4, 8)
        with pytest.raises(WavError):
            decode_wav(bytes(data[:at + 8 + 8]) )

    def test_float_fmt_patch_is_honest_failure(self):
        # the wav_edges corrupt-stripe construction: valid 16-bit stream,
        # fmt code patched to 3 at offset 20
        import struct as _s
        data = bytearray(encode_wav([1, -1, 2], 8000))
        data[20:22] = _s.pack("<H", 3)
        with pytest.raises(WavError):
            decode_wav(bytes(data))


@pytest.mark.parametrize("bits", [8, 16, 24])
def test_fuzz_byte_flips_never_crash(bits):
    """Byte-flip fuzz parity with the png/jpeg codecs: every single-byte
    corruption either still decodes (payload bytes may be legal PCM) or
    raises WavError — never any other exception."""
    rng = range(-100, 100, 7)
    scale = {8: 1, 16: 200, 24: 60000}[bits]
    data = encode_wav([v * scale for v in rng], 8000, bits=bits)
    for i in range(len(data)):
        m = bytearray(data)
        m[i] ^= 0xFF
        try:
            decode_wav(bytes(m))
        except WavError:
            pass
