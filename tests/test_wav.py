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
