"""Minimal pure-stdlib WAV (RIFF/PCM) codec for the multimodal pipeline.

Same role as ``png.py`` for images: the container has no audio libraries,
but canonical WAV needs only ``struct`` — a RIFF header, an ``fmt `` chunk
(PCM), and a ``data`` chunk of little-endian samples. Implemented profile:

- encode: mono 8/16/24-bit PCM at any sample rate (r8 widened from
  16-bit-only — 8-bit telephony/legacy and 24-bit studio masters are
  the other depths a real crawl carries);
- decode: 8/16/24-bit PCM, any channel count, chunk-walking (skips
  unknown chunks like ``LIST``/``INFO``), format code 1 (integer PCM)
  only. Samples come back SIGNED at every depth (8-bit is stored
  unsigned per the spec and shifted by -128 on decode).

Anything outside the profile (float PCM, compressed formats) raises
``WavError``, which the pipeline maps to ``decode_ok=False``.

Public-knowledge provenance: RIFF/WAVE format (Microsoft/IBM multimedia
programming interface spec, 1991; ubiquitously documented).
"""

from __future__ import annotations

import struct


class WavError(ValueError):
    """Payload is not a WAV this codec's profile supports."""


def encode_wav(
    samples: list[int], sample_rate: int = 8000, bits: int = 16
) -> bytes:
    """Encode mono integer-PCM samples as a canonical WAV file.

    ``samples`` are SIGNED canonical values at every depth —
    [-128, 127] for ``bits=8``, [-32768, 32767] for 16, [-2^23, 2^23-1]
    for 24 — matching what ``decode_wav`` returns. On disk the spec's
    conventions apply: 8-bit PCM is stored UNSIGNED (value + 128),
    16/24-bit little-endian two's complement."""
    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        if any(not -128 <= s <= 127 for s in samples):
            raise WavError("8-bit sample out of range [-128, 127]")
        data = bytes(s + 128 for s in samples)
    elif bits == 24:
        lo, hi = -(1 << 23), (1 << 23) - 1
        if any(not lo <= s <= hi for s in samples):
            raise WavError("24-bit sample out of range")
        data = b"".join(
            int(s).to_bytes(3, "little", signed=True) for s in samples
        )
    else:
        raise WavError(f"unsupported bit depth {bits}")
    align = bits // 8
    byte_rate = sample_rate * align
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, align, bits)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode an 8/16/24-bit integer-PCM WAV → ``(sample_rate, channels,
    samples)`` with SIGNED samples at every depth, interleaved when
    multi-channel. Raises ``WavError`` for non-WAV bytes or unsupported
    profiles."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("bad RIFF/WAVE header")
    pos = 12
    sample_rate = channels = bits = None
    fmt_code = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise WavError("truncated chunk")
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            if length < 16:
                raise WavError("short fmt chunk")
            fmt_code, channels, sample_rate, _rate, _align, bits = struct.unpack_from(
                "<HHIIHH", body
            )
        elif tag == b"data":
            pcm = body
    if fmt_code is None or pcm is None:
        raise WavError("missing fmt/data chunk")
    if fmt_code != 1 or bits not in (8, 16, 24):
        raise WavError(f"unsupported format code/bits {fmt_code}/{bits}")
    align = bits // 8
    if len(pcm) % align:
        raise WavError("PCM byte count not a multiple of the sample size")
    if bits == 16:
        samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    elif bits == 8:
        # stored unsigned per the spec; return signed canonical values
        samples = [b - 128 for b in pcm]
    else:  # 24-bit little-endian two's complement
        samples = [
            int.from_bytes(pcm[i : i + 3], "little", signed=True)
            for i in range(0, len(pcm), 3)
        ]
    return sample_rate, channels, samples


def wav_stats(data: bytes) -> dict:
    """Exact integer statistics of the decoded stream — the gate currency
    (integers hash identically across engines; see multimodal_decode):
    sample count, Σ s², zero-crossing count (sign-bit flips between
    consecutive samples), and peak |s|."""
    sample_rate, channels, samples = decode_wav(data)
    sumsq = 0
    crossings = 0
    peak = 0
    prev_neg = None
    for s in samples:
        sumsq += s * s
        a = -s if s < 0 else s
        if a > peak:
            peak = a
        neg = s < 0
        if prev_neg is not None and neg != prev_neg:
            crossings += 1
        prev_neg = neg
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "n_samples": len(samples),
        "sumsq": sumsq,
        "zero_crossings": crossings,
        "peak": peak,
    }
