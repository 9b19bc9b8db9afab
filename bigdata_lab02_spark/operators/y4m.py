"""Minimal pure-stdlib Y4M (YUV4MPEG2) video codec for the multimodal
pipeline.

Y4M is the simplest real video container there is: one ASCII header line
(``YUV4MPEG2 W<w> H<h> F<num>:<den> [I<il>] [A<n>:<d>] [C<cs>]``) followed
by frames, each an ASCII ``FRAME[ params]`` line plus exactly one raw
planar YUV picture. No entropy coding, no inter-frame prediction — frame
boundaries are computable from the header alone, which is exactly what a
distributed frame sampler needs: seek to frame k in O(1) without decoding
frames 0..k-1.

Profile implemented (mirrors the PNG/WAV codecs' deliberately small
scope): colorspaces C420 (+ C420jpeg/C420paldv byte-layout-identical
variants), C422, C444 and Cmono, 8-bit, progressive. Anything else raises
``Y4mError``, which the pipeline maps to ``decode_ok=False``.

Public-knowledge provenance: the YUV4MPEG2 stream format as documented in
the mjpegtools yuv4mpeg(5) man page and implemented by ffmpeg's yuv4mpeg
muxer — a plain-text public format, reimplemented here from the format
description.
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2"

# FRAME lines are "FRAME[ params]\n"; real-world params are a handful of
# short tokens, so a newline more than this far out means the terminator is
# missing and the scan is about to walk into binary plane data.
_MAX_FRAME_LINE = 256

# bytes per frame = width*height * (1 + 2*chroma_ratio); ratios by colorspace
_CHROMA_RATIO = {
    "420": 0.25,  # U and V each subsampled 2x2
    "422": 0.5,  # subsampled 2x1
    "444": 1.0,  # full resolution
    "mono": 0.0,  # no chroma planes
}


class Y4mError(ValueError):
    """Payload is not a Y4M stream this codec's profile supports."""


def _plane_sizes(width: int, height: int, colorspace: str) -> tuple[int, int]:
    """(luma_bytes, chroma_bytes_per_plane) for one frame."""
    base = colorspace[1:] if colorspace.startswith("C") else colorspace
    key = "mono" if base.startswith("mono") else base[:3]
    if key not in _CHROMA_RATIO:
        raise Y4mError(f"unsupported colorspace {colorspace}")
    if key == "420" and (width % 2 or height % 2):
        raise Y4mError("C420 requires even dimensions")
    if key == "422" and width % 2:
        raise Y4mError("C422 requires even width")
    luma = width * height
    return luma, int(luma * _CHROMA_RATIO[key])


def encode_y4m(
    width: int,
    height: int,
    frames: list[bytes],
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "C420",
) -> bytes:
    """Encode raw planar frames as a valid Y4M stream. Each element of
    ``frames`` must be one full picture: Y plane then U then V (sized per
    ``colorspace``)."""
    luma, chroma = _plane_sizes(width, height, colorspace)
    want = luma + 2 * chroma
    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
    ).encode("ascii")
    out = [header]
    for i, fr in enumerate(frames):
        if len(fr) != want:
            raise Y4mError(f"frame {i} is {len(fr)} bytes, want {want}")
        out.append(b"FRAME\n")
        out.append(fr)
    return b"".join(out)


def parse_header(data: bytes) -> dict:
    """Parse the stream header → dict with width, height, fps_num, fps_den,
    colorspace, header_len (offset of the first FRAME line)."""
    if not data.startswith(_MAGIC):
        raise Y4mError("bad magic")
    nl = data.find(b"\n")
    if nl < 0 or nl > 256:
        raise Y4mError("unterminated header")
    width = height = -1
    fps_num, fps_den = 25, 1
    colorspace = "C420"
    try:
        params = data[len(_MAGIC) : nl].decode("ascii").split()
    except UnicodeDecodeError as exc:
        raise Y4mError("non-ascii header") from exc
    for p in params:
        tag, val = p[:1], p[1:]
        try:
            if tag == "W":
                width = int(val)
            elif tag == "H":
                height = int(val)
            elif tag == "F":
                num, den = val.split(":")
                fps_num, fps_den = int(num), int(den)
            elif tag == "C":
                colorspace = p
            # I (interlacing), A (aspect), X (extensions): accepted, unused
        except ValueError as exc:
            raise Y4mError(f"bad header param {p!r}") from exc
    if width <= 0 or height <= 0:
        raise Y4mError("missing/invalid W or H")
    if fps_den <= 0 or fps_num <= 0:
        raise Y4mError("invalid frame rate")
    # Bound allocations before touching frame data: header-declared dims
    # are attacker-controlled (same rule as the PNG codec's zip-bomb guard).
    if width * height > (1 << 26):
        raise Y4mError("unreasonable dimensions")
    return {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": colorspace,
        "header_len": nl + 1,
    }


def video_info(data: bytes) -> dict:
    """Header info + exact frame count + frame geometry, validating the
    whole stream structure (every FRAME line + full payload present)."""
    info = parse_header(data)
    luma, chroma = _plane_sizes(
        info["width"], info["height"], info["colorspace"]
    )
    frame_bytes = luma + 2 * chroma
    pos, n = info["header_len"], 0
    while pos < len(data):
        # Validate the FRAME line strictly BEFORE trusting any newline:
        # plane bytes are arbitrary (0x0A is a common luma value), so an
        # unbounded newline search after a corrupted/unterminated FRAME
        # line would silently re-align on picture data and produce wrong
        # stats instead of an error.
        if data[pos : pos + 5] != b"FRAME" or data[pos + 5 : pos + 6] not in (
            b"\n",
            b" ",
        ):
            raise Y4mError(f"bad FRAME line at byte {pos}")
        nl = data.find(b"\n", pos, pos + _MAX_FRAME_LINE)
        if nl < 0:
            raise Y4mError(f"unterminated FRAME line at byte {pos}")
        pos = nl + 1 + frame_bytes
        if pos > len(data):
            raise Y4mError(f"truncated frame {n}")
        n += 1
    info.update(n_frames=n, frame_bytes=frame_bytes, luma_bytes=luma,
                chroma_bytes=chroma)
    return info


def iter_frames(data: bytes):
    """Yield (frame_idx, frame_payload) pairs. Frame payload is the raw
    planar picture (Y then U then V)."""
    info = video_info(data)
    fb = info["frame_bytes"]
    pos = info["header_len"]
    for i in range(info["n_frames"]):
        nl = data.find(b"\n", pos)
        yield i, data[nl + 1 : nl + 1 + fb]
        pos = nl + 1 + fb


def frame_stats(data: bytes, every_n_frames: int = 1) -> list[dict]:
    """Exact integer per-plane statistics for every ``every_n_frames``-th
    frame: the verification currency for the distributed sampler (same
    pattern as png_features / wav_stats — integer-only, so an
    engine-independent oracle can recompute it)."""
    info = video_info(data)
    luma, chroma = info["luma_bytes"], info["chroma_bytes"]
    out = []
    for i, fr in iter_frames(data):
        if i % every_n_frames:
            continue
        y = fr[:luma]
        u = fr[luma : luma + chroma]
        v = fr[luma + chroma :]
        out.append(
            {
                "frame_idx": i,
                "width": info["width"],
                "height": info["height"],
                "y_sum": sum(y),
                "u_sum": sum(u),
                "v_sum": sum(v),
                "y_max": max(y) if y else None,
            }
        )
    return out
