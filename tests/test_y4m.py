"""Unit tests for the vendored Y4M (YUV4MPEG2) codec — same adversarial
posture as test_png/test_wav: roundtrip, header parsing, and every
malformed-payload path must raise Y4mError (never escape as a different
exception type, which would bypass the decode_ok=False path)."""

import pytest

from bigdata_lab02_spark.operators.y4m import (
    Y4mError,
    encode_y4m,
    frame_stats,
    iter_frames,
    parse_header,
    video_info,
)


def _frames(w, h, n, chroma_ratio=0.25):
    luma, chroma = w * h, int(w * h * chroma_ratio)
    return [
        bytes((f * 17 + p * 7) % 256 for p in range(luma + 2 * chroma))
        for f in range(n)
    ]


def test_roundtrip_c420():
    frames = _frames(8, 6, 3)
    data = encode_y4m(8, 6, frames, fps=(30, 1))
    info = video_info(data)
    assert (info["width"], info["height"], info["n_frames"]) == (8, 6, 3)
    assert (info["fps_num"], info["fps_den"]) == (30, 1)
    assert [fr for _, fr in iter_frames(data)] == frames


@pytest.mark.parametrize(
    "cs,ratio", [("C422", 0.5), ("C444", 1.0), ("Cmono", 0.0)]
)
def test_other_colorspaces(cs, ratio):
    frames = _frames(8, 6, 2, chroma_ratio=ratio)
    data = encode_y4m(8, 6, frames, colorspace=cs)
    info = video_info(data)
    assert info["n_frames"] == 2
    assert info["frame_bytes"] == len(frames[0])


def test_header_parses_optional_params():
    data = b"YUV4MPEG2 W4 H4 F25:1 Ip A4:3 C420jpeg XYSCSS=420JPEG\n"
    h = parse_header(data)
    assert (h["width"], h["height"], h["colorspace"]) == (4, 4, "C420jpeg")


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"not a video",
        b"YUV4MPEG2 W4 H4" + b" " * 300,  # unterminated header
        b"YUV4MPEG2 F25:1\n",  # missing W/H
        b"YUV4MPEG2 W4 Hx\n",  # non-integer param
        b"YUV4MPEG2 W4 H4 F0:0\n",  # invalid rate
        b"YUV4MPEG2 W99999 H99999\n",  # bomb dimensions
        b"YUV4MPEG2 W5 H4 C420\n",  # odd width for 420
        b"YUV4MPEG2 W4 H4 C411\n",  # unsupported colorspace
    ],
    ids=["empty", "magic", "unterminated", "no-dims", "bad-int",
         "zero-rate", "bomb", "odd-420", "bad-cs"],
)
def test_malformed_headers_raise(bad):
    with pytest.raises(Y4mError):
        video_info(bad)


def test_truncated_frame_raises():
    data = encode_y4m(4, 4, _frames(4, 4, 2))
    with pytest.raises(Y4mError):
        video_info(data[:-5])


def test_garbage_between_frames_raises():
    frames = _frames(4, 4, 2)
    data = encode_y4m(4, 4, frames)
    # overwrite the second FRAME marker
    at = data.index(b"FRAME", data.index(b"FRAME") + 1)
    broken = data[:at] + b"JUNK!" + data[at + 5 :]
    with pytest.raises(Y4mError):
        video_info(broken)


def test_encode_rejects_wrong_frame_size():
    with pytest.raises(Y4mError):
        encode_y4m(4, 4, [b"\x00" * 10])


def test_frame_stats_sampling():
    frames = _frames(4, 4, 5)
    data = encode_y4m(4, 4, frames)
    stats = frame_stats(data, every_n_frames=2)
    assert [s["frame_idx"] for s in stats] == [0, 2, 4]
    luma = 16
    for s in stats:
        fr = frames[s["frame_idx"]]
        assert s["y_sum"] == sum(fr[:luma])
        assert s["u_sum"] == sum(fr[luma : luma + 4])
        assert s["v_sum"] == sum(fr[luma + 4 :])


def test_frame_line_terminator_required():
    # planes full of 0x0A: the old unbounded newline scan would re-align on
    # picture bytes once the FRAME terminator is corrupted; now the byte
    # after FRAME must be '\n' or ' ' before any newline is trusted
    frames = [bytes([10]) * 24 for _ in range(3)]
    data = encode_y4m(4, 4, frames)
    at = data.index(b"FRAME", data.index(b"FRAME") + 1)  # second frame line
    nl = at + 5
    assert data[nl : nl + 1] == b"\n"
    broken = data[:nl] + b"X" + data[nl + 1 :]
    with pytest.raises(Y4mError):
        video_info(broken)


def test_overlong_frame_line_raises():
    # a FRAME params line with no newline inside the scan bound must raise
    # instead of hunting for a 0x0A deep inside plane data
    frames = _frames(4, 4, 1)
    data = encode_y4m(4, 4, frames)
    at = data.index(b"FRAME")
    broken = data[:at] + b"FRAME " + b"A" * 300 + b"\n" + data[at + 6 :]
    with pytest.raises(Y4mError, match="unterminated"):
        video_info(broken)


def test_fuzz_byte_flips_never_crash():
    """Byte-flip fuzz parity with the png/jpeg/wav codecs: every
    single-byte corruption either still parses or raises Y4mError —
    never any other exception."""
    data = encode_y4m(8, 6, _frames(8, 6, 2), fps=(30, 1))
    for i in range(len(data)):
        m = bytearray(data)
        m[i] ^= 0xFF
        try:
            video_info(bytes(m))
        except Y4mError:
            pass
