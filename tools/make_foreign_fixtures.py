#!/usr/bin/env python
"""Generate FOREIGN-ENCODER media fixtures (VERDICT r7 item 6).

The vendored codecs were previously only ever asked to decode their own
output (plus hand-built spec streams). This tool produces tiny fixture
files with two encoders that share NO code with ours, checked into
``tests/fixtures/foreign/`` and decoded by ``tests/test_foreign_media.py``
against pixels regenerated from the SAME deterministic formulas:

- PNG: the system **libpng16** driven via ctypes. libpng's default
  writer picks a per-row filter heuristically (Sub/Up/Avg/Paeth mixes we
  never emit — our encoder is filter-0 only), produces its own zlib
  stream, and implements Adam7/palette/tRNS/16-bit independently.
- JPEG: the JDK's **javax.imageio** writer (a tiny Java program compiled
  on the fly) — independent DCT, quantization, Huffman table choice
  (optimized tables, not Annex K), JFIF plumbing, and progressive scan
  script.

Run manually (`python tools/make_foreign_fixtures.py`); the outputs are
committed, so the test suite never needs libpng/javac at run time.
Pixel formulas here and in test_foreign_media.py must match.
"""

from __future__ import annotations

import ctypes as C
import json
import struct
import subprocess
import tempfile
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "foreign"

# ---------------------------------------------------------------- formulas
# (shared with test_foreign_media.py — keep in sync)


def rgb_px(w, h):
    return bytes(
        (x * 3 + y * 11 + c * 53 + 7) % 256
        for y in range(h) for x in range(w) for c in range(3)
    )


def gray_px(w, h):
    return bytes((x * 5 + y * 13 + 3) % 256 for y in range(h) for x in range(w))


def ga_px(w, h):
    return bytes(
        (x * 7 + y * 3 + c * 31 + 1) % 256
        for y in range(h) for x in range(w) for c in range(2)
    )


def gray16_vals(w, h):
    return [(x * 257 + y * 1031 + 11) % 65536 for y in range(h) for x in range(w)]


def pal_entries(n):
    return [(i * 7 % 256, i * 13 % 256, i * 29 % 256) for i in range(n)]


def pal_alphas(n):
    return [(11 * i + 40) % 256 for i in range(n)]


def pal_idx(w, h, n):
    return bytes((x * 3 + y * 5) % n for y in range(h) for x in range(w))


def smooth_rgb(w, h):
    """Slowly-varying gradient: JPEG at high quality reconstructs this
    within a few intensity levels, so a small tolerance is a REAL check."""
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes((min(255, 40 + x * 4), min(255, 60 + y * 5), 96))
    return bytes(out)


def smooth_gray(w, h):
    return bytes(min(255, 30 + x * 3 + y * 2) for y in range(h) for x in range(w))


# ---------------------------------------------------------------- libpng

_WRITE_CB = C.CFUNCTYPE(None, C.c_void_p, C.POINTER(C.c_ubyte), C.c_size_t)
_FLUSH_CB = C.CFUNCTYPE(None, C.c_void_p)


class _PngColor(C.Structure):
    _fields_ = [("red", C.c_ubyte), ("green", C.c_ubyte), ("blue", C.c_ubyte)]


class _PngColor16(C.Structure):
    _fields_ = [
        ("index", C.c_ubyte), ("red", C.c_uint16), ("green", C.c_uint16),
        ("blue", C.c_uint16), ("gray", C.c_uint16),
    ]


def libpng_encode(
    w: int, h: int, rows: list[bytes], bit_depth: int, color_type: int,
    interlace: bool = False,
    palette: list[tuple[int, int, int]] | None = None,
    trans_alpha: list[int] | None = None,
    gray_key: int | None = None,
) -> bytes:
    p = C.CDLL("libpng16.so.16")
    p.png_get_libpng_ver.restype = C.c_char_p
    p.png_get_libpng_ver.argtypes = [C.c_void_p]
    p.png_create_write_struct.restype = C.c_void_p
    p.png_create_write_struct.argtypes = [C.c_char_p] + [C.c_void_p] * 3
    p.png_create_info_struct.restype = C.c_void_p
    p.png_create_info_struct.argtypes = [C.c_void_p]
    p.png_set_write_fn.argtypes = [C.c_void_p, C.c_void_p, _WRITE_CB, _FLUSH_CB]
    p.png_set_IHDR.argtypes = [C.c_void_p, C.c_void_p, C.c_uint32, C.c_uint32] + [C.c_int] * 5
    p.png_set_PLTE.argtypes = [C.c_void_p, C.c_void_p, C.POINTER(_PngColor), C.c_int]
    p.png_set_tRNS.argtypes = [
        C.c_void_p, C.c_void_p, C.POINTER(C.c_ubyte), C.c_int,
        C.POINTER(_PngColor16),
    ]
    p.png_write_info.argtypes = [C.c_void_p, C.c_void_p]
    p.png_set_interlace_handling.restype = C.c_int
    p.png_set_interlace_handling.argtypes = [C.c_void_p]
    p.png_write_rows.argtypes = [
        C.c_void_p, C.POINTER(C.POINTER(C.c_ubyte)), C.c_uint32,
    ]
    p.png_write_end.argtypes = [C.c_void_p, C.c_void_p]
    p.png_destroy_write_struct.argtypes = [C.c_void_p, C.c_void_p]

    buf = bytearray()

    @_WRITE_CB
    def _wr(_png, data, n):
        buf.extend(C.string_at(data, n))

    @_FLUSH_CB
    def _fl(_png):
        pass

    png = p.png_create_write_struct(p.png_get_libpng_ver(None), None, None, None)
    info = p.png_create_info_struct(png)
    p.png_set_write_fn(png, None, _wr, _fl)
    p.png_set_IHDR(png, info, w, h, bit_depth, color_type, 1 if interlace else 0, 0, 0)
    if palette is not None:
        pal = (_PngColor * len(palette))(*[_PngColor(*e) for e in palette])
        p.png_set_PLTE(png, info, pal, len(palette))
    if trans_alpha is not None:
        ta = (C.c_ubyte * len(trans_alpha))(*trans_alpha)
        p.png_set_tRNS(png, info, ta, len(trans_alpha), None)
    if gray_key is not None:
        key = _PngColor16(0, 0, 0, 0, gray_key)
        p.png_set_tRNS(png, info, None, 0, C.byref(key))
    p.png_write_info(png, info)
    npasses = p.png_set_interlace_handling(png)
    row_bufs = [C.create_string_buffer(r, len(r)) for r in rows]
    row_ptrs = (C.POINTER(C.c_ubyte) * h)(
        *[C.cast(rb, C.POINTER(C.c_ubyte)) for rb in row_bufs]
    )
    for _ in range(max(1, npasses)):
        p.png_write_rows(png, row_ptrs, h)
    p.png_write_end(png, info)
    pp, ip = C.c_void_p(png), C.c_void_p(info)
    p.png_destroy_write_struct(C.byref(pp), C.byref(ip))
    return bytes(buf)


def make_pngs():
    specs = {}
    # RGB 8-bit, libpng's own per-row filter heuristic (never filter-0-only)
    w, h = 23, 17
    px = rgb_px(w, h)
    data = libpng_encode(
        w, h, [px[y * w * 3:(y + 1) * w * 3] for y in range(h)], 8, 2
    )
    (OUT / "libpng_rgb8.png").write_bytes(data)
    specs["libpng_rgb8.png"] = {"kind": "rgb8", "w": w, "h": h}
    # RGB Adam7 interlaced
    w, h = 21, 15
    px = rgb_px(w, h)
    data = libpng_encode(
        w, h, [px[y * w * 3:(y + 1) * w * 3] for y in range(h)], 8, 2,
        interlace=True,
    )
    (OUT / "libpng_adam7.png").write_bytes(data)
    specs["libpng_adam7.png"] = {"kind": "rgb8", "w": w, "h": h}
    # palette (16 entries) + tRNS alphas
    w, h, n = 19, 13, 16
    idx = pal_idx(w, h, n)
    data = libpng_encode(
        w, h, [idx[y * w:(y + 1) * w] for y in range(h)], 8, 3,
        palette=pal_entries(n), trans_alpha=pal_alphas(n),
    )
    (OUT / "libpng_pal_trns.png").write_bytes(data)
    specs["libpng_pal_trns.png"] = {"kind": "pal_trns", "w": w, "h": h, "n": n}
    # 16-bit grayscale (big-endian rows, PNG network order)
    w, h = 20, 14
    vals = gray16_vals(w, h)
    px16 = b"".join(struct.pack(">H", v) for v in vals)
    data = libpng_encode(
        w, h, [px16[y * w * 2:(y + 1) * w * 2] for y in range(h)], 16, 0
    )
    (OUT / "libpng_gray16.png").write_bytes(data)
    specs["libpng_gray16.png"] = {"kind": "gray16", "w": w, "h": h}
    # 8-bit gray + transparent-color key
    w, h = 18, 12
    px = gray_px(w, h)
    data = libpng_encode(
        w, h, [px[y * w:(y + 1) * w] for y in range(h)], 8, 0, gray_key=77
    )
    (OUT / "libpng_graykey.png").write_bytes(data)
    specs["libpng_graykey.png"] = {"kind": "graykey", "w": w, "h": h, "key": 77}
    # 8-bit gray+alpha (color type 4)
    w, h = 17, 11
    px = ga_px(w, h)
    data = libpng_encode(
        w, h, [px[y * w * 2:(y + 1) * w * 2] for y in range(h)], 8, 4
    )
    (OUT / "libpng_ga8.png").write_bytes(data)
    specs["libpng_ga8.png"] = {"kind": "ga8", "w": w, "h": h}
    return specs


# ---------------------------------------------------------------- javax.imageio

_JAVA = r"""
import java.awt.image.BufferedImage;
import java.io.File;
import java.util.Iterator;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.ImageOutputStream;

public class MakeJpegFixtures {
    static void write(BufferedImage img, File f, float q, boolean prog)
            throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("jpeg");
        ImageWriter w = it.next();
        ImageWriteParam p = w.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(q);
        if (prog) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
        try (ImageOutputStream os = ImageIO.createImageOutputStream(f)) {
            w.setOutput(os);
            w.write(null, new IIOImage(img, null, null), p);
        }
        w.dispose();
    }

    public static void main(String[] args) throws Exception {
        File dir = new File(args[0]);
        int w = 24, h = 16;
        BufferedImage rgb = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int r = Math.min(255, 40 + x * 4);
                int g = Math.min(255, 60 + y * 5);
                int b = 96;
                rgb.setRGB(x, y, (r << 16) | (g << 8) | b);
            }
        write(rgb, new File(dir, "imageio_base.jpg"), 0.95f, false);
        write(rgb, new File(dir, "imageio_prog.jpg"), 0.95f, true);
        BufferedImage gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int v = Math.min(255, 30 + x * 3 + y * 2);
                gray.getRaster().setSample(x, y, 0, v);
            }
        write(gray, new File(dir, "imageio_gray.jpg"), 0.95f, false);
        // lower quality -> ImageIO switches to 4:2:0 chroma subsampling
        write(rgb, new File(dir, "imageio_q70.jpg"), 0.70f, false);
    }
}
"""


def make_jpegs():
    with tempfile.TemporaryDirectory() as td:
        src = Path(td) / "MakeJpegFixtures.java"
        src.write_text(_JAVA)
        subprocess.run(["javac", str(src)], check=True, cwd=td)
        subprocess.run(
            ["java", "-cp", td, "MakeJpegFixtures", str(OUT)], check=True
        )
    return {
        "imageio_base.jpg": {"kind": "smooth_rgb", "w": 24, "h": 16, "tol": 4.0},
        "imageio_prog.jpg": {"kind": "smooth_rgb", "w": 24, "h": 16, "tol": 4.0},
        "imageio_gray.jpg": {"kind": "smooth_gray", "w": 24, "h": 16, "tol": 4.0},
        "imageio_q70.jpg": {"kind": "smooth_rgb", "w": 24, "h": 16, "tol": 10.0},
    }


# ------------------------------------ libjpeg arithmetic fixtures (r9)

_ARITH_C = r"""
#include <stdio.h>
#include <jpeglib.h>

static void write_jpeg(const char *path, int w, int h, int gray,
                       int arith, int restart, int sub444, int prog,
                       unsigned char *pix) {
    struct jpeg_compress_struct c;
    struct jpeg_error_mgr err;
    c.err = jpeg_std_error(&err);
    jpeg_create_compress(&c);
    FILE *f = fopen(path, "wb");
    jpeg_stdio_dest(&c, f);
    c.image_width = w; c.image_height = h;
    c.input_components = gray ? 1 : 3;
    c.in_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, 95, TRUE);
    c.arith_code = arith ? TRUE : FALSE;
    if (prog) jpeg_simple_progression(&c);
    c.restart_interval = restart;
    if (!gray && sub444) {
        c.comp_info[0].h_samp_factor = 1;
        c.comp_info[0].v_samp_factor = 1;
    }
    jpeg_start_compress(&c, TRUE);
    int stride = w * (gray ? 1 : 3);
    while (c.next_scanline < c.image_height) {
        JSAMPROW row = pix + c.next_scanline * stride;
        jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    jpeg_destroy_compress(&c);
    fclose(f);
}

static void write_cmyk(const char *path, int w, int h, int arith,
                       int prog, unsigned char *pix) {
    /* r13: 4-component CMYK under the arithmetic coder — libjpeg
       emits SOF9/SOF10 with 4 components and the Adobe APP14 marker
       (transform 0), the print-derived profile our decoder routes
       through the channel*K/255 ink conversion */
    struct jpeg_compress_struct c;
    struct jpeg_error_mgr err;
    c.err = jpeg_std_error(&err);
    jpeg_create_compress(&c);
    FILE *f = fopen(path, "wb");
    jpeg_stdio_dest(&c, f);
    c.image_width = w; c.image_height = h;
    c.input_components = 4;
    c.in_color_space = JCS_CMYK;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, 95, TRUE);
    c.arith_code = arith ? TRUE : FALSE;
    if (prog) jpeg_simple_progression(&c);
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
        JSAMPROW row = pix + c.next_scanline * w * 4;
        jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    jpeg_destroy_compress(&c);
    fclose(f);
}

int main(int argc, char **argv) {
    const char *dir = argv[1];
    int w = 24, h = 16;
    static unsigned char rgb[24 * 16 * 3], gray[24 * 16];
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
            int i = (y * w + x) * 3;
            int r = 40 + x * 4; if (r > 255) r = 255;
            int g = 60 + y * 5; if (g > 255) g = 255;
            rgb[i] = r; rgb[i + 1] = g; rgb[i + 2] = 96;
            int v = 30 + x * 3 + y * 2; if (v > 255) v = 255;
            gray[y * w + x] = v;
        }
    char p[512];
    snprintf(p, 512, "%s/libjpeg_arith_gray.jpg", dir);
    write_jpeg(p, w, h, 1, 1, 0, 0, 0, gray);
    snprintf(p, 512, "%s/libjpeg_arith_rgb444.jpg", dir);
    write_jpeg(p, w, h, 0, 1, 0, 1, 0, rgb);
    snprintf(p, 512, "%s/libjpeg_arith_rgb420.jpg", dir);
    write_jpeg(p, w, h, 0, 1, 0, 0, 0, rgb);
    /* 4:4:4 -> 6 MCUs at 24x16, restart_interval 2 -> RST0+RST1
       really appear in the stream (4:2:0 would have only 2 MCUs
       and emit none) */
    snprintf(p, 512, "%s/libjpeg_arith_rst.jpg", dir);
    write_jpeg(p, w, h, 0, 1, 2, 1, 0, rgb);
    snprintf(p, 512, "%s/libjpeg_huff_base.jpg", dir);
    write_jpeg(p, w, h, 0, 0, 0, 1, 0, rgb);
    /* PROGRESSIVE arithmetic (SOF10): the full simple-progression
       scan script under the adaptive entropy coder */
    snprintf(p, 512, "%s/libjpeg_arith_prog_gray.jpg", dir);
    write_jpeg(p, w, h, 1, 1, 0, 0, 1, gray);
    snprintf(p, 512, "%s/libjpeg_arith_prog_444.jpg", dir);
    write_jpeg(p, w, h, 0, 1, 0, 1, 1, rgb);
    snprintf(p, 512, "%s/libjpeg_arith_prog_420.jpg", dir);
    write_jpeg(p, w, h, 0, 1, 0, 0, 1, rgb);
    snprintf(p, 512, "%s/libjpeg_arith_prog_rst.jpg", dir);
    write_jpeg(p, w, h, 0, 1, 2, 1, 1, rgb);
    /* restart after EVERY MCU on a 5x3-MCU image: 14 markers, the
       RST7 -> RST0 wrap really occurs in the stream */
    {
        int w2 = 40, h2 = 24;
        static unsigned char rgb2[40 * 24 * 3];
        for (int y = 0; y < h2; y++)
            for (int x = 0; x < w2; x++) {
                int i = (y * w2 + x) * 3;
                int r = 40 + x * 4; if (r > 255) r = 255;
                int g = 60 + y * 5; if (g > 255) g = 255;
                rgb2[i] = r; rgb2[i + 1] = g; rgb2[i + 2] = 96;
            }
        snprintf(p, 512, "%s/libjpeg_arith_rst_wrap.jpg", dir);
        write_jpeg(p, w2, h2, 0, 1, 1, 1, 0, rgb2);
    }
    /* r13: 4-component CMYK arithmetic, sequential + progressive —
       smooth ink formulas so the tolerance checks apply */
    {
        static unsigned char cmyk[24 * 16 * 4];
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int i = (y * w + x) * 4;
                int cc = 40 + x * 4; if (cc > 255) cc = 255;
                int mm = 60 + y * 5; if (mm > 255) mm = 255;
                cmyk[i] = cc; cmyk[i + 1] = mm; cmyk[i + 2] = 96;
                cmyk[i + 3] = 255 - (x + y);
            }
        snprintf(p, 512, "%s/libjpeg_arith_cmyk.jpg", dir);
        write_cmyk(p, w, h, 1, 0, cmyk);
        snprintf(p, 512, "%s/libjpeg_arith_prog_cmyk.jpg", dir);
        write_cmyk(p, w, h, 1, 1, cmyk);
    }
    return 0;
}
"""


def check_aritab() -> None:
    """Cross-check operators/jpeg._ARITH_STATES (T.81 Table D.3) against
    the system libjpeg's packed jpeg_aritab — a transcription error in
    the probability-estimation table cannot survive fixture rebuilds."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bigdata_lab02_spark.operators.jpeg import _ARITH_STATES

    j = C.CDLL("libjpeg.so.62")
    tab = C.cast(j.jpeg_aritab, C.POINTER(C.c_int64))
    for i in range(114):
        v = tab[i]
        row = ((v >> 16) & 0xFFFF, (v >> 8) & 0xFF, v & 0x7F, (v >> 7) & 1)
        assert _ARITH_STATES[i] == row, (i, _ARITH_STATES[i], row)
    print("aritab: 114/114 rows match the system libjpeg")


def make_arith_jpegs():
    """SOF9 arithmetic-coded fixtures (and one more foreign Huffman
    baseline) from the SYSTEM libjpeg via a tiny compiled C driver —
    the ITU-T T.81 Annex D reference implementation family, sharing no
    code with our decoder. Same smooth pixel formulas as the imageio
    set, so the existing tolerance checks apply."""
    check_aritab()
    with tempfile.TemporaryDirectory() as td:
        src = Path(td) / "make_arith.c"
        src.write_text(_ARITH_C)
        exe = Path(td) / "make_arith"
        subprocess.run(
            ["gcc", "-O2", "-o", str(exe), str(src), "-ljpeg"], check=True
        )
        subprocess.run([str(exe), str(OUT)], check=True)
    spec = {"kind": "smooth_rgb", "w": 24, "h": 16, "tol": 4.0}
    return {
        "libjpeg_arith_gray.jpg": {**spec, "kind": "smooth_gray"},
        "libjpeg_arith_rgb444.jpg": dict(spec),
        "libjpeg_arith_rgb420.jpg": {**spec, "tol": 6.0},
        "libjpeg_arith_rst.jpg": {**spec, "tol": 6.0},
        "libjpeg_huff_base.jpg": dict(spec),
        "libjpeg_arith_rst_wrap.jpg": {**spec, "w": 40, "h": 24},
        "libjpeg_arith_prog_gray.jpg": {**spec, "kind": "smooth_gray"},
        "libjpeg_arith_prog_444.jpg": dict(spec),
        "libjpeg_arith_prog_420.jpg": {**spec, "tol": 6.0},
        "libjpeg_arith_prog_rst.jpg": dict(spec),
        # r13: 4-component CMYK under the arithmetic coder (APP14
        # transform 0; our decoder's channel*K/255 ink conversion) —
        # the stripe the r9 gate left as an honest failure on the
        # belief no in-container encoder existed; libjpeg disagrees
        "libjpeg_arith_cmyk.jpg": {**spec, "kind": "smooth_cmyk"},
        "libjpeg_arith_prog_cmyk.jpg": {**spec, "kind": "smooth_cmyk"},
    }


# -------------------------------------------- EXIF/APPn splicing (r9)
# The most common real-crawl JPEG shape is a photo carrying APP1/EXIF
# (and often an APP13 Photoshop IRB) ahead of SOF. The synthetic streams
# exercised the marker-skip path only with empty APPn shells; these
# segments are real-shaped payloads built per the public specs (EXIF 2.3
# §4.5 TIFF structure; marker framing ITU-T T.81 §B.1.1.3).


def exif_app1() -> bytes:
    """APP1 segment: ``Exif\\x00\\x00`` + little-endian TIFF header + a
    0th IFD with Make/Model/Orientation/DateTime (string values in the
    post-IFD data area, offset-addressed — the layout every camera
    writes)."""

    def entry(tag: int, typ: int, count: int, value: bytes) -> bytes:
        return struct.pack("<HHI", tag, typ, count) + value

    make = b"PyFixture\x00"
    model = b"SynthCam 1\x00"
    dt = b"2024:01:02 03:04:05\x00"
    # header(8) + count(2) + 4 entries * 12 + next-IFD(4) = 62
    data_off = 62
    entries = [
        entry(0x010F, 2, len(make), struct.pack("<I", data_off)),
        entry(0x0110, 2, len(model), struct.pack("<I", data_off + len(make))),
        entry(0x0112, 3, 1, struct.pack("<HH", 1, 0)),
        entry(
            0x0132, 2, len(dt),
            struct.pack("<I", data_off + len(make) + len(model)),
        ),
    ]
    tiff = (
        b"II*\x00" + struct.pack("<I", 8)
        + struct.pack("<H", len(entries)) + b"".join(entries)
        + struct.pack("<I", 0) + make + model + dt
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def app13_irb() -> bytes:
    """APP13 Photoshop IRB: ``Photoshop 3.0\\x00`` + one 8BIM resource
    block (0x0404 IPTC) — photo-editor provenance baggage crawl JPEGs
    routinely carry."""
    caption = b"synthetic fixture"
    irb = (
        b"8BIM" + struct.pack(">H", 0x0404) + b"\x00\x00"
        + struct.pack(">I", len(caption)) + caption
    )
    if len(caption) % 2:
        irb += b"\x00"
    payload = b"Photoshop 3.0\x00" + irb
    return b"\xff\xed" + struct.pack(">H", len(payload) + 2) + payload


def make_exif_jpeg():
    """Splice APP1/EXIF + APP13 directly after SOI of the committed
    ``imageio_base.jpg`` (cameras put EXIF first, before any JFIF APP0).
    Pixels are untouched, so the smooth_rgb spec carries over; the
    decoder must skip both segments to reach the tables and SOF."""
    base = (OUT / "imageio_base.jpg").read_bytes()
    assert base[:2] == b"\xff\xd8", "imageio_base.jpg missing — run make_jpegs first"
    (OUT / "imageio_exif.jpg").write_bytes(
        base[:2] + exif_app1() + app13_irb() + base[2:]
    )
    return {
        "imageio_exif.jpg": {"kind": "smooth_rgb", "w": 24, "h": 16, "tol": 4.0}
    }


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    manifest = {}
    manifest.update(make_pngs())
    manifest.update(make_jpegs())
    manifest.update(make_exif_jpeg())
    manifest.update(make_arith_jpegs())
    (OUT / "manifest.json").write_text(json.dumps(manifest, indent=2) + "\n")
    for name in sorted(manifest):
        print(f"{name}: {(OUT / name).stat().st_size} bytes")


if __name__ == "__main__":
    main()
