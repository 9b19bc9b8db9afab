"""Minimal pure-numpy baseline JPEG codec (ITU-T T.81) for the multimodal
pipeline — the third leg of the vendored-codec triad (png.py, wav.py,
y4m.py) and the format a real 100 TB crawl actually leads with.

- encode: sequential DCT, 8-bit, 3-component YCbCr (JFIF) at 4:4:4,
  4:2:0 (2×2 chroma subsampling — the profile real crawl JPEGs lead
  with), 4:2:2 (1×2), 4:4:0 (2×1 vertical — rotated 4:2:2, r8), or
  1-component grayscale; ANY positive dimensions
  (edge blocks pad to the MCU grid by replication; SOF carries the true
  dims); BASELINE (SOF0, one interleaved scan) or PROGRESSIVE (SOF2,
  the classic 6-phase scan script with successive approximation and
  cross-block EOBn runs — the encoding the majority of modern web
  JPEGs use); optional restart intervals (DRI + RSTn, the segments
  nearly all camera/web JPEGs carry); the T.81 Annex K example
  quantization tables, Annex K DC Huffman tables, and a custom (valid,
  carried in DHT like any other) AC Huffman table;
- decode: GENERAL decode of what the markers declare — arbitrary DQT/DHT
  tables, Huffman entropy decode with byte unstuffing, run-length AC
  with ZRL/EOB, per-component DC prediction, dequant, zigzag, IDCT,
  level shift, multi-block MCUs per the declared sampling factors (1×1,
  2×2, 2×1 and 1×2), arbitrary dimensions (partial edge MCUs decode whole and
  crop to the SOF dims, T.81 A.2.4), restart intervals (DRI honored; at
  each RSTn the reader
  byte-aligns, verifies the marker index is the expected one in the
  0xD0..0xD7 cycle, and resets the scan's predictors — an
  out-of-sequence or missing marker raises), 1- or 3-component SOF0 AND
  SOF2 progressive (multi-scan: DC first/refine interleaved or
  per-component, AC band first passes with general EOBn runs, AC
  refinement with correction bits per T.81 G.1.2.3; the
  successive-approximation chain is TRACKED per coefficient, so a
  refinement without its band or a re-sent band raises), chroma
  upsampling by pixel replication, YCbCr→RGB (grayscale replicates Y
  into RGB). Streams must end in EOI — a cut at a scan boundary is an
  honest failure, never a partial image.

Scope limits: sampling layouts 4:4:4 / 4:2:0 / 4:2:2 / 4:4:0 / grayscale,
plus 4-COMPONENT CMYK/YCCK in baseline AND progressive form (r10:
APP14 Adobe transform routing, CMYK 4:4:4 and YCCK 4:2:0 with
full-rate K, the documented Adobe-inverted ink conversion
channel·K/255 — the print-derived profile crawls carry; progressive
validated bit-identical to baseline; r11 adds the LOSSLESS CMYK face;
r13 adds the ARITHMETIC face — SOF9/SOF10 with 4 components, validated
against system-libjpeg JCS_CMYK foreign fixtures);
12-bit sample precision decodes in EXTENDED SEQUENTIAL form (SOF1, r9:
level shift 2048, DC categories to 15, AC to 14, Pq=1 16-bit quant
tables; pixels reduced ``>> 4`` to the engine's 8-bit surface — the PNG
16-bit discipline); ARITHMETIC entropy coding decodes in BOTH
sequential (SOF9) and progressive (SOF10) form (r9: the full T.81
Annex D adaptive binary decoder with the Table D.3 state machine, DAC
conditioning, restart resets, and the G.2 progressive models — DC
first/refine, AC first, and the zero-history-walk AC refinement — all
validated against system-libjpeg-encoded foreign fixtures); LOSSLESS
decodes in its Huffman form (SOF3, r10: the T.81 Annex H predictive
process — all seven predictors, point transform, modulo-2^16
reconstruction, precision 2..16 reduced to the 8-bit surface,
row-boundary restart intervals as real lossless/DNG writers emit; one
interleaved scan; 3-component lossless is RGB — no JFIF YCbCr contract
exists for it; r11: 4-component lossless decodes as Adobe-inverted
CMYK through the same documented channel·K/255 conversion — lossless
YCCK does not exist and claims of it fail honestly). HIERARCHICAL
(Annex J, r11) decodes in its documented grayscale profile — DHP,
baseline first frame, EXP midpoint expansion, SOF5 differential frames
with zero DC prediction and no level shift, clamp-added to the
reference (see the hierarchical section note); progressive /
arithmetic / lossless differential frames (SOF6-7/13-15) and
arithmetic LOSSLESS (SOF11 — no real-world encoder emits it, so no
foreign validation source exists) stay honest failures. Anything outside the profile raises
``JpegError``, which the pipeline maps to ``decode_ok=False`` (the
honest-failure path).

Rounding discipline (the oracle contract): every float→int step —
forward/inverse color conversion, quantization, pixel reconstruction —
uses ``floor(x + 0.5 + 1e-9)``. The 1e-9 epsilon swamps the ~1e-13
float-DCT noise on values that are exact rationals of the integer inputs,
so ties round identically in this codec and in a SQL oracle restating the
same arithmetic (the same micro-unit trick lm_perplexity uses, applied to
pixel math).

Public-knowledge provenance: ITU-T T.81 (JPEG), Annex K example tables;
JFIF 1.02 color conversion (the usual 0.299/0.587/0.114 + 1.402/1.772
constants).
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    """Payload is not a JPEG this codec's profile supports."""


# ----------------------------------------------------------- constants

# T.81 Annex K.1/K.2 example quantization tables (natural row-major order)
QUANT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
QUANT_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# T.81 Annex K.3 DC Huffman specs: (bits[1..16], values)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
# 12-bit-precision DC table: categories reach 15 (T.81 Table F.1 at
# P=12), so the Annex K shape is extended with one code per extra
# length — still a valid canonical prefix code (each deeper length
# doubles the space and consumes one slot).
DC12_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0]
DC12_VALS = list(range(16))

# Custom AC table (valid canonical code, carried in DHT): EOB0 gets a
# 2-bit code; the 161 baseline (run,size) symbols plus the 14 progressive
# EOBn symbols (r<<4, r=1..14 — end-of-band runs of 2^r..2^(r+1)-1
# blocks) get 9-bit codes. Kraft sum 2^-2 + 175·2^-9 < 1, so the
# canonical construction is well-formed. The DECODER takes whatever
# table the DHT declares.
AC_BITS = [0, 1, 0, 0, 0, 0, 0, 0, 175, 0, 0, 0, 0, 0, 0, 0]
AC_VALS = [0x00] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [0xF0] + [r << 4 for r in range(1, 15)]

# zigzag scan order as (row, col) pairs — derived, not transcribed
_ZIGZAG: list[tuple[int, int]] = []
for _d in range(15):
    _rng = range(_d + 1) if _d < 8 else range(_d - 7, 8)
    _idx = [(r, _d - r) for r in _rng]
    if _d % 2 == 0:
        _idx = _idx[::-1]
    _ZIGZAG += _idx

_EPS = 1e-9


def _rnd(x):
    """floor(x + 0.5 + eps): the codec's single float→int rounding (see
    module docstring). Works elementwise on numpy arrays."""
    return np.floor(x + (0.5 + _EPS)).astype(np.int32)


# 8x8 DCT-II basis matrix: C[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * cu * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# ----------------------------------------------------------- color space


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF forward conversion, (..., 3) uint8-ish → (..., 3) int32."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([_rnd(y), _rnd(cb), _rnd(cr)], axis=-1)
    return np.clip(out, 0, 255)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """JFIF inverse conversion, (..., 3) int → (..., 3) int32 in [0,255]."""
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([_rnd(r), _rnd(g), _rnd(b)], axis=-1)
    return np.clip(out, 0, 255)


# ----------------------------------------------------------- huffman


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) by the T.81 canonical construction. Rejects
    oversubscribed specs (more codes at a length than the canonical code
    space can hold) — a malformed DHT must raise, not produce a nonsense
    table that 'decodes' arbitrary entropy data."""
    if len(vals) != sum(bits):
        raise JpegError("huffman spec: value count != sum(bits)")
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise JpegError("oversubscribed huffman table")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def emit_marker(self, marker: int) -> None:
        """Byte-align, then emit a raw marker (markers are NOT stuffed)."""
        self.pad_align()
        self.out += bytes([0xFF, marker])

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; a marker reached through bit reads is an error — restart
    markers are consumed only at the expected MCU boundaries via
    ``restart()``."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise JpegError("entropy data truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise JpegError("entropy data truncated at 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                raise JpegError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self, expected: int) -> None:
        """Consume an RSTn at an MCU boundary: discard the pad bits to the
        byte boundary (the encoder pads with 1-bits per T.81 F.1.2.3),
        require exactly 0xFF 0xD0+``expected`` next, and byte-align the
        stream after it. Out-of-sequence markers raise — a desynced
        restart chain means the entropy data cannot be trusted."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 2 > len(self.data):
            raise JpegError("entropy data truncated before restart marker")
        if self.data[self.pos] != 0xFF:
            raise JpegError("expected restart marker")
        m = self.data[self.pos + 1]
        if not 0xD0 <= m <= 0xD7:
            raise JpegError(f"expected RSTn, found 0xFF{m:02X}")
        if m != 0xD0 + expected:
            raise JpegError(
                f"out-of-sequence restart marker RST{m - 0xD0} "
                f"(expected RST{expected})"
            )
        self.pos += 2


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise JpegError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: size-bit magnitude → signed value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ----------------------------------------------------------- encoder


def _quantize_block(block: np.ndarray, quant: np.ndarray) -> list[int]:
    """DCT → quantize one 8×8 sample block → 64 zigzag-ordered ints."""
    coef = _dct2(block.astype(np.float64) - 128.0)
    q = _rnd(coef / quant)
    return [int(q[r, c]) for r, c in _ZIGZAG]


def _emit_full_block(
    w: _BitWriter,
    zz: list[int],
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Huffman-code one quantized zigzag block (baseline full-precision
    scan); returns the new DC predictor."""
    dc = zz[0]
    diff = dc - pred
    size = _category(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = ac_codes[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        size = _category(v)
        if size > 10:
            raise JpegError("AC coefficient out of baseline range")
        c, ln = ac_codes[(run << 4) | size]
        w.write(c, ln)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        w.write(c, ln)
    return dc


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """DCT → quantize → huffman one 8×8 sample block; returns new DC pred."""
    return _emit_full_block(w, _quantize_block(block, quant), pred, dc_codes, ac_codes)


# ------------------------------------------- progressive scan emitters
# T.81 Annex G. Restart intervals count MCUs in interleaved scans and
# blocks in non-interleaved scans; every scan restarts the RSTn cycle at
# 0 and resets predictors / EOB-run state at each marker.


def _emit_dc_first(coefs, mcu_blocks, dcs, al, ri) -> bytes:
    w = _BitWriter()
    preds = [0] * len(coefs)
    units = list(mcu_blocks())
    rst = 0
    for u, (_, blocks) in enumerate(units):
        for comp, by, bx in blocks:
            v = coefs[comp][by][bx][0] >> al  # arithmetic shift (G.1.2.1)
            diff = v - preds[comp]
            preds[comp] = v
            size = _category(diff)
            code, length = dcs[comp][size]
            w.write(code, length)
            if size:
                w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        if ri and (u + 1) % ri == 0 and u + 1 < len(units):
            w.emit_marker(0xD0 + rst % 8)
            rst += 1
            preds = [0] * len(coefs)
    return w.flush()


def _emit_dc_refine(coefs, mcu_blocks, al, ri) -> bytes:
    w = _BitWriter()
    units = list(mcu_blocks())
    rst = 0
    for u, (_, blocks) in enumerate(units):
        for comp, by, bx in blocks:
            w.write((coefs[comp][by][bx][0] >> al) & 1, 1)
        if ri and (u + 1) % ri == 0 and u + 1 < len(units):
            w.emit_marker(0xD0 + rst % 8)
            rst += 1
    return w.flush()


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: sign-preserving magnitude shift (G.1.2.1 —
    NOT the DC arithmetic shift)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _comp_blocks(coefarr, nbx=None, nby=None):
    """(by, bx) raster order over one component's CODED block grid —
    T.81 A.2.2: non-interleaved scans cover ceil(component samples / 8)
    blocks per axis, not the MCU-padded grid (the padding blocks are
    coded only by interleaved scans and stay zero otherwise)."""
    nby = len(coefarr) if nby is None else nby
    nbx = len(coefarr[0]) if nbx is None else nbx
    return [(by, bx) for by in range(nby) for bx in range(nbx)]


class _EobRun:
    """Cross-block end-of-band run aggregation (T.81 G.1.2.2): blocks
    whose band is exhausted join a pending EOBn run; the run (plus any
    refinement correction bits buffered while it grew) flushes before
    the next block with content, before each restart marker, and at
    scan end. Greedy decomposition into EOBn symbols (run ∈
    [2^r, 2^(r+1)-1], r ≤ 14)."""

    def __init__(self, w: _BitWriter, ac_codes) -> None:
        self.w = w
        self.ac = ac_codes
        self.run = 0
        self.bits: list[int] = []  # deferred refinement correction bits

    def add(self, correction_bits: list[int] | None = None) -> None:
        self.run += 1
        if correction_bits:
            self.bits.extend(correction_bits)
        if self.run == 0x7FFF:  # spec cap (r <= 14)
            self.flush()

    def flush(self) -> None:
        while self.run > 0:
            r = min(14, self.run.bit_length() - 1)
            take = min(self.run, (1 << (r + 1)) - 1)
            c, ln = self.ac[r << 4] if r else self.ac[0x00]
            self.w.write(c, ln)
            if r:
                self.w.write(take - (1 << r), r)
            self.run -= take
        for b in self.bits:
            self.w.write(b, 1)
        self.bits = []


def _emit_ac_first(coefarr, ac_codes, ss, se, al, ri,
                   nbx=None, nby=None) -> bytes:
    """First AC pass of one band, one component, with cross-block EOBn
    run aggregation."""
    w = _BitWriter()
    blocks = _comp_blocks(coefarr, nbx, nby)
    eob = _EobRun(w, ac_codes)
    rst = 0
    for u, (by, bx) in enumerate(blocks):
        zz = coefarr[by][bx]
        band = [_pt_ac(zz[k], al) for k in range(ss, se + 1)]
        last_nz = -1
        for i in range(len(band) - 1, -1, -1):
            if band[i]:
                last_nz = i
                break
        if last_nz >= 0:
            eob.flush()  # pending run ends before a block with content
        run = 0
        for i in range(last_nz + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                c, ln = ac_codes[0xF0]
                w.write(c, ln)
                run -= 16
            size = _category(v)
            c, ln = ac_codes[(run << 4) | size]
            w.write(c, ln)
            w.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if last_nz < len(band) - 1:
            eob.add()  # this block's EOB joins (or starts) the run
        if ri and (u + 1) % ri == 0 and u + 1 < len(blocks):
            eob.flush()  # a run must not span a restart interval
            w.emit_marker(0xD0 + rst % 8)
            rst += 1
    eob.flush()
    return w.flush()


def _emit_ac_refine(coefarr, ac_codes, ss, se, al, ri,
                    nbx=None, nby=None) -> bytes:
    """AC refinement pass (G.1.2.3): newly-significant coefficients are
    run-length coded over ZERO-HISTORY positions; correction bits for
    already-nonzero coefficients are buffered and flushed after each
    emitted code. Blocks with no newly-significant coefficients join a
    cross-block EOBn run; their leftover correction bits ride the run
    buffer and flush after the EOBn symbol, in block order — exactly
    the order the decoder's per-block tail handler consumes them."""
    w = _BitWriter()
    blocks = _comp_blocks(coefarr, nbx, nby)
    eob_run = _EobRun(w, ac_codes)
    rst = 0
    for u, (by, bx) in enumerate(blocks):
        zz = coefarr[by][bx]
        absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
        sign = [1 if zz[k] >= 0 else -1 for k in range(ss, se + 1)]
        eob = -1  # index of last newly-significant coefficient
        for i in range(len(absv) - 1, -1, -1):
            if absv[i] == 1:
                eob = i
                break
        if eob >= 0:
            eob_run.flush()  # pending run ends before a block with content
        run = 0
        br_bits: list[int] = []
        for i in range(len(absv)):
            t = absv[i]
            if t == 0:
                run += 1
                continue
            while run >= 16 and i <= eob:
                c, ln = ac_codes[0xF0]
                w.write(c, ln)
                run -= 16
                for b in br_bits:
                    w.write(b, 1)
                br_bits = []
            if t > 1:
                br_bits.append(t & 1)  # history coefficient: correction bit
                continue
            if i > eob:  # can't happen: eob is the LAST magnitude-1 coef
                break
            c, ln = ac_codes[(run << 4) | 1]
            w.write(c, ln)
            w.write(1 if sign[i] > 0 else 0, 1)
            run = 0
            for b in br_bits:
                w.write(b, 1)
            br_bits = []
        if run > 0 or br_bits:
            eob_run.add(br_bits)  # block's EOB joins the run; bits deferred
        if ri and (u + 1) % ri == 0 and u + 1 < len(blocks):
            eob_run.flush()  # a run must not span a restart interval
            w.emit_marker(0xD0 + rst % 8)
            rst += 1
    eob_run.flush()
    return w.flush()


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt_body(tid: int, table: np.ndarray) -> bytes:
    return bytes([tid]) + bytes(int(table[r, c]) for r, c in _ZIGZAG)


def _dqt_body16(tid: int, table: np.ndarray) -> bytes:
    """Pq=1 (16-bit entry) DQT body — what 12-bit streams usually carry."""
    return bytes([0x10 | tid]) + b"".join(
        struct.pack(">H", int(table[r, c])) for r, c in _ZIGZAG
    )


def _dht_body(cls_id: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([cls_id]) + bytes(bits) + bytes(vals)


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2×2 average downsample with the codec's rounding rule."""
    h, w = plane.shape
    m = plane.astype(np.float64).reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    return np.clip(_rnd(m), 0, 255)


def _downsample_h(plane: np.ndarray) -> np.ndarray:
    """1×2 horizontal average downsample (4:2:2 chroma)."""
    h, w = plane.shape
    m = plane.astype(np.float64).reshape(h, w // 2, 2).mean(axis=2)
    return np.clip(_rnd(m), 0, 255)


def _downsample_v(plane: np.ndarray) -> np.ndarray:
    """2×1 vertical average downsample (4:4:0 chroma — the layout
    rotated/transposed 4:2:2 files carry)."""
    h, w = plane.shape
    m = plane.astype(np.float64).reshape(h // 2, 2, w).mean(axis=1)
    return np.clip(_rnd(m), 0, 255)


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode raw row-major RGB bytes (``width*height*3``) as a baseline
    or progressive JFIF JPEG, at ANY positive dimensions (r7: edge
    blocks are padded to the MCU grid by edge replication; SOF carries
    the true dims and the decoder crops — arbitrary dims are the norm
    in a real crawl). ``subsampling``: "444", "420" (2×2-averaged
    chroma), "422" (1×2 horizontally-averaged chroma — the classic
    video/camera profile), "440" (2×1 vertically-averaged chroma — what
    rotated/transposed 4:2:2 files carry), or "gray" (1-component luma-only — the RGB
    input is converted and the chroma discarded). ``restart_interval``
    > 0 emits a DRI segment and an RSTn marker (cycling 0..7) after
    every that many MCUs (interleaved scans) / blocks (non-interleaved
    scans) — the stream layout nearly all camera/web baseline JPEGs use.

    ``progressive=True`` emits SOF2 with the classic 6-phase scan
    script (T.81 Annex G): interleaved DC first pass at Al=1, DC
    refinement to Al=0, then per component AC bands 1-5 and 6-63 at
    Al=1 followed by their Ah=1→Al=0 refinement scans. The quantized
    coefficients are IDENTICAL to the baseline encoding — progressive
    is a reordering of the same data, so decode output is bit-for-bit
    the baseline decode (tests assert that). AC passes aggregate
    cross-block EOBn runs (flushed at content blocks, restart
    boundaries and scan end — a run never spans a restart)."""
    if subsampling == "444":
        hv = [(1, 1), (1, 1), (1, 1)]
    elif subsampling == "420":
        hv = [(2, 2), (1, 1), (1, 1)]
    elif subsampling == "422":
        hv = [(2, 1), (1, 1), (1, 1)]
    elif subsampling == "440":
        hv = [(1, 2), (1, 1), (1, 1)]
    elif subsampling == "gray":
        hv = [(1, 1)]
    else:
        raise JpegError(f"unsupported subsampling {subsampling!r}")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise JpegError("restart_interval out of range")
    hmax = max(h for h, _ in hv)
    vmax = max(v for _, v in hv)
    if width <= 0 or height <= 0:
        raise JpegError("dimensions must be positive")
    if len(rgb) != width * height * 3:
        raise JpegError(
            f"pixel buffer is {len(rgb)} bytes, want {width * height * 3}"
        )
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    # pad to the MCU grid by edge replication (SOF keeps the true dims;
    # the decoder reconstructs the padded grid and crops) — arbitrary
    # dimensions are the norm in a real crawl
    pw = 8 * hmax * (-(-width // (8 * hmax)))
    ph = 8 * vmax * (-(-height // (8 * vmax)))
    if (pw, ph) != (width, height):
        img = np.pad(
            img, ((0, ph - height), (0, pw - width), (0, 0)), mode="edge"
        )
    ycc = rgb_to_ycbcr(img)
    if subsampling == "gray":
        planes = [ycc[..., 0]]
    else:
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        if subsampling == "420":
            planes = [planes[0], _downsample2(planes[1]), _downsample2(planes[2])]
        elif subsampling == "422":
            planes = [planes[0], _downsample_h(planes[1]), _downsample_h(planes[2])]
        elif subsampling == "440":
            planes = [planes[0], _downsample_v(planes[1]), _downsample_v(planes[2])]

    dc_lum = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    dc_chrom = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac = _canonical_codes(AC_BITS, AC_VALS)

    ncomp = len(hv)
    quants = [QUANT_LUM, QUANT_CHROM, QUANT_CHROM][:ncomp]
    dcs = [dc_lum, dc_chrom, dc_chrom][:ncomp]
    # quantized coefficients per component (block-raster order, zigzag):
    # the SAME data feeds the baseline single scan and the progressive
    # scan script — progressive is a reordering, not a re-encoding
    coefs: list[list[list[list[int]]]] = []
    for comp, (ch, cv) in enumerate(hv):
        plane = planes[comp]
        plane_h, plane_w = plane.shape
        coefs.append(
            [
                [
                    _quantize_block(
                        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                        quants[comp],
                    )
                    for bx in range(plane_w // 8)
                ]
                for by in range(plane_h // 8)
            ]
        )

    n_mcux = pw // (8 * hmax)
    n_mcuy = ph // (8 * vmax)

    def mcu_blocks():
        """(comp, by, bx) in interleaved MCU order, yielding MCU index."""
        for my in range(n_mcuy):
            for mx in range(n_mcux):
                yield my * n_mcux + mx, [
                    (comp, my * cv + vy, mx * ch + vx)
                    for comp, (ch, cv) in enumerate(hv)
                    for vy in range(cv)
                    for vx in range(ch)
                ]

    scans: list[tuple[bytes, bytes]] = []  # (sos body, entropy bytes)

    def sos_body(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        tabs = ((1, 0x00), (2, 0x11), (3, 0x11))
        for cid in comp_ids:
            body += bytes([cid, tabs[cid - 1][1]])
        return body + bytes([ss, se, (ah << 4) | al])

    if not progressive:
        w = _BitWriter()
        preds = [0] * ncomp
        n_mcus = n_mcux * n_mcuy
        rst_idx = 0
        for mcu_idx, blocks in mcu_blocks():
            for comp, by, bx in blocks:
                preds[comp] = _emit_full_block(
                    w, coefs[comp][by][bx], preds[comp], dcs[comp], ac
                )
            if (
                restart_interval
                and (mcu_idx + 1) % restart_interval == 0
                and mcu_idx + 1 < n_mcus  # no RSTn after the final MCU
            ):
                w.emit_marker(0xD0 + rst_idx % 8)
                rst_idx += 1
                preds = [0] * ncomp
        scans.append((sos_body(list(range(1, ncomp + 1)), 0, 63, 0, 0), w.flush()))
    else:
        all_ids = list(range(1, ncomp + 1))
        scans.append(
            (
                sos_body(all_ids, 0, 0, 0, 1),
                _emit_dc_first(coefs, mcu_blocks, dcs, 1, restart_interval),
            )
        )
        scans.append(
            (
                sos_body(all_ids, 0, 0, 1, 0),
                _emit_dc_refine(coefs, mcu_blocks, 0, restart_interval),
            )
        )
        # T.81 A.2.2 coded grid for non-interleaved AC scans: ceil of the
        # component's TRUE sample extent, not the MCU-padded grid
        def comp_grid(comp):
            ch, cv = hv[comp]
            return (
                -(-(-(-width * ch // hmax)) // 8),
                -(-(-(-height * cv // vmax)) // 8),
            )

        for ss, se in ((1, 5), (6, 63)):
            for comp in range(ncomp):
                nbx_c, nby_c = comp_grid(comp)
                scans.append(
                    (
                        sos_body([comp + 1], ss, se, 0, 1),
                        _emit_ac_first(
                            coefs[comp], ac, ss, se, 1, restart_interval,
                            nbx=nbx_c, nby=nby_c,
                        ),
                    )
                )
        for ss, se in ((1, 5), (6, 63)):
            for comp in range(ncomp):
                nbx_c, nby_c = comp_grid(comp)
                scans.append(
                    (
                        sos_body([comp + 1], ss, se, 1, 0),
                        _emit_ac_refine(
                            coefs[comp], ac, ss, se, 0, restart_interval,
                            nbx=nbx_c, nby=nby_c,
                        ),
                    )
                )

    jfif = b"JFIF\x00" + bytes([1, 2, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # SOF0/SOF2: precision 8, dims, n components, sampling + quant per comp
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    comp_meta = (((1, 0), (2, 1), (3, 1)))[:ncomp]
    for (cid, tq), (ch, cv) in zip(comp_meta, hv):
        sof += bytes([cid, (ch << 4) | cv, tq])
    out = (
        b"\xff\xd8"  # SOI
        + _seg(0xE0, jfif)
        + _seg(0xDB, _dqt_body(0, QUANT_LUM))
    )
    if ncomp == 3:
        out += _seg(0xDB, _dqt_body(1, QUANT_CHROM))
    out += _seg(0xC2 if progressive else 0xC0, sof)
    out += _seg(0xC4, _dht_body(0x00, DC_LUM_BITS, DC_LUM_VALS))
    if ncomp == 3:
        out += _seg(0xC4, _dht_body(0x01, DC_CHROM_BITS, DC_CHROM_VALS))
    out += _seg(0xC4, _dht_body(0x10, AC_BITS, AC_VALS))
    if ncomp == 3:
        out += _seg(0xC4, _dht_body(0x11, AC_BITS, AC_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    for body, entropy in scans:
        out += _seg(0xDA, body) + entropy
    return out + b"\xff\xd9"  # EOI


def encode_jpeg12_gray(
    width: int,
    height: int,
    samples,
    quant16: bool = False,
) -> bytes:
    """12-bit grayscale EXTENDED-SEQUENTIAL (SOF1) encoder (r9) — the
    medical/scientific-imaging profile, and the fixture source for the
    decoder's 12-bit path. ``samples`` is ``width*height`` ints in
    0..4095, row-major. Level shift is 2048 (T.81 F.1.1.3 at P=12) and
    the DC Huffman table carries all 16 categories (``DC12_BITS``).
    ``quant16=True`` writes the quant table as a Pq=1 (16-bit-entry)
    DQT — same values, exercising the decoder's wide-table parse, the
    layout most real 12-bit writers emit.

    Smooth content only by design: the Annex-K-shaped AC table tops out
    at magnitude category 10, so a quantized AC coefficient needing
    more raises ``JpegError`` instead of emitting an undecodable symbol
    (with ``QUANT_LUM`` this admits all slowly-varying 12-bit content;
    hard 12-bit edges would need a custom AC table)."""
    arr = np.asarray(list(samples), dtype=np.int64)
    if arr.size != width * height:
        raise JpegError(
            f"sample buffer is {arr.size} values, want {width * height}"
        )
    if width <= 0 or height <= 0:
        raise JpegError("dimensions must be positive")
    if arr.min() < 0 or arr.max() > 4095:
        raise JpegError("12-bit samples must be in 0..4095")
    plane = arr.reshape(height, width).astype(np.float64)
    pw, ph = 8 * (-(-width // 8)), 8 * (-(-height // 8))
    if (pw, ph) != (width, height):
        plane = np.pad(
            plane, ((0, ph - height), (0, pw - width)), mode="edge"
        )
    dc = _canonical_codes(DC12_BITS, DC12_VALS)
    ac = _canonical_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    pred = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            q = _rnd(_dct2(block - 2048.0) / QUANT_LUM)
            zz = [int(q[r, c]) for r, c in _ZIGZAG]
            for v in zz[1:]:
                if v and _category(v) > 10:
                    raise JpegError(
                        "AC magnitude exceeds the Annex-K table "
                        "(content too sharp for this 12-bit profile)"
                    )
            pred = _emit_full_block(w, zz, pred, dc, ac)
    entropy = w.flush()
    jfif = (
        b"JFIF\x00" + bytes([1, 2, 0]) + struct.pack(">HH", 1, 1)
        + b"\x00\x00"
    )
    sof = bytes([12]) + struct.pack(">HH", height, width) + bytes([1])
    sof += bytes([1, 0x11, 0])
    dqt = _dqt_body16(0, QUANT_LUM) if quant16 else _dqt_body(0, QUANT_LUM)
    return (
        b"\xff\xd8"
        + _seg(0xE0, jfif)
        + _seg(0xDB, dqt)
        + _seg(0xC1, sof)  # SOF1: extended sequential
        + _seg(0xC4, _dht_body(0x00, DC12_BITS, DC12_VALS))
        + _seg(0xC4, _dht_body(0x10, AC_BITS, AC_VALS))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + entropy
        + b"\xff\xd9"
    )


def encode_jpeg_cmyk(
    width: int,
    height: int,
    stored: bytes,
    transform: int = 0,
    subsampling: str = "444",
    app14: bool = True,
    progressive: bool = False,
) -> bytes:
    """4-component baseline encoder (r10) — the print-derived
    CMYK/YCCK profile and the fixture source for the decoder's 4-comp
    path. ``stored`` is ``width*height*4`` bytes of STORED-domain
    samples (the Adobe-inverted convention the decoder documents:
    255 = no ink), interleaved row-major. ``transform``: 0 writes the
    channels as (inverted) CMYK; 2 marks them YCCK (the first three
    are a YCbCr triple; ``subsampling='420'`` then downsamples Cb/Cr
    while Y and K keep full rate — the Adobe layout). ``app14=False``
    omits the Adobe segment (a 4-comp stream with no APP14 defaults to
    the CMYK reading, which the tests pin). ``progressive=True`` emits
    SOF2 with the same 6-phase scan script as ``encode_jpeg`` over the
    IDENTICAL quantized coefficients — decode must be bit-for-bit the
    baseline decode, which is how the 4-comp progressive decode path
    is validated (the same reordering-not-re-encoding discipline the
    3-component progressive path established)."""
    if transform not in (0, 2):
        raise JpegError("transform must be 0 (CMYK) or 2 (YCCK)")
    if subsampling not in ("444", "420"):
        raise JpegError("CMYK subsampling must be 444 or 420")
    if subsampling == "420" and transform != 2:
        raise JpegError("4:2:0 is the YCCK layout (chroma subsampled)")
    if width <= 0 or height <= 0:
        raise JpegError("dimensions must be positive")
    if len(stored) != width * height * 4:
        raise JpegError(
            f"pixel buffer is {len(stored)} bytes, want {width * height * 4}"
        )
    hv = (
        [(2, 2), (1, 1), (1, 1), (2, 2)]
        if subsampling == "420"
        else [(1, 1)] * 4
    )
    hmax = max(h for h, _ in hv)
    vmax = max(v for _, v in hv)
    img = np.frombuffer(stored, dtype=np.uint8).reshape(height, width, 4)
    pw = 8 * hmax * (-(-width // (8 * hmax)))
    ph = 8 * vmax * (-(-height // (8 * vmax)))
    if (pw, ph) != (width, height):
        img = np.pad(
            img, ((0, ph - height), (0, pw - width), (0, 0)), mode="edge"
        )
    planes = [img[..., c].astype(np.int32) for c in range(4)]
    if subsampling == "420":
        planes[1] = _downsample2(planes[1])
        planes[2] = _downsample2(planes[2])
    # YCCK: Y and K quantize like luminance, Cb/Cr like chrominance;
    # plain CMYK uses the luminance table for every ink channel
    if transform == 2:
        quants = [QUANT_LUM, QUANT_CHROM, QUANT_CHROM, QUANT_LUM]
        tabsel = [0, 1, 1, 0]
    else:
        quants = [QUANT_LUM] * 4
        tabsel = [0, 0, 0, 0]
    dc_lum = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    dc_chrom = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac = _canonical_codes(AC_BITS, AC_VALS)
    dcs = [dc_lum if t == 0 else dc_chrom for t in tabsel]
    coefs = []
    for comp, (ch, cv) in enumerate(hv):
        plane = planes[comp]
        plane_h, plane_w = plane.shape
        coefs.append(
            [
                [
                    _quantize_block(
                        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                        quants[comp],
                    )
                    for bx in range(plane_w // 8)
                ]
                for by in range(plane_h // 8)
            ]
        )
    n_mcux = pw // (8 * hmax)
    n_mcuy = ph // (8 * vmax)

    def mcu_blocks():
        for my in range(n_mcuy):
            for mx in range(n_mcux):
                yield my * n_mcux + mx, [
                    (comp, my * cv + vy, mx * ch + vx)
                    for comp, (ch, cv) in enumerate(hv)
                    for vy in range(cv)
                    for vx in range(ch)
                ]

    def sos_body(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            t = tabsel[cid - 1]
            body += bytes([cid, (t << 4) | t])
        return body + bytes([ss, se, (ah << 4) | al])

    scans: list[tuple[bytes, bytes]] = []
    if not progressive:
        w = _BitWriter()
        preds = [0] * 4
        for _, blocks in mcu_blocks():
            for comp, by, bx in blocks:
                preds[comp] = _emit_full_block(
                    w, coefs[comp][by][bx], preds[comp], dcs[comp], ac
                )
        scans.append((sos_body([1, 2, 3, 4], 0, 63, 0, 0), w.flush()))
    else:
        all_ids = [1, 2, 3, 4]
        scans.append(
            (sos_body(all_ids, 0, 0, 0, 1),
             _emit_dc_first(coefs, mcu_blocks, dcs, 1, 0))
        )
        scans.append(
            (sos_body(all_ids, 0, 0, 1, 0),
             _emit_dc_refine(coefs, mcu_blocks, 0, 0))
        )

        def comp_grid(comp):
            ch, cv = hv[comp]
            return (
                -(-(-(-width * ch // hmax)) // 8),
                -(-(-(-height * cv // vmax)) // 8),
            )

        for ah in (0, 1):  # first passes at Al=1, then refinements to 0
            for ss, se in ((1, 5), (6, 63)):
                for comp in range(4):
                    nbx_c, nby_c = comp_grid(comp)
                    emit = _emit_ac_refine if ah else _emit_ac_first
                    scans.append(
                        (
                            sos_body([comp + 1], ss, se, ah, 1 - ah),
                            emit(
                                coefs[comp], ac, ss, se, 1 - ah, 0,
                                nbx=nbx_c, nby=nby_c,
                            ),
                        )
                    )
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([4])
    for c, ((ch, cv), t) in enumerate(zip(hv, tabsel)):
        sof += bytes([c + 1, (ch << 4) | cv, t])
    out = b"\xff\xd8"
    if app14:
        out += _seg(
            0xEE,
            b"Adobe" + struct.pack(">H", 100) + b"\x00\x00\x00\x00"
            + bytes([transform]),
        )
    out += _seg(0xDB, _dqt_body(0, QUANT_LUM))
    if transform == 2:
        out += _seg(0xDB, _dqt_body(1, QUANT_CHROM))
    out += _seg(0xC2 if progressive else 0xC0, sof)
    out += _seg(0xC4, _dht_body(0x00, DC_LUM_BITS, DC_LUM_VALS))
    out += _seg(0xC4, _dht_body(0x10, AC_BITS, AC_VALS))
    if transform == 2:
        out += _seg(0xC4, _dht_body(0x01, DC_CHROM_BITS, DC_CHROM_VALS))
        out += _seg(0xC4, _dht_body(0x11, AC_BITS, AC_VALS))
    for body, entropy in scans:
        out += _seg(0xDA, body) + entropy
    return out + b"\xff\xd9"


# ------------------------------------------- lossless (SOF3, Annex H, r10)

# DC-class Huffman table carrying ALL 17 lossless difference categories
# (SSSS 0..16; 16 is the special diff=32768 symbol, T.81 H.1.2.2).
# Kraft sum 1/4 + 5/8 + (2^-4 + ... + 2^-14) < 1 — valid canonical code.
DCLL_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0]
DCLL_VALS = list(range(17))


def _lossless_predict(
    arr: np.ndarray, x: int, y: int, pred: int, default: int, base_row: int
) -> int:
    """T.81 H.1.2.1 prediction: the first sample of the first line (of
    the scan or of a restart interval — ``base_row``) predicts from the
    default 2^(P-Pt-1); the rest of that line uses Ra; the first column
    of other lines uses Rb; everywhere else the selected predictor 1-7
    applies (divisions by 2 are arithmetic right shifts per the spec
    note)."""
    if y == base_row:
        return default if x == 0 else int(arr[y, x - 1])
    if x == 0:
        return int(arr[y - 1, 0])
    ra = int(arr[y, x - 1])
    rb = int(arr[y - 1, x])
    rc = int(arr[y - 1, x - 1])
    if pred == 1:
        return ra
    if pred == 2:
        return rb
    if pred == 3:
        return rc
    if pred == 4:
        return ra + rb - rc
    if pred == 5:
        return ra + ((rb - rc) >> 1)
    if pred == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # pred == 7


def encode_jpeg_lossless(
    width: int,
    height: int,
    samples,
    ncomp: int = 1,
    precision: int = 8,
    predictor: int = 1,
    point_transform: int = 0,
    restart_rows: int = 0,
) -> bytes:
    """LOSSLESS JPEG encoder (SOF3, T.81 Annex H) — the
    medical/raw-photo (DNG) profile and the fixture source for the
    decoder's lossless path. ``samples`` is ``width*height*ncomp``
    ints, row-major, components interleaved; decode reproduces the
    point-transformed samples EXACTLY (that exactness is what the
    oracle gate pins). 1 component (grayscale), 3 (carried as-is —
    lossless streams have no JFIF YCbCr contract; 3-component means
    RGB here, matching what real RGB lossless writers emit), or 4
    (r11: Adobe-inverted CMYK ink values, the lossless face of the
    print-derived profile — the decoder applies the same documented
    channel·K/255 conversion as the DCT CMYK path).

    ``predictor`` selects H.1 predictor 1-7 (Ss in the scan header);
    ``point_transform`` (Al) drops low bits before prediction;
    ``restart_rows`` > 0 emits one RSTn every that-many sample ROWS
    (DRI is counted in MCUs = samples; real lossless writers restart at
    row boundaries — DNG readers assume it — and the decoder scopes to
    that)."""
    if precision not in (8, 16):
        raise JpegError("lossless encoder supports precision 8 or 16")
    if not 1 <= predictor <= 7:
        raise JpegError("predictor must be 1..7")
    if not 0 <= point_transform < precision:
        raise JpegError("point transform must be in 0..precision-1")
    if ncomp not in (1, 3, 4):
        raise JpegError(f"{ncomp} components unsupported")
    if width <= 0 or height <= 0:
        raise JpegError("dimensions must be positive")
    arr = np.asarray(list(samples), dtype=np.int64)
    if arr.size != width * height * ncomp:
        raise JpegError(
            f"sample buffer is {arr.size} values, want "
            f"{width * height * ncomp}"
        )
    maxv = (1 << precision) - 1
    if arr.min() < 0 or arr.max() > maxv:
        raise JpegError(f"{precision}-bit samples must be in 0..{maxv}")
    planes = [
        (arr.reshape(height, width, ncomp)[:, :, c] >> point_transform)
        .astype(np.int32)
        for c in range(ncomp)
    ]
    default = 1 << (precision - point_transform - 1)
    dc = _canonical_codes(DCLL_BITS, DCLL_VALS)
    w = _BitWriter()
    ri_mcus = restart_rows * width if restart_rows else 0
    base_row = 0
    rst = 0
    for y in range(height):
        if restart_rows and y and y % restart_rows == 0:
            w.emit_marker(0xD0 + rst % 8)
            rst += 1
            base_row = y
        for x in range(width):
            for plane in planes:
                px = _lossless_predict(
                    plane, x, y, predictor, default, base_row
                )
                diff = (int(plane[y, x]) - px) & 0xFFFF
                if diff == 32768:
                    code, length = dc[16]
                    w.write(code, length)
                    continue
                sdiff = diff - 65536 if diff > 32767 else diff
                cat = _category(sdiff)
                code, length = dc[cat]
                w.write(code, length)
                if cat:
                    v = sdiff + (1 << cat) - 1 if sdiff < 0 else sdiff
                    w.write(v, cat)
    entropy = w.flush()
    sof = bytes([precision]) + struct.pack(">HH", height, width)
    sof += bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])  # Tq ignored in lossless
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, point_transform])
    out = b"\xff\xd8" + _seg(0xC4, _dht_body(0x00, DCLL_BITS, DCLL_VALS))
    out += _seg(0xC3, sof)
    if ri_mcus:
        if ri_mcus > 0xFFFF:
            raise JpegError("restart interval exceeds the DRI field")
        out += _seg(0xDD, struct.pack(">H", ri_mcus))
    return out + _seg(0xDA, sos) + entropy + b"\xff\xd9"


# ---------------------------------------- arithmetic entropy coding (r9)

# T.81 Table D.3 — the Qe probability-estimation state machine:
# (Qe, next state after MPS, next state after LPS, MPS-switch flag).
# Values are the spec's; the extraction script in
# tools/make_foreign_fixtures.py cross-checks this table against the
# system libjpeg's packed jpeg_aritab at fixture-build time, so a
# transcription error here cannot survive. Index 113 is the
# non-adapting "fixed 0.5" state used for AC coefficient signs
# (F.1.4.4.2.1).
_ARITH_STATES = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
]


def _find_next_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker's 0xFF at/after ``pos``,
    skipping stuffed FF00 pairs and FF fill bytes (B.1.1.2)."""
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            pos += 1
        elif data[pos + 1] == 0x00:
            pos += 2
        elif data[pos + 1] == 0xFF:
            pos += 1
        else:
            return pos
    raise JpegError("entropy data ends without a marker")


class _ArithDecoder:
    """T.81 Annex D binary arithmetic decoder (software conventions,
    Figures D.15-D.20) in the classic lazy-renormalization formulation:
    ``c`` accumulates whole bytes as they are consumed and ``ct`` tracks
    the pending shift, so the MPS subinterval is aligned with
    ``(a - qe) << ct`` at compare time; initialization falls out of
    starting at ``ct = -16`` (the first two renormalization fetches
    load the register and set A to 0x10000).

    Statistics bins are single bytes: bit 7 = current MPS sense, bits
    0-6 = the _ARITH_STATES index. 0xFF handling per D.1.6: FF00 is a
    stuffed data byte; reaching a real marker is LEGAL mid-scan in
    arithmetic coding — the position is latched and zero bytes are
    supplied so the tail symbols decode from padding."""

    __slots__ = ("data", "pos", "c", "a", "ct", "marker_pos")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.c = 0
        self.a = 0
        self.ct = -16
        self.marker_pos = -1

    def _next_byte(self) -> int:
        if self.marker_pos >= 0:
            return 0
        d, p = self.data, self.pos
        if p >= len(d):
            raise JpegError("arithmetic scan truncated")
        b = d[p]
        if b != 0xFF:
            self.pos = p + 1
            return b
        q = p + 1
        while q < len(d) and d[q] == 0xFF:
            q += 1
        if q >= len(d):
            raise JpegError("arithmetic scan truncated at 0xFF")
        if d[q] == 0x00:
            self.pos = q + 1
            return 0xFF
        self.marker_pos = p
        return 0

    def decode(self, stats: bytearray, i: int) -> int:
        # renormalization + byte feed (D.2.6; doubles as INITDEC)
        a, ct, c = self.a, self.ct, self.c
        while a < 0x8000:
            ct -= 1
            if ct < 0:
                c = (c << 8) | self._next_byte()
                ct += 8
                if ct < 0:
                    ct += 1
                    if ct == 0:
                        a = 0x8000
            a <<= 1
        sv = stats[i]
        qe, nmps, nlps, sw = _ARITH_STATES[sv & 0x7F]
        a -= qe
        mps_span = a << ct
        if c >= mps_span:
            # LPS subinterval (conditional exchange per D.2.3)
            c -= mps_span
            if a < qe:
                stats[i] = (sv & 0x80) ^ nmps  # exchanged: decoded MPS
            else:
                stats[i] = (sv & 0x80) ^ nlps ^ (sw << 7)
                sv ^= 0x80                     # decoded LPS
            a = qe
        elif a < 0x8000:
            # MPS subinterval, renormalization due -> state update
            if a < qe:
                stats[i] = (sv & 0x80) ^ nlps ^ (sw << 7)
                sv ^= 0x80                     # exchanged: decoded LPS
            else:
                stats[i] = (sv & 0x80) ^ nmps  # decoded MPS
        self.a, self.ct, self.c = a, ct, c
        return sv >> 7


class _ArithSeqState:
    """Per-scan statistics for sequential DCT arithmetic decoding
    (F.2.4): one 49-bin DC area per DC table, one 245-bin AC area per
    AC table, the fixed sign bin, and per-component DC conditioning
    (context class + predictor). Reset whole at scan start and at every
    restart marker (F.2.1.3.1)."""

    def __init__(self, order, ncomp: int) -> None:
        self.dc = {dc_t: bytearray(64) for _, dc_t, _ in order}
        self.ac = {ac_t: bytearray(256) for _, _, ac_t in order}
        self.fixed = bytearray([113])
        self.dc_ctx = [0] * ncomp
        self.last_dc = [0] * ncomp


def _arith_dc_first(
    dec: _ArithDecoder,
    zz,
    state: _ArithSeqState,
    comp: int,
    dc_t: int,
    dc_l: int,
    dc_u: int,
    al: int,
) -> None:
    """DC coefficient decode (T.81 F.2.4.1; Figures F.21/F.23/F.24):
    the diff model over the previous-diff conditioning class. Serves
    both the sequential full scan (al=0) and the progressive DC-first
    pass — the predictor accumulates UNSHIFTED diffs and the stored
    coefficient carries the ``<< Al`` point transform."""
    dcst = state.dc[dc_t]
    ctx = state.dc_ctx[comp]
    if dec.decode(dcst, ctx) == 0:
        state.dc_ctx[comp] = 0
    else:
        sign = dec.decode(dcst, ctx + 1)
        st = ctx + 2 + sign
        m = dec.decode(dcst, st)
        if m:
            st = 20  # Table F.4: X1
            while dec.decode(dcst, st):
                m <<= 1
                if m == 0x8000:
                    raise JpegError("arithmetic DC magnitude overflow")
                st += 1
        # conditioning class for the NEXT block of this component
        # (F.1.4.4.1.2; L/U from the DAC segment, defaults 0/1)
        if m < (1 << dc_l) >> 1:
            state.dc_ctx[comp] = 0
        elif m > (1 << dc_u) >> 1:
            state.dc_ctx[comp] = 12 + sign * 4
        else:
            state.dc_ctx[comp] = 4 + sign * 4
        v = m
        st += 14  # Table F.4: the shared mantissa bin
        while m := m >> 1:
            if dec.decode(dcst, st):
                v |= m
        v += 1
        state.last_dc[comp] += -v if sign else v
    zz[0] = state.last_dc[comp] << al


def _arith_dc_refine(dec: _ArithDecoder, zz, state: _ArithSeqState,
                     al: int) -> None:
    """Progressive DC refinement (G.2.2): one fixed-bin decision per
    block supplies the next lower DC bit."""
    if dec.decode(state.fixed, 0):
        zz[0] |= 1 << al


def _arith_ac_first(
    dec: _ArithDecoder,
    zz,
    state: _ArithSeqState,
    ac_t: int,
    ss: int,
    se: int,
    al: int,
    kx: int,
) -> None:
    """AC band decode (T.81 F.2.4.2): per-index [EOB?, significant?,
    magnitude] bins, signs on the fixed bin, shared magnitude trees
    split at Kx. Serves the sequential full scan (ss=1, se=63, al=0)
    and the progressive AC-first pass (``<< Al`` on the way out)."""
    acst = state.ac[ac_t]
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(acst, st):
            break  # end of block
        while dec.decode(acst, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise JpegError("arithmetic AC index overflow")
        sign = dec.decode(state.fixed, 0)
        st += 2
        m = dec.decode(acst, st)
        if m and dec.decode(acst, st):
            m <<= 1
            st = 189 if k <= kx else 217  # Table F.4 low/high split
            while dec.decode(acst, st):
                m <<= 1
                if m == 0x8000:
                    raise JpegError("arithmetic AC magnitude overflow")
                st += 1
        v = m
        st += 14
        while m := m >> 1:
            if dec.decode(acst, st):
                v |= m
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def _arith_ac_refine(
    dec: _ArithDecoder,
    zz,
    state: _ArithSeqState,
    ac_t: int,
    ss: int,
    se: int,
    al: int,
) -> None:
    """Progressive AC refinement (G.2.3): walk the band — previously
    nonzero coefficients take a correction bit on their per-index
    bin+2, newly significant ones are signalled on bin+1 with a
    fixed-bin sign, and past the previous stage's last nonzero index
    an EOB decision on the bin itself ends the block."""
    acst = state.ac[ac_t]
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex > 0 and zz[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(acst, st):
            break
        while True:
            if zz[k]:
                if dec.decode(acst, st + 2):
                    zz[k] += m1 if zz[k] < 0 else p1
                break
            if dec.decode(acst, st + 1):
                zz[k] = m1 if dec.decode(state.fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise JpegError("arithmetic AC refinement overran band")
        k += 1


def _arith_decode_block(
    dec: _ArithDecoder,
    zz,
    state: _ArithSeqState,
    comp: int,
    dc_t: int,
    ac_t: int,
    dc_l: int,
    dc_u: int,
    kx: int,
) -> None:
    """One 8x8 block, SEQUENTIAL DCT arithmetic decode — the DC diff
    model plus the full 1..63 AC band at Al=0 (T.81 F.2.4.1-2)."""
    _arith_dc_first(dec, zz, state, comp, dc_t, dc_l, dc_u, 0)
    _arith_ac_first(dec, zz, state, ac_t, 1, 63, 0, kx)


# ------------------------------------------------- header-only metadata


def _exif_orientation(body: bytes) -> int | None:
    """Orientation (tag 0x0112, values 1..8) from an APP1/EXIF payload —
    a bounded walk of the 0th TIFF IFD (EXIF 2.3 §4.6.4; TIFF 6.0 §2).
    Any malformed structure returns None, never raises."""
    if len(body) < 14 or body[:6] != b"Exif\x00\x00":
        return None
    t = body[6:]
    if t[:2] == b"II":
        fmt = "<"
    elif t[:2] == b"MM":
        fmt = ">"
    else:
        return None
    try:
        (magic,) = struct.unpack_from(fmt + "H", t, 2)
        if magic != 42:
            return None
        (off,) = struct.unpack_from(fmt + "I", t, 4)
        (n,) = struct.unpack_from(fmt + "H", t, off)
        for i in range(min(n, 512)):  # bound attacker-controlled counts
            tag, typ, cnt = struct.unpack_from(fmt + "HHI", t, off + 2 + i * 12)
            if tag == 0x0112 and typ == 3 and cnt >= 1:
                (val,) = struct.unpack_from(fmt + "H", t, off + 2 + i * 12 + 8)
                return val if 1 <= val <= 8 else None
    except struct.error:
        return None
    return None


def jpeg_metadata(data: bytes) -> dict:
    """Header-only metadata scan — NO entropy decode: dims / precision /
    scan type from SOFn, the APPn markers present, and the EXIF
    orientation parsed out of APP1 (r9). This is the cheap routing pass
    a curation pipeline runs BEFORE paying decode cost (drop tiny
    images, flag rotated ones, split progressive from baseline) — at
    100 TB the header scan touches a few KB per file vs the full
    coefficient decode.

    Returns ``{width, height, ncomp, precision, progressive, sof,
    app_markers, has_exif, exif_orientation}``. Raises ``JpegError``
    only for streams with no usable SOI/SOF header (the same
    honest-failure taxonomy as ``decode_jpeg``); a malformed EXIF body
    degrades to ``exif_orientation=None``."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise JpegError("bad SOI")
    pos = 2
    meta: dict = {
        "width": None, "height": None, "ncomp": None, "precision": None,
        "progressive": None, "sof": None, "app_markers": [],
        "has_exif": False, "exif_orientation": None,
        "hierarchical": False,
    }
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD8:
            # a SECOND SOI mid-stream means a malformed or concatenated
            # stream — surface it (honest-failure taxonomy, matching
            # decode_jpeg) instead of silently walking past (ADVICE r9)
            raise JpegError(f"stray SOI at {pos}")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegError("truncated segment")
        pos += 2 + seglen
        if 0xE0 <= marker <= 0xEF:
            meta["app_markers"].append(marker - 0xE0)
            if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
                meta["has_exif"] = True
                meta["exif_orientation"] = _exif_orientation(body)
        elif marker == 0xDE:
            # DHP (hierarchical, r11): declares the stream's TRUE dims —
            # the first frame's SOF carries only the smallest pyramid
            # level, which would misroute size filters
            if len(body) < 6:
                raise JpegError("short DHP")
            meta.update(
                precision=body[0],
                height=struct.unpack_from(">H", body, 1)[0],
                width=struct.unpack_from(">H", body, 3)[0],
                ncomp=body[5],
                hierarchical=True,
            )
        elif marker in range(0xC0, 0xD0) and marker not in (0xC4, 0xC8, 0xCC):
            if len(body) < 6:
                raise JpegError("short SOF")
            if meta["hierarchical"]:
                # dims/ncomp/precision came from the DHP; take the scan
                # type from the FIRST frame only
                if meta["sof"] is None:
                    meta.update(
                        sof=marker - 0xC0,
                        progressive=marker in (0xC2, 0xC6, 0xCA, 0xCE),
                    )
            else:
                meta.update(
                    precision=body[0],
                    height=struct.unpack_from(">H", body, 1)[0],
                    width=struct.unpack_from(">H", body, 3)[0],
                    ncomp=body[5],
                    sof=marker - 0xC0,
                    progressive=marker in (0xC2, 0xC6, 0xCA, 0xCE),
                )
        elif marker == 0xDA:
            break  # entropy data follows — the header scan is done
    if meta["width"] is None or meta["sof"] is None:
        raise JpegError("missing SOF")
    return meta


# ----------------------------------------------------------- decoder


def _parse_dqt(body: bytes, quants: dict) -> None:
    """DQT segment body → quant tables (possibly several per segment);
    shared by the single-frame and hierarchical decode loops."""
    b = 0
    while b < len(body):
        pq, tq = body[b] >> 4, body[b] & 0x0F
        if pq not in (0, 1):  # Pq=1: 16-bit entries (12-bit streams)
            raise JpegError(f"bad DQT precision {pq}")
        n = 64 * (pq + 1)
        if b + 1 + n > len(body):
            raise JpegError("short DQT")
        if pq == 0:
            vals = body[b + 1 : b + 65]
        else:
            vals = struct.unpack_from(">64H", body, b + 1)
        t = np.zeros((8, 8), dtype=np.int32)
        for i, (r, c) in enumerate(_ZIGZAG):
            t[r, c] = vals[i]
        quants[tq] = t
        b += 1 + n


def _parse_dht(body: bytes, huffs: dict) -> None:
    """DHT segment body → decode tables keyed (code, length) → symbol;
    shared by the single-frame and hierarchical decode loops."""
    b = 0
    while b < len(body):
        if b + 17 > len(body):
            raise JpegError("short DHT")
        tc_th = body[b]
        bits = list(body[b + 1 : b + 17])
        nvals = sum(bits)
        vals = list(body[b + 17 : b + 17 + nvals])
        if len(vals) != nvals:
            raise JpegError("short DHT values")
        codes = _canonical_codes(bits, vals)
        huffs[tc_th] = {
            (code, length): sym for sym, (code, length) in codes.items()
        }
        b += 17 + nvals


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline or progressive JPEG →
    ``(width, height, 3, rgb_bytes)``. General within the profile:
    arbitrary DQT/DHT from the stream, 1 (grayscale, Y replicated into
    RGB) or 3 components (scan order matched to SOF by component id, as
    T.81 specifies), sampling layouts 4:4:4 / 4:2:0 / 4:2:2 (subsampled
    chroma upsampled by pixel replication), ARBITRARY dimensions
    (partial edge MCUs decode whole and crop to the SOF dims), restart
    intervals (DRI honored; each RSTn must appear exactly at its
    MCU/block boundary with the expected 0xD0+n index and resets the
    scan's predictors), SOF0 baseline, SOF2 multi-scan progressive,
    SOF1 extended sequential incl. 12-bit precision, SOF9/SOF10
    arithmetic-coded sequential AND progressive (r9), and SOF3
    Annex-H predictive LOSSLESS (r10 — exact reconstruction by
    definition; see the module scope note).
    Raises ``JpegError`` for ANYTHING else — malformed
    segment bodies included: parser slips (IndexError / struct.error /
    bare ValueError on attacker-shaped bytes) are converted so the
    decode_ok=False honest-failure contract holds (the same hardening
    png.py carries for its IHDR length)."""
    try:
        return _decode_jpeg_inner(data)
    except JpegError:
        raise
    except (IndexError, ValueError, struct.error) as exc:
        raise JpegError(f"malformed stream: {exc}") from exc


class _ScanState:
    """Mutable per-scan entropy state (DC predictors + AC EOB run)."""

    __slots__ = ("preds", "eobrun")

    def __init__(self, ncomp: int) -> None:
        self.preds = [0] * ncomp
        self.eobrun = 0

    def reset(self) -> None:
        self.preds = [0] * len(self.preds)
        self.eobrun = 0


def _decode_jpeg_inner(data: bytes) -> tuple[int, int, int, bytes]:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegError("bad SOI")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huffs: dict[int, dict[tuple[int, int], int]] = {}
    width = height = -1
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, quant id)
    restart_interval = 0
    progressive = False
    arith = False  # SOF9: extended sequential, arithmetic entropy coding
    lossless = False  # SOF3: Annex H predictive lossless (r10)
    samples: list[np.ndarray] = []  # lossless: per comp (h, w) int32
    ll_point_transform = 0
    adobe_transform: int | None = None  # APP14 color-transform flag (r10)
    dc_cond: dict[int, tuple[int, int]] = {}  # DAC: DC table id -> (L, U)
    ac_cond: dict[int, int] = {}  # DAC: AC table id -> Kx
    precision = 8  # sample precision from SOF (8, or 12 for SOF1/SOF9)
    n_scans = 0
    coefs: list[np.ndarray] = []  # per comp: (nby, nbx, 64) int64 zigzag
    # per comp, per zigzag index: Al of the last scan that touched it
    # (-1 = never sent). Enforces first-pass-before-refinement and the
    # Ah == previous-Al successive-approximation chain.
    band_al: list[list[int]] = []
    hmax = vmax = 1
    n_mcux = n_mcuy = 0

    def decode_full_block(br, zz, dc_table, ac_table, state, comp):
        size = _decode_symbol(br, dc_table)
        # T.81 DC category range: 11 at 8-bit, 15 at 12-bit precision
        if size > (11 if precision == 8 else 15):
            raise JpegError("DC category out of range")
        diff = _extend(br.bits(size), size) if size else 0
        state.preds[comp] += diff
        zz[0] = state.preds[comp]
        i = 1
        while i < 64:
            sym = _decode_symbol(br, ac_table)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                i += 16
                if i > 63:  # must leave room for a coeff
                    raise JpegError("ZRL past block end")
                continue
            run, size = sym >> 4, sym & 0x0F
            i += run
            # AC magnitude category range: 10 at 8-bit, 14 at 12-bit
            if i > 63 or size == 0 or size > (10 if precision == 8 else 14):
                raise JpegError("AC run/size out of range")
            zz[i] = _extend(br.bits(size), size)
            i += 1

    def decode_dc_first(br, zz, dc_table, state, comp, al):
        size = _decode_symbol(br, dc_table)
        if size > 11:
            raise JpegError("DC category out of range")
        diff = _extend(br.bits(size), size) if size else 0
        state.preds[comp] += diff
        zz[0] = state.preds[comp] * (1 << al)

    def decode_dc_refine(br, zz, al):
        if br.bit():
            zz[0] |= 1 << al

    def decode_ac_first(br, zz, ac_table, state, ss, se, al):
        if state.eobrun > 0:
            state.eobrun -= 1
            return
        k = ss
        while k <= se:
            sym = _decode_symbol(br, ac_table)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r != 15:  # EOBn: run of 2^r + extension bits
                    state.eobrun = (1 << r) - 1
                    if r:
                        state.eobrun += br.bits(r)
                    break
                k += 16  # ZRL
                if k > se + 1:
                    raise JpegError("ZRL past band end")
                continue
            if s > 10:
                raise JpegError("AC size out of range")
            k += r
            if k > se:
                raise JpegError("AC run past band end")
            zz[k] = _extend(br.bits(s), s) * (1 << al)
            k += 1

    def decode_ac_refine(br, zz, ac_table, state, ss, se, al):
        # T.81 G.1.2.3: newly-significant coefficients run-length coded
        # over zero-HISTORY positions; every already-nonzero coefficient
        # passed over yields one correction bit.
        p1 = 1 << al
        k = ss
        if state.eobrun == 0:
            while k <= se:
                sym = _decode_symbol(br, ac_table)
                r, s = sym >> 4, sym & 0x0F
                newval = 0
                if s == 0:
                    if r != 15:  # EOBn (counts this block)
                        state.eobrun = 1 << r
                        if r:
                            state.eobrun += br.bits(r)
                        break
                    # ZRL: newval stays 0, skip 16 zero-history positions
                else:
                    if s != 1:
                        raise JpegError("refinement size must be 1")
                    newval = p1 if br.bit() else -p1
                while k <= se:
                    v = zz[k]
                    if v != 0:
                        if br.bit() and (v & p1) == 0:
                            zz[k] = v + (p1 if v >= 0 else -p1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    zz[k] = newval
                k += 1
        if state.eobrun > 0:
            while k <= se:
                v = zz[k]
                if v != 0:
                    if br.bit() and (v & p1) == 0:
                        zz[k] = v + (p1 if v >= 0 else -p1)
                k += 1
            state.eobrun -= 1

    def decode_lossless_scan(body: bytes, entropy_start: int) -> int:
        """Annex H predictive scan: per sample, a DC-class Huffman
        category + extend bits give the difference from the H.1
        prediction; reconstruction is modulo 2^16. Scope (honest
        failures outside it): one interleaved scan covering all
        components, restart intervals at sample-ROW multiples (what
        real lossless writers — DNG readers assume it — emit; a restart
        resets prediction to start-of-scan conditions for the rows that
        follow)."""
        nonlocal ll_point_transform
        ns = body[0] if body else -1
        if ns < 1 or len(body) != 1 + 2 * ns + 3:
            raise JpegError("bad SOS header")
        sel = []
        for c in range(ns):
            cs, tabs = body[1 + c * 2 : 3 + c * 2]
            sel.append((cs, tabs >> 4))
        ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
        ah, al = ahal >> 4, ahal & 0x0F
        if not 1 <= ss <= 7:
            raise JpegError("lossless predictor (Ss) must be 1..7")
        if se != 0 or ah != 0:
            raise JpegError("bad lossless scan header")
        if al >= precision:
            raise JpegError("point transform out of range")
        if ns != len(comps):
            raise JpegError(
                "non-interleaved lossless scan unsupported"
            )
        order = []
        for cs, dc_t in sel:
            idx = next((i for i, c in enumerate(comps) if c[0] == cs), None)
            if idx is None:
                raise JpegError(f"scan selector {cs} not declared in SOF")
            if (0x00 | dc_t) not in huffs:
                raise JpegError("missing huffman table")
            order.append((idx, dc_t))
        if len({i for i, _ in order}) != ns:
            raise JpegError("duplicate component in scan")
        if restart_interval and restart_interval % width != 0:
            raise JpegError(
                "lossless restart interval must be a row multiple"
            )
        restart_rows = restart_interval // width if restart_interval else 0
        ll_point_transform = al
        default = 1 << (precision - al - 1)
        br = _BitReader(data, entropy_start)
        base_row = 0
        rst = 0
        for y in range(height):
            if restart_rows and y and y % restart_rows == 0:
                br.restart(rst % 8)
                rst += 1
                base_row = y
            for x in range(width):
                for idx, dc_t in order:
                    plane = samples[idx]
                    cat = _decode_symbol(br, huffs[0x00 | dc_t])
                    if cat > 16:
                        raise JpegError("lossless category out of range")
                    if cat == 16:  # the special diff=32768 symbol
                        diff = 32768
                    elif cat:
                        diff = _extend(br.bits(cat), cat)
                    else:
                        diff = 0
                    px = _lossless_predict(plane, x, y, ss, default, base_row)
                    plane[y, x] = (px + diff) & 0xFFFF
        return br.pos

    def decode_scan(body: bytes, entropy_start: int) -> int:
        """Decode one scan's entropy data into ``coefs``; returns the
        position just past it (at the next marker)."""
        if not comps:
            raise JpegError("SOS before SOF")
        if lossless:
            return decode_lossless_scan(body, entropy_start)
        ns = body[0] if body else -1
        if ns < 1 or len(body) != 1 + 2 * ns + 3:
            raise JpegError("bad SOS header")
        sel = []
        for c in range(ns):
            cs, tabs = body[1 + c * 2 : 3 + c * 2]
            sel.append((cs, tabs >> 4, tabs & 0x0F))
        ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
        ah, al = ahal >> 4, ahal & 0x0F
        # match scan slots to SOF components BY ID (T.81 Cs <-> Ci)
        order = []  # (comp index, dc table id, ac table id)
        for cs, dc_t, ac_t in sel:
            idx = next((i for i, c in enumerate(comps) if c[0] == cs), None)
            if idx is None:
                raise JpegError(f"scan selector {cs} not declared in SOF")
            order.append((idx, dc_t, ac_t))
        if len({i for i, _, _ in order}) != ns:
            raise JpegError("duplicate component in scan")

        if not progressive:
            if ns != len(comps) or ss != 0 or se != 63 or ah or al:
                raise JpegError("baseline scan must be 0..63 at full precision")
        else:
            if al > 13 or (ah and ah != al + 1):
                raise JpegError("bad successive-approximation parameters")
            if ss == 0:
                if se != 0:
                    raise JpegError("DC scan must have Se=0")
            else:
                if ns != 1 or not (1 <= ss <= se <= 63):
                    raise JpegError("AC scan must cover one component's band")
        if ns != len(comps) and ns != 1:
            raise JpegError("scan must cover all components or exactly one")
        # table presence (refinement DC scans read raw bits, no table;
        # baseline scans need both DC and AC tables; arithmetic scans
        # need none — DAC conditioning has spec defaults)
        if not arith:
            for idx, dc_t, ac_t in order:
                if ss == 0 and ah == 0 and (0x00 | dc_t) not in huffs:
                    raise JpegError("missing huffman table")
                if (ss > 0 or not progressive) and (0x10 | ac_t) not in huffs:
                    raise JpegError("missing huffman table")
        # successive-approximation chain per touched coefficient
        for idx, _, _ in order:
            lo, hi = (0, 0) if ss == 0 else (ss, se)
            for k in range(lo, hi + 1):
                prev = band_al[idx][k]
                if ah == 0:
                    if prev != -1:
                        raise JpegError("band re-sent without refinement")
                else:
                    if prev == -1 or prev != ah:
                        raise JpegError("refinement does not follow its band")
                band_al[idx][k] = al

        if arith:
            # arithmetic DCT scans (F.2.4 sequential; G.2 progressive):
            # per-scan statistics; restart markers reset the decoder,
            # the statistics areas and the DC conditioning (F.2.1.3.1).
            # Non-interleaved multi-component DC layouts are legal in
            # the spec but unexercised by real encoders — an honest
            # failure.
            if ss == 0 and ns != len(comps):
                raise JpegError(
                    "non-interleaved arithmetic DC scan unsupported"
                )
            dec = _ArithDecoder(data, entropy_start)
            astate = _ArithSeqState(order, len(comps))
            a_rst = 0
            a_unit = 0

            def arith_maybe_restart():
                nonlocal dec, astate, a_rst
                if not (
                    restart_interval
                    and a_unit
                    and a_unit % restart_interval == 0
                ):
                    return
                p = dec.marker_pos
                if p < 0:
                    p = _find_next_marker(data, dec.pos)
                m = data[p + 1]
                if not 0xD0 <= m <= 0xD7:
                    raise JpegError(f"expected RSTn, found 0xFF{m:02X}")
                if m != 0xD0 + a_rst % 8:
                    raise JpegError(
                        f"out-of-sequence restart marker "
                        f"RST{m - 0xD0} (expected RST{a_rst % 8})"
                    )
                dec = _ArithDecoder(data, p + 2)
                astate = _ArithSeqState(order, len(comps))
                a_rst += 1

            if ss == 0:
                # interleaved MCU walk: sequential full scan, or the
                # progressive DC first/refine passes
                for my in range(n_mcuy):
                    for mx in range(n_mcux):
                        arith_maybe_restart()
                        a_unit += 1
                        for idx, dc_t, ac_t in order:
                            _, ch, cv, _ = comps[idx]
                            dc_l, dc_u = dc_cond.get(dc_t, (0, 1))
                            kx = ac_cond.get(ac_t, 5)
                            for vy in range(cv):
                                for vx in range(ch):
                                    zz = coefs[idx][my * cv + vy][
                                        mx * ch + vx
                                    ]
                                    if not progressive:
                                        _arith_decode_block(
                                            dec, zz, astate, idx,
                                            dc_t, ac_t, dc_l, dc_u, kx,
                                        )
                                    elif ah == 0:
                                        _arith_dc_first(
                                            dec, zz, astate, idx,
                                            dc_t, dc_l, dc_u, al,
                                        )
                                    else:
                                        _arith_dc_refine(
                                            dec, zz, astate, al
                                        )
            else:
                # progressive AC scan: single component, TRUE-extent
                # block raster (T.81 A.2.2), restart counts BLOCKS
                idx, dc_t, ac_t = order[0]
                _, c_h, c_v, _ = comps[idx]
                kx = ac_cond.get(ac_t, 5)
                nbx = -(-(-(-width * c_h // hmax)) // 8)
                nby = -(-(-(-height * c_v // vmax)) // 8)
                for row in coefs[idx][:nby]:
                    for zz in row[:nbx]:
                        arith_maybe_restart()
                        a_unit += 1
                        if ah == 0:
                            _arith_ac_first(
                                dec, zz, astate, ac_t, ss, se, al, kx
                            )
                        else:
                            _arith_ac_refine(
                                dec, zz, astate, ac_t, ss, se, al
                            )
            p = dec.marker_pos
            return p if p >= 0 else _find_next_marker(data, dec.pos)

        br = _BitReader(data, entropy_start)
        state = _ScanState(len(comps))
        rst = 0
        unit_idx = 0

        def maybe_restart():
            nonlocal rst
            if restart_interval and unit_idx and unit_idx % restart_interval == 0:
                br.restart(rst % 8)
                rst += 1
                state.reset()

        if ns == len(comps) and ss == 0:
            # interleaved MCU order (baseline full scan / progressive DC)
            for my in range(n_mcuy):
                for mx in range(n_mcux):
                    maybe_restart()
                    unit_idx += 1
                    for idx, dc_t, ac_t in order:
                        _, ch, cv, _ = comps[idx]
                        for vy in range(cv):
                            for vx in range(ch):
                                zz = coefs[idx][my * cv + vy][mx * ch + vx]
                                if not progressive:
                                    decode_full_block(
                                        br, zz, huffs[0x00 | dc_t],
                                        huffs[0x10 | ac_t], state, idx,
                                    )
                                elif ah == 0:
                                    decode_dc_first(
                                        br, zz, huffs[0x00 | dc_t], state,
                                        idx, al,
                                    )
                                else:
                                    decode_dc_refine(br, zz, al)
        else:
            # non-interleaved: one component, its own block raster order;
            # restart intervals count BLOCKS here. T.81 A.2.2: the block
            # count is ceil(component samples / 8) — NOT the MCU-padded
            # grid (for a 4:2:0 luma of width 1000 that is 125 blocks per
            # row, though the padded grid holds 126; the padding blocks
            # exist only for interleaved scans and are never coded here)
            idx, dc_t, ac_t = order[0]
            _, c_h, c_v, _ = comps[idx]
            nbx = -(-(-(-width * c_h // hmax)) // 8)
            nby = -(-(-(-height * c_v // vmax)) // 8)
            for row in coefs[idx][:nby]:
                for zz in row[:nbx]:
                    maybe_restart()
                    unit_idx += 1
                    if ss == 0:
                        if not progressive:
                            raise JpegError("partial baseline scan")
                        if ah == 0:
                            decode_dc_first(
                                br, zz, huffs[0x00 | dc_t], state, idx, al
                            )
                        else:
                            decode_dc_refine(br, zz, al)
                    elif ah == 0:
                        decode_ac_first(
                            br, zz, huffs[0x10 | ac_t], state, ss, se, al
                        )
                    else:
                        decode_ac_refine(
                            br, zz, huffs[0x10 | ac_t], state, ss, se, al
                        )
        # discard pad bits; the next marker starts at the reader's byte pos
        return br.pos

    saw_eoi = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if pos + 4 > len(data):
            raise JpegError("truncated segment")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegError("truncated segment")
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            _parse_dqt(body, quants)
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            _parse_dht(body, huffs)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            # SOF0 baseline / SOF1 extended sequential / SOF2
            # progressive / SOF3 LOSSLESS (Annex H, r10) / SOF9
            # sequential ARITHMETIC / SOF10 progressive ARITHMETIC (r9)
            if comps:
                raise JpegError("multiple SOF segments")
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            lossless = marker == 0xC3
            if len(body) < 6:
                raise JpegError("short SOF")
            # 12-bit sample precision is legal only in extended
            # sequential here (T.81 allows 12-bit SOF2/SOF10 too; those
            # profiles stay honest failures — the progressive machinery
            # is gated at 8-bit). Lossless allows the full 2..16 range
            # (Annex H); >8-bit decodes reduce to the engine's 8-bit
            # pixel surface like the 12-bit DCT path below.
            if lossless:
                if not 2 <= body[0] <= 16:
                    raise JpegError(
                        f"precision {body[0]} out of the lossless range"
                    )
                precision = body[0]
            elif body[0] == 12 and marker in (0xC1, 0xC9):
                precision = 12
            elif body[0] == 8:
                precision = 8
            else:
                raise JpegError(
                    f"precision {body[0]} unsupported for SOF{marker - 0xC0}"
                )
            height, width = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if ncomp not in (1, 3, 4):
                raise JpegError(f"{ncomp} components unsupported")
            # 4-component ARITHMETIC decodes since r13: the Annex D
            # scan machinery is component-generic (per-scan statistics
            # sized by the scan order) and the CMYK/YCCK conversion is
            # shared with the Huffman path — the r9 gate existed only
            # because no fixture source was believed to exist, but the
            # system libjpeg DOES emit JCS_CMYK arithmetic streams
            # (validated against libjpeg_arith_cmyk / _prog_cmyk
            # foreign fixtures in tests/test_foreign_media.py)
            for c in range(ncomp):
                cid, hvb, tq = body[6 + c * 3 : 9 + c * 3]
                ch, cv = hvb >> 4, hvb & 0x0F
                if (ch, cv) not in ((1, 1), (2, 2), (2, 1), (1, 2)):
                    raise JpegError(f"sampling factor {ch}x{cv} unsupported")
                comps.append((cid, ch, cv, tq))
            if len({c[0] for c in comps}) != ncomp:
                raise JpegError("duplicate component ids in SOF")
            sampling = tuple((c[1], c[2]) for c in comps)
            if sampling not in (
                ((1, 1),),
                ((1, 1), (1, 1), (1, 1)),
                ((2, 2), (1, 1), (1, 1)),
                ((2, 1), (1, 1), (1, 1)),
                ((1, 2), (1, 1), (1, 1)),
                # 4-component (r10): CMYK 4:4:4, and Adobe-style YCCK
                # 4:2:0 where K carries detail at the Y rate
                ((1, 1), (1, 1), (1, 1), (1, 1)),
                ((2, 2), (1, 1), (1, 1), (2, 2)),
            ):
                raise JpegError(f"sampling layout {sampling} unsupported")
            if lossless and (sampling not in (
                ((1, 1),),
                ((1, 1), (1, 1), (1, 1)),
                ((1, 1), (1, 1), (1, 1), (1, 1)),
            )):
                raise JpegError("lossless requires 1x1 sampling")
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            # 1<<23 pixels (~3.9k x 2.2k): header dims are
            # attacker-controlled and every coefficient is buffered as
            # int64 over the MCU-padded grid before reconstruction, so an
            # adversarial 4:4:4 header at the former 1<<24 cap could pin
            # ~400 MB of coefficient buffers + ~200 MB of int32 planes
            # PER PAYLOAD in each Arrow worker. Halving the cap bounds
            # that to ~200+100 MB while still covering the vast majority
            # of crawl images; larger headers take the honest-failure
            # path (decode_ok=False), never an executor OOM.
            if width <= 0 or height <= 0 or width * height > (1 << 23):
                raise JpegError("unsupported dimensions")
            # block grids over the MCU-padded extent (T.81 A.2.4: partial
            # edge MCUs are coded whole; the decoder crops to the SOF dims).
            # numpy int64 buffers: 8 B/coefficient flat storage instead of
            # nested Python lists (an order of magnitude less memory at the
            # pixel cap), and int64 cannot wrap even on adversarial
            # max-diff DC chains shifted by Al (a progressive DC chain of
            # 2047-unit diffs over every block, << Al <= 13, reaches ~2^42
            # — clamping to int32 would silently corrupt such streams
            # instead of decoding them honestly)
            n_mcux = -(-width // (8 * hmax))
            n_mcuy = -(-height // (8 * vmax))
            if lossless:
                # one int32 sample plane per component — no block grid,
                # no padding (lossless has no MCU geometry beyond the
                # sample)
                for _ in comps:
                    samples.append(np.zeros((height, width), dtype=np.int32))
            else:
                for _, ch, cv, _ in comps:
                    coefs.append(
                        np.zeros(
                            (n_mcuy * cv, n_mcux * ch, 64), dtype=np.int64
                        )
                    )
                    band_al.append([-1] * 64)
        elif marker == 0xDE:  # DHP — hierarchical stream (Annex J, r11)
            return _decode_hierarchical(data)
        elif marker in (0xC5, 0xC6, 0xC7,
                        0xCB, 0xCD, 0xCE, 0xCF):
            # a differential frame is only legal after a DHP (handled
            # above); outside one it is an honest failure, as are the
            # arithmetic/lossless differential forms everywhere
            raise JpegError("differential frame outside a hierarchical stream")
        elif marker == 0xCC:  # DAC — arithmetic conditioning (B.2.4.3)
            b = 0
            while b + 2 <= len(body):
                tc, tb = body[b] >> 4, body[b] & 0x0F
                cs = body[b + 1]
                if tc == 0:
                    low, up = cs & 0x0F, cs >> 4
                    if low > up:
                        raise JpegError("bad DAC DC conditioning bounds")
                    dc_cond[tb] = (low, up)
                elif tc == 1:
                    if not 1 <= cs <= 63:
                        raise JpegError("bad DAC Kx")
                    ac_cond[tb] = cs
                else:
                    raise JpegError(f"bad DAC table class {tc}")
                b += 2
            if b != len(body):
                raise JpegError("short DAC")
        elif marker == 0xDD:  # DRI
            if len(body) != 2:
                raise JpegError("bad DRI length")
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xEE and body[:5] == b"Adobe":
            # APP14 Adobe segment: the color-transform flag that tells a
            # 4-component stream apart (0 = CMYK stored directly,
            # 2 = YCCK); Adobe's tech note 5116 layout — 'Adobe',
            # version(2), flags0(2), flags1(2), transform(1)
            if len(body) >= 12:
                adobe_transform = body[11]
        elif marker == 0xDA:  # SOS — entropy data follows
            if not progressive and n_scans:
                raise JpegError("multiple scans in a baseline stream")
            pos = decode_scan(body, pos)
            n_scans += 1
        # other segments (APPn, COM) are skipped

    if not comps or n_scans == 0:
        raise JpegError("missing SOF/SOS")
    if not saw_eoi:
        # without this, a stream cut exactly at a scan boundary would
        # "decode" a partial image — truncation must be an honest failure
        raise JpegError("missing EOI")
    if lossless:
        # reconstruction (Annex H): decoded values shift back by the
        # point transform, clip to the sample range, and — like the
        # 12-bit DCT path — reduce to the engine's 8-bit pixel surface
        # by dropping low bits. 3-component lossless is carried as RGB
        # directly: lossless streams have no JFIF YCbCr contract, and
        # real RGB lossless writers emit RGB (a YCbCr convert here
        # would also break the exact-roundtrip property the oracle
        # gate pins).
        maxv = (1 << precision) - 1
        planes = [
            np.clip(s.astype(np.int64) << ll_point_transform, 0, maxv)
            for s in samples
        ]
        if precision > 8:
            planes = [p >> (precision - 8) for p in planes]
        if len(planes) == 1:
            rgb = np.repeat(planes[0][..., None], 3, axis=-1).astype(np.uint8)
        elif len(planes) == 4:
            # r11: lossless CMYK — same documented Adobe-inverted ink
            # convention as the DCT 4-comp path (255 = no ink, so
            # channel·K/255 IS the additive light). YCCK has no lossless
            # form (the Adobe transform is defined over the DCT JFIF
            # space), so a lossless stream claiming transform 2 is an
            # honest failure, not a guess.
            if adobe_transform == 2:
                raise JpegError("lossless YCCK unsupported")
            d = np.stack(planes, axis=-1).astype(np.float64)
            rgb = np.clip(
                _rnd(d[..., :3] * d[..., 3:4] / 255.0), 0, 255
            ).astype(np.uint8)
        else:
            rgb = np.stack(planes, axis=-1).astype(np.uint8)
        return width, height, 3, rgb.tobytes()
    for idx in range(len(comps)):
        if band_al[idx][0] == -1:
            raise JpegError("component missing its DC scan")
    for _, _, _, tq in comps:
        if tq not in quants:
            raise JpegError(f"missing quant table {tq}")

    # reconstruction: dequant + IDCT every block at the PADDED native
    # resolution (the MCU grid); the final crop applies the SOF dims
    planes = [
        np.zeros((8 * n_mcuy * cv, 8 * n_mcux * ch), dtype=np.int32)
        for _, ch, cv, _ in comps
    ]
    mid = float(1 << (precision - 1))  # level shift: 128 (8-bit) / 2048
    maxv = (1 << precision) - 1
    for idx, (_, ch, cv, tq) in enumerate(comps):
        quant = quants[tq]
        for by, row in enumerate(coefs[idx]):
            for bx, zz in enumerate(row):
                coef = np.zeros((8, 8), dtype=np.float64)
                for i, (r, c) in enumerate(_ZIGZAG):
                    coef[r, c] = zz[i] * quant[r, c]
                block = np.clip(_rnd(_idct2(coef) + mid), 0, maxv)
                planes[idx][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    if precision == 12:
        # high-nibble reduction to the engine's 8-bit pixel surface —
        # the same discipline as PNG 16-bit samples (v >> 8 there);
        # chroma stays centered (2048 >> 4 == 128) so the color
        # conversion below is unchanged
        planes = [p >> 4 for p in planes]
    # upsample subsampled components to full resolution (pixel replication)
    full = []
    for plane, (_, ch, cv, _) in zip(planes, comps):
        if ch != hmax or cv != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
            )
        full.append(plane)
    full = [plane[:height, :width] for plane in full]  # crop edge padding
    if len(full) == 1:  # grayscale: Y replicated into RGB
        rgb = np.repeat(full[0][..., None], 3, axis=-1).astype(np.uint8)
        return width, height, 3, rgb.tobytes()
    if len(full) == 4:
        # CMYK/YCCK (r10). Convention (documented because the ecosystem
        # genuinely disagrees at the margins; this is the common
        # libjpeg/PIL reading of Adobe streams): stored samples are
        # Adobe-INVERTED ink values, i.e. 255 = no ink, so channel·K/255
        # IS the additive light. APP14 transform 2 (YCCK) converts the
        # first three channels through the JFIF inverse first; transform
        # 0 / absent APP14 treats them as (inverted) C, M, Y directly.
        d = np.stack(full, axis=-1).astype(np.float64)
        k = d[..., 3:4]
        base = (
            ycbcr_to_rgb(d[..., :3]).astype(np.float64)
            if adobe_transform == 2
            else d[..., :3]
        )
        rgb = np.clip(_rnd(base * k / 255.0), 0, 255).astype(np.uint8)
        return width, height, 3, rgb.tobytes()
    ycc = np.stack(full, axis=-1)
    rgb = ycbcr_to_rgb(ycc).astype(np.uint8)
    return width, height, 3, rgb.tobytes()


def jpeg_stats(data: bytes) -> dict:
    """Decode → exact integer statistics: dimensions plus per-channel
    pixel sums (the oracle-comparable reduction)."""
    width, height, _, rgb = decode_jpeg(data)
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
    return {
        "width": width,
        "height": height,
        "sum_r": int(a[:, 0].sum()),
        "sum_g": int(a[:, 1].sum()),
        "sum_b": int(a[:, 2].sum()),
    }


# --------------------------------------- hierarchical (Annex J, r11)
# The last T.81 coding process this codec covers. Profile (documented
# precisely BECAUSE no mainstream encoder emits hierarchical streams to
# interoperate with — libjpeg never implemented it; conventions here are
# cited to the spec and pinned by the oracle gate + roundtrip tests):
# grayscale, 8-bit, a baseline (SOF0) first frame followed by
# differential sequential (SOF5) frames, EXP expansion of the reference
# by a factor of 2 per flagged axis, no restart intervals inside frames.
# Reference expansion interpolates horizontally THEN vertically with the
# J.1.1.2 midpoint filter (output even samples copy the input, odd
# samples are (a + b + 1) >> 1 with the trailing edge replicated), then
# crops to the next frame's SOF dims. Differential frames code the DC
# coefficient with ZERO prediction (F.1.1.5.1: the DC prediction is
# zero in differential frames), reconstruct with NO level shift, and
# the decoded difference adds to the reference under a [0, 255] clamp
# (J.1.1.4). Everything outside this profile raises JpegError — the
# honest-failure contract.


def _upsample2_1d(plane: np.ndarray, axis: int) -> np.ndarray:
    """Double one axis with the J.1.1.2 midpoint filter: even output
    samples copy the input; odd samples are (a + b + 1) >> 1 of the
    neighbors, edge replicated."""
    a = np.swapaxes(plane, 0, axis)
    n = a.shape[0]
    out = np.empty((2 * n,) + a.shape[1:], dtype=np.int64)
    out[0::2] = a
    nxt = np.concatenate([a[1:], a[-1:]], axis=0)
    out[1::2] = (a + nxt + 1) >> 1
    return np.swapaxes(out, 0, axis)


def _hier_upsample(
    ref: np.ndarray, eh: int, ev: int, out_w: int, out_h: int
) -> np.ndarray:
    """Expand the reference per the EXP flags (2× per flagged axis,
    horizontal pass first — the codec's documented order, mirrored by
    the oracle) and crop to the next frame's dims."""
    up = ref.astype(np.int64)
    if eh:
        up = _upsample2_1d(up, 1)
    if ev:
        up = _upsample2_1d(up, 0)
    if out_h > up.shape[0] or out_w > up.shape[1]:
        raise JpegError("frame dims exceed the expanded reference")
    return up[:out_h, :out_w]


def _pad_to_grid(plane: np.ndarray) -> np.ndarray:
    """Edge-replicate to the 8×8 block grid (the same padding rule the
    main encoder uses for partial edge MCUs)."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    out = np.empty((ph, pw), dtype=plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def encode_jpeg_hierarchical(
    width: int, height: int, gray, levels: int = 2
) -> bytes:
    """Hierarchical JPEG encoder (T.81 Annex J) over the profile above:
    ``gray`` is ``width*height`` ints 0..255; the pyramid is built by
    ceil-halving ``levels - 1`` times (2×2 mean downsample, the
    encoder's non-normative choice), the smallest image is coded as a
    plain baseline grayscale frame, and each larger level is coded as a
    SOF5 differential frame against the DECODED-and-expanded previous
    level — so the stream refines toward the input the way Annex J
    intends, and the final decode error is bounded by the LAST frame's
    quantization alone."""
    if levels < 2:
        raise JpegError("hierarchical streams need at least 2 levels")
    if width <= 0 or height <= 0:
        raise JpegError("dimensions must be positive")
    arr = np.asarray(list(gray), dtype=np.int64)
    if arr.size != width * height:
        raise JpegError(
            f"sample buffer is {arr.size} values, want {width * height}"
        )
    if arr.min() < 0 or arr.max() > 255:
        raise JpegError("8-bit samples must be in 0..255")
    dims = [(width, height)]
    for _ in range(levels - 1):
        w0, h0 = dims[0]
        dims.insert(0, (-(-w0 // 2), -(-h0 // 2)))
    imgs = [arr.reshape(height, width)]
    for _ in range(levels - 1):
        src = imgs[0]
        h0, w0 = src.shape
        if h0 % 2 or w0 % 2:  # edge-replicate to even before the mean
            src = np.pad(
                src, ((0, h0 % 2), (0, w0 % 2)), mode="edge"
            )
        imgs.insert(0, _downsample2(src).astype(np.int64))
    w1, h1 = dims[0]
    rgb = np.repeat(
        imgs[0].astype(np.uint8)[..., None], 3, axis=-1
    ).tobytes()
    frame1 = encode_jpeg(w1, h1, rgb, subsampling="gray")
    ref = (
        np.frombuffer(decode_jpeg(frame1)[3], dtype=np.uint8)
        .reshape(h1, w1, 3)[:, :, 0]
        .astype(np.int64)
    )
    dhp = bytes([8]) + struct.pack(">HH", height, width)
    dhp += bytes([1, 1, 0x11, 0])
    out = bytearray(b"\xff\xd8" + _seg(0xDE, dhp))
    out += frame1[2:-2]  # frame 1's tables + SOF0 + scan, sans SOI/EOI
    dc = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac = _canonical_codes(AC_BITS, AC_VALS)
    for lvl in range(1, levels):
        wl, hl = dims[lvl]
        wp, hp = dims[lvl - 1]
        eh, ev = int(wl > wp), int(hl > hp)
        if eh or ev:
            out += _seg(0xDF, bytes([(eh << 4) | ev]))
        up = _hier_upsample(ref, eh, ev, wl, hl)
        diff = _pad_to_grid(imgs[lvl] - up)
        nby, nbx = diff.shape[0] // 8, diff.shape[1] // 8
        w_ = _BitWriter()
        dplane = np.zeros_like(diff)
        for by in range(nby):
            for bx in range(nbx):
                block = diff[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                # differential DCT: NO level shift; DC coded with zero
                # prediction (the pred argument stays 0 every block)
                q = _rnd(_dct2(block.astype(np.float64)) / QUANT_LUM)
                zz = [int(q[r, c]) for r, c in _ZIGZAG]
                _emit_full_block(w_, zz, 0, dc, ac)
                deq = np.zeros((8, 8), dtype=np.float64)
                for i, (r, c) in enumerate(_ZIGZAG):
                    deq[r, c] = zz[i] * QUANT_LUM[r, c]
                dplane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _rnd(
                    _idct2(deq)
                )
        sof = bytes([8]) + struct.pack(">HH", hl, wl) + bytes([1, 1, 0x11, 0])
        sos = bytes([1, 1, 0x00, 0, 63, 0])
        out += _seg(0xC5, sof) + _seg(0xDA, sos) + w_.flush()
        ref = np.clip(up + dplane[:hl, :wl], 0, 255)
    return bytes(out) + b"\xff\xd9"


def _decode_hierarchical(data: bytes) -> tuple[int, int, int, bytes]:
    """Annex J hierarchical decode over the documented profile (see the
    section comment): DHP declares the final dims; a baseline grayscale
    first frame seeds the reference; each SOF5 differential frame —
    optionally preceded by EXP — adds its no-level-shift IDCT output to
    the (expanded) reference under the [0, 255] clamp. The final
    reference must land exactly on the DHP dims."""
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huffs: dict[int, dict] = {}
    ref: np.ndarray | None = None
    full: tuple[int, int] | None = None
    pending_exp: tuple[int, int] | None = None
    frame: tuple[bool, int, int, int, int, int] | None = None
    saw_eoi = False

    def parse_frame_body(body: bytes) -> tuple[int, int, int]:
        if len(body) < 9:
            raise JpegError("short hierarchical frame header")
        if body[0] != 8:
            raise JpegError("hierarchical profile is 8-bit")
        h, w = struct.unpack_from(">HH", body, 1)
        if body[5] != 1:
            raise JpegError("hierarchical profile is grayscale")
        _, hv, tq = body[6:9]
        if hv != 0x11:
            raise JpegError("hierarchical profile is 1x1 sampled")
        if w <= 0 or h <= 0 or w * h > (1 << 23):
            raise JpegError("unsupported dimensions")
        return w, h, tq

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if pos + 4 > len(data):
            raise JpegError("truncated segment")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegError("truncated segment")
        pos += 2 + seglen
        if marker == 0xDB:
            _parse_dqt(body, quants)
        elif marker == 0xC4:
            _parse_dht(body, huffs)
        elif marker == 0xDE:  # DHP
            if full is not None:
                raise JpegError("duplicate DHP")
            w, h, _ = parse_frame_body(body)
            full = (w, h)
        elif marker == 0xDF:  # EXP
            if len(body) != 1:
                raise JpegError("bad EXP length")
            eh, ev = body[0] >> 4, body[0] & 0x0F
            if (eh, ev) not in ((1, 0), (0, 1), (1, 1)):
                raise JpegError("EXP must expand by 1 per axis")
            if ref is None:
                raise JpegError("EXP before the first frame")
            if pending_exp is not None:
                raise JpegError("EXP without an intervening frame")
            pending_exp = (eh, ev)
        elif marker in (0xC0, 0xC5):
            if full is None:
                raise JpegError("hierarchical frame before DHP")
            differential = marker == 0xC5
            if differential and ref is None:
                raise JpegError("differential frame without a reference")
            if not differential and ref is not None:
                raise JpegError("second non-differential frame")
            w, h, tq = parse_frame_body(body)
            frame = (differential, w, h, tq)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("frame type outside the hierarchical profile")
        elif marker == 0xDD:
            (ri,) = struct.unpack(">H", body)
            if ri:
                raise JpegError(
                    "restart intervals outside the hierarchical profile"
                )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("scan without a frame")
            differential, w, h, tq = frame
            if len(body) != 6 or body[0] != 1:
                raise JpegError("hierarchical scans cover one component")
            dc_t = huffs.get(body[2] >> 4)
            ac_t = huffs.get(0x10 | (body[2] & 0x0F))
            if (
                body[3] != 0 or body[4] != 63 or body[5] != 0
                or dc_t is None or ac_t is None or tq not in quants
            ):
                raise JpegError("bad hierarchical scan header/tables")
            quant = quants[tq]
            nbx, nby = -(-w // 8), -(-h // 8)
            plane = np.zeros((nby * 8, nbx * 8), dtype=np.int64)
            br = _BitReader(data, pos)
            pred = 0
            for by in range(nby):
                for bx in range(nbx):
                    zz = [0] * 64
                    size = _decode_symbol(br, dc_t)
                    if size > 11:
                        raise JpegError("DC category out of range")
                    val = _extend(br.bits(size), size) if size else 0
                    if differential:
                        zz[0] = val  # F.1.1.5.1: zero DC prediction
                    else:
                        pred += val
                        zz[0] = pred
                    i = 1
                    while i < 64:
                        sym = _decode_symbol(br, ac_t)
                        if sym == 0x00:
                            break
                        if sym == 0xF0:
                            i += 16
                            if i > 63:
                                raise JpegError("ZRL past block end")
                            continue
                        run, sz = sym >> 4, sym & 0x0F
                        i += run
                        if i > 63 or sz == 0 or sz > 10:
                            raise JpegError("AC run/size out of range")
                        zz[i] = _extend(br.bits(sz), sz)
                        i += 1
                    coef = np.zeros((8, 8), dtype=np.float64)
                    for i, (r, c) in enumerate(_ZIGZAG):
                        coef[r, c] = zz[i] * quant[r, c]
                    blk = _rnd(_idct2(coef))
                    if not differential:
                        blk = np.clip(blk + 128, 0, 255)
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
            pos = br.pos
            if differential:
                eh, ev = pending_exp if pending_exp else (0, 0)
                if not (eh or ev) and (ref.shape[1], ref.shape[0]) != (w, h):
                    # without an EXP a differential frame must match the
                    # reference exactly — Annex J frames never shrink
                    raise JpegError("differential frame dims mismatch")
                up = _hier_upsample(ref, eh, ev, w, h)
                ref = np.clip(up + plane[:h, :w], 0, 255)
            else:
                ref = plane[:h, :w]
            pending_exp = None
            frame = None
        # other segments (APPn, COM) are skipped

    if not saw_eoi:
        raise JpegError("missing EOI")
    if ref is None or full is None:
        raise JpegError("hierarchical stream without frames")
    if (ref.shape[1], ref.shape[0]) != full:
        raise JpegError("final frame does not reach the DHP dims")
    w, h = full
    rgb = np.repeat(ref.astype(np.uint8)[..., None], 3, axis=-1)
    return w, h, 3, rgb.tobytes()
