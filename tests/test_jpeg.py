"""Vendored baseline JPEG codec semantics (jpeg.py) + the Spark plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_lab02_spark.operators import jpeg as J


def _block_image(w, h, consts):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for (bx, by), c in consts.items():
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = c
    return img


class TestCodec:
    def test_constant_blocks_closed_form(self):
        """Per-block-constant images decode to the DC-only closed form the
        SQL oracle restates (the jpeg_decode gate contract)."""
        import math

        def rnd(x):
            return math.floor(x + (0.5 + 1e-9))

        def clamp(v):
            return max(0, min(255, v))

        consts = {(bx, by): ((31 * bx + 91 * by + 7) % 256,
                             (17 * bx + 3 * by + 50) % 256,
                             (29 * bx + 95 * by + 200) % 256)
                  for bx in range(3) for by in range(2)}
        img = _block_image(24, 16, consts)
        w, h, ch, out = J.decode_jpeg(J.encode_jpeg(24, 16, img.tobytes()))
        assert (w, h, ch) == (24, 16, 3)
        arr = np.frombuffer(out, dtype=np.uint8).reshape(16, 24, 3).astype(int)
        for (bx, by), (r, g, b) in consts.items():
            y0 = clamp(rnd(0.299 * r + 0.587 * g + 0.114 * b))
            cb0 = clamp(rnd(128 - 0.168736 * r - 0.331264 * g + 0.5 * b))
            cr0 = clamp(rnd(128 + 0.5 * r - 0.418688 * g - 0.081312 * b))
            y1 = clamp(rnd(rnd(8 * (y0 - 128) / 16.0) * 16 / 8.0 + 128))
            cb1 = clamp(rnd(rnd(8 * (cb0 - 128) / 17.0) * 17 / 8.0 + 128))
            cr1 = clamp(rnd(rnd(8 * (cr0 - 128) / 17.0) * 17 / 8.0 + 128))
            want = (
                clamp(rnd(y1 + 1.402 * (cr1 - 128))),
                clamp(rnd(y1 - 0.344136 * (cb1 - 128) - 0.714136 * (cr1 - 128))),
                clamp(rnd(y1 + 1.772 * (cb1 - 128))),
            )
            blk = arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (blk == blk[0, 0]).all(), (bx, by)
            assert tuple(blk[0, 0]) == want, (bx, by)

    def test_general_roundtrip_error_bounded(self):
        """Arbitrary (non-flat) content exercises the AC run-length +
        Huffman paths; the lossy round trip must stay within the error a
        baseline encode at these tables can introduce."""
        rng = np.random.RandomState(7)
        # smooth gradient + mild noise: realistic spectrum, bounded ACs
        yy, xx = np.mgrid[0:16, 0:32]
        img = np.stack(
            [(4 * xx + 3 * yy + c * 40) % 256 for c in range(3)], axis=-1
        ).astype(np.uint8)
        img = np.clip(img.astype(int) + rng.randint(-8, 9, img.shape), 0, 255)
        img = img.astype(np.uint8)
        data = J.encode_jpeg(32, 16, img.tobytes())
        w, h, _, out = J.decode_jpeg(data)
        arr = np.frombuffer(out, dtype=np.uint8).reshape(16, 32, 3).astype(int)
        err = np.abs(arr - img.astype(int))
        assert err.mean() < 20 and (w, h) == (32, 16)

    def test_dc_prediction_across_blocks(self):
        # strongly differing block DCs -> large positive AND negative DC
        # diffs through the Huffman DC path
        consts = {(bx, by): (255 if (bx + by) % 2 else 0,) * 3
                  for bx in range(4) for by in range(3)}
        img = _block_image(32, 24, consts)
        _, _, _, out = J.decode_jpeg(J.encode_jpeg(32, 24, img.tobytes()))
        arr = np.frombuffer(out, dtype=np.uint8).reshape(24, 32, 3).astype(int)
        assert arr[0, 0, 0] < 10 and arr[0, 8, 0] > 245

    def test_420_constant_mcus_closed_form(self):
        """4:2:0 with per-16×16-MCU constants keeps the DC-only closed
        form: 2×2 chroma averaging of a constant is the constant, and
        replication upsampling restores it exactly."""
        import math

        def rnd(x):
            return math.floor(x + (0.5 + 1e-9))

        def clamp(v):
            return max(0, min(255, v))

        consts = {(0, 0): (37, 180, 222), (1, 0): (200, 15, 90)}
        img = np.zeros((16, 32, 3), dtype=np.uint8)
        for (mbx, mby), c in consts.items():
            img[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = c
        data = J.encode_jpeg(32, 16, img.tobytes(), subsampling="420")
        w, h, _, out = J.decode_jpeg(data)
        arr = np.frombuffer(out, dtype=np.uint8).reshape(16, 32, 3).astype(int)
        for (mbx, mby), (r, g, b) in consts.items():
            y0 = clamp(rnd(0.299 * r + 0.587 * g + 0.114 * b))
            cb0 = clamp(rnd(128 - 0.168736 * r - 0.331264 * g + 0.5 * b))
            cr0 = clamp(rnd(128 + 0.5 * r - 0.418688 * g - 0.081312 * b))
            y1 = clamp(rnd(rnd(8 * (y0 - 128) / 16.0) * 16 / 8.0 + 128))
            cb1 = clamp(rnd(rnd(8 * (cb0 - 128) / 17.0) * 17 / 8.0 + 128))
            cr1 = clamp(rnd(rnd(8 * (cr0 - 128) / 17.0) * 17 / 8.0 + 128))
            want = (
                clamp(rnd(y1 + 1.402 * (cr1 - 128))),
                clamp(rnd(y1 - 0.344136 * (cb1 - 128) - 0.714136 * (cr1 - 128))),
                clamp(rnd(y1 + 1.772 * (cb1 - 128))),
            )
            mcu = arr[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
            assert (mcu == mcu[0, 0]).all() and tuple(mcu[0, 0]) == want

    def test_420_general_roundtrip(self):
        yy, xx = np.mgrid[0:32, 0:48]
        img = np.stack(
            [(2 * xx + 3 * yy + c * 30) % 256 for c in range(3)], axis=-1
        ).astype(np.uint8)
        data = J.encode_jpeg(48, 32, img.tobytes(), subsampling="420")
        w, h, _, out = J.decode_jpeg(data)
        arr = np.frombuffer(out, dtype=np.uint8).reshape(32, 48, 3).astype(int)
        assert (w, h) == (48, 32)
        assert np.abs(arr - img.astype(int)).mean() < 20

    def test_unknown_subsampling_rejected(self):
        with pytest.raises(J.JpegError):
            J.encode_jpeg(16, 16, bytes(16 * 16 * 3), subsampling="411")
        # 24x16 4:2:0 (not an MCU multiple) encodes via edge padding (r7)
        w, h, ch, _ = J.decode_jpeg(
            J.encode_jpeg(24, 16, bytes(24 * 16 * 3), subsampling="420")
        )
        assert (w, h, ch) == (24, 16, 3)

    def test_corrupt_payloads_raise(self):
        img = _block_image(16, 16, {(bx, by): (10, 200, 30)
                                    for bx in range(2) for by in range(2)})
        data = J.encode_jpeg(16, 16, img.tobytes())
        with pytest.raises(J.JpegError):
            J.decode_jpeg(b"\x00\x01" + data[2:])  # bad SOI
        with pytest.raises(J.JpegError):
            J.decode_jpeg(data[: int(len(data) * 0.6)])  # truncated scan
        with pytest.raises(J.JpegError):
            J.decode_jpeg(data[:30])  # truncated segments

    def test_malformed_segment_bodies_raise_typed_error(self):
        """Attacker-shaped bytes that pass the segment length check but
        break body parsing must raise JpegError, never IndexError /
        struct.error / bare ValueError (the decode_ok=False contract —
        the crafted prefixes that previously escaped as parser slips)."""
        for payload in (
            b"\xff\xd8\xff\xc0\x00\x02\xff\xd9",  # empty SOF body
            b"\xff\xd8\xff\xc0\x00\x04\x08\x00\xff\xd9",  # short SOF body
            b"\xff\xd8\xff\xc0\x00\x07\x08\x00\x10\x00\x10\xff\xd9",
            b"\xff\xd8\xff\xda\x00\x02\xff\xd9",  # empty SOS body
        ):
            with pytest.raises(J.JpegError):
                J.decode_jpeg(payload)

    def test_scan_component_order_matched_by_id(self):
        """T.81 matches scan selectors to SOF components BY ID — a legal
        stream whose SOS (and entropy order) is Cb,Y,Cr must decode
        identically to the canonical Y,Cb,Cr encoding; unknown or
        duplicate selectors are rejected."""
        import struct

        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[:8, :8] = (10, 200, 30)
        img[8:, :] = (77, 30, 90)
        canonical = J.encode_jpeg(16, 16, img.tobytes())

        def encode_order(order):
            ycc = J.rgb_to_ycbcr(img)
            dc_lum = J._canonical_codes(J.DC_LUM_BITS, J.DC_LUM_VALS)
            dc_chrom = J._canonical_codes(J.DC_CHROM_BITS, J.DC_CHROM_VALS)
            ac = J._canonical_codes(J.AC_BITS, J.AC_VALS)
            w = J._BitWriter()
            preds = [0, 0, 0]
            quants = [J.QUANT_LUM, J.QUANT_CHROM, J.QUANT_CHROM]
            dcs = [dc_lum, dc_chrom, dc_chrom]
            for by in range(2):
                for bx in range(2):
                    for comp in order:
                        block = ycc[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, comp]
                        preds[comp] = J._encode_block(
                            w, block, quants[comp], preds[comp], dcs[comp], ac
                        )
            scan = w.flush()
            jfif = (b"JFIF\x00" + bytes([1, 2, 0])
                    + struct.pack(">HH", 1, 1) + b"\x00\x00")
            sof = bytes([8]) + struct.pack(">HH", 16, 16) + bytes([3])
            for cid, tq in ((1, 0), (2, 1), (3, 1)):
                sof += bytes([cid, 0x11, tq])
            sos = bytes([3])
            for comp in order:
                cid = comp + 1
                sos += bytes([cid, 0x00 if comp == 0 else 0x11])
            sos += bytes([0, 63, 0])
            return (b"\xff\xd8" + J._seg(0xE0, jfif)
                    + J._seg(0xDB, J._dqt_body(0, J.QUANT_LUM))
                    + J._seg(0xDB, J._dqt_body(1, J.QUANT_CHROM))
                    + J._seg(0xC0, sof)
                    + J._seg(0xC4, J._dht_body(0x00, J.DC_LUM_BITS, J.DC_LUM_VALS))
                    + J._seg(0xC4, J._dht_body(0x01, J.DC_CHROM_BITS, J.DC_CHROM_VALS))
                    + J._seg(0xC4, J._dht_body(0x10, J.AC_BITS, J.AC_VALS))
                    + J._seg(0xC4, J._dht_body(0x11, J.AC_BITS, J.AC_VALS))
                    + J._seg(0xDA, sos) + scan + b"\xff\xd9")

        reordered = encode_order((1, 0, 2))  # Cb, Y, Cr
        assert J.decode_jpeg(reordered) == J.decode_jpeg(canonical)
        # unknown / duplicate selectors rejected
        i = canonical.find(b"\xff\xda")
        bad = bytearray(canonical)
        bad[i + 5] = 9
        with pytest.raises(J.JpegError):
            J.decode_jpeg(bytes(bad))
        dup = bytearray(canonical)
        dup[i + 5] = 2
        with pytest.raises(J.JpegError):
            J.decode_jpeg(bytes(dup))

    def test_profile_rejections(self):
        with pytest.raises(J.JpegError):
            J.encode_jpeg(16, 16, bytes(10))  # wrong buffer size
        with pytest.raises(J.JpegError):
            J.encode_jpeg(0, 16, b"")  # zero dimension
        # non-multiple-of-8 dims encode via edge padding (r7)
        w, h, ch, _ = J.decode_jpeg(J.encode_jpeg(12, 16, bytes(12 * 16 * 3)))
        assert (w, h, ch) == (12, 16, 3)

    def test_zero_dimension_sof_rejected(self):
        """A stream declaring 0×N dims must not 'succeed' as an empty
        decode — the encoder rejects them, the decoder must too."""
        import struct

        img = _block_image(16, 16, {(bx, by): (1, 2, 3)
                                    for bx in range(2) for by in range(2)})
        data = bytearray(J.encode_jpeg(16, 16, img.tobytes()))
        i = bytes(data).find(b"\xff\xc0")
        # SOF body: len(2) precision(1) height(2) width(2)...
        struct.pack_into(">H", data, i + 5, 0)  # height := 0
        with pytest.raises(J.JpegError):
            J.decode_jpeg(bytes(data))

    def test_memory_bomb_dims_rejected(self):
        """r8 (ADVICE): header-declared dims are attacker-controlled and
        every coefficient buffers as int64 before reconstruction — a
        4:4:4 header above 1<<23 pixels (which at the former 1<<24 cap
        could pin ~600 MB per payload per Arrow worker) must take the
        honest-failure path, not allocate."""
        import struct

        img = _block_image(16, 16, {(bx, by): (1, 2, 3)
                                    for bx in range(2) for by in range(2)})
        data = bytearray(J.encode_jpeg(16, 16, img.tobytes()))
        i = bytes(data).find(b"\xff\xc0")
        struct.pack_into(">H", data, i + 5, 4096)  # height := 4096
        struct.pack_into(">H", data, i + 7, 4096)  # width  := 4096 (2^24 px)
        with pytest.raises(J.JpegError):
            J.decode_jpeg(bytes(data))

    def test_oversubscribed_dht_rejected(self):
        """A DHT whose bits counts exceed the canonical code space must
        raise, not produce a table that 'decodes' arbitrary entropy."""
        with pytest.raises(J.JpegError):
            J._canonical_codes([2, 1] + [0] * 14, [0, 1, 2])

    def test_zrl_past_block_end_rejected(self):
        """A crafted scan emitting ZRL with <16 AC slots left must raise
        instead of silently desynchronizing the bit stream."""
        # white-box: encode a stream whose single AC table maps a 2-bit
        # code to ZRL, then hand-write entropy data = DC 0 + 4x ZRL
        import struct

        bits = [0, 2] + [0] * 14  # two 2-bit codes
        vals = [0x00, 0xF0]  # EOB, ZRL
        codes = J._canonical_codes(bits, vals)
        w = J._BitWriter()
        dc = J._canonical_codes(J.DC_LUM_BITS, J.DC_LUM_VALS)
        for _comp in range(3):  # one MCU, 3 components
            c, ln = dc[0]
            w.write(c, ln)  # DC size 0
            zc, zln = codes[0xF0]
            for _ in range(4):  # 4 x ZRL = 64 > 63 AC slots
                w.write(zc, zln)
        scan = w.flush()
        jfif = (b"JFIF\x00" + bytes([1, 2, 0])
                + struct.pack(">HH", 1, 1) + b"\x00\x00")
        sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([3])
        for cid in (1, 2, 3):
            sof += bytes([cid, 0x11, 0])
        sos = bytes([3])
        for cid in (1, 2, 3):
            sos += bytes([cid, 0x00])
        sos += bytes([0, 63, 0])
        data = (b"\xff\xd8" + J._seg(0xE0, jfif)
                + J._seg(0xDB, J._dqt_body(0, J.QUANT_LUM))
                + J._seg(0xC0, sof)
                + J._seg(0xC4, J._dht_body(0x00, J.DC_LUM_BITS, J.DC_LUM_VALS))
                + J._seg(0xC4, J._dht_body(0x10, bits, vals))
                + J._seg(0xDA, sos) + scan + b"\xff\xd9")
        with pytest.raises(J.JpegError):
            J.decode_jpeg(data)


class TestSparkPlumbing:
    def test_gate_matches_direct_decode(self, spark):
        from bigdata_lab02_spark.operators.multimodal import (
            extract_jpeg_stats,
            synthetic_jpeg,
        )

        rows = {r["media_id"]: r
                for r in extract_jpeg_stats(synthetic_jpeg(spark, n=16)).collect()}
        assert len(rows) == 16
        for mid, r in rows.items():
            s = mid % 16
            if s in (3, 7, 11, 15):  # corrupt stripes
                assert r["decode_ok"] is False and r["sum_r"] is None
                continue
            assert r["decode_ok"] is True
            assert r["sum_r"] is not None and r["sum_r"] >= 0
            if s in (1, 5, 9, 13, 14):  # 4:2:0 / 4:2:2 stripes
                assert r["width"] == 16 * (1 + mid % 3)
                assert r["height"] == 16
            elif s == 2:  # non-MCU-multiple dims stripe
                assert r["width"] == 8 * (2 + mid % 3) + 6
                assert r["height"] == 8 * (2 + mid % 2) + 4
            else:
                assert r["width"] == 8 * (2 + mid % 3)
                assert r["height"] == 8 * (2 + mid % 2)


class TestRestartAndGrayscale:
    """Round-7 profile extensions (VERDICT r6 item 2): DRI/RSTn restart
    intervals and 1-component grayscale SOF."""

    def _img(self, w, h, seed=0):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    def test_restart_interval_decodes_identically(self):
        """Restarts only reset DC predictors and byte-align — the decoded
        pixels must be bit-identical to the restart-free stream, at every
        interval and in both sampling layouts."""
        img = self._img(48, 32, 1)
        plain = J.decode_jpeg(J.encode_jpeg(48, 32, img.tobytes()))
        for ri in (1, 2, 3, 5, 24):
            withri = J.encode_jpeg(48, 32, img.tobytes(), restart_interval=ri)
            if ri < 24:  # 24 MCUs: interval >= count emits no marker
                assert b"\xff\xdd" in withri and b"\xff\xd0" in withri
            assert J.decode_jpeg(withri) == plain
        img2 = self._img(64, 32, 2)
        p420 = J.decode_jpeg(J.encode_jpeg(64, 32, img2.tobytes(), subsampling="420"))
        assert J.decode_jpeg(J.encode_jpeg(
            64, 32, img2.tobytes(), subsampling="420", restart_interval=2)) == p420

    def test_rst_index_cycles_past_8(self):
        """>8 restarts forces the 0xD0..0xD7 index to wrap — the decoder
        must track the cycle, not just the first 8."""
        img = self._img(96, 32, 3)  # 12x4 = 48 MCUs, 47 restarts at ri=1
        data = J.encode_jpeg(96, 32, img.tobytes(), restart_interval=1)
        assert data.count(b"\xff\xd7") >= 5  # wraps several times
        assert J.decode_jpeg(data) == J.decode_jpeg(J.encode_jpeg(96, 32, img.tobytes()))

    def test_out_of_sequence_rst_rejected(self):
        img = self._img(32, 16, 4)
        data = bytearray(J.encode_jpeg(32, 16, img.tobytes(), restart_interval=1))
        i = bytes(data).find(b"\xff\xd0")
        data[i + 1] = 0xD5
        with pytest.raises(J.JpegError):
            J.decode_jpeg(bytes(data))

    def test_rst_without_dri_rejected(self):
        img = self._img(32, 16, 5)
        data = J.encode_jpeg(32, 16, img.tobytes(), restart_interval=1)
        # strip the DRI segment (FF DD 00 04 00 01)
        stripped = data.replace(b"\xff\xdd\x00\x04\x00\x01", b"", 1)
        assert len(stripped) == len(data) - 6
        with pytest.raises(J.JpegError):
            J.decode_jpeg(stripped)

    def test_bad_dri_length_rejected(self):
        with pytest.raises(J.JpegError):
            J.decode_jpeg(b"\xff\xd8\xff\xdd\x00\x03\x00\xff\xd9")

    def test_grayscale_roundtrip_is_luma(self):
        """Grayscale encode keeps only Y; decode replicates it into RGB.
        The decoded Y must equal the 3-component stream's decoded Y plane
        reconstruction (same DCT/quant path, no chroma influence)."""
        img = self._img(24, 16, 6)
        w, h, ch, px = J.decode_jpeg(J.encode_jpeg(24, 16, img.tobytes(),
                                                   subsampling="gray"))
        assert (w, h, ch) == (24, 16, 3)
        a = np.frombuffer(px, np.uint8).reshape(h, w, 3)
        assert (a[..., 0] == a[..., 1]).all() and (a[..., 0] == a[..., 2]).all()

    def test_grayscale_constant_blocks_closed_form(self):
        """Per-block-constant grayscale follows the luma-only DC closed
        form: y1 = rnd(rnd(8*(y0-128)/Q00)*Q00/8 + 128), replicated."""
        consts = {(0, 0): (10, 200, 30), (1, 0): (250, 5, 128)}
        img = _block_image(16, 8, consts)
        w, h, _, px = J.decode_jpeg(J.encode_jpeg(16, 8, img.tobytes(),
                                                  subsampling="gray",
                                                  restart_interval=1))
        a = np.frombuffer(px, np.uint8).reshape(h, w, 3)
        for (bx, by), (r, g, b) in consts.items():
            y0 = min(255, max(0, int(np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5 + 1e-9))))
            dc = int(np.floor(8 * (y0 - 128) / 16.0 + 0.5 + 1e-9))
            y1 = min(255, max(0, int(np.floor(dc * 16 / 8.0 + 128 + 0.5 + 1e-9))))
            blk = a[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (blk == y1).all()

    def test_grayscale_odd_dims_pad_and_crop(self):
        w, h, ch, px = J.decode_jpeg(
            J.encode_jpeg(12, 8, bytes(12 * 8 * 3), subsampling="gray")
        )
        assert (w, h, ch) == (12, 8, 3) and len(px) == 12 * 8 * 3

    def test_fuzz_dri_stream_never_crashes(self):
        """Single-byte mutations over a DRI-bearing grayscale+color pair:
        decode either succeeds or raises JpegError — the honest-failure
        contract extends to the new marker paths."""
        img = self._img(16, 16, 7)
        streams = [
            J.encode_jpeg(16, 16, img.tobytes(), restart_interval=1),
            J.encode_jpeg(16, 16, img.tobytes(), subsampling="gray",
                          restart_interval=1),
        ]
        for data in streams:
            for i in range(len(data)):
                for delta in (0x01, 0x80, 0xFF):
                    mutated = bytearray(data)
                    mutated[i] ^= delta
                    try:
                        J.decode_jpeg(bytes(mutated))
                    except J.JpegError:
                        pass


class TestProgressive:
    """Round-7 SOF2 support: the 6-phase scan script (DC first/refine,
    two AC bands first + refine per component) with successive
    approximation. Progressive re-orders the SAME quantized
    coefficients, so decode must be BIT-IDENTICAL to the baseline
    encoding of the same pixels — the strongest possible oracle."""

    def _img(self, w, h, seed):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    @pytest.mark.parametrize("sub,mult", [("444", 8), ("420", 16), ("gray", 8)])
    def test_progressive_equals_baseline(self, sub, mult):
        for wi, hi, seed in ((2, 2, 1), (3, 1, 2), (4, 2, 3)):
            w, h = mult * wi, mult * hi
            img = self._img(w, h, seed)
            base = J.decode_jpeg(J.encode_jpeg(w, h, img.tobytes(), subsampling=sub))
            prog = J.decode_jpeg(J.encode_jpeg(w, h, img.tobytes(), subsampling=sub,
                                               progressive=True))
            assert prog == base, (sub, w, h)

    @pytest.mark.parametrize("ri", [1, 2, 3])
    def test_progressive_restart_intervals(self, ri):
        img = self._img(48, 32, 7)
        base = J.decode_jpeg(J.encode_jpeg(48, 32, img.tobytes()))
        prog = J.encode_jpeg(48, 32, img.tobytes(), progressive=True,
                             restart_interval=ri)
        assert b"\xff\xdd" in prog and b"\xff\xd0" in prog
        assert J.decode_jpeg(prog) == base

    def test_extreme_images(self):
        """Saturated / flat / checkerboard pixels stress the DC swings
        and the AC refinement correction-bit paths."""
        for img in (
            np.zeros((16, 16, 3), np.uint8),
            np.full((16, 16, 3), 255, np.uint8),
            (np.indices((16, 16)).sum(0) % 2 * 255)
            .astype(np.uint8)[..., None].repeat(3, -1),
        ):
            base = J.decode_jpeg(J.encode_jpeg(16, 16, img.tobytes()))
            prog = J.decode_jpeg(J.encode_jpeg(16, 16, img.tobytes(),
                                               progressive=True))
            assert prog == base

    def test_truncated_progressive_raises(self):
        data = J.encode_jpeg(16, 16, self._img(16, 16, 9).tobytes(),
                             progressive=True)
        for frac in (0.3, 0.6, 0.9):
            with pytest.raises(J.JpegError):
                J.decode_jpeg(data[: int(len(data) * frac)])

    def test_missing_eoi_raises_even_at_scan_boundary(self):
        """A stream cut exactly at a marker boundary must NOT decode as a
        partial image — the EOI requirement makes every truncation an
        honest failure."""
        data = J.encode_jpeg(16, 16, self._img(16, 16, 10).tobytes(),
                             progressive=True)
        assert data.endswith(b"\xff\xd9")
        with pytest.raises(J.JpegError):
            J.decode_jpeg(data[:-2])  # all scans intact, EOI gone

    def test_out_of_sequence_rst_in_progressive_scan(self):
        data = bytearray(J.encode_jpeg(16, 16, self._img(16, 16, 11).tobytes(),
                                       progressive=True, restart_interval=1))
        i = bytes(data).find(b"\xff\xd0")
        assert i > 0
        data[i + 1] = 0xD6
        with pytest.raises(J.JpegError):
            J.decode_jpeg(bytes(data))

    def test_refinement_order_enforced(self):
        """A refinement scan whose band was never first-pass-sent (or a
        band re-sent at Ah=0) must raise — the successive-approximation
        chain is tracked per coefficient."""
        data = J.encode_jpeg(16, 16, self._img(16, 16, 12).tobytes(),
                             progressive=True)
        # find the SOS segments in order; drop the FIRST one (DC first
        # pass) so the DC refinement arrives without its band
        segs = []
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                break
            marker = data[pos + 1]
            if marker == 0xD9:
                break
            (ln,) = __import__("struct").unpack_from(">H", data, pos + 2)
            segs.append((pos, marker, pos + 2 + ln))
            if marker == 0xDA:
                # skip entropy to the next 0xFF that starts a real marker
                p = pos + 2 + ln
                while p + 1 < len(data) and not (
                    data[p] == 0xFF and data[p + 1] != 0x00
                    and not (0xD0 <= data[p + 1] <= 0xD7)
                ):
                    p += 1
                segs[-1] = (pos, marker, p)
            pos = segs[-1][2]
        first_sos = next(s for s in segs if s[1] == 0xDA)
        cut = data[: first_sos[0]] + data[first_sos[2]:]
        with pytest.raises(J.JpegError):
            J.decode_jpeg(cut)

    def test_fuzz_progressive_never_crashes(self):
        data = J.encode_jpeg(16, 16, self._img(16, 16, 13).tobytes(),
                             progressive=True, restart_interval=1)
        for i in range(len(data)):
            for delta in (0x01, 0x80, 0xFF):
                m = bytearray(data)
                m[i] ^= delta
                try:
                    J.decode_jpeg(bytes(m))
                except J.JpegError:
                    pass

    def test_eobn_runs_span_blocks(self):
        """r7 follow-up: AC scans aggregate cross-block EOBn runs (the
        encoding real progressive files use). A mostly-flat image makes
        the run span many blocks — first-pass EOBn decode — and a sparse
        image drives the refinement tail handler (correction bits read
        block-by-block while the run drains). Both must still decode
        bit-identically to baseline, with and without restart markers
        (a run must never span a restart)."""
        flat = np.zeros((32, 48, 3), np.uint8)
        flat[:8, :8] = (200, 30, 90)
        sparse = np.zeros((48, 64, 3), np.uint8)
        sparse[::7, ::5] = (255, 128, 3)
        for img, w, h in ((flat, 48, 32), (sparse, 64, 48)):
            base = J.decode_jpeg(J.encode_jpeg(w, h, img.tobytes()))
            for ri in (0, 1, 2):
                prog = J.encode_jpeg(w, h, img.tobytes(), progressive=True,
                                     restart_interval=ri)
                assert J.decode_jpeg(prog) == base, (w, h, ri)
        # the flat stream must actually CONTAIN an EOBn symbol: it is
        # dramatically smaller than one EOB0 per block per AC scan could
        # ever be (24 blocks x 6 AC scan-passes of >= 2 bits each, plus
        # headers, would exceed this)
        assert len(J.encode_jpeg(48, 32, flat.tobytes(),
                                 progressive=True)) < 900


class TestArbitraryDimsAnd422:
    """Round-7 follow-up: arbitrary (non-MCU-multiple) dimensions via
    edge-replication padding + crop (T.81 A.2.4), and the 4:2:2
    sampling layout. Real crawl images are rarely 8/16-multiples."""

    def _img(self, w, h, seed):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    @pytest.mark.parametrize("sub", ["444", "420", "422", "440", "gray"])
    @pytest.mark.parametrize("dims", [(12, 16), (17, 9), (1, 1), (33, 7)])
    def test_roundtrip_any_dims(self, sub, dims):
        w, h = dims
        img = self._img(w, h, w * 100 + h)
        for kw in ({}, {"progressive": True},
                   {"restart_interval": 1},
                   {"progressive": True, "restart_interval": 2}):
            dw, dh, ch, px = J.decode_jpeg(
                J.encode_jpeg(w, h, img.tobytes(), subsampling=sub, **kw)
            )
            assert (dw, dh, ch) == (w, h, 3)
            assert len(px) == w * h * 3
        base = J.decode_jpeg(J.encode_jpeg(w, h, img.tobytes(), subsampling=sub))
        prog = J.decode_jpeg(J.encode_jpeg(w, h, img.tobytes(), subsampling=sub,
                                           progressive=True))
        assert base == prog

    def test_constant_image_closed_form_at_odd_dims(self):
        """Edge padding replicates the constant, so every block stays
        DC-only and the whole visible region decodes to ONE value —
        the property the gate oracle's closed form relies on."""
        c = np.full((9, 13, 3), (10, 200, 30), np.uint8)
        w, h, _, px = J.decode_jpeg(J.encode_jpeg(13, 9, c.tobytes()))
        a = np.frombuffer(px, np.uint8).reshape(9, 13, 3)
        assert len({tuple(v) for v in a.reshape(-1, 3)}) == 1

    def test_422_err_bounded_and_chroma_halved(self):
        xx, yy = np.meshgrid(np.arange(32), np.arange(24))
        sm = np.stack([(2 * xx + yy) % 200 + 20] * 3, -1).astype(np.uint8)
        data = J.encode_jpeg(32, 24, sm.tobytes(), subsampling="422")
        # SOF declares luma 2x1
        i = data.find(b"\xff\xc0")
        assert data[i + 11] == 0x21  # first component h=2, v=1
        w, h, _, px = J.decode_jpeg(data)
        err = np.abs(
            np.frombuffer(px, np.uint8).reshape(24, 32, 3).astype(int)
            - sm.astype(int)
        ).max()
        assert err < 40

    def test_fuzz_odd_dims_never_crashes(self):
        data = J.encode_jpeg(13, 9, self._img(13, 9, 3).tobytes(),
                             subsampling="422", progressive=True)
        for i in range(len(data)):
            m = bytearray(data)
            m[i] ^= 0xFF
            try:
                J.decode_jpeg(bytes(m))
            except J.JpegError:
                pass


class TestProgressiveCoefficientPatterns:
    """White-box differential net for the progressive entropy coder:
    inject crafted coefficient spectra through a monkeypatched quantizer
    and assert progressive decode == baseline decode of the SAME
    coefficients. Targets the paths random images rarely produce:
    ZRL runs interleaved with history coefficients in refinement,
    EOBn runs spanning many blocks, magnitude-1-only tails, and dense
    high-band content."""

    def _roundtrip_equal(self, monkeypatch, pattern_fn, w=32, h=16):
        import bigdata_lab02_spark.operators.jpeg as jm

        orig = jm._quantize_block
        counter = {"i": 0}

        def patched(block, quant):
            zz = orig(block, quant)
            out = pattern_fn(counter["i"], list(zz))
            counter["i"] += 1
            # clamp to the coder's representable range
            return [max(-1023, min(1023, int(v))) for v in out]

        monkeypatch.setattr(jm, "_quantize_block", patched)
        img = np.zeros((h, w, 3), np.uint8)
        base = jm.encode_jpeg(w, h, img.tobytes())
        counter["i"] = 0
        prog = jm.encode_jpeg(w, h, img.tobytes(), progressive=True)
        counter["i"] = 0
        prog_ri = jm.encode_jpeg(w, h, img.tobytes(), progressive=True,
                                 restart_interval=1)
        monkeypatch.setattr(jm, "_quantize_block", orig)
        db = jm.decode_jpeg(base)
        assert jm.decode_jpeg(prog) == db
        assert jm.decode_jpeg(prog_ri) == db

    def test_zrl_with_interleaved_history(self, monkeypatch):
        # 17+ zero-history gaps around large (history) coefficients with
        # a trailing newly-significant value: the refinement ZRL + BR
        # buffering order is load-bearing here
        def pattern(i, zz):
            out = [0] * 64
            out[0] = 100
            out[5] = 40        # history (>1 at every Al)
            out[25] = 2        # becomes significant during refinement
            out[44] = -3
            out[63] = 1        # magnitude-1 at the band tail
            return out
        self._roundtrip_equal(monkeypatch, pattern)

    def test_eobn_run_spans_blocks(self, monkeypatch):
        # most blocks DC-only -> long EOBn runs; every 5th block breaks
        # the run with sparse content
        def pattern(i, zz):
            out = [0] * 64
            out[0] = (i * 13) % 200 - 100
            if i % 5 == 0:
                out[7] = 1
                out[60] = -1
            return out
        self._roundtrip_equal(monkeypatch, pattern)

    def test_dense_high_band(self, monkeypatch):
        def pattern(i, zz):
            return [((i + k) * 7) % 21 - 10 for k in range(64)]
        self._roundtrip_equal(monkeypatch, pattern)

    def test_alternating_sign_magnitude_one(self, monkeypatch):
        # all-ones spectra: every coefficient is newly significant in the
        # refinement passes' first pass at its band
        def pattern(i, zz):
            return [1 if k % 2 == 0 else -1 for k in range(64)]
        self._roundtrip_equal(monkeypatch, pattern)

    def test_negative_dc_refinement_bits(self, monkeypatch):
        # negative DCs exercise the arithmetic-shift point transform and
        # the |= correction-bit OR on negative stored values
        def pattern(i, zz):
            out = [0] * 64
            out[0] = -(i * 9 % 500) - 1
            out[1] = -1
            return out
        self._roundtrip_equal(monkeypatch, pattern)


class Test440:
    """r8: 4:4:0 (1x2 vertical chroma subsampling — what rotated or
    transposed 4:2:2 files carry)."""

    def test_440_directional_identity(self):
        """The defining property, asserted EXACTLY: vertical chroma
        averaging is the identity on content whose rows are constant,
        so 4:4:0 must decode x-varying images with literally the SAME
        error profile as 4:4:4 — while on y-varying images it matches
        4:2:0 (both average vertical chroma pairs). The mirror holds
        for 4:2:2. Measured, not bounded: the four decodes are
        byte-identical pairwise."""
        import numpy as np

        h, w = 16, 24

        def decode(img, sub):
            return J.decode_jpeg(
                J.encode_jpeg(w, h, img.tobytes(), subsampling=sub)
            )[3]

        imgx = np.zeros((h, w, 3), np.uint8)
        for x in range(w):
            imgx[:, x] = (50 + x * 8 % 180, 220 - x * 7 % 180,
                          30 + x * 5 % 180)
        imgy = np.zeros((h, w, 3), np.uint8)
        for y in range(h):
            imgy[y, :] = (50 + y * 8 % 180, 220 - y * 7 % 180,
                          30 + y * 5 % 180)
        assert decode(imgx, "440") == decode(imgx, "444")
        assert decode(imgy, "440") == decode(imgy, "420")
        assert decode(imgy, "422") == decode(imgy, "444")
        assert decode(imgx, "422") == decode(imgx, "420")
        # and the subsampled directions really are lossy (the identities
        # above aren't vacuous)
        assert decode(imgy, "440") != decode(imgy, "444")
        assert decode(imgx, "422") != decode(imgx, "444")

    def test_440_constant_closed_form(self):
        """A constant image stays DC-only through vertical subsampling:
        the whole visible region decodes to one value — the property a
        gate oracle would rely on."""
        import numpy as np

        c = np.full((9, 13, 3), (10, 200, 30), np.uint8)
        w, h, _, px = J.decode_jpeg(
            J.encode_jpeg(13, 9, c.tobytes(), subsampling="440")
        )
        a = np.frombuffer(px, np.uint8).reshape(9, 13, 3)
        assert (a == a[0, 0]).all()

    def test_440_chroma_plane_is_half_height(self):
        """White-box: the SOF declares (1,2),(1,1),(1,1) and the stream
        decodes — i.e. the chroma planes really are half-height and the
        decoder's vertical replication restores them."""
        import struct

        data = J.encode_jpeg(16, 16, bytes((i * 7) % 256 for i in range(768)),
                             subsampling="440")
        i = data.find(b"\xff\xc0")
        body = data[i + 4:]
        comps = [(body[6 + c * 3 + 1] >> 4, body[6 + c * 3 + 1] & 15)
                 for c in range(body[5])]
        assert comps == [(1, 2), (1, 1), (1, 1)]


class Test12Bit:
    """r9: 12-bit extended-sequential (SOF1) — level shift 2048, DC
    categories to 15, Pq=1 quant tables, >>4 reduction to the 8-bit
    pixel surface (the PNG-16-bit discipline)."""

    def test_constant_image_exact(self):
        w, h = 20, 12
        data = J.encode_jpeg12_gray(w, h, [3000] * (w * h))
        gw, gh, ch, rgb = J.decode_jpeg(data)
        assert (gw, gh, ch) == (w, h, 3)
        a = np.frombuffer(rgb, np.uint8)
        assert set(a.tolist()) == {3000 >> 4}

    @pytest.mark.parametrize("quant16", [False, True])
    def test_gradient_within_one_level(self, quant16):
        # smooth 12-bit ramp spanning most of the range; after the >>4
        # reduction a correct decode sits within 1 intensity level
        w, h = 24, 16
        vals = [min(4095, 100 + x * 11 + y * 13)
                for y in range(h) for x in range(w)]
        data = J.encode_jpeg12_gray(w, h, vals, quant16=quant16)
        gw, gh, _, rgb = J.decode_jpeg(data)
        got = np.frombuffer(rgb, np.uint8).reshape(gh, gw, 3)[..., 0]
        want = np.array(vals).reshape(h, w) >> 4
        assert np.abs(got.astype(int) - want).max() <= 1

    def test_uses_high_dc_categories(self):
        # alternating extreme blocks force DC diffs beyond the 8-bit
        # category ceiling (11) — the 16-category table must carry them
        w, h = 32, 8
        vals = []
        for y in range(h):
            for x in range(w):
                vals.append(40 if (x // 8) % 2 == 0 else 4060)
        data = J.encode_jpeg12_gray(w, h, vals)
        gw, gh, _, rgb = J.decode_jpeg(data)
        got = np.frombuffer(rgb, np.uint8).reshape(gh, gw, 3)[..., 0]
        # block interiors recover the plateau values
        assert abs(int(got[4, 4]) - (40 >> 4)) <= 2
        assert abs(int(got[4, 12]) - (4060 >> 4)) <= 2

    def test_sof_marker_and_quant_precision_pinned(self):
        data = J.encode_jpeg12_gray(8, 8, [1234] * 64, quant16=True)
        assert b"\xff\xc1" in data and b"\xff\xc0" not in data
        i = data.find(b"\xff\xdb")
        assert data[i + 4] == 0x10  # Pq=1, Tq=0
        i = data.find(b"\xff\xc1")
        assert data[i + 4] == 12  # sample precision

    def test_12bit_baseline_and_progressive_rejected(self):
        data = bytearray(J.encode_jpeg12_gray(8, 8, [99] * 64))
        i = data.find(b"\xff\xc1")
        for bad_sof in (0xC0, 0xC2):
            mut = bytearray(data)
            mut[i + 1] = bad_sof
            with pytest.raises(J.JpegError, match="precision 12"):
                J.decode_jpeg(bytes(mut))

    def test_out_of_range_samples_rejected(self):
        with pytest.raises(J.JpegError, match="0..4095"):
            J.encode_jpeg12_gray(2, 2, [0, 1, 2, 4096])

    def test_byte_flip_never_hangs_or_miscounts(self):
        # fuzz discipline of the other codecs: every single-byte flip
        # either decodes to the right shape or raises J.JpegError
        data = J.encode_jpeg12_gray(16, 8, [200 + 17 * i for i in range(128)])
        rng = np.random.default_rng(7)
        for pos in rng.choice(len(data), size=60, replace=False):
            mut = bytearray(data)
            mut[pos] ^= 0x5A
            try:
                gw, gh, ch, rgb = J.decode_jpeg(bytes(mut))
                assert len(rgb) == gw * gh * ch
            except J.JpegError:
                pass


class TestHeaderMetadata:
    """r9: header-only metadata scan (no entropy decode) + EXIF
    orientation parse."""

    def test_committed_exif_fixture(self):
        from pathlib import Path

        fix = Path(__file__).resolve().parent / "fixtures" / "foreign"
        m = J.jpeg_metadata((fix / "imageio_exif.jpg").read_bytes())
        assert (m["width"], m["height"], m["ncomp"]) == (24, 16, 3)
        assert m["has_exif"] is True and m["exif_orientation"] == 1
        # APP1/EXIF + APP13 spliced before the base image's JFIF APP0
        assert m["app_markers"][:3] == [1, 13, 0]
        base = J.jpeg_metadata((fix / "imageio_base.jpg").read_bytes())
        assert base["has_exif"] is False
        assert base["exif_orientation"] is None

    def test_sof_fields(self):
        img = _block_image(
            16, 16, {(0, 0): 10, (1, 0): 60, (0, 1): 110, (1, 1): 160}
        )
        prog = J.jpeg_metadata(
            J.encode_jpeg(16, 16, img.tobytes(), progressive=True)
        )
        assert prog["progressive"] is True and prog["sof"] == 2
        twelve = J.jpeg_metadata(J.encode_jpeg12_gray(8, 8, [50] * 64))
        assert twelve["precision"] == 12 and twelve["sof"] == 1
        assert twelve["ncomp"] == 1 and twelve["progressive"] is False

    def test_big_endian_tiff(self):
        import struct as st

        # MM-endian TIFF with orientation 6 (90° CW rotation flag)
        ifd = (
            st.pack(">H", 1)
            + st.pack(">HHI", 0x0112, 3, 1) + st.pack(">HH", 6, 0)
            + st.pack(">I", 0)
        )
        tiff = b"MM" + st.pack(">H", 42) + st.pack(">I", 8) + ifd
        payload = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + st.pack(">H", len(payload) + 2) + payload
        base = J.encode_jpeg12_gray(8, 8, [50] * 64)
        data = base[:2] + app1 + base[2:]
        m = J.jpeg_metadata(data)
        assert m["has_exif"] is True and m["exif_orientation"] == 6

    def test_malformed_exif_degrades_to_none(self):
        import struct as st

        payload = b"Exif\x00\x00" + b"XX" + b"\x00" * 8  # bad byte order
        app1 = b"\xff\xe1" + st.pack(">H", len(payload) + 2) + payload
        base = J.encode_jpeg12_gray(8, 8, [50] * 64)
        m = J.jpeg_metadata(base[:2] + app1 + base[2:])
        assert m["has_exif"] is True and m["exif_orientation"] is None

    def test_no_sof_raises(self):
        with pytest.raises(J.JpegError, match="missing SOF"):
            J.jpeg_metadata(b"\xff\xd8\xff\xd9\x00\x00")


class TestArithmetic:
    """r9: SOF9 sequential arithmetic decoding (T.81 Annex D / F.2.4),
    validated against SYSTEM-libjpeg-encoded foreign fixtures in
    test_foreign_media.py; here the failure taxonomy."""

    FIX = __import__("pathlib").Path(__file__).resolve().parent / "fixtures" / "foreign"

    def test_truncation_is_honest(self):
        data = (self.FIX / "libjpeg_arith_rgb420.jpg").read_bytes()
        # cut inside the entropy data (before EOI)
        with pytest.raises(J.JpegError):
            J.decode_jpeg(data[: len(data) - 8])

    def test_restart_markers_consumed_in_sequence(self):
        data = bytearray((self.FIX / "libjpeg_arith_rst.jpg").read_bytes())
        # find the first RSTn and break its sequence number
        for i in range(2, len(data) - 1):
            if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
                data[i + 1] = 0xD0 + ((data[i + 1] - 0xD0 + 3) % 8)
                break
        else:
            raise AssertionError("no RSTn found")
        with pytest.raises(J.JpegError, match="restart"):
            J.decode_jpeg(bytes(data))

    def test_byte_flip_never_hangs_or_miscounts(self):
        # arithmetic streams adapt their statistics from the data, so a
        # flipped byte can decode to ANY coefficients — the contract is
        # shape-or-JpegError, never a hang or a wrong-size buffer
        data = (self.FIX / "libjpeg_arith_rgb444.jpg").read_bytes()
        rng = np.random.default_rng(11)
        for pos in rng.choice(len(data), size=80, replace=False):
            mut = bytearray(data)
            mut[pos] ^= 0x3C
            try:
                gw, gh, ch, rgb = J.decode_jpeg(bytes(mut))
                assert len(rgb) == gw * gh * ch
            except J.JpegError:
                pass

    def test_bad_dac_rejected(self):
        data = bytearray((self.FIX / "libjpeg_arith_gray.jpg").read_bytes())
        i = data.find(b"\xff\xcc")
        assert i >= 0
        # DC conditioning with L > U
        data[i + 5] = 0x0F  # (Tc=0,Tb=0) value: U=0, L=15
        with pytest.raises(J.JpegError, match="DAC"):
            J.decode_jpeg(bytes(data))

    def test_marker_tail_padding_decodes(self):
        # hitting EOI mid-renormalization is legal: the tail symbols
        # decode from supplied zero bytes — every fixture exercises
        # this, pin it explicitly on the smallest one
        gw, gh, ch, rgb = J.decode_jpeg(
            (self.FIX / "libjpeg_arith_gray.jpg").read_bytes()
        )
        assert (gw, gh, ch) == (24, 16, 3) and len(rgb) == 24 * 16 * 3

    def test_progressive_arith_byte_flip(self):
        data = (self.FIX / "libjpeg_arith_prog_420.jpg").read_bytes()
        rng = np.random.default_rng(13)
        for pos in rng.choice(len(data), size=60, replace=False):
            mut = bytearray(data)
            mut[pos] ^= 0xA5
            try:
                gw, gh, ch, rgb = J.decode_jpeg(bytes(mut))
                assert len(rgb) == gw * gh * ch
            except J.JpegError:
                pass

    def test_progressive_arith_equals_sequential_arith(self):
        # progressive is a reordering of the same quantized
        # coefficients under the same entropy coder family — libjpeg
        # encodes both from identical pixels, so decodes must agree
        # bit-for-bit
        a = J.decode_jpeg((self.FIX / "libjpeg_arith_rgb444.jpg").read_bytes())
        b = J.decode_jpeg((self.FIX / "libjpeg_arith_prog_444.jpg").read_bytes())
        assert a == b


class TestLossless:
    """SOF3 Annex-H predictive lossless (r10)."""

    def test_roundtrip_all_predictors_exact(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
        for pred in range(1, 8):
            data = J.encode_jpeg_lossless(
                13, 9, img.flatten().tolist(), ncomp=3, predictor=pred
            )
            w, h, c, rgb = J.decode_jpeg(data)
            out = np.frombuffer(rgb, dtype=np.uint8).reshape(9, 13, 3)
            assert (w, h, c) == (13, 9, 3)
            assert (out == img).all(), f"predictor {pred}"

    def test_gray_restart_rows_exact(self):
        rng = np.random.default_rng(11)
        g = rng.integers(0, 256, size=(10, 7), dtype=np.uint8)
        data = J.encode_jpeg_lossless(
            7, 10, g.flatten().tolist(), ncomp=1, predictor=4, restart_rows=3
        )
        assert b"\xff\xd0" in data  # restarts really emitted
        _, _, _, rgb = J.decode_jpeg(data)
        out = np.frombuffer(rgb, dtype=np.uint8).reshape(10, 7, 3)
        assert (out[:, :, 0] == g).all() and (out[:, :, 2] == g).all()

    def test_point_transform_drops_low_bits(self):
        g = np.arange(70, dtype=np.uint8).reshape(10, 7)
        data = J.encode_jpeg_lossless(
            7, 10, g.flatten().tolist(), ncomp=1, predictor=2,
            point_transform=2,
        )
        _, _, _, rgb = J.decode_jpeg(data)
        out = np.frombuffer(rgb, dtype=np.uint8).reshape(10, 7, 3)[:, :, 0]
        assert (out == (g >> 2) << 2).all()

    def test_16bit_reduces_to_8bit_surface(self):
        rng = np.random.default_rng(3)
        g16 = rng.integers(0, 65536, size=(6, 5)).astype(np.int64)
        data = J.encode_jpeg_lossless(
            5, 6, g16.flatten().tolist(), ncomp=1, precision=16, predictor=7
        )
        _, _, _, rgb = J.decode_jpeg(data)
        out = np.frombuffer(rgb, dtype=np.uint8).reshape(6, 5, 3)[:, :, 0]
        assert (out == (g16 >> 8)).all()

    def test_hand_built_bitstream_decodes_per_spec(self):
        """Decode semantics pinned INDEPENDENTLY of the encoder: a 2x2
        grayscale stream hand-assembled bit by bit (H.1: default
        prediction 2^(P-1)=128 for the first sample, Ra along the first
        line, Rb in the first column; SSSS category + EXTEND bits).
        Samples [[100,102],[97,97]], predictor 1:
          (0,0) diff -28  -> cat5 code '110'  + bits '00011'
          (0,1) diff  +2  -> cat2 code '011'  + bits '10'
          (1,0) diff  -3 (vs Rb=100) -> cat2 '011' + bits '00'
          (1,1) diff   0  -> cat0 code '00'
        = 1100 0011 0111 0011 0000 + 1-pad -> C3 73 0F."""
        sof = bytes([8]) + np.uint16(2).newbyteorder(">").tobytes() * 2
        sof += bytes([1, 1, 0x11, 0])
        sos = bytes([1, 1, 0x00, 1, 0, 0])
        data = (
            b"\xff\xd8"
            + J._seg(0xC4, J._dht_body(0x00, J.DCLL_BITS, J.DCLL_VALS))
            + J._seg(0xC3, sof)
            + J._seg(0xDA, sos)
            + bytes([0b11000011, 0b01110011, 0b00001111])
            + b"\xff\xd9"
        )
        w, h, _, rgb = J.decode_jpeg(data)
        out = np.frombuffer(rgb, dtype=np.uint8).reshape(2, 2, 3)[:, :, 0]
        assert (w, h) == (2, 2)
        assert out.tolist() == [[100, 102], [97, 97]]

    def test_predictor_arithmetic_hand_values(self):
        """The seven H.1 predictor formulas on hand-computed neighbor
        values, including the arithmetic-shift (floor) semantics of the
        /2 predictors on negative differences."""
        arr = np.array([[10, 20], [30, 0]], dtype=np.int32)
        got = [
            J._lossless_predict(arr, 1, 1, p, 128, 0) for p in range(1, 8)
        ]
        assert got == [30, 20, 10, 40, 35, 30, 25]
        arr2 = np.array([[9, 3], [5, 0]], dtype=np.int32)
        # pred5: Ra + (Rb-Rc)>>1 = 5 + (3-9)>>1 = 5 + (-3) = 2
        assert J._lossless_predict(arr2, 1, 1, 5, 128, 0) == 2
        # first line -> Ra regardless of selection; first sample -> default
        assert J._lossless_predict(arr, 1, 0, 7, 128, 0) == 10
        assert J._lossless_predict(arr, 0, 0, 7, 128, 0) == 128
        # first column of later lines -> Rb
        assert J._lossless_predict(arr, 0, 1, 7, 128, 0) == 10

    def test_honest_failures(self):
        g = list(range(64))
        data = J.encode_jpeg_lossless(8, 8, g, ncomp=1, predictor=1)
        # truncated entropy / missing EOI
        with pytest.raises(J.JpegError):
            J.decode_jpeg(data[:-4])
        # a DRI that is not a row multiple must be rejected at scan time
        bad = data.replace(b"\xff\xda", J._seg(0xDD, b"\x00\x05") + b"\xff\xda")
        with pytest.raises(J.JpegError, match="row multiple"):
            J.decode_jpeg(bad)
        # encoder-side guards
        with pytest.raises(J.JpegError):
            J.encode_jpeg_lossless(8, 8, g, predictor=0)
        with pytest.raises(J.JpegError):
            J.encode_jpeg_lossless(8, 8, g, point_transform=8)
        with pytest.raises(J.JpegError):
            J.encode_jpeg_lossless(8, 8, [300] * 64)

    def test_metadata_reports_sof3(self):
        data = J.encode_jpeg_lossless(5, 4, list(range(20)), ncomp=1)
        m = J.jpeg_metadata(data)
        assert (m["width"], m["height"], m["ncomp"]) == (5, 4, 1)
        assert m["sof"] == 3 and m["progressive"] is False
        assert m["precision"] == 8


class TestCmyk:
    """4-component CMYK/YCCK (r10) — the print-derived crawl profile."""

    def _img(self, w, h, consts):
        img = np.zeros((h, w, 4), dtype=np.uint8)
        for (bx, by), c in consts.items():
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = c
        return img

    @staticmethod
    def _q(v, qq):
        import math

        def rnd(x):
            return math.floor(x + 0.5 + 1e-9)

        return min(255, max(0, rnd(rnd(8 * (v - 128) / qq) * qq / 8.0 + 128)))

    def test_cmyk_closed_form_and_app14_default(self):
        import math

        def rnd(x):
            return math.floor(x + 0.5 + 1e-9)

        consts = {(0, 0): (40, 200, 90, 250), (1, 0): (53, 193, 121, 235)}
        img = self._img(16, 8, consts)
        data = J.encode_jpeg_cmyk(16, 8, img.tobytes(), transform=0)
        _, _, _, rgb = J.decode_jpeg(data)
        out = np.frombuffer(rgb, dtype=np.uint8).reshape(8, 16, 3)
        for (bx, _), c in consts.items():
            d = [self._q(v, 16) for v in c]
            want = [
                min(255, max(0, rnd(d[i] * d[3] / 255.0))) for i in range(3)
            ]
            assert out[0, bx * 8].tolist() == want
        # a 4-comp stream with NO APP14 defaults to the CMYK reading
        bare = J.encode_jpeg_cmyk(16, 8, img.tobytes(), transform=0,
                                  app14=False)
        assert J.decode_jpeg(bare)[3] == rgb

    def test_ycck_closed_form(self):
        import math

        def rnd(x):
            return math.floor(x + 0.5 + 1e-9)

        consts = {(0, 0): (120, 60, 180, 230)}
        img = self._img(8, 8, consts)
        data = J.encode_jpeg_cmyk(8, 8, img.tobytes(), transform=2)
        _, _, _, rgb = J.decode_jpeg(data)
        out = np.frombuffer(rgb, dtype=np.uint8).reshape(8, 8, 3)
        c = consts[(0, 0)]
        dy, dcb = self._q(c[0], 16), self._q(c[1], 17)
        dcr, dk = self._q(c[2], 17), self._q(c[3], 16)
        base = [
            min(255, max(0, rnd(dy + 1.402 * (dcr - 128)))),
            min(255, max(0, rnd(dy - 0.344136 * (dcb - 128)
                                - 0.714136 * (dcr - 128)))),
            min(255, max(0, rnd(dy + 1.772 * (dcb - 128)))),
        ]
        want = [min(255, max(0, rnd(v * dk / 255.0))) for v in base]
        assert out[0, 0].tolist() == want

    def test_ycck_420_constant_mcu(self):
        img = np.zeros((16, 32, 4), dtype=np.uint8)
        img[:, :16] = (120, 60, 180, 230)
        img[:, 16:] = (90, 140, 70, 200)
        data = J.encode_jpeg_cmyk(
            32, 16, img.tobytes(), transform=2, subsampling="420"
        )
        _, _, _, rgb = J.decode_jpeg(data)
        out = np.frombuffer(rgb, dtype=np.uint8).reshape(16, 32, 3)
        # constants per MCU survive the subsampled roundtrip
        assert (out[:, :16] == out[0, 0]).all()
        assert (out[:, 16:] == out[0, 16]).all()
        assert out[0, 0].tolist() != out[0, 16].tolist()
        m = J.jpeg_metadata(data)
        assert m["ncomp"] == 4 and m["progressive"] is False

    def test_honest_failures(self):
        img = np.zeros((8, 8, 4), dtype=np.uint8)
        with pytest.raises(J.JpegError):
            J.encode_jpeg_cmyk(8, 8, img.tobytes(), transform=1)
        with pytest.raises(J.JpegError):  # 4:2:0 is the YCCK layout
            J.encode_jpeg_cmyk(8, 8, img.tobytes(), transform=0,
                               subsampling="420")
        with pytest.raises(J.JpegError):
            J.encode_jpeg_cmyk(8, 8, img.tobytes()[:-1])

    def test_progressive_4comp_bit_identical_to_baseline(self):
        """Progressive CMYK/YCCK (Adobe saves these) is validated by
        the same discipline as 3-comp: the 6-phase scan script reorders
        the IDENTICAL quantized coefficients, so the progressive decode
        must be bit-for-bit the baseline decode."""
        rng = np.random.default_rng(5)
        for transform, sub, (w, h) in (
            (0, "444", (24, 16)),
            (2, "444", (16, 8)),
            (2, "420", (32, 16)),
        ):
            img = np.zeros((h, w, 4), dtype=np.uint8)
            step = 16 if sub == "420" else 8
            for by in range(h // step):
                for bx in range(w // step):
                    img[by*step:(by+1)*step, bx*step:(bx+1)*step] = (
                        rng.integers(0, 256, size=4)
                    )
            base = J.encode_jpeg_cmyk(
                w, h, img.tobytes(), transform=transform, subsampling=sub
            )
            prog = J.encode_jpeg_cmyk(
                w, h, img.tobytes(), transform=transform, subsampling=sub,
                progressive=True,
            )
            assert J.jpeg_metadata(prog)["progressive"] is True
            assert J.decode_jpeg(prog) == J.decode_jpeg(base), (transform, sub)


def test_lossless_cmyk_roundtrip_all_predictors():
    """r11: 4-component lossless decodes through the documented
    Adobe-inverted channel·K/255 conversion, exactly, for every Annex-H
    predictor; a lossless stream claiming the YCCK transform fails
    honestly (the Adobe transform is defined over the DCT JFIF space —
    there is no lossless YCCK)."""
    import numpy as np
    import pytest

    from bigdata_lab02_spark.operators.jpeg import (
        JpegError,
        _rnd,
        decode_jpeg,
        encode_jpeg_lossless,
    )

    w, h = 9, 7
    quads = [
        ((31 * i) % 256, (17 * i) % 256, (29 * i) % 256, (23 * i) % 256)
        for i in range(w * h)
    ]
    samples = [v for q in quads for v in q]
    s = np.array(quads, dtype=np.float64).reshape(h, w, 4)
    want = np.clip(_rnd(s[..., :3] * s[..., 3:4] / 255.0), 0, 255).astype(
        np.uint8
    )
    for pred in range(1, 8):
        payload = encode_jpeg_lossless(w, h, samples, ncomp=4, predictor=pred)
        dw, dh, ch, px = decode_jpeg(payload)
        assert (dw, dh, ch) == (w, h, 3)
        got = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
        assert np.array_equal(got, want), pred

    payload = encode_jpeg_lossless(w, h, samples, ncomp=4, predictor=1)
    body = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 2])  # transform 2 = YCCK
    app14 = b"\xff\xee" + (len(body) + 2).to_bytes(2, "big") + body
    with pytest.raises(JpegError, match="lossless YCCK"):
        decode_jpeg(payload[:2] + app14 + payload[2:])


def test_hierarchical_upsample_filter_reference():
    """r11: the J.1.1.2 midpoint expansion vs an independent per-pixel
    reference (even samples copy; odd are (a+b+1)>>1, edge replicated;
    horizontal pass first — the codec's documented order)."""
    import numpy as np

    from bigdata_lab02_spark.operators.jpeg import _hier_upsample

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(5, 7)).astype(np.int64)

    def up1d(v):
        out = []
        for i, x in enumerate(v):
            out.append(int(x))
            nxt = v[i + 1] if i + 1 < len(v) else v[-1]
            out.append((int(x) + int(nxt) + 1) >> 1)
        return out

    horiz = np.array([up1d(row) for row in a])
    ref = np.array([up1d(col) for col in horiz.T]).T
    got = _hier_upsample(a, 1, 1, 14, 10)
    assert np.array_equal(got, ref[:10, :14])
    # single-axis expansion
    got_h = _hier_upsample(a, 1, 0, 13, 5)
    assert np.array_equal(got_h, horiz[:, :13])


def test_hierarchical_roundtrip_and_refinement():
    """Constant images decode EXACTLY through 2- and 3-level pyramids
    (the refinement chain converges onto the input); on arbitrary
    images the hierarchical result is strictly better than the
    first-frame-upsampled approximation it refines."""
    import numpy as np

    from bigdata_lab02_spark.operators.jpeg import (
        _downsample2,
        _hier_upsample,
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_hierarchical,
    )

    import math

    def rnd(x):
        return math.floor(x + 0.5 + 1e-9)

    def chain(c, levels):
        # the closed-form refinement the oracle gate restates: baseline
        # quant roundtrip, then per level a no-level-shift differential
        # roundtrip added under the clamp — the decode's exact value
        r = min(255, max(0, rnd(rnd(8 * (c - 128) / 16.0) * 16 / 8.0 + 128)))
        for _ in range(levels - 1):
            r = min(255, max(0, r + rnd(rnd(8 * (c - r) / 16.0) * 16 / 8.0)))
        return r

    for w, h, c, levels in ((15, 11, 200, 2), (16, 12, 77, 3), (9, 9, 0, 2)):
        p = encode_jpeg_hierarchical(w, h, [c] * (w * h), levels=levels)
        dw, dh, ch, px = decode_jpeg(p)
        a = np.frombuffer(px, dtype=np.uint8).reshape(dh, dw, 3)
        assert (dw, dh, ch) == (w, h, 3)
        assert len(np.unique(a)) == 1, (c, levels)
        got = int(a[0, 0, 0])
        assert got == chain(c, levels), (c, levels, got)
        assert abs(got - c) <= 2  # the chain's fixed point is c ± quant

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 32), dtype=np.int64)
    p = encode_jpeg_hierarchical(32, 24, img.flatten().tolist(), levels=2)
    got = (
        np.frombuffer(decode_jpeg(p)[3], dtype=np.uint8)
        .reshape(24, 32, 3)[:, :, 0]
        .astype(np.int64)
    )
    # the frame-1-only approximation the differential frame refines
    small = _downsample2(np.pad(img, ((0, 0), (0, 0)), mode="edge"))
    rgb = np.repeat(small.astype(np.uint8)[..., None], 3, -1).tobytes()
    f1 = encode_jpeg(16, 12, rgb, subsampling="gray")
    ref = (
        np.frombuffer(decode_jpeg(f1)[3], dtype=np.uint8)
        .reshape(12, 16, 3)[:, :, 0]
        .astype(np.int64)
    )
    base = _hier_upsample(ref, 1, 1, 32, 24)
    assert np.abs(got - img).mean() < np.abs(base - img).mean()


def test_hierarchical_profile_honest_failures():
    """Everything outside the documented Annex-J profile raises: a
    differential frame outside a hierarchical stream, EXP before any
    frame, a second non-differential frame, restart intervals, and a
    stream whose last frame never reaches the DHP dims."""
    import pytest

    from bigdata_lab02_spark.operators.jpeg import (
        JpegError,
        decode_jpeg,
        encode_jpeg_hierarchical,
    )

    p = encode_jpeg_hierarchical(15, 11, [9] * 165, levels=2)

    def seg_at(data, marker):
        i = data.index(bytes([0xFF, marker]))
        ln = int.from_bytes(data[i + 2 : i + 4], "big")
        return i, i + 2 + ln

    # SOF5 outside a hierarchical stream (strip the DHP)
    i, j = seg_at(p, 0xDE)
    with pytest.raises(JpegError, match="hierarchical"):
        decode_jpeg(p[:i] + p[j:])
    # EXP before the first frame
    i, _ = seg_at(p, 0xC0)
    with pytest.raises(JpegError, match="EXP before"):
        decode_jpeg(p[:i] + b"\xff\xdf\x00\x03\x11" + p[i:])
    # a second non-differential frame: flip SOF5 -> SOF0
    i, _ = seg_at(p, 0xC5)
    with pytest.raises(JpegError, match="second non-differential"):
        decode_jpeg(p[:i] + b"\xff\xc0" + p[i + 2:])
    # restart interval inside the profile
    i, _ = seg_at(p, 0xC5)
    with pytest.raises(JpegError, match="restart"):
        decode_jpeg(p[:i] + b"\xff\xdd\x00\x04\x00\x02" + p[i:])
    # final dims never reach the DHP dims (drop the differential frame)
    i, _ = seg_at(p, 0xDF)
    with pytest.raises(JpegError, match="DHP dims|missing EOI"):
        decode_jpeg(p[:i] + b"\xff\xd9")


def test_metadata_reports_dhp_dims_for_hierarchical():
    """r11: the header routing pass reports a hierarchical stream's
    DHP (true) dims, not the smallest pyramid frame's — a size filter
    routing on frame-1 dims would drop full-size images."""
    from bigdata_lab02_spark.operators.jpeg import (
        encode_jpeg_hierarchical,
        jpeg_metadata,
    )

    p = encode_jpeg_hierarchical(33, 24, [7] * (33 * 24), levels=3)
    m = jpeg_metadata(p)
    assert (m["width"], m["height"]) == (33, 24)   # not ceil-halved
    assert m["hierarchical"] and m["ncomp"] == 1
    assert m["sof"] == 0 and m["progressive"] is False
