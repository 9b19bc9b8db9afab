"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The IMAGE, AUDIO and VIDEO paths are all real end-to-end:
``synthetic_media`` / ``synthetic_audio`` / ``synthetic_video`` emit
genuine PNG / WAV / Y4M payloads (encoded distributed, on the executors)
and the kernels byte-level-parse them with the vendored pure-stdlib
codecs in ``png.py`` (RFC 2083 baseline — zlib scanlines, all five row
filters), ``wav.py`` (RIFF 16-bit PCM) and ``y4m.py`` (YUV4MPEG2 planar
frames). Payloads a codec can't parse (wrong magic, truncated,
unsupported profile) take the honest-failure path: ``decode_ok=False``.

Worker-side imports: the repo package is NOT on executor ``sys.path``, so
the ``png`` module is registered with cloudpickle for by-value pickling —
closures referencing it ship the module source inside the serialized task
instead of emitting an ``import`` the worker can't satisfy.

Design rules for 100 TB of media:
- binary payloads travel in their own column; metadata columns are small
  and filterable so Catalyst prunes/pushes down without touching bytes;
- per-batch processing via ``mapInPandas`` (Arrow), never per-row UDFs;
- byte-size-aware repartitioning (``target_partition_mb``) because row
  counts are meaningless when one row is a 4 MB image.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_lab02_spark.operators import jpeg as _jpeg
from bigdata_lab02_spark.operators import png as _png
from bigdata_lab02_spark.operators import wav as _wav
from bigdata_lab02_spark.operators import y4m as _y4m

# Ship png.py/wav.py/y4m.py/jpeg.py — and this module's own kernels — by
# value inside task closures (see module docstring): functions from
# registered modules are serialized with their code + needed globals
# instead of as imports.
cloudpickle.register_pickle_by_value(_png)
cloudpickle.register_pickle_by_value(_wav)
cloudpickle.register_pickle_by_value(_y4m)
cloudpickle.register_pickle_by_value(_jpeg)
cloudpickle.register_pickle_by_value(sys.modules[__name__])

_ARROW_BATCH_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


@contextmanager
def arrow_batch_size(spark, rows: int):
    """Scope ``spark.sql.execution.arrow.maxRecordsPerBatch`` to a block,
    restoring the prior value (or unsetting) on exit. The conf is read at
    ACTION time, so wrap the action, not the plan construction::

        feats = extract_features(media, set_arrow_batch=False)
        with arrow_batch_size(spark, 512):
            feats.write.parquet(out)
    """
    try:
        prior = spark.conf.get(_ARROW_BATCH_KEY)
    except Exception:
        prior = None
    spark.conf.set(_ARROW_BATCH_KEY, str(rows))
    try:
        yield
    finally:
        if prior is None:
            spark.conf.unset(_ARROW_BATCH_KEY)
        else:
            spark.conf.set(_ARROW_BATCH_KEY, prior)

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, feature array<float>, feat_dim int, decode_ok boolean"

# png_features layout: [width, height, channels, mean/255, 8 histogram bins]
FEAT_DIM = 12


def _media_dims(media_id: int, payload_bytes: int) -> tuple[int, int]:
    """Deterministic per-id image dimensions sized so an RGB payload lands
    near ``payload_bytes`` (row counts are meaningless for media — dims are
    the knob that makes byte-aware batching testable)."""
    side = max(4, int((payload_bytes / 3) ** 0.5))
    return side + media_id % 5, side + media_id % 3


def synthetic_media(spark, n: int = 64, payload_bytes: int = 1024) -> DataFrame:
    """Deterministic media table with REAL PNG payloads: each row is a
    seeded RGB gradient image encoded on the executors with the vendored
    codec. width/height metadata reflect the true decoded dimensions."""
    enc = _png.encode_png
    dims = _media_dims
    pb = payload_bytes

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": [], "width": [], "height": []}
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = dims(mid, pb)
                px = bytes(
                    (mid * 37 + x * 3 + y * 11 + c * 53) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                rows["media_id"].append(mid)
                rows["payload"].append(enc(w, h, px, color_type=2))
                rows["mime"].append("image/png")
                rows["width"].append(w)
                rows["height"].append(h)
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen,
        "media_id long, payload binary, mime string, width int, height int",
    )


def corrupt_png_payload() -> bytes:
    """A deliberately malformed PNG — valid signature, IHDR chunk declaring
    a 5-byte body (13 required). This is the adversarial shape that once
    escaped ``decode_png`` as ``struct.error`` instead of ``PngError``;
    the mixed-profile gate keeps it in the corpus permanently so the
    honest-failure path (``decode_ok=False``) stays exercised end-to-end."""
    import zlib

    return (
        _png._SIGNATURE
        + _png._chunk(b"IHDR", b"\x00" * 5)
        + _png._chunk(b"IDAT", zlib.compress(b"\x00" * 8))
        + _png._chunk(b"IEND", b"")
    )


# The r7 palette stripes' lookup formulas (shared with both gate oracles):
# entry i -> RGB (7i, 13i, 29i) % 256, tRNS alpha (11i + 40) % 256; pixel
# index = (mid*37 + x*3 + y*11) % 16.
_PAL16 = [(7 * i % 256, 13 * i % 256, 29 * i % 256) for i in range(16)]
_TRNS16 = [(11 * i + 40) % 256 for i in range(16)]


def synthetic_media_mixed(
    spark, n: int = 64, payload_bytes: int = 1024
) -> DataFrame:
    """Deterministic media table spanning the codec's WHOLE profile, plus
    failures, on ``media_id % 8`` (widened from %4 in r7):

    - 0/1/2: grayscale (PNG color type 0) / RGB (2) / RGBA (6), pixel
      formula ``(mid*37 + x*3 + y*11 + c*53) % 256``;
    - 4: PALETTE (color type 3, bit depth 4, 16 entries) — decodes to
      RGB via the ``_PAL16`` lookup of index
      ``(mid*37 + x*3 + y*11) % 16``;
    - 5: palette + tRNS — decodes to RGBA with ``_TRNS16`` alphas;
    - 6: RGB ADAM7-INTERLACED — same pixels as stripe 1 (interlacing is
      a lossless reordering, so the closed form is unchanged);
    - 3: corrupt (malformed IHDR); 7: corrupt (interlaced stream
      truncated mid-IDAT).

    An engine-independent oracle recomputes exact statistics for every
    decodable stripe from these formulas."""
    enc = _png.encode_png
    dims = _media_dims
    pb = payload_bytes
    bad = corrupt_png_payload()
    pal, trns = _PAL16, _TRNS16

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": [], "width": [], "height": []}
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = dims(mid, pb)
                s = mid % 8
                if s == 3:
                    payload = bad
                elif s in (4, 5):
                    idx = bytes(
                        (mid * 37 + x * 3 + y * 11) % 16
                        for y in range(h)
                        for x in range(w)
                    )
                    payload = enc(w, h, idx, 3, palette=pal, bit_depth=4,
                                  trns=trns if s == 5 else None)
                else:  # 0/1/2/6 formula stripes (+ 7's base encoding)
                    ct = {0: 0, 1: 2, 2: 6, 6: 2, 7: 2}[s]
                    ch = {0: 1, 2: 3, 6: 4}[ct]
                    px = bytes(
                        (mid * 37 + x * 3 + y * 11 + c * 53) % 256
                        for y in range(h)
                        for x in range(w)
                        for c in range(ch)
                    )
                    payload = enc(w, h, px, color_type=ct,
                                  interlace=s in (6, 7))
                    if s == 7:  # corrupt: truncate the interlaced stream
                        payload = payload[: int(len(payload) * 0.6)]
                rows["media_id"].append(mid)
                rows["payload"].append(payload)
                rows["mime"].append("image/png")
                rows["width"].append(w)
                rows["height"].append(h)
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen,
        "media_id long, payload binary, mime string, width int, height int",
    )


def synthetic_png_edges(spark, n: int = 48) -> DataFrame:
    """Deterministic PNG corpus for the r8 profile EDGES (VERDICT r7
    item 7 — the two raise-paths a real crawl hits most, now decoding):
    16-bit samples, non-palette tRNS color keys, and gray+alpha (color
    type 4 — with it every spec color type decodes), on ``media_id % 8``:

    - 0: 16-bit GRAYSCALE — sample ``(mid*1031 + x*17 + y*29) % 65536``,
      decoded output = the HIGH byte (sample // 256);
    - 1: 16-bit RGB — sample ``(mid*1031 + x*17 + y*29 + c*7919) %
      65536``;
    - 2: 16-bit RGB ADAM7-interlaced (lossless reordering — same
      closed form as stripe 1);
    - 3: 8-bit gray + tRNS COLOR KEY ``(mid*37) % 256`` — decodes to
      (gray, alpha) where alpha = 0 iff ``(x*3 + y*11) % 256 == 0``;
    - 4: 16-bit RGB + FULL-PRECISION color key = the (0,0) pixel —
      alpha = 0 iff ``x*17 + y*29 == 0`` (i.e. exactly that pixel; a
      high-byte-only comparison would also blank every pixel whose
      sample merely REDUCES to the same 8 bits);
    - 5: corrupt — 16-bit stream truncated mid-IDAT (decode_ok=false);
    - 6: 8-bit GRAY+ALPHA — sample ``(mid*37 + x*3 + y*11 + c*53) %
      256`` with c < 2;
    - 7: 16-bit GRAY+ALPHA — the stripe-1 16-bit formula with c < 2.

    Dims follow ``_media_dims(mid, 1024)``; every decodable stripe has
    an engine-independent closed form the gate oracle restates."""
    import struct as _struct

    enc = _png.encode_png
    dims = _media_dims

    def pack16(vals):
        return b"".join(_struct.pack(">H", v) for v in vals)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": [], "width": [], "height": []}
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = dims(mid, 1024)
                s = mid % 8
                if s in (0, 7):  # 16-bit gray / gray+alpha
                    nch = 1 if s == 0 else 2
                    vals = [
                        (mid * 1031 + x * 17 + y * 29 + c * 7919) % 65536
                        for y in range(h)
                        for x in range(w)
                        for c in range(nch)
                    ]
                    payload = enc(
                        w, h, pack16(vals), 0 if s == 0 else 4, bit_depth=16
                    )
                elif s == 3:
                    px = bytes(
                        (mid * 37 + x * 3 + y * 11) % 256
                        for y in range(h)
                        for x in range(w)
                    )
                    payload = enc(w, h, px, 0, trns=[(mid * 37) % 256])
                elif s == 6:  # 8-bit gray+alpha
                    px = bytes(
                        (mid * 37 + x * 3 + y * 11 + c * 53) % 256
                        for y in range(h)
                        for x in range(w)
                        for c in range(2)
                    )
                    payload = enc(w, h, px, 4)
                else:  # 1/2/4/5: 16-bit RGB variants
                    vals = [
                        (mid * 1031 + x * 17 + y * 29 + c * 7919) % 65536
                        for y in range(h)
                        for x in range(w)
                        for c in range(3)
                    ]
                    trns = (
                        [(mid * 1031 + c * 7919) % 65536 for c in range(3)]
                        if s == 4
                        else None
                    )
                    payload = enc(
                        w, h, pack16(vals), 2, bit_depth=16,
                        trns=trns, interlace=s == 2,
                    )
                    if s == 5:
                        payload = payload[: int(len(payload) * 0.6)]
                rows["media_id"].append(mid)
                rows["payload"].append(payload)
                rows["mime"].append("image/png")
                rows["width"].append(w)
                rows["height"].append(h)
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen,
        "media_id long, payload binary, mime string, width int, height int",
    )


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8\xff"


def sniff_image_format(b: bytes) -> str | None:
    """Magic-byte format sniff: 'png' / 'jpeg' / None. The dispatch key
    for every image kernel — media columns in a real crawl are
    format-mixed, so kernels route per PAYLOAD, not per table."""
    if b[:8] == _PNG_MAGIC:
        return "png"
    if b[:3] == _JPEG_MAGIC:
        return "jpeg"
    return None


def _decode_any_image(b: bytes) -> tuple[int, int, int, bytes, str]:
    """(width, height, channels, pixel_bytes, format) via the codec the
    magic bytes name. Unknown magic raises PngError (any codec-family
    error maps to the honest-failure path upstream)."""
    fmt = sniff_image_format(b)
    if fmt == "png":
        w, h, ch, px = _png.decode_png(b)
    elif fmt == "jpeg":
        w, h, ch, px = _jpeg.decode_jpeg(b)
    else:
        raise _png.PngError("unknown image magic")
    return w, h, ch, px, fmt


def _features_np(width: int, height: int, channels: int, pixels: bytes) -> list[float]:
    """Vectorized twin of ``png.features_from_pixels`` (the reference
    implementation): same integer bin counts (b*8//256 == b >> 5) and
    the same float divisions, so outputs are bit-identical (asserted in
    tests) — but a numpy bincount instead of a 10⁷-iteration Python
    loop on a real-size image."""
    import numpy as np

    a = np.frombuffer(pixels, dtype=np.uint8)
    n = int(a.size)
    bins = np.bincount(a >> 5, minlength=8)
    total = int(a.sum(dtype=np.int64))
    return [
        float(width),
        float(height),
        float(channels),
        total / (255.0 * n) if n else 0.0,
    ] + [int(c) / n if n else 0.0 for c in bins]


def _decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """Real decode kernel: byte-level image decode + feature extraction
    via the vendored codecs — format-dispatched on magic bytes (PNG and
    baseline JPEG). Null or undecodable payloads (unknown magic,
    truncated, unsupported profile) yield ``decode_ok=False`` with a
    null feature — the honest-failure path."""
    feats = []
    ok = []
    for b in payloads:
        try:
            w, h, ch, px, _ = _decode_any_image(bytes(b))
            feats.append(_features_np(w, h, ch, px))
            ok.append(True)
        except (_png.PngError, _jpeg.JpegError, TypeError):
            # TypeError: payload is None
            feats.append(None)
            ok.append(False)
    return pd.DataFrame({"feature": feats, "decode_ok": ok})


def extract_features(
    media: DataFrame,
    target_partition_mb: int = 128,
    avg_payload_kb: int = 256,
    n_rows: int | None = None,
    set_arrow_batch: bool = False,
) -> DataFrame:
    """Decode + featurize via Arrow-batched mapInPandas.

    Byte-aware sizing happens at two levels:
    - Arrow batch size: rows_per_batch ≈ target_partition_mb·1024 /
      avg_payload_kb, so a 4 MB-per-image corpus gets small Arrow batches
      and a thumbnail corpus gets big ones. Spark has no per-plan knob —
      only the session conf, read at action time. The default leaves the
      session UNTOUCHED; wrap the consuming action in
      ``arrow_batch_size(spark, rows)`` to apply a scoped batch size.
      ``set_arrow_batch=True`` sets the session conf here and leaves it
      set — explicit opt-in only, a conf mutation as a side effect.
    - Partition count: when the caller supplies ``n_rows`` (a count is an
      action, so we don't trigger one implicitly), partitions are sized to
      hold ≈ rows_per_batch rows each; otherwise default parallelism.
    """
    rows_per_part = max(64, (target_partition_mb * 1024) // max(1, avg_payload_kb))

    # The kernel closure references only names pickled by value: the png
    # module is registered with cloudpickle (module top), and the decode
    # wrapper below is function-local — executors never need this package
    # on their PYTHONPATH.
    decode = _decode_image_batch

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = decode(pdf["payload"])
            out.insert(0, "media_id", pdf["media_id"].values)
            out["feat_dim"] = out["feature"].map(lambda f: len(f) if f is not None else 0)
            yield out[["media_id", "feature", "feat_dim", "decode_ok"]]

    spark = media.sparkSession
    parallelism = max(spark.sparkContext.defaultParallelism, 1)
    n_parts = parallelism
    if n_rows is not None:
        n_parts = max(parallelism, -(-n_rows // rows_per_part))  # ceil div
    sized = media.repartition(n_parts)
    if set_arrow_batch:
        spark.conf.set(_ARROW_BATCH_KEY, str(rows_per_part))
    return sized.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, factor: int = 2) -> DataFrame:
    """Image RESIZE as a distributed kernel — the remaining member of the
    multimodal op family (decode / feature-extract / RESIZE /
    frame-sample): integer-``factor`` box-filter downsample, FORMAT-
    DISPATCHED on magic bytes (PNG and baseline JPEG — r6 item 7; a real
    crawl's image column is format-mixed). Each output pixel is the mean
    of a factor×factor input block, rounded with the codec family's
    shared ``floor(x+0.5+1e-9)`` rule (exact integer math — tests
    recompute it from the generator formula); the edge remainder (inputs
    not a multiple of ``factor``) is cropped, matching the box-filter
    contract. The result ALWAYS re-encodes as PNG regardless of source
    format — LOSSLESS, so the resized pixels (and the exact-integer
    stats the gate checks) survive the payload round trip; a JPEG
    re-encode would re-quantize them. ``src_format`` records what the
    payload arrived as.

    Returns (media_id, payload, src_format, width, height, channels,
    total_intensity, decode_ok). ``decode_ok`` means exactly "the
    payload DECODED" (ADVICE r6): undecodable inputs are
    decode_ok=false with everything null; a payload that decodes fine
    but is SMALLER than ``factor`` keeps decode_ok=true with its
    ORIGINAL width/height/channels and src_format populated and a null
    payload/total_intensity — downstream honest-failure accounting can
    tell corrupt bytes from profile-small images.

    Scale shape: one Arrow-batched mapInPandas over the payload column —
    bytes never cross a shuffle; pair with ``extract_features``'s
    byte-aware partition sizing for real corpora.
    """
    if factor < 1:
        raise ValueError("factor must be >= 1")
    dec = _decode_any_image
    enc = _png.encode_png
    rnd = _jpeg._rnd  # the codec family's single rounding rule
    f = factor

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ct_by_ch = {1: 0, 3: 2, 4: 6}
        for pdf in batches:
            out = {"media_id": [], "payload": [], "src_format": [],
                   "width": [], "height": [], "channels": [],
                   "total_intensity": [], "decode_ok": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(int(mid))
                try:
                    w, h, ch, px, fmt = dec(bytes(b))
                except (_png.PngError, _jpeg.JpegError, TypeError):
                    for k in ("payload", "src_format", "width", "height",
                              "channels", "total_intensity"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
                    continue
                out["src_format"].append(fmt)
                out["channels"].append(ch)
                out["decode_ok"].append(True)  # it DID decode
                ow, oh = w // f, h // f
                if ow < 1 or oh < 1:
                    # decoded fine but too small to resize: original dims,
                    # null payload/stats (op-skipped, not payload-corrupt)
                    out["payload"].append(None)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["total_intensity"].append(None)
                    continue
                a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
                a = a[: oh * f, : ow * f].astype(np.float64)
                m = a.reshape(oh, f, ow, f, ch).mean(axis=(1, 3))
                small = np.clip(rnd(m), 0, 255).astype(np.uint8)
                out["payload"].append(
                    enc(ow, oh, small.tobytes(), color_type=ct_by_ch[ch])
                )
                out["width"].append(ow)
                out["height"].append(oh)
                out["total_intensity"].append(int(small.sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        op,
        "media_id long, payload binary, src_format string, width int, "
        "height int, channels int, total_intensity long, decode_ok boolean",
    )


def _orient_np(a, o: int):
    """EXIF orientation tag 274 → the numpy view that displays upright
    (TIFF 6.0 / EXIF 2.3 §4.6.4): 1 identity, 2 mirror-horizontal,
    3 rotate-180, 4 mirror-vertical, 5 transpose, 6 rotate-90-CW,
    7 transverse, 8 rotate-90-CCW. 5-8 swap width/height."""
    if o == 2:
        return a[:, ::-1]
    if o == 3:
        return a[::-1, ::-1]
    if o == 4:
        return a[::-1]
    if o == 5:
        return a.transpose(1, 0, 2)
    if o == 6:
        return a.transpose(1, 0, 2)[:, ::-1]
    if o == 7:
        return a.transpose(1, 0, 2)[::-1, ::-1]
    if o == 8:
        return a.transpose(1, 0, 2)[::-1]
    return a


def apply_orientation(media: DataFrame) -> DataFrame:
    """Apply the EXIF orientation in the PIXEL tier (r11, VERDICT r10
    item 4): a real image pipeline normalizes orientation BEFORE
    resize/embedding — a quarter of phone-camera crawl images carry
    tag ≠ 1, and embedding a sideways image is embedding a different
    image. Per payload: header-scan the orientation (JPEG APP1;
    defaults to 1 when absent/invalid — the EXIF default; PNG carries
    none), full decode (format-dispatched), transpose/flip per
    ``_orient_np``, re-encode PNG (LOSSLESS — same contract as
    ``resize_images``; a JPEG re-encode would re-quantize).

    Returns (media_id, payload, orientation, width, height, channels,
    sum_r/g/b, row0_sum_r/g/b, col0_sum_r/g/b, decode_ok). The
    first-row/first-column per-channel sums are the orientation
    VERIFICATION stats: total intensity is orientation-INVARIANT, so a
    pipeline asserting only totals cannot see a wrong transform — the
    (row0, col0) pair maps to a distinct input edge for each of the 8
    tags, which is what the oracle gate pins. ``orientation`` is always
    the tag the stage applied (or would apply — it is still reported
    when the decode honestly fails, since the header parse is
    independent of entropy corruption). Channels beyond the third are
    ignored by the stats; single-channel images replicate into r/g/b.

    Scale shape: one Arrow-batched mapInPandas over the payload column
    — bytes never cross a shuffle; the header scan costs nothing extra
    since the decode reads the same segments."""
    from bigdata_lab02_spark.operators.jpeg import JpegError, jpeg_metadata

    dec = _decode_any_image
    enc = _png.encode_png

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ct_by_ch = {1: 0, 2: 4, 3: 2, 4: 6}
        for pdf in batches:
            out = {
                "media_id": [], "payload": [], "orientation": [],
                "width": [], "height": [], "channels": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
                "row0_sum_r": [], "row0_sum_g": [], "row0_sum_b": [],
                "col0_sum_r": [], "col0_sum_g": [], "col0_sum_b": [],
                "decode_ok": [],
            }
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(b) if b is not None else b""
                o = 1
                if sniff_image_format(data) == "jpeg":
                    try:
                        m = jpeg_metadata(data)
                        tag = m["exif_orientation"]
                        if tag is not None and 1 <= tag <= 8:
                            o = int(tag)
                    except JpegError:
                        pass
                out["media_id"].append(int(mid))
                out["orientation"].append(o)
                try:
                    w, h, ch, px, _ = dec(data)
                except (_png.PngError, _jpeg.JpegError, TypeError):
                    for k in ("payload", "width", "height", "channels",
                              "sum_r", "sum_g", "sum_b",
                              "row0_sum_r", "row0_sum_g", "row0_sum_b",
                              "col0_sum_r", "col0_sum_g", "col0_sum_b"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
                    continue
                a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
                t = np.ascontiguousarray(_orient_np(a, o))
                oh, ow = t.shape[0], t.shape[1]
                out["payload"].append(
                    enc(ow, oh, t.tobytes(), color_type=ct_by_ch[ch])
                )
                out["width"].append(ow)
                out["height"].append(oh)
                out["channels"].append(ch)
                t64 = t.astype(np.int64)
                for tag, c in (("r", 0), ("g", 1), ("b", 2)):
                    cc = min(c, ch - 1)
                    out[f"sum_{tag}"].append(int(t64[:, :, cc].sum()))
                    out[f"row0_sum_{tag}"].append(int(t64[0, :, cc].sum()))
                    out[f"col0_sum_{tag}"].append(int(t64[:, 0, cc].sum()))
                out["decode_ok"].append(True)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        op,
        "media_id long, payload binary, orientation int, width int, "
        "height int, channels int, sum_r bigint, sum_g bigint, "
        "sum_b bigint, row0_sum_r bigint, row0_sum_g bigint, "
        "row0_sum_b bigint, col0_sum_r bigint, col0_sum_g bigint, "
        "col0_sum_b bigint, decode_ok boolean",
    )


def _dhash_np(a, grid: int = 8) -> int | None:
    """64-bit difference hash (dHash) over BLOCK SUMS — the LAION-style
    perceptual image fingerprint: reduce the (already orientation-
    normalized) image to a (grid)×(grid+1) grid of integer block sums,
    then bit (r, c) = sum[r][c] > sum[r][c+1] for c in 0..grid-1 (the
    horizontal gradient sign). Comparing SUMS of equal-size blocks is
    comparing box-filter means without ever dividing — the whole hash
    is exact integer math, which is what lets an oracle restate it in
    closed form from a generator formula. Channel reduction is the
    per-pixel channel SUM (again exact; a weighted luma would add a
    rounding contract without changing what near-dup detection needs).
    Images smaller than the grid (no full block) hash to None."""
    import numpy as np

    h, w = a.shape[0], a.shape[1]
    bw, bh = w // (grid + 1), h // grid
    if bw < 1 or bh < 1:
        return None
    g = a[: bh * grid, : bw * (grid + 1)].astype(np.int64)
    if g.ndim == 3:
        g = g.sum(axis=2)
    s = g.reshape(grid, bh, grid + 1, bw).sum(axis=(1, 3))
    bits = s[:, :-1] > s[:, 1:]
    v = 0
    for r in range(grid):
        for c in range(grid):
            if bits[r, c]:
                v |= 1 << (r * grid + c)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def image_dhash(
    media: DataFrame,
    orient: bool = True,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual image fingerprints (r12, VERDICT r11 item 4): decode
    (format-dispatched on magic bytes), normalize EXIF orientation
    (``orient=True`` — the ``apply_orientation`` kernel inline: a
    camera image stored sideways-with-tag and the same image stored
    upright MUST collide, or image dedup misses exactly the rotated
    re-posts it exists for), then the 64-bit block-sum dHash. Returns
    ``(id, dhash, width, height, orientation, decode_ok)`` — width/
    height are post-orientation; undecodable payloads are
    ``decode_ok=false`` with NULL hash (the honest-failure taxonomy);
    too-small-to-hash images decode fine but carry a NULL hash.

    Feed the result to ``dedup.simhash_dup_pairs(hash_col="dhash",
    id_col=...)`` — the 16-bit pigeonhole Hamming join (distance ≤ 3 ⇒
    some chunk equal) gives subquadratic near-dup pairs, and
    ``dedup.connected_components`` turns pairs into dedup groups.

    Scale shape: one zero-shuffle Arrow-batched ``mapInPandas`` —
    payload bytes never cross an exchange; only 8-byte hashes reach
    the dedup join. The decode is the expensive stage: callers that
    fan the result out to MULTIPLE consumers (a pair self-join + a
    degree/CC stage + a recombine — the dedup-gate shape) MUST pin it
    first (``.localCheckpoint()``; production: write to parquet
    between phases), or the compiled plan inlines the decode subtree
    once per consumer (r12 receipt: 5× re-decode)."""
    from bigdata_lab02_spark.operators.jpeg import JpegError, jpeg_metadata

    dec = _decode_any_image
    id_type = media.schema[id_col].dataType.simpleString()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                id_col: [], "dhash": [], "width": [], "height": [],
                "orientation": [], "decode_ok": [],
            }
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(b) if b is not None else b""
                o = 1
                if orient and sniff_image_format(data) == "jpeg":
                    try:
                        tag = jpeg_metadata(data)["exif_orientation"]
                        if tag is not None and 1 <= tag <= 8:
                            o = int(tag)
                    except JpegError:
                        pass
                out[id_col].append(mid)
                out["orientation"].append(o)
                try:
                    w, h, ch, px, _ = dec(data)
                except (_png.PngError, _jpeg.JpegError, TypeError):
                    out["dhash"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["decode_ok"].append(False)
                    continue
                a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
                if orient:
                    a = _orient_np(a, o)
                out["dhash"].append(_dhash_np(a))
                out["width"].append(a.shape[1])
                out["height"].append(a.shape[0])
                out["decode_ok"].append(True)
            pdf_out = pd.DataFrame(out)
            # NULLs from corrupt rows would otherwise coerce the column
            # to float64, whose 53-bit mantissa silently rounds 64-bit
            # hashes — nullable Int64 keeps them exact through Arrow
            pdf_out["dhash"] = pd.array(out["dhash"], dtype="Int64")
            yield pdf_out

    return media.select(id_col, payload_col).mapInPandas(
        op,
        f"{id_col} {id_type}, dhash long, width int, height int, "
        "orientation int, decode_ok boolean",
    )


def _dhash_fixture_bit(seed: int, variant: int, r: int, c: int) -> int:
    """The generator's comparison-outcome pattern, bit (r, c) of the
    dHash — shared by the fixture builder, the unit tests, and
    (restated in SQL) the oracle gate. Variants within a seed group:
    0/3 identical (exact hash dup), 1 flips 2 bits (near dup, Hamming
    2), 2 flips 5 (past the ≤3 threshold). Bit 63 (r=c=7) is pinned 0
    so fixture hashes stay non-negative — the SQL restatement then
    never touches BIGINT sign arithmetic."""
    if r == 7 and c == 7:
        return 0
    base = ((seed * 37 + r * 11 + c * 7) % 3) % 2
    flip = 0
    if variant == 1 and (r, c) in ((0, 0), (3, 4)):
        flip = 1
    if variant == 2 and c == 2 and 1 <= r <= 5:
        flip = 1
    return base ^ flip


def synthetic_dhash_images(spark, n: int = 32) -> DataFrame:
    """Deterministic perceptual-dedup corpus: 36×32 grayscale PNGs in
    groups of four (seed = id//4, variant = id%4) whose 4×4-block
    values WALK ±10 from 128 along each block row so every dHash
    comparison outcome is exactly ``_dhash_fixture_bit`` — the hash is
    closed-form without decoding anything. Variants 0 and 3 are exact
    hash dups, variant 1 is Hamming-2 from them, variant 2 is
    Hamming-5 (excluded at threshold 3). ids n and n+1 append a
    truncated-PNG stripe (decode_ok=false, NULL hash)."""
    enc = _png.encode_png
    bit = _dhash_fixture_bit

    def mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": []}
            for i in pdf["id"]:
                mid = int(i)
                if mid >= n:  # corrupt stripe
                    rows["media_id"].append(mid)
                    rows["payload"].append(b"\x89PNG\r\n\x1a\n\x00\x00")
                    continue
                seed, variant = mid // 4, mid % 4
                v = [[128] * 9 for _ in range(8)]
                for r in range(8):
                    for c in range(8):
                        step = -10 if bit(seed, variant, r, c) else 10
                        v[r][c + 1] = v[r][c] + step
                px = bytes(
                    v[y // 4][x // 4] for y in range(32) for x in range(36)
                )
                rows["media_id"].append(mid)
                rows["payload"].append(enc(36, 32, px, color_type=0))
            yield pd.DataFrame(rows)

    return spark.range(n + 2, numPartitions=1).mapInPandas(
        mk, "media_id long, payload binary"
    )


def synthetic_tiny_png(
    spark, n: int = 4, start_id: int = 900, width: int = 1, height: int = 1
) -> DataFrame:
    """n tiny grayscale PNGs (default 1×1, pixel = media_id % 256) — the
    decodes-fine-but-too-small-to-resize stripe for the resize gate
    (ADVICE r6: decode_ok must mean DECODED, with the op-skip case
    distinguishable from corrupt bytes)."""
    enc = _png.encode_png

    def mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": []}
            for i in pdf["id"]:
                mid = start_id + int(i)
                px = bytes([mid % 256]) * (width * height)
                rows["media_id"].append(mid)
                rows["payload"].append(enc(width, height, px, color_type=0))
            yield pd.DataFrame(rows)

    return spark.range(n, numPartitions=1).mapInPandas(
        mk, "media_id long, payload binary"
    )


def _jpeg_block_consts(media_id: int, bx: int, by: int) -> tuple[int, int, int]:
    """Per-8×8-block constant RGB — constant blocks make the LOSSY decode
    closed-form (DC-only spectrum), so an engine-independent oracle can
    restate the exact decoded statistics; DC values still differ per block,
    so DC prediction and the Huffman bit paths are genuinely exercised."""
    return (
        (media_id * 31 + bx * 7 + by * 13) % 256,
        (media_id * 17 + bx * 11 + by * 3) % 256,
        (media_id * 29 + bx * 5 + by * 19) % 256,
    )


def synthetic_jpeg(spark, n: int = 64) -> DataFrame:
    """Deterministic media table with REAL JPEG payloads encoded on the
    executors (vendored codec, jpeg.py), cycling the codec's WHOLE
    profile on ``media_id % 16``:

    4:4:4 family — dims 8·(2+id%3) × 8·(2+id%2), per-8×8-block constants:
    - 0: plain baseline;
    - 2: NON-MCU-MULTIPLE dims — 8·(2+id%3)+6 × 8·(2+id%2)+4 (even, so
      the resize gate's /4 identity still holds): edge blocks are
      padded on encode and cropped on decode; constants assigned by
      (x//8, y//8) so padding replicates each edge block's constant and
      the per-block closed form survives with per-block VISIBLE npix;
    - 4: restart interval 1 MCU (DRI + RSTn chain — the stream layout
      nearly all camera/web baseline JPEGs carry; restarts only reset DC
      predictors, so the decoded pixels keep the SAME closed form);
    - 8: PROGRESSIVE (SOF2, 6-phase scan script — the encoding the
      majority of modern web JPEGs use; same quantized coefficients, so
      the decode keeps the SAME closed form);
    - 10: progressive + restart interval 2.

    4:2:0 family — dims 16·(1+id%3) × 16, per-16×16-MCU constants (the
    subsampled chroma stays DC-only, closed form with npix=256):
    - 1: plain; 5: DRI(2); 9: progressive + DRI(2); 14: progressive.

    4:2:2 (id%16 = 13) — dims 16·(1+id%3) × 16, per-16×8-MCU constants
    (horizontal chroma averaging of a constant is the constant; closed
    form with npix=128).

    GRAYSCALE family (1-component SOF; decode replicates Y into RGB, so
    sum_r = sum_g = sum_b = Σ y1): 6: baseline + DRI(1); 12: progressive.

    Corrupt stripes (honest decode_ok=false): 3: baseline truncated
    mid-scan; 7: baseline whose first RST0 is tampered to RST4
    (out-of-sequence restart); 11: PROGRESSIVE truncated mid-scan;
    15: progressive whose first RST0 is tampered (restart checking
    inside progressive scans).

    Constants come from ``_jpeg_block_consts`` in every profile."""
    enc = _jpeg.encode_jpeg
    consts = _jpeg_block_consts

    def mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": [],
                    "width": [], "height": []}
            for mid in pdf["id"]:
                mid = int(mid)
                s = mid % 16
                if s in (1, 5, 9, 14):  # 4:2:0 — constants per MCU
                    w, h = 16 * (1 + mid % 3), 16
                    img = np.zeros((h, w, 3), dtype=np.uint8)
                    for mby in range(h // 16):
                        for mbx in range(w // 16):
                            img[
                                mby * 16 : mby * 16 + 16,
                                mbx * 16 : mbx * 16 + 16,
                            ] = consts(mid, mbx, mby)
                    payload = enc(
                        w, h, img.tobytes(), subsampling="420",
                        restart_interval=2 if s in (5, 9) else 0,
                        progressive=s in (9, 14),
                    )
                elif s == 13:  # 4:2:2 — constants per 16×8 MCU
                    w, h = 16 * (1 + mid % 3), 16
                    img = np.zeros((h, w, 3), dtype=np.uint8)
                    for mby in range(h // 8):
                        for mbx in range(w // 16):
                            img[
                                mby * 8 : mby * 8 + 8,
                                mbx * 16 : mbx * 16 + 16,
                            ] = consts(mid, mbx, mby)
                    payload = enc(w, h, img.tobytes(), subsampling="422")
                else:  # 4:4:4 / gray (and the corrupt stripes' bases)
                    w, h = 8 * (2 + mid % 3), 8 * (2 + mid % 2)
                    if s == 2:  # non-MCU-multiple dims (even — see doc)
                        w, h = w + 6, h + 4
                    img = np.zeros((h, w, 3), dtype=np.uint8)
                    for by in range(-(-h // 8)):
                        for bx in range(-(-w // 8)):
                            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                                consts(mid, bx, by)
                            )
                    if s in (6, 12):
                        payload = enc(w, h, img.tobytes(), subsampling="gray",
                                      restart_interval=1 if s == 6 else 0,
                                      progressive=s == 12)
                    else:
                        payload = enc(
                            w, h, img.tobytes(),
                            restart_interval=(
                                1 if s in (4, 7, 15) else 2 if s == 10 else 0
                            ),
                            progressive=s in (8, 10, 11, 15),
                        )
                if s in (3, 11):  # corrupt: truncate mid-scan
                    payload = payload[: int(len(payload) * 0.6)]
                elif s in (7, 15):  # corrupt: out-of-sequence RSTn
                    i = payload.find(b"\xff\xd0")  # first restart (RST0)
                    assert i >= 0  # >= 4 MCUs at interval 1 guarantees it
                    payload = payload[:i + 1] + b"\xd4" + payload[i + 2:]
                rows["media_id"].append(mid)
                rows["payload"].append(payload)
                rows["mime"].append("image/jpeg")
                rows["width"].append(w)
                rows["height"].append(h)
            yield pd.DataFrame(rows)

    # Partition by ROW COUNT, not default parallelism: 64 tiny synthetic
    # rows over 32 partitions means 32 Python workers × 2 chained
    # mapInPandas stages doing ~2 rows each — pure spin-up cost. Real
    # media repartitions by BYTES (extract_features' target_partition_mb);
    # synthetic thumbnails get ≥8 rows per partition.
    n_parts = max(1, min(n // 8, spark.sparkContext.defaultParallelism))
    return spark.range(n, numPartitions=n_parts).mapInPandas(
        mk, "media_id long, payload binary, mime string, width int, height int"
    )


def synthetic_jpeg_lossless(spark, n: int = 56) -> DataFrame:
    """Deterministic media table of REAL SOF3 lossless JPEG payloads
    (operators.jpeg.encode_jpeg_lossless, r10), cycling the Annex-H
    profile: predictor ``media_id % 7 + 1`` (all seven), and on
    ``media_id % 5``: 0 = 8-bit grayscale; 1 = 8-bit RGB (3 components,
    carried as RGB — lossless has no JFIF YCbCr contract); 2 = 8-bit
    grayscale with point transform 1 AND row-boundary restarts every 2
    rows; 3 = 16-bit grayscale (decode reduces ``>> 8``); 4 = 4-comp
    CMYK (r11 — Adobe-inverted ink values; decode applies the
    documented channel·K/255 conversion, so the oracle's closed form
    is the formula THROUGH that conversion). Pixels are per-PIXEL
    formulas (not per-block — lossless has no block grid), so the
    decoded image equals the formula EXACTLY (that is the point of
    lossless) and the oracle restates the sums in closed form. Dims
    ``(8 + id%5) × (6 + id%3)`` — deliberately not 8-aligned."""
    enc = _jpeg.encode_jpeg_lossless

    def mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": []}
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = 8 + mid % 5, 6 + mid % 3
                pred = mid % 7 + 1
                kind = mid % 5
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                if kind in (1, 4):
                    r = (mid * 31 + x * 7 + y * 13) % 256
                    g = (mid * 17 + x * 11 + y * 3) % 256
                    b = (mid * 29 + x * 5 + y * 19) % 256
                    chans = [r, g, b]
                    if kind == 4:
                        chans.append((mid * 23 + x * 3 + y * 17) % 256)
                    img = np.stack(
                        [np.broadcast_to(p, (h, w)) for p in chans],
                        axis=-1,
                    )
                    payload = enc(
                        w, h, img.flatten().tolist(), ncomp=len(chans),
                        predictor=pred,
                    )
                else:
                    if kind == 3:
                        gray = (mid * 131 + x * 17 + y * 29) % 65536
                        gray = np.broadcast_to(gray, (h, w))
                        payload = enc(
                            w, h, gray.flatten().tolist(), ncomp=1,
                            precision=16, predictor=pred,
                        )
                    else:
                        gray = np.broadcast_to(
                            (mid * 31 + x * 7 + y * 13) % 256, (h, w)
                        )
                        payload = enc(
                            w, h, gray.flatten().tolist(), ncomp=1,
                            predictor=pred,
                            point_transform=1 if kind == 2 else 0,
                            restart_rows=2 if kind == 2 else 0,
                        )
                rows["media_id"].append(mid)
                rows["payload"].append(payload)
                rows["mime"].append("image/jpeg")
            yield pd.DataFrame(rows)

    n_parts = max(1, min(n // 8, spark.sparkContext.defaultParallelism))
    return spark.range(n, numPartitions=n_parts).mapInPandas(
        mk, "media_id long, payload binary, mime string"
    )


def synthetic_jpeg_hierarchical(spark, n: int = 40) -> DataFrame:
    """Deterministic media table of REAL hierarchical JPEG payloads
    (operators.jpeg.encode_jpeg_hierarchical, r11 — T.81 Annex J: DHP,
    a baseline grayscale first frame, EXP expansion, SOF5 differential
    frames): per row a CONSTANT image of value ``(id*37 + 11) % 256``
    at ``(15 + id%6) × (11 + id%4)`` (odd dims exercise the
    expand-and-crop path), ``levels = 3`` when ``id % 3 == 0`` else 2
    (two EXPs vs one). Constant images keep every frame DC-only, so
    the decoded value follows the closed-form refinement chain
    ``r ← clip(r + QD(c − r))`` from ``r = Q(c)``, which the oracle
    restates exactly — a drifting DHP/EXP parse, differential DC
    convention, reference add, or clamp flips rows. ``id % 8 == 7``
    rows are truncated to 60% (no EOI can survive the cut, so the
    decode is an honest failure)."""
    enc = _jpeg.encode_jpeg_hierarchical

    def mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": []}
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = 15 + mid % 6, 11 + mid % 4
                c = (mid * 37 + 11) % 256
                levels = 3 if mid % 3 == 0 else 2
                payload = enc(w, h, [c] * (w * h), levels=levels)
                if mid % 8 == 7:
                    payload = payload[: int(len(payload) * 0.6)]
                rows["media_id"].append(mid)
                rows["payload"].append(payload)
                rows["mime"].append("image/jpeg")
            yield pd.DataFrame(rows)

    n_parts = max(1, min(n // 8, spark.sparkContext.defaultParallelism))
    return spark.range(n, numPartitions=n_parts).mapInPandas(
        mk, "media_id long, payload binary, mime string"
    )


def synthetic_jpeg_cmyk(spark, n: int = 48) -> DataFrame:
    """Deterministic media table of REAL 4-component JPEG payloads
    (operators.jpeg.encode_jpeg_cmyk, r10) — the print-derived profile
    crawls actually contain. Stripes on ``media_id % 4``: 0 = CMYK
    4:4:4 with APP14 transform 0; 1 = the SAME stream with NO APP14
    (the decoder's documented default-to-CMYK reading); 2 = YCCK 4:4:4
    (transform 2); 3 = YCCK 4:2:0 (Y and K full-rate, Cb/Cr
    subsampled — the Adobe layout), per-16×16-MCU constants. Block
    constants per channel keep the lossy decode DC-only, so the oracle
    restates the exact pixel sums in closed form (quant roundtrip per
    channel + the documented ink/YCCK → RGB conversion)."""
    enc = _jpeg.encode_jpeg_cmyk

    def consts4(mid: int, bx: int, by: int) -> tuple[int, int, int, int]:
        return (
            (mid * 31 + bx * 7 + by * 13) % 256,
            (mid * 17 + bx * 11 + by * 3) % 256,
            (mid * 29 + bx * 5 + by * 19) % 256,
            (mid * 23 + bx * 3 + by * 17) % 256,
        )

    def mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": []}
            for mid in pdf["id"]:
                mid = int(mid)
                s = mid % 4
                if s == 3:  # YCCK 4:2:0 — constants per MCU
                    w, h = 16 * (1 + mid % 3), 16
                    img = np.zeros((h, w, 4), dtype=np.uint8)
                    for mbx in range(w // 16):
                        img[:, mbx * 16 : mbx * 16 + 16] = consts4(
                            mid, mbx, 0
                        )
                    payload = enc(
                        w, h, img.tobytes(), transform=2, subsampling="420"
                    )
                else:
                    w, h = 8 * (2 + mid % 3), 8 * (2 + mid % 2)
                    img = np.zeros((h, w, 4), dtype=np.uint8)
                    for by in range(h // 8):
                        for bx in range(w // 8):
                            img[
                                by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                            ] = consts4(mid, bx, by)
                    # half the YCCK 4:4:4 stripe encodes PROGRESSIVE
                    # (mid % 8 == 6): same quantized coefficients, so
                    # the oracle's closed form is unchanged — the gate
                    # then pins progressive-CMYK decode cross-engine
                    payload = enc(
                        w, h, img.tobytes(),
                        transform=2 if s == 2 else 0,
                        app14=s != 1,
                        progressive=mid % 8 == 6,
                    )
                rows["media_id"].append(mid)
                rows["payload"].append(payload)
                rows["mime"].append("image/jpeg")
            yield pd.DataFrame(rows)

    n_parts = max(1, min(n // 8, spark.sparkContext.defaultParallelism))
    return spark.range(n, numPartitions=n_parts).mapInPandas(
        mk, "media_id long, payload binary, mime string"
    )


def extract_jpeg_stats(media: DataFrame) -> DataFrame:
    """Byte-level baseline-JPEG decode → exact integer per-channel pixel
    sums via Arrow-batched mapInPandas. Undecodable payloads yield
    decode_ok=False with null stats."""
    stats = _jpeg.jpeg_stats
    err = _jpeg.JpegError

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "sum_r": [], "sum_g": [], "sum_b": [], "decode_ok": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(int(mid))
                try:
                    s = stats(bytes(b))
                    for k in ("width", "height", "sum_r", "sum_g", "sum_b"):
                        out[k].append(s[k])
                    out["decode_ok"].append(True)
                except (err, TypeError):
                    for k in ("width", "height", "sum_r", "sum_g", "sum_b"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        op,
        "media_id long, width int, height int, "
        "sum_r long, sum_g long, sum_b long, decode_ok boolean",
    )


AUDIO_SAMPLE_RATE = 8000


def _audio_samples(media_id: int, n_samples: int) -> list[int]:
    """Deterministic integer-only PCM generator (Knuth-style multiplicative
    mix): pure int math so an engine-independent oracle can recompute the
    stream exactly — no libm sin() whose last ulp could differ."""
    return [
        ((media_id * 7919 + i * 2654435761) % 65536) - 32768
        for i in range(n_samples)
    ]


def synthetic_audio(spark, n: int = 64) -> DataFrame:
    """Deterministic audio table with REAL mono 16-bit PCM WAV payloads,
    encoded on the executors. Sample count varies per id (256 + id%7 · 32)
    so byte sizes differ across rows like a real corpus."""
    enc = _wav.encode_wav
    gen = _audio_samples
    sr = AUDIO_SAMPLE_RATE

    def mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": [], "n_samples": []}
            for mid in pdf["id"]:
                mid = int(mid)
                ns = 256 + (mid % 7) * 32
                rows["media_id"].append(mid)
                rows["payload"].append(enc(gen(mid, ns), sr))
                rows["mime"].append("audio/wav")
                rows["n_samples"].append(ns)
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        mk, "media_id long, payload binary, mime string, n_samples int"
    )


def synthetic_audio_edges(spark, n: int = 48) -> DataFrame:
    """Deterministic WAV corpus for the r8 PCM bit-depth edges, on
    ``media_id % 4`` (the png_edges playbook applied to audio):

    - 0: 8-BIT PCM — sample ``((mid*7 + i*131) % 256) - 128`` (stored
      unsigned per the spec, decoded back to signed);
    - 1: 16-bit PCM — the ``_audio_samples`` Knuth-mix formula;
    - 2: 24-BIT PCM — sample ``((mid*1031 + i*2654435761) % 16777216)
      - 8388608`` (3-byte little-endian two's complement on disk);
    - 3: corrupt — a valid 16-bit stream whose fmt code is patched to 3
      (IEEE float, outside the integer-PCM profile) → decode_ok=false.

    n_samples = 200 + (mid % 5)·40 ≤ 360; every decodable stripe's
    stats have an integer closed form the gate oracle restates."""
    enc = _wav.encode_wav
    sr = AUDIO_SAMPLE_RATE

    def mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": [], "n_samples": []}
            for mid in pdf["id"]:
                mid = int(mid)
                ns = 200 + (mid % 5) * 40
                s = mid % 4
                if s == 0:
                    samples = [((mid * 7 + i * 131) % 256) - 128
                               for i in range(ns)]
                    payload = enc(samples, sr, bits=8)
                elif s == 2:
                    samples = [
                        ((mid * 1031 + i * 2654435761) % 16777216) - 8388608
                        for i in range(ns)
                    ]
                    payload = enc(samples, sr, bits=24)
                else:  # 1 (valid 16-bit) and 3 (same stream, fmt patched)
                    payload = enc(_audio_samples(mid, ns), sr)
                    if s == 3:
                        p = bytearray(payload)
                        # fmt code sits at offset 20 (RIFF 12 + tag 4 +
                        # len 4); 3 = IEEE float, outside the profile
                        p[20:22] = _struct.pack("<H", 3)
                        payload = bytes(p)
                rows["media_id"].append(mid)
                rows["payload"].append(payload)
                rows["mime"].append("audio/wav")
                rows["n_samples"].append(ns)
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        mk, "media_id long, payload binary, mime string, n_samples int"
    )


def extract_audio_stats(audio: DataFrame) -> DataFrame:
    """Byte-level WAV decode → exact integer stream statistics via
    Arrow-batched mapInPandas. Undecodable payloads yield decode_ok=False
    with null stats."""
    stats = _wav.wav_stats
    err = _wav.WavError

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "sample_rate": [],
                "channels": [],
                "n_samples": [],
                "sumsq": [],
                "zero_crossings": [],
                "peak": [],
                "decode_ok": [],
            }
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(int(mid))
                try:
                    s = stats(bytes(b))
                    for k in ("sample_rate", "channels", "n_samples", "sumsq",
                              "zero_crossings", "peak"):
                        out[k].append(s[k])
                    out["decode_ok"].append(True)
                except (err, TypeError):
                    for k in ("sample_rate", "channels", "n_samples", "sumsq",
                              "zero_crossings", "peak"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return audio.mapInPandas(
        op,
        "media_id long, sample_rate int, channels int, n_samples int, "
        "sumsq long, zero_crossings long, peak int, decode_ok boolean",
    )


def _afp_np(samples, grid: int = 8) -> int | None:
    """64-bit block-ENERGY differential fingerprint of a PCM stream —
    the audio analog of ``_dhash_np`` (LAION-Audio-style block/spectral
    fingerprints run exactly this comparison stage): split the stream
    into grid·(grid+1) equal blocks, energy E_j = Σ s² (exact int64),
    bit (r, c) = E[r·(grid+1)+c] > E[r·(grid+1)+c+1]. Comparing
    energies makes the print AMPLITUDE-INVARIANT (a gain g scales every
    E by g², preserving every comparison — re-levelled re-uploads of
    the same clip collide; property-tested), and per-row resets bound
    error drift like the image grid. Streams shorter than one sample
    per block return None (nothing to compare)."""
    import numpy as np

    nb = grid * (grid + 1)
    n = len(samples)
    if n < nb:
        return None
    a = np.asarray(samples, dtype=np.int64)
    bounds = [(j * n) // nb for j in range(nb + 1)]
    # int64 energy sums are exact while max_block_len · max_sample² <
    # 2⁶³; past that (≥ ~2¹⁷ samples per block at 24-bit depth — hours
    # of audio in one clip) fall back to Python-int accumulation in
    # bounded chunks so the comparison bits NEVER wrap silently
    peak = int(np.abs(a).max()) if n else 0
    blk = max(bounds[j + 1] - bounds[j] for j in range(nb))
    if peak and blk > (1 << 63) // (peak * peak):
        def energy(lo: int, hi: int) -> int:
            tot = 0
            step = max(1, (1 << 62) // (peak * peak))
            for s in range(lo, hi, step):
                seg = a[s:min(s + step, hi)]
                tot += int((seg * seg).sum())
            return tot
    else:
        def energy(lo: int, hi: int) -> int:
            seg = a[lo:hi]
            return int((seg * seg).sum())
    e = np.array(
        [energy(bounds[j], bounds[j + 1]) for j in range(nb)],
        dtype=object,  # python ints from here on — comparisons exact
    ).reshape(grid, grid + 1)
    v = 0
    for r in range(grid):
        for c in range(grid):
            if e[r, c] > e[r, c + 1]:
                v |= 1 << (r * grid + c)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def audio_fingerprint(
    audio: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual AUDIO fingerprints (r13, VERDICT r12 item 5 — the
    modality triangle's third face: text ✓ image ✓ audio): decode the
    WAV payload (8/16/24-bit integer PCM, ``wav.decode_wav``) and
    reduce the stream to the 64-bit block-energy differential print
    (``_afp_np``; multi-channel audio prints over the INTERLEAVED
    stream — block energies sum the channels, so a stereo clip and its
    own mono downmix do not generally collide; compare like with
    like). Returns ``(id, afp, sample_rate, n_samples,
    decode_ok)`` — undecodable payloads are ``decode_ok=false`` with
    NULL print (the honest-failure taxonomy); too-short streams decode
    fine but carry a NULL print.

    Feed the result to ``dedup.simhash_dup_pairs(hash_col="afp")`` —
    the same 16-bit pigeonhole Hamming join the image tier uses — and
    ``dedup.dedup_clusters`` for survivors. Scale shape: one
    zero-shuffle Arrow-batched ``mapInPandas``; PCM bytes never cross
    an exchange, only 8-byte prints reach the dedup join. Same pin
    contract as ``image_dhash``: callers fanning the result out to
    multiple consumers must ``localCheckpoint()`` it first or the
    decode subtree re-executes per consumer."""
    dec = _wav.decode_wav
    err = _wav.WavError
    id_type = audio.schema[id_col].dataType.simpleString()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: [], "afp": [], "sample_rate": [],
                "n_samples": [], "decode_ok": [],
            }
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                out[id_col].append(mid)
                try:
                    sr, _ch, samples = dec(bytes(b) if b is not None else b"")
                except (err, TypeError):
                    out["afp"].append(None)
                    out["sample_rate"].append(None)
                    out["n_samples"].append(None)
                    out["decode_ok"].append(False)
                    continue
                out["afp"].append(_afp_np(samples))
                out["sample_rate"].append(sr)
                out["n_samples"].append(len(samples))
                out["decode_ok"].append(True)
            pdf_out = pd.DataFrame(out)
            # Int64 keeps 64-bit prints exact when NULLs share the batch
            # (the image_dhash float64-coercion lesson)
            pdf_out["afp"] = pd.array(out["afp"], dtype="Int64")
            pdf_out["sample_rate"] = pd.array(out["sample_rate"], dtype="Int32")
            pdf_out["n_samples"] = pd.array(out["n_samples"], dtype="Int32")
            yield pdf_out

    return audio.select(id_col, payload_col).mapInPandas(
        op,
        f"{id_col} {id_type}, afp long, sample_rate int, "
        "n_samples int, decode_ok boolean",
    )


def synthetic_fp_audio(spark, n: int = 32, gain: int = 1) -> DataFrame:
    """Deterministic audio-dedup corpus — the ``synthetic_dhash_images``
    playbook on WAV: 16-bit mono clips in groups of four (seed = id//4,
    variant = id%4) built from 72 constant-amplitude blocks of 16
    samples (alternating ±A) whose amplitudes WALK ±100 from 1000 along
    each 9-block row, stepping DOWN exactly when ``_dhash_fixture_bit``
    is 1 — so every block-energy comparison is the generator's
    closed-form bit pattern and the fingerprint needs no decoding to
    predict. Variants 0/3 share the bit pattern but variant 3 is an
    amplitude-DOUBLED re-level of variant 0 (different bytes, different
    energies, SAME print — the collision the fingerprint exists for,
    the audio analog of the rotated-image test); variant 1 is Hamming-2
    from them, variant 2 Hamming-5. ids n and n+1 append a truncated
    stripe (decode_ok=false)."""
    enc = _wav.encode_wav
    bit = _dhash_fixture_bit
    sr = AUDIO_SAMPLE_RATE

    def mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": []}
            for i in pdf["id"]:
                mid = int(i)
                if mid >= n:  # corrupt stripe
                    rows["media_id"].append(mid)
                    rows["payload"].append(b"RIFF\x10\x00\x00\x00WAVE")
                    continue
                seed, variant = mid // 4, mid % 4
                g = (2 if variant == 3 else 1) * gain
                samples: list[int] = []
                for r in range(8):
                    amp = 1000
                    for c in range(9):
                        samples += [amp * g, -amp * g] * 8
                        if c < 8:
                            amp += -100 if bit(seed, variant, r, c) else 100
                rows["media_id"].append(mid)
                rows["payload"].append(enc(samples, sr))
            yield pd.DataFrame(rows)

    return spark.range(n + 2, numPartitions=1).mapInPandas(
        mk, "media_id long, payload binary"
    )


def video_frame_hashes(
    videos: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-frame perceptual hashes of Y4M videos (r13, VERDICT r12 item
    6 — the standard video near-dup stage): decode the container
    (``y4m.video_info`` strict walk), dHash the LUMA plane of every
    frame (the image kernel ``_dhash_np`` — chroma subsampling and
    color drift from a re-encode don't touch it). Returns one row per
    frame ``(id, frame_idx, fhash, n_frames, decode_ok)``;
    undecodable payloads yield ONE row with NULL frame fields and
    ``decode_ok=false`` (honest-failure taxonomy, and the row keeps
    every input id visible downstream); frames too small to hash carry
    NULL fhash.

    The frame-hash SET is the video's signature: feed the result to
    ``dedup.set_dup_pairs(item_col="fhash")`` — MinHash-LSH over the
    set, exact Jaccard verify — so trimmed and re-encoded copies
    collide while distinct footage doesn't. Scale shape: one
    zero-shuffle Arrow ``mapInPandas``; video bytes never cross an
    exchange, only (id, 8-byte hash) rows leave it. Same pin contract
    as ``image_dhash`` when fanned out to multiple consumers."""
    from bigdata_lab02_spark.operators import y4m as _y4m

    id_type = videos.schema[id_col].dataType.simpleString()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                id_col: [], "frame_idx": [], "fhash": [],
                "n_frames": [], "decode_ok": [],
            }
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(b) if b is not None else b""
                try:
                    info = _y4m.video_info(data)
                except _y4m.Y4mError:
                    out[id_col].append(mid)
                    out["frame_idx"].append(None)
                    out["fhash"].append(None)
                    out["n_frames"].append(None)
                    out["decode_ok"].append(False)
                    continue
                w, h = info["width"], info["height"]
                lb = info["luma_bytes"]
                for i, fr in _y4m.iter_frames(data):
                    a = np.frombuffer(fr[:lb], dtype=np.uint8).reshape(h, w)
                    out[id_col].append(mid)
                    out["frame_idx"].append(i)
                    out["fhash"].append(_dhash_np(a))
                    out["n_frames"].append(info["n_frames"])
                    out["decode_ok"].append(True)
            pdf_out = pd.DataFrame(out)
            pdf_out["fhash"] = pd.array(out["fhash"], dtype="Int64")
            pdf_out["frame_idx"] = pd.array(out["frame_idx"], dtype="Int32")
            pdf_out["n_frames"] = pd.array(out["n_frames"], dtype="Int32")
            yield pdf_out

    return videos.select(id_col, payload_col).mapInPandas(
        op,
        f"{id_col} {id_type}, frame_idx int, fhash long, "
        "n_frames int, decode_ok boolean",
    )


def _vhash_fixture_bit(fseed: int, r: int, c: int) -> int:
    """Per-FRAME comparison-outcome pattern, bit (r, c) of a frame's
    luma dHash — the video fixture's closed form (shared by the
    generator, the unit tests and the SQL oracle). Distinct fseeds give
    distinct 64-bit patterns within any window of 97 consecutive fseeds
    (the mix is linear mod the prime 97). Bit 63 pinned 0 so hashes
    stay non-negative (the _dhash_fixture_bit convention — SQL never
    touches BIGINT sign arithmetic)."""
    if r == 7 and c == 7:
        return 0
    return ((fseed * 48271 + r * 191 + c * 31) % 97) % 2


def synthetic_dup_videos(spark, n: int = 16) -> DataFrame:
    """Deterministic video-dedup corpus: 18×16 C420 Y4M clips in groups
    of four (seed = id//4, variant = id%4). Frame f of the base variant
    carries the closed-form luma pattern of ``fseed = seed·10 + f``
    (2×2-pixel blocks walking ±10 from 128 so the frame dHash IS
    ``_vhash_fixture_bit``); chroma planes are constant 128.

    - variant 0: the base — 10 frames (fseeds seed·10 … seed·10+9);
    - variant 1: a TRIMMED copy — frames 1..8 of the base (frame-hash
      set an 8-of-10 subset → Jaccard 0.8);
    - variant 2: a RE-ENCODED copy — same 10 frames with a +(x+y+f)%2
      per-pixel dither, which adds exactly +2 to every 2×2 block sum,
      so every dHash comparison (and hence the frame-hash SET) is
      unchanged while the bytes all differ — the collision the
      set-signature exists for;
    - variant 3: DISTINCT footage — fseeds 800 + seed·10 + f (disjoint
      pattern range; any residual mod-97 single-frame collisions stay
      far below the Jaccard threshold and are replayed identically by
      the oracle).

    ids n and n+1 append a corrupt stripe (bad magic / truncated frame
    → decode_ok=false)."""
    from bigdata_lab02_spark.operators.y4m import encode_y4m

    bit = _vhash_fixture_bit

    def luma(fseed: int, dither_f: int | None) -> bytes:
        v = [[128] * 9 for _ in range(8)]
        for r in range(8):
            for c in range(8):
                step = -10 if bit(fseed, r, c) else 10
                v[r][c + 1] = v[r][c] + step
        px = bytearray()
        for y in range(16):
            for x in range(18):
                p = v[y // 2][x // 2]
                if dither_f is not None:
                    p += (x + y + dither_f) % 2
                px.append(p)
        return bytes(px)

    def mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chroma = bytes([128]) * (9 * 8)
        for pdf in batches:
            rows = {"media_id": [], "payload": []}
            for i in pdf["id"]:
                mid = int(i)
                if mid == n:
                    rows["media_id"].append(mid)
                    rows["payload"].append(b"NOTY4M anything")
                    continue
                if mid == n + 1:  # valid header, truncated first frame
                    rows["media_id"].append(mid)
                    rows["payload"].append(
                        b"YUV4MPEG2 W18 H16 F25:1 C420\nFRAME\n\x00\x01"
                    )
                    continue
                seed, variant = mid // 4, mid % 4
                if variant == 1:
                    fr = range(1, 9)
                else:
                    fr = range(10)
                base = 800 if variant == 3 else 0
                frames = [
                    luma(base + seed * 10 + f,
                         f if variant == 2 else None) + chroma * 2
                    for f in fr
                ]
                rows["media_id"].append(mid)
                rows["payload"].append(encode_y4m(18, 16, frames))
            yield pd.DataFrame(rows)

    return spark.range(n + 2, numPartitions=1).mapInPandas(
        mk, "media_id long, payload binary"
    )


def _video_planes(
    media_id: int, frame: int, luma: int, chroma: int
) -> bytes:
    """Deterministic integer-only planar YUV generator (one frame):
    distinct per-plane mixing constants so a swapped or misaligned plane
    in the container parse flips the oracle hash."""
    y = bytes((media_id * 31 + frame * 17 + p * 7) % 256 for p in range(luma))
    u = bytes((media_id * 13 + frame * 29 + p * 5) % 256 for p in range(chroma))
    v = bytes((media_id * 11 + frame * 23 + p * 3) % 256 for p in range(chroma))
    return y + u + v


def synthetic_video(spark, n: int = 64) -> DataFrame:
    """Deterministic video table with REAL Y4M (YUV4MPEG2) payloads,
    encoded on the executors with the vendored codec: per id, C420 video
    of (8 + id%3·2) × (6 + id%2·2) with 4 + id%5 frames. Every 4th row is
    a corrupt payload (truncated mid-frame) so the sampler's
    honest-failure path stays exercised."""
    enc = _y4m.encode_y4m
    planes = _video_planes

    def mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": [],
                    "width": [], "height": [], "n_frames": []}
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = 8 + (mid % 3) * 2, 6 + (mid % 2) * 2
                nf = 4 + mid % 5
                luma, chroma = w * h, (w // 2) * (h // 2)
                frames = [planes(mid, f, luma, chroma) for f in range(nf)]
                payload = enc(w, h, frames)
                if mid % 4 == 3:  # corrupt stripe: drop the final frame's tail
                    payload = payload[: len(payload) - chroma - 1]
                rows["media_id"].append(mid)
                rows["payload"].append(payload)
                rows["mime"].append("video/x-yuv4mpeg")
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(nf)
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        mk,
        "media_id long, payload binary, mime string, "
        "width int, height int, n_frames int",
    )


def sample_frames(video: DataFrame, every_n_frames: int = 30) -> DataFrame:
    """Frame sampling with a REAL container parse (vendored Y4M codec):
    frame boundaries follow from the header geometry, so skipped frames
    cost one pointer hop each (no byte decode — Y4M FRAME lines may carry
    params, hence a hop rather than a pure O(1) seek), and every
    ``every_n_frames``-th frame is reduced to exact integer per-plane
    statistics. Payloads the codec
    rejects (bad magic, truncated frame, unsupported colorspace) yield one
    decode_ok=false row. Arrow-batched mapInPandas — bytes never cross a
    shuffle; the explode from row-per-video to row-per-sampled-frame
    happens inside the kernel."""
    stats = _y4m.frame_stats
    err = _y4m.Y4mError
    step = every_n_frames

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "width": [], "height": [],
                   "y_sum": [], "u_sum": [], "v_sum": [], "decode_ok": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rows = stats(bytes(b), every_n_frames=step)
                except (err, TypeError):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(None)
                    for k in ("width", "height", "y_sum", "u_sum", "v_sum"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
                    continue
                for r in rows:
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(r["frame_idx"])
                    out["width"].append(r["width"])
                    out["height"].append(r["height"])
                    out["y_sum"].append(r["y_sum"])
                    out["u_sum"].append(r["u_sum"])
                    out["v_sum"].append(r["v_sum"])
                    out["decode_ok"].append(True)
            yield pd.DataFrame(out)

    return video.mapInPandas(
        op,
        "media_id long, frame_idx int, width int, height int, "
        "y_sum long, u_sum long, v_sum long, decode_ok boolean",
    )


def exif_app1_segment(orientation: int) -> bytes:
    """APP1/EXIF segment bytes: ``Exif\\x00\\x00`` + little-endian TIFF
    header + a 0th IFD with Make/Model/Orientation/DateTime (string
    values offset-addressed in the post-IFD data area — the layout every
    camera writes; EXIF 2.3 §4.5, marker framing ITU-T T.81 §B.1.1.3).
    Same real-shaped payload as the foreign-fixture builder
    (tools/make_foreign_fixtures.exif_app1), parameterized on the
    orientation tag (0x0112, SHORT, valid 1-8) so a deterministic
    per-row orientation can cross the oracle gate."""
    import struct as st

    if not 1 <= orientation <= 8:
        raise ValueError(f"EXIF orientation must be 1-8, got {orientation}")

    def entry(tag: int, typ: int, count: int, value: bytes) -> bytes:
        return st.pack("<HHI", tag, typ, count) + value

    make = b"PyFixture\x00"
    model = b"SynthCam 1\x00"
    dt = b"2024:01:02 03:04:05\x00"
    # header(8) + count(2) + 4 entries * 12 + next-IFD(4) = 62
    data_off = 62
    entries = [
        entry(0x010F, 2, len(make), st.pack("<I", data_off)),
        entry(0x0110, 2, len(model), st.pack("<I", data_off + len(make))),
        entry(0x0112, 3, 1, st.pack("<HH", orientation, 0)),
        entry(
            0x0132, 2, len(dt),
            st.pack("<I", data_off + len(make) + len(model)),
        ),
    ]
    tiff = (
        b"II*\x00" + st.pack("<I", 8)
        + st.pack("<H", len(entries)) + b"".join(entries)
        + st.pack("<I", 0) + make + model + dt
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + st.pack(">H", len(payload) + 2) + payload


def splice_exif(
    media: DataFrame,
    orientation_col: str = "exif_orientation_in",
    payload_col: str = "payload",
) -> DataFrame:
    """Splice an APP1/EXIF segment (``exif_app1_segment``) directly after
    SOI of each JPEG payload whose ``orientation_col`` is non-null —
    where cameras put EXIF, BEFORE any JFIF APP0. Null-orientation rows
    pass through byte-identical. Entropy data is untouched, so decode
    results are unchanged; only the header-routing metadata (APPn count,
    has_exif, orientation) moves — which is exactly what the
    media_metadata oracle gate pins (r10, VERDICT r9 item 4). Schema-
    preserving zero-shuffle ``mapInPandas`` projection."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            newp = []
            for b, o in zip(pdf[payload_col], pdf[orientation_col]):
                if b is None or o is None or pd.isna(o):
                    newp.append(b)
                    continue
                bb = bytes(b)
                if bb[:2] != b"\xff\xd8":
                    newp.append(b)  # not a JPEG: pass through
                    continue
                newp.append(bb[:2] + exif_app1_segment(int(o)) + bb[2:])
            pdf = pdf.copy()
            pdf[payload_col] = newp
            yield pdf

    return media.mapInPandas(op, media.schema)


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """Header-only media routing pass (r9): format sniff + JPEG header
    metadata (dims, precision, baseline/progressive, APPn inventory,
    EXIF orientation) WITHOUT entropy decode — the pass a 100 TB
    curation pipeline runs first, so routing/filtering decisions (drop
    tiny images, flag rotated/progressive/12-bit ones) never pay full
    decode cost. PNG headers expose dims from IHDR the same cheap way.

    Arrow-batched mapInPandas over the payload column; unparseable
    headers yield ``meta_ok=false`` with null fields (the honest-failure
    taxonomy shared with the decoders)."""
    from bigdata_lab02_spark.operators.jpeg import JpegError, jpeg_metadata

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as st

        for pdf in batches:
            out = {
                "media_id": [], "format": [], "width": [], "height": [],
                "ncomp": [], "precision": [], "progressive": [],
                "n_app_segments": [], "has_exif": [],
                "exif_orientation": [], "meta_ok": [],
            }

            def row(fmt=None, w=None, h=None, nc=None, prec=None,
                    prog=None, napp=None, exif=None, orient=None,
                    ok=False):
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["ncomp"].append(nc)
                out["precision"].append(prec)
                out["progressive"].append(prog)
                out["n_app_segments"].append(napp)
                out["has_exif"].append(exif)
                out["exif_orientation"].append(orient)
                out["meta_ok"].append(ok)

            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(int(mid))
                data = bytes(b) if b is not None else b""
                fmt = sniff_image_format(data)
                if fmt == "jpeg":
                    try:
                        m = jpeg_metadata(data)
                        row("jpeg", m["width"], m["height"], m["ncomp"],
                            m["precision"], m["progressive"],
                            len(m["app_markers"]), m["has_exif"],
                            m["exif_orientation"], True)
                    except JpegError:
                        row(fmt="jpeg")
                elif fmt == "png":
                    # IHDR is always the first chunk (RFC 2083 §4.1.1):
                    # dims at fixed offsets, bit depth at 24
                    if len(data) >= 26 and data[12:16] == b"IHDR":
                        w, h = st.unpack_from(">II", data, 16)
                        # channel count from the IHDR color type
                        nc = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(data[25])
                        row("png", w, h, nc, data[24], False, 0, False,
                            None, True)
                    else:
                        row(fmt="png")
                else:
                    row()
            yield pd.DataFrame(out)

    return media.mapInPandas(
        op,
        "media_id long, format string, width long, height long, "
        "ncomp int, precision int, progressive boolean, "
        "n_app_segments int, has_exif boolean, exif_orientation int, "
        "meta_ok boolean",
    )
