"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no decode libraries (PIL/ffmpeg/torchcodec), so the
decode kernels are STUBS — clearly marked, swappable — while everything
Spark-side is real and tested: schemas, Arrow-batched mapInPandas
signatures, batch shaping, partition sizing. The contract is the point:
a real decoder drops into ``_decode_image_batch`` without touching any
plan-level code.

Design rules for 100 TB of media:
- binary payloads travel in their own column; metadata columns are small
  and filterable so Catalyst prunes/pushes down without touching bytes;
- per-batch processing via ``mapInPandas`` (Arrow), never per-row UDFs;
- byte-size-aware repartitioning (``target_partition_mb``) because row
  counts are meaningless when one row is a 4 MB image.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def synthetic_media(spark, n: int = 64, payload_bytes: int = 1024) -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload bytes are
    a seeded function of media_id."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.repeat(
            F.unhex(F.substring(F.md5(F.col("id").cast("string")), 1, 16)),
            payload_bytes // 8,
        ).cast("binary").alias("payload"),
        F.lit("image/fake").alias("mime"),
        (F.col("id") % 640 + 32).cast("int").alias("width"),
        (F.col("id") % 480 + 32).cast("int").alias("height"),
    )
    return df


def _decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """STUB decode kernel. A real implementation would be e.g.:

        from PIL import Image; import io
        imgs = [Image.open(io.BytesIO(b)) for b in payloads]

    Here: a deterministic fake 'feature' (first 8 payload bytes, scaled) so
    the full pipeline — batching, schema, shapes — runs and is testable.
    Raise NotImplementedError instead if silent fakes are unacceptable.
    """
    feats = []
    ok = []
    for b in payloads:
        if b is None or len(b) < 8:
            feats.append(None)
            ok.append(False)
        else:
            feats.append([float(x) / 255.0 for x in b[:8]])
            ok.append(True)
    return pd.DataFrame({"feature": feats, "decode_ok": ok})


def extract_features(
    media: DataFrame,
    target_partition_mb: int = 128,
    avg_payload_kb: int = 256,
    n_rows: int | None = None,
    set_arrow_batch: bool = True,
) -> DataFrame:
    """Decode + featurize via Arrow-batched mapInPandas.

    Byte-aware sizing happens at two levels:
    - Arrow batch size: rows_per_batch ≈ target_partition_mb·1024 /
      avg_payload_kb, so a 4 MB-per-image corpus gets small Arrow batches
      and a thumbnail corpus gets big ones. Spark has no per-plan knob:
      with ``set_arrow_batch=True`` (default) the SESSION conf is set here
      and stays; to keep the session untouched, pass
      ``set_arrow_batch=False`` and wrap the consuming action in
      ``arrow_batch_size(spark, rows)`` — the conf is read at action time.
    - Partition count: when the caller supplies ``n_rows`` (a count is an
      action, so we don't trigger one implicitly), partitions are sized to
      hold ≈ rows_per_batch rows each; otherwise default parallelism.
    """
    rows_per_part = max(64, (target_partition_mb * 1024) // max(1, avg_payload_kb))

    # The whole kernel is defined INSIDE this function so cloudpickle
    # serializes it by value: executors never need this package on their
    # PYTHONPATH (a module-level reference would pickle as an import and
    # fail on workers without the repo installed).
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def decode(payloads):
            feats, ok = [], []
            for b in payloads:
                if b is None or len(b) < 8:
                    feats.append(None)
                    ok.append(False)
                else:
                    feats.append([float(x) / 255.0 for x in b[:8]])
                    ok.append(True)
            return _pd.DataFrame({"feature": feats, "decode_ok": ok})

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


def frame_sample_plan(video: DataFrame, every_n_frames: int = 30) -> DataFrame:
    """Frame-sampling STUB: emits (media_id, frame_idx) rows for frames a
    real decoder would extract — the plan-level shape (explode of a
    sequence bounded by metadata, no payload touched) is the real part."""
    n_frames = (F.col("width") * 0 + 300).alias("n_frames")  # stub: fixed count
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n_frames))
        ).alias("frame_idx"),
    )
