"""Multimodal plumbing + Structured Streaming tests."""

import pytest
from pyspark.sql import functions as F

from bigdata_lab02_spark.operators import multimodal as mm
from bigdata_lab02_spark.streaming import (
    hourly_counts_stream,
    run_stream_to_memory,
    sessionized_stream,
)
from bigdata_lab02_spark.streaming.events import read_event_stream
from tests.conftest import TESTDATA


def test_multimodal_feature_extraction(spark):
    """Real byte-level PNG decode on the executors: features carry the true
    decoded dimensions (cross-checked against the metadata columns), a mean
    intensity in [0,1], and a normalized 8-bin histogram."""
    media = mm.synthetic_media(spark, n=32, payload_bytes=256)
    meta = {r["media_id"]: (r["width"], r["height"]) for r in media.collect()}
    feats = mm.extract_features(media).collect()
    assert len(feats) == 32
    ok = [r for r in feats if r["decode_ok"]]
    assert len(ok) == 32
    assert all(r["feat_dim"] == mm.FEAT_DIM for r in ok)
    for r in ok:
        w, h = meta[r["media_id"]]
        assert (r["feature"][0], r["feature"][1], r["feature"][2]) == (w, h, 3.0)
        assert 0.0 <= r["feature"][3] <= 1.0  # mean intensity
        assert abs(sum(r["feature"][4:]) - 1.0) < 1e-5  # histogram sums to 1
    # deterministic: same media_id → same feature
    again = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in feats)


def test_multimodal_handles_bad_payloads(spark):
    """Null and undecodable (non-PNG) payloads take the decode_ok=False
    path; valid PNGs alongside them still decode."""
    media = mm.synthetic_media(spark, n=4).withColumn(
        "payload",
        F.when(F.col("media_id") == 0, None)
        .when(F.col("media_id") == 1, F.lit(b"not a png at all"))
        .otherwise(F.col("payload")),
    )
    rows = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert rows[0]["decode_ok"] is False and rows[0]["feat_dim"] == 0
    assert rows[1]["decode_ok"] is False and rows[1]["feat_dim"] == 0
    assert rows[2]["decode_ok"] is True and rows[3]["decode_ok"] is True


def test_arrow_batch_size_scoped(spark):
    """arrow_batch_size restores the prior session conf on exit; opting out
    of set_arrow_batch leaves the session conf untouched."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    spark.conf.set(key, "7777")
    media = mm.synthetic_media(spark, n=8)
    feats = mm.extract_features(media, set_arrow_batch=False)
    with mm.arrow_batch_size(spark, 128):
        assert spark.conf.get(key) == "128"
        assert len(feats.collect()) == 8
    assert spark.conf.get(key) == "7777"


def test_audio_stats_extraction(spark):
    """Real byte-level WAV decode on the executors: exact integer stats of
    the generated PCM stream, cross-checked against a driver-side
    recomputation from the same generator."""
    from bigdata_lab02_spark.operators.multimodal import _audio_samples

    audio = mm.synthetic_audio(spark, n=8)
    rows = {r["media_id"]: r for r in mm.extract_audio_stats(audio).collect()}
    assert len(rows) == 8
    for mid, r in rows.items():
        assert r["decode_ok"] is True
        assert (r["sample_rate"], r["channels"]) == (mm.AUDIO_SAMPLE_RATE, 1)
        samples = _audio_samples(mid, 256 + (mid % 7) * 32)
        assert r["n_samples"] == len(samples)
        assert r["sumsq"] == sum(s * s for s in samples)
        assert r["peak"] == max(abs(s) for s in samples)


def test_audio_bad_payload(spark):
    audio = mm.synthetic_audio(spark, n=2).withColumn(
        "payload", F.when(F.col("media_id") == 0, F.lit(b"not wav")).otherwise(F.col("payload"))
    )
    rows = {r["media_id"]: r for r in mm.extract_audio_stats(audio).collect()}
    assert rows[0]["decode_ok"] is False and rows[0]["sumsq"] is None
    assert rows[1]["decode_ok"] is True


def test_sample_frames_real_parse(spark):
    # id 0: 8x6 C420, 4 frames → sampled 0, 2; stats must equal a local
    # recompute from the generator formula
    video = mm.synthetic_video(spark, n=2)
    rows = [r for r in mm.sample_frames(video, every_n_frames=2).collect()
            if r["media_id"] == 0]
    assert [(r["frame_idx"], r["decode_ok"]) for r in rows] == [(0, True), (2, True)]
    luma, chroma = 8 * 6, 4 * 3
    for r in rows:
        f = r["frame_idx"]
        assert r["y_sum"] == sum((0 * 31 + f * 17 + p * 7) % 256 for p in range(luma))
        assert r["u_sum"] == sum((0 * 13 + f * 29 + p * 5) % 256 for p in range(chroma))
        assert r["v_sum"] == sum((0 * 11 + f * 23 + p * 3) % 256 for p in range(chroma))


def test_sample_frames_corrupt_stripe(spark):
    # id 3 is the corrupt stripe (payload truncated mid-frame): one honest
    # decode_ok=false row, null stats
    video = mm.synthetic_video(spark, n=4)
    rows = {r["media_id"]: r for r in
            mm.sample_frames(video, every_n_frames=2).collect()
            if not r["decode_ok"]}
    assert set(rows) == {3}
    assert rows[3]["y_sum"] is None and rows[3]["frame_idx"] is None


def test_mixed_profile_decode(spark):
    # gray/RGB/RGBA/palette/palette+tRNS/interlaced stripes decode with
    # the right channel count; both corrupt stripes (malformed IHDR,
    # truncated interlaced stream) take the honest-failure path
    media = mm.synthetic_media_mixed(spark, n=8)
    rows = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    chans = {0: 1, 1: 3, 2: 4, 4: 3, 5: 4, 6: 3}
    for mid, r in rows.items():
        if mid % 8 in (3, 7):
            assert r["decode_ok"] is False and r["feature"] is None
        else:
            assert r["decode_ok"] is True
            assert int(r["feature"][2]) == chans[mid % 8]


def test_resize_images_exact_box_filter(spark):
    """resize_images halves synthetic PNGs with exact integer box-filter
    math: every output pixel recomputed from the generator formula
    (pixel = (id*37 + x*3 + y*11 + c*53) % 256, PNG is lossless), the
    resized payload decodes back to the same bytes, and corrupt inputs
    keep the honest-failure path."""
    import numpy as np

    from bigdata_lab02_spark.operators.multimodal import (
        _media_dims,
        resize_images,
        synthetic_media_mixed,
    )
    from bigdata_lab02_spark.operators.png import decode_png

    media = synthetic_media_mixed(spark, n=8, payload_bytes=1024)
    rows = {r["media_id"]: r for r in resize_images(media, factor=2).collect()}
    assert len(rows) == 8
    chans = {0: 1, 1: 3, 2: 4, 4: 3, 5: 4, 6: 3}
    for mid, r in rows.items():
        if mid % 8 in (3, 7):
            assert r["decode_ok"] is False and r["payload"] is None
            continue
        w, h = _media_dims(mid, 1024)
        ch = chans[mid % 8]
        ow, oh = w // 2, h // 2
        assert (r["width"], r["height"], r["channels"]) == (ow, oh, ch)

        # recompute the exact box filter from the per-stripe generator
        def val(x, y, c):
            if mid % 8 in (4, 5):  # palette stripes
                idx = (mid * 37 + x * 3 + y * 11) % 16
                if c == 3:
                    return (11 * idx + 40) % 256
                return ((7, 13, 29)[c] * idx) % 256
            return (mid * 37 + x * 3 + y * 11 + c * 53) % 256

        src = np.array(
            [
                [[val(x, y, c) for c in range(ch)] for x in range(w)]
                for y in range(h)
            ],
            dtype=np.float64,
        )
        want = np.floor(
            src[: oh * 2, : ow * 2]
            .reshape(oh, 2, ow, 2, ch)
            .mean(axis=(1, 3))
            + (0.5 + 1e-9)
        ).astype(int)
        dw, dh, dch, px = decode_png(bytes(r["payload"]))
        assert (dw, dh, dch) == (ow, oh, ch)
        got = np.frombuffer(px, dtype=np.uint8).reshape(oh, ow, ch).astype(int)
        assert (got == want).all(), mid
        assert r["total_intensity"] == int(want.sum())
    # factor validation is driver-side
    with pytest.raises(ValueError):
        resize_images(media, factor=0)


@pytest.fixture(scope="module")
def event_stream(spark, tmp_path_factory):
    # file-stream sources watch a DIRECTORY of arriving files
    d = tmp_path_factory.mktemp("events_stream")
    import shutil

    shutil.copy(f"{TESTDATA}/sf0.001/events.parquet", d / "part-0.parquet")
    return read_event_stream(spark, str(d))


def test_streaming_hourly_matches_batch(spark, event_stream):
    out = run_stream_to_memory(
        spark, hourly_counts_stream(event_stream), "hourly_t", mode="append"
    )
    import __spark_entry__ as e

    # q_events_hourly left the registry in round 5 (its SQL is
    # stream_hourly's oracle verbatim) but stays callable as the batch twin
    batch = e.q_events_hourly(spark, f"{TESTDATA}/sf0.001")
    got = {
        (r["bucket"], r["event_type"]): r["n"] for r in out.collect()
    }
    want = {
        (r["bucket"], r["event_type"]): r["n"] for r in batch.collect()
    }
    # watermark may hold back the final (incomplete) windows in append mode;
    # every emitted window must match the batch result exactly
    assert got
    for k, v in got.items():
        assert want.get(k) == v, (k, v, want.get(k))


def test_session_window_gap_boundary_inclusive(spark):
    """Pin the session_window boundary semantics the stream_sessions gate
    relies on: an event landing EXACTLY gap seconds after the previous one
    merges into the same session (inclusive boundary — matching the batch
    oracle's `gap > 1800 => new session` rule), while gap+1 splits. The
    sf fixtures contain no exact-1800s gaps, so without this test a
    boundary-semantics change in Spark would go undetected."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),  # session A
            (1, "2024-01-01 00:30:00"),  # exactly 1800s later -> merges
            (1, "2024-01-01 01:00:01"),  # 1801s later -> new session
        ],
        "user_id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = sorted(
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("string").alias("start"), "n")
        .collect()
    )
    assert [(r["start"], r["n"]) for r in rows] == [
        ("2024-01-01 00:00:00", 2),
        ("2024-01-01 01:00:01", 1),
    ]


def test_streaming_sessionization_runs(spark, event_stream):
    out = run_stream_to_memory(
        spark, sessionized_stream(event_stream), "sess_t", mode="append"
    )
    rows = out.collect()
    assert rows  # emitted at least the closed sessions
    assert all(r["session_end"] >= r["session_start"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)


@pytest.fixture(scope="module")
def replayed_stream_dir(tmp_path_factory):
    """Two copies of the same events file — two micro-batches where the
    second is a full replay (at-least-once delivery)."""
    d = tmp_path_factory.mktemp("events_replay")
    import shutil

    shutil.copy(f"{TESTDATA}/sf0.001/events.parquet", d / "part-0.parquet")
    shutil.copy(f"{TESTDATA}/sf0.001/events.parquet", d / "part-1.parquet")
    return str(d)


def test_streaming_dedup_idempotent_ingestion(spark, replayed_stream_dir):
    """A full replay micro-batch must not re-emit any event: every replayed
    row is either deduplicated (state hit) or dropped as late — output
    event_ids stay unique and cover exactly the distinct input."""
    from bigdata_lab02_spark.streaming.events import dedup_stream

    stream = read_event_stream(spark, replayed_stream_dir)
    out = run_stream_to_memory(
        spark, dedup_stream(stream), "dedup_t", mode="append"
    )
    ids = [r["event_id"] for r in out.select("event_id").collect()]
    assert len(ids) == len(set(ids)), "replay re-emitted an event"
    distinct_input = (
        spark.read.parquet(f"{TESTDATA}/sf0.001/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert len(ids) == distinct_input


def test_stateful_totals_negative_values(spark, tmp_path_factory):
    """Sign-aware cents rounding: a negative adjustment at an exact
    half-cent (binary-representable, e.g. -0.125) must round AWAY from
    zero like the batch DECIMAL(18,2) HALF_UP cast → -0.13. The naive
    floor(x·100+0.5) rounds it toward +inf (-0.12) and drifts from the
    batch twin."""
    from pyspark.sql import functions as F

    from bigdata_lab02_spark.streaming.events import (
        running_user_totals_stream,
    )

    d = tmp_path_factory.mktemp("events_neg")
    rows = [
        (1, 10**18, 1, "adj", -0.125, "{}"),
        (2, 10**18 + 10**9, 1, "adj", -2.375, "{}"),
        (3, 10**18 + 2 * 10**9, 1, "buy", 1.125, "{}"),
        (4, 10**18 + 3 * 10**9, 2, "adj", -10.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(str(d / "in"))
    stream = read_event_stream(spark, str(d / "in"))
    out = run_stream_to_memory(
        spark,
        running_user_totals_stream(stream, watermark="10000 hours"),
        "totals_neg_t",
        mode="update",
    )
    final = {}
    for r in out.collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    batch = df.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("t"),
    )
    want = {r["user_id"]: (r["n"], r["t"]) for r in batch.collect()}
    assert final == want
    assert want[1] == (3, -1.38)  # -0.13 + -2.38 + 1.13


def test_stateful_running_totals_match_batch(spark, event_stream):
    """applyInPandasWithState running totals: the final emitted row per
    user equals the batch groupBy (count + DECIMAL-exact sum)."""
    from pyspark.sql import functions as F

    from bigdata_lab02_spark.streaming.events import (
        running_user_totals_stream,
    )

    out = run_stream_to_memory(
        spark,
        running_user_totals_stream(event_stream, watermark="10000 hours"),
        "totals_t",
        mode="update",
    )
    # update mode re-emits a key each batch; the final state has the max n
    final = {}
    for r in out.collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = (
        spark.read.parquet(f"{TESTDATA}/sf0.001/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )
    want = {r["user_id"]: (r["n"], r["total"]) for r in batch.collect()}
    assert final == want


def test_stream_stream_selfjoin_matches_batch(spark, event_stream):
    from bigdata_lab02_spark.streaming.events import (
        _with_ts,
        followup_pairs_stream,
    )

    out = run_stream_to_memory(
        spark,
        followup_pairs_stream(event_stream, horizon="2 hours"),
        "pairs_t",
        mode="append",
    )
    got = {(r["a_id"], r["b_id"]) for r in out.collect()}

    ev = _with_ts(spark.read.parquet(f"{TESTDATA}/sf0.001/events.parquet"))
    a = ev.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("a_ts"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("b_ts"),
    )
    batch = (
        a.join(b, "u")
        .where(
            (F.col("a_id") != F.col("b_id"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 2 hours"))
        )
        .select("a_id", "b_id")
    )
    want = {(r["a_id"], r["b_id"]) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_rocksdb_state_store_matches_default(spark, event_stream, tmp_path_factory):
    """The 100 TB state-store choice (RocksDB: off-heap, disk-bounded
    state, incremental snapshots) must be a one-argument swap that
    changes NOTHING about results: replay the stateful
    running-user-totals query under both providers and assert identical
    final tables, and that the session provider conf is restored."""
    from bigdata_lab02_spark.streaming.events import (
        ROCKSDB_PROVIDER,
        running_user_totals_stream,
    )

    pkey = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(pkey, None)

    d2 = tmp_path_factory.mktemp("events_stream_rdb")
    import shutil

    shutil.copy(f"{TESTDATA}/sf0.001/events.parquet", d2 / "part-0.parquet")
    ev2 = read_event_stream(spark, str(d2))

    def final_totals(streaming_df, name, provider):
        out = run_stream_to_memory(
            spark,
            running_user_totals_stream(streaming_df),
            name,
            mode="update",
            state_store_provider=provider,
        )
        # update mode re-emits per batch; single-file replay = one batch
        return {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in out.collect()
        }

    default = final_totals(event_stream, "totals_default_store", None)
    rocks = final_totals(ev2, "totals_rocks_store", ROCKSDB_PROVIDER)
    assert default and rocks == default
    assert spark.conf.get(pkey, None) == before  # conf restored


def test_extract_features_dispatches_jpeg(spark):
    """extract_features' magic-byte dispatch (r6 item 7) must route JPEG
    payloads through the JPEG codec: every decodable synthetic_jpeg row
    yields the standard 12-dim feature vector with the right dims, and
    the corrupt stripes keep the honest-failure path."""
    from bigdata_lab02_spark.operators.multimodal import (
        extract_features,
        synthetic_jpeg,
    )

    rows = {r["media_id"]: r
            for r in extract_features(synthetic_jpeg(spark, n=16)).collect()}
    assert len(rows) == 16
    for mid, r in rows.items():
        if mid % 16 in (3, 7, 11, 15):
            assert r["decode_ok"] is False and r["feature"] is None
            continue
        assert r["decode_ok"] is True and r["feat_dim"] == 12
        if mid % 16 in (1, 5, 9, 13, 14):  # 4:2:0 / 4:2:2 stripes
            w, h = 16 * (1 + mid % 3), 16
        elif mid % 16 == 2:  # non-MCU-multiple dims stripe
            w, h = 8 * (2 + mid % 3) + 6, 8 * (2 + mid % 2) + 4
        else:
            w, h = 8 * (2 + mid % 3), 8 * (2 + mid % 2)
        assert (int(r["feature"][0]), int(r["feature"][1])) == (w, h)
        assert int(r["feature"][2]) == 3  # decode always yields RGB


def test_vectorized_features_match_reference():
    """The numpy feature kernel must be bit-identical to the pure-stdlib
    reference implementation (png.features_from_pixels) — same integer
    bin counts and the same float divisions."""
    import numpy as np

    from bigdata_lab02_spark.operators.multimodal import _features_np
    from bigdata_lab02_spark.operators.png import features_from_pixels

    rng = np.random.default_rng(3)
    for n, ch in ((0, 1), (1, 1), (97, 3), (4096, 4)):
        px = bytes(rng.integers(0, 256, n * ch, dtype=np.uint8))
        assert _features_np(n or 1, 1, ch, px) == features_from_pixels(
            n or 1, 1, ch, px
        )
    # boundary bytes land in the same bins (b*8//256 == b >> 5)
    edge = bytes([0, 31, 32, 63, 64, 127, 128, 255])
    assert _features_np(8, 1, 1, edge) == features_from_pixels(8, 1, 1, edge)


class TestStreamingDedupCandidates:
    """r8: stateless streaming LSH candidates vs the static corpus band
    table (streaming/docs.py) — the streaming face of incremental dedup."""

    def test_matches_batch_candidate_set(self, spark, tmp_path):
        from bigdata_lab02_spark.operators import dedup as dd
        from bigdata_lab02_spark.streaming import run_stream_to_memory
        from bigdata_lab02_spark.streaming.docs import (
            dedup_candidates_stream,
            minhash_band_stream,
            read_doc_stream,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        new = docs.where(F.col("doc_id") % 4 == 0)
        corpus = docs.where(F.col("doc_id") % 4 != 0)
        corpus_bands = dd.minhash_band_table(
            dd.minhash_signatures(corpus), bands=4, rows_per_band=2
        )
        # the per-row streaming band formulation equals the batch
        # explode+groupBy one bit-for-bit on the same docs
        a = sorted(map(tuple, minhash_band_stream(new).collect()))
        b = sorted(map(tuple, dd.minhash_band_table(
            dd.minhash_signatures(new), bands=4, rows_per_band=2
        ).collect()))
        assert a == b
        # full streaming replay: candidate SET equals the batch join
        src = str(tmp_path / "docs_stream")
        new.coalesce(2).write.mode("overwrite").parquet(src)
        out = run_stream_to_memory(
            spark,
            dedup_candidates_stream(read_doc_stream(spark, src), corpus_bands),
            "t_stream_dedup_cands",
            mode="append",
        )
        got = {tuple(r) for r in out.collect()}
        want = {
            (r["id_new"], r["id_old"])
            for r in minhash_band_stream(new)
            .withColumnsRenamed({"doc_id": "id_new"})
            .join(
                corpus_bands.withColumnsRenamed({"doc_id": "id_old"}),
                "band_hash",
            )
            .where(F.col("id_new") != F.col("id_old"))
            .select("id_new", "id_old")
            .collect()
        }
        assert got == want and got


class TestMediaMetadata:
    """r9: header-only routing pass — no entropy decode."""

    def test_mixed_corpus_metadata(self, spark):
        from bigdata_lab02_spark.operators.multimodal import (
            extract_media_metadata,
            synthetic_jpeg,
            synthetic_media_mixed,
        )

        rows = {
            r["media_id"]: r
            for r in extract_media_metadata(synthetic_jpeg(spark, 12)).collect()
        }
        assert rows and all(r["format"] == "jpeg" for r in rows.values())
        oks = [r for r in rows.values() if r["meta_ok"]]
        assert oks and all(
            r["precision"] == 8 and r["has_exif"] is False for r in oks
        )
        # mixed PNG corpus: dims come straight from IHDR
        mixed = {
            r["media_id"]: r
            for r in extract_media_metadata(
                synthetic_media_mixed(spark, 12)
            ).collect()
        }
        # the header pass reports what the header SAYS (a corrupt stripe
        # may carry legal IHDR fields) — routing, not validation
        ok_png = [r for r in mixed.values() if r["format"] == "png" and r["meta_ok"]]
        assert ok_png and all(
            r["width"] is not None and r["height"] is not None for r in ok_png
        )

    def test_exif_and_degenerate_payloads(self, spark):
        from pathlib import Path

        from bigdata_lab02_spark.operators.multimodal import (
            extract_media_metadata,
        )

        fix = Path(__file__).resolve().parent / "fixtures" / "foreign"
        exif = (fix / "imageio_exif.jpg").read_bytes()
        df = spark.createDataFrame(
            [(1, bytearray(exif)), (2, bytearray(b"\xff\xd8\xff\xd9")),
             (3, bytearray(b"not an image"))],
            "media_id long, payload binary",
        )
        rows = {r["media_id"]: r for r in extract_media_metadata(df).collect()}
        assert rows[1]["has_exif"] is True
        assert rows[1]["exif_orientation"] == 1
        assert rows[1]["n_app_segments"] >= 3
        assert rows[2]["format"] == "jpeg" and rows[2]["meta_ok"] is False
        assert rows[3]["format"] is None and rows[3]["meta_ok"] is False


def test_orient_np_against_brute_force():
    """r11: the 8 EXIF orientation views vs an independent per-pixel
    reference (output[y][x] looked up by the TIFF 6.0 / EXIF 2.3
    display mapping) on an asymmetric image."""
    import numpy as np

    from bigdata_lab02_spark.operators.multimodal import _orient_np

    h, w = 3, 5
    a = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)

    def ref(o):
        if o in (1, 2, 3, 4):
            out = np.zeros((h, w, 3), np.uint8)
        else:
            out = np.zeros((w, h, 3), np.uint8)
        for y in range(h):
            for x in range(w):
                src = a[y, x]
                if o == 1:
                    out[y, x] = src
                elif o == 2:
                    out[y, w - 1 - x] = src
                elif o == 3:
                    out[h - 1 - y, w - 1 - x] = src
                elif o == 4:
                    out[h - 1 - y, x] = src
                elif o == 5:   # transpose
                    out[x, y] = src
                elif o == 6:   # rotate 90 CW: top row <- left column
                    out[x, h - 1 - y] = src
                elif o == 7:   # transverse
                    out[w - 1 - x, h - 1 - y] = src
                elif o == 8:   # rotate 90 CCW
                    out[w - 1 - x, y] = src
        return out

    for o in range(1, 9):
        got = np.ascontiguousarray(_orient_np(a, o))
        assert np.array_equal(got, ref(o)), o


def test_apply_orientation_end_to_end(spark):
    """apply_orientation on real JPEG payloads with spliced EXIF: dims
    swap on tags 5-8, totals are invariant, the row0/col0 sums move to
    the mapped edges, the re-encoded PNG holds the TRANSFORMED pixels,
    no-EXIF payloads default to tag 1, and corrupt payloads keep the
    header-scanned orientation with decode_ok=false."""
    from pyspark.sql import functions as F

    from bigdata_lab02_spark.operators.multimodal import (
        apply_orientation,
        splice_exif,
        synthetic_jpeg,
    )
    from bigdata_lab02_spark.operators.png import decode_png

    media = synthetic_jpeg(spark, 16).where(
        F.col("media_id").isin(0, 1, 7)  # 4:4:4, 4:2:0, RST-corrupt
    )
    media = media.withColumn(
        "exif_orientation_in",
        F.when(F.col("media_id") == 0, 6)        # rotate 90 CW
        .when(F.col("media_id") == 7, 3),        # corrupt + tag
    )
    oriented = {
        r["media_id"]: r
        for r in apply_orientation(
            splice_exif(media).drop("exif_orientation_in")
        ).collect()
    }
    base = {
        r["media_id"]: r
        for r in apply_orientation(
            media.drop("exif_orientation_in")
        ).collect()
    }
    # tag 6 swaps dims, keeps totals, moves edges: row0 of the rotated
    # image is the input's left column, col0 its bottom row
    b0, o0 = base[0], oriented[0]
    assert o0["orientation"] == 6 and b0["orientation"] == 1
    assert (o0["width"], o0["height"]) == (b0["height"], b0["width"])
    assert o0["sum_r"] == b0["sum_r"] and o0["sum_b"] == b0["sum_b"]
    assert o0["row0_sum_r"] == b0["col0_sum_r"]
    # the payload really holds the transformed pixels (PNG round trip)
    w, h, ch, px = decode_png(bytes(o0["payload"]))
    import numpy as np

    t = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
    assert int(t[0, :, 0].sum()) == o0["row0_sum_r"]
    assert int(t[:, 0, 2].sum()) == o0["col0_sum_b"]
    # no EXIF -> default 1, identity
    assert base[1]["orientation"] == 1
    assert oriented[1]["orientation"] == 1
    assert oriented[1]["row0_sum_r"] == base[1]["row0_sum_r"]
    # corrupt: header-scanned tag reported, decode honestly fails
    assert oriented[7]["orientation"] == 3
    assert not oriented[7]["decode_ok"]
    assert oriented[7]["sum_r"] is None and oriented[7]["width"] is None


def test_orientation_then_resize_composition(spark):
    """The production image-tier order: normalize orientation FIRST,
    then resize — apply_orientation's lossless PNG payload feeds
    resize_images' format dispatch, and the resized dims reflect the
    post-transform (swapped) geometry."""
    from pyspark.sql import functions as F

    from bigdata_lab02_spark.operators.multimodal import (
        apply_orientation,
        resize_images,
        splice_exif,
        synthetic_jpeg,
    )

    # media_id 16 is the 4:4:4 stripe at 24x16 — non-square, so the
    # tag-6 width/height swap is visible through the whole chain
    media = synthetic_jpeg(spark, 32).where(F.col("media_id") == 16)
    media = media.withColumn("exif_orientation_in", F.lit(6))  # 90° CW
    upright = apply_orientation(
        splice_exif(media).drop("exif_orientation_in")
    ).select("media_id", "payload", "width", "height")
    base = upright.collect()[0]
    assert (base["width"], base["height"]) == (16, 24)  # swapped 24x16
    resized = resize_images(upright, factor=2).collect()[0]
    assert resized["decode_ok"] and resized["src_format"] == "png"
    assert (resized["width"], resized["height"]) == (8, 12)
    assert resized["payload"] is not None


def test_image_dhash_fixture_closed_form(spark):
    """r12: image_dhash over the deterministic dHash corpus must equal
    the generator's bit pattern exactly; within each seed group
    variants 0/3 collide at Hamming 0, variant 1 sits at Hamming 2,
    variant 2 at Hamming ≥ 4 from every groupmate; the corrupt stripe
    is decode_ok=false with a NULL hash."""
    from bigdata_lab02_spark.operators.multimodal import (
        _dhash_fixture_bit,
        image_dhash,
        synthetic_dhash_images,
    )

    out = {
        r["media_id"]: r
        for r in image_dhash(synthetic_dhash_images(spark, 16)).collect()
    }
    assert len(out) == 18
    for mid in range(16):
        expect = 0
        for r in range(8):
            for c in range(8):
                if _dhash_fixture_bit(mid // 4, mid % 4, r, c):
                    expect |= 1 << (r * 8 + c)
        row = out[mid]
        assert row["dhash"] == expect, mid
        assert (row["width"], row["height"]) == (36, 32)
        assert row["decode_ok"] and row["orientation"] == 1
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    for seed in range(4):
        h = [out[seed * 4 + v]["dhash"] for v in range(4)]
        assert h[0] == h[3]
        assert ham(h[0], h[1]) == 2
        assert ham(h[0], h[2]) == 5 and ham(h[1], h[2]) == 7
    for mid in (16, 17):
        assert not out[mid]["decode_ok"] and out[mid]["dhash"] is None


def test_image_dhash_rotated_copies_collide(spark):
    """r12 (VERDICT r11 item 4's composition): an image stored
    sideways-with-EXIF-tag (the camera layout) and the same image
    stored upright must produce the SAME dHash once the kernel
    orientation-normalizes — block-constant grayscale JPEGs make the
    decode exact, so collision is equality, not approximation. With
    orient=False the sideways copy hashes differently (the miss
    orientation normalization exists to prevent)."""
    import numpy as np

    from bigdata_lab02_spark.operators.jpeg import encode_jpeg
    from bigdata_lab02_spark.operators.multimodal import (
        _dhash_fixture_bit,
        _orient_np,
        exif_app1_segment,
        image_dhash,
    )

    # base: 72x64 gray, 8x8-constant blocks walking the fixture pattern
    v = np.zeros((8, 9), dtype=np.int64)
    v[:, 0] = 128
    for r in range(8):
        for c in range(8):
            v[r, c + 1] = v[r, c] + (-10 if _dhash_fixture_bit(0, 0, r, c) else 10)
    base = np.repeat(np.repeat(v.astype(np.uint8), 8, axis=0), 8, axis=1)
    base3 = np.stack([base] * 3, axis=2)  # r=g=b -> exact gray luma
    base_jpeg = encode_jpeg(72, 64, base3.tobytes(), subsampling="gray")
    # sideways copy for tag 6: stored pixels s with _orient_np(s, 6) == base
    stored = np.ascontiguousarray(base3[:, ::-1].transpose(1, 0, 2))
    assert np.array_equal(_orient_np(stored, 6), base3)
    side_jpeg = encode_jpeg(64, 72, stored.tobytes(), subsampling="gray")
    side_jpeg = side_jpeg[:2] + exif_app1_segment(6) + side_jpeg[2:]
    media = spark.createDataFrame(
        [(0, bytearray(base_jpeg)), (1, bytearray(side_jpeg))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in image_dhash(media).collect()}
    assert out[0]["decode_ok"] and out[1]["decode_ok"]
    assert out[1]["orientation"] == 6
    assert (out[1]["width"], out[1]["height"]) == (72, 64)  # post-orient
    assert out[0]["dhash"] == out[1]["dhash"]  # rotated copies collide
    raw = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(media, orient=False).collect()
    }
    assert raw[0] != raw[1]  # without normalization they would not


def test_audio_fingerprint_fixture_closed_form(spark):
    """r13: audio_fingerprint over the deterministic fingerprint corpus
    must equal the generator's bit pattern exactly (the SAME
    _dhash_fixture_bit pattern the image fixture pins — the oracle
    chain is shared); within each seed group variants 0/3 collide at
    Hamming 0 (variant 3 is an amplitude-DOUBLED re-level, so the
    collision is invariance, not byte equality), variant 1 sits at
    Hamming 2, variant 2 past the threshold; the corrupt stripe is
    decode_ok=false with a NULL print."""
    from bigdata_lab02_spark.operators.multimodal import (
        _dhash_fixture_bit,
        audio_fingerprint,
        synthetic_fp_audio,
    )

    out = {
        r["media_id"]: r
        for r in audio_fingerprint(synthetic_fp_audio(spark, 16)).collect()
    }
    assert len(out) == 18
    for mid in range(16):
        expect = 0
        for r in range(8):
            for c in range(8):
                if _dhash_fixture_bit(mid // 4, mid % 4, r, c):
                    expect |= 1 << (r * 8 + c)
        row = out[mid]
        assert row["afp"] == expect, mid
        assert row["decode_ok"] and row["sample_rate"] == 8000
        assert row["n_samples"] == 72 * 16
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    for seed in range(4):
        h = [out[seed * 4 + v]["afp"] for v in range(4)]
        assert h[0] == h[3]
        assert ham(h[0], h[1]) == 2
        assert ham(h[0], h[2]) == 5 and ham(h[1], h[2]) == 7
    for mid in (16, 17):
        assert not out[mid]["decode_ok"] and out[mid]["afp"] is None


def test_audio_fingerprint_amplitude_scaled_copies_collide(spark):
    """r13 (the audio analog of the rotated-image collision test): the
    SAME clip re-levelled — every sample scaled by a gain, including a
    LOSSY integer halving — must produce the SAME block-energy print
    (energies scale by g², every comparison is preserved), while a
    genuinely different clip does not collide. Also pins the honest
    NULL for streams too short to fingerprint."""
    from bigdata_lab02_spark.operators.multimodal import (
        _afp_np,
        audio_fingerprint,
    )
    from bigdata_lab02_spark.operators.wav import encode_wav

    # a non-fixture clip: deterministic mix, 72 blocks x 20 samples
    base = [((i * 2654435761 + 7919) % 4001) - 2000 for i in range(1440)]
    doubled = [s * 2 for s in base]
    halved = [s // 2 for s in base]  # lossy integer re-level
    other = [((i * 48271 + 11) % 4001) - 2000 for i in range(1440)]
    media = spark.createDataFrame(
        [
            (0, bytearray(encode_wav(base))),
            (1, bytearray(encode_wav(doubled))),
            (2, bytearray(encode_wav(halved))),
            (3, bytearray(encode_wav(other))),
            (4, bytearray(encode_wav(base[:50]))),  # < 72 blocks
        ],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in audio_fingerprint(media).collect()}
    assert out[0]["afp"] == _afp_np(base)  # kernel == driver twin
    assert out[1]["afp"] == out[0]["afp"]  # exact gain
    assert out[2]["afp"] == out[0]["afp"]  # lossy halving survives
    assert out[3]["afp"] != out[0]["afp"]  # different content differs
    assert out[4]["decode_ok"] and out[4]["afp"] is None  # too short


def test_video_frame_hashes_and_dup_fixture(spark):
    """r13: per-frame luma dHashes over the video-dedup corpus must
    equal the generator's closed-form bit pattern; the trimmed copy's
    hash set is an 8-of-10 subset of the base, the re-encoded (dithered)
    copy's set is IDENTICAL despite every byte differing, distinct
    footage shares at most the engineered single mod-97 frame; corrupt
    payloads surface as one decode_ok=false row."""
    from bigdata_lab02_spark.operators.multimodal import (
        _vhash_fixture_bit,
        synthetic_dup_videos,
        video_frame_hashes,
    )

    rows = video_frame_hashes(synthetic_dup_videos(spark, 8)).collect()
    byid = {}
    for r in rows:
        byid.setdefault(r["media_id"], []).append(r)

    def expect(fseed):
        v = 0
        for r in range(8):
            for c in range(8):
                if _vhash_fixture_bit(fseed, r, c):
                    v |= 1 << (r * 8 + c)
        return v

    for seed in range(2):
        base = byid[seed * 4]
        assert sorted(r["frame_idx"] for r in base) == list(range(10))
        assert all(r["n_frames"] == 10 and r["decode_ok"] for r in base)
        for r in base:
            assert r["fhash"] == expect(seed * 10 + r["frame_idx"])
        s0 = {r["fhash"] for r in base}
        s1 = {r["fhash"] for r in byid[seed * 4 + 1]}
        s2 = {r["fhash"] for r in byid[seed * 4 + 2]}
        s3 = {r["fhash"] for r in byid[seed * 4 + 3]}
        assert s1 < s0 and len(s1) == 8          # trimmed subset
        assert s2 == s0                           # re-encode collides
        assert len(s3 & s0) <= 1                  # distinct footage
    for mid in (8, 9):
        (row,) = byid[mid]
        assert not row["decode_ok"] and row["fhash"] is None


def test_set_dup_pairs_exact_jaccard(spark):
    """r13: the generic set-similarity kernel — LSH candidates verified
    with exact Jaccard; counts/union/rounded-jaccard contract, NULL
    items ignored, duplicates within a record collapse (set
    semantics)."""
    from bigdata_lab02_spark.operators.dedup import set_dup_pairs

    rows = [
        (1, x) for x in ["a", "b", "c", "d", "a"]  # dup item collapses
    ] + [
        (2, x) for x in ["a", "b", "c", None]      # NULL ignored
    ] + [
        (3, x) for x in ["x", "y", "z", "w"]
    ]
    df = spark.createDataFrame(rows, "doc_id long, item string")
    out = {(r["id_a"], r["id_b"]): r for r in set_dup_pairs(df).collect()}
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert r["n_common"] == 3 and r["n_union"] == 4
    assert r["jaccard"] == 0.75


def test_audio_fingerprint_energy_sums_never_wrap():
    """r13 hardening: block energies of hours-long 24-bit clips exceed
    int64 (peak² · block_len > 2⁶³) — a naive numpy int64 sum WRAPS and
    flips comparison bits silently (verified: the wrapped energy of a
    louder block compares BELOW a quieter one). The kernel's guarded
    Python-int path keeps every comparison exact."""
    import numpy as np

    from bigdata_lab02_spark.operators.multimodal import _afp_np

    peak, quiet = 8388607, 8388607 - 2_000_000
    blk = 140_000  # peak²·blk ≈ 9.9e18 > 2⁶³ — the wrap regime
    # 72 blocks alternating loud/quiet along each 9-block row: the true
    # comparisons alternate; a wrapped loud-block energy goes NEGATIVE
    # and would invert every loud-vs-quiet bit
    rows = []
    for r in range(8):
        for c in range(9):
            v = peak if (c % 2 == 0) else quiet
            rows.append(np.full(blk, v, dtype=np.int64))
    samples = np.concatenate(rows)
    fp = _afp_np(samples)
    expect = 0
    for r in range(8):
        for c in range(8):
            # loud > quiet at even c (E[c] > E[c+1]); quiet < loud at odd
            if c % 2 == 0:
                expect |= 1 << (r * 8 + c)
    assert fp == expect


def test_media_pipeline_routes_identical_sketches_apart(spark):
    """r13: the mixed-media gate's fixtures share the SAME closed-form
    bit pattern, so image k and audio 100+k carry IDENTICAL 64-bit
    sketches — the pipeline's modality routing must keep them apart:
    hashes collide ACROSS modalities in the value space, yet every
    emitted cluster is single-modality and every near-dup group matches
    the per-modality gates' structure."""
    import __spark_entry__ as e

    rows = e.queries()["media_dedup_pipeline"](spark, None).collect()
    assert len(rows) == 68
    byid = {r["media_id"]: r for r in rows}
    # the adversarial premise holds: identical sketches across modality
    for k in range(32):
        assert byid[k]["h64"] == byid[100 + k]["h64"]
        assert byid[k]["modality"] == "image"
        assert byid[100 + k]["modality"] == "audio"
    # ...yet no cluster mixes modalities
    mods = {}
    for r in rows:
        mods.setdefault(r["cluster_id"], set()).add(r["modality"])
    assert all(len(m) == 1 for m in mods.values())
    # and the audio side clusters exactly like the image side, shifted
    for k in range(32):
        assert byid[100 + k]["cluster_id"] == byid[k]["cluster_id"] + 100
        assert byid[100 + k]["keep"] == byid[k]["keep"]
    # corrupt members of both modalities surface honestly
    for mid in (32, 33, 132, 133):
        assert not byid[mid]["decode_ok"] and byid[mid]["h64"] is None
        assert byid[mid]["keep"]  # singleton survivor
