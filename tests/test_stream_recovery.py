"""Streaming checkpoint-recovery gates (VERDICT r6 item 6).

The seven stream_* driver gates replay bounded sources to completion, but
none of them ever STOPPED a query and resumed it from its checkpoint — the
exactly-once contract of the stateful operators was asserted only for
uninterrupted runs. These tests kill and resume:

- ``running_user_totals_stream`` (applyInPandasWithState custom state):
  after resume, per-user totals must equal the batch groupBy twin over ALL
  events. If the (n, cents) state were lost at the stop, post-resume
  emissions would count only second-half events — the equality is
  unfakeable proof the state store round-tripped through the checkpoint.
- ``followup_pairs_stream`` (stream-stream join): pairs whose two sides
  arrive on OPPOSITE sides of the stop can only be emitted if the join's
  buffered state survives the restart; the full multiset of emissions
  across both runs must equal the batch self-join exactly — no misses
  (state lost) and no duplicates (offsets replayed).

Determinism: the source is split into time-ordered parquet files (ascending
ts ranges, ascending mtimes) so the file-stream replays them oldest-first
and the 2-hour watermark never classifies a later file's rows as late. The
"kill" is deterministic — run A sees only the first half of the files,
stops, the second half lands, run B starts from run A's checkpoint.
"""

from __future__ import annotations

import os
import pathlib
import shutil

import pytest
from pyspark.sql import functions as F

from bigdata_lab02_spark.streaming.events import (
    _with_ts,
    followup_pairs_stream,
    read_event_stream,
    running_user_totals_stream,
)

SF = "/root/testdata/sf0.001"
N_FILES = 8
# fixed epoch base for explicit file mtimes (any stable past instant works
# — only the ORDER matters to the file source)
_MTIME_BASE = 1_600_000_000


@pytest.fixture(scope="module")
def split_source(spark, tmp_path_factory):
    """The sf0.001 events split into N_FILES time-ordered parquet files,
    written oldest-range-first so file mtime order == event time order.
    Returns (staging_dir, batch_df)."""
    staging = tmp_path_factory.mktemp("events_split")
    ev = _with_ts(spark.read.parquet(f"{SF}/events.parquet"))
    _stamped: set = set()
    import datetime

    bounds = ev.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo).total_seconds() + 1
    for k in range(N_FILES):
        t0 = lo + datetime.timedelta(seconds=k * span / N_FILES)
        t1 = lo + datetime.timedelta(seconds=(k + 1) * span / N_FILES)
        part = ev.where((F.col("ts") >= F.lit(t0)) & (F.col("ts") < F.lit(t1)))
        part.coalesce(1).write.mode("append").parquet(str(staging))
        # Encode replay order in EXPLICIT whole-second mtimes (os.utime)
        # rather than sleep-spaced write times: on filesystems with 1 s
        # mtime granularity, 0.05 s sleeps collapse to ties and the file
        # stream could replay out of event-time order, breaking the
        # watermark assumptions (ADVICE r7).
        for part_file in pathlib.Path(staging).glob("part-*.parquet"):
            if part_file.name not in _stamped:
                os.utime(part_file, (_MTIME_BASE + k, _MTIME_BASE + k))
                _stamped.add(part_file.name)
    return str(staging), ev


def _files_in_order(staging: str) -> list[pathlib.Path]:
    return sorted(
        pathlib.Path(staging).glob("part-*.parquet"), key=lambda p: p.stat().st_mtime
    )


def _kill_resume_run(spark, tmp_path, staging, build_query, name, mode,
                     provider=None):
    """Copy the first half of the files into a fresh source dir, run the
    query to completion with a checkpoint and stop it; land the second
    half; resume from the same checkpoint. Returns (emissions_a,
    emissions_b) as lists of (batch_id, rows)."""
    src = tmp_path / f"{name}_src"
    ckpt = tmp_path / f"{name}_ckpt"
    src.mkdir()
    files = _files_in_order(staging)
    assert len(files) == N_FILES
    for i, f in enumerate(files[: N_FILES // 2]):
        shutil.copy(f, src / f.name)
        # explicit whole-second mtimes: granularity-proof replay order
        os.utime(src / f.name, (_MTIME_BASE + i, _MTIME_BASE + i))

    key = "spark.sql.shuffle.partitions"
    pkey = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key)
    saved_provider = spark.conf.get(pkey, None)
    spark.conf.set(key, "4")
    if provider:
        spark.conf.set(pkey, provider)
    try:

        def run():
            emissions = []

            def sink(df, bid):
                emissions.append((bid, df.collect()))

            q = (
                build_query(read_event_stream(spark, str(src)))
                .writeStream.outputMode(mode)
                .option("checkpointLocation", str(ckpt))
                .foreachBatch(sink)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            return emissions

        run_a = run()
        # the "crash": query stopped; more data lands while it's down
        for i, f in enumerate(files[N_FILES // 2 :]):
            shutil.copy(f, src / f.name)
            os.utime(src / f.name,
                     (_MTIME_BASE + N_FILES + i, _MTIME_BASE + N_FILES + i))
        run_b = run()
    finally:
        spark.conf.set(key, saved)
        if provider:
            if saved_provider is None:
                spark.conf.unset(pkey)
            else:
                spark.conf.set(pkey, saved_provider)
    return run_a, run_b


@pytest.mark.parametrize("provider", [
    None,
    pytest.param(
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
        id="rocksdb",
    ),
])
def test_custom_state_survives_kill_resume(spark, tmp_path, split_source,
                                           provider):
    """Parameterized over state-store providers: the checkpoint recovery
    contract must hold identically on the default in-heap store AND on
    RocksDB (the off-heap, disk-bounded store a 100 TB deployment would
    run)."""
    staging, ev = split_source
    run_a, run_b = _kill_resume_run(
        spark, tmp_path, staging, running_user_totals_stream, "totals",
        "update", provider=provider,
    )
    assert run_a and run_b
    # offsets were checkpointed: the resumed run continues the batch
    # sequence, it does not replay run A's batches
    assert min(b for b, _ in run_b) > max(b for b, _ in run_a)

    # last emission per user across the WHOLE interrupted run
    final: dict[int, tuple[int, float]] = {}
    for _, rows in run_a + run_b:
        for r in rows:
            final[r["user_id"]] = (r["n_events"], r["total_value"])

    batch = {
        r["user_id"]: (r["n"], r["tv"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("tv"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for u in batch:
        assert final[u] == batch[u], (
            f"user {u}: stream {final[u]} != batch {batch[u]} — "
            "state lost or double-counted across the restart"
        )


def test_stream_stream_join_state_survives_kill_resume(spark, tmp_path, split_source):
    staging, ev = split_source

    def build(events):
        # 24 h horizon: the sf0.001 fixture has ZERO same-user pairs that
        # straddle the restart boundary within the default 2 h (events are
        # ~1.4/h over 30 days) — a wider horizon makes the checkpointed
        # join state load-bearing (29 straddling pairs) instead of vacuous
        return followup_pairs_stream(events, horizon="24 hours",
                                     watermark="24 hours")

    run_a, run_b = _kill_resume_run(
        spark, tmp_path, staging, build, "pairs", "append"
    )
    emitted = [
        (r["a_id"], r["b_id"], r["user_id"])
        for _, rows in run_a + run_b
        for r in rows
    ]
    # exactly-once: multiset equality (no dedup applied) with the batch twin
    assert len(emitted) == len(set(emitted)), "duplicate pair emissions"

    a = ev.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
    )
    batch_pairs = {
        (r["a_id"], r["b_id"], r["user_id"])
        for r in a.join(
            b,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("a_id") != F.col("b_id"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 24 hours")),
        )
        .select("a_id", "b_id", F.col("a_user").alias("user_id"))
        .collect()
    }
    assert set(emitted) == batch_pairs
    # the load-bearing half: pairs whose sides straddle the restart exist
    # and were only recoverable from checkpointed join state
    first_half_ids = set()
    for f in _files_in_order(staging)[: N_FILES // 2]:
        first_half_ids |= {
            r["event_id"] for r in spark.read.parquet(str(f)).collect()
        }
    straddling = [
        p for p in batch_pairs
        if (p[0] in first_half_ids) != (p[1] in first_half_ids)
    ]
    assert straddling, "fixture produced no cross-restart pairs"
    emitted_b = {
        (r["a_id"], r["b_id"], r["user_id"]) for _, rows in run_b for r in rows
    }
    assert set(straddling) <= emitted_b


def test_windowed_agg_watermark_survives_kill_resume(spark, tmp_path, split_source):
    """Third stateful class: watermarked tumbling-window aggregation in
    append mode. Exactly-once across the restart means (a) no window is
    emitted twice — the restored WATERMARK state is what prevents run B
    from re-finalizing run A's windows — and (b) every emitted window
    equals the batch twin bit-for-bit (DECIMAL-exact sums), including
    windows whose events straddle the restart (their partial aggregates
    lived in the restored state store)."""
    from bigdata_lab02_spark.streaming.events import hourly_counts_stream

    staging, ev = split_source
    run_a, run_b = _kill_resume_run(
        spark, tmp_path, staging, hourly_counts_stream, "hourly", "append"
    )
    emitted = [
        (r["bucket"], r["event_type"], r["n"], r["total_value"])
        for _, rows in run_a + run_b
        for r in rows
    ]
    assert emitted
    keys = [(b, et) for b, et, _, _ in emitted]
    assert len(keys) == len(set(keys)), "window finalized twice across restart"
    a_keys = {(r["bucket"], r["event_type"]) for _, rows in run_a for r in rows}
    b_keys = {(r["bucket"], r["event_type"]) for _, rows in run_b for r in rows}
    assert a_keys and b_keys and not (a_keys & b_keys)

    batch = {
        (r["bucket"], r["event_type"]): (r["n"], r["tv"])
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("tv"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "tv")
        .collect()
    }
    for b, et, n, tv in emitted:
        assert batch[(b, et)] == (n, tv), (b, et)
    # windows whose hour spans the restart boundary must appear (their
    # partial state crossed the checkpoint) — the boundary hour exists
    # because the split cuts mid-timeline, not on an hour edge
    assert len(emitted) > len(a_keys)


def test_stateless_dedup_candidates_survive_kill_resume(spark, tmp_path):
    """r8: exactly-once for the STATELESS streaming shape too — the
    incremental-dedup candidate pipeline (streaming/docs.py) has no
    state store, so its recovery contract rests entirely on checkpoint
    source tracking: after a kill, landing more shards, and a resume
    from the same checkpoint, the union of emissions must equal the
    batch candidate set over ALL docs — nothing lost, nothing
    re-emitted. (Run B must also not replay run A's files.)"""
    from bigdata_lab02_spark.operators import dedup as dd
    from bigdata_lab02_spark.streaming.docs import (
        dedup_candidates_stream,
        read_doc_stream,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    new = docs.where(F.col("doc_id") % 4 == 0)
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    corpus_bands = dd.minhash_band_table(
        dd.minhash_signatures(corpus), bands=4, rows_per_band=2
    )
    # two shards of the new quarter, landed across a crash
    shard_a = new.where(F.col("doc_id") % 8 == 0)
    shard_b = new.where(F.col("doc_id") % 8 != 0)
    src = tmp_path / "docs_src"
    ckpt = tmp_path / "docs_ckpt"
    src.mkdir()
    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    shard_a.coalesce(1).write.parquet(str(a_dir))
    shard_b.coalesce(1).write.parquet(str(b_dir))

    def land(d, stamp):
        for i, f in enumerate(sorted(pathlib.Path(d).glob("part-*.parquet"))):
            dst = src / f"{stamp}_{f.name}"
            shutil.copy(f, dst)
            os.utime(dst, (_MTIME_BASE + stamp + i, _MTIME_BASE + stamp + i))

    def run():
        emissions = []
        q = (
            dedup_candidates_stream(
                read_doc_stream(spark, str(src)), corpus_bands
            )
            .writeStream.outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .foreachBatch(lambda df, bid: emissions.append(df.collect()))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return [r for batch in emissions for r in batch]

    land(a_dir, 0)
    run_a = run()
    land(b_dir, 100)  # lands while the query is down
    run_b = run()

    got = {(r["id_new"], r["id_old"]) for r in run_a} | {
        (r["id_new"], r["id_old"]) for r in run_b
    }
    # threshold=0.0 keeps every verified candidate, and verification
    # drops none: equal band hashes are equal md5-min values, so the
    # argmin shingle is in BOTH sets — every LSH candidate shares at
    # least one shingle and survives the Jaccard inner join
    want = {
        (r["id_new"], r["id_old"])
        for r in dd.minhash_dedup_incremental(
            new, corpus, corpus_bands, threshold=0.0
        ).select("id_new", "id_old").collect()
    }
    # candidate multiplicity collapses setwise; the SET must be exact
    assert got == want and got
    # run B processed only the post-crash files: no pair from a run-A
    # doc may be re-emitted
    a_ids = {r["doc_id"] for r in shard_a.select("doc_id").collect()}
    assert not any(r["id_new"] in a_ids for r in run_b)
