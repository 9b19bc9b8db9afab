"""Structured Streaming event pipelines.

Batch twins of these queries live in ``__spark_entry__`` (events_hourly /
events_sessions) and hash-match the DuckDB oracle; the streaming forms here
add watermarks + incremental state. For local verification, a parquet
directory is replayed through ``readStream`` into a memory sink
(``run_stream_to_memory``), which drives the SAME query incrementally.

Scale notes: tumbling windows + watermark bound state size; session
windows use Spark's native ``session_window`` (gap-merged state per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _with_ts(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to TimestampType across the physical generations the
    testdata has shipped: nanos-as-long (integer-math conversion), NTZ
    (timestamp[us] — watermarks require TIMESTAMP_LTZ, and session TZ is
    pinned UTC so the cast is semantically a no-op), or already LTZ."""
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif isinstance(dt, T.TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """Replay a parquet events directory as a stream (one file per
    micro-batch by default). ``readStream`` needs an explicit schema, so the
    file's actual schema is sniffed with a (metadata-only) batch read —
    robust to the ts physical type changing between testdata generations."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return _with_ts(raw)


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windowed counts+sums per event_type with late-data
    watermark — the streaming twin of the batch events_hourly query.
    The value sum goes through DECIMAL(18,2) (exact, order-independent)
    then back to double, exactly like the batch twin — so an emitted window
    equals the batch/oracle value bit-for-bit."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "total_value")
    )


def sessionized_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (gap-merged state): events within ``gap`` of
    each other per user merge into one session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — idempotent ingestion for at-least-once
    sources: keep the first occurrence of each key, drop replays that
    arrive within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` so the dedup state is EVICTED
    once a key's event time falls behind the watermark — state stays
    bounded by (arrival rate × watermark), never by total stream history.
    A plain ``dropDuplicates`` on a stream would keep every key forever
    and OOM at pipeline scale. Exactly the streaming twin of
    ``operators.dedup.exact_dedup``: same first-wins semantics, keyed on
    whatever identifies a duplicate (event id, content digest, …).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def running_user_totals_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (n_events, total_value), emitted incrementally each
    micro-batch. This is the escape hatch for aggregations the built-in
    windowed operators can't express (per-key model state, custom
    eviction); state lives in the state store keyed by user, and each
    micro-batch hands the operator Arrow batches of that key's new rows.

    The emitted row after the final batch equals the batch groupBy twin
    (count + DECIMAL-exact value sum) — tests assert that equivalence.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            # running cents, not float: integer state is exact and
            # order-independent, matching the batch DECIMAL(18,2) sum.
            T.StructField("cents", T.LongType()),
        ]
    )

    def update(key, pdf_iter, state: GroupState):
        # defined function-local: pickled by value, no module import on
        # the worker (see memory: driver sys.path != worker sys.path)
        import numpy as np

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            # per-row HALF_UP to cents, sign-aware: round away from zero
            # like Spark's DECIMAL(18,2) cast (plain floor(x+0.5) would
            # round a negative refund toward +inf; pandas .round() would
            # round half-to-even).
            v = pdf["value"].to_numpy(dtype="float64")
            cents += int((np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).sum())
        state.update((n, cents))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def enriched_segment_stream(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    dim_key: str = "c_custkey",
    seg_col: str = "c_mktsegment",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup: each micro-batch
    joins against the static dimension (Spark re-plans the static side per
    batch, so a dim refresh is picked up without restarting the query) and
    aggregates per (1-hour window, segment).

    The static side rides a broadcast join — the stream never shuffles for
    the enrichment, only for the windowed aggregation; watermarking bounds
    that aggregation's state. This is THE pattern for attaching slowly-
    changing reference data (user tiers, geo tables) to an event stream.
    The DECIMAL-exact value sum matches the batch twin bit-for-bit."""
    joined = events.withWatermark("ts", watermark).join(
        F.broadcast(dim.select(F.col(dim_key).alias(key), F.col(seg_col))),
        key,
    )
    return (
        joined.groupBy(F.window("ts", "1 hour").alias("w"), seg_col)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket"), seg_col, "n", "total_value")
    )


def followup_pairs_stream(
    events: DataFrame, horizon: str = "2 hours", watermark: str = "2 hours"
) -> DataFrame:
    """STREAM-STREAM inner self-join with an event-time range condition:
    pair every event with the same user's follow-up events whose timestamp
    lands in [ts, ts + horizon] — the sessionless correlation primitive
    (click→purchase attribution, retry detection, funnel stitching).

    This is the one join class the rest of the streaming surface doesn't
    cover: BOTH sides are unbounded, so each side buffers rows in the
    state store until the other side's matches can no longer arrive. The
    watermarks plus the explicit time-range condition are what make that
    buffer finite — state is O(rate × (watermark + horizon)), evicted as
    event time advances, never total stream history. Inner-join matches
    are emitted as soon as both sides have arrived (watermarks govern
    EVICTION, not emission), so a bounded replay emits exactly the batch
    self-join — which is what the driver gate asserts.

    Returns (a_id, b_id, user_id) pairs, a_id != b_id. Tie rule: the range
    condition is ``b_ts >= a_ts``, so two DISTINCT events of one user with
    EQUAL timestamps pair in BOTH orientations — (a,b) and (b,a) each
    appear once (the batch twin and the driver oracle replay the same
    rule). Strictly-later pairs appear in one orientation only.
    """
    a = events.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    ).withWatermark("a_ts", watermark)
    b = events.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
    ).withWatermark("b_ts", watermark)
    return a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("a_id") != F.col("b_id"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select("a_id", "b_id", F.col("a_user").alias("user_id"))


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def run_stream_to_memory(
    spark: SparkSession,
    streaming_df: DataFrame,
    name: str,
    mode: str = "append",
    state_partitions: int | None = 8,
    state_store_provider: str | None = None,
) -> DataFrame:
    """Drive a streaming query to completion over a bounded source and
    return the materialized result (memory sink).

    ``state_partitions``: stateful operators create one state store per
    shuffle partition and commit EVERY store each micro-batch, even idle
    ones — on a bounded local replay that fixed cost dominates wall time
    (a stream-stream join at 32 partitions spends ~3× longer in store
    commits than in the join). The replay therefore plans with a small
    shuffle-partition count and restores the session conf after. ``None``
    keeps the session setting. A real deployment sizes this to cluster
    parallelism once — it is frozen for the life of a checkpoint.

    ``state_store_provider``: ``None`` keeps the session default (the
    in-heap HDFSBackedStateStoreProvider); pass ``ROCKSDB_PROVIDER`` for
    the RocksDB store — THE 100 TB choice for big-state queries
    (stream-stream joins, high-cardinality dedup/aggregation): state
    lives off-heap on local SSD instead of the executor heap, so state
    size is bounded by disk, not memory, and snapshot/changelog files
    checkpoint incrementally. Like the partition count, the provider is
    frozen for the life of a checkpoint. The session conf is restored
    after the replay (provider equivalence is asserted in
    tests/test_multimodal_streaming.py)."""
    key = "spark.sql.shuffle.partitions"
    pkey = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key)
    saved_provider = spark.conf.get(pkey, None)
    if state_partitions is not None:
        spark.conf.set(key, str(state_partitions))
    if state_store_provider is not None:
        spark.conf.set(pkey, state_store_provider)
    try:
        q = (
            streaming_df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set(key, saved)
        if state_store_provider is not None:
            if saved_provider is None:
                spark.conf.unset(pkey)
            else:
                spark.conf.set(pkey, saved_provider)
    return spark.sql(f"SELECT * FROM {name}")
