"""range_join (binned interval-containment join, r8): the binning is a
candidate-generation detail — results must equal the naive theta-join
at every bin width, with no duplicates and no nested-loop plan."""

import pytest
from pyspark.sql import functions as F

from bigdata_lab02_spark.operators.temporal import range_join
from bigdata_lab02_spark.plans import plan_report

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ev_iv(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "ts", "user_id"
    )
    iv = (
        ev.where(F.col("user_id") % 10 == 0)
        .groupBy(F.col("user_id").alias("interval_id"))
        .agg(F.min("ts").alias("t_lo"))
        .withColumn("t_hi", F.col("t_lo") + F.expr("INTERVAL 36 HOURS"))
    )
    return ev, iv


def _naive(ev, iv):
    return (
        ev.crossJoin(iv)
        .where((F.col("ts") >= F.col("t_lo")) & (F.col("ts") < F.col("t_hi")))
        .select("event_id", "interval_id")
    )


@pytest.mark.parametrize("bin_seconds", [600, 3600, 86400, 10_000_000])
def test_matches_naive_theta_join_at_any_bin_width(spark, ev_iv, bin_seconds):
    """Bin width is a COST knob only: every width — from much finer than
    the intervals to one bin swallowing the whole corpus — must yield
    the exact naive-theta-join match set, with each pair exactly once."""
    ev, iv = ev_iv
    got = sorted(
        (r["event_id"], r["interval_id"])
        for r in range_join(ev, iv, bin_seconds=bin_seconds)
        .select("event_id", "interval_id")
        .collect()
    )
    want = sorted(map(tuple, _naive(ev, iv).collect()))
    assert got == want
    assert len(got) == len(set(got))  # candidate bins never duplicate a pair
    assert len(got) > 0  # fixture actually exercises the join


def test_half_open_boundaries(spark):
    """ts == lo is IN, ts == hi is OUT — and a boundary exactly on a bin
    edge must not flip either way."""
    rows = [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 06:00:00"),
            (3, "2024-01-01 05:59:59")]
    ev = spark.createDataFrame(rows, "event_id int, ts string").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    iv = spark.createDataFrame(
        [(7, "2024-01-01 00:00:00", "2024-01-01 06:00:00")],
        "interval_id int, t_lo string, t_hi string",
    ).select(
        "interval_id",
        F.col("t_lo").cast("timestamp").alias("t_lo"),
        F.col("t_hi").cast("timestamp").alias("t_hi"),
    )
    got = {r["event_id"]
           for r in range_join(ev, iv, bin_seconds=21600).collect()}
    assert got == {1, 3}


def test_plan_is_equi_join_not_nested_loop(spark, ev_iv):
    """The whole point: the bin key turns the theta-join into a plain
    equi-join exchange — no BroadcastNestedLoopJoin, no cartesian."""
    ev, iv = ev_iv
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        r = plan_report(range_join(ev, iv, bin_seconds=3600))
        assert "BroadcastNestedLoopJoin" not in r.raw
        assert "CartesianProduct" not in r.raw
        assert r.n_sortmerge_joins + r.n_shuffle_hash_joins == 1, r.raw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bad_bin_raises(spark, ev_iv):
    ev, iv = ev_iv
    with pytest.raises(ValueError):
        range_join(ev, iv, bin_seconds=0)
