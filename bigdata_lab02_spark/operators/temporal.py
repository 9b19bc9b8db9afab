"""Temporal join patterns Spark's optimizer has no native strategy for.

``range_join`` — interval-containment join (point ts ∈ [lo, hi)). The
naive formulation is a theta-join, which Catalyst plans as
BroadcastNestedLoopJoin (fine only while one side broadcasts) or a
cartesian product — at 100 TB either is fatal. The classic fix, used
here, is BINNING: quantize time into fixed-width bins, explode each
interval into the bins it covers, map each point to its ONE bin, and
equi-join on the bin before applying the exact predicate. The candidate
set is |points| × (avg intervals overlapping a bin), never
|points| × |intervals|, and the join is a plain hash/sort-merge
exchange on the bin key that AQE can size and skew-split like any
other. (Same idea as Databricks' RANGE_JOIN bin hint, restated as a
composition of DataFrame ops.)

Bin width is the cost knob: each interval produces span/bin + 1
candidate rows, so pick a bin near the TYPICAL interval length —
intervals much longer than the bin fan out proportionally (document
the expected span; at 100 TB prefer a coarser bin and a slightly
larger exact-filter candidate set over interval row explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    lo_col: str = "t_lo",
    hi_col: str = "t_hi",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner join of ``points`` rows to every ``intervals`` row whose
    ``[lo_col, hi_col)`` half-open window contains ``ts_col``.

    Correctness of the binning: a point's bin is floor(epoch/bin); an
    interval explodes into floor(lo/bin)..floor(hi/bin) inclusive, so
    every true containment shares a bin, and each (point, interval)
    candidate pair arises from the point's SINGLE bin exactly once — no
    post-join dedup needed. The exact predicate then keeps true matches
    only. Sub-second precision is preserved: bins only gate candidacy,
    the predicate compares the original timestamps.

    Returns all columns of both inputs (``__bin`` dropped)."""
    if bin_seconds <= 0:
        raise ValueError(f"bin_seconds must be positive, got {bin_seconds}")
    b = F.lit(bin_seconds)
    pts = points.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(ts_col)) / b)
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(lo_col)) / b),
                F.floor(F.unix_timestamp(F.col(hi_col)) / b),
            )
        ),
    )
    return (
        pts.join(iv, "__bin")
        .where((F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) < F.col(hi_col)))
        .drop("__bin")
    )
