"""merge_upsert (snapshot+delta MERGE core) semantics."""

import pytest

from bigdata_lab02_spark.operators.merge import merge_upsert


def _rows(df):
    return {(r["k"], r["v"]) for r in df.collect()}


def test_update_insert_passthrough(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    delta = spark.createDataFrame(
        [(2, "B"), (9, "new")], "k long, v string"
    )
    out = merge_upsert(base, delta, ["k"])
    assert _rows(out) == {(1, "a"), (2, "B"), (3, "c"), (9, "new")}


def test_shuffle_path_same_result(spark):
    base = spark.createDataFrame([(i, str(i)) for i in range(100)], "k long, v string")
    delta = spark.createDataFrame([(i, "X") for i in range(0, 100, 7)], "k long, v string")
    a = _rows(merge_upsert(base, delta, ["k"], broadcast_updates=True))
    b = _rows(merge_upsert(base, delta, ["k"], broadcast_updates=False))
    assert a == b
    assert (7, "X") in a and (8, "8") in a


def test_column_mismatch_rejected(spark):
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    delta = spark.createDataFrame([(1, "a", 0)], "k long, v string, extra int")
    with pytest.raises(ValueError):
        merge_upsert(base, delta, ["k"])


def test_composite_key(spark):
    base = spark.createDataFrame(
        [(1, "x", "old"), (1, "y", "old")], "k long, s string, v string"
    )
    delta = spark.createDataFrame([(1, "y", "new")], "k long, s string, v string")
    out = merge_upsert(base, delta, ["k", "s"])
    got = {(r["k"], r["s"], r["v"]) for r in out.collect()}
    assert got == {(1, "x", "old"), (1, "y", "new")}


def test_duplicate_delta_keys_rejected(spark):
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    delta = spark.createDataFrame([(1, "x"), (1, "y")], "k long, v string")
    with pytest.raises(ValueError, match="duplicate key"):
        merge_upsert(base, delta, ["k"])
    # explicit opt-out accepts the (documented) multi-row-per-key result
    out = merge_upsert(base, delta, ["k"], check_unique_keys=False)
    assert out.count() == 2
