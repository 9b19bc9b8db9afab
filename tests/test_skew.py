"""Salted join / aggregation equivalence tests."""

from pyspark.sql import functions as F

from bigdata_lab02_spark.operators.skew import salted_aggregate, salted_join


def test_salted_join_equals_plain_join(spark):
    # hot key: 90% of fact rows share key 1
    fact = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("d"))
    plain = fact.join(dim, "k").select("k", "v", "d")
    salted = salted_join(fact, dim, "k", salt_buckets=8).select("k", "v", "d")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k int, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, d string")
    out = salted_join(fact, dim, "k", salt_buckets=4, how="left")
    rows = {(r["k"], r["v"], r["d"]) for r in out.collect()}
    assert rows == {(1, "a", "x"), (2, "b", "y"), (99, "c", None)}


def test_salted_aggregate_equals_plain(spark):
    df = spark.range(5000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 97).alias("x")
    )
    plain = {
        (r["g"]): (r["s"], r["c"], r["mn"], r["mx"])
        for r in df.groupBy("g")
        .agg(
            F.sum("x").alias("s"),
            F.count("x").alias("c"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["g"]): (r["sum_x"], r["count_x"], r["min_x"], r["max_x"])
        for r in salted_aggregate(
            df, ["g"], {"x": "sum"}, salt_buckets=8
        ).join(
            salted_aggregate(df, ["g"], {"x": "count"}, salt_buckets=8), "g"
        ).join(
            salted_aggregate(df, ["g"], {"x": "min"}, salt_buckets=8), "g"
        ).join(
            salted_aggregate(df, ["g"], {"x": "max"}, salt_buckets=8), "g"
        ).collect()
    }
    assert plain == salted
