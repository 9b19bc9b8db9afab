"""Approximate aggregates (free from Spark SQL; 'not present in the
reference' per SURVEY §2 — recorded as engine capability with accuracy
bounds vs exact)."""

from pyspark.sql import functions as F

from tests.conftest import TESTDATA


def test_approx_count_distinct_within_tolerance(spark):
    li = spark.read.parquet(f"{TESTDATA}/sf0.01/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.06


def test_percentile_approx_brackets_exact(spark):
    li = spark.read.parquet(f"{TESTDATA}/sf0.01/lineitem.parquet")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.02
