"""Bucketed-table co-located joins: plan-level proof that same-key
bucketing removes the join shuffle (the 100 TB layout lever)."""

import pytest
from pyspark.sql import functions as F

from bigdata_lab02_spark.plans import plan_report
from bigdata_lab02_spark.sources.sinks import write_bucketed
from tests.conftest import TESTDATA


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = spark.read.parquet(f"{TESTDATA}/sf0.001/lineitem.parquet")
    orders = spark.read.parquet(f"{TESTDATA}/sf0.001/orders.parquet")
    write_bucketed(li, "li_bkt", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(orders, "ord_bkt", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    return spark.table("li_bkt"), spark.table("ord_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li, orders = bucketed_tables
    # force a non-broadcast join so the shuffle (or its absence) is visible
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
            "l_orderkey", "o_totalprice"
        )
        r = plan_report(j)
        assert r.n_exchanges == 0, r.raw  # co-located: no shuffle at all
        assert r.n_sortmerge_joins == 1
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    li, orders = bucketed_tables
    plain_li = spark.read.parquet(f"{TESTDATA}/sf0.001/lineitem.parquet")
    plain_o = spark.read.parquet(f"{TESTDATA}/sf0.001/orders.parquet")
    a = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .agg(F.count("*"), F.sum("o_totalprice"))
        .collect()[0]
    )
    b = (
        plain_li.join(plain_o, plain_li["l_orderkey"] == plain_o["o_orderkey"])
        .agg(F.count("*"), F.sum("o_totalprice"))
        .collect()[0]
    )
    assert a[0] == b[0] and abs(a[1] - b[1]) < 1e-6
