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


# ---- dedup over a bucketed corpus layout (VERDICT r7 item 3) ----
# The real curation workflow runs MANY dedup passes over the same corpus;
# a digest-bucketed layout pays the content-key shuffle once at write
# time and every re-run groupBy/self-join after that plans with ZERO
# exchanges.


@pytest.fixture(scope="module")
def bucketed_corpus(spark):
    docs = spark.read.parquet(f"{TESTDATA}/sf0.001/documents.parquet")
    keyed = docs.select(F.md5("text").alias("digest"), "doc_id", "text")
    write_bucketed(keyed, "docs_bkt", ["digest"], 8, sort_cols=["digest"])
    return spark.table("docs_bkt")


def test_bucketed_dedup_groupby_has_no_exchange(spark, bucketed_corpus):
    """exact_dedup re-run over the bucketed layout: the digest groupBy's
    required distribution is satisfied by the bucket partitioning — no
    exchange — and the survivors match the plain-path operator."""
    from bigdata_lab02_spark.operators.dedup import exact_dedup

    agg = bucketed_corpus.groupBy("digest").agg(
        F.min("doc_id").alias("survivor_id"), F.count("*").alias("n_copies")
    )
    r = plan_report(agg)
    assert r.n_exchanges == 0, r.raw
    got = sorted(map(tuple, agg.collect()))
    plain = exact_dedup(
        spark.read.parquet(f"{TESTDATA}/sf0.001/documents.parquet")
    )
    want = sorted(map(tuple, plain.collect()))
    assert got == want


def test_bucketed_dedup_self_join_has_no_exchange(spark, bucketed_corpus):
    """The dup-pair shape (self-join on the content key) over the
    bucketed layout: co-located sort-merge join, zero exchanges."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = bucketed_corpus.alias("a")
        b = bucketed_corpus.alias("b")
        pairs = a.join(b, "digest").where(
            F.col("a.doc_id") < F.col("b.doc_id")
        ).select("digest", F.col("a.doc_id"), F.col("b.doc_id"))
        r = plan_report(pairs)
        assert r.n_exchanges == 0, r.raw
        assert r.n_sortmerge_joins == 1
        # every pair really is an exact duplicate
        n_pairs = pairs.count()
        from bigdata_lab02_spark.operators.dedup import exact_dedup

        plain = exact_dedup(
            spark.read.parquet(f"{TESTDATA}/sf0.001/documents.parquet")
        )
        want = sum(
            c * (c - 1) // 2
            for (c,) in plain.select("n_copies").collect()
        )
        assert n_pairs == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partitioned_write_prunes_at_scan(spark, tmp_path_factory):
    """The second layout lever beside bucketing: a hive-partitioned
    parquet write must let a partition-key filter prune DIRECTORIES at
    planning time (PartitionFilters on the scan node), not read-and-
    filter — at 100 TB this is the difference between scanning one
    event type and scanning the corpus. Values must match the
    unpartitioned read exactly."""
    from bigdata_lab02_spark.sources.sinks import write_parquet

    out = str(tmp_path_factory.mktemp("events_part") / "by_type")
    ev = spark.read.parquet(f"{TESTDATA}/sf0.001/events.parquet")
    write_parquet(ev, out, partition_by=["event_type"])

    one_type = ev.select("event_type").first()["event_type"]
    pruned = spark.read.parquet(out).where(F.col("event_type") == one_type)
    raw = plan_report(pruned).raw
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", raw)
    assert m and "event_type" in m.group(1), raw  # pruned at planning time
    # and the partition-key filter must NOT appear as a data filter
    pf = re.search(r"PushedFilters: \[([^\]]*)\]", raw)
    assert not (pf and "event_type" in pf.group(1)), raw
    assert pruned.count() == ev.where(F.col("event_type") == one_type).count()


# ---- streaming dedup candidates vs a bucketed corpus (VERDICT r8 #1) ----
# The stream-static candidate join must NOT rebuild the corpus band table
# into a broadcast every micro-batch: with the corpus persisted bucketed
# on band_hash, the per-batch plan exchanges ONLY the shard side.


def test_stream_dedup_corpus_not_broadcast(spark):
    """dedup_candidates_stream's join, planned against a band_hash-
    bucketed corpus band table with no broadcast hint: the corpus side
    reads its buckets in place (one exchange total — the shard side),
    no BroadcastHashJoin, and the candidate pairs match the forced-
    broadcast plan exactly. minhash_band_stream works identically on a
    batch frame, and Structured Streaming plans each micro-batch of a
    stream-static join with the same strategies — so this batch-shaped
    plan IS the per-batch shape."""
    from bigdata_lab02_spark.operators import dedup as dd
    from bigdata_lab02_spark.streaming.docs import dedup_candidates_stream

    docs = spark.read.parquet(f"{TESTDATA}/sf0.001/documents.parquet")
    shard = docs.where(F.col("doc_id") % 4 == 0)
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    bands = dd.minhash_band_table(
        dd.minhash_signatures(corpus), bands=4, rows_per_band=2
    )
    write_bucketed(bands, "corpus_bands_bkt", ["band_hash"], 8)
    bkt = spark.table("corpus_bands_bkt")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cands = dedup_candidates_stream(shard, bkt)
        r = plan_report(cands)
        assert r.n_broadcast_joins == 0, r.raw
        assert r.n_sortmerge_joins + r.n_shuffle_hash_joins == 1, r.raw
        # corpus side co-located: only the shard's rows shuffle
        assert r.n_exchanges == 1, r.raw
        got = sorted({tuple(x) for x in cands.collect()})
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    want = sorted(
        {
            tuple(x)
            for x in dedup_candidates_stream(
                shard, bkt, broadcast_corpus=True
            ).collect()
        }
    )
    assert got == want and got


def test_versioned_bucketed_layouts(spark):
    """The name@version convention (r9): two corpus snapshots coexist as
    separate tables — writing v2 does not clobber v1, both read back by
    their versioned names, and each keeps the bucketed layout."""
    from bigdata_lab02_spark.sources.sinks import read_bucketed

    docs = spark.read.parquet(f"{TESTDATA}/sf0.001/documents.parquet")
    v1 = docs.select(F.md5("text").alias("digest"), "doc_id")
    v2 = v1.where(F.col("doc_id") % 2 == 0)
    write_bucketed(v1, "vers_corpus@v1", ["digest"], 8)
    write_bucketed(v2, "vers_corpus@v2", ["digest"], 8)
    r1 = read_bucketed(spark, "vers_corpus@v1")
    r2 = read_bucketed(spark, "vers_corpus@v2")
    assert r1.count() == docs.count()
    assert r2.count() == v2.count() < r1.count()
    # v1 survived the v2 write, and the groupBy over either version
    # still plans exchange-free (layout intact)
    agg = r1.groupBy("digest").agg(F.count("*").alias("n"))
    assert plan_report(agg).n_exchanges == 0


def test_versioned_name_resolution_guards(spark):
    """Distinct user-visible names can never resolve to the same table:
    '__' is reserved for the resolved separator."""
    from bigdata_lab02_spark.sources.sinks import bucketed_table_name

    assert bucketed_table_name("corpus@v3") == "corpus__v3"
    assert bucketed_table_name("plain_name") == "plain_name"
    with pytest.raises(ValueError, match="reserved"):
        bucketed_table_name("corpus__v3")  # would collide with corpus@v3
    for bad in ("@v1", "corpus@", "a@b@c", "cor__pus@v1"):
        with pytest.raises(ValueError):
            bucketed_table_name(bad)
