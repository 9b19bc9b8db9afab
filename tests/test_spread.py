"""The r16 scan-spread contract: the documents table (the root of every
heavy text kernel) is repartitioned to session parallelism when its
single-row-group file would otherwise scan as one task — and NOTHING
else is (the interleaved A/B showed every other family loses or washes,
and the relational plan gates cap exchange counts).
"""

import __spark_entry__ as e

SF01 = "/root/testdata/sf0.01"
SF1 = "/root/testdata/sf0.1"


def test_documents_scan_spread_to_parallelism(spark):
    n = spark.sparkContext.defaultParallelism
    df = e._t(spark, SF1, "documents")
    assert df.rdd.getNumPartitions() == n


def test_small_documents_file_not_spread(spark):
    # below the 256 KB floor the correctness sweeps keep the 1-task scan
    df = e._t(spark, SF01, "documents")
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism


def test_non_document_tables_not_spread(spark):
    # lineitem is far above the size floor but NOT whitelisted: its
    # consumers are cheap filters/aggs where the extra exchange loses
    # (byte-range splits can report >1 scan partition, so assert on
    # the plan: no Repartition node at all)
    for name in ("lineitem", "orders", "customer"):
        df = e._t(spark, SF1, name)
        plan = df._jdf.queryExecution().logical().toString()
        assert "Repartition" not in plan, name


def test_spread_is_noop_when_already_parallel(spark):
    n = spark.sparkContext.defaultParallelism
    raw = spark.read.parquet(f"{SF1}/documents.parquet").repartition(n)
    again = e._spread(raw)
    # no second RoundRobinPartitioning layered on an already-spread frame
    plan = again._jdf.queryExecution().logical().toString()
    assert plan.count("Repartition") == 1
