"""Shared fixtures: one SparkSession per test run + tiny hand-computable corpus."""

from __future__ import annotations

import pytest

from bigdata_lab02_spark.session import get_spark

REFERENCE = "/root/reference/BigDataLab02"
BBC_INPUT = f"{REFERENCE}/DataProcessing/Input"
STOPWORDS = f"{REFERENCE}/DataProcessing/StopWords/stop_words.txt"
GOLDEN = f"{REFERENCE}/Output"
KMEANS_INPUT = f"{REFERENCE}/KMeans/Input"
TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """FIXTURES.md §2.1: punctuation, mixed case, stopwords, an
    empty-after-cleaning token ('!!'), and a term in every doc ('spark',
    so idf = ln(N/N) = 0). Schema (category, doc, line)."""
    rows = [
        ("biz", "biz.d1", "Spark makes Money! money MONEY."),
        ("biz", "biz.d2", "the spark of a deal; money talks"),
        ("biz", "biz.d3", "Spark spark spark !! profit"),
        ("tech", "tech.d1", "spark clusters compute fast, fast"),
        ("tech", "tech.d2", "The Compute-Cluster: spark"),
        ("tech", "tech.d3", "spark AI ai a.i. compute"),
    ]
    return spark.createDataFrame(rows, "category string, doc string, line string")


TINY_STOPWORDS = ["the", "of", "a"]
